"""Trained-agent zoo: small committed checkpoints, reproducible recipes.

The reference ships no trained models — every example retrains from scratch
(/root/reference/gobblet_rl/examples/example_tianshou_DQN.py saves
``policy.pth`` locally but the repo contains none).  Here the flagship
agents from docs/RESULTS.md are committed as single-file flax-serialized
parameter blobs next to a JSON manifest recording the exact training recipe
and the measured strength, so a user can load and play them without a TPU
or a training run:

    from gobblet_rl_tpu import zoo
    net, params, meta = zoo.load("alphazero_gumbel32")
    policy = zoo.policy("alphazero_gumbel32")       # eval/tournament PolicyFn
    agent = zoo.host_agent("alphazero_gumbel32")    # GameSession-compatible

Entries are produced by ``scripts/make_zoo.py`` (one TPU run); loading uses
only the manifest's net hyperparameters — no optimizer or env state is
stored, so blobs stay small enough to version.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

def _zoo_dir() -> str:
    """Package dir by default; GOBBLET_ZOO_DIR redirects reads AND writes
    (tests smoke the make_zoo pipeline without touching committed blobs)."""
    return os.environ.get(
        "GOBBLET_ZOO_DIR", os.path.dirname(os.path.abspath(__file__))
    )


def _manifest() -> Dict[str, Any]:
    path = os.path.join(_zoo_dir(), "manifest.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def names() -> list:
    """Available zoo entries (sorted)."""
    return sorted(_manifest())


def meta(name: str) -> Dict[str, Any]:
    m = _manifest()
    if name not in m:
        raise KeyError(
            f"unknown zoo entry {name!r}; available: {sorted(m) or 'none'}"
        )
    return m[name]


def _build_net(entry: Dict[str, Any]):
    family, net_cfg = entry["family"], entry["net"]
    if family == "alphazero":
        from gobblet_rl_tpu.models import actor_critic as ac

        return ac.ConvActorCritic(
            channels=net_cfg["channels"], blocks=net_cfg["blocks"]
        ) if net_cfg["model"] == "conv" else ac.MLPActorCritic(
            hidden_sizes=tuple(net_cfg["hidden_sizes"])
        )
    if family == "dqn":
        from gobblet_rl_tpu.models.mlp import QNet

        return QNet(hidden_sizes=tuple(net_cfg["hidden_sizes"]),
                    dueling=net_cfg["dueling"])
    if family == "ppo":
        from gobblet_rl_tpu.models import actor_critic as ac

        return ac.MLPActorCritic(hidden_sizes=tuple(net_cfg["hidden_sizes"]))
    raise ValueError(f"unknown zoo family {family!r}")


def load(name: str, expect_family: str | None = None) -> Tuple[Any, Any, Dict[str, Any]]:
    """Return ``(net, params, meta)`` for a zoo entry.

    ``expect_family`` guards cross-family misuse: loading an alphazero
    entry into the DQN example would otherwise fail deep inside the policy
    with an opaque shape error (its apply() returns a (logits, value)
    tuple, not Q-values)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    entry = meta(name)
    if expect_family is not None and entry["family"] != expect_family:
        raise ValueError(
            f"zoo entry {name!r} is family {entry['family']!r}, but this "
            f"loader expects {expect_family!r}; pick one of "
            f"{[n for n in names() if meta(n)['family'] == expect_family] or 'none'}"
        )
    net = _build_net(entry)
    template = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 117), jnp.int8))
    with open(os.path.join(_zoo_dir(), entry["file"]), "rb") as f:
        params = serialization.from_bytes(template, f.read())
    return net, params, entry


def save(name: str, params, entry: Dict[str, Any]) -> None:
    """Write a zoo entry (params blob + manifest row).  Used by
    scripts/make_zoo.py; safe to call repeatedly (overwrites)."""
    from flax import serialization

    entry = dict(entry)
    entry.setdefault("file", f"{name}.msgpack")
    with open(os.path.join(_zoo_dir(), entry["file"]), "wb") as f:
        f.write(serialization.to_bytes(params))
    m = _manifest()
    m[name] = entry
    # atomic replace: a crash mid-dump must not corrupt the manifest that
    # every zoo.load/names call depends on
    path = os.path.join(_zoo_dir(), "manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=2, sort_keys=True)
        f.write("\n")
    os.replace(tmp, path)


def policy(name: str, **overrides):
    """Tournament-compatible ``(key, board_lm, current) -> actions`` policy.

    ``overrides`` tune evaluation knobs per family: ``num_sims``/``c_puct``
    for alphazero, ``eps`` for dqn, ``sample`` for ppo.
    """
    net, params, entry = load(name)
    family = entry["family"]
    if family == "alphazero":
        from gobblet_rl_tpu.train import alphazero

        kw = {**entry.get("eval", {}), **overrides}
        return alphazero.az_policy(net, params, **kw)
    if family == "dqn":
        from gobblet_rl_tpu.eval import tournament

        return tournament.dqn_policy(net, params, **overrides)
    if family == "ppo":
        from gobblet_rl_tpu.eval import tournament

        return tournament.ppo_policy(net, params, **overrides)
    raise ValueError(f"unknown zoo family {family!r}")


def host_agent(name: str, seed: int = 0, **overrides):
    """A ``compute_action(obs, mask)`` agent over the host AEC env
    (GameSession-compatible, like GreedyGobbletPolicy): wraps the batched
    zoo policy at B=1 behind the reference observation layout."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gobblet_rl_tpu.policies.greedy import board_from_observation

    pol = policy(name, **overrides)

    class _ZooAgent:
        def __init__(self):
            self._key = jax.random.PRNGKey(seed)

        def compute_action(self, obs, mask):
            board, agent = board_from_observation(np.asarray(obs))
            self._key, sub = jax.random.split(self._key)
            lane_major = jnp.asarray(board)[..., None]  # [3,9,1]
            a = pol(sub, lane_major, jnp.asarray([agent], jnp.int32))
            return int(a[0])

    return _ZooAgent()
