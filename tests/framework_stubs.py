"""Minimal vendored stand-ins for the tianshou / ray.rllib APIs the adapters
touch, so adapter logic runs headlessly without installing either framework
(the reference exercised its adapters under the real frameworks:
/root/reference/gobblet_rl/game/greedy_policy_tianshou.py:32-98,
collector_manual_policy.py:25-180, greedy_policy_rllib.py:11-30).

``install_tianshou_stub()`` / ``install_rllib_stub()`` register fake modules
in ``sys.modules``; ``uninstall_stubs()`` removes them AND the adapter
modules they enabled, so the import-gating tests elsewhere stay valid.
"""

from __future__ import annotations

import sys
import types

import numpy as np


# --------------------------------------------------------------------------
# tianshou fakes: Batch / BasePolicy / Collector with the exact attribute
# surface gobblet_rl_tpu.adapters.tianshou_adapter uses.
# --------------------------------------------------------------------------
def _wrap(value):
    if isinstance(value, dict):
        return Batch(**value)
    return value


class Batch:
    """Attribute-dict with recursive wrapping (tianshou.data.Batch shape)."""

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, _wrap(v))

    def __getitem__(self, key):
        return getattr(self, key)

    def update(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, _wrap(v))

    def keys(self):
        return self.__dict__.keys()

    def __repr__(self):
        return f"Batch({self.__dict__!r})"


class BasePolicy:
    def __init__(self, **kwargs):
        pass

    def forward(self, batch, state=None, **kwargs):  # pragma: no cover
        raise NotImplementedError

    def learn(self, batch, **kwargs):  # pragma: no cover
        raise NotImplementedError


class ReplayBufferStub:
    """Records added transitions; returns tianshou-shaped episode stats."""

    def __init__(self):
        self.added = []
        self._ep_rew = 0.0
        self._ep_len = 0

    def add(self, data, buffer_ids=None):
        rew = np.asarray(data.rew, dtype=np.float64).reshape(-1)
        done = bool(np.asarray(data.done).reshape(-1)[0])
        # per-episode bookkeeping for the single env slot
        self._ep_rew += float(rew[0] if rew.size else 0.0)
        self._ep_len += 1
        self.added.append(
            {
                "act": np.asarray(data.act).copy(),
                "rew": rew.copy(),
                "done": done,
            }
        )
        ptr = np.array([len(self.added) - 1], dtype=np.int64)
        ep_rew = np.array([self._ep_rew if done else 0.0])
        ep_len = np.array([self._ep_len if done else 0], dtype=np.int64)
        ep_idx = np.array([0], dtype=np.int64)
        if done:
            self._ep_rew, self._ep_len = 0.0, 0
        return ptr, ep_rew, ep_len, ep_idx


class Collector:
    """The slice of tianshou.data.Collector the adapter subclass relies on:
    ``self.data`` (a Batch), ``self.env``, ``self.buffer``, plus a minimal
    ``collect`` so policy.forward can drive CPU turns."""

    def __init__(self, policy, env, buffer=None, preprocess_fn=None,
                 exploration_noise=False):
        self.policy = policy
        self.env = env
        self.buffer = buffer if buffer is not None else ReplayBufferStub()
        self.preprocess_fn = preprocess_fn
        self.exploration_noise = exploration_noise
        self.reset()

    def reset(self):
        obs = self.env.reset()
        if isinstance(obs, tuple):
            obs = obs[0]
        self.data = Batch(
            obs=obs,
            act=np.zeros(1, dtype=np.int64),
            rew=np.zeros(1),
            done=np.zeros(1, dtype=bool),
            info=Batch(),
        )

    def collect(self, n_step=1, render=None):
        for _ in range(n_step):
            out = self.policy.forward(self.data)
            self.data.act = np.asarray(out.act).reshape(-1)
            result = self.env.step(self.data.act, ready_env_ids=np.array([0]))
            obs_next, rew, terminated, truncated, info = result
            done = np.logical_or(terminated, truncated)
            self.data.update(obs_next=obs_next, rew=rew, done=done, info=info)
            self.buffer.add(self.data, buffer_ids=np.array([0]))
            if done.any():
                obs_reset = self.env.reset(np.where(done)[0])
                if isinstance(obs_reset, tuple):
                    obs_reset = obs_reset[0]
                self.data.obs_next = obs_reset
            self.data.obs = self.data.obs_next


def install_tianshou_stub():
    ts = types.ModuleType("tianshou")
    data = types.ModuleType("tianshou.data")
    collector_mod = types.ModuleType("tianshou.data.collector")
    policy_mod = types.ModuleType("tianshou.policy")
    data.Batch = Batch
    data.Collector = Collector
    collector_mod.Collector = Collector
    policy_mod.BasePolicy = BasePolicy
    ts.data = data
    ts.policy = policy_mod
    for name, mod in {
        "tianshou": ts,
        "tianshou.data": data,
        "tianshou.data.collector": collector_mod,
        "tianshou.policy": policy_mod,
    }.items():
        mod.__stub__ = True
        sys.modules[name] = mod
    return ts


# --------------------------------------------------------------------------
# ray.rllib fakes
# --------------------------------------------------------------------------
class RandomPolicy:
    """Stand-in for ray.rllib.examples.policy.random_policy.RandomPolicy."""

    def __init__(self, *args, **kwargs):
        self.args, self.kwargs = args, kwargs

    def compute_actions(self, obs_batch, **kwargs):  # pragma: no cover
        raise NotImplementedError


def override(cls):
    def decorator(method):
        assert method.__name__ in dir(cls), (
            f"{method.__name__} does not override any method of {cls}"
        )
        return method

    return decorator


def install_rllib_stub():
    ray = types.ModuleType("ray")
    rllib = types.ModuleType("ray.rllib")
    examples = types.ModuleType("ray.rllib.examples")
    policy_pkg = types.ModuleType("ray.rllib.examples.policy")
    random_policy = types.ModuleType("ray.rllib.examples.policy.random_policy")
    utils = types.ModuleType("ray.rllib.utils")
    annotations = types.ModuleType("ray.rllib.utils.annotations")
    random_policy.RandomPolicy = RandomPolicy
    annotations.override = override
    for name, mod in {
        "ray": ray,
        "ray.rllib": rllib,
        "ray.rllib.examples": examples,
        "ray.rllib.examples.policy": policy_pkg,
        "ray.rllib.examples.policy.random_policy": random_policy,
        "ray.rllib.utils": utils,
        "ray.rllib.utils.annotations": annotations,
    }.items():
        mod.__stub__ = True
        sys.modules[name] = mod
    return ray


_STUB_MODULES = [
    "tianshou", "tianshou.data", "tianshou.data.collector", "tianshou.policy",
    "ray", "ray.rllib", "ray.rllib.examples", "ray.rllib.examples.policy",
    "ray.rllib.examples.policy.random_policy", "ray.rllib.utils",
    "ray.rllib.utils.annotations",
    # adapters imported under the stubs must not leak to other tests
    "gobblet_rl_tpu.adapters.tianshou_adapter",
    "gobblet_rl_tpu.adapters.rllib_adapter",
]


def uninstall_stubs():
    for name in _STUB_MODULES:
        mod = sys.modules.get(name)
        if mod is not None and (
            getattr(mod, "__stub__", False) or name.startswith("gobblet_rl_tpu")
        ):
            del sys.modules[name]


# --------------------------------------------------------------------------
# Vector-env scaffolding: a PettingZooEnv-alike over the repo's wrapped AEC
# env plus a 1-env DummyVectorEnv-alike, mirroring the stack the reference
# collector test drove (tianshou.env.{PettingZooEnv,DummyVectorEnv}).
# --------------------------------------------------------------------------
class PettingZooEnvLike:
    """obs -> {'agent_id', 'obs', 'mask'}, rewards for all agents."""

    def __init__(self, aec_env):
        self.env = aec_env
        self.agents = None

    def _obs(self):
        observation, _, term, trunc, _ = self.env.last()
        return {
            "agent_id": self.env.agent_selection,
            "obs": observation["observation"],
            "mask": observation["action_mask"].astype(bool),
        }

    def reset(self, seed=None):
        self.env.reset(seed=seed)
        self.agents = list(self.env.agents)
        return self._obs()

    def step(self, action):
        self.env.step(int(action))
        _, _, term, trunc, info = self.env.last()
        rewards = np.array(
            [self.env.rewards[a] for a in self.agents], dtype=np.float64
        )
        return self._obs(), rewards, term, trunc, info

    @property
    def unwrapped(self):
        return self.env.unwrapped


class DummyVectorEnvLike:
    """Single-env vector facade with the (act, ready_env_ids) step signature
    and per-id reset the adapter's collect_result expects."""

    def __init__(self, env_fns):
        self.workers = [types.SimpleNamespace(env=types.SimpleNamespace(env=fn()))
                        for fn in env_fns]

    def _env(self):
        return self.workers[0].env.env

    @staticmethod
    def _stack_obs(obs):
        return Batch(
            agent_id=np.array([obs["agent_id"]]),
            obs=np.asarray(obs["obs"])[None],
            mask=np.asarray(obs["mask"])[None],
        )

    def reset(self, ids=None):
        return self._stack_obs(self._env().reset())

    def step(self, actions, ready_env_ids=None):
        obs, rew, term, trunc, info = self._env().step(np.asarray(actions)[0])
        return (
            self._stack_obs(obs),
            rew[None],
            np.array([term]),
            np.array([trunc]),
            np.array([info]),
        )
