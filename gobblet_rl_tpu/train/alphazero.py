"""AlphaZero-style training: batched MCTS self-play + policy/value learning.

A capability the reference does not have — its strongest trainable agent is
the Tianshou DQN vs a depth-2 greedy opponent
(/root/reference/gobblet_rl/examples/example_tianshou_DQN.py:199-202), and
its strongest fixed baseline is the depth-3 greedy scan
(/root/reference/gobblet_rl/game/greedy_policy.py:158-208).  This module
closes the loop on :mod:`gobblet_rl_tpu.search.mcts`: a single shared
policy/value network plays both sides, every ply of every game in the batch
is chosen by the vmapped PUCT search, and the network is trained to match
the search's visit distribution (policy target) and the final game outcome
(value target).

TPU shape of the program: one ``train_iteration`` is a single jitted XLA
program — ``segment_len`` scan steps, each running ``num_sims`` batched
network evaluations (B-wide matmuls on the MXU) plus the lane-major env
step, followed by an in-graph reverse-scan outcome backfill and minibatched
SGD.  No host round-trips inside an iteration.

Self-play discipline (standard AlphaZero, Silver et al. 2017):
* root Dirichlet noise on the priors (exploration);
* moves sampled proportional to visit counts for the first ``temp_moves``
  plies of each game, visit-argmax (with exact proven-win override from the
  root 1-ply solver) afterwards;
* value target z = game outcome from the mover's perspective; plies of
  games that do not finish inside the collected segment are masked out of
  the loss via the ``valid`` flag.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from gobblet_rl_tpu.models import actor_critic as ac
from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.search import mcts
from gobblet_rl_tpu.train.dqn import _obs_bf


@dataclasses.dataclass(frozen=True)
class AZConfig:
    seed: int = 42
    lr: float = 2e-3
    weight_decay: float = 1e-4
    max_grad_norm: float = 1.0
    value_coef: float = 1.0
    # self-play
    num_envs: int = 256
    num_sims: int = 64
    search: str = "puct"   # "puct" | "gumbel" (sequential halving; needs
                           # fewer sims per move — see search/gumbel.py) |
                           # "gumbel_lm" (same algorithm, lane-major tree —
                           # see search/gumbel_lm.py; fastest at scale)
    max_considered: int = 16   # gumbel: initial root candidate count
    c_puct: float = 1.5
    dirichlet_alpha: float = 0.5
    noise_frac: float = 0.25
    temp_moves: int = 8
    segment_len: int = 48
    # gumbel: use each root's mixed-value estimate as the value target for
    # plies of games that do not finish inside the segment (instead of
    # masking them out of the loss) — Danihelka et al.'s estimator makes
    # those targets cheap and accurate at low simulation counts
    bootstrap_unfinished: bool = True
    # optimization
    batch_size: int = 2048
    updates_per_iter: int = 8
    iterations: int = 32
    # model
    model: str = "conv"   # "conv" | "mlp"
    channels: int = 64
    blocks: int = 2
    hidden_sizes: tuple = (128, 128)


class AZState(NamedTuple):
    params: Any
    opt_state: Any
    env_state: Any   # bc.PlanesState


def make_net(config: AZConfig):
    if config.model == "conv":
        return ac.ConvActorCritic(channels=config.channels, blocks=config.blocks)
    return ac.MLPActorCritic(hidden_sizes=tuple(config.hidden_sizes))


def mcts_config(config: AZConfig, selfplay: bool = True) -> mcts.MCTSConfig:
    return mcts.MCTSConfig(
        num_sims=config.num_sims,
        c_puct=config.c_puct,
        dirichlet_alpha=config.dirichlet_alpha if selfplay else 0.0,
        noise_frac=config.noise_frac if selfplay else 0.0,
    )


def make_selfplay_segment(config: AZConfig, net):
    """(params, env_state, key) -> (env_state, traj dict of [L, B, ...])."""
    if config.search in ("gumbel", "gumbel_lm"):
        return _make_gumbel_segment(config, net)
    mcfg = mcts_config(config, selfplay=True)

    def net_apply(p, obs):
        return net.apply(p, obs)

    def segment(params, env_state, key):
        def body(carry, _):
            state, key = carry
            key, k_search, k_sample = jax.random.split(key, 3)
            boards_bf = jnp.transpose(state.board, (2, 0, 1))
            visits, q, root_win = mcts.mcts_search(
                net_apply, params, boards_bf, state.current, k_search, mcfg
            )
            mask = bc.legal_mask_planes(state.board, state.current).T  # [B,54]
            visits = jnp.where(mask, visits, 0.0)
            pi = visits / jnp.maximum(visits.sum(-1, keepdims=True), 1.0)

            # play: exact 1-ply wins dominate, else visit argmax; the first
            # temp_moves plies of each game sample proportional to visits
            score = jnp.where(mask, visits + 1e9 * root_win, -jnp.inf)
            a_greedy = jnp.argmax(score, axis=-1).astype(jnp.int32)
            logits_v = jnp.where(visits > 0, jnp.log(jnp.maximum(visits, 1e-9)),
                                 -jnp.inf)
            a_sample = jax.random.categorical(k_sample, logits_v).astype(jnp.int32)
            actions = jnp.where(state.turn < config.temp_moves, a_sample, a_greedy)

            obs = _obs_bf(state.board, state.current)     # int8[B,117]
            player = state.current
            s1 = bc.step_trusted(state, actions)  # search actions are mask-legal
            out = dict(obs=obs, mask=mask, pi=pi, player=player,
                       done=s1.done, winner=s1.winner)
            return (bc.autoreset_planes(s1), key), out

        (env_state, _), traj = jax.lax.scan(
            body, (env_state, key), None, length=config.segment_len
        )
        return env_state, traj

    return segment


def _make_gumbel_segment(config: AZConfig, net):
    """Gumbel self-play: the root action already carries exploration through
    the Gumbel noise (no Dirichlet, no temperature schedule) and the policy
    target is the completed-Q improved policy rather than visit counts."""
    from gobblet_rl_tpu.search import gumbel

    gcfg = gumbel.GumbelConfig(
        num_sims=config.num_sims, max_considered=config.max_considered
    )

    def net_apply(p, obs):
        return net.apply(p, obs)

    lane_major = config.search == "gumbel_lm"
    if lane_major:
        from gobblet_rl_tpu.search import gumbel_lm

    def segment(params, env_state, key):
        def body(carry, _):
            state, key = carry
            key, k_search = jax.random.split(key)
            if lane_major:
                actions, pi, q, visits, root_v = gumbel_lm.gumbel_search_lm(
                    net_apply, params, state.board, state.current, k_search,
                    gcfg,
                )
            else:
                boards_bf = jnp.transpose(state.board, (2, 0, 1))
                actions, pi, q, visits, root_v = gumbel.gumbel_search(
                    net_apply, params, boards_bf, state.current, k_search,
                    gcfg,
                )
            mask = bc.legal_mask_planes(state.board, state.current).T
            obs = _obs_bf(state.board, state.current)
            player = state.current
            s1 = bc.step_trusted(state, actions)  # search actions are mask-legal
            # mover-perspective root value -> absolute sign (+1 = player 0)
            v_signed = root_v * jnp.where(player == 0, 1.0, -1.0)
            out = dict(obs=obs, mask=mask, pi=pi, player=player,
                       done=s1.done, winner=s1.winner, v_signed=v_signed)
            return (bc.autoreset_planes(s1), key), out

        (env_state, _), traj = jax.lax.scan(
            body, (env_state, key), None, length=config.segment_len
        )
        return env_state, traj

    return segment


def assign_outcomes(done, winner, player, bootstrap_signed=None):
    """Backfill per-ply value targets from episode outcomes, in-graph.

    done bool[L,B], winner int8[L,B] (signed: +1 = player 0 won), player
    int32[L,B] (mover at that ply) -> (z float32[L,B] from the mover's
    perspective, valid bool[L,B]).

    Without ``bootstrap_signed``, plies of games that never finish inside
    the segment are masked out (valid=False).  With it (float32[L,B],
    absolute sign, e.g. the gumbel root mixed-value estimates), the
    unfinished tail bootstraps from the LAST ply's estimate instead and
    every ply is valid.
    """

    def body(carry, x):
        w, have = carry
        d, win = x
        w = jnp.where(d, win.astype(jnp.float32), w)
        have = have | d
        return (w, have), (w, have)

    B = done.shape[1]
    if bootstrap_signed is None:
        init = (jnp.zeros(B, jnp.float32), jnp.zeros(B, bool))
    else:
        init = (bootstrap_signed[-1].astype(jnp.float32), jnp.ones(B, bool))
    (_, _), (z_signed, valid) = jax.lax.scan(
        body, init, (done, winner), reverse=True
    )
    sign = jnp.where(player == 0, 1.0, -1.0)
    return z_signed * sign, valid


def make_loss_fn(config: AZConfig, net):
    """(params, batch) -> (loss, (policy_loss, value_loss)); batch carries
    obs/mask/pi/z/valid rows (invalid rows are masked out of both terms)."""

    def loss_fn(params, batch):
        logits, value = net.apply(params, batch["obs"])
        ml = jnp.where(batch["mask"], logits, -1e9)
        logp = jax.nn.log_softmax(ml, axis=-1)
        p_loss = -(batch["pi"] * jnp.where(batch["mask"], logp, 0.0)).sum(-1)
        v_loss = (jnp.tanh(value) - batch["z"]) ** 2
        w = batch["valid"].astype(jnp.float32)
        denom = jnp.maximum(w.sum(), 1.0)
        p = (p_loss * w).sum() / denom
        v = (v_loss * w).sum() / denom
        return p + config.value_coef * v, (p, v)

    return loss_fn


def flatten_segment(traj, z, valid):
    """[L, B, ...] self-play segment -> flat [L*B, ...] training rows."""
    n = z.shape[0] * z.shape[1]
    return {
        "obs": traj["obs"].reshape(n, -1),
        "mask": traj["mask"].reshape(n, -1),
        "pi": traj["pi"].reshape(n, -1),
        "z": z.reshape(n),
        "valid": valid.reshape(n),
    }


def make_update_phase(config: AZConfig, net, optimizer):
    """Minibatched SGD over a flat self-play batch — the learn half of an
    iteration, exposed separately so the DP×TP path
    (parallel/tensor_parallel.py::shard_params_tp + tests/test_sharding.py)
    can verify tensor-parallel numerics against the replicated update on
    identical data.  ``(params, opt_state, flat, k_perm) ->
    (params, opt_state, (losses, p_ls, v_ls))``."""
    loss_fn = make_loss_fn(config, net)

    def update_phase(params, opt_state, flat, k_perm):
        n = flat["z"].shape[0]
        mb = max(1, min(config.batch_size, n // max(config.updates_per_iter, 1)))
        perm = jax.random.permutation(k_perm, n)

        def update(carry, i):
            params, opt_state = carry
            idx = jax.lax.dynamic_slice_in_dim(perm, (i * mb) % max(n - mb, 1), mb)
            batch = {k: v[idx] for k, v in flat.items()}
            (loss, (p_l, v_l)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, p_l, v_l)

        (params, opt_state), aux = jax.lax.scan(
            update, (params, opt_state), jnp.arange(config.updates_per_iter)
        )
        return params, opt_state, aux

    return update_phase


def make_train_iteration(config: AZConfig, net, optimizer):
    segment = make_selfplay_segment(config, net)
    update_phase = make_update_phase(config, net, optimizer)

    @jax.jit
    def train_iteration(params, opt_state, env_state, key):
        key, k_roll, k_perm = jax.random.split(key, 3)
        env_state, traj = segment(params, env_state, k_roll)
        bootstrap = (
            traj["v_signed"]
            if config.bootstrap_unfinished and "v_signed" in traj
            else None
        )
        z, valid = assign_outcomes(
            traj["done"], traj["winner"], traj["player"], bootstrap
        )

        flat = flatten_segment(traj, z, valid)
        params, opt_state, (losses, p_ls, v_ls) = update_phase(
            params, opt_state, flat, k_perm
        )
        stats = {
            "loss": losses.mean(),
            "policy_loss": p_ls.mean(),
            "value_loss": v_ls.mean(),
            "episodes": traj["done"].sum(),
            "valid_frac": valid.mean(),
            "wins_p1": ((traj["winner"] == 1) & traj["done"]).sum(),
            "wins_p2": ((traj["winner"] == -1) & traj["done"]).sum(),
        }
        return params, opt_state, env_state, stats

    return train_iteration


def init_alphazero(config: AZConfig, key):
    net = make_net(config)
    optimizer = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adamw(config.lr, weight_decay=config.weight_decay),
    )
    params = net.init(key, jnp.zeros((1, 117), jnp.int8))
    return net, optimizer, AZState(
        params=params,
        opt_state=optimizer.init(params),
        env_state=bc.reset_planes(config.num_envs),
    )


def az_policy(net, params, num_sims: int = 128, c_puct: float = 1.5,
              lane_major: bool = True):
    """Tournament-compatible evaluation policy: noise-free MCTS on the
    trained network (see eval/tournament.py for the signature).

    ``lane_major=True`` (default) runs the search with the lane-major
    tree (search/mcts_lm.py) — with root noise off both implementations
    are deterministic and BIT-IDENTICAL for the same key (pinned in
    tests/test_mcts_lm.py), so this only changes speed."""
    cfg = mcts.MCTSConfig(num_sims=num_sims, c_puct=c_puct)
    if lane_major:
        from gobblet_rl_tpu.search import mcts_lm

        return mcts_lm.mcts_lm_policy(net, params, cfg)
    return mcts.mcts_policy(net, params, cfg)


def train(config: AZConfig = AZConfig(), logger=None, checkpoint_dir=None,
          full_resume_dir=None):
    """Run AlphaZero self-play training; returns (net, AZState, history).

    ``checkpoint_dir`` saves/restores the AZState pytree (params + optimizer
    + env batch) — enough to continue training, not bit-exact across the
    PRNG chain.  ``full_resume_dir`` additionally checkpoints the PRNG key,
    so a run preempted mid-way and resumed reproduces the uninterrupted run
    bit-for-bit (pinned by tests/test_alphazero.py; the working equivalent
    of the reference's restore sketch, example_RLlib.py:93-108)."""
    from gobblet_rl_tpu.train import checkpoint as ckpt

    key = jax.random.PRNGKey(config.seed)
    key, k_init = jax.random.split(key)
    net, optimizer, st = init_alphazero(config, k_init)
    start = 0
    if checkpoint_dir is not None:
        restored, step = ckpt.restore(checkpoint_dir, st)
        if restored is not None:
            st, start = restored, step + 1
    if full_resume_dir is not None:
        payload, step = ckpt.restore_payload(
            full_resume_dir, {"state": st, "key": key}
        )
        if payload is not None:
            st, key, start = payload["state"], payload["key"], step + 1

    it = make_train_iteration(config, net, optimizer)
    history = []
    for i in range(start, config.iterations):
        key, sub = jax.random.split(key)
        params, opt_state, env_state, stats = it(
            st.params, st.opt_state, st.env_state, sub
        )
        st = AZState(params, opt_state, env_state)
        record = {
            "iteration": i,
            "loss": float(stats["loss"]),
            "policy_loss": float(stats["policy_loss"]),
            "value_loss": float(stats["value_loss"]),
            "episodes": int(stats["episodes"]),
            "valid_frac": float(stats["valid_frac"]),
            "wins_p1": int(stats["wins_p1"]),
            "wins_p2": int(stats["wins_p2"]),
        }
        history.append(record)
        if logger is not None:
            logger.log(record)
        if checkpoint_dir is not None:
            ckpt.save(checkpoint_dir, st, i)
        if full_resume_dir is not None:
            ckpt.save_payload(full_resume_dir, {"state": st, "key": key}, i)
    return net, st, history
