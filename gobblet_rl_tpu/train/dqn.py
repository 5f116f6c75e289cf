"""On-device actor-learner DQN with opponent-in-the-loop self-play.

Reproduces the reference Tianshou pipeline
(/root/reference/gobblet_rl/examples/example_tianshou_DQN.py) as one fused
TPU program per iteration:

* MLP Q-net 117 -> [128]*4 -> 54 (example_tianshou_DQN.py:161-166);
* gamma=0.9, n_step=3, target_update_freq=320, lr=1e-4, eps_train=0.1 /
  eps_test=0.05, MSE TD loss (DQNPolicy defaults, :169-175);
* learner-centric MDP: the env advances learner-ply + opponent-reply inside
  the jitted collector, replacing MultiAgentPolicyManager's host dispatch
  (:208, SURVEY §2 table);
* replay + update + periodic target sync all on device (SURVEY §2:
  VectorReplayBuffer -> donated ring buffer);
* self-play generations: opponent params <- learner params snapshot each
  generation, mirroring the deepcopy loop (:335-369).

The opponent is a pluggable jitted policy: "random", "greedy" (batched
depth-1/2 lookahead) or "self" (frozen Q-net params).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gobblet_rl_tpu.models.mlp import QNet, masked_argmax, masked_q
from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.policies import greedy_jax
from gobblet_rl_tpu.train import replay


@dataclasses.dataclass(frozen=True)
class DQNConfig:
    """Knob names follow the reference CLI (example_tianshou_DQN.py:28-136)
    where they survive the redesign."""

    seed: int = 42
    eps_train: float = 0.1
    eps_test: float = 0.05
    buffer_size: int = 1 << 18
    lr: float = 1e-4
    gamma: float = 0.9
    n_step: int = 3
    target_update_freq: int = 320
    epoch: int = 10
    step_per_epoch: int = 64          # collect iterations per epoch
    segment_len: int = 16             # learner steps per collect iteration
    update_per_collect: int = 8       # gradient steps per collect iteration
    batch_size: int = 1024
    hidden_sizes: tuple = (128, 128, 128, 128)
    # upgrades over the reference's vanilla DQN (knobs; both measurably
    # lift the vs-greedy-2 plateau past the reference's "optimal ~0.7"):
    double: bool = True        # double-DQN action selection for the target
    dueling: bool = True       # dueling value/advantage head (models/mlp.py)
    eps_eval: float = 0.0      # evaluation epsilon (reference tests at 0.05)
    num_envs: int = 1024
    # 0 / 1 pin the learner to one seat (the reference's setup,
    # example_tianshou_DQN.py:82-86); "both" assigns alternating per-env
    # seats so one net trains (and evaluates) as either player — closes the
    # seat asymmetry a color-swapped tournament exposes in seat-pinned runs
    learner_player: int | str = 0
    opponent: str = "random"          # "random" | "greedy" | "self" | "mixed"
    greedy_depth: int = 2
    # opponent == "mixed": per-iteration draw over (random, greedy, self).
    # Plain generation self-play (deepcopy loop, example_tianshou_DQN.py:335-369)
    # overfits to exploiting the frozen snapshot — measured in round 1: 99%
    # vs the snapshot but 2% vs greedy.  Mixing keeps general strength.
    mixed_weights: tuple = (0.25, 0.25, 0.5)
    # solver-supervised defense distillation (train/defense.py, round 5 —
    # same mechanism as PPOConfig.defense_bc_weight): > 0 adds a
    # cross-entropy term over masked Q-values (as logits) toward the exact
    # solver's mate-maximizing defensive moves, pushing the argmax policy
    # toward optimal defense in lost positions the opponent never reaches
    defense_bc_weight: float = 0.0
    defense_bank_games: int = 256
    defense_bank_depth: int = 16


class TrainState(NamedTuple):
    params: Any
    target_params: Any
    opponent_params: Any   # used when opponent == "self"
    opt_state: Any
    grad_steps: jnp.ndarray


def _obs_bf(board, current):
    """Batch-first flattened observation for the Q-net: int8[B, 117]."""
    return bc.features_lm(board, current).T


def _sel(pred, a, b):
    """Select lane-major pytree leaves by a [B] predicate."""
    return jnp.where(pred.reshape((1,) * (a.ndim - 1) + (-1,)), a, b)


def make_opponent_fn(config: DQNConfig, net: QNet):
    """(key, board, current, opponent_params) -> int32[B] actions."""
    if config.opponent == "random":

        def fn(key, board, current, opp_params):
            mask = bc.legal_mask_planes(board, current)
            return bc.sample_random_lm(key, mask)

    elif config.opponent == "greedy":

        def fn(key, board, current, opp_params):
            return greedy_jax.greedy_actions(key, board, current, config.greedy_depth)

    elif config.opponent == "self":

        def fn(key, board, current, opp_params):
            mask = bc.legal_mask_planes(board, current).T
            q = net.apply(opp_params, _obs_bf(board, current))
            return masked_argmax(q, mask)

    else:
        raise ValueError(f"unknown opponent {config.opponent!r}")
    return fn


def _eps_greedy(key, q, mask_bf, eps):
    """Masked epsilon-greedy (tianshou DQNPolicy exploration semantics)."""
    B = q.shape[0]
    k_u, k_r = jax.random.split(key)
    greedy = masked_argmax(q, mask_bf)
    rand = bc.sample_random_lm(k_r, mask_bf.T)
    explore = jax.random.uniform(k_u, (B,)) < eps
    return jnp.where(explore, rand, greedy)


def seat_array(learner_player, batch: int) -> jnp.ndarray:
    """int32[B] learner seat per env: constant for a pinned seat, alternating
    even/odd envs for ``"both"`` (works at any per-shard batch size)."""
    if learner_player == "both":
        return (jnp.arange(batch, dtype=jnp.int32) % 2)
    return jnp.full(batch, learner_player, jnp.int32)


def _seat_reward(rewards, seat):
    """float32[B]: each env's reward from its learner seat's perspective."""
    return jnp.where(seat == 0, rewards[0], rewards[1])


def make_learner_step(config: DQNConfig, opponent_fn):
    """One learner transition: learner ply + opponent reply + auto-reset,
    keeping every env at its learner seat's turn."""
    lp = config.learner_player

    def learner_step(state, actions, key, opp_params):
        # trusted steps: every action is mask-derived (eps-greedy argmax,
        # mask sampler, greedy/self opponents), so the legality
        # re-derivation of step_planes is skipped — bit-identical outcome
        # (tests/test_batched_core.py), ~15% of device time at the 262k knee
        seat = seat_array(lp, state.current.shape[0])
        s1 = bc.step_trusted(state, actions)
        r = _seat_reward(s1.rewards, seat)
        k1, k2 = jax.random.split(key)
        a_opp = opponent_fn(k1, s1.board, s1.current, opp_params)
        s2 = bc.step_trusted(s1, a_opp)  # frozen no-op where s1.done
        r = r + _seat_reward(s2.rewards, seat)
        done = s2.done
        s3 = bc.autoreset_planes(s2)
        if lp != 0:
            # after a reset, player 0 opens; envs whose learner seat is 1
            # need the opponent to move first
            need = s3.current != seat
            a0 = opponent_fn(k2, s3.board, s3.current, opp_params)
            s4 = bc.step_trusted(s3, a0)
            s3 = jax.tree.map(partial(_sel, need), s4, s3)
        return s3, r, done

    return learner_step


def init_env_state(config: DQNConfig, opponent_fn, opp_params, key):
    state = bc.reset_planes(config.num_envs)
    if config.learner_player != 0:
        seat = seat_array(config.learner_player, config.num_envs)
        need = state.current != seat
        a0 = opponent_fn(key, state.board, state.current, opp_params)
        stepped = bc.step_planes(state, a0)
        state = jax.tree.map(partial(_sel, need), stepped, state)
    return state


def make_train_iteration(config: DQNConfig, net: QNet, optimizer,
                         defense_bank: dict | None = None):
    opponent_fn = make_opponent_fn(config, net)
    learner_step = make_learner_step(config, opponent_fn)
    L = config.segment_len + config.n_step - 1  # tail for full n-step horizon

    def collect(ts: TrainState, env_state, key):
        def body(carry, _):
            env_state, key = carry
            key, k_eps, k_step = jax.random.split(key, 3)
            obs = _obs_bf(env_state.board, env_state.current)
            mask = bc.legal_mask_planes(env_state.board, env_state.current).T
            q = net.apply(ts.params, obs)
            actions = _eps_greedy(k_eps, q, mask, config.eps_train)
            new_state, r, done = learner_step(
                env_state, actions, k_step, ts.opponent_params
            )
            # only the raw state snapshot is emitted — the replay ring
            # stores states, not features (train/replay.py): ~4.6x less
            # HBM traffic on the measured binding resource
            return (new_state, key), (
                env_state.board, env_state.current, actions, r, done
            )

        (env_state, key), (boards, currents, actions, r, done) = jax.lax.scan(
            body, (env_state, key), None, length=L
        )
        sseg = replay.StateSegment(
            board=jnp.concatenate([boards, env_state.board[None]]),
            current=jnp.concatenate([currents, env_state.current[None]]),
            action=actions,
            reward=r,
            done=done,
        )
        return env_state, sseg, key

    def update(ts: TrainState, batch):
        obs, action, reward_n, done_n, obs_n, mask_n = batch
        q_next = masked_q(net.apply(ts.target_params, obs_n), mask_n)
        if config.double:
            # double-DQN: online net picks the action, target net rates it
            a_star = jnp.argmax(
                masked_q(net.apply(ts.params, obs_n), mask_n), axis=-1
            )
            q_star = jnp.take_along_axis(q_next, a_star[:, None], axis=-1)[:, 0]
        else:
            q_star = jnp.max(q_next, axis=-1)
        target = reward_n + (config.gamma ** config.n_step) * (~done_n) * q_star
        target = jax.lax.stop_gradient(target)

        def loss_fn(params):
            q = net.apply(params, obs)
            q_a = jnp.take_along_axis(q, action[:, None], axis=-1)[:, 0]
            loss = jnp.mean((q_a - target) ** 2)
            if defense_bank is not None:
                # defense distillation: treat masked Q as logits and push
                # the argmax toward the solver's mate-maximizing move over
                # the (small, fixed) bank — whole bank every update
                bq = net.apply(params, defense_bank["obs"])
                bl = jnp.where(defense_bank["mask"], bq, -1e9)
                blogp = jax.nn.log_softmax(bl, axis=-1)
                bc = -jnp.take_along_axis(
                    blogp, defense_bank["action"][:, None], axis=1
                ).mean()
                loss = loss + config.defense_bc_weight * bc
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(ts.params)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        grad_steps = ts.grad_steps + 1
        sync = grad_steps % config.target_update_freq == 0
        target_params = jax.tree.map(
            lambda t, p: jnp.where(sync, p, t), ts.target_params, params
        )
        return (
            ts._replace(
                params=params,
                target_params=target_params,
                opt_state=opt_state,
                grad_steps=grad_steps,
            ),
            loss,
        )

    @partial(jax.jit, donate_argnums=(2,))
    def train_iteration(ts: TrainState, env_state, buffer, key):
        key, k_collect = jax.random.split(key)
        env_state, sseg, key = collect(ts, env_state, k_collect)
        # positions keep a full n-step horizon; the fold is pure slicing
        buffer = replay.insert_segment(
            buffer, sseg, config.n_step, config.gamma, config.segment_len
        )

        # one gather for ALL minibatches (the buffer is fixed during the
        # update phase, so this is distribution-identical to per-update
        # sampling and replaces U serialized row gathers with one)
        key, k_sample = jax.random.split(key)
        U = config.update_per_collect
        flat_batch = replay.sample(buffer, k_sample, config.batch_size * U)
        minibatches = jax.tree.map(
            lambda x: x.reshape((U, config.batch_size) + x.shape[1:]),
            flat_batch,
        )

        def upd(ts, batch):
            ts, loss = update(ts, batch)
            return ts, loss

        ts, losses = jax.lax.scan(upd, ts, minibatches)
        return ts, env_state, buffer, key, losses.mean()

    return train_iteration, opponent_fn


def init_train_state(config: DQNConfig, net: QNet, optimizer, key) -> TrainState:
    dummy = jnp.zeros((1, 117), jnp.int8)
    params = net.init(key, dummy)
    return TrainState(
        params=params,
        target_params=params,
        opponent_params=params,
        opt_state=optimizer.init(params),
        grad_steps=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------
def make_net(config: DQNConfig) -> QNet:
    return QNet(hidden_sizes=tuple(config.hidden_sizes), dueling=config.dueling)


def make_eval_fn(config: DQNConfig, net: QNet, opponent_fn):
    """Win/loss/other counts of the eps_eval-greedy learner vs the opponent
    (eps_eval defaults to 0: pure policy strength; the reference's test
    epsilon was 0.05)."""

    @partial(jax.jit, static_argnums=(3, 4))
    def evaluate(params, opp_params, key, num_steps: int = 64, num_envs: int = 512):
        state = bc.reset_planes(num_envs)
        seat = seat_array(config.learner_player, num_envs)
        lsign = jnp.where(seat == 0, 1, -1).astype(jnp.int8)

        def ply(carry, _):
            state, key = carry
            key, k_eps, k_opp = jax.random.split(key, 3)
            mask = bc.legal_mask_planes(state.board, state.current)
            q = net.apply(params, _obs_bf(state.board, state.current))
            a_learn = _eps_greedy(k_eps, q, mask.T, config.eps_eval)
            a_opp = opponent_fn(k_opp, state.board, state.current, opp_params)
            actions = jnp.where(state.current == seat, a_learn, a_opp)
            stepped = bc.step_trusted(state, actions)
            out = (
                (stepped.winner == lsign).sum(dtype=jnp.int32),
                (stepped.winner == -lsign).sum(dtype=jnp.int32),
                (stepped.done & (stepped.winner == 0)).sum(dtype=jnp.int32),
            )
            return (bc.autoreset_planes(stepped), key), out

        (_, key), (w, l, other) = jax.lax.scan(ply, (state, key), None, length=num_steps)
        return w.sum(), l.sum(), other.sum()

    return evaluate


# ---------------------------------------------------------------------------
# Host training loop
# ---------------------------------------------------------------------------
def train(
    config: DQNConfig = DQNConfig(),
    logger=None,
    generations: int = 1,
    checkpoint_dir: str | None = None,
    full_resume_dir: str | None = None,
):
    """Train a masked DQN; returns (final TrainState, history list).

    ``generations > 1`` runs the self-play loop (opponent := learner snapshot
    each generation, example_tianshou_DQN.py:335-369).

    ``full_resume_dir`` saves/restores the COMPLETE actor-learner state
    (params + optimizer + env batch + replay buffer + PRNG key) each epoch,
    plus a meta sidecar with the epoch counter and the host-side mixed-
    opponent RNG state — a run preempted mid-way and relaunched with the
    same flags continues the generations/epoch schedule exactly where it
    stopped and reproduces the uninterrupted run bit-for-bit (same
    discipline as alphazero.train / ppo.train; pinned by
    tests/test_aux_subsystems.py)."""
    import dataclasses

    net = make_net(config)
    optimizer = optax.adam(config.lr)
    key = jax.random.PRNGKey(config.seed)
    key, k_init, k_env = jax.random.split(key, 3)
    ts = init_train_state(config, net, optimizer, k_init)

    rng_mix = np.random.default_rng(config.seed)
    bank = None
    if config.defense_bc_weight > 0:
        from gobblet_rl_tpu.train import defense

        raw = defense.generate_defense_bank(
            num_games=config.defense_bank_games, seed=config.seed,
            depth=config.defense_bank_depth,
        )
        bank = {k: jnp.asarray(raw[k]) for k in ("obs", "mask", "action")}
    if config.opponent == "mixed":
        variants = {
            kind: make_train_iteration(
                dataclasses.replace(config, opponent=kind), net, optimizer,
                bank,
            )
            for kind in ("random", "greedy", "self")
        }
        kinds = list(variants)

        def pick_iteration():
            kind = rng_mix.choice(kinds, p=list(config.mixed_weights))
            return variants[kind][0]

        # evaluation + env bootstrap use the greedy opponent (the hardest)
        train_iteration, opponent_fn = variants["greedy"]
    else:
        train_iteration, opponent_fn = make_train_iteration(
            config, net, optimizer, bank
        )

        def pick_iteration():
            return train_iteration

    evaluate = make_eval_fn(config, net, opponent_fn)
    env_state = init_env_state(config, opponent_fn, ts.opponent_params, k_env)
    buffer = replay.make_buffer(config.buffer_size)

    start = 0  # flat epoch counter: e = gen * config.epoch + epoch
    if full_resume_dir is not None:
        from gobblet_rl_tpu.train import checkpoint as ckpt

        template = {
            "train_state": ts, "env_state": env_state,
            "buffer": buffer, "key": key,
        }
        restored, step = ckpt.restore_payload(full_resume_dir, template)
        if restored is not None:
            ts = restored["train_state"]
            env_state = restored["env_state"]
            buffer = restored["buffer"]
            key = restored["key"]
            start = step + 1
            meta = ckpt.load_meta(full_resume_dir, step)
            if meta is None:
                raise RuntimeError(
                    f"checkpoint step {step} in {full_resume_dir!r} has no "
                    f"meta-{step}.json sidecar — cannot resume bit-exactly"
                )
            rng_mix.bit_generator.state = meta["rng_mix_state"]

    history = []
    for e in range(start, generations * config.epoch):
        gen, epoch = divmod(e, config.epoch)
        losses = []
        for _ in range(config.step_per_epoch):
            key, sub = jax.random.split(key)
            ts, env_state, buffer, key, loss = pick_iteration()(
                ts, env_state, buffer, sub
            )
            losses.append(loss)  # device scalar; sync once per epoch
        losses = [float(x) for x in jax.device_get(losses)]
        key, k_eval = jax.random.split(key)
        w, l, other = evaluate(ts.params, ts.opponent_params, k_eval)
        w, l, other = int(w), int(l), int(other)
        win_rate = w / max(w + l + other, 1)
        record = {
            "generation": gen,
            "epoch": epoch,
            "loss": float(np.mean(losses)),
            "win_rate": win_rate,
            "wins": w,
            "losses_games": l,
            "other": other,
            "grad_steps": int(ts.grad_steps),
        }
        history.append(record)
        if logger is not None:
            logger.log(record)
        # self-play generation hand-off (deepcopy equivalent) — BEFORE the
        # resume point is written, so a relaunch after the last epoch of a
        # generation sees the handed-off opponent
        if epoch == config.epoch - 1:
            ts = ts._replace(opponent_params=ts.params)
        if checkpoint_dir is not None:
            from gobblet_rl_tpu.train import checkpoint as ckpt

            ckpt.save(checkpoint_dir, ts, step=int(ts.grad_steps))
        if full_resume_dir is not None:
            from gobblet_rl_tpu.train import checkpoint as ckpt

            ckpt.save_payload(
                full_resume_dir,
                {"train_state": ts, "env_state": env_state,
                 "buffer": buffer, "key": key},
                step=e,
                meta={"rng_mix_state": rng_mix.bit_generator.state},
            )
    return ts, history
