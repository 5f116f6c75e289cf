"""Self-play PPO with masked policies — working replacement for the
reference's broken RLlib pipeline.

The reference trains one RLlib PPO policy per agent over the PettingZoo env
with Ray rollout workers (/root/reference/gobblet_rl/examples/example_RLlib.py:35-52
— shipped broken, see SURVEY §2 C14).  TPU-native redesign:

* two parameter sets (player_1 / player_2, ``policy_mapping_fn`` equivalent)
  or one shared set (``shared_policy=True``);
* learner-centric MDP: each env advances learner-ply + opponent-reply inside
  the jitted collector; the learner seat per env is pinned (0/1) or
  alternating even/odd (``learner_player="both"``) so one net trains as
  either color — the seat-agnostic upgrade proven on DQN
  (train/dqn.py, learner_player="both");
* pluggable frozen opponents: "self" (snapshot of own params), "random",
  "greedy" (batched depth-1/2 lookahead), "pool" (league of past
  snapshots) and "mixed" (per-iteration draw over random/greedy/pool).
  Plain self-play *cycles* — measured in round 2: a 200-iteration
  shared-policy run scored WORSE vs greedy-2 than a 40-iteration one
  (0.059 vs 0.027... both far under the 0.6 bar); the opponent pool breaks
  the cycle the same way DQN's ``opponent="mixed"`` does;
* GAE(lambda) over the learner's own timeline (terminal-only +-1 rewards),
  clipped surrogate + value loss + masked-entropy bonus.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gobblet_rl_tpu.models import actor_critic as ac
from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.policies import greedy_jax
from gobblet_rl_tpu.train.dqn import _obs_bf, _seat_reward, _sel, seat_array


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    seed: int = 42
    lr: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    epochs_per_iter: int = 4
    minibatches: int = 8
    segment_len: int = 32
    num_envs: int = 512
    iterations: int = 64
    hidden_sizes: tuple = (128, 128)
    shared_policy: bool = False
    model: str = "mlp"   # "mlp" | "conv"
    max_grad_norm: float = 0.5
    # seat(s) the learner occupies per env in shared-policy mode: 0, 1, or
    # "both" (alternating even/odd envs).  Non-shared mode alternates the
    # trained side per iteration regardless (the RLlib policy-mapping
    # equivalent).
    learner_player: int | str = 0
    # frozen opponent inside the jitted collector (shared-policy mode):
    #   "self"   — snapshot of the learner's own params (classic self-play)
    #   "random" — uniform over legal moves
    #   "greedy" — batched depth-``greedy_depth`` lookahead
    #   "pool"   — uniform draw from a league of past snapshots
    #   "search" — frozen committed AlphaZero zoo net driven by the
    #              lane-major Gumbel search (search/gumbel_lm.py) at
    #              ``search_sims`` simulations: a jittable ATTACKER that
    #              actually converts won positions, giving the league the
    #              punishing pressure greedy/pool lack (round-4 verdict:
    #              ppo_league defended worse than random because no
    #              training opponent ever executed a mate)
    #   "mixed"  — per-iteration draw over (random, greedy, pool) with
    #              3 mixed_weights, or (random, greedy, pool, search)
    #              with 4
    opponent: str = "self"
    greedy_depth: int = 2
    pool_size: int = 8        # snapshots kept by the league
    pool_every: int = 4       # iterations between snapshot pushes
    mixed_weights: tuple = (0.25, 0.25, 0.5)   # P(random, greedy, pool[, search])
    search_sims: int = 8      # gumbel simulations of the "search" attacker
    search_entry: str = "alphazero_gumbel32"   # zoo entry it plays with
    # solver-supervised defense distillation (train/defense.py): > 0 adds a
    # behavior-cloning term on the exact solver's mate-maximizing defensive
    # moves, over positions on the oracle's own attack paths.  Terminal-only
    # rewards carry almost no pro-survival gradient (losing later only
    # changes the return by the gamma-timing factor, which normalized
    # advantages wash out) — measured round 5: the search league alone left
    # survival at 5.1 plies; the audit target is greedy-2's 9.8.
    defense_bc_weight: float = 0.0
    defense_bank_games: int = 256
    defense_bank_depth: int = 16
    # "defense" labels only P2 (lost) positions; "both" also labels P1
    # (won) positions with the solver's fastest attack — generalizes
    # conversion beyond the solver's own defense lines (train/defense.py)
    defense_bank_sides: str = "defense"

    def __post_init__(self):
        # non-shared (alternating two-policy) mode is pure self-play; catch
        # the incompatible combination at construction so every entry point
        # (train(), init_ppo() + make_train_iteration(), sharded_ppo)
        # enforces it, not just train()
        if not self.shared_policy and self.opponent != "self":
            raise ValueError(
                "non-shared (alternating two-policy) mode is pure self-play; "
                f"set shared_policy=True to use opponent={self.opponent!r}"
            )
        if self.opponent == "mixed" and len(self.mixed_weights) not in (3, 4):
            raise ValueError(
                "mixed_weights must have 3 entries (random, greedy, pool) or "
                f"4 (+ search); got {self.mixed_weights!r}"
            )


class PPOState(NamedTuple):
    params: tuple          # (params_p0, params_p1)
    opt_states: tuple
    env_states: tuple      # per-role env state (each kept at that role's turn)


def make_net(config: PPOConfig):
    if config.model == "conv":
        return ac.ConvActorCritic()
    return ac.MLPActorCritic(hidden_sizes=tuple(config.hidden_sizes))


def _resolve_kind(config: PPOConfig, kind: str | None) -> str:
    """Opponent kind actually compiled into a rollout: ``pool`` and ``mixed``
    are host-level policies over the compiled (random|greedy|self|search)
    variants."""
    kind = kind if kind is not None else config.opponent
    return "self" if kind in ("self", "pool", "mixed") else kind


def make_opponent_fn(config: PPOConfig, net, kind: str | None = None):
    """(key, board, current, opp_params) -> int32[B] opponent actions."""
    kind = _resolve_kind(config, kind)
    if kind == "random":

        def fn(key, board, current, opp_params):
            return bc.sample_random_lm(key, bc.legal_mask_planes(board, current))

    elif kind == "greedy":

        def fn(key, board, current, opp_params):
            return greedy_jax.greedy_actions(key, board, current, config.greedy_depth)

    elif kind == "self":

        def fn(key, board, current, opp_params):
            obs = _obs_bf(board, current)
            mask = bc.legal_mask_planes(board, current).T
            logits, _ = net.apply(opp_params, obs)
            action, _ = ac.sample_masked(key, logits, mask)
            return action

    elif kind == "search":
        # frozen zoo AlphaZero net + lane-major Gumbel search: the params
        # are closed-over constants (opp_params is the LEARNER net's pytree
        # and is ignored), so the attacker compiles straight into the
        # rollout scan with no extra inputs
        from gobblet_rl_tpu import zoo
        from gobblet_rl_tpu.search import gumbel as gsearch
        from gobblet_rl_tpu.search import gumbel_lm

        az_net, az_params, _ = zoo.load(
            config.search_entry, expect_family="alphazero"
        )
        gcfg = gsearch.GumbelConfig(
            num_sims=config.search_sims,
            max_considered=min(16, max(2, config.search_sims)),
        )

        def fn(key, board, current, opp_params):
            actions, *_ = gumbel_lm.gumbel_search_lm(
                lambda p, o: az_net.apply(p, o), az_params, board, current,
                key, gcfg,
            )
            return actions

    else:
        raise ValueError(f"unknown opponent {kind!r}")
    return fn


def make_learner_rollout(config: PPOConfig, net, opponent_fn=None):
    """Collect a segment for the learner seat(s) with the opponent frozen.

    ``lp`` (0 | 1 | "both") is the learner seat spec and must be static."""
    if opponent_fn is None:
        opponent_fn = make_opponent_fn(config, net)

    def learner_step(state, actions, key, opp_params, lp):
        # trusted steps: all actions are mask-derived (see bc.step_trusted)
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
            # need the (frozen) opponent to move first
            need = s3.current != seat
            a0 = opponent_fn(k2, s3.board, s3.current, opp_params)
            s4 = bc.step_trusted(s3, a0)
            s3 = jax.tree.map(partial(_sel, need), s4, s3)
        return s3, r, done

    def rollout(params, opp_params, env_state, key, lp):
        def body(carry, _):
            env_state, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            obs = _obs_bf(env_state.board, env_state.current)
            mask = bc.legal_mask_planes(env_state.board, env_state.current).T
            logits, value = net.apply(params, obs)
            action, logp = ac.sample_masked(k_act, logits, mask)
            new_state, r, done = learner_step(
                env_state, action, k_step, opp_params, lp
            )
            out = dict(obs=obs, mask=mask.astype(bool), action=action,
                       logp=logp, value=value, reward=r, done=done)
            return (new_state, key), out

        (env_state, key), traj = jax.lax.scan(
            body, (env_state, key), None, length=config.segment_len
        )
        # bootstrap value of the final state
        obs_last = _obs_bf(env_state.board, env_state.current)
        _, last_value = net.apply(params, obs_last)
        return env_state, traj, last_value, key

    return rollout


def compute_gae(traj, last_value, gamma, lam):
    """Standard GAE over the learner timeline; resets cut the recursion."""

    def body(carry, x):
        gae, next_value = carry
        value, reward, done = x
        nonterminal = 1.0 - done.astype(jnp.float32)
        delta = reward + gamma * next_value * nonterminal - value
        gae = delta + gamma * lam * nonterminal * gae
        return (gae, value), gae

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (traj["value"], traj["reward"], traj["done"]),
        reverse=True,
    )
    returns = advantages + traj["value"]
    return advantages, returns


def make_train_iteration(config: PPOConfig, net, optimizer,
                         opponent_kind: str | None = None,
                         defense_bank: dict | None = None):
    rollout = make_learner_rollout(
        config, net, make_opponent_fn(config, net, opponent_kind)
    )

    def loss_fn(params, batch):
        logits, value = net.apply(params, batch["obs"])
        logp, entropy = ac.logp_entropy(logits, batch["mask"], batch["action"])
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        unclipped = ratio * adv
        clipped = jnp.clip(ratio, 1 - config.clip_eps, 1 + config.clip_eps) * adv
        pg_loss = -jnp.minimum(unclipped, clipped).mean()
        v_loss = jnp.mean((value - batch["ret"]) ** 2)
        ent = entropy.mean()
        total = pg_loss + config.vf_coef * v_loss - config.ent_coef * ent
        if defense_bank is not None:
            # defense distillation: masked cross-entropy to the solver's
            # mate-maximizing move over the (small, fixed) bank — cheap
            # enough to use the WHOLE bank every update
            blogits, _ = net.apply(params, defense_bank["obs"])
            bl = jnp.where(defense_bank["mask"], blogits, -1e9)
            blogp = jax.nn.log_softmax(bl, axis=-1)
            bc = -jnp.take_along_axis(
                blogp, defense_bank["action"][:, None], axis=1
            ).mean()
            total = total + config.defense_bc_weight * bc
        return total, (pg_loss, v_loss, ent)

    @partial(jax.jit, static_argnums=(5,))
    def train_iteration(params, opp_params, opt_state, env_state, key, lp):
        key, k_roll = jax.random.split(key)
        env_state, traj, last_value, key = rollout(
            params, opp_params, env_state, k_roll, lp
        )
        adv, ret = compute_gae(traj, last_value, config.gamma, config.gae_lambda)
        L, B = adv.shape
        flat = {
            "obs": traj["obs"].reshape(L * B, -1),
            "mask": traj["mask"].reshape(L * B, -1),
            "action": traj["action"].reshape(L * B),
            "logp": traj["logp"].reshape(L * B),
            "adv": adv.reshape(L * B),
            "ret": ret.reshape(L * B),
        }
        n = L * B
        mb = n // config.minibatches

        def epoch_body(carry, _):
            params, opt_state, key = carry
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n)

            def mb_body(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                batch = {k: v[idx] for k, v in flat.items()}
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch
                )
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                mb_body, (params, opt_state), jnp.arange(config.minibatches)
            )
            return (params, opt_state, key), losses.mean()

        (params, opt_state, key), losses = jax.lax.scan(
            epoch_body, (params, opt_state, key), None, length=config.epochs_per_iter
        )
        stats = {
            "loss": losses.mean(),
            "episodes": traj["done"].sum(),
            "mean_reward": (traj["reward"] * traj["done"]).sum()
            / jnp.maximum(traj["done"].sum(), 1),
        }
        return params, opt_state, env_state, key, stats

    return train_iteration


def init_env_state(config: PPOConfig, opponent_fn, opp_params, key, lp):
    """Fresh env batch advanced to the learner seat's turn everywhere."""
    state = bc.reset_planes(config.num_envs)
    if lp == 0:
        return state
    seat = seat_array(lp, config.num_envs)
    need = state.current != seat
    a0 = opponent_fn(key, state.board, state.current, opp_params)
    stepped = bc.step_planes(state, a0)
    return jax.tree.map(partial(_sel, need), stepped, state)


def init_ppo(config: PPOConfig, key):
    net = make_net(config)
    optimizer = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.lr),
    )
    k0, k1, k_env = jax.random.split(key, 3)
    dummy = jnp.zeros((1, 117), jnp.int8)
    p0 = net.init(k0, dummy)
    p1 = p0 if config.shared_policy else net.init(k1, dummy)
    opt0 = optimizer.init(p0)
    opt1 = optimizer.init(p1)

    opponent_fn = make_opponent_fn(config, net)
    # role-specific env states: index r is kept at role r's turn.  Shared
    # mode only ever plays role 0, so skip the dead env1 build (it would
    # pay a full opponent action — e.g. a batched depth-2 greedy lookahead
    # — whose result is never read).
    lp0 = config.learner_player if config.shared_policy else 0
    env0 = init_env_state(config, opponent_fn, p1, k_env, lp0)
    env1 = env0 if config.shared_policy else init_env_state(
        config, opponent_fn, p0, k_env, 1
    )

    return net, optimizer, PPOState(
        params=(p0, p1), opt_states=(opt0, opt1), env_states=(env0, env1)
    )


def train(config: PPOConfig = PPOConfig(), logger=None, full_resume_dir=None):
    """PPO training; returns (PPOState, history).

    ``shared_policy=False`` (reference-equivalent): two parameter sets
    alternate learner/frozen roles each iteration, pure self-play.

    ``shared_policy=True``: one parameter set trains on the seat(s) given by
    ``learner_player`` against the configured ``opponent``; ``pool`` / the
    pool leg of ``mixed`` sample a frozen past snapshot per iteration.

    ``full_resume_dir`` checkpoints the COMPLETE training state each
    iteration — both parameter/optimizer sets, both env batches, the PRNG
    key, the league snapshot pool AND the host-side opponent-draw RNG — so
    a preempted run resumed from it reproduces the uninterrupted run
    bit-for-bit (tests/test_ppo.py; working equivalent of the reference's
    restore sketch, example_RLlib.py:93-108).
    """
    key = jax.random.PRNGKey(config.seed)
    net, optimizer, st = init_ppo(config, key)

    rng = np.random.default_rng(config.seed)
    bank = None
    if config.defense_bc_weight > 0:
        from gobblet_rl_tpu.train import defense

        raw = defense.generate_defense_bank(
            num_games=config.defense_bank_games, seed=config.seed,
            depth=config.defense_bank_depth, sides=config.defense_bank_sides,
        )
        bank = {k: jnp.asarray(raw[k]) for k in ("obs", "mask", "action")}
    if config.shared_policy:
        if config.opponent == "mixed":
            kinds = ("random", "greedy", "self")
            if len(config.mixed_weights) == 4:
                kinds = kinds + ("search",)
        else:
            kinds = (_resolve_kind(config, None),)
        its = {k: make_train_iteration(config, net, optimizer, k, bank)
               for k in kinds}
        pool = [st.params[0]]  # league seed: the untrained net
    else:
        # config.opponent == "self" is guaranteed by PPOConfig.__post_init__
        its = {"self": make_train_iteration(config, net, optimizer, "self", bank)}
        pool = []

    start = 0
    if full_resume_dir is not None:
        from gobblet_rl_tpu.train import checkpoint as ckpt

        step = ckpt.latest_step(full_resume_dir)
        if step is not None:
            meta = ckpt.load_meta(full_resume_dir, step)
            if meta is None:
                # save_payload writes meta before the Orbax commit, so a
                # restorable step without meta means a damaged/foreign dir;
                # silently guessing pool_len / skipping rng_state would break
                # the documented bit-exact resume guarantee.
                raise RuntimeError(
                    f"checkpoint step {step} in {full_resume_dir!r} has no "
                    f"meta-{step}.json sidecar — cannot resume bit-exactly"
                )
            pool_len = int(meta.get("pool_len", len(pool)))
            template = {
                "state": st, "key": key,
                "pool": [st.params[0]] * pool_len,
            }
            payload, _ = ckpt.restore_payload(full_resume_dir, template, step)
            st = payload["state"]
            key = payload["key"]
            pool = list(payload["pool"])
            if "rng_state" in meta:
                rng.bit_generator.state = meta["rng_state"]
            start = step + 1

    history = []
    for i in range(start, config.iterations):
        params = list(st.params)
        opts = list(st.opt_states)
        envs = list(st.env_states)
        key, sub = jax.random.split(key)

        if config.shared_policy:
            lp, role = config.learner_player, 0
            if config.opponent == "mixed":
                choices = ["random", "greedy", "pool", "search"]
                choices = choices[: len(config.mixed_weights)]
                kind = rng.choice(choices, p=list(config.mixed_weights))
            else:
                kind = config.opponent
            if kind == "pool":
                opp_params = pool[int(rng.integers(len(pool)))]
                kind = "self"
            elif kind == "self":
                opp_params = params[0]
            else:
                opp_params = params[0]  # unused by random/greedy/search variants
        else:
            lp = role = i % 2
            kind = "self"
            opp_params = params[1 - role]

        params[role], opts[role], envs[role], key, stats = its[kind](
            params[role], opp_params, opts[role], envs[role], sub, lp
        )
        if config.shared_policy:
            params[1] = params[0]
            if config.opponent in ("pool", "mixed") and (i + 1) % config.pool_every == 0:
                pool.append(params[0])
                if len(pool) > config.pool_size:
                    pool.pop(0)
        st = PPOState(tuple(params), tuple(opts), tuple(envs))
        record = {
            "iteration": i,
            "learner": lp,
            "opponent": kind if config.shared_policy else "self",
            "loss": float(stats["loss"]),
            "episodes": int(stats["episodes"]),
            "mean_reward": float(stats["mean_reward"]),
        }
        history.append(record)
        if logger is not None:
            logger.log(record)
        if full_resume_dir is not None:
            from gobblet_rl_tpu.train import checkpoint as ckpt

            ckpt.save_payload(
                full_resume_dir,
                {"state": st, "key": key, "pool": pool},
                i,
                meta={
                    "pool_len": len(pool),
                    "rng_state": rng.bit_generator.state,
                },
            )
    return st, history
