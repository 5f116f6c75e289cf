"""Self-play PPO with masked policies — working replacement for the
reference's broken RLlib pipeline.

The reference trains one RLlib PPO policy per agent over the PettingZoo env
with Ray rollout workers (/root/reference/gobblet_rl/examples/example_RLlib.py:35-52
— shipped broken, see SURVEY §2 C14).  TPU-native redesign:

* two parameter sets (player_1 / player_2, ``policy_mapping_fn`` equivalent)
  or one shared set (``shared_policy=True``);
* alternating optimization: each iteration trains one side's params on the
  learner-centric MDP while the other side acts frozen inside the jitted
  collector (the roles swap every iteration) — this reuses the fused
  collect machinery and keeps the whole update on device;
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
from gobblet_rl_tpu.train.dqn import _obs_bf, _sel


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


class PPOState(NamedTuple):
    params: tuple          # (params_p0, params_p1)
    opt_states: tuple
    env_states: tuple      # per-role env state (each kept at that role's turn)


def make_net(config: PPOConfig):
    if config.model == "conv":
        return ac.ConvActorCritic()
    return ac.MLPActorCritic(hidden_sizes=tuple(config.hidden_sizes))


def _opponent_step(net, opp_params, state, key):
    """Opponent ply with its frozen actor (greedy sample)."""
    obs = _obs_bf(state.board, state.current)
    mask = bc.legal_mask_planes(state.board, state.current).T
    logits, _ = net.apply(opp_params, obs)
    action, _ = ac.sample_masked(key, logits, mask)
    return bc.step_planes(state, action)


def make_learner_rollout(config: PPOConfig, net):
    """Collect a segment for ``learner_player`` with the opponent frozen."""

    def learner_step(state, actions, key, opp_params, lp):
        s1 = bc.step_planes(state, actions)
        r = s1.rewards[lp]
        k1, k2 = jax.random.split(key)
        s2 = _opponent_step(net, opp_params, s1, k1)
        r = r + s2.rewards[lp]
        done = s2.done
        s3 = bc.autoreset_planes(s2)
        # if the learner is player 1, the (frozen) opponent opens fresh games
        need = s3.current != lp
        s4 = _opponent_step(net, opp_params, s3, k2)
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
            new_state, r, done = learner_step(env_state, action, k_step, opp_params, lp)
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


def make_train_iteration(config: PPOConfig, net, optimizer):
    rollout = make_learner_rollout(config, net)

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


def init_ppo(config: PPOConfig, key):
    net = make_net(config)
    optimizer = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.lr),
    )
    k0, k1 = jax.random.split(key)
    dummy = jnp.zeros((1, 117), jnp.int8)
    p0 = net.init(k0, dummy)
    p1 = p0 if config.shared_policy else net.init(k1, dummy)
    opt0 = optimizer.init(p0)
    opt1 = optimizer.init(p1)

    # role-specific env states: index r trains player r
    env0 = bc.reset_planes(config.num_envs)
    env1 = bc.reset_planes(config.num_envs)
    # for role 1, the frozen opponent (player 0) must open
    obs = _obs_bf(env1.board, env1.current)
    mask = bc.legal_mask_planes(env1.board, env1.current).T
    logits, _ = net.apply(p0, obs)
    a, _ = ac.sample_masked(jax.random.PRNGKey(config.seed), logits, mask)
    env1 = bc.step_planes(env1, a)

    return net, optimizer, PPOState(
        params=(p0, p1), opt_states=(opt0, opt1), env_states=(env0, env1)
    )


def train(config: PPOConfig = PPOConfig(), logger=None):
    """Alternating self-play PPO; returns (PPOState, history)."""
    key = jax.random.PRNGKey(config.seed)
    net, optimizer, st = init_ppo(config, key)
    it = make_train_iteration(config, net, optimizer)

    history = []
    for i in range(config.iterations):
        lp = i % 2 if not config.shared_policy else 0
        opp = 1 - lp
        params = list(st.params)
        opts = list(st.opt_states)
        envs = list(st.env_states)
        key, sub = jax.random.split(key)
        opp_params = params[opp] if not config.shared_policy else params[0]
        params[lp], opts[lp], envs[lp], key, stats = it(
            params[lp], opp_params, opts[lp], envs[lp], sub, lp
        )
        if config.shared_policy:
            params[1] = params[0]
        st = PPOState(tuple(params), tuple(opts), tuple(envs))
        record = {
            "iteration": i,
            "learner": lp,
            "loss": float(stats["loss"]),
            "episodes": int(stats["episodes"]),
            "mean_reward": float(stats["mean_reward"]),
        }
        history.append(record)
        if logger is not None:
            logger.log(record)
    return st, history
