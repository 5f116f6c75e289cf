"""AlphaZero trainer: self-play targets, outcome backfill, learning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.train import alphazero as az


def tiny_config(**kw):
    base = dict(
        num_envs=8, num_sims=12, segment_len=16, temp_moves=4,
        batch_size=32, updates_per_iter=2, iterations=2,
        model="mlp", hidden_sizes=(32, 32),
    )
    base.update(kw)
    return az.AZConfig(**base)


def test_assign_outcomes_matches_python():
    rng = np.random.default_rng(0)
    L, B = 24, 5
    done = np.zeros((L, B), bool)
    winner = np.zeros((L, B), np.int8)
    player = rng.integers(0, 2, (L, B)).astype(np.int32)
    for b in range(B):
        t = 0
        while t < L:
            ep_len = int(rng.integers(2, 9))
            end = t + ep_len - 1
            if end < L:
                done[end, b] = True
                winner[end, b] = rng.choice([-1, 1])
            t += ep_len

    z, valid = az.assign_outcomes(
        jnp.asarray(done), jnp.asarray(winner), jnp.asarray(player)
    )
    z, valid = np.asarray(z), np.asarray(valid)

    # python reference: each ply's outcome is the winner of the done that
    # closes its episode (the first done at or after it), mover-perspective
    for b in range(B):
        nxt = None
        for t in reversed(range(L)):
            if done[t, b]:
                nxt = winner[t, b]
            if nxt is None:
                assert not valid[t, b]
            else:
                assert valid[t, b]
                expect = float(nxt) * (1.0 if player[t, b] == 0 else -1.0)
                assert z[t, b] == expect, (t, b)


def test_selfplay_segment_targets_are_consistent():
    config = tiny_config()
    net, optimizer, st = az.init_alphazero(config, jax.random.PRNGKey(0))
    segment = az.make_selfplay_segment(config, net)
    env_state, traj = jax.jit(segment)(
        st.params, st.env_state, jax.random.PRNGKey(1)
    )
    pi = np.asarray(traj["pi"])
    mask = np.asarray(traj["mask"])
    assert pi.shape == (config.segment_len, config.num_envs, 54)
    # policy targets are a distribution over legal actions only
    assert (pi >= 0).all()
    assert (pi[~mask] == 0).all()
    sums = pi.sum(-1)
    assert np.allclose(sums, 1.0, atol=1e-5), (sums.min(), sums.max())
    # winners are decisive whenever a game ends (actions come from the mask)
    done = np.asarray(traj["done"])
    winner = np.asarray(traj["winner"])
    assert (winner[done] != 0).all()
    assert done.sum() > 0  # at least one game finishes in 16 plies at 12 sims


def test_train_iteration_runs_and_updates_params():
    config = tiny_config()
    net, optimizer, st = az.init_alphazero(config, jax.random.PRNGKey(0))
    it = az.make_train_iteration(config, net, optimizer)
    params, opt_state, env_state, stats = it(
        st.params, st.opt_state, st.env_state, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(stats["loss"]))
    assert float(stats["valid_frac"]) > 0
    changed = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool((a != b).any()), st.params, params),
    )
    assert changed


def test_loss_decreases_on_fixed_batch():
    """Sanity: optimizing the AZ loss on one batch of self-play data fits it."""
    config = tiny_config()
    net, optimizer, st = az.init_alphazero(config, jax.random.PRNGKey(0))
    segment = az.make_selfplay_segment(config, net)
    _, traj = jax.jit(segment)(st.params, st.env_state, jax.random.PRNGKey(3))
    z, valid = az.assign_outcomes(traj["done"], traj["winner"], traj["player"])
    L, B = z.shape
    batch = {
        "obs": traj["obs"].reshape(L * B, -1),
        "mask": traj["mask"].reshape(L * B, -1),
        "pi": traj["pi"].reshape(L * B, -1),
        "z": z.reshape(L * B),
        "valid": valid.reshape(L * B),
    }

    import optax

    def loss_fn(params):
        logits, value = net.apply(params, batch["obs"])
        ml = jnp.where(batch["mask"], logits, -1e9)
        logp = jax.nn.log_softmax(ml, axis=-1)
        p_loss = -(batch["pi"] * jnp.where(batch["mask"], logp, 0.0)).sum(-1)
        v_loss = (jnp.tanh(value) - batch["z"]) ** 2
        w = batch["valid"].astype(jnp.float32)
        return ((p_loss + v_loss) * w).sum() / jnp.maximum(w.sum(), 1.0)

    opt = optax.adam(1e-2)
    params = st.params
    opt_state = opt.init(params)
    first = float(loss_fn(params))

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < first * 0.7, (first, float(loss))


def test_dirichlet_noise_changes_root_priors():
    from gobblet_rl_tpu.models import actor_critic as ac
    from gobblet_rl_tpu.search import mcts

    net = ac.MLPActorCritic(hidden_sizes=(32, 32))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 117), jnp.int8))
    board = jnp.zeros((3, 9), jnp.int8)

    def net_apply(p, o):
        return net.apply(p, o)

    def visits(noise, key):
        cfg = mcts.MCTSConfig(num_sims=24, dirichlet_alpha=0.5 if noise else 0.0)
        v, _, _ = mcts.mcts_search_single(
            net_apply, params, board, jnp.int32(0), key, cfg
        )
        return np.asarray(v)

    # same key: without noise deterministic, with noise the visit profile moves
    v0 = visits(False, jax.random.PRNGKey(7))
    v0b = visits(False, jax.random.PRNGKey(8))
    assert (v0 == v0b).all()  # key only feeds the noise
    v1 = visits(True, jax.random.PRNGKey(7))
    v2 = visits(True, jax.random.PRNGKey(8))
    assert (v1 != v0).any()
    assert (v1 != v2).any()


@pytest.mark.slow
def test_alphazero_learns_vs_random():
    """A short CPU run must already beat random play convincingly (with
    search at eval time this mostly certifies the pipeline end-to-end)."""
    from gobblet_rl_tpu.eval import tournament

    config = tiny_config(num_envs=16, num_sims=16, segment_len=24,
                         iterations=4, updates_per_iter=4)
    net, st, history = az.train(config)
    assert all(np.isfinite(h["loss"]) for h in history)
    pol = az.az_policy(net, st.params, num_sims=24)
    res = tournament.play_match(pol, tournament.random_policy(),
                                num_games=32, seed=0)
    assert res["win_rate"] > 0.9, res


def test_az_full_resume_preemption_equivalence(tmp_path):
    """Round-4 checkpoint parity: an AZ run preempted after 2 of 4
    iterations and resumed via full_resume_dir (AZState + PRNG key)
    reproduces the uninterrupted run bit-for-bit."""
    import dataclasses

    config = tiny_config(iterations=4, num_sims=6, segment_len=8,
                         temp_moves=2, batch_size=16, updates_per_iter=1)
    _, straight, _ = az.train(config)

    d = str(tmp_path / "az_resume")
    az.train(dataclasses.replace(config, iterations=2), full_resume_dir=d)
    _, resumed, hist = az.train(config, full_resume_dir=d)
    assert len(hist) == 2  # only iterations 2..3 ran after the restore
    same = jax.tree.map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
        straight.params, resumed.params,
    )
    assert all(jax.tree.leaves(same))
    same_env = jax.tree.map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
        straight.env_state, resumed.env_state,
    )
    assert all(jax.tree.leaves(same_env))
