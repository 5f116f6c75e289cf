"""Lane-major PUCT search: bit-equivalence with the vmapped search and
policy identity (round-4 lane-major-tree rewrite, search/mcts_lm.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gobblet_rl_tpu.models import actor_critic as ac
from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.search import mcts, mcts_lm


@pytest.fixture(scope="module")
def net_and_params():
    net = ac.MLPActorCritic(hidden_sizes=(32,))
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


def test_mcts_lm_bit_identical_to_vmapped(net_and_params):
    """Noise-free PUCT is deterministic, so the two implementations must
    produce IDENTICAL trees on real midgame positions — no mocking needed."""
    net, params = net_and_params

    def net_apply(p, obs):
        return net.apply(p, obs)

    state = _random_midgame(B=16, plies=5, seed=5)
    boards_bf = jnp.transpose(state.board, (2, 0, 1))
    cfg = mcts.MCTSConfig(num_sims=16)

    v1, q1, rw1 = mcts.mcts_search(
        net_apply, params, boards_bf, state.current, jax.random.PRNGKey(9), cfg
    )
    v2, q2, rw2 = mcts_lm.mcts_search_lm(
        net_apply, params, state.board, state.current, jax.random.PRNGKey(9), cfg
    )
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(rw1), np.asarray(rw2))
    vis = np.asarray(v1) > 0
    np.testing.assert_allclose(
        np.asarray(q1)[vis], np.asarray(q2)[vis], atol=0
    )


def test_mcts_lm_policy_identical_and_az_policy_flag(net_and_params):
    """mcts_lm_policy emits the same actions as mcts_policy for the same
    key, and alphazero.az_policy(lane_major=True/False) agree — switching
    the eval search implementation is a pure speed change."""
    from gobblet_rl_tpu.train import alphazero as az

    net, params = net_and_params
    state = _random_midgame(B=12, plies=4, seed=6)
    cfg = mcts.MCTSConfig(num_sims=12)
    key = jax.random.PRNGKey(11)
    a1 = np.asarray(mcts.mcts_policy(net, params, cfg)(
        key, state.board, state.current))
    a2 = np.asarray(mcts_lm.mcts_lm_policy(net, params, cfg)(
        key, state.board, state.current))
    np.testing.assert_array_equal(a1, a2)

    p_lm = az.az_policy(net, params, num_sims=12, lane_major=True)
    p_vm = az.az_policy(net, params, num_sims=12, lane_major=False)
    np.testing.assert_array_equal(
        np.asarray(p_lm(key, state.board, state.current)),
        np.asarray(p_vm(key, state.board, state.current)),
    )
