"""Batched MCTS: tactical correctness, legality, strength vs baselines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gobblet_rl_tpu.core import rules_np
from gobblet_rl_tpu.eval import tournament
from gobblet_rl_tpu.models import actor_critic as ac
from gobblet_rl_tpu.search import MCTSConfig, mcts_policy, mcts_search


@pytest.fixture(scope="module")
def net_and_params():
    net = ac.MLPActorCritic(hidden_sizes=(64, 64))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 117), jnp.int8))
    return net, params


def _lm(boards):
    return jnp.asarray(np.stack(boards, axis=-1))


def test_mcts_finds_immediate_win(net_and_params):
    net, params = net_and_params
    b = rules_np.empty_board()
    b = rules_np.apply_action(b, 0, 0)    # p1 small @0
    b = rules_np.apply_action(b, 1, 8)
    b = rules_np.apply_action(b, 0, 10)   # p1 small @1
    b = rules_np.apply_action(b, 1, 16)
    # p1 to move: any piece at cell 2 wins
    pol = mcts_policy(net, params, MCTSConfig(num_sims=48))
    a = int(pol(jax.random.PRNGKey(1), _lm([b]), jnp.zeros(1, jnp.int32))[0])
    nb = rules_np.apply_action(b, 0, a)
    assert rules_np.line_winner(nb) == 1, a


def test_mcts_blocks_forced_loss(net_and_params):
    net, params = net_and_params
    b = rules_np.empty_board()
    b = rules_np.apply_action(b, 1, 36)   # p2 large @0
    b = rules_np.apply_action(b, 1, 46)   # p2 large @1
    b = rules_np.apply_action(b, 0, 8)    # p1 small @8
    pol = mcts_policy(net, params, MCTSConfig(num_sims=128))
    a = int(pol(jax.random.PRNGKey(2), _lm([b]), jnp.zeros(1, jnp.int32))[0])
    nb = rules_np.apply_action(b, 0, a)
    opp_mask = rules_np.legal_mask(nb, 1)
    for r in np.nonzero(opp_mask)[0]:
        rb = rules_np.apply_action(nb, 1, int(r))
        assert rules_np.line_winner(rb) != -1, (a, r)


def test_mcts_actions_always_legal(net_and_params):
    net, params = net_and_params
    from gobblet_rl_tpu.ops import batched_core as bc

    B = 16
    state = bc.reset_planes(B)
    pol = mcts_policy(net, params, MCTSConfig(num_sims=16))
    key = jax.random.PRNGKey(0)
    for _ in range(10):
        key, sub = jax.random.split(key)
        mask = np.asarray(bc.legal_mask_planes(state.board, state.current))
        actions = np.asarray(pol(sub, state.board, state.current))
        for b_i in range(B):
            assert mask[actions[b_i], b_i], (b_i, actions[b_i])
        state = bc.autoreset_planes(bc.step_planes(state, jnp.asarray(actions)))


def test_visit_counts_shapes(net_and_params):
    net, params = net_and_params

    def net_apply(p, obs):
        return net.apply(p, obs)

    boards = jnp.zeros((4, 3, 9), jnp.int8)
    players = jnp.zeros(4, jnp.int32)
    visits, q, root_win = mcts_search(
        net_apply, params, boards, players, jax.random.PRNGKey(0), MCTSConfig(num_sims=24)
    )
    assert visits.shape == (4, 54) and q.shape == (4, 54)
    assert root_win.shape == (4, 54) and not bool(root_win.any())  # empty board
    np.testing.assert_allclose(np.asarray(visits).sum(-1), 24.0)


@pytest.mark.slow
def test_mcts_beats_random(net_and_params):
    net, params = net_and_params
    pol = mcts_policy(net, params, MCTSConfig(num_sims=64))
    m = tournament.play_match(pol, tournament.random_policy(), num_games=64, seed=0)
    assert m["win_rate"] > 0.85, m
