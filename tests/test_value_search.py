"""Learned-eval shallow search (policies/value_search.py): tactics with a
random net (the proven-score scale must dominate the learned values),
legality, and zoo integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gobblet_rl_tpu.core import rules_np
from gobblet_rl_tpu.models import actor_critic as ac
from gobblet_rl_tpu.models.mlp import QNet
from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.policies import value_search as vs


@pytest.fixture(scope="module")
def dqn_vf():
    net = QNet(hidden_sizes=(32, 32))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 117), jnp.int8))
    return vs.dqn_value_fn(net, params)


@pytest.fixture(scope="module")
def az_vf():
    net = ac.MLPActorCritic(hidden_sizes=(32, 32))
    params = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 117), jnp.int8))
    return vs.az_value_fn(net, params)


def _lm(*boards):
    return jnp.asarray(np.stack(boards, axis=-1))


def test_finds_immediate_win(dqn_vf):
    b = rules_np.empty_board()
    b = rules_np.apply_action(b, 0, 0)    # +1 at 0
    b = rules_np.apply_action(b, 1, 8)
    b = rules_np.apply_action(b, 0, 10)   # +2 at 1
    b = rules_np.apply_action(b, 1, 16)
    pol = vs.make_value_search(dqn_vf, depth=2)
    a = int(pol(jax.random.PRNGKey(0), _lm(b), jnp.zeros(1, jnp.int32))[0])
    nb = rules_np.apply_action(b, 0, a)
    assert rules_np.line_winner(nb) == 1, a


def test_blocks_forced_loss(az_vf):
    b = rules_np.empty_board()
    b = rules_np.apply_action(b, 1, 36)   # -5 at 0
    b = rules_np.apply_action(b, 1, 46)   # -6 at 1
    b = rules_np.apply_action(b, 0, 8)
    pol = vs.make_value_search(az_vf, depth=2)
    a = int(pol(jax.random.PRNGKey(2), _lm(b), jnp.zeros(1, jnp.int32))[0])
    nb = rules_np.apply_action(b, 0, a)
    opp_mask = rules_np.legal_mask(nb, 1)
    for r in np.nonzero(opp_mask)[0]:
        rb = rules_np.apply_action(nb, 1, int(r))
        assert rules_np.line_winner(rb) != -1, (a, r)


def test_converts_forced_win_in_three(dqn_vf):
    """The leaf 1-ply solver makes 3-ply forced wins exact (the reference
    depth-3 scan's capability, greedy_policy.py:158-208): building the
    ungobbleable double threat must outrank every heuristic move.

    Position (P1 to move): P1 +3@0, +4@2; P2 -6@1 (blocks row 0-1-2),
    -5@3.  Playing a size-3 piece at the center creates threats at 8
    (line 0-4-8) and 6 (line 2-4-6); P2 cannot gobble a size-3 and no
    single reply covers both, so every reply leaves P1 a 1-ply win."""
    b = rules_np.empty_board()
    b = rules_np.apply_action(b, 0, 18)   # +3 at 0
    b = rules_np.apply_action(b, 0, 29)   # +4 at 2
    b = rules_np.apply_action(b, 1, 46)   # -6 at 1
    b = rules_np.apply_action(b, 1, 39)   # -5 at 3
    # sanity: no immediate win for P1
    mask = rules_np.legal_mask(b, 0)
    for a in np.nonzero(mask)[0]:
        assert rules_np.line_winner(rules_np.apply_action(b, 0, int(a))) != 1

    pol = vs.make_value_search(dqn_vf, depth=2, solve_leaves=True)
    a = int(pol(jax.random.PRNGKey(3), _lm(b), jnp.zeros(1, jnp.int32))[0])
    assert a in (36 + 4, 45 + 4), a       # +5@4 or +6@4

    # and the claim itself: every P2 reply leaves P1 an immediate win
    nb = rules_np.apply_action(b, 0, a)
    for r in np.nonzero(rules_np.legal_mask(nb, 1))[0]:
        rb = rules_np.apply_action(nb, 1, int(r))
        if rules_np.line_winner(rb) != 0:
            continue  # would be -2-scored, never reached
        wins = [
            w for w in np.nonzero(rules_np.legal_mask(rb, 0))[0]
            if rules_np.line_winner(rules_np.apply_action(rb, 0, int(w))) == 1
        ]
        assert wins, r

    # without the leaf solver the forced win is invisible to a random net:
    # the score for the double threat drops back into the heuristic band
    pol0 = vs.make_value_search(dqn_vf, depth=2, solve_leaves=False)
    # (no assertion on its move — just exercise the path)
    int(pol0(jax.random.PRNGKey(3), _lm(b), jnp.zeros(1, jnp.int32))[0])


@pytest.mark.parametrize("depth", [1, 2])
def test_actions_always_legal(az_vf, depth):
    B = 8
    state = bc.reset_planes(B)
    pol = vs.make_value_search(az_vf, depth=depth)
    key = jax.random.PRNGKey(0)
    for _ in range(10):
        key, sub = jax.random.split(key)
        mask = np.asarray(bc.legal_mask_planes(state.board, state.current))
        actions = np.asarray(pol(sub, state.board, state.current))
        for i in range(B):
            assert mask[actions[i], i], (i, actions[i])
        state = bc.autoreset_planes(bc.step_planes(state, jnp.asarray(actions)))


def test_zoo_dqn_search_entrant_runs():
    """dqn zoo entry + depth-2 value search plays full games (the
    tournament entrant wiring used by scripts/exploitability.py)."""
    from gobblet_rl_tpu import zoo

    if "dqn_greedy" not in zoo.names():
        pytest.skip("no committed dqn zoo entry")
    net, params, _ = zoo.load("dqn_greedy")
    pol = vs.make_value_search(vs.dqn_value_fn(net, params), depth=2)
    state = bc.reset_planes(4)
    key = jax.random.PRNGKey(0)
    for _ in range(12):
        key, sub = jax.random.split(key)
        a = pol(sub, state.board, state.current)
        state = bc.autoreset_planes(bc.step_planes(state, a))
    assert int(state.turn.sum()) > 0
