"""Lane-major search helpers == core.rules semantics, exactly.

The round-3 search rewrite (search/mcts.py) expresses the expansion-time
rules ops on ops.batched_core with the candidate actions as the lane axis
(7.4x measured on the AZ train loop).  These tests pin that rewrite to the
reference-parity core.rules formulation on random reachable positions, so
a silent divergence in the batched engine's single-board adapters fails
loudly rather than just making the search weaker.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gobblet_rl_tpu.core import rules, rules_np
from gobblet_rl_tpu.search.gumbel import _top_k_mask
from gobblet_rl_tpu.search.mcts import (
    _apply_and_winner,
    _legal_mask_1,
    _winning_actions,
)


def _random_positions(seed, n, max_plies=14):
    """Legal (board, player) pairs reached by random play, any game phase."""
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < n:
        b = rules_np.empty_board()
        player = 0
        for _ in range(int(rng.integers(0, max_plies))):
            legal = np.nonzero(rules_np.legal_mask(b, player))[0]
            if len(legal) == 0 or rules_np.line_winner(b) != 0:
                break
            b = rules_np.apply_action(b, player, int(rng.choice(legal)))
            player = 1 - player
        if rules_np.line_winner(b) == 0:
            out.append((b, player))
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_top_k_mask_matches_sort(seed):
    """rank-count top-k == the sort-based kth-value mask it replaced,
    including ties and -inf entries."""
    rng = np.random.default_rng(seed)
    for trial in range(20):
        score = rng.choice([-np.inf, -1.5, 0.0, 0.25, 0.25, 2.0], size=54)
        score = jnp.asarray(score, jnp.float32)
        for k in (1, 2, 3, 8, 16, 54):
            want = score >= jnp.sort(score)[-k]
            got = _top_k_mask(score, k)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_legal_mask_1_matches_core_rules():
    for b, player in _random_positions(2, 40):
        got = jax.jit(_legal_mask_1)(jnp.asarray(b), player)
        want = rules_np.legal_mask(b, player)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_winning_actions_matches_core_rules():
    def reference(board, player):
        mask = rules.legal_mask(board, player)

        def winner_after(a):
            return rules.line_winner(
                rules.apply_action(board, player, a, legal=mask[a])
            )

        winners = jax.vmap(winner_after)(jnp.arange(54))
        sign = jnp.where(player == 0, 1, -1).astype(winners.dtype)
        return (winners == sign) & mask

    ref = jax.jit(reference)
    got_fn = jax.jit(_winning_actions)
    for b, player in _random_positions(3, 40):
        board = jnp.asarray(b)
        np.testing.assert_array_equal(
            np.asarray(got_fn(board, player)), np.asarray(ref(board, player))
        )


def test_apply_and_winner_matches_core_rules():
    fn = jax.jit(_apply_and_winner)
    rng = np.random.default_rng(4)
    for b, player in _random_positions(5, 40):
        legal = np.nonzero(rules_np.legal_mask(b, player))[0]
        a = int(rng.choice(legal))
        nboard, winner = fn(jnp.asarray(b), player, a)
        np.testing.assert_array_equal(
            np.asarray(nboard), rules_np.apply_action(b, player, a)
        )
        assert int(winner) == rules_np.line_winner(
            rules_np.apply_action(b, player, a)
        )


def test_evaluate_obs_layout_matches_observe():
    """search._evaluate's features_lm path flattens identically to the
    observe_planes (channel, cell) order the trainers use, so zoo params
    evaluate the same under search and under the batched trainers."""
    from gobblet_rl_tpu.core import observe
    from gobblet_rl_tpu.ops import batched_core as bc

    for b, player in _random_positions(6, 10):
        board = jnp.asarray(b)
        lm = bc.features_lm(
            board[..., None], jnp.asarray(player, jnp.int32)[None]
        ).T
        planes = observe.observe_planes(board, player)
        ref = jnp.transpose(planes, (2, 0, 1)).reshape(1, -1)
        np.testing.assert_array_equal(np.asarray(lm), np.asarray(ref))
