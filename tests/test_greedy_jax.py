"""Batched jittable greedy: tactical correctness + strength vs random."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gobblet_rl_tpu.core import rules_np
from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.policies import greedy_jax


def _planes_from_boards(boards):
    return jnp.asarray(np.stack(boards, axis=-1))  # [3,9,B]


def test_takes_immediate_win():
    # P1 has small pieces at cells 0,1 — playing any piece at cell 2 wins.
    b = rules_np.empty_board()
    b = rules_np.apply_action(b, 0, 0)      # small1 @0
    b = rules_np.apply_action(b, 1, 8)      # opp
    b = rules_np.apply_action(b, 0, 10)     # small2 @1
    b = rules_np.apply_action(b, 1, 16)     # opp
    board = _planes_from_boards([b])
    action = greedy_jax.greedy_actions(
        jax.random.PRNGKey(0), board, jnp.zeros(1, jnp.int32), depth=2
    )
    a = int(action[0])
    assert a % 9 == 2  # completes the 0,1,2 line
    nb = rules_np.apply_action(b, 0, a)
    assert rules_np.line_winner(nb) == 1


def test_blocks_opponent_win():
    # Opponent (p2) threatens cells 0,1 with larges; p1 must stop cell 2
    # (cover/occupy) or lose; depth-2 must avoid handing the win.
    b = rules_np.empty_board()
    b = rules_np.apply_action(b, 1, 36)     # p2 large1 @0
    b = rules_np.apply_action(b, 1, 46)     # p2 large2 @1
    b = rules_np.apply_action(b, 0, 8)      # p1 small @8
    board = _planes_from_boards([b])
    for seed in range(5):
        action = greedy_jax.greedy_actions(
            jax.random.PRNGKey(seed), board, jnp.zeros(1, jnp.int32), depth=2
        )
        a = int(action[0])
        nb = rules_np.apply_action(b, 0, a)
        # after our move, opponent must have no winning reply
        opp_mask = rules_np.legal_mask(nb, 1)
        for r in np.nonzero(opp_mask)[0]:
            rb = rules_np.apply_action(nb, 1, int(r))
            assert rules_np.line_winner(rb) != -1, (a, r)


@pytest.mark.parametrize("greedy_player", [0, 1])
def test_greedy_beats_random(greedy_player):
    B, S = 64, 60
    state = bc.reset_planes(B)
    key = jax.random.PRNGKey(0)
    wins = {"greedy": 0, "random": 0}

    @jax.jit
    def ply(state, key):
        kg, kr, key = jax.random.split(key, 3)
        mask = bc.legal_mask_planes(state.board, state.current)
        a_greedy = greedy_jax.greedy_actions(kg, state.board, state.current, 2)
        a_random = bc.sample_random_lm(kr, mask)
        actions = jnp.where(state.current == greedy_player, a_greedy, a_random)
        stepped = bc.step_planes(state, actions)
        return bc.autoreset_planes(stepped), stepped.winner, key

    greedy_sign = 1 if greedy_player == 0 else -1
    for _ in range(S):
        state, winner, key = ply(state, key)
        w = np.asarray(winner)
        wins["greedy"] += int((w == greedy_sign).sum())
        wins["random"] += int((w == -greedy_sign).sum())

    total = wins["greedy"] + wins["random"]
    assert total > 0
    win_rate = wins["greedy"] / total
    assert win_rate > 0.9, wins


# ---------------------------------------------------------------------------
# Agreement with the parity-exact host greedy (round-2 verdict item 7)
# ---------------------------------------------------------------------------


def _priority_classes(board, player):
    """Depth-2 priority classes by exhaustive enumeration (rules_np)."""
    sign = 1 if player == 0 else -1
    legal = [int(a) for a in np.nonzero(rules_np.legal_mask(board, player))[0]]
    win, lose, safe, neutral = set(), set(), set(), set()
    for a in legal:
        nb = rules_np.apply_action(board, player, a)
        w = rules_np.line_winner(nb)
        if w == sign:
            win.add(a)
            continue
        if w == -sign:
            lose.add(a)
            continue
        opp_wins = False
        for r in np.nonzero(rules_np.legal_mask(nb, 1 - player))[0]:
            rb = rules_np.apply_action(nb, 1 - player, int(r))
            if rules_np.line_winner(rb) == -sign:
                opp_wins = True
                break
        (neutral if opp_wins else safe).add(a)
    return set(legal), win, safe, neutral


def _expected_class(legal, win, safe, neutral):
    if win:
        return win
    if safe:
        return safe
    if neutral:
        return neutral | safe
    return legal


def test_agreement_with_host_greedy():
    """The batched greedy is priority-exact, not order-exact, with the host
    parity greedy (greedy_jax.py docstring).  Pin that claim with numbers:
    on random positions BOTH implementations must choose from the same
    depth-2 priority class (win > safe > not-losing > any), so a silent
    drift in the batched training opponent fails loudly here."""
    from gobblet_rl_tpu.core import observe
    from gobblet_rl_tpu.policies.greedy import GreedyGobbletPolicy

    rng = np.random.default_rng(5)
    boards, players = [], []
    while len(boards) < 64:
        b = rules_np.empty_board()
        p = 0
        for _ in range(int(rng.integers(0, 12))):
            legal = np.nonzero(rules_np.legal_mask(b, p))[0]
            b = rules_np.apply_action(b, p, int(rng.choice(legal)))
            if rules_np.line_winner(b) != 0:
                break
            p = 1 - p
        if rules_np.line_winner(b) == 0:
            boards.append(b)
            players.append(p)

    board_lm = _planes_from_boards(boards)
    current = jnp.asarray(players, jnp.int32)
    jax_actions = np.asarray(
        greedy_jax.greedy_actions(jax.random.PRNGKey(3), board_lm, current, 2)
    )

    n = len(boards)
    jax_in_class = host_in_class = exact = 0
    for i, (b, p) in enumerate(zip(boards, players)):
        obs, mask = observe.observe_np(b, p, p)
        host_a = int(GreedyGobbletPolicy(depth=2, seed=i).compute_action(obs, mask))
        expected = _expected_class(*_priority_classes(b, p))
        jax_in_class += int(jax_actions[i]) in expected
        host_in_class += host_a in expected
        exact += host_a == int(jax_actions[i])

    # the batched greedy implements the classes directly: must never miss
    assert jax_in_class == n, (jax_in_class, n)
    # the host replays the reference's sequential scan; its incidental
    # quirks (e.g. the steal-their-square preference can pick a still-
    # vulnerable move, greedy_policy.py:129-143) land outside the strict
    # class on ~9% of positions — measured 232/256 in-class, 89/256
    # exact-action at N=256 (round 3); the floor guards against drift
    assert host_in_class >= 0.85 * n, (host_in_class, n)
    # exact-action agreement is NOT expected to be high (random tie-breaks
    # differ), but total disagreement would mean the two no longer rank
    # moves alike at all — measured 89/256 exact at N=256 (round 3)
    assert exact >= 0.1 * n, (exact, n)
