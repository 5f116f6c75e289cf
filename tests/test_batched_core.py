"""Lane-major engine equivalence: ops.batched_core vs the vmapped core kernels."""

import jax
import jax.numpy as jnp
import numpy as np

from gobblet_rl_tpu.core import env as fenv
from gobblet_rl_tpu.core import observe, rules
from gobblet_rl_tpu.ops import batched_core as bc


def _to_planes(states):
    """batch-first GobbletState -> PlanesState"""
    return bc.PlanesState(
        board=jnp.transpose(states.board, (1, 2, 0)),
        current=states.current,
        turn=states.turn,
        done=states.done,
        winner=states.winner,
        last_action=states.last_action,
        rewards=states.rewards.T,
    )


def test_equivalence_random_playouts():
    """Drive both engines with identical action streams for many plies,
    including deliberately illegal and post-terminal actions."""
    B, S = 128, 48
    key = jax.random.PRNGKey(0)

    bf = jax.vmap(lambda _: fenv.reset())(jnp.arange(B))
    lm = bc.reset_planes(B)

    step_bf = jax.jit(jax.vmap(fenv.step_strict))
    step_lm = jax.jit(bc.step_planes)
    mask_bf = jax.jit(rules.batched_legal_mask)
    mask_lm = jax.jit(bc.legal_mask_planes)

    rng = np.random.default_rng(0)
    for s in range(S):
        m_bf = np.asarray(mask_bf(bf.board, bf.current))
        m_lm = np.asarray(mask_lm(lm.board, lm.current)).T
        np.testing.assert_array_equal(m_lm, m_bf)

        actions = np.zeros(B, np.int32)
        for b in range(B):
            legal = np.nonzero(m_bf[b])[0]
            if s % 7 == 3 and b % 11 == 0:
                actions[b] = rng.integers(0, 54)  # sometimes arbitrary/illegal
            else:
                actions[b] = rng.choice(legal)
        a = jnp.asarray(actions)
        bf = step_bf(bf, a)
        lm = step_lm(lm, a)

        np.testing.assert_array_equal(
            np.transpose(np.asarray(lm.board), (2, 0, 1)), np.asarray(bf.board)
        )
        for field in ("current", "turn", "done", "winner", "last_action"):
            np.testing.assert_array_equal(
                np.asarray(getattr(lm, field)), np.asarray(getattr(bf, field)),
                err_msg=f"{field} diverged at step {s}",
            )
        np.testing.assert_array_equal(np.asarray(lm.rewards).T, np.asarray(bf.rewards))


def test_observe_equivalence():
    B = 64
    key = jax.random.PRNGKey(1)
    lm = bc.reset_planes(B)
    for _ in range(10):
        key, sub = jax.random.split(key)
        mask = bc.legal_mask_planes(lm.board, lm.current)
        lm = bc.autoreset_planes(bc.step_planes(lm, bc.sample_random_lm(sub, mask)))
    planes = bc.observe_planes_lm(lm.board, lm.current)
    ref_layout = np.asarray(bc.to_reference_obs(planes))
    board_bf = np.transpose(np.asarray(lm.board), (2, 0, 1))
    for b in range(B):
        expected, _ = observe.observe_np(board_bf[b], int(lm.current[b]), int(lm.current[b]))
        np.testing.assert_array_equal(ref_layout[b], expected)


def test_rollout_random_agrees_with_vector_stats():
    """Same seed / same sampling path should produce plausible aggregate
    stats; sanity: episodes == wins (no illegal terminations)."""
    B, S = 512, 64
    state = bc.reset_planes(B)
    state, _, stats = bc.rollout_random(state, jax.random.PRNGKey(0), S)
    assert int(stats["episodes"]) == int(stats["wins_p1"]) + int(stats["wins_p2"])
    assert int(stats["episodes"]) > B


def test_step_trusted_matches_step_planes():
    """step_trusted is bit-identical to step_planes whenever every action
    is mask-legal — the training-collect contract (round-5 fast path).
    Drive both with identical mask-sampled streams through full games
    (wins, freezing, autoreset) and compare every state field."""
    B, S = 256, 40
    key = jax.random.PRNGKey(7)
    a_state = bc.reset_planes(B)
    b_state = bc.reset_planes(B)
    for _ in range(S):
        key, sub = jax.random.split(key)
        mask = bc.legal_mask_planes(a_state.board, a_state.current)
        actions = bc.sample_random_lm(sub, mask)
        a_state = bc.step_planes(a_state, actions)
        b_state = bc.step_trusted(b_state, actions)
        for field in a_state._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(a_state, field)),
                np.asarray(getattr(b_state, field)), err_msg=field,
            )
        # exercise the frozen path for a while before resetting
        if int(a_state.done.sum()) > B // 2:
            a_state = bc.autoreset_planes(a_state)
            b_state = bc.autoreset_planes(b_state)
