"""AEC environment conformance + parity vs the live reference env.

Mirrors the reference test strategy (/root/reference/tests/test_gobblet_env.py):
PettingZoo api_test, seed_test, reset-state checks, render smoke — plus what
the reference could not do: full lockstep trajectory parity (obs, masks,
rewards, terminations AND byte-identical text renders) against the upstream
implementation driven by the same action stream.
"""

import contextlib
import io

import numpy as np
import pettingzoo.test
import pytest

from gobblet_rl_tpu import gobblet_v1

from .ref_oracle import load_reference


@pytest.fixture(scope="function")
def env():
    e = gobblet_v1.raw_env(render_mode=None)
    e.reset()
    yield e
    e.close()


def test_reset(env):
    env.reset()


def test_reset_starting(env):
    assert (env.board.squares == np.zeros(27)).all()


def test_api(env):
    pettingzoo.test.api_test(env, num_cycles=10, verbose_progress=False)


def test_seed():
    pettingzoo.test.seed_test(gobblet_v1.env)


def test_seed_raw():
    pettingzoo.test.seed_test(gobblet_v1.raw_env)


def test_render_text(capsys):
    e = gobblet_v1.raw_env(render_mode="text")
    e.reset()
    e.step(0)
    out = capsys.readouterr().out
    assert "TURN: 1, AGENT: player_2, ACTION: 0, POSITION: 0, PIECE: 1" in out
    e.close()


def test_render_rgb_array():
    e = gobblet_v1.raw_env(render_mode="rgb_array")
    e.reset()
    e.step(0)
    frame = e.render()
    assert frame.shape == (640, 640, 3)
    assert frame.dtype == np.uint8
    e.close()


def _drive_pair(ref_env, our_env, seed, max_plies=60, render_capture=False):
    """Drive both wrapped envs with one random-admissible action stream."""
    rng = np.random.default_rng(seed)
    ref_env.reset()
    our_env.reset()
    for _ in range(max_plies):
        ref_obs, ref_rew, ref_term, ref_trunc, _ = ref_env.last()
        our_obs, our_rew, our_term, our_trunc, _ = our_env.last()
        np.testing.assert_array_equal(our_obs["observation"], ref_obs["observation"])
        np.testing.assert_array_equal(our_obs["action_mask"], ref_obs["action_mask"])
        assert our_rew == ref_rew
        assert our_term == ref_term and our_trunc == ref_trunc
        assert our_env.agent_selection == ref_env.agent_selection
        if ref_term or ref_trunc:
            ref_env.step(None)
            our_env.step(None)
            if not ref_env.agents:
                assert not our_env.agents
                return
            continue
        action = int(rng.choice(np.nonzero(ref_obs["action_mask"])[0]))
        if render_capture:
            ref_out, our_out = io.StringIO(), io.StringIO()
            with contextlib.redirect_stdout(ref_out):
                ref_env.step(action)
            with contextlib.redirect_stdout(our_out):
                our_env.step(action)
            assert our_out.getvalue() == ref_out.getvalue()
        else:
            ref_env.step(action)
            our_env.step(action)


@pytest.mark.parametrize("seed", range(5))
def test_lockstep_parity_vs_reference(seed):
    ref = load_reference()
    _drive_pair(
        ref.gobblet_v1.env(render_mode=None),
        gobblet_v1.env(render_mode=None),
        seed,
    )


@pytest.mark.parametrize("mode", ["text", "text_full"])
def test_text_render_byte_parity(mode):
    """Seeded trace parity: our text renders are byte-identical to the
    reference (SURVEY §5 tracing requirement)."""
    ref = load_reference()
    _drive_pair(
        ref.gobblet_v1.env(render_mode=mode),
        gobblet_v1.env(render_mode=mode),
        seed=11,
        render_capture=True,
    )


def test_illegal_action_terminates_wrapped():
    """TerminateIllegalWrapper semantics (gobblet.py:114)."""
    e = gobblet_v1.env(render_mode=None)
    e.reset()
    e.step(0)   # p1 small @0
    e.step(0)   # p2: illegal (same size on occupied cell)
    assert all(e.terminations.values())
    assert e.rewards["player_2"] == -1
    assert e.rewards["player_1"] == 0
    e.close()
