"""Aux subsystems (SURVEY §5): profiling counters, checkify invariants,
full actor-learner resume."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify

from gobblet_rl_tpu.ops import batched_core as bc
from gobblet_rl_tpu.ops import debug
from gobblet_rl_tpu.train import dqn
from gobblet_rl_tpu.utils import profiling


def test_throughput_meter():
    t = profiling.Throughput()
    x = jnp.ones(1024).sum()
    rate = t.rate(1000, x)
    assert rate > 0


def test_invariants_catch_corruption():
    state = bc.reset_planes(8)
    assert bool(debug.state_invariants(state).all())
    # corrupt one env: duplicate piece id 3 on the medium level
    board = np.asarray(state.board).copy()
    board[1, 0, 2] = 3
    board[1, 5, 2] = 3
    bad = state._replace(board=jnp.asarray(board))
    ok = np.asarray(debug.state_invariants(bad))
    assert not ok[2] and ok[[0, 1, 3, 4, 5, 6, 7]].all()
    # wrong level placement
    board2 = np.asarray(state.board).copy()
    board2[0, 0, 1] = 5  # large piece on small level
    bad2 = state._replace(board=jnp.asarray(board2))
    assert not bool(debug.state_invariants(bad2)[1])


def test_checked_step_raises_on_bad_action():
    state = bc.reset_planes(4)
    step = jax.jit(checkify.checkify(debug.checked_step))
    err, _ = step(state, jnp.asarray([0, 1, 2, 60]))
    try:
        err.throw()
        raised = False
    except Exception as e:
        raised = "action out of range" in str(e)
    assert raised
    err, new_state = step(state, jnp.asarray([0, 1, 2, 3]))
    err.throw()  # no violation
    assert int(new_state.turn[0]) == 1


def test_full_resume_roundtrip(tmp_path):
    import dataclasses

    config = dqn.DQNConfig(
        buffer_size=2048, epoch=1, step_per_epoch=2, segment_len=4,
        update_per_collect=1, batch_size=64, num_envs=32, opponent="random",
    )
    d = str(tmp_path / "full")
    ts1, hist1 = dqn.train(config, full_resume_dir=d)
    # relaunching with a LONGER schedule continues from the stored epoch
    # counter instead of restarting the loop at 0
    ts2, hist2 = dqn.train(
        dataclasses.replace(config, epoch=2), full_resume_dir=d
    )
    assert len(hist2) == 1 and hist2[0]["epoch"] == 1
    assert int(ts2.grad_steps) == 2 * int(ts1.grad_steps)
    # relaunching the COMPLETED schedule is a no-op (restores, trains nothing)
    ts3, hist3 = dqn.train(
        dataclasses.replace(config, epoch=2), full_resume_dir=d
    )
    assert hist3 == [] and int(ts3.grad_steps) == int(ts2.grad_steps)


def test_full_resume_preemption_equivalence(tmp_path):
    """Elastic recovery is EXACT: a run preempted after epoch 1 and resumed
    for epoch 2 produces bit-identical params to an uninterrupted 2-epoch
    run (params + optimizer + env batch + replay + PRNG all checkpointed)."""
    import dataclasses

    import numpy as np

    base = dqn.DQNConfig(
        buffer_size=1024, step_per_epoch=2, segment_len=4,
        update_per_collect=1, batch_size=64, num_envs=32, opponent="random",
    )
    straight, _ = dqn.train(dataclasses.replace(base, epoch=2))

    d = str(tmp_path / "preempt")
    # "preempted" after epoch 1; the relaunch with the SAME flags (the
    # documented CLI contract) continues at epoch 2 of the 2-epoch schedule
    two_epoch = dataclasses.replace(base, epoch=2)
    dqn.train(dataclasses.replace(base, epoch=1), full_resume_dir=d)
    resumed, hist = dqn.train(two_epoch, full_resume_dir=d)
    assert [h["epoch"] for h in hist] == [1]

    assert int(resumed.grad_steps) == int(straight.grad_steps)
    same = jax.tree.map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
        straight.params, resumed.params,
    )
    assert all(jax.tree.leaves(same))


def test_full_resume_mixed_opponent_rng(tmp_path):
    """The host-side mixed-opponent RNG (rng_mix) is part of the resume
    point: a preempted opponent='mixed' run continues with the SAME opponent
    draws as the uninterrupted run (round-4 advisor finding — without the
    meta sidecar the draws diverge after relaunch)."""
    import dataclasses

    import numpy as np

    base = dqn.DQNConfig(
        buffer_size=1024, step_per_epoch=2, segment_len=4,
        update_per_collect=1, batch_size=64, num_envs=32,
        opponent="mixed", greedy_depth=1, seed=7,
    )
    two = dataclasses.replace(base, epoch=2)
    straight, _ = dqn.train(two)

    class _Preempt:
        """Logger that dies mid-epoch-2 — a REAL preemption (unlike running
        a shorter schedule first, which would trigger the generation
        hand-off early and diverge legitimately)."""

        def __init__(self):
            self.n = 0

        def log(self, record):
            self.n += 1
            if self.n >= 2:
                raise RuntimeError("preempted")

    d = str(tmp_path / "mixed")
    import pytest

    with pytest.raises(RuntimeError, match="preempted"):
        dqn.train(two, full_resume_dir=d, logger=_Preempt())
    resumed, _ = dqn.train(two, full_resume_dir=d)

    same = jax.tree.map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
        straight.params, resumed.params,
    )
    assert all(jax.tree.leaves(same))
