"""Versioned namespace mirroring the reference ``gobblet_rl.gobblet_v1``
(/root/reference/gobblet_rl/gobblet_v1.py:1-3)."""

from gobblet_rl_tpu.env.aec import env, parallel_env, raw_env
from gobblet_rl_tpu.policies.greedy import GreedyGobbletPolicy

__all__ = ["env", "parallel_env", "raw_env", "GreedyGobbletPolicy", "ManualGobbletPolicy"]


def __getattr__(name):
    # pygame-dependent import kept lazy so headless training never loads it
    if name == "ManualGobbletPolicy":
        from gobblet_rl_tpu.interactive.manual_policy import ManualGobbletPolicy

        return ManualGobbletPolicy
    raise AttributeError(f"module 'gobblet_rl_tpu.gobblet_v1' has no attribute {name!r}")
