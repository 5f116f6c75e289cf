"""Framework adapters (Tianshou / RLlib), import-gated on availability.

The reference ships adapters for both frameworks
(/root/reference/gobblet_rl/game/{greedy_policy_tianshou,greedy_policy_rllib,
random_admissible_policy_rllib,collector_manual_policy}.py).  Neither
framework is part of this image's baked dependencies, so each adapter module
raises a clear ImportError when its framework is missing; the framework-free
equivalents (policies/, interactive/session.py) cover the same use cases.
"""
