from gobblet_rl_tpu.core import env, observe, rules, rules_np, types
from gobblet_rl_tpu.core.types import GobbletState

__all__ = ["env", "observe", "rules", "rules_np", "types", "GobbletState"]
