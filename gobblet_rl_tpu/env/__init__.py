from gobblet_rl_tpu.env.aec import env, parallel_env, raw_env

__all__ = ["env", "parallel_env", "raw_env"]
