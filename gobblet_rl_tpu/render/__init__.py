from gobblet_rl_tpu.render import text

__all__ = ["text"]
