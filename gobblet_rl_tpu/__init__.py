"""gobblet_rl_tpu — a TPU-native Gobblet RL framework.

Re-implements the full capability surface of ``elliottower/gobblet-rl``
(reference mounted at /root/reference) with a JAX/XLA-first design: the rules
engine, observation and legal-mask generation are branch-free array programs
that batch with ``vmap`` and shard over device meshes with ``shard_map``.

Public namespace mirrors the reference package
(/root/reference/gobblet_rl/__init__.py + gobblet_v1.py):

    from gobblet_rl_tpu import gobblet_v1
    env = gobblet_v1.env(render_mode=None)
"""

from gobblet_rl_tpu.__version__ import __version__

__all__ = ["__version__", "gobblet_v1"]


def __getattr__(name):
    # Lazy import: keep `import gobblet_rl_tpu` cheap and free of pygame /
    # pettingzoo imports unless the classic env surface is requested.
    if name == "gobblet_v1":
        import importlib

        return importlib.import_module("gobblet_rl_tpu.gobblet_v1")
    raise AttributeError(f"module 'gobblet_rl_tpu' has no attribute {name!r}")
