"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY §4 implication +
task brief: multi-chip sharding is validated on virtual CPU devices).
"""

import os
import sys

# Force CPU unless explicitly running the TPU-marked tests
# (GOBBLET_TEST_TPU=1 python -m pytest tests -m slow).
if not os.environ.get("GOBBLET_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# A sitecustomize hook may register a TPU PJRT plugin and override
# jax_platforms at import time; pin it back to cpu after import.
import jax  # noqa: E402

if not os.environ.get("GOBBLET_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Make the repo importable when pytest is run from anywhere.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Headless pygame for render tests (reference CI uses xvfb; we use the
# dummy SDL driver instead — no display server needed).
os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
os.environ.setdefault("SDL_AUDIODRIVER", "dummy")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running parity tests (opt in with -m slow)")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    if config.getoption("-m"):
        return
    skip_slow = _pytest.mark.skip(reason="slow; run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
