"""Load the upstream reference implementation as a parity oracle.

The reference at /root/reference targets pettingzoo 1.22; the installed
1.26 renamed ``agent_selector`` to a module, so we shim the old name before
importing.  Tests that need the oracle skip gracefully when the reference
tree is absent.
"""

from __future__ import annotations

import os
import sys

import pytest

REF_ROOT = "/root/reference"


def _install_shims() -> None:
    import pettingzoo.utils as pzu

    if not callable(getattr(pzu, "agent_selector", None)) or isinstance(
        pzu.agent_selector, type(pzu)
    ):
        pzu.agent_selector = pzu.agent_selector.agent_selector  # type: ignore[attr-defined]


def have_reference() -> bool:
    return os.path.isdir(os.path.join(REF_ROOT, "gobblet_rl"))


def load_reference():
    """Import and return the reference ``gobblet_rl`` package (or skip)."""
    if not have_reference():
        pytest.skip("reference tree not available")
    _install_shims()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import gobblet_rl  # noqa: F401
    import gobblet_rl.gobblet_v1  # noqa: F401

    return gobblet_rl


def load_reference_board_cls():
    load_reference()
    from gobblet_rl.game.board import Board

    return Board
