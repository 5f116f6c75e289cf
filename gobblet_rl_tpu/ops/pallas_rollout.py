"""Pallas TPU kernel: fully-fused random self-play rollout.

The XLA path (ops/batched_core.rollout_random) already fuses each ply, but
between plies the board/current state round-trips HBM.  This kernel pins a
tile of environments in VMEM and runs ALL ``num_steps`` plies on-chip:

* grid over batch tiles (``TILE`` environments ride the 128-wide lanes);
* per ply: legal mask -> uniform-over-mask action via random-bits argmax
  (argmax of iid uniform draws over the legal set is an exact uniform
  choice, lowest-index tie-break) -> placement -> win fold -> auto-reset;
* on-chip PRNG (pltpu.prng_*), seeded per tile;
* only aggregate win/episode counters and the final state leave VMEM.

Mosaic-friendliness rules used throughout (learned the hard way):
everything is rank-2 ``[rows, TILE]`` — the board is ``(27, TILE)``, every
per-env scalar is ``(1, TILE)`` so broadcasts against board rows need no
reshape; per-action tables come from ``broadcasted_iota`` arithmetic and
static row slicing/tiling (no gathers, no scatters, no rank-1 vectors, no
bool reductions, and reduce-argmax is replaced by max + lowest-index select).

Rule semantics are identical to :mod:`gobblet_rl_tpu.ops.batched_core`
(asserted in tests/test_pallas.py by replaying final boards through the host
rules); RNG streams differ, so cross-engine comparisons are statistical.
The sampled action is always legal (the legal set is provably non-empty:
a large piece can always move), so the in-kernel step skips re-validation.

PERFORMANCE FINDING (TPU v5e, measured): this kernel sustains ~4.3M
env-steps/s regardless of tile size (256..4096), while the XLA-compiled
engine in batched_core reaches ~171M.  The game state is tiny (27 B/env),
so the inter-ply HBM traffic the kernel eliminates was never the
bottleneck; XLA's fused codegen over the full 512k-lane batch beats the
hand-scheduled per-tile loop by ~40x.  The kernel is kept as a validated
Pallas reference ("let XLA fuse what it already fuses well" — the right
TPU call here); the production rollout path is batched_core.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gobblet_rl_tpu.core import types as T

TILE = 2048  # default environments per grid program (16 x 128 lanes)
_WIN_LINES = T.WIN_LINES_NP


def _flat(board):
    """int32[9, TILE] topmost signed piece per cell (3-way level select)."""
    small, med, large = board[0:9], board[9:18], board[18:27]
    return jnp.where(large != 0, large, jnp.where(med != 0, med, small))


def _legal_mask(board, sign):
    """bool[54, TILE] from int32[27, TILE] board and int32[1, TILE] sign."""
    own = board * sign
    occ = board != 0
    # int32 0/1 masks: Mosaic rejects concatenates over i1 vectors
    c_small = (occ[0:9] & (occ[9:18] | occ[18:27])).astype(jnp.int32)
    c_med = (occ[9:18] & occ[18:27]).astype(jnp.int32)
    zeros9 = jnp.zeros_like(c_small)
    cov_i = jnp.concatenate([c_small, c_med, zeros9], axis=0)  # [27, TILE]

    # frozen piece flags, one (1, TILE) row per piece id, tiled 9x in action
    # order (action a moves piece a//9 + 1)
    frozen_rows = []
    for p in range(1, 7):
        fp = jnp.max(jnp.where(own == p, cov_i, 0), axis=0, keepdims=True)
        frozen_rows.append(jnp.broadcast_to(fp, (9, fp.shape[-1])))
    frozen54 = jnp.concatenate(frozen_rows, axis=0) > 0       # [54, TILE]

    top = _flat(board)                                        # [9, TILE]
    top_size = (jnp.abs(top) + 1) // 2
    flat54 = jnp.concatenate([top] * 6, axis=0)               # row a = top[a%9]
    size54 = jnp.concatenate([top_size] * 6, axis=0)

    a_ids = jax.lax.broadcasted_iota(jnp.int32, flat54.shape, 0)
    my_size = (a_ids // 9 + 2) // 2                           # action piece size
    return ((flat54 == 0) | (my_size > size54)) & ~frozen54


def _winner(top):
    """int32[1, TILE] last-line-wins fold (board.py:183-194 order)."""
    w = jnp.zeros((1, top.shape[-1]), jnp.int32)
    for c0, c1, c2 in _WIN_LINES:
        a, b, c = top[c0:c0 + 1], top[c1:c1 + 1], top[c2:c2 + 1]
        pos = (a > 0) & (b > 0) & (c > 0)
        neg = (a < 0) & (b < 0) & (c < 0)
        lw = pos.astype(jnp.int32) - neg.astype(jnp.int32)
        w = jnp.where(lw != 0, lw, w)
    return w


def _rollout_kernel(num_steps, seed_ref, board_ref, cur_ref,
                    board_out_ref, cur_out_ref, stats_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    n = board_ref.shape[-1]

    def body(_, carry):
        board, cur, eps, w1, w2 = carry                       # [27,T], [1,T]
        sign = jnp.where(cur == 0, 1, -1)

        mask = _legal_mask(board, sign)                       # [54, T]
        bits = pltpu.bitcast(pltpu.prng_random_bits((54, n)), jnp.uint32)
        # 24-bit draws as exact float32 ints (Pallas reductions want f32;
        # uint32 -> f32 casts are unsupported, so bitcast through int32)
        draws24 = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32)
        draws = jnp.where(mask, draws24, -1.0)
        maxv = jnp.max(draws, axis=0, keepdims=True)          # [1, T]
        a_ids = jax.lax.broadcasted_iota(jnp.int32, draws.shape, 0)
        action = jnp.min(
            jnp.where(mask & (draws == maxv), a_ids, 99), axis=0, keepdims=True
        )                                                     # [1, T]

        pos = action % 9
        piece = action // 9 + 1
        level = (piece + 1) // 2 - 1
        signed = piece * sign                                 # [1, T]
        target_row = level * 9 + pos                          # [1, T]

        row_ids = jax.lax.broadcasted_iota(jnp.int32, board.shape, 0)
        pres = board == signed                                # lift old location
        place = row_ids == target_row
        board = jnp.where(place, signed, jnp.where(pres, 0, board))

        win = _winner(_flat(board))                           # [1, T]
        done = win != 0
        eps = eps + jnp.sum(done.astype(jnp.int32))
        w1 = w1 + jnp.sum((win == 1).astype(jnp.int32))
        w2 = w2 + jnp.sum((win == -1).astype(jnp.int32))
        board = jnp.where(done, 0, board)                     # [1,T] broadcasts
        cur = jnp.where(done, 0, 1 - cur)
        return board, cur, eps, w1, w2

    board = board_ref[:].astype(jnp.int32)
    cur = cur_ref[:].astype(jnp.int32)
    zero = jnp.int32(0)
    board, cur, eps, w1, w2 = jax.lax.fori_loop(
        0, num_steps, body, (board, cur, zero, zero, zero)
    )
    board_out_ref[:] = board.astype(jnp.int8)
    cur_out_ref[:] = cur
    # stats in a lane-aligned (8, 128) tile; row 0, cols 0-2 used (iota
    # selects: scatter is unsupported in Pallas TC kernels)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.where((row == 0) & (col == 0), eps, 0)
    out = jnp.where((row == 0) & (col == 1), w1, out)
    out = jnp.where((row == 0) & (col == 2), w2, out)
    stats_ref[:] = out


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def rollout_random_pallas(board, current, num_steps: int, seed: int = 0,
                          interpret: bool = False, tile: int = TILE):
    """Fused random rollout.

    Args:
      board: int8[3, 9, B] lane-major batch (B % TILE == 0).
      current: int32[B].
      num_steps: plies per environment.
    Returns:
      (board' int8[3, 9, B], current' int32[B], stats dict) — same aggregate
      contract as batched_core.rollout_random.
    """
    B = board.shape[-1]
    TILE = tile
    assert B % TILE == 0, (B, TILE)
    grid = (B // TILE,)
    seed_arr = jnp.asarray([seed], jnp.int32)

    out_board, out_cur, stats = pl.pallas_call(
        partial(_rollout_kernel, num_steps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((27, TILE), lambda i, *_: (0, i)),
                pl.BlockSpec((1, TILE), lambda i, *_: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((27, TILE), lambda i, *_: (0, i)),
                pl.BlockSpec((1, TILE), lambda i, *_: (0, i)),
                pl.BlockSpec((8, 128), lambda i, *_: (i, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((27, B), jnp.int8),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((B // TILE * 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(seed_arr, board.reshape(27, B), current[None].astype(jnp.int32))

    per_tile = stats.reshape(B // TILE, 8, 128)[:, 0, :3]
    totals = per_tile.sum(axis=0)
    return out_board.reshape(3, 9, B), out_cur[0], {
        "episodes": totals[0],
        "wins_p1": totals[1],
        "wins_p2": totals[2],
    }
