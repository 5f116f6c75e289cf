"""Structural sharding audit over compiled (SPMD-partitioned) HLO.

A weak-scaling throughput floor on shared-core virtual devices only
catches catastrophes (round-3 verdict item 5): a 30-40% layout regression
— an accidental cross-shard gather, a replay shard silently replicated —
passes a 0.5x wall-clock bound.  These helpers inspect the compiled
module itself, where such regressions are *structural* facts:

* :func:`collective_census` lists every collective op with its payload
  bytes.  A data-parallel training step should contain exactly one class
  of collective — the parameter-sized gradient ``all-reduce`` (plus scalar
  loss reductions); any ``all-gather``/``all-to-all`` means batch-axis
  data is crossing shards.
* :func:`entry_params` maps the jit entry parameters (annotated by XLA
  with the argument path, e.g. ``buffer.board``) to their *per-device*
  shapes and sharding attributes, so a test can assert each env-state /
  replay leaf is physically partitioned (local dim = global / n_devices)
  and not silently replicated.

Used by tests/test_sharding.py::test_sharded_step_structural_audit; works
on any backend (the SPMD partitioner runs the same on CPU virtual
devices as on a TPU slice).
"""

from __future__ import annotations

import re

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_COLL_RE = re.compile(
    r"=\s+((?:\([^)]*\)|\S+))\s+"
    r"(all-reduce|all-gather|all-to-all|reduce-scatter|collective-permute)"
    r"(?:-start)?\("
)
_PARAM_RE = re.compile(
    r"=\s+(\S+)\s+parameter\(\d+\)"
    r"(?:, sharding=\{([^}]*)\})?"
    r"(?:, metadata=\{op_name=\"((?:[^\"\\]|\\.)*)\")?"
)


def shape_bytes(type_str: str) -> int:
    """Total payload bytes of an HLO type string (tuples summed)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


def shape_dims(type_str: str):
    """Dims of the FIRST array shape in an HLO type string."""
    m = _SHAPE_RE.search(type_str)
    if m is None:
        return ()
    return tuple(int(d) for d in m.group(2).split(",") if d)


def collective_census(compiled_text: str):
    """Every collective op in the module: [{op, bytes, line}, ...]."""
    out = []
    for line in compiled_text.splitlines():
        m = _COLL_RE.search(line)
        if m:
            out.append({
                "op": m.group(2),
                "bytes": shape_bytes(m.group(1)),
                "line": line.strip(),
            })
    return out


def _entry_block(compiled_text: str):
    lines = compiled_text.splitlines()
    try:
        start = next(i for i, l in enumerate(lines) if l.startswith("ENTRY"))
    except StopIteration:
        return lines  # single-computation dump
    block, depth = [], 0
    for line in lines[start:]:
        block.append(line)
        depth += line.count("{") - line.count("}")
        if depth <= 0 and len(block) > 1:
            break
    return block


def entry_params(compiled_text: str) -> dict:
    """Annotated ENTRY parameters: op_name (the jit argument path, e.g.
    ``buffer.board``) -> {type, dims, bytes, sharding}.  Shapes are
    PER-DEVICE (the module is post-SPMD-partitioning)."""
    out = {}
    for line in _entry_block(compiled_text):
        if "parameter(" not in line:
            continue
        m = _PARAM_RE.search(line)
        if m is None or m.group(3) is None:
            continue
        name = m.group(3).replace("\\'", "'").replace('\\"', '"')
        out[name] = {
            "type": m.group(1),
            "dims": shape_dims(m.group(1)),
            "bytes": shape_bytes(m.group(1)),
            "sharding": m.group(2) or "",
        }
    return out


def partitioned_leaves(params: dict, prefix: str) -> dict:
    """Subset of :func:`entry_params` output whose path starts with prefix."""
    return {k: v for k, v in params.items() if k.startswith(prefix)}


def is_partitioned(info: dict) -> bool:
    """True when the parameter's sharding annotation actually splits it
    over devices (rather than replicating it everywhere)."""
    return "devices=" in info["sharding"] and "replicated" not in info["sharding"]
