"""Machine-checked scaling witnesses: HLO collective census + cost analysis.

The obs-sharded LOO design claims (SURVEY.md §5): every per-observation
kernel is embarrassingly parallel, so the ONLY cross-device communication in
a sharded LOO step is the final scalar reductions (elpd total, SE moments,
p_loo, k-diagnostics) — all-reduces of scalars — and per-device work stays
constant when per-device rows are constant.  Those are static properties of
the compiled program, so they are *asserted*, not extrapolated from
wall-clock: :func:`collective_census` parses the post-SPMD-partitioning HLO
of a lowered+compiled function and classifies every collective by result
shape; :func:`assert_scalar_only_collectives` fails if any non-scalar
collective (all-gather, all-to-all, collective-permute, or a tensor-shaped
all-reduce) appears.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

__all__ = [
    "collective_census",
    "assert_scalar_only_collectives",
    "compiled_flops",
]

# HLO collective opcodes (including their async -start forms; the matching
# -done carries no shape of its own).  Ranked shapes in optimized HLO carry
# a layout suffix — ``f64[64]{0}`` — which MUST be admitted by the shape
# pattern: without it, non-scalar collectives silently fail to parse and the
# witness passes exactly when it should fail (found by the shard_map
# vector-psum negative control).
_SHAPE = r"[a-z0-9]+\[[^\]]*\](?:\{[^}]*\})?"
_COLLECTIVE_RE = re.compile(
    r"=\s*(?P<shape>\((?:[^()]|\([^)]*\))*\)|" + _SHAPE + r")\s*"
    r"(?P<op>all-reduce|all-gather|reduce-scatter|all-to-all|"
    r"collective-permute|collective-broadcast|ragged-all-to-all)"
    r"(?:-start)?\("
)

_SCALAR_SHAPE_RE = re.compile(r"^[a-z0-9]+\[\]$")
_LAYOUT_RE = re.compile(r"\{[^}]*\}")


def _shapes_in(shape_str: str) -> list[str]:
    """Component shapes of an HLO result, layouts stripped:
    'f64[64]{0}' -> ['f64[64]'];  '(f64[], s32[2]{0})' -> ['f64[]', 's32[2]']."""
    shape_str = _LAYOUT_RE.sub("", shape_str.strip())
    if shape_str.startswith("("):
        inner = shape_str[1:-1]
        return [s.strip() for s in inner.split(",") if s.strip()]
    return [shape_str]


def collective_census(compiled) -> dict[str, list[str]]:
    """Map collective opcode -> result shapes in a compiled HLO module.

    ``compiled`` is the object returned by ``jax.jit(f).lower(*args)
    .compile()`` (or anything with ``as_text()``).  The text is the
    optimized, SPMD-partitioned per-device module, so what is counted here
    is exactly what each device executes.
    """
    text = compiled.as_text() if hasattr(compiled, "as_text") else str(compiled)
    census: dict[str, list[str]] = {}
    for match in _COLLECTIVE_RE.finditer(text):
        op = match.group("op")
        census.setdefault(op, []).extend(_shapes_in(match.group("shape")))
    return census


def assert_scalar_only_collectives(
    compiled, *, allow_ops: tuple[str, ...] = ("all-reduce",)
) -> dict[str, list[str]]:
    """Assert every collective is a scalar reduction; return the census.

    Allowed: ``allow_ops`` (default: all-reduce only) whose every result
    component is a scalar shape like ``f64[]``.  Anything else — an
    all-gather, an all-to-all, a collective-permute, or a tensor-shaped
    all-reduce — means the program communicates more than the final
    reductions, violating the obs-sharding contract.
    """
    census = collective_census(compiled)
    for op, shapes in census.items():
        if op not in allow_ops:
            raise AssertionError(
                f"unexpected collective {op!r} in compiled module "
                f"(shapes {shapes}); obs-sharded LOO must only all-reduce "
                "the final scalars"
            )
        bad = [s for s in shapes if not _SCALAR_SHAPE_RE.match(s)]
        if bad:
            raise AssertionError(
                f"{op} over non-scalar shapes {bad}; only scalar final "
                "reductions may cross devices"
            )
    return census


def compiled_flops(compiled) -> float | None:
    """Per-device FLOP count from XLA's cost analysis (None if unavailable).

    After SPMD partitioning the compiled module IS the per-device program,
    so at constant per-device work this number must stay constant as the
    mesh grows — the machine-checked form of "weak scaling is flat".
    """
    try:
        cost: Mapping[str, Any] | None = compiled.cost_analysis()
    except Exception:  # pragma: no cover - backend without cost analysis
        return None
    if isinstance(cost, (list, tuple)):  # older jax returned [dict]
        cost = cost[0] if cost else None
    if not cost:
        return None
    flops = cost.get("flops")
    return float(flops) if flops is not None else None
