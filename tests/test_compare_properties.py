"""Property tests (hypothesis) for the cross-engine float discipline in
functions/compare.py — the invariants every oracle match rests on:

- dsum's per-row quantization makes the sum ORDER-FREE: any permutation
  and any partitioning into partial sums yields the identical int64 total.
- pround is monotone, idempotent at its own grid, and half-up at exact
  .5 boundaries representable in binary.

These run the same arithmetic the Column expressions compile to (floor,
multiply, add on IEEE doubles) in plain Python — the formulas are engine-
independent by construction, which is exactly the property under test.
"""

from __future__ import annotations

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st

_Q = 1_000_000


def q6(x: float) -> int:
    return math.floor(x * _Q + 0.5)


def pround(x: float, scale: int = 2) -> float:
    m = 10**scale
    return math.floor(x * m + 0.5) / float(m)


money = st.floats(
    min_value=0.0, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=300, deadline=None)
@given(st.lists(money, min_size=1, max_size=50), st.randoms())
def test_dsum_order_and_partition_free(xs, rnd):
    """Σ q6(x) is identical under any permutation AND any grouping into
    partial sums (map-side combine ≡ single fold) — int addition is
    associative/commutative, which is the whole point of quantizing
    BEFORE summation."""
    base = sum(q6(x) for x in xs)
    perm = xs[:]
    rnd.shuffle(perm)
    assert sum(q6(x) for x in perm) == base
    # random partitioning into "partitions", partials summed first
    parts: list[list[float]] = [[], [], []]
    for x in xs:
        parts[rnd.randrange(3)].append(x)
    assert sum(sum(q6(x) for x in p) for p in parts) == base


@settings(max_examples=300, deadline=None)
@given(money, money)
def test_pround_monotone(a, b):
    lo, hi = min(a, b), max(a, b)
    assert pround(lo) <= pround(hi)


@settings(max_examples=300, deadline=None)
@given(money)
def test_pround_idempotent_on_grid(x):
    assert pround(pround(x)) == pround(x)


def test_pround_half_up_at_representable_boundaries():
    """Exact binary-representable .5-boundary cases round UP in every
    engine running floor(x*100 + 0.5) — including the 4.475 case where
    decimal-string rounding (Spark's round()) and binary rounding
    (DuckDB's round()) disagree, which is why the repo bans round()."""
    assert pround(0.125, 2) == 0.13  # 0.125 is exact in binary
    assert pround(2.5, 0) == 3.0
    assert pround(3.5, 0) == 4.0
    # the motivating case: 4.475 stored as 4.474999... — floor formula
    # gives the same answer in BOTH engines (here: the binary-faithful one)
    assert pround(4.475, 2) == math.floor(4.475 * 100 + 0.5) / 100.0
