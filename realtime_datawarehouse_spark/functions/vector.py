"""Vector scalar layer over ``array<float>`` embedding columns.

Everything is ``F.aggregate`` / ``F.zip_with`` builtin lambda expressions —
JVM-side, no Python round-trip — so brute-force similarity scans stay inside
whole-stage codegen and scale linearly with executor count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
