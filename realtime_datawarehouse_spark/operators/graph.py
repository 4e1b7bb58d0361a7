"""Distributed graph analytics over edge-list DataFrames.

``pagerank`` is an iterative fixed-point (integer) PageRank: ranks are
held as int64 micro-units (``SCALE`` = 1e12 per unit of probability mass)
and every update is integer arithmetic — multiply, floor-divide, sum — so
partial aggregation order can never flip a bit and a SQL engine unrolling
the same iterations (the DuckDB oracle) reproduces the result EXACTLY.
Floor division truncates a few units per edge (mass shrinks monotonically,
bounded by |edges| × iters × 1e-12); that loss is deterministic and
identical in both engines, which is the property an oracle-checked
iterative operator needs.

Scale design (100 TB story):
- Each iteration is ONE shuffle join (ranks × out-degree-annotated edges
  on ``src``) + ONE map-side-combinable integer sum on ``dst`` — the
  classic Pregel contraction expressed as DataFrame ops. Nothing ever
  reaches the driver; iteration count is the only sequential dimension.
- The edge set with out-degrees is computed once and persisted across
  iterations (the loop re-reads it ``iters`` times).
- Both operands of every floor division are non-negative, where Spark's
  ``div`` (truncate toward zero) and DuckDB's ``//`` (floor) agree.

Caveat (documented contract): nodes with no OUT-edges (dangling) keep
receiving mass but redistribute none — their inflow evaporates instead of
being re-spread. Standard dangling-mass redistribution needs one extra
global sum per iteration; the registered ring-topology query has no
dangling nodes, so the simpler form is exact there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    d_num: int = 85,
    d_den: int = 100,
    scale: int = SCALE,
) -> DataFrame:
    """Integer fixed-point PageRank over ``edges(src, dst)``.

    Returns (node, rank_q) with rank_q = rank × ``scale`` as int64.
    r₀ = ⌊S/N⌋;  rᵢ₊₁(v) = ⌊S·(1−d)/(den·N)⌋ + Σ_{u→v} ⌊rᵢ(u)·num/(den·od(u))⌋.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outd = edges.groupBy("src").agg(F.count("*").alias("od"))
    ej = edges.join(outd, "src").persist()
    n_df = nodes.agg(F.count("*").alias("n_nodes"))
    base_nodes = nodes.crossJoin(F.broadcast(n_df))
    r = base_nodes.select(
        "node", F.expr(f"CAST({scale} AS BIGINT) div n_nodes").alias("rq")
    )
    base_term = F.expr(
        f"CAST({scale * (d_den - d_num)} AS BIGINT) div ({d_den} * n_nodes)"
    )
    for _ in range(iters):
        contrib = r.join(ej.hint("shuffle_hash"), r["node"] == ej["src"]).select(
            F.col("dst").alias("node"),
            F.expr(f"(rq * {d_num}) div ({d_den} * od)").alias("c"),
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("infl"))
        r = (
            base_nodes.join(inflow.hint("shuffle_hash"), "node", "left")
            .select(
                "node",
                (base_term + F.coalesce(F.col("infl"), F.lit(0))).alias("rq"),
            )
        )
    return r.select("node", F.col("rq").alias("rank_q"))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle participation counts over the undirected view
    of ``edges(src, dst)`` — the local clustering signal (spam rings,
    community density) warehouses compute on interaction graphs.

    Algorithm: canonicalize each edge to (a < b); build wedges a−b−c with
    a < b < c by joining the edge list with itself (each triangle is
    generated EXACTLY once as its vertex-ordered wedge + closing edge —
    no 3!/6 overcount, no division); verify the closing (a, c) edge with
    a semi-join-shaped inner join; explode the 3 vertices and count.

    Scale shape: the vertex-ordered join IS the classic degree-bound
    mitigation — a vertex only extends wedges toward higher-numbered
    neighbors, so a hub's wedge fan-out is bounded by its higher-ordered
    degree (~d/2 on average; a full degree-ORDERED orientation — relabel
    vertices by ascending degree first — tightens the bound to the
    graph's degeneracy and drops in here as one extra rank join at 100 TB
    skew). All joins are hash joins on int64 keys (hinted; no sorts).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    ext = und.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    wedge = und.join(ext.hint("shuffle_hash"), F.col("b") == F.col("b2")).select(
        "a", "b", "c"
    )
    closing = und.select(F.col("a").alias("ca"), F.col("b").alias("cc"))
    tri = wedge.join(
        closing.hint("shuffle_hash"),
        (F.col("a") == F.col("ca")) & (F.col("c") == F.col("cc")),
    ).select("a", "b", "c")
    return (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("tri_ct"))
    )
