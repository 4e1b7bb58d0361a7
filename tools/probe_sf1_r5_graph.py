#!/usr/bin/env python
"""sf0.1 → sf1 decade probe for the ITERATIVE graph operators
(VERDICT.md r4 item 7): graph_pagerank, graph_coreness, graph_bfs_layers.

All timings are BUILD-INCLUSIVE (time the query-function call AND one
noop-sink execution, best-of-2): the lineage-cut operators (bfs, coreness)
do their per-round work eagerly at build time via localCheckpoint, so
write-only timing would measure nothing but the final replay (the
methodology note from tools/probe_sf1_r4d.py).

Three measurements:

1. end-to-end at sf0.1 and sf1 with graph-size context (|V|, |E| — the
   co-purchase graph DENSIFIES superlinearly when 10× orders hit the same
   part catalog, so the per-EDGE ratio is the honest coreness number);
2. marginal per-iteration cost at sf1, (t(2k)-t(k))/k at two k — flat
   marginals show each round costs O(edges) with no plan/lineage growth;
3. pagerank lazy vs checkpoint_every=1 at depth 2/4/8 — the declarative
   unroll's marginal GROWS with depth (each action re-plans the whole
   chain), the per-round cut holds it flat: the measurement behind the
   checkpoint_every knob on operators/graph.py::pagerank.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from realtime_datawarehouse_spark.operators.graph import (  # noqa: E402
    bfs_layers,
    pagerank,
)
from realtime_datawarehouse_spark.plans import graph_ops, registry  # noqa: E402
from realtime_datawarehouse_spark.session import build_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scale_data",
    "sf1",
)


def _time_built(fn) -> float:
    """Build + execute, best-of-2 (build-inclusive: checkpoint-at-build
    operators do their real work inside fn())."""
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def _coreness_rounds(spark, sym, rounds: int):
    """graph_coreness's exact loop body with a rounds parameter over a
    PRE-BUILT symmetric edge set (the registered query pins
    CORENESS_ROUNDS and builds its own edges; the probe pre-checkpoints
    the 96.7×-densified edge set OUTSIDE the timed region so the
    marginal isolates per-round cost — ADVICE r5 #2)."""
    vals = (
        sym.groupBy("u")
        .agg(F.count("*").cast("bigint").alias("val"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        nb = sym.join(
            vals.select(F.col("u").alias("v"), F.col("val").alias("nval")),
            "v",
        ).select("u", "nval")
        wi = Window.partitionBy("u").orderBy(F.desc("nval"))
        h = (
            nb.withColumn("i", F.row_number().over(wi))
            .groupBy("u")
            .agg(F.max(F.least(F.col("nval"), F.col("i"))).alias("h"))
        )
        vals = (
            vals.join(h, "u")
            .select("u", F.least(F.col("val"), F.col("h")).alias("val"))
            .localCheckpoint(eager=True)
        )
    return vals


def _bfs_inputs(spark, sf_dir: str):
    ring = graph_ops._ring_edges(spark, sf_dir, skip=graph_ops.TRI_SKIP)
    und = (
        ring.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dedges = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    seeds = (
        und.select(F.col("a").alias("node"))
        .union(und.select("b"))
        .distinct()
        .where(F.col("node") % graph_ops.BFS_SEED_MOD == 0)
    )
    return dedges, seeds


def _graph_stats(edges) -> tuple[int, int]:
    e = edges.count()
    v = (
        edges.select(F.col(edges.columns[0]).alias("n"))
        .union(edges.select(edges.columns[1]))
        .distinct()
        .count()
    )
    return v, e


def main() -> None:
    spark = build_session(app_name="rdw-probe-sf1-r5-graph")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.get_queries()
    out: dict = {"end_to_end": {}, "graph_size": {}, "marginal_sf1": {}}

    for sf_name, sf in (("sf0.1", SF01), ("sf1", SF1)):
        v, e = _graph_stats(graph_ops._ring_edges(spark, sf))
        cv, ce = _graph_stats(graph_ops._copurchase_sym_edges(spark, sf))
        out["graph_size"][sf_name] = {
            "ring_nodes": v,
            "ring_edges": e,
            "copurchase_nodes": cv,
            "copurchase_sym_edges": ce,
        }

    for name in ("graph_pagerank", "graph_bfs_layers", "graph_coreness"):
        lo = _time_built(lambda n=name: queries[n](spark, SF01))
        hi = _time_built(lambda n=name: queries[n](spark, SF1))
        out["end_to_end"][name] = {
            "sf0.1": round(lo, 3),
            "sf1": round(hi, 3),
            "ratio": round(hi / lo, 2),
        }
    gs = out["graph_size"]
    edge_growth = (
        gs["sf1"]["copurchase_sym_edges"] / gs["sf0.1"]["copurchase_sym_edges"]
    )
    out["end_to_end"]["graph_coreness"]["copurchase_edge_growth"] = round(
        edge_growth, 1
    )
    out["end_to_end"]["graph_coreness"]["ratio_per_edge"] = round(
        out["end_to_end"]["graph_coreness"]["ratio"] / edge_growth, 2
    )

    # marginal per-iteration cost at sf1: flat marginals = per-round work
    # is O(edges) with no plan/lineage growth across rounds
    ring1 = graph_ops._ring_edges(spark, SF1).localCheckpoint(eager=True)
    for label, kw in (
        ("pagerank_lazy", {}),
        ("pagerank_ckpt1", {"checkpoint_every": 1}),
    ):
        t = {
            k: _time_built(lambda k=k: pagerank(ring1, iters=k, **kw))
            for k in (2, 4, 8)
        }
        out["marginal_sf1"][label] = {
            "per_iter_2_4": round((t[4] - t[2]) / 2, 3),
            "per_iter_4_8": round((t[8] - t[4]) / 4, 3),
            "totals": {str(k): round(s, 3) for k, s in t.items()},
        }
    dedges, seeds = _bfs_inputs(spark, SF1)
    t = {
        k: _time_built(lambda k=k: bfs_layers(dedges, seeds, max_hops=k))
        for k in (2, 4, 8)
    }
    out["marginal_sf1"]["bfs_per_hop"] = {
        "per_hop_2_4": round((t[4] - t[2]) / 2, 3),
        "per_hop_4_8": round((t[8] - t[4]) / 4, 3),
        "totals": {str(k): round(s, 3) for k, s in t.items()},
    }
    sym1 = graph_ops._copurchase_sym_edges(spark, SF1).localCheckpoint(
        eager=True
    )
    t = {
        k: _time_built(lambda k=k: _coreness_rounds(spark, sym1, k))
        for k in (4, 8, 16)
    }
    out["marginal_sf1"]["coreness_per_round"] = {
        "per_round_4_8": round((t[8] - t[4]) / 4, 3),
        "per_round_8_16": round((t[16] - t[8]) / 8, 3),
        "totals": {str(k): round(s, 3) for k, s in t.items()},
    }

    # host-speed stamp (same calibration as bench.py)
    t0 = time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i
    out["calib_py_loop_s"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
