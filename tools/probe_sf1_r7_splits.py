#!/usr/bin/env python
"""sf0.1 → sf1 decade probe for the round-7 split/leakage family.

The four new queries compose audited stages, so their decade ratios
should land inside those stages' measured bands:

- mix_cluster_aware_split: one shuffle (window min on md5) + map-only
  split math — expect near-linear (≈1-3×/decade).
- curate_split_leakage_neardup: banded-MinHash pairs (SCALE.md §12's
  3-5×/decade band) + map-only split labels + ≤9-row rollup — expect
  the LSH band, no extra term.
- mix_cluster_aware_split_neardup: LSH pairs + iterative CC (§19's
  near-flat per-round shape on shallow dup components) + map-only.
- pipeline_corpus_curation_v4: the full composed flow (v3's §12 band +
  CC + split) — the end-to-end number the pipeline ships with.

Methodology mirrors bench.py/probe_sf1.py: noop sink, cold then
best-of-2 warm, warm reported; sf1 fixture from tools/gen_scale_sf1.py
(fresh random texts — no manufactured near-dups; bootstrap-resampled
embeddings preserving cluster geometry). Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame  # noqa: E402

from realtime_datawarehouse_spark.plans import registry  # noqa: E402
from realtime_datawarehouse_spark.session import build_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scale_data",
    "sf1",
)

QUERIES = (
    "mix_cluster_aware_split",
    "curate_split_leakage_neardup",
    "mix_cluster_aware_split_neardup",
    "pipeline_corpus_curation_v4",
)


def _warm(df: DataFrame) -> float:
    df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def _calib() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i
    return time.perf_counter() - t0


def main() -> None:
    spark = build_session(app_name="probe-r7-splits")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load()
    out: dict = {}
    for name in QUERIES:
        fn = registry.QUERIES[name]
        a = round(_warm(fn(spark, SF01)), 3)
        b = round(_warm(fn(spark, SF1)), 3)
        out[name] = {"sf0.1": a, "sf1": b, "ratio": round(b / a, 2)}
    out["calib_py_loop_s"] = round(_calib(), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
