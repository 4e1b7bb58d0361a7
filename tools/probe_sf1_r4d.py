#!/usr/bin/env python
"""sf0.1 → sf1 decade probe for the fourth-wave round-4 operators
(bigram LM, star CC vs label-prop CC, co-purchase k-core, grid-bin
interval overlap, sweep-line concurrency, CUPED). Methodology identical
to tools/probe_sf1.py (noop sink, cold + best-of-2 warm, warm reported).
Inputs: gen_scale_sf1.py (documents), gen_scale_sf1_events.py (events),
gen_scale_sf1_tpch.py (lineitem/orders)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_datawarehouse_spark.plans import registry  # noqa: E402
from realtime_datawarehouse_spark.session import build_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scale_data",
    "sf1",
)

PROBE_QUERIES = (
    "text_bigram_logprob",
    "dedup_connected_components",
    "dedup_connected_components_star",
    "graph_kcore",
    "ext_interval_overlap_pairs",
    "olap_max_concurrent_intervals",
    "olap_abtest_cuped",
)


# iterative operators materialize their rounds at BUILD time (per-round
# localCheckpoint) — timing only the final noop save would miss the whole
# iteration, so these are timed as build + execute per run
BUILD_HEAVY = {
    "dedup_connected_components",
    "dedup_connected_components_star",
    "graph_kcore",
}


def _time_warm(df) -> float:
    df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def _time_warm_with_build(fn, spark, sf_dir) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = build_session(app_name="rdw-probe-sf1-r4d")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.get_queries()
    out = {}
    for name in PROBE_QUERIES:
        if name in BUILD_HEAVY:
            lo = _time_warm_with_build(queries[name], spark, SF01)
            hi = _time_warm_with_build(queries[name], spark, SF1)
        else:
            lo = _time_warm(queries[name](spark, SF01))
            hi = _time_warm(queries[name](spark, SF1))
        out[name] = {
            "sf0.1": round(lo, 3),
            "sf1": round(hi, 3),
            "ratio": round(hi / lo, 2),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
