#!/usr/bin/env python
"""sf0.1 → sf1 decade probe for the round-4 continuation operators
(events: SCD2 build/PIT, nearest as-of, KMV sketches, Bollinger;
documents: winnowing, PMI, dup-aware weights). Methodology identical to
tools/probe_sf1.py (noop sink, cold + best-of-2 warm, warm reported).
Inputs from gen_scale_sf1.py + gen_scale_sf1_events.py."""
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
    "olap_scd2_intervals",
    "ext_scd2_point_in_time_join",
    "ext_asof_nearest",
    "sk_kmv_distinct",
    "sk_kmv_union",
    "olap_bollinger_bands",
    "text_winnowing_fingerprint",
    "text_cooccur_pmi",
    "mix_dup_aware_weights",
)


def _time_warm(df) -> float:
    df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = build_session(app_name="rdw-probe-sf1-r4c")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.get_queries()
    out = {}
    for name in PROBE_QUERIES:
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
