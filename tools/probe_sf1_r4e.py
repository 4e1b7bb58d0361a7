#!/usr/bin/env python
"""sf0.1 → sf1 decade probe for the fifth-wave round-4 operators (top
paths, FIFO allocation, rolling median, clamped balance, active-time
union, reconciliation, PSI, length bucketing, IVF balance). Methodology
identical to tools/probe_sf1_r4d.py (noop sink, cold + best-of-2 warm)."""
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
    "olap_top_paths",
    "olap_fifo_allocation",
    "olap_rolling_median_gmv",
    "olap_clamped_running_balance",
    "olap_active_time_union",
    "olap_reconciliation_report",
    "olap_snapshot_drift_psi",
    "mix_length_bucketing",
    "ann_ivf_balance_report",
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
    spark = build_session(app_name="rdw-probe-sf1-r4e")
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
