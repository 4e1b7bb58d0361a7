#!/usr/bin/env python
"""Block until the host is in its quiet band, then exit 0.

Polls the two §28/§41 calibration workloads — the single-thread Python
loop (quiet ≈ 0.34-0.43 s) and the warm 50M-row Spark range-sum (quiet
≈ 0.07-0.10 s) — every ``INTERVAL_S`` seconds and exits success when
BOTH read under their thresholds, or exits 1 after ``MAX_WAIT_S``.
SCALE.md §41: the pair diverges exactly when external vCPU contention
degrades parallel stages, so gating a recorded bench on both avoids
recording (or re-recording floors from) a degraded window.

Usage: python tools/wait_quiet.py [max_wait_s]  && python bench.py ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_datawarehouse_spark.session import build_session  # noqa: E402

PY_QUIET_S = 0.55
SPARK_QUIET_S = 0.20
INTERVAL_S = 90


def calib_py() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    max_wait = float(sys.argv[1]) if len(sys.argv) > 1 else 2400.0
    spark = build_session(app_name="wait-quiet")
    spark.sparkContext.setLogLevel("ERROR")
    rng = spark.range(50_000_000).selectExpr("sum(id) AS s")
    rng.write.format("noop").mode("overwrite").save()  # warm the plan
    t_start = time.perf_counter()
    while True:
        cp = calib_py()
        t0 = time.perf_counter()
        rng.write.format("noop").mode("overwrite").save()
        cs = round(time.perf_counter() - t0, 3)
        quiet = cp < PY_QUIET_S and cs < SPARK_QUIET_S
        print(
            f"calib_py={cp} calib_spark={cs} quiet={quiet}", flush=True
        )
        if quiet:
            spark.stop()
            sys.exit(0)
        if time.perf_counter() - t_start > max_wait:
            print("max wait exceeded; host still loud", flush=True)
            spark.stop()
            sys.exit(1)
        time.sleep(INTERVAL_S)


if __name__ == "__main__":
    main()
