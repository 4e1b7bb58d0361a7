#!/usr/bin/env python
"""Round-14 optimization workbench: solo re-times and plan captures.

Usage:
    python tools/r14_tools.py retime q1 q2 ...   [--sf 0.1] [--runs 5]
    python tools/r14_tools.py plan   q1 q2 ...   [--suffix before]

``retime`` builds each named query at $SPARK_GRAFT_SF_DIR (default sf0.1),
runs one cold noop save then best-of-N warm saves (guide §1.4), and prints
a JSON line per query plus calib stamps — the same methodology as bench.py
so numbers are comparable.

``plan`` writes ``plans/r14/<name>_<suffix>.txt`` with the
``explain("formatted")`` output at sf0.1 (the judge checks plan claims
against these files).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_datawarehouse_spark.plans import registry  # noqa: E402
from realtime_datawarehouse_spark.session import build_session  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _calib() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(10_000_000):
        s += i
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    mode = sys.argv[1]
    args, names, sf, runs, suffix = sys.argv[2:], [], "0.1", 5, "before"
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--sf"):
            sf = a.split("=", 1)[1] if "=" in a else args[i + 1]
            i += 1 if "=" not in a else 0
        elif a.startswith("--runs"):
            runs = int(a.split("=", 1)[1] if "=" in a else args[i + 1])
            i += 1 if "=" not in a else 0
        elif a.startswith("--suffix"):
            suffix = a.split("=", 1)[1] if "=" in a else args[i + 1]
            i += 1 if "=" not in a else 0
        elif not a.startswith("--"):
            names.append(a)
        i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", f"/root/testdata/sf{sf}")
    spark = build_session(app_name=f"r14-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load()

    if mode == "plan":
        outdir = os.path.join(REPO, "plans", "r14")
        os.makedirs(outdir, exist_ok=True)
        jmode = (
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        for name in names:
            df = registry.QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(jmode)
            p = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(p, "w", encoding="utf-8") as f:
                f.write(plan)
            print(f"{name}: {p} ({plan.count('Exchange')} Exchange refs)")
        return

    assert mode == "retime", mode
    # parallel calib (SCALE.md §41): warm 50M-row range-sum — the pair
    # (calib_py, calib_spark) separates single-thread host noise from
    # multi-core contention; stamp both at start and end.
    rng = spark.range(50_000_000).selectExpr("sum(id) AS s")
    rng.write.format("noop").mode("overwrite").save()

    def _calib_spark() -> float:
        t0 = time.perf_counter()
        rng.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {"calib_py_start": _calib(), "calib_spark_start": _calib_spark()}
        )
    )
    for name in names:
        spark.sparkContext.setJobDescription(f"r14 retime: {name}")
        df = registry.QUERIES[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        cold = round(time.perf_counter() - t0, 3)
        best, all_runs = float("inf"), []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            all_runs.append(round(dt, 3))
            best = min(best, dt)
        print(
            json.dumps(
                {
                    "query": name,
                    "cold": cold,
                    "best": round(best, 3),
                    "runs": all_runs,
                }
            )
        )
    print(
        json.dumps(
            {"calib_py_end": _calib(), "calib_spark_end": _calib_spark()}
        )
    )


if __name__ == "__main__":
    main()
