#!/usr/bin/env python
"""sf0.1 → sf1 decade probe for MULTIPROBE semantic-LSH dedup (round 6).

`dedup_semantic_probed` (operators/similarity.semdedup_lsh_probed) fans
the bucket ASSIGNMENT out ≤ probes+1 rows per vector, so candidate pairs
can grow up to (probes+1)² per bucket — the recall dial's cost side. The
claim in its docstring is that this stays near-linear like the probes=0
base form (SCALE.md §12: 4.6×/decade); this probe measures it one decade
up, at probes ∈ {0, 1, 2, 4}, on the same sf1 fixture as §12
(tools/gen_scale_sf1.py — bootstrap-resampled embeddings preserving the
cluster geometry, 2 000 → 20 000 vectors).

Methodology mirrors bench.py/probe_sf1.py: noop sink, cold then
best-of-2 warm, warm reported. Prints one JSON line:
{"probes=k": {"sf0.1": s, "sf1": s, "ratio": r}, ...,
 "calib_py_loop_s": s}.
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

from realtime_datawarehouse_spark.operators import similarity  # noqa: E402
from realtime_datawarehouse_spark.session import build_session  # noqa: E402
from realtime_datawarehouse_spark.tables import table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scale_data",
    "sf1",
)

PROBES = (0, 1, 2, 4)


def _time_warm(df: DataFrame) -> float:
    df.write.format("noop").mode("overwrite").save()  # cold
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
    spark = build_session(app_name="probe-sf1-r6-probed")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for probes in PROBES:
        row: dict = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            emb = table(spark, sf_dir, "embeddings")
            if probes == 0:
                df = similarity.semdedup_lsh(emb)
            else:
                df = similarity.semdedup_lsh_probed(emb, probes=probes)
            row[label] = round(_time_warm(df), 3)
        row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        out[f"probes={probes}"] = row
    out["calib_py_loop_s"] = round(_calib(), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
