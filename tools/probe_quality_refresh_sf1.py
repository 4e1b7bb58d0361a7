"""sf1 probe of the QUALITY-MODEL refresh policy (VERDICT r11 item 5;
results in SCALE.md §39): §37 probed the composed loop's policies and
§38 the BPE loop at sf1, but the quality-refresh TRIGGER path's costs —
the GD trainer's wall time at sf1 was the open question (§33 measured
sf0.1) — were extrapolated, not measured.

Shape, on the 50 000-doc sf1 corpus:
  1. seed: score + merge the full corpus into a standing quality table
     (one ``ingest_quality_step`` — the table every later number reads);
  2. day-0 install: ``refresh_quality_model`` with the production GD
     trainer (``train_quality_classifier``, label = lang='en') — this IS
     the fired-trigger cost: train + rescore-all + snapshot + one CAS
     commit;
  3. audit: ``quality_drift_psi6`` — the per-cadence-point measure cost
     a NON-fired check pays (10-key histogram + memoized model read),
     timed cold (first read of the new head) and warm (memoized);
  4. second refresh: the steady-state retrain (same corpus, model
     already embedded) — separates day-0 table-creation overhead from
     the recurring fired cost.

Prints one JSON line:
  {"n_docs": N, "seed_ingest_s": ..., "train_s": ...,
   "refresh_day0_s": ..., "psi_cold_s": ..., "psi_warm_s": ...,
   "refresh_steady_s": ..., "psi6_post": 0}

Run on a QUIET host (no concurrent pytest).
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from realtime_datawarehouse_spark.operators import textops  # noqa: E402
from realtime_datawarehouse_spark.session import build_session  # noqa: E402
from realtime_datawarehouse_spark.streaming import pipelines  # noqa: E402

SF1 = "/root/repo/scale_data/sf1"


def main() -> None:
    spark = build_session(app_name="rdw-probe-quality-refresh-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{SF1}/documents.parquet")
        .select("doc_id", "text", "lang")
        .persist()
    )
    n_docs = docs.count()  # materialize the input once, outside timings
    tmp = tempfile.mkdtemp(prefix="rdw-quality-sf1-")
    out: dict = {"n_docs": n_docs}
    try:
        qpath = f"{tmp}/quality"
        t0 = time.perf_counter()
        pipelines.ingest_quality_step(
            spark, docs.select("doc_id", "text"), qpath, 0
        )
        out["seed_ingest_s"] = round(time.perf_counter() - t0, 3)

        # the trainer alone (the §33 open question at sf1)
        t0 = time.perf_counter()
        w, losses, n_train = textops.train_quality_classifier(
            docs, F.col("lang") == F.lit("en")
        )
        out["train_s"] = round(time.perf_counter() - t0, 3)
        out["n_train"] = n_train
        out["loss_decreased"] = bool(losses[-1] < losses[0])

        t0 = time.perf_counter()
        pipelines.refresh_quality_model(
            spark, qpath, docs, refresh_id=1,
            label=F.col("lang") == F.lit("en"),
        )
        out["refresh_day0_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        psi = pipelines.quality_drift_psi6(spark, qpath)
        out["psi_cold_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        pipelines.quality_drift_psi6(spark, qpath)
        out["psi_warm_s"] = round(time.perf_counter() - t0, 3)
        out["psi6_post"] = psi

        # refresh_quality_model needs the label column at retrain time
        t0 = time.perf_counter()
        pipelines.refresh_quality_model(
            spark, qpath, docs, refresh_id=2,
            label=F.col("lang") == F.lit("en"),
        )
        out["refresh_steady_s"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
