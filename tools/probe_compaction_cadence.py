"""Bounded-file-count probe for the round-10 compaction cadence in the
composed production ingest loop (VERDICT r9 item 4; results recorded in
SCALE.md §35).

Replays the sf0.01 corpus as 20 deterministic ingests through
``production_ingest_step`` twice — once with ``compact_every=5``, once
without — and records, after every batch, the parquet-file count of
each standing table's CURRENT snapshot. Asserts the two runs' end
states are row-identical (compaction is pure re-layout and replays are
idempotent across its boundary), then prints one JSON line:

  {"files_no_compact": {table: [n per batch...]},
   "files_compacted": {...}, "end_states_equal": true,
   "wall_no_compact_s": ..., "wall_compacted_s": ...}

The claim under test: without the cadence, every merge snapshot carries
a shuffle's worth of files; with it, the count is sawtooth-bounded by
the cadence and the compaction target.

HONEST CAVEAT (first run of this probe, 2026-08-16): at fixture scale
AQE's partition coalescing already collapses each merge snapshot to ~1
file, so the small-files regime never appears and the cadence is a
no-op cost. The regime the cadence exists for is a cluster whose
shuffle partitioning is sized for the CLUSTER (hundreds of partitions)
while per-table state stays modest — every merge then writes that many
small files per snapshot, forever. The probe emulates it by disabling
`spark.sql.adaptive.coalescePartitions.enabled` for both runs (same
knob both sides; end-state equality is still asserted). Run on a QUIET
host.
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from realtime_datawarehouse_spark.operators import (  # noqa: E402
    similarity,
    table_store,
)
from realtime_datawarehouse_spark.session import build_session  # noqa: E402
from realtime_datawarehouse_spark.streaming import pipelines  # noqa: E402
from realtime_datawarehouse_spark.tables import table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
N_BATCHES = 20
COMPACT_EVERY = 5


def n_files(path: str) -> int:
    v = table_store.current_version(path)
    if v is None:
        return 0
    return len(
        glob.glob(os.path.join(path, v, "**", "*.parquet"), recursive=True)
    )


def run(spark, joined, centroids, root, compact_every):
    paths = {
        "sigs": f"{root}/sigs",
        "flags": f"{root}/flags",
        "comps": f"{root}/comps",
        "ivf": f"{root}/ivf",
        "quality": f"{root}/quality",
    }
    counts = {k: [] for k in paths}
    t0 = time.perf_counter()
    for i in range(N_BATCHES):
        pipelines.production_ingest_step(
            spark,
            joined.where(F.pmod(F.col("doc_id"), F.lit(N_BATCHES)) == i),
            centroids,
            paths["sigs"],
            paths["flags"],
            paths["comps"],
            paths["ivf"],
            batch_id=i,
            quality_path=paths["quality"],
            compact_every=compact_every,
        )
        for k, p in paths.items():
            counts[k].append(n_files(p))
    wall = time.perf_counter() - t0
    states = {
        k: sorted(
            tuple(r)
            for r in table_store.read_state(spark, p)
            .drop("ver")
            .collect()
        )
        for k, p in paths.items()
    }
    return counts, states, wall


def main() -> None:
    spark = build_session(app_name="probe-compaction-cadence")
    spark.sparkContext.setLogLevel("ERROR")
    # emulate cluster-sized shuffle fan-out (see module docstring)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = table(spark, SF_DIR, "embeddings")
    joined = docs.join(emb, docs.doc_id == emb.vec_id, "left").select(
        "doc_id", "text", "embedding"
    )
    centroids = similarity._ivf_centroids(emb)
    out = {}
    tmp = tempfile.mkdtemp(prefix="rdw-probe-compact-")
    try:
        c_plain, s_plain, w_plain = run(spark, joined, centroids,
                                        f"{tmp}/plain", None)
        c_comp, s_comp, w_comp = run(spark, joined, centroids,
                                     f"{tmp}/comp", COMPACT_EVERY)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = {
        "sf_dir": SF_DIR,
        "n_batches": N_BATCHES,
        "compact_every": COMPACT_EVERY,
        "files_no_compact": c_plain,
        "files_compacted": c_comp,
        "end_states_equal": s_plain == s_comp,
        "wall_no_compact_s": round(w_plain, 1),
        "wall_compacted_s": round(w_comp, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
