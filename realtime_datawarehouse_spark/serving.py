"""ADS serving layer (SURVEY.md §2.12) — the two REST endpoints of
gmall0321-publisher as plain functions over Spark SQL.

Reference payload shapes (pub/controller/TradeStatController.java:28-79):
    GET /gmv?date=yyyyMMdd      → {"status": 0, "data": <sum>}
    GET /province?date=yyyyMMdd → {"status": 0, "data":
        {"mapData": [{"name": ..., "value": ...}...], "valueName": "交易额"}}

Backing SQL = pub/mapper/TradeStatMapper.java:16-21 (sum / group-by over the
DWS store). Here the DWS store is the star schema itself; both endpoints are
pushed down to Spark SQL — scan-pruned by the date filter — exactly as the
reference pushes them into ClickHouse.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from realtime_datawarehouse_spark.functions.compare import dsum
from realtime_datawarehouse_spark.tables import table

VALUE_NAME = "交易额"  # "transaction amount", as the reference labels it


def register_query_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Expose every registered operator query as a temp view, plus the raw
    tables — the Spark SQL surface of the engine: a user who ran Flink SQL
    against the reference's dynamic tables runs ``spark.sql`` against these
    (views are lazy plans; Catalyst fuses view references into consumers,
    so cross-view joins optimize as one query).
    """
    from realtime_datawarehouse_spark.plans import registry
    from realtime_datawarehouse_spark.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    names = []
    for name, fn in registry.get_queries().items():
        fn(spark, sf_dir).createOrReplaceTempView(name)
        names.append(name)
    return names


def gmv(spark: SparkSession, sf_dir: str, date: str) -> dict[str, Any]:
    """GET /gmv?date=yyyyMMdd (TradeStatController.java:28-37)."""
    o = table(spark, sf_dir, "orders")
    row = (
        o.where(F.date_format("o_orderdate", "yyyyMMdd") == date)
        .agg(dsum(F.col("o_totalprice")).alias("gmv"))
        .collect()[0]
    )
    return {"status": 0, "data": float(row.gmv or 0.0)}


def similar(
    spark: SparkSession,
    sf_dir: str,
    vec_id: int,
    k: int = 5,
    index_path: str | None = None,
    centroids=None,
) -> dict[str, Any]:
    """GET /similar?vec_id=N&k=K — ANN top-k as an ADS endpoint (round
    10: the standing IVF index finally reaches the serving layer; the
    reference's ADS surface has no ANN routes — this is the
    training-data-platform extension the similarity family exists for).

    Two backing modes through ONE serve implementation
    (``similarity.ivf_topk_from_assigned`` under both, so they cannot
    drift):

    - ``index_path`` set → read the incrementally-maintained
      inverted-list table (``pipelines.ivf_topk_from_index``) — the
      deployment shape: the request touches only the query's nprobe
      lists (on the centroid-partitioned layout that IS the
      partition-pruned scan), never the corpus;
    - ``index_path`` None → recompute over the embeddings table
      (``similarity.ivf_topk``) — the fixture/debug mode.

    An unknown ``vec_id`` returns an empty neighbor list with status 0
    (same contract as a date with no orders on /gmv)."""
    from realtime_datawarehouse_spark.operators import similarity
    from realtime_datawarehouse_spark.streaming import pipelines

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") == int(vec_id)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    if index_path is not None:
        topk = pipelines.ivf_topk_from_index(
            spark, index_path, queries, centroids, int(k)
        )
    else:
        topk = similarity.ivf_topk(emb, queries, int(k))
    rows = topk.orderBy("rnk").collect()
    return {
        "status": 0,
        "data": [
            {"neighbor_id": r.neighbor_id, "sim": r.sim, "rnk": r.rnk}
            for r in rows
        ],
    }


def quality(
    spark: SparkSession,
    sf_dir: str,
    doc_id: int,
    quality_path: str | None = None,
    weights=None,
) -> dict[str, Any]:
    """GET /quality?doc_id=N — per-document quality score as an ADS
    endpoint (round 11: the standing quality table reaches the serving
    layer, the /similar-over-the-standing-IVF-index symmetry; the
    reference's ADS surface has no curation routes — this is the
    training-data-platform extension the quality family exists for).

    Two backing modes through ONE scoring implementation
    (``textops.quality_classifier`` computed the rows under both, so
    they cannot drift):

    - ``quality_path`` set → one PK lookup on the standing quality
      table the composed ingest loop maintains
      (``pipelines.ingest_quality_step``) — the deployment shape: the
      served row was scored at ingest under the table's
      currently-embedded model, and a model refresh
      (``refresh_quality_model``) swaps weights + rescored corpus in
      ONE commit, so a running endpoint flips atomically to the
      refreshed model (live-HTTP pinned). The payload reports which
      model serves (``embedded`` after an install/refresh, ``frozen``
      before).
    - ``quality_path`` None → recompute over the documents table with
      ``weights`` (None = the stand-in rule) — the fixture/debug mode.

    An unknown ``doc_id`` returns an empty list with status 0 (same
    contract as /similar on an unknown vec_id)."""
    from realtime_datawarehouse_spark.operators import textops
    from realtime_datawarehouse_spark.streaming import pipelines

    if quality_path is not None:
        model_w, _, scores = pipelines.read_quality_state(
            spark, quality_path
        )
        rows = (
            scores.where(F.col("doc_id") == int(doc_id))
            .select("doc_id", "margin_milli", "keep")
            .collect()
            if scores is not None
            else []
        )
        model = "embedded" if model_w is not None else "frozen"
    else:
        docs = table(spark, sf_dir, "documents").where(
            F.col("doc_id") == int(doc_id)
        )
        rows = (
            textops.quality_classifier(docs, weights=weights)
            .select("doc_id", "margin_milli", "keep")
            .collect()
        )
        model = "recompute"
    return {
        "status": 0,
        "data": [
            {
                "doc_id": int(r.doc_id),
                "margin_milli": int(r.margin_milli),
                "keep": int(r.keep),
                "model": model,
            }
            for r in rows
        ],
    }


def encode(
    spark: SparkSession,
    sf_dir: str,
    doc_id: int | None = None,
    text: str | None = None,
    vocab_path: str | None = None,
    merges: list[tuple[str, str]] | None = None,
) -> dict[str, Any]:
    """GET /encode?doc_id=N (or ?text=...) — tokenize one document under
    the CURRENT standing BPE vocabulary (round 12: the serve surface of
    the third maintenance loop, completing the /similar-over-standing-
    index and /quality-over-standing-table symmetry; the reference's ADS
    surface has no tokenizer routes — this is the training-data-platform
    extension the vocab family exists for).

    - ``vocab_path`` set → the newest installed vocabulary version in
      the standing vocab table the tokenize-on-ingest loop maintains
      (``pipelines.ingest_bpe_step``); the merge table is the MEMOIZED
      per-committed-version read, so steady-state requests pay zero
      Spark jobs beyond the head probe — and a vocabulary refresh
      (``install_bpe_vocab``) flips a running endpoint to the new
      version atomically (live-HTTP pinned). The payload reports which
      ``vocab_ver`` served, the same contract as the encodings table's
      recorded column.
    - ``vocab_path`` None → encode under the injected ``merges``
      (fixture/debug mode; vocab_ver reported as None).

    Tokenization itself is ``textops.bpe_encode_text`` — driver-side,
    kernel-exact (one request = one document; no per-request Spark
    job). ``doc_id`` fetches the text from the documents table (one
    PK-pruned scan); an unknown doc_id returns empty data with
    status 0 (the /similar unknown-key contract). Exactly one of
    doc_id/text must be provided (the HTTP layer 400s otherwise)."""
    from realtime_datawarehouse_spark.operators import textops
    from realtime_datawarehouse_spark.streaming import pipelines

    if (doc_id is None) == (text is None):
        raise ValueError("exactly one of doc_id / text is required")
    vocab_ver = None
    if vocab_path is not None:
        vocab_ver, merges, _ = pipelines.read_bpe_vocab(spark, vocab_path)
        if vocab_ver is None:
            raise ValueError(
                f"no vocabulary installed at {vocab_path} — day-0 "
                "install via install_bpe_vocab first"
            )
    if merges is None:
        raise ValueError(
            "encode needs a vocabulary: pass vocab_path (standing "
            "table) or merges (injected table)"
        )
    if doc_id is not None:
        rows = (
            table(spark, sf_dir, "documents")
            .where(F.col("doc_id") == int(doc_id))
            .select("doc_id", "text")
            .collect()
        )
        if not rows or rows[0].text is None:
            # unknown doc_id OR a null-text row: graceful empty data
            # (the distributed kernel's null branch, serving-side —
            # code-review r12)
            return {"status": 0, "data": []}
        text = rows[0].text
    tokens = textops.bpe_encode_text(text, merges)
    return {
        "status": 0,
        "data": [
            {
                "doc_id": None if doc_id is None else int(doc_id),
                "vocab_ver": vocab_ver,
                "n_tokens": len(tokens),
                "tokens": tokens,
            }
        ],
    }


def province_stats(spark: SparkSession, sf_dir: str, date: str) -> dict[str, Any]:
    """GET /province?date=yyyyMMdd (TradeStatController.java:58-79)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rows = (
        o.where(F.date_format("o_orderdate", "yyyyMMdd") == date)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(F.col("o_totalprice")).alias("amount"))
        .collect()
    )
    return {
        "status": 0,
        "data": {
            "mapData": [
                {"name": r.n_name, "value": float(r.amount)} for r in rows
            ],
            "valueName": VALUE_NAME,
        },
    }
