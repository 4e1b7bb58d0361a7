"""Registry mapping operator-query names to (Spark callable, DuckDB oracle).

Conventions (driver contract, see repo README / __spark_entry__.py):

- Spark callable signature: ``fn(spark: SparkSession, sf_dir: str) -> DataFrame``.
- Every computed/aggregate column is aliased identically in the Spark plan
  and the oracle SQL (the driver sorts columns by name before hashing).
- Doubles are ``round()``-ed (2 dp money, 4 dp ratios) on BOTH sides so
  accumulation order can't flip a hash bit (SURVEY.md §7.4 #4/#7).
- Time columns cross the boundary as 'yyyy-MM-dd HH:mm:ss' strings
  (functions/timeutil.py) so physical timestamp precision never matters.
- Queries with no SQL-expressible oracle (streaming-stateful, LSH internals)
  register ``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# The external driver records correctness rows for only ~50 entries of
# queries() per round, in emission order. Emission order therefore rotates
# per round so every query accumulates a driver-recorded row. Round-3 head:
# the queries with no driver row yet (new this round + the one skipped in
# both r01 and r02), then sk_quantile_order_value (its r02 row errored on
# the old array-column schema) and the operators whose implementation
# changed this round, then everything else in registration order.
DRIVER_PRIORITY: list[str] = [
    "pipeline_curation_stats",
    "mix_source_token_shares",
    "pipeline_corpus_curation_v2",
    "text_lang_confusion",
    "mix_train_val_split",
    "olap_dq_checks",
    "ext_hybrid_retrieval",
    "olap_table_profile",
    "olap_funnel_conversion",
    "olap_retention_cohorts",
    "text_compression_ratio",
    "mix_temperature_sample",
    "text_chunk_documents",
    "text_tfidf_top_terms",
    "dedup_semantic",
    "curate_bloom_decontaminate",
    "text_ngram_topk",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_supplier",
    "mix_token_budget_sample",
    "sk_quantile_order_value",
    "ext_asof_join",
    "dedup_connected_components",
    "text_unigram_logprob",
    # implementation changed this round (hapax prune; max_by assignment;
    # run-fold rewrite) — re-record early
    "dedup_ngram_jaccard",
    "ann_ivf_topk",
    "ann_lsh_bucket_stats",
    "text_repetition_signals",
]

_LOADED = False


def _rotated(d: dict) -> dict:
    head = {n: d[n] for n in DRIVER_PRIORITY if n in d}
    head.update({n: v for n, v in d.items() if n not in head})
    return head


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query plan and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load() -> None:
    """Import all plan modules (idempotent) so their decorators register."""
    global _LOADED
    if _LOADED:
        return
    from realtime_datawarehouse_spark.plans import (  # noqa: F401
        analytic,
        cdc_pipelines,
        llm_ops,
        sketch_agg,
        tpch_like,
        traffic,
        trade,
    )

    _LOADED = True


def get_queries() -> dict[str, QueryFn]:
    load()
    # A typo in the hand-maintained rotation list would silently skip a
    # query's driver re-record (_rotated drops unknown names) — fail loudly.
    unknown = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    if unknown:
        raise ValueError(f"DRIVER_PRIORITY names not in registry: {unknown}")
    return _rotated(QUERIES)


def get_oracles() -> dict[str, str]:
    load()
    return _rotated(ORACLES)
