"""Training-data-pipeline operator queries over ``documents`` /
``embeddings`` (BASELINE.json north-star extensions): dedup (exact, Jaccard,
MinHash-LSH, SimHash, embedding-cosine), similarity search (brute + LSH),
text analysis (tokenize/quality/lang-id/token-count/fingerprint) and the
multimodal decode plumbing.

Implementations live in operators/{dedup,similarity,textops,multimodal}.py;
this module binds them to fixture tables and registers driver queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_datawarehouse_spark.operators import dedup, multimodal, similarity, textops
from realtime_datawarehouse_spark.plans.registry import query
from realtime_datawarehouse_spark.tables import table

JACCARD_THRESHOLD = 0.8
NEAR_DUP_COSINE = 0.4
TOPK = 5
ANN_QUERY_PRED_SQL = "vec_id < 8"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "embeddings")


@query("u1_tokenize_explode_count", oracle=textops.TOKENIZE_EXPLODE_COUNT_ORACLE)
def u1_tokenize_explode_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.tokenize_explode_count(_docs(spark, sf_dir))


@query("dedup_exact", oracle=dedup.EXACT_DEDUP_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_docs(spark, sf_dir))


@query(
    "dedup_ngram_jaccard",
    oracle=dedup.ngram_jaccard_oracle(JACCARD_THRESHOLD),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), JACCARD_THRESHOLD)


@query("dedup_minhash_lsh", oracle=dedup.lsh_candidate_pairs_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_candidate_pairs(_docs(spark, sf_dir))


@query("dedup_simhash", oracle=dedup.simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_docs(spark, sf_dir))


@query("text_token_count", oracle=textops.TOKEN_STATS_ORACLE)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.token_stats(_docs(spark, sf_dir))


@query("text_quality_score", oracle=textops.QUALITY_SCORE_ORACLE)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.quality_score(_docs(spark, sf_dir))


@query("text_lang_id", oracle=textops.LANG_ID_ORACLE)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.lang_id(_docs(spark, sf_dir))


@query("text_fingerprint", oracle=textops.FINGERPRINT_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.fingerprint(_docs(spark, sf_dir))


@query(
    "ann_brute_topk",
    oracle=similarity.brute_topk_oracle(TOPK, ANN_QUERY_PRED_SQL),
)
def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return similarity.brute_topk(emb, queries, TOPK)


@query(
    "ann_ivf_topk",
    oracle=similarity.ivf_topk_oracle(TOPK, similarity.NUM_PROBE, ANN_QUERY_PRED_SQL),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF scale-path ANN: nearest-centroid list assignment + nprobe probing
    (same approximation computed by both engines, so oracle-exact)."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return similarity.ivf_topk(emb, queries, TOPK)


@query("ann_lsh_bucket_stats", oracle=similarity.lsh_bucket_stats_oracle())
def ann_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_bucket_stats(_emb(spark, sf_dir))


@query(
    "embed_near_dup_pairs",
    oracle=similarity.near_dup_pairs_oracle(NEAR_DUP_COSINE),
)
def embed_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.near_dup_pairs(_emb(spark, sf_dir), NEAR_DUP_COSINE)


@query("mm_decode_metadata", oracle=multimodal.DECODE_METADATA_ORACLE)
def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.decode_metadata(_docs(spark, sf_dir))


@query("mm_resize_images", oracle=multimodal.RESIZE_ORACLE)
def mm_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.resize_images(_docs(spark, sf_dir))


@query("mm_frame_sample", oracle=multimodal.FRAME_SAMPLE_ORACLE)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.sample_frames(_docs(spark, sf_dir))


@query("mm_feature_extract", oracle=multimodal.FEATURES_ORACLE)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.extract_features(_docs(spark, sf_dir))
