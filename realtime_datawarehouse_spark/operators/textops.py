"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting (training-data-pipeline extensions).

All builtin-expression compositions over the tokenizer (functions/text.py);
each has an exact DuckDB oracle. Per-document work is embarrassingly
parallel — no shuffles at all except the final optional aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime_datawarehouse_spark.functions.compare import pround, pround_sql
from realtime_datawarehouse_spark.functions.hashing import hash64, hash64_sql
from realtime_datawarehouse_spark.functions.text import STOPWORDS, tokenize

# Rolling-hash modulus: acc < 2^31 keeps (acc*31 + h60) < 2^61 — no int64
# overflow on either engine (Spark runs ANSI mode; overflow would throw).
FP_MOD = 2_147_483_647

# Marker vocabularies for the language-ID heuristic. Deterministic and tiny
# on purpose: the operator under test is "score tokens against marker sets,
# argmax with a fixed precedence", not linguistics.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "das"),
    "es": ("el", "los", "una"),
}


def _stop_in(tok: Column) -> Column:
    return tok.isin(*STOPWORDS)


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks —
# the GPT-2-style segmentation boundary (without the merges table), in a
# regex subset portable between Java (Spark) and RE2 (DuckDB)
BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, token_ct, bpe_ish_ct, char_ct): whitespace token count, the
    BPE-ish pre-token count (the better LLM-cost proxy — punctuation and
    digit runs count as their own tokens), and character length."""
    toks = tokenize(text_col)
    bpe = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_RE), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("token_ct"),
        F.size(bpe).alias("bpe_ish_ct"),
        F.length(F.col(text_col)).alias("char_ct"),
    )


TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
       len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS token_ct,
       len(regexp_extract_all(lower(text), '{BPE_ISH_RE}')) AS bpe_ish_ct,
       length(text) AS char_ct
FROM documents
"""


def quality_keep(text_col: str = "text") -> Column:
    """The composite keep/drop flag as a bare column expression (narrow,
    stream-safe — usable inside a streaming select without a self-join)."""
    toks = tokenize(text_col)
    token_ct = F.size(toks)
    stop_ct = F.size(F.filter(toks, _stop_in))
    stop_ratio = pround(stop_ct.cast("double") / token_ct, 4)
    return F.when((token_ct >= 20) & (stop_ratio <= 0.5), 1).otherwise(0)


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: token count, stopword ratio, mean token
    length, and a composite keep/drop flag — the standard cheap pre-filter
    stage of a corpus pipeline."""
    toks = tokenize(text_col)
    token_ct = F.size(toks)
    stop_ct = F.size(F.filter(toks, _stop_in))
    char_sum = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda a, b: a + b
    )
    stop_ratio = pround(stop_ct.cast("double") / token_ct, 4)
    avg_len = pround(char_sum.cast("double") / token_ct, 2)
    return docs.select(
        "doc_id",
        token_ct.alias("token_ct"),
        stop_ct.alias("stopword_ct"),
        stop_ratio.alias("stopword_ratio"),
        avg_len.alias("avg_token_len"),
        quality_keep(text_col).alias("keep"),
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

_RATIO = pround_sql('stopword_ct * 1.0 / token_ct', 4)

QUALITY_SCORE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS token_ct,
         len(list_filter(toks, x -> x IN ({_STOP_SQL}))) AS stopword_ct,
         list_sum(list_transform(toks, x -> length(x))) AS char_sum
  FROM t
)
SELECT doc_id, token_ct, stopword_ct,
       {_RATIO} AS stopword_ratio,
       {pround_sql('char_sum * 1.0 / token_ct', 2)}    AS avg_token_len,
       CASE WHEN token_ct >= 20 AND {_RATIO} <= 0.5
            THEN 1 ELSE 0 END AS keep
FROM m
"""


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID with fixed precedence en > de > es."""
    toks = tokenize(text_col)

    def marker_filter(markers: tuple[str, ...]):
        # single-arg lambda factory: F.filter treats two-parameter lambdas
        # as (element, index), so defaults can't be used to close over markers
        return lambda t: t.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, marker_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    pred = (
        F.when(
            (scores["en"] >= scores["de"]) & (scores["en"] >= scores["es"]), "en"
        )
        .when(scores["de"] >= scores["es"], "de")
        .otherwise("es")
    )
    return docs.select(
        "doc_id",
        scores["en"].alias("score_en"),
        scores["de"].alias("score_de"),
        scores["es"].alias("score_es"),
        pred.alias("predicted_lang"),
        F.col("lang").alias("labeled_lang"),
    )


def _markers_sql(lang: str) -> str:
    return ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])


LANG_ID_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id, lang,
         len(list_filter(toks, x -> x IN ({_markers_sql('en')}))) AS score_en,
         len(list_filter(toks, x -> x IN ({_markers_sql('de')}))) AS score_de,
         len(list_filter(toks, x -> x IN ({_markers_sql('es')}))) AS score_es
  FROM t
)
SELECT doc_id, score_en, score_de, score_es,
       CASE WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
            WHEN score_de >= score_es THEN 'de'
            ELSE 'es' END AS predicted_lang,
       lang AS labeled_lang
FROM s
"""


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint:
    fold((acc*31 + hash64(token)) mod FP_MOD) over the token sequence."""
    toks = tokenize(text_col)
    hashes = F.transform(toks, lambda t: hash64(t))
    fp = F.aggregate(
        hashes,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * 31 + h) % FP_MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


FINGERPRINT_ORACLE = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents
), h AS (
  SELECT doc_id,
         list_transform(toks, x -> {hash64_sql('x')}) AS hashes
  FROM t
)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0 AS BIGINT), hashes),
                   (acc, h) -> (acc * 31 + h) % {FP_MOD}) AS fingerprint
FROM h
"""


def tokenize_explode_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """U1 analog: tokenize + explode (≡ LATERAL TABLE(ik_analyze(...))) then
    count per keyword (rt/app/func/KeywordUDTF.java:14-22 +
    rt/app/dws/DwsTrafficSourceKeywordPageViewWindow.java:55-69)."""
    return (
        docs.select(F.explode(tokenize(text_col)).alias("keyword"))
        .groupBy("keyword")
        .agg(F.count("*").alias("keyword_count"))
    )


TOKENIZE_EXPLODE_COUNT_ORACLE = """
WITH t AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS keyword
  FROM documents
)
SELECT keyword, count(*) AS keyword_count FROM t GROUP BY 1
"""


# --------------------------------------------------------------------------
# Corpus mixing: deterministic hash-based sampling + integer upsampling.
# The data-mixture stage of a training pipeline: per-stratum (language)
# keep-rates and repeat factors. Hash-based sampling (not rand()) so every
# engine/run selects the identical subset — reproducible mixtures at 100 TB
# and an exact SQL oracle.
# --------------------------------------------------------------------------

SAMPLE_MOD = 10_000


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff hash(key) % MOD < rate(stratum) * MOD.

    Deterministic in the key — adding/removing other rows never flips a
    decision (stable under re-partitioning and incremental reruns).
    """
    bucket = F.pmod(hash64(F.col(key_col).cast("string")), F.lit(SAMPLE_MOD))
    rate = None
    for stratum, r in rates.items():
        thr = int(r * SAMPLE_MOD)
        cond = F.col(stratum_col) == stratum
        rate = F.when(cond, thr) if rate is None else rate.when(cond, thr)
    rate = rate.otherwise(int(default_rate * SAMPLE_MOD))
    return docs.where(bucket < rate)


def stratified_sample_oracle(
    rates: dict[str, float], default_rate: float = 0.0
) -> str:
    cases = " ".join(
        f"WHEN lang = '{s}' THEN {int(r * SAMPLE_MOD)}" for s, r in rates.items()
    )
    return f"""
SELECT doc_id, lang
FROM documents
WHERE {hash64_sql('CAST(doc_id AS VARCHAR)')} % {SAMPLE_MOD}
      < (CASE {cases} ELSE {int(default_rate * SAMPLE_MOD)} END)
"""


def upsample_repeat(
    docs: DataFrame,
    repeats: dict[str, int],
    stratum_col: str = "lang",
) -> DataFrame:
    """Integer upsampling: emit each row ``repeats[stratum]`` times with an
    ``epoch`` index (0..k-1) — the standard multi-epoch data-mixture trick,
    as a single explode (no unions, one scan)."""
    k = None
    for stratum, r in repeats.items():
        cond = F.col(stratum_col) == stratum
        k = F.when(cond, r) if k is None else k.when(cond, r)
    k = k.otherwise(1)
    return docs.select(
        "doc_id",
        F.col(stratum_col),
        F.explode(F.sequence(F.lit(0), k - 1)).alias("epoch"),
    )


def upsample_repeat_oracle(repeats: dict[str, int]) -> str:
    cases = " ".join(
        f"WHEN lang = '{s}' THEN {r}" for s, r in repeats.items()
    )
    return f"""
SELECT doc_id, lang, CAST(g.e AS INT) AS epoch
FROM documents,
     LATERAL (SELECT unnest(range(0, CASE {cases} ELSE 1 END)) AS e) g
"""
