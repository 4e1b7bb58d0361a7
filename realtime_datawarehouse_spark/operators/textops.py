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


# ---------------------------------------------------------------------------
# Repetition signals (the Gopher-rules family: "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Rae et al. 2021, §A1.1
# — repetitious documents are low-quality training data) and PII redaction.
# ---------------------------------------------------------------------------


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition metrics: duplicate-word fraction
    (1 - distinct/total tokens) and top-bigram coverage (share of all
    bigrams taken by the single most frequent one).

    Scale shape: the duplicate fraction is a pure per-row expression (no
    shuffle). The bigram mode needs a count per (doc, bigram): one explode
    feeding a two-level aggregation — partials combine map-side, the
    shuffle carries one row per DISTINCT (doc, bigram), then a per-doc max.
    Nothing is ever collected per-doc into driver memory.
    """
    from realtime_datawarehouse_spark.functions.text import word_shingles
    from realtime_datawarehouse_spark.operators.layout import (
        rebalance_narrow_scan,
    )

    # the bigram explode is a CPU amplifier over a (typically) narrow
    # single-row-group scan — widen first (no-op on already-wide scans;
    # cold 5.5→1.7 s at bench sf0.1, warm within noise)
    docs = rebalance_narrow_scan(docs)
    toks = tokenize(text_col)
    base = docs.select(
        "doc_id",
        F.size(toks).alias("token_ct"),
        F.size(F.array_distinct(toks)).alias("uniq_ct"),
        word_shingles(toks, 2).alias("bigrams"),
    )
    per_big = (
        base.select("doc_id", F.explode("bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_cnt"), F.sum("cnt").alias("big_ct"))
    )
    dup_frac = pround(
        (F.col("token_ct") - F.col("uniq_ct")).cast("double")
        / F.col("token_ct"),
        4,
    )
    top_frac = pround(
        F.coalesce(
            F.col("top_cnt").cast("double") / F.col("big_ct"), F.lit(0.0)
        ),
        4,
    )
    return (
        base.join(per_big, "doc_id", "left")
        .select(
            "doc_id",
            "token_ct",
            dup_frac.alias("dup_word_frac"),
            top_frac.alias("top_bigram_frac"),
        )
    )


REPETITION_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id, len(toks) AS token_ct, len(list_distinct(toks)) AS uniq_ct,
         -- DuckDB slices are INCLUSIVE: [:-1] keeps the last element, which
         -- would make list_zip null-pad an extra phantom bigram
         list_transform(list_zip(toks[:len(toks) - 1], toks[2:]),
                        x -> x[1] || ' ' || x[2]) AS bigrams
  FROM t
), e AS (
  SELECT doc_id, unnest(bigrams) AS bg FROM m
), c AS (
  SELECT doc_id, bg, count(*) AS cnt FROM e GROUP BY 1, 2
), top AS (
  SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS big_ct FROM c GROUP BY 1
)
SELECT m.doc_id AS doc_id, m.token_ct AS token_ct,
       {pround_sql('(m.token_ct - m.uniq_ct) * 1.0 / m.token_ct', 4)}
         AS dup_word_frac,
       {pround_sql('coalesce(top.top_cnt * 1.0 / top.big_ct, 0.0)', 4)}
         AS top_bigram_frac
FROM m LEFT JOIN top ON top.doc_id = m.doc_id
"""


# Regex subset shared by Java (Spark) and RE2 (DuckDB): no \\d, no
# lookaround, explicit character classes only.
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\+?[0-9][0-9 ()-]{6,}[0-9]"


def pii_redact(
    docs: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Replace emails and phone numbers with <EMAIL>/<PHONE> placeholders
    and count what was removed — the standard pre-training PII scrub pass.
    Pure per-row builtin expressions (regexp_replace / regexp_extract_all):
    no shuffle, stays in whole-stage codegen, streams unchanged."""
    c = F.col(text_col)
    emails = F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0)))
    no_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    phones = F.size(
        F.regexp_extract_all(no_email, F.lit(PHONE_RE), F.lit(0))
    )
    return docs.select(
        "doc_id",
        emails.alias("email_ct"),
        phones.alias("phone_ct"),
        F.regexp_replace(no_email, PHONE_RE, "<PHONE>").alias(out_col),
    )


# ---------------------------------------------------------------------------
# Unigram language-model scoring — the cheap statistical quality signal
# (CCNet-style: docs whose tokens are improbable under a corpus LM are
# flagged; Wenzek et al. 2019 use a 5-gram KenLM, the unigram form is the
# distributed-friendly first rung).
# ---------------------------------------------------------------------------

LM_VOCAB_SIZE = 20  # top-V corpus vocabulary; out-of-vocab smooths to count 1


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = LM_VOCAB_SIZE,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus unigram
    LM, restricted to a broadcast top-``vocab_size`` vocabulary (OOV tokens
    smooth to count 1).

    Scale shape: one explode feeds BOTH the vocabulary count (map-side
    combined, shuffle = distinct tokens) and the scoring join; the vocab
    and the grand-total are tiny aggregates broadcast to the scorers — the
    corpus rows never shuffle for the join. The per-token ``-ln p`` terms
    are 1e-6-quantized before summing (the dsum discipline, compare.py) so
    the mean is order-free and cross-engine exact.
    """
    toks = docs.select("doc_id", F.explode(tokenize(text_col)).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    vocab = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(vocab_size)
    term = F.floor(
        -F.log(F.col("cnt").cast("double") / F.col("total"))
        * F.lit(1_000_000)
        + F.lit(0.5)
    ).cast("bigint")
    scored = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(1)))
        .crossJoin(F.broadcast(total))
        .select("doc_id", term.alias("t6"), (F.col("cnt") == 1).alias("oov"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("t6").alias("s6"),
        F.count("*").alias("n"),
        F.sum(F.when(F.col("oov"), 1).otherwise(0)).alias("oov_ct"),
    )
    avg6 = F.col("s6").cast("double") / (
        F.col("n").cast("double") * F.lit(1_000_000.0)
    )
    return agg.select(
        "doc_id",
        (F.floor(avg6 * F.lit(10_000) + F.lit(0.5)) / F.lit(10_000.0)).alias(
            "avg_neg_logp"
        ),
        "oov_ct",
    )


UNIGRAM_LOGPROB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                    x -> x <> '')) AS tok
  FROM documents
), counts AS (
  SELECT tok, count(*) AS cnt FROM toks GROUP BY 1
), total AS (
  SELECT sum(cnt) AS total FROM counts
), vocab AS (
  SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok ASC LIMIT {LM_VOCAB_SIZE}
), scored AS (
  SELECT t.doc_id,
         CAST(floor(-ln(coalesce(v.cnt, 1) * 1.0 / total.total) * 1000000
                    + 0.5) AS BIGINT) AS t6,
         (coalesce(v.cnt, 1) = 1) AS oov
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok CROSS JOIN total
)
SELECT doc_id,
       floor(CAST(sum(t6) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0)
             * 10000 + 0.5) / 10000.0 AS avg_neg_logp,
       CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS oov_ct
FROM scored
GROUP BY 1
"""
