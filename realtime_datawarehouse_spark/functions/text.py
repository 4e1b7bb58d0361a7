"""Text scalar layer: tokenization, shingles, quality signals.

The reference's one UDTF is ``ik_analyze`` — Chinese IK segmentation applied
as ``LATERAL TABLE`` then tumble-counted
(rt/app/func/KeywordUDTF.java:14-22, rt/util/KeywordUtil.java:17-31,
rt/app/dws/DwsTrafficSourceKeywordPageViewWindow.java:55-69). The engine's
equivalent is a deterministic regex tokenizer expressed with builtins
(split + filter + explode ≡ lateral view), which keeps the whole pipeline in
whole-stage codegen and is reproducible in the DuckDB oracle. A pluggable
"real" segmenter (jieba et al.) would slot in as an Arrow-batched pandas UDF,
but is intentionally not the default: UDFs are the slow path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Lowercase word tokens; the oracle uses the same split on single spaces for
# the fixture corpus (documents.text is space-separated by construction).
TOKEN_SPLIT_RE = r"\s+"

# Tiny deterministic marker sets for the language-ID heuristic and quality
# scoring. Chosen from the fixture corpus vocabulary; the point is the
# *operator shape* (n-gram/marker scoring at scale), not linguistic accuracy.
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokenize(col: Column | str) -> Column:
    """string → array<string> of non-empty lowercase tokens (builtin-only)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """array<string> tokens → array<string> of n-word shingles joined by ' '.

    Built as ``arrays_zip`` of n shifted slices, then a field-concat
    transform — no UDF, and crucially the ``tokens`` expression is evaluated
    a CONSTANT number of times per row. The naive
    ``transform(idx, i -> element_at(tokens, i+k))`` form re-evaluates
    ``tokens`` once per element access, and Catalyst's projection collapse
    inlines the tokenizer split into every such access when the shingle
    array later feeds a Generate (explode) — measured 8× slower at bench.
    Empty array when fewer than n tokens (zero-length slices zip to empty).
    """
    m = F.greatest(F.size(tokens) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(tokens, i + 1, m).alias(f"t{i}") for i in range(n)]
    )
    return F.transform(
        zipped, lambda x: F.concat_ws(" ", *[x[f"t{i}"] for i in range(n)])
    )


def make_segmenter_udf():
    """U1's pluggable "real" segmenter slot (the ik_analyze analog,
    rt/app/func/KeywordUDTF.java:14-22): an Arrow-batched pandas UDF that
    uses ``jieba`` (public Chinese segmenter) when importable and otherwise
    falls back to the deterministic whitespace tokenizer, so the pipeline
    shape (segment → explode → count) is identical either way. The builtin
    ``tokenize`` above remains the default hot path — this UDF exists for
    corpora where a linguistic segmenter is genuinely required.

    Defined as a nested function so cloudpickle ships it by value to
    foreign-cwd Python workers.
    """
    import pandas as pd  # noqa: F401 — worker-side import
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def segment(series):
        try:
            import jieba

            def cut(s):
                return [t for t in jieba.lcut(s or "") if t.strip()]

        except ImportError:

            def cut(s):
                return [t for t in (s or "").lower().split() if t]

        return series.map(cut)

    return segment


def stopword_count(tokens: Column) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))
