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


# ---------------------------------------------------------------------------
# U1 "real" segmenter: dictionary forward-maximum-matching (FMM).
#
# The reference's ik_analyze (rt/util/KeywordUtil.java:17-31) is IK's "smart"
# mode — a dictionary max-match segmenter at heart. FMM is the public
# textbook form of the same family: scan left→right, at each position take
# the LONGEST dictionary word starting there, else emit the single CJK
# character. Latin/digit runs are kept whole (lowercased), punctuation and
# whitespace are dropped — matching IK's treatment of mixed-script text.
#
# The default dictionary below is a tiny demonstration lexicon (common
# Mandarin e-commerce/search words — the reference's domain); production
# deployments pass their own ``dictionary=`` (one word per entry). The
# algorithm, not the lexicon, is the capability.
# ---------------------------------------------------------------------------

DEFAULT_CJK_DICT: tuple[str, ...] = (
    "北京", "上海", "天安门", "苹果", "手机", "小米", "华为", "电视",
    "洗衣机", "口红", "图书", "电脑", "平板", "键盘", "鼠标", "耳机",
    "充电器", "数据线", "购物", "搜索", "关键词", "商品", "订单", "用户",
    "支付", "退款", "优惠券", "秒杀", "直播", "评论", "收藏", "加购",
    "机器学习", "数据仓库", "实时", "流计算",
)


def _make_fmm():
    # Factory so the returned function's __qualname__ is NOT importable:
    # cloudpickle then serializes it BY VALUE into UDF closures, which is
    # required for foreign-cwd drivers whose Python workers don't have this
    # package on sys.path (see the repo verify-skill gotchas).
    def fmm_segment(text: str, words: frozenset, max_len: int) -> list:
        """Pure-Python forward-maximum-matching over one string."""
        out = []
        s = text or ""
        i, n = 0, len(s)
        while i < n:
            ch = s[i]
            if ch.isspace():
                i += 1
                continue
            if ch.isascii():
                if ch.isalnum():
                    j = i + 1
                    while j < n and s[j].isascii() and s[j].isalnum():
                        j += 1
                    out.append(s[i:j].lower())
                    i = j
                else:  # ASCII punctuation
                    i += 1
                continue
            # non-ASCII (CJK etc.): longest dictionary match, else single char
            matched = False
            for L in range(min(max_len, n - i), 1, -1):
                if s[i : i + L] in words:
                    out.append(s[i : i + L])
                    i += L
                    matched = True
                    break
            if not matched:
                if ch.isalnum():  # single CJK char; drop non-ASCII punct
                    out.append(ch)
                i += 1
        return out

    return fmm_segment


fmm_segment = _make_fmm()


def make_segmenter_udf(dictionary=None):
    """U1's pluggable "real" segmenter (the ik_analyze analog,
    rt/app/func/KeywordUDTF.java:14-22): an Arrow-batched pandas UDF running
    dictionary forward-maximum-matching (see ``fmm_segment``). ``jieba`` is
    used instead when importable (not in this container); the FMM path is a
    real segmenter either way — CJK text segments by longest dictionary
    match, and pure-ASCII corpora tokenize identically to the builtin
    ``tokenize``, so swapping segmenters never changes the pipeline shape
    (segment → explode → count). The builtin ``tokenize`` remains the
    default hot path: UDFs are the slow path, reserved for corpora where a
    linguistic segmenter is genuinely required.

    Defined as a nested function so cloudpickle ships it (and the captured
    dictionary) by value to foreign-cwd Python workers.
    """
    import pandas as pd  # noqa: F401 — worker-side import
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    words = frozenset(dictionary if dictionary is not None else DEFAULT_CJK_DICT)
    max_len = max((len(w) for w in words), default=1)
    fmm = fmm_segment

    @pandas_udf(ArrayType(StringType()))
    def segment(series):
        try:
            import jieba

            def cut(s):
                return [t for t in jieba.lcut(s or "") if t.strip()]

        except ImportError:

            def cut(s):
                return fmm(s, words, max_len)

        return series.map(cut)

    return segment


def stopword_count(tokens: Column) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))
