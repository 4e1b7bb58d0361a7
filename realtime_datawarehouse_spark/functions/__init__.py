"""Scalar function layer (SURVEY.md §2.10/§2.11).

All hot-path expressions are built-in ``pyspark.sql.functions`` compositions
(JVM-side, whole-stage-codegen'd). Python UDFs appear nowhere in this layer;
the only Python-side compute in the engine is the Arrow-batched multimodal
stubs in ``operators/multimodal.py``.
"""

from realtime_datawarehouse_spark.functions.hashing import (  # noqa: F401
    hash64,
    hash64_sql,
    minhash_signature,
)
from realtime_datawarehouse_spark.functions.text import (  # noqa: F401
    tokenize,
    word_shingles,
)
from realtime_datawarehouse_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
