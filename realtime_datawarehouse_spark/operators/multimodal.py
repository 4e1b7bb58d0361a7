"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed by Arrow-batched ``mapInPandas`` stages.

Design (BASELINE.json north-star): image/audio/video payloads are opaque
binary columns travelling next to typed metadata. The *decode* step is the
only part that needs a real codec library (unavailable in this container), so
it is stubbed behind ``decode_stub`` — a deterministic fake that derives
"decoded" properties from the byte content. Everything Spark-side is real and
tested: schema, Arrow batch shape, partition-preserving mapInPandas, and the
downstream relational plumbing over the extracted metadata.

Scale notes: mapInPandas streams Arrow record batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of partition
size; payload bytes never round-trip to the driver. At 100 TB the binary
column lives in its own parquet column chunk, so metadata-only queries never
read the payload bytes at all (columnar pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# Schema of the decode stage's output — what a real image decoder would emit.
DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("fake_frames", IntegerType()),
    ]
)

PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the opaque binary column from document text (UTF-8 bytes).

    Stands in for reading real image/audio bytes; keeps the fixture
    deterministic and the binary-column plumbing real.
    """
    return docs.select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def make_decode_stub():
    """Build the deterministic fake-decoder mapInPandas kernel.

    A real implementation would call PIL/ffmpeg here and raise
    NotImplementedError when the codec is missing; the fake derives plausible
    properties arithmetically from payload length so results are
    oracle-checkable: width = n % 640 + 1, height = (n*7) % 480 + 1,
    frames = n % 24 + 1.

    Returned as a nested function on purpose: cloudpickle serializes
    dynamically-defined functions BY VALUE, so Spark Python workers don't
    need this package importable on their path (the driver may launch us
    from any cwd).
    """

    def decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "fake_width": (n % 640 + 1).astype("int32"),
                    "fake_height": (n * 7 % 480 + 1).astype("int32"),
                    "fake_frames": (n % 24 + 1).astype("int32"),
                }
            )

    return decode_stub


def decode_metadata(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """binary payload → decoded metadata via Arrow-batched mapInPandas."""
    payloads = attach_payload(docs, text_col)
    return payloads.mapInPandas(make_decode_stub(), schema=DECODED_SCHEMA)


# Oracle replicates the stub arithmetic on octet length (text is ASCII in the
# fixture corpus, so octet length == char length — asserted in tests).
DECODE_METADATA_ORACLE = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT)              AS n_bytes,
       CAST(strlen(text) % 640 + 1 AS INT)       AS fake_width,
       CAST(strlen(text) * 7 % 480 + 1 AS INT)   AS fake_height,
       CAST(strlen(text) % 24 + 1 AS INT)        AS fake_frames
FROM documents
"""
