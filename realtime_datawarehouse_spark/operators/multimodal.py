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


# --------------------------------------------------------------------------
# Resize stage: decoded metadata → output geometry clamped to a target box,
# aspect preserved by integer halving (the deterministic stand-in for a real
# PIL/opencv resample, which would run in the same kernel position).
# --------------------------------------------------------------------------

# fixture dims are w ≤ 640, h ≤ 480; a 320-box means exactly ≤1 halving step,
# which keeps the SQL oracle a single CASE (the kernel loop is general)
TARGET_W = 320
TARGET_H = 320

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("out_bytes", LongType()),
    ]
)


def make_resize_stub(target_w: int = TARGET_W, target_h: int = TARGET_H):
    """Fake resizer kernel: halve dimensions until they fit the target box
    (what a real thumbnailer does geometrically), out_bytes = 3*w*h (RGB).
    Nested function so cloudpickle ships it by value (foreign-cwd workers)."""

    def resize_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            w = (n % 640 + 1).astype("int64")
            h = (n * 7 % 480 + 1).astype("int64")
            while ((w > target_w) | (h > target_h)).any():
                too_big = (w > target_w) | (h > target_h)
                w = w.where(~too_big, (w + 1) // 2)
                h = h.where(~too_big, (h + 1) // 2)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": w.astype("int32"),
                    "out_height": h.astype("int32"),
                    "out_bytes": 3 * w * h,
                }
            )

    return resize_stub


def resize_images(docs: DataFrame, text_col: str = "text") -> DataFrame:
    payloads = attach_payload(docs, text_col)
    return payloads.mapInPandas(make_resize_stub(), schema=RESIZED_SCHEMA)


# fixture dims: width ≤ 640 < 2*TARGET, height ≤ 480 < 2*TARGET → at most one
# halving step, which the oracle expresses directly.
RESIZE_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         strlen(text) % 640 + 1     AS w,
         strlen(text) * 7 % 480 + 1 AS h
  FROM documents
), r AS (
  SELECT doc_id,
         CASE WHEN w > {TARGET_W} OR h > {TARGET_H} THEN (w + 1) // 2 ELSE w END AS w,
         CASE WHEN w > {TARGET_W} OR h > {TARGET_H} THEN (h + 1) // 2 ELSE h END AS h
  FROM d
)
SELECT doc_id, CAST(w AS INT) AS out_width, CAST(h AS INT) AS out_height,
       CAST(3 * w * h AS BIGINT) AS out_bytes
FROM r
"""


# --------------------------------------------------------------------------
# Frame-sampling stage: one input row (a "video" payload) fans out to one row
# per sampled frame — the mapInPandas batch-shape that matters at scale
# (output cardinality decoupled from input; Arrow batches stream, nothing
# accumulates per partition).
# --------------------------------------------------------------------------

FRAME_STRIDE = 5

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ms", LongType()),
    ]
)


def make_frame_sample_stub(stride: int = FRAME_STRIDE, fps: int = 24):
    """Fake frame sampler: frames = n%24+1, emit indices 0, stride, 2*stride…
    with their timestamps; a real kernel would seek/decode those frames."""

    def frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            frames = (n % 24 + 1).to_numpy()
            doc_ids = pdf["doc_id"].to_numpy()
            reps = (frames + stride - 1) // stride
            doc_col = _np.repeat(doc_ids, reps)
            idx_col = _np.concatenate(
                [_np.arange(0, f, stride) for f in frames]
            ) if len(frames) else _np.array([], dtype="int64")
            yield _pd.DataFrame(
                {
                    "doc_id": doc_col,
                    "frame_idx": idx_col.astype("int32"),
                    "frame_ms": (idx_col * 1000 // fps).astype("int64"),
                }
            )

    return frame_sample


def sample_frames(docs: DataFrame, text_col: str = "text") -> DataFrame:
    payloads = attach_payload(docs, text_col)
    return payloads.mapInPandas(make_frame_sample_stub(), schema=FRAMES_SCHEMA)


FRAME_SAMPLE_ORACLE = f"""
WITH d AS (
  SELECT doc_id, strlen(text) % 24 + 1 AS frames FROM documents
)
SELECT doc_id,
       CAST(g.i AS INT)               AS frame_idx,
       CAST(g.i * 1000 // 24 AS BIGINT) AS frame_ms
FROM d, LATERAL (SELECT unnest(range(0, frames, {FRAME_STRIDE})) AS i) g
"""


# --------------------------------------------------------------------------
# Feature-extraction stage: payload → fixed-dim feature vector. The fake
# derives dimensions arithmetically from byte length; a real kernel would run
# a vision/audio model over the decoded tensor in the same position. Features
# surface as scalar columns (f0..f7) so the result is hash-comparable; the
# kernel-internal representation is a (batch, dim) ndarray — the real shape.
# --------------------------------------------------------------------------

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [StructField("doc_id", LongType())]
    + [StructField(f"f{d}", IntegerType()) for d in range(FEATURE_DIM)]
)


def make_feature_stub(dim: int = FEATURE_DIM):
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            n = pdf["payload"].map(len).to_numpy(dtype="int64")
            # (batch, dim) feature matrix — vectorized, Arrow-batched
            feats = (n[:, None] * (_np.arange(dim)[None, :] + 1)) % 97
            out = {"doc_id": pdf["doc_id"]}
            for d in range(dim):
                out[f"f{d}"] = feats[:, d].astype("int32")
            yield _pd.DataFrame(out)

    return extract


def extract_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    payloads = attach_payload(docs, text_col)
    return payloads.mapInPandas(make_feature_stub(), schema=FEATURES_SCHEMA)


FEATURES_ORACLE = "SELECT doc_id, " + ", ".join(
    f"CAST(strlen(text) * {d + 1} % 97 AS INT) AS f{d}"
    for d in range(FEATURE_DIM)
) + " FROM documents"


# --------------------------------------------------------------------------
# Audio: a REAL codec path (VERDICT r01: "wire a real codec behind the slot
# if the image gains one" — the image libs never arrived, but the stdlib
# `wave` module is a genuine RIFF/WAVE codec, so the audio modality runs a
# real encode → container → decode round trip, not a stub). Payload synthesis
# is deterministic arithmetic per doc_id, so the DECODED properties (read
# back by parsing actual RIFF headers + PCM frames) have an exact SQL oracle.
# --------------------------------------------------------------------------

AUDIO_SAMPLE_RATE = 16_000

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms", IntegerType()),
    ]
)


def make_wav_encode_kernel(sample_rate: int = AUDIO_SAMPLE_RATE):
    """Encode a deterministic PCM signal per doc into REAL WAV bytes with the
    stdlib ``wave`` codec: frames = doc_id % 1600 + 160, channels =
    doc_id % 2 + 1, constant amplitude doc_id % 1000 (so RMS is exact).
    Nested function — cloudpickle ships it by value (foreign-cwd workers)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        def one(doc_id: int) -> bytes:
            frames = int(doc_id) % 1600 + 160
            channels = int(doc_id) % 2 + 1
            amp = int(doc_id) % 1000
            pcm = _np.full(frames * channels, amp, dtype="<i2").tobytes()
            buf = io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(channels)
                w.setsampwidth(2)
                w.setframerate(sample_rate)
                w.writeframes(pcm)
            return buf.getvalue()

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["doc_id"].map(one),
                }
            )

    return encode


def make_wav_decode_kernel():
    """Decode REAL WAV bytes: parse RIFF headers with ``wave``, read the PCM
    frames, compute integer RMS. This is the genuine codec position — swap
    PIL/ffmpeg into the same kernel shape for images/video."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import math
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        def one(payload: bytes):
            with _wave.open(io.BytesIO(payload), "rb") as w:
                rate, ch, nf = w.getframerate(), w.getnchannels(), w.getnframes()
                pcm = _np.frombuffer(w.readframes(nf), dtype="<i2")
            rms = int(math.isqrt(int((pcm.astype("int64") ** 2).mean()))) if len(pcm) else 0
            return rate, ch, nf, nf * 1000 // rate, rms

        for pdf in batches:
            decoded = pdf["payload"].map(one)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": decoded.map(lambda t: t[0]).astype("int32"),
                    "n_channels": decoded.map(lambda t: t[1]).astype("int32"),
                    "n_frames": decoded.map(lambda t: t[2]).astype("int64"),
                    "duration_ms": decoded.map(lambda t: t[3]).astype("int64"),
                    "rms": decoded.map(lambda t: t[4]).astype("int32"),
                }
            )

    return decode


def audio_decode(docs: DataFrame) -> DataFrame:
    """doc_id → WAV bytes (real encoder) → decoded audio metadata (real
    decoder). Two Arrow-batched mapInPandas stages back to back — the bytes
    stay on the executors, fused into one stage (no shuffle between them)."""
    payloads = docs.select("doc_id").mapInPandas(
        make_wav_encode_kernel(), schema=PAYLOAD_SCHEMA
    )
    return payloads.mapInPandas(make_wav_decode_kernel(), schema=AUDIO_SCHEMA)


# Constant-amplitude PCM: rms == amplitude exactly; all other fields replay
# the synthesis arithmetic, but the Spark side obtains them by PARSING the
# RIFF container the encoder produced.
AUDIO_DECODE_ORACLE = f"""
SELECT doc_id,
       {AUDIO_SAMPLE_RATE}                                  AS sample_rate,
       CAST(doc_id % 2 + 1 AS INT)                          AS n_channels,
       CAST(doc_id % 1600 + 160 AS BIGINT)                  AS n_frames,
       CAST((doc_id % 1600 + 160) * 1000 // {AUDIO_SAMPLE_RATE} AS BIGINT) AS duration_ms,
       CAST(doc_id % 1000 AS INT)                           AS rms
FROM documents
"""


# --------------------------------------------------------------------------
# Perceptual average-hash (aHash) over the decoded payload — the image
# NEAR-dup primitive (exact dedup catches only byte-identical files; aHash
# survives re-encodes/resizes). The "pixels" here are 64 evenly-strided
# payload bytes (the deterministic stand-in for an 8×8 grayscale downsample;
# a real build swaps ONE line — the sampling — for PIL's resize+grayscale,
# keeping schema, batching and the bit arithmetic identical).
# --------------------------------------------------------------------------

PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash_hi", LongType()),
        StructField("phash_lo", LongType()),
    ]
)


def make_phash_kernel():
    """aHash kernel: 64 strided samples, bit i = sample_i·64 > Σ samples
    (integer comparison — no float mean, so the SQL oracle is bit-exact).
    Nested so cloudpickle ships it by value (foreign-cwd workers)."""

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def one(payload: bytes) -> tuple[int, int]:
            n = len(payload)
            if n == 0:
                return 0, 0
            vals = [payload[(i * n) // 64] for i in range(64)]
            total = sum(vals)
            hi = lo = 0
            for i in range(32):
                if vals[i] * 64 > total:
                    hi |= 1 << i
                if vals[32 + i] * 64 > total:
                    lo |= 1 << i
            return hi, lo

        for pdf in batches:
            pairs = [one(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash_hi": [p[0] for p in pairs],
                    "phash_lo": [p[1] for p in pairs],
                }
            )

    return phash


def image_phash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    payloads = attach_payload(docs, text_col)
    return payloads.mapInPandas(make_phash_kernel(), schema=PHASH_SCHEMA)


def _phash_sample_sql(i: int) -> str:
    # payload byte at ⌊i·n/64⌋ — ASCII fixture ⇒ octet == char (asserted
    # by the decode tests), so ascii(substr(...)) IS the byte
    return (
        f"CASE WHEN strlen(text) = 0 THEN 0 ELSE "
        f"ascii(substr(text, CAST((({i} * strlen(text)) // 64) AS INT) + 1, 1))"
        f" END"
    )


def image_phash_oracle() -> str:
    samples = ", ".join(
        f"{_phash_sample_sql(i)} AS v{i}" for i in range(64)
    )
    total = " + ".join(f"v{i}" for i in range(64))
    hi = " + ".join(
        f"(CASE WHEN v{i} * 64 > total THEN {1 << i} ELSE 0 END)"
        for i in range(32)
    )
    lo = " + ".join(
        f"(CASE WHEN v{32 + i} * 64 > total THEN {1 << i} ELSE 0 END)"
        for i in range(32)
    )
    return f"""
WITH s AS (
  SELECT doc_id, {samples} FROM documents
), t AS (
  SELECT doc_id, *, {total} AS total FROM s
)
SELECT doc_id,
       CAST({hi} AS BIGINT) AS phash_hi,
       CAST({lo} AS BIGINT) AS phash_lo
FROM t
"""


# --------------------------------------------------------------------------
# Content-type sniffing by magic bytes — the first gate of any multimodal
# ingest: route each opaque blob to the right decoder (or quarantine) by
# inspecting leading bytes, BEFORE spending a Python worker on it. Runs
# entirely JVM-side (binary substring + equality — whole-stage codegen,
# zero Python), which is what makes it viable as a 100 TB pre-filter.
# The fixture synthesizes payloads with real magic headers chosen by
# doc_id % 4, so the oracle can mirror the rule arithmetically while the
# engine must actually parse the bytes to agree.
# --------------------------------------------------------------------------

_PNG_MAGIC = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
_JPEG_MAGIC = bytes([0xFF, 0xD8, 0xFF, 0xE0])
_RIFF = b"RIFF"
_WAVE = b"WAVE"


def attach_typed_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize (doc_id, payload) with a REAL magic header per doc:
    doc_id % 4 → PNG / JPEG / RIFF-WAVE container / raw bytes. The WAVE
    case exercises offset-field sniffing (format tag at bytes 9-12, after
    the 4-byte chunk size)."""
    body = F.encode(F.col(text_col), "UTF-8")
    sel = F.col("doc_id") % 4
    payload = (
        F.when(sel == 0, F.concat(F.lit(_PNG_MAGIC), body))
        .when(sel == 1, F.concat(F.lit(_JPEG_MAGIC), body))
        .when(
            sel == 2,
            F.concat(
                F.lit(_RIFF), F.lit(bytes([0, 0, 0, 0])), F.lit(_WAVE), body
            ),
        )
        .otherwise(body)
    )
    return docs.select("doc_id", payload.alias("payload"))


def content_sniff(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(content_type, n_files, total_bytes) by magic-byte inspection of the
    binary payload column — binary substring/equality expressions only."""
    p = attach_typed_payload(docs, text_col)
    head = lambda off, n: F.substring(F.col("payload"), off, n)  # noqa: E731
    ctype = (
        F.when(head(1, 8) == F.lit(_PNG_MAGIC), "image/png")
        .when(head(1, 4) == F.lit(_JPEG_MAGIC), "image/jpeg")
        .when(
            (head(1, 4) == F.lit(_RIFF)) & (head(9, 4) == F.lit(_WAVE)),
            "audio/wav",
        )
        .otherwise("application/octet-stream")
    )
    return (
        p.select(ctype.alias("content_type"), F.length("payload").alias("nb"))
        .groupBy("content_type")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("nb").cast("bigint").alias("total_bytes"),
        )
    )


# Oracle mirrors the synthesis rule arithmetically (octet length == char
# length for the ASCII fixture corpus — asserted in tests): header sizes
# 8 / 4 / 12 / 0 for doc_id % 4 = 0 / 1 / 2 / 3.
CONTENT_SNIFF_ORACLE = """
SELECT CASE doc_id % 4
         WHEN 0 THEN 'image/png'
         WHEN 1 THEN 'image/jpeg'
         WHEN 2 THEN 'audio/wav'
         ELSE 'application/octet-stream' END AS content_type,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(strlen(text) + CASE doc_id % 4
              WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 12
              ELSE 0 END) AS BIGINT) AS total_bytes
FROM documents
GROUP BY 1
"""
