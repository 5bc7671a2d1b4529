"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` payload columns with a
typed metadata struct. The Spark-side machinery — schema,
partition-friendly layout, Arrow-batched UDF signatures, batch
shapes — is real and tested; the actual media decode is stubbed
behind ``decoder='stub'`` (decode libraries are not in this
container) with a clearly-marked NotImplementedError for real
decoders and a deterministic fake for tests.

Scale notes: payloads dominate row size — keep them in their own
column (Parquet stores them contiguously), never in the shuffle key,
and resize/feature-extract *before* any wide operation so shuffles
move features (KBs) not media (MBs). `mapInPandas` keeps the decode
batch-parallel with Arrow transfer.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta_format", StringType()),
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media-shaped table from the documents fixture: payload =
    utf-8 bytes of the text (a stand-in binary blob with real
    per-row variance), metadata derived deterministically."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("stub/raw").alias("meta_format"),
        (F.col("n_chars") % 640 + 16).alias("meta_width"),
        (F.col("n_chars") % 480 + 16).alias("meta_height"),
    )


def _stub_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake 'embedding' from the payload bytes: md5-seeded
    values in [0,1). Stands in for a real decode→model pipeline."""
    out = []
    h = payload
    for i in range(dim):
        h = hashlib.md5(h + bytes([i & 0xFF])).digest()
        out.append(int.from_bytes(h[:8], "big") / 2**64)
    return out


def extract_features(
    media: DataFrame, decoder: str = "stub", dim: int = 8, batch_check: bool = False
) -> DataFrame:
    """Decode + feature-extract each payload via Arrow-batched
    mapInPandas. ``decoder='stub'`` produces deterministic fake
    features; any other name requires the real decode libraries.
    """
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder '{decoder}' needs media libraries not present in this "
            "environment; the stub decoder exercises the full Spark plumbing"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if batch_check and len(b) == 0:
                continue
            payloads = b["payload"]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(lambda p: hashlib.md5(p).hexdigest()),
                    "features": payloads.map(lambda p: _stub_features(bytes(p), dim)),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def resize(media: DataFrame, width: int, height: int, decoder: str = "stub") -> DataFrame:
    """Resize as a real Arrow-batched pass: decode -> resample ->
    re-encode per payload inside mapInPandas (batch shape and schema
    are the production ones; the codec itself is stubbed as a
    deterministic byte resample — a real decoder drops into
    ``_resize_payload``)."""
    if decoder != "stub":
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "plug one in here (same mapInPandas signature)"
        )
    target = width * height

    def _resize_payload(p: bytes) -> bytes:
        # deterministic fake resample: stretch/shrink bytes to the
        # target pixel count by index mapping (stands in for a codec)
        if not p:
            return b"\x00" * target
        n = len(p)
        return bytes(p[(i * n) // target] for i in range(target))

    out_schema = media.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b.copy()
            b["payload"] = b["payload"].map(lambda p: _resize_payload(bytes(p)))
            b["meta_width"] = width
            b["meta_height"] = height
            yield b

    return media.mapInPandas(run, out_schema)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-only variant (no payload rewrite) — kept for cheap
    schema tests."""
    return media.withColumn("meta_width", F.lit(width).cast("long")).withColumn(
        "meta_height", F.lit(height).cast("long")
    )


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame index (real decoder would attach the frame bytes).
    Demonstrates the 1→N explode shape feature pipelines need."""
    frames = F.sequence(F.lit(0), (F.col("meta_width") % 5 + 1))  # fake frame count
    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
        .filter(F.col("frame_idx") % every_n == 0)
    )


AUDIO_SCHEMA = "media_id long, n_samples_in long, n_samples_out long, out_digest string"


def audio_resample(
    media: DataFrame, src_rate: int = 44100, dst_rate: int = 16000, decoder: str = "stub"
) -> DataFrame:
    """Audio resampling plumbing: decode payload to PCM samples,
    rate-convert, report sample counts + output digest — the whole
    pass Arrow-batched in mapInPandas (one Python worker round trip
    per batch, never per row). The codec is stubbed: payload bytes
    read as int16 little-endian PCM and resampled by deterministic
    index mapping; a real decoder/soxr drops into ``_resample``
    with the same signature."""
    if decoder != "stub":
        raise NotImplementedError(
            "real audio codecs are not available in this environment; "
            "plug one in here (same mapInPandas signature)"
        )
    import hashlib

    def _resample(p) -> tuple[int, int, str]:
        # null payload = bad record: report zeros instead of killing
        # the task (one bad row must not fail a 100 TB pass)
        p = bytes(p) if p is not None else b""
        n_in = len(p) // 2
        n_out = (n_in * dst_rate) // src_rate
        # index-mapped nearest-sample pick (stands in for a filter bank)
        out = bytearray()
        for i in range(n_out):
            j = (i * n_in) // max(n_out, 1)
            out += p[2 * j : 2 * j + 2]
        return n_in, n_out, hashlib.md5(bytes(out)).hexdigest()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            trip = b["payload"].map(_resample)
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "n_samples_in": trip.map(lambda t: t[0]).astype("int64"),
                    "n_samples_out": trip.map(lambda t: t[1]).astype("int64"),
                    "out_digest": trip.map(lambda t: t[2]),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, AUDIO_SCHEMA)
