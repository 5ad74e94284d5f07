"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The decode libraries (PIL/librosa/ffmpeg) are NOT in this container, so the
decode step is a clearly-marked deterministic fake behind
``decode_stub`` — but the Spark-side plumbing is real and tested: schema,
binary payload handling through Arrow, `mapInPandas` batch shape,
partition-friendly feature extraction.

At scale: binary payloads ride in their own column; Parquet column pruning
means metadata-only queries never read the bytes; `mapInPandas` processes
whole Arrow batches so per-item Python overhead is amortized.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, checksum bigint, "
    "feat array<double>"
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministically wrap each document's text bytes as a fake media
    payload (binary column + typed metadata) — stands in for real
    image/audio blobs so the pipeline shape is exercised end-to-end."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.pmod(F.col("doc_id") * 37, F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.col("doc_id") * 53, F.lit(1080)) + 1).cast("int").alias("height"),
        (F.pmod(F.col("doc_id") * 977, F.lit(60000))).cast("int").alias("duration_ms"),
    )


def decode_stub(payload: bytes) -> bytes:
    """Placeholder for the real decoder (PIL.Image.open / av / soundfile).
    Container lacks the codec libraries; a real deployment swaps this
    function only — the surrounding Arrow plumbing is unchanged."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; extract_features uses a deterministic fake instead"
    )


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Per Arrow batch (not per row): byte length, a cheap rolling checksum,
    and a deterministic fake feature vector derived from the checksum —
    exactly the batch shape a real embedding model would use (payload bytes
    in, fixed-width float vector out)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: 0 if b is None else len(b)).astype("int64")
            checksum = payloads.map(
                lambda b: 0 if b is None else int(np.frombuffer(b, dtype=np.uint8).sum())
            ).astype("int64")
            rng_base = checksum.to_numpy(dtype=np.int64)
            feat = [
                ((np.arange(1, feat_dim + 1) * (c + 1)) % 997 / 997.0).tolist()
                for c in rng_base
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "checksum": checksum,
                    "feat": feat,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


#: 4-byte magic prefixing every framed payload (PNG-style)
MEDIA_MAGIC_HEX = "89504E47"


def frame_payload(media: DataFrame) -> DataFrame:
    """Prepend a PNG-style binary header to each payload: 4-byte magic +
    4-byte big-endian width + 4-byte big-endian height. Pure JVM built-ins
    (`to_binary(hex)`), so framing costs no Python even at full scale."""
    hdr_hex = F.concat(
        F.lit(MEDIA_MAGIC_HEX),
        F.lpad(F.hex(F.col("width")), 8, "0"),
        F.lpad(F.hex(F.col("height")), 8, "0"),
    )
    framed = F.concat(F.to_binary(hdr_hex, F.lit("hex")), F.col("payload"))
    return media.withColumn("payload", framed)


def parse_media_header(media: DataFrame) -> DataFrame:
    """Parse the binary header back out of the payload bytes — real
    binary-column processing with built-ins only: `substring` on binary +
    `conv(hex)` big-endian field decode. A metadata-only read never touches
    the body bytes thanks to Parquet column pruning; header parsing reads
    the column but stays fully inside whole-stage codegen."""
    p = F.col("payload")
    magic_ok = (F.hex(F.substring(p, 1, 4)) == MEDIA_MAGIC_HEX).cast("int")
    width = F.conv(F.hex(F.substring(p, 5, 4)), 16, 10).cast("bigint")
    height = F.conv(F.hex(F.substring(p, 9, 4)), 16, 10).cast("bigint")
    return media.select(
        "doc_id",
        "media_type",
        magic_ok.alias("magic_ok"),
        width.alias("hdr_width"),
        height.alias("hdr_height"),
        (F.length(p) - 12).cast("bigint").alias("body_bytes"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp
    (explode of a sequence — demonstrates fan-out of media rows into
    per-frame work items without touching payload bytes)."""
    vids = media.filter(F.col("media_type") == "video")
    return vids.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
