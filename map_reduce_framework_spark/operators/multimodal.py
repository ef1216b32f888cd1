"""Multimodal column handling: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the *decode* step is stubbed
(``decode_image`` raises NotImplementedError; ``fake_decode_meta`` is the
deterministic stand-in) -- but the Spark-side plumbing is real and tested:
binary column construction, mapInPandas batch shapes, schema contracts,
and partition-parallel feature extraction. Swapping the stub for
PIL/ffmpeg is a one-function change.

Scale notes: binary payloads ride in the same parquet row group as their
metadata; filters on typed metadata (width/height/n_bytes) push down so a
100 TB scan only decodes matching rows. mapInPandas streams Arrow batches
-- no row-at-a-time Python, no driver collect.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def decode_image(payload: bytes) -> "object":
    """Real decoder hook -- intentionally unimplemented in this container
    (no PIL/libjpeg). Replace with PIL.Image.open(io.BytesIO(payload))."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_decode_meta for the deterministic test path"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for decode: derive (width, height, format)
    from the payload bytes -- same contract a real decoder satisfies."""
    n = len(payload)
    width = 64 + n % 577
    height = 64 + (n * 31) % 419
    fmt = ("png", "jpeg", "webp")[n % 3]
    return width, height, fmt


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """Build the multimodal table shape from documents: the utf-8 text
    bytes stand in for an encoded image payload."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").cast(BinaryType()).alias("payload"),
        "source",
    )


_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


def extract_media_meta(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column: byte length,
    content hash, and decoded (stubbed) dimensions. One Arrow batch in,
    one out -- the pattern scales to any per-item decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            meta = [fake_decode_meta(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in payloads
                    ],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "format": [m[2] for m in meta],
                }
            )

    return media.mapInPandas(run, schema=_META_SCHEMA)


def multimodal_meta(documents: DataFrame) -> DataFrame:
    """End-to-end: documents -> binary payload -> extracted metadata."""
    return extract_media_meta(with_binary_payload(documents))


ORACLE_SQL: dict[str, str] = {
    # The fake decode is pure arithmetic on octet_length, so the whole
    # pandas-UDF pipeline has an exact SQL oracle.
    "multimodal_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS sha256,
               CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
               CAST(64 + (octet_length(encode(text)) * 31) % 419 AS INT) AS height,
               CASE octet_length(encode(text)) % 3
                   WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp'
               END AS format
        FROM documents
    """,
}
