"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata
struct; decode / feature-extraction run as Arrow-batched pandas
functions over `mapInPandas`. The decode step itself is STUBBED (no
image/audio libs in this container — clearly marked below); everything
Spark-side is real: schema, partitioning, UDF signatures, batch
shapes.

At 100 TB: payloads dominate bytes, so (a) metadata-only queries must
never read the payload column (column pruning — keep payloads in their
own parquet column), (b) decode fan-out is mapInPandas with
maxRecordsPerBatch tuned down so a batch of decoded frames fits in
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bqfetch_spark.catalog import load_catalog
from bqfetch_spark.registry import register

MEDIA_SCHEMA = (
    "doc_id bigint, payload binary, kind string, width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "doc_id bigint, kind string, byte_len bigint, checksum string, feat_mean double"
)


def attach_fake_payload(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary payload + metadata from documents
    (fixtures carry no real media; payload bytes = UTF-8 of text).
    Metadata is hash-derived so it is stable across runs."""
    h = F.abs(F.xxhash64("text"))
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (h % 3 + 1).cast("int")).alias("kind"),
        (h % 1920 + 1).cast("int").alias("width"),
        (h % 1080 + 1).cast("int").alias("height"),
        (h % 60000).cast("int").alias("duration_ms"),
    )


def decode_media(payload: bytes, kind: str):
    """STUB: real decode requires PIL/ffmpeg/torchaudio, not present in
    this container. The Spark-side plumbing (batch shape, schema,
    partitioning) is exercised with extract_features instead."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not available in this environment"
    )


def extract_features(media: DataFrame, batch_size: int = 512) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas: byte length, md5 checksum, and a deterministic fake
    'embedding mean' standing in for the decoded-feature statistic."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "feat_mean": payloads.map(
                        lambda b: (sum(b[:64]) / min(len(b), 64)) if len(b) else 0.0
                    ),
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


MEDIA_META_ORACLE = """
SELECT
  doc_id,
  CAST(length(text) AS BIGINT) AS byte_len,
  md5(text) AS checksum
FROM documents
"""


@register("q62_multimodal_meta", oracle=MEDIA_META_ORACLE, tags=("multimodal",))
def q62_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata/checksum pass over binary payloads — the JVM-side part
    of the multimodal path (md5 over the payload bytes; text is ASCII
    so byte_len == char length in the oracle). The pandas feature
    extraction is exercised in tests (mapInPandas shape/checksums)."""
    docs = load_catalog(spark, sf_dir).table("documents")
    media = attach_fake_payload(docs)
    return media.select(
        "doc_id",
        F.octet_length("payload").cast("bigint").alias("byte_len"),
        F.md5("payload").alias("checksum"),
    )
