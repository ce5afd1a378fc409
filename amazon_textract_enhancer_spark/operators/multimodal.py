"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode itself is STUBBED (no image/audio libs in this container):
``decode_image_meta_stub`` derives deterministic fake (width, height,
n_frames) from the byte content, and ``decode_image_pixels`` raises
NotImplementedError — but the Spark-side plumbing (binary schema,
batch shape, UDF signature, partitioning) is real and tested, and the
stub arithmetic is simple enough to have a DuckDB oracle twin, so the
whole multimodal path is correctness-gated too.

On a real cluster, swap ``_meta_from_bytes`` for PIL/libav decode —
the Spark plan is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .io_util import t

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("codec", StringType(), False),
    ]
)


def _meta_from_bytes(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake decode: metadata as pure arithmetic on the
    byte length (mirrored 1:1 in the DuckDB oracle). A real decoder
    replaces exactly this function."""
    n = len(payload)
    width = n % 640 + 16
    height = (n * 7) % 480 + 16
    n_frames = n % 8 + 1
    codec = "png" if n % 2 == 0 else "jpeg"
    return width, height, n_frames, codec


def decode_image_pixels(payload: bytes):  # pragma: no cover - stub
    """Real pixel decode — requires an imaging library not present in
    this container. The Spark plumbing calls _meta_from_bytes instead."""
    raise NotImplementedError(
        "pixel decode requires PIL/opencv; not available in this environment"
    )


def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column → typed metadata via one Arrow-batched mapInPandas
    stage (the multimodal feature-extraction shape). documents.text is
    cast to binary as the stand-in payload column."""
    import pyarrow as pa

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            payloads = rb.column(1).to_pylist()
            metas = [_meta_from_bytes(p) for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0),
                    pa.array([len(p) for p in payloads], pa.int32()),
                    pa.array([m[0] for m in metas], pa.int32()),
                    pa.array([m[1] for m in metas], pa.int32()),
                    pa.array([m[2] for m in metas], pa.int32()),
                    pa.array([m[3] for m in metas], pa.string()),
                ],
                names=[f.name for f in IMAGE_META_SCHEMA.fields],
            )

    return docs.mapInArrow(fn, IMAGE_META_SCHEMA)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling shape: explode n_frames into (doc_id, frame_idx)
    rows JVM-side — the UDF only produced scalar metadata, the fan-out
    stays in Catalyst."""
    meta = mm_decode_meta(spark, sf_dir)
    return meta.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    )
