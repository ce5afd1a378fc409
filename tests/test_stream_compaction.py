"""compact_stream_landing — the Iceberg rewrite_data_files analog for
the streaming landing zone (the one real small-file source in this
architecture). Pins: content equality with the landing zone, bucketed
output file count, the manifest's compaction audit block, and
idempotent resume (unchanged landing → manifest no-op; grown landing →
fresh rewrite under a new content snapshot)."""

from __future__ import annotations

import glob
import os

from amazon_textract_enhancer_spark.fixtures import generate_transcripts, rows_to_pandas
from amazon_textract_enhancer_spark.schemas import TRANSCRIPT_SCHEMA
from amazon_textract_enhancer_spark.sources.tableio import TableIO
from amazon_textract_enhancer_spark.streaming import compact_stream_landing, stream_extract


def _write_batch(spark, input_dir, seed, n_convs):
    rows, _ = generate_transcripts(seed=seed, n_convs=n_convs)
    df = spark.createDataFrame(rows_to_pandas(rows), schema=TRANSCRIPT_SCHEMA)
    # many small task files per micro-batch, the production fragmentation shape
    df.repartition(6).write.mode("append").parquet(input_dir)


def _sorted_rows(df):
    cols = ["conv_id", "turn_idx", "kind", "extracted_text"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_compaction_equality_filecount_audit_resume(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    io = TableIO(str(tmp_path / "wh"))

    # three arrival windows, each its own availableNow micro-batch run —
    # every run appends its own task files to the landing zone
    for seed in (11, 12, 14):
        _write_batch(spark, input_dir, seed=seed, n_convs=8)
        stream_extract(spark, input_dir, landing, ckpt)

    landing_files = glob.glob(os.path.join(landing, "**", "*.parquet"), recursive=True)
    assert len(landing_files) > 4  # fragmented: more files than bucket target

    m = compact_stream_landing(spark, landing, io, "spans_serving", n_buckets=4)
    c = m["compaction"]
    assert c["source_files"] == len(landing_files)
    assert c["output_files"] == 4 < c["source_files"]
    assert c["source_bytes"] > 0 and c["output_bytes"] > 0

    # content equality with the landing zone
    assert _sorted_rows(io.read_table(spark, "spans_serving")) == _sorted_rows(
        spark.read.parquet(landing)
    )

    # unchanged landing zone → resume no-op (same manifest, same snapshot)
    m2 = compact_stream_landing(spark, landing, io, "spans_serving", n_buckets=4)
    assert m2["input_snapshot"] == m["input_snapshot"]
    assert m2["snapshot_seq"] == m["snapshot_seq"]

    # grown landing zone → new content snapshot, fresh rewrite
    _write_batch(spark, input_dir, seed=13, n_convs=4)
    stream_extract(spark, input_dir, landing, ckpt)
    m3 = compact_stream_landing(spark, landing, io, "spans_serving", n_buckets=4)
    assert m3["input_snapshot"] != m["input_snapshot"]
    assert m3["rows"] > m["rows"]
    assert _sorted_rows(io.read_table(spark, "spans_serving")) == _sorted_rows(
        spark.read.parquet(landing)
    )
