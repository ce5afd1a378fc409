"""stream_dedup_against_index: dedup state in a committed index table
— unbounded dup horizon (vs the watermark-bounded state-store form),
exactly-once outputs under epoch replay."""

from __future__ import annotations

import datetime
import os

from amazon_textract_enhancer_spark.sources.tableio import TableIO
from amazon_textract_enhancer_spark.streaming import (
    index_dedup_batch,
    stream_dedup_against_index,
)

TS = datetime.datetime(2024, 1, 1)


def _rows(spec):
    """spec: [(conv_id, turn_idx, text)] -> transcript-schema rows."""
    return [(c, t, "user", x, None, TS) for c, t, x in spec]


def _write_batch(spark, input_dir, spec, _fname=None):
    df = spark.createDataFrame(
        _rows(spec),
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    df.coalesce(1).write.mode("append").parquet(input_dir)


def _texts(spark, output_dir):
    out = spark.read.option("basePath", output_dir).parquet(output_dir)
    return sorted((r["conv_id"], r["text"]) for r in out.collect())


def test_index_dedup_across_batches_and_replay(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    io = TableIO(str(tmp_path / "wh"))
    os.makedirs(input_dir)

    # batch 1: in-batch dup (c2 repeats c1's text) + two uniques
    _write_batch(
        spark,
        input_dir,
        [("c1", 0, "alpha text"), ("c2", 0, "alpha text"),
         ("c3", 0, "beta text")],
        "b1",
    )
    stream_dedup_against_index(spark, input_dir, output_dir, ckpt, io)
    got1 = _texts(spark, output_dir)
    assert got1 == [("c1", "alpha text"), ("c3", "beta text")]

    # batch 2: cross-batch dup of batch 1 (arbitrarily later — no
    # watermark horizon) + one new text
    _write_batch(
        spark,
        input_dir,
        [("c4", 0, "alpha text"), ("c5", 0, "gamma text")],
        "b2",
    )
    stream_dedup_against_index(spark, input_dir, output_dir, ckpt, io)
    got2 = _texts(spark, output_dir)
    assert got2 == [
        ("c1", "alpha text"),
        ("c3", "beta text"),
        ("c5", "gamma text"),
    ]

    # replay the last epoch (crash after sink write / after index
    # commit, before checkpoint): recompute with the same epoch id —
    # output and index must be byte-stable, not double-dropped/emitted
    seq_before = io.read_manifest("stream_fp_index")["snapshot_seq"]
    epochs = sorted(
        int(d.split("=")[1])
        for d in os.listdir(output_dir)
        if d.startswith("epoch=")
    )
    last_epoch = epochs[-1]
    batch2 = spark.createDataFrame(
        _rows([("c4", 0, "alpha text"), ("c5", 0, "gamma text")]),
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    index_dedup_batch(spark, io, output_dir)(batch2, last_epoch)
    assert _texts(spark, output_dir) == got2
    assert io.read_manifest("stream_fp_index")["snapshot_seq"] == seq_before

    # epoch 3: an ANCIENT duplicate (batch-1 text) still drops — the
    # unbounded-horizon contrast with dropDuplicatesWithinWatermark
    _write_batch(spark, input_dir, [("c9", 0, "beta text")], "b3")
    stream_dedup_against_index(spark, input_dir, output_dir, ckpt, io)
    assert _texts(spark, output_dir) == got2
