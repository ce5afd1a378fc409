"""Watermark / event-time window / late-data semantics (SURVEY.md §2.E
streaming rows): a window emits once the watermark passes its end, and
an event arriving later than the watermark allows is DROPPED, not
double-counted.
"""

from __future__ import annotations

import datetime as dt

from amazon_textract_enhancer_spark.streaming import stream_windowed_counts


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_windowed_counts_with_late_data_drop(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    d1 = dt.datetime(2024, 3, 1)
    d2 = dt.datetime(2024, 3, 2)
    d3 = dt.datetime(2024, 3, 3)

    # run 1: day-1 events + a day-2 event that advances the watermark
    # past day-1's window end (watermark = 2h)
    batch1 = [
        (1, d1 + dt.timedelta(hours=1), 1, "click", 1.0),
        (2, d1 + dt.timedelta(hours=2), 1, "click", 1.0),
        (3, d1 + dt.timedelta(hours=3), 2, "view", 1.0),
        (4, d2 + dt.timedelta(hours=12), 2, "click", 1.0),
    ]
    _events_df(spark, batch1).write.mode("append").parquet(input_dir)
    stream_windowed_counts(spark, input_dir, out, ckpt)

    got1 = {
        (r["win_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # day-1 windows finalized (watermark reached day-2 10:00 > day-1 end)
    assert got1[("2024-03-01 00:00", "click")] == 2
    assert got1[("2024-03-01 00:00", "view")] == 1
    # day-2 window NOT emitted yet (not past watermark)
    assert ("2024-03-02 00:00", "click") not in got1

    # run 2: one LATE day-1 event (must be dropped — window finalized)
    # and a day-3 event that finalizes day-2
    batch2 = [
        (5, d1 + dt.timedelta(hours=4), 3, "click", 1.0),  # late → dropped
        (6, d3 + dt.timedelta(hours=12), 3, "view", 1.0),
    ]
    _events_df(spark, batch2).write.mode("append").parquet(input_dir)
    stream_windowed_counts(spark, input_dir, out, ckpt)

    got2 = {
        (r["win_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # day-1 click count unchanged: the late event was dropped
    assert got2[("2024-03-01 00:00", "click")] == 2
    # day-2 window now finalized with its single click
    assert got2[("2024-03-02 00:00", "click")] == 1


def test_stateful_conv_progress_across_restarts(spark, tmp_path):
    """applyInPandasWithState: group state accumulates across two
    availableNow runs of the same query (state in the checkpoint)."""
    from amazon_textract_enhancer_spark.fixtures import generate_transcripts, rows_to_pandas
    from amazon_textract_enhancer_spark.schemas import TRANSCRIPT_SCHEMA
    from amazon_textract_enhancer_spark.streaming import stream_stateful_conv_progress

    input_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows, _ = generate_transcripts(seed=42, n_convs=4)
    half = len(rows) // 2
    df1 = spark.createDataFrame(rows_to_pandas(rows[:half]), schema=TRANSCRIPT_SCHEMA)
    df2 = spark.createDataFrame(rows_to_pandas(rows[half:]), schema=TRANSCRIPT_SCHEMA)

    df1.write.mode("append").parquet(input_dir)
    stream_stateful_conv_progress(spark, input_dir, out, ckpt)
    df2.write.mode("append").parquet(input_dir)
    stream_stateful_conv_progress(spark, input_dir, out, ckpt)

    got = spark.read.parquet(out).toPandas()
    # last emission per conv carries the cumulative totals
    final = got.sort_values("turns_seen").groupby("conv_id").last()
    want = {}
    for r in rows:
        c = want.setdefault(r["conv_id"], [0, 0])
        c[0] += 1
        c[1] += len(r["text"] or "")
    for conv, (turns, chars) in want.items():
        assert final.loc[conv, "turns_seen"] == turns, conv
        assert final.loc[conv, "chars_seen"] == chars, conv


def test_stream_dedup_exact_across_restarts(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a turn whose text fingerprint was
    already ingested is suppressed — within a batch, across
    micro-batches, and across availableNow restarts (state in the
    checkpoint). New content always passes."""
    import datetime as dt

    input_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    from amazon_textract_enhancer_spark.streaming import stream_dedup_exact

    t0 = dt.datetime(2024, 3, 1, 12, 0)

    def turns(rows):
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )

    batch1 = [
        ("c1", 0, "user", "hello world", "", t0),
        ("c1", 1, "assistant", "hello world", "", t0),  # in-batch dup
        ("c2", 0, "user", "something else", "", t0),
    ]
    turns(batch1).write.mode("append").parquet(input_dir)
    stream_dedup_exact(spark, input_dir, out, ckpt)
    got1 = spark.read.parquet(out)
    assert got1.count() == 2
    assert set(r["text"] for r in got1.collect()) == {"hello world", "something else"}

    # run 2: a cross-restart dup (suppressed via checkpointed state)
    # and one genuinely new turn
    batch2 = [
        ("c3", 0, "user", "hello world", "", t0 + dt.timedelta(hours=1)),
        ("c3", 1, "user", "brand new", "", t0 + dt.timedelta(hours=1)),
    ]
    turns(batch2).write.mode("append").parquet(input_dir)
    stream_dedup_exact(spark, input_dir, out, ckpt)
    got2 = spark.read.parquet(out)
    assert got2.count() == 3
    texts = sorted(r["text"] for r in got2.collect())
    assert texts == ["brand new", "hello world", "something else"]
