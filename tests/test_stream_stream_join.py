"""Stream-stream watermarked join (streaming.stream_join_call_results):
tool calls matched to tool results by call_id within an event-time
horizon. Pins the three semantics that matter: in-horizon results
match (with correct latency), out-of-horizon results never match, and
a result arriving later than the watermark allows is DROPPED even
though its call is buffered — including across availableNow restarts
(watermark + join state live in the checkpoint).
"""

from __future__ import annotations

import datetime as dt

from amazon_textract_enhancer_spark.streaming import stream_join_call_results


def _calls_df(spark, rows):
    return spark.createDataFrame(
        rows, "call_id long, conv_id string, tool string, ts timestamp"
    )


def _results_df(spark, rows):
    return spark.createDataFrame(rows, "call_id long, status string, rts timestamp")


def test_join_matches_within_horizon_and_drops_late(spark, tmp_path):
    calls_dir = str(tmp_path / "calls")
    results_dir = str(tmp_path / "results")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    d1 = dt.datetime(2024, 3, 1)
    d3 = dt.datetime(2024, 3, 3)

    # run 1: three calls; result 1 lands 5 min after its call (match),
    # result 2 lands 45 min after (outside the 30-min horizon — no
    # match), call 3 has no result yet. A day-3 call+result pair
    # advances both watermarks far past day 1.
    _calls_df(
        spark,
        [
            (1, "c1", "search", d1 + dt.timedelta(hours=1)),
            (2, "c1", "fetch", d1 + dt.timedelta(hours=2)),
            (3, "c2", "search", d1 + dt.timedelta(hours=3)),
            (9, "c9", "search", d3),
        ],
    ).write.mode("append").parquet(calls_dir)
    _results_df(
        spark,
        [
            (1, "ok", d1 + dt.timedelta(hours=1, minutes=5)),
            (2, "ok", d1 + dt.timedelta(hours=2, minutes=45)),
            (9, "ok", d3 + dt.timedelta(minutes=1)),
        ],
    ).write.mode("append").parquet(results_dir)
    stream_join_call_results(spark, calls_dir, results_dir, out, ckpt)

    got1 = {
        (r["call_id"], r["status"], r["latency_s"])
        for r in spark.read.parquet(out).collect()
    }
    assert (1, "ok", 300) in got1  # in-horizon match with exact latency
    assert (9, "ok", 60) in got1
    assert not any(c == 2 for c, _, _ in got1)  # out-of-horizon: never

    # run 2 (restart from checkpoint): a result for call 3 arrives with
    # a day-1 event time — the run-1 watermark (~day 3 - 2h) already
    # passed it, so the state store no longer buffers day-1 calls and
    # the late result must be dropped, not matched retroactively
    _results_df(
        spark, [(3, "ok", d1 + dt.timedelta(hours=3, minutes=1))]
    ).write.mode("append").parquet(results_dir)
    stream_join_call_results(spark, calls_dir, results_dir, out, ckpt)

    got2 = {(r["call_id"], r["status"]) for r in spark.read.parquet(out).collect()}
    assert (3, "ok") not in got2, got2
    # and the earlier matches were not duplicated by the restart
    rows = spark.read.parquet(out).collect()
    assert len(rows) == len({(r["call_id"], r["result_ts"]) for r in rows})
