"""Grouped-map applyInPandas operator: within-conversation consecutive
near-duplicate turn flagging (the per-group-sequential shape SQL can't
express)."""

from __future__ import annotations

import datetime as dt

from amazon_textract_enhancer_spark.operators.dedup import turn_dedup_within_conv
from amazon_textract_enhancer_spark.schemas import TRANSCRIPT_SCHEMA
from amazon_textract_enhancer_spark.stages import extract_spans


def test_consecutive_near_dup_turns_flagged(spark):
    ts = dt.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", "the quick brown fox jumps over the lazy dog today", None, ts),
        ("c1", 1, "user", "the quick brown fox jumps over the lazy dog todays", None, ts),  # near-dup
        ("c1", 2, "user", "completely different content about sparkling engines", None, ts),
        ("c2", 0, "user", "alpha beta gamma delta epsilon zeta eta theta", None, ts),
        ("c2", 1, "user", "zzz yyy xxx www vvv uuu ttt sss", None, ts),
    ]
    spans = extract_spans(spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA))
    out = {
        (r["conv_id"], r["turn_idx"]): (r["dup_of_prev"], r["sim"])
        for r in turn_dedup_within_conv(spans).collect()
    }
    assert out[("c1", 0)][0] is False
    assert out[("c1", 1)][0] is True and out[("c1", 1)][1] > 0.9
    assert out[("c1", 2)][0] is False
    assert out[("c2", 1)][0] is False
    # first turn of each conversation never flagged
    assert out[("c2", 0)] == (False, 0.0)


def test_grouped_map_on_fixture_is_deterministic(spark, transcripts_df):
    spans = extract_spans(transcripts_df)
    a = turn_dedup_within_conv(spans).orderBy("conv_id", "turn_idx").collect()
    b = turn_dedup_within_conv(spans).orderBy("conv_id", "turn_idx").collect()
    assert a == b
    assert len(a) == transcripts_df.count()
