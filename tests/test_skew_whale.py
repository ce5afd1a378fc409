"""M6 skew stress (SURVEY.md §7.3 item 4): a whale conversation must
not serialize the job — extraction stays per-turn parallel, and the
salted rollup spreads the whale over many reducers while producing
results identical to the direct aggregate.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from amazon_textract_enhancer_spark.operators.scale import salted_conv_rollup
from amazon_textract_enhancer_spark.schemas import TRANSCRIPT_SCHEMA
from amazon_textract_enhancer_spark.stages import extract_spans


@pytest.fixture(scope="module")
def whale_df(spark):
    ts0 = dt.datetime(2026, 1, 1)
    rows = []
    # one whale: 10^5 plain turns (SURVEY.md §7.1 M6 stress spec)
    for t in range(100_000):
        rows.append(("whale", t, "user", f"turn text number {t} with words", None, ts0))
    # a handful of normal conversations
    for c in range(10):
        for t in range(20):
            rows.append((f"small{c:02d}", t, "user", f"line a\nline b {c} {t}", None, ts0))
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA).repartition(16).cache()


def test_whale_extraction_is_balanced(spark, whale_df):
    """Extraction parallelism is input-partition parallelism — the whale
    spreads over all 16 partitions even though it is one key."""
    spans = extract_spans(whale_df)
    per_part = (
        spans.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    assert len(per_part) == 16
    counts = [r["count"] for r in per_part]
    assert max(counts) < 2.5 * (sum(counts) / len(counts))  # no straggler


def test_whale_salted_rollup_spreads_and_matches(spark, whale_df):
    spans = extract_spans(whale_df).cache()
    try:
        # salt key distribution: the whale's partial rows land on many salts
        B = 256
        salted = spans.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col("conv_id"), (F.col("turn_idx") / B).cast("long")), F.lit(16)),
        )
        n_salts = (
            salted.filter(F.col("conv_id") == "whale")
            .select("_salt")
            .distinct()
            .count()
        )
        assert n_salts >= 14  # 100k/256 = ~390 blocks over 16 salts

        got = salted_conv_rollup(spans).orderBy("conv_id").collect()
        direct = (
            spans.groupBy("conv_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_turns"),
                F.sum(F.size("tables")).cast("long").alias("n_tables"),
                F.sum(F.size("forms")).cast("long").alias("n_forms"),
                F.sum(F.when(F.col("counters.skipped"), 1).otherwise(0)).cast("long").alias("n_skipped"),
                F.sum(F.length("extracted_text")).cast("long").alias("n_chars"),
            )
            .orderBy("conv_id")
            .collect()
        )
        assert got == direct
        whale_row = [r for r in got if r["conv_id"] == "whale"][0]
        assert whale_row["n_turns"] == 100_000
    finally:
        spans.unpersist()
