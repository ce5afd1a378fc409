"""F2's runtime backstop, pinned: AQE skew-join handling actually
fires on a whale key. The explicit salting operators (operators/scale)
are the planned fix; this test proves the claimed AQE fallback is
real — a join against one pathological key gets its skewed partition
split at runtime (the SMJ is marked skew=true in the final adaptive
plan) and the result stays exact."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join_partition(spark):
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        # tiny thresholds so the toy whale registers as skew
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        # whale: 150k rows on ONE conv_id, padded payload; 50 normal keys
        left = spark.range(0, 150_000).select(
            F.when(F.col("id") < 100_000, F.lit("whale"))
            .otherwise((F.col("id") % 50).cast("string"))
            .alias("conv_id"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("payload"),
        )
        right = spark.range(0, 51).select(
            F.when(F.col("id") == 50, F.lit("whale"))
            .otherwise(F.col("id").cast("string"))
            .alias("conv_id"),
            F.col("id").alias("weight"),
        )
        joined = left.join(right.hint("shuffle_merge"), "conv_id")
        # collect() runs THIS DataFrame's own QueryExecution — count()
        # would execute a derived plan and leave this one un-finalized
        n = len(joined.collect())
        assert n == 150_000
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
