"""F1 co-location proof: the claim 'bucketing by conv_id makes
downstream per-conv joins shuffle-free' demonstrated with real bucket
metadata — two tables written with Spark's bucketBy join with ZERO
Exchange in the executed plan, vs the plain-parquet twin that must
shuffle both sides."""

from __future__ import annotations

import pyspark.sql.functions as F

from amazon_textract_enhancer_spark.plans import executed_plan


def _two_tables(spark):
    a = spark.range(0, 2000).select(
        (F.col("id") % 97).cast("string").alias("conv_id"),
        F.col("id").alias("turn_idx"),
        (F.col("id") * 7 % 101).alias("score"),
    )
    b = spark.range(0, 500).select(
        (F.col("id") % 97).cast("string").alias("conv_id"),
        (F.col("id") % 13).alias("status"),
    )
    return a, b


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    spark.sql(
        "CREATE DATABASE IF NOT EXISTS bjt "
        f"LOCATION '{tmp_path / 'bjt-warehouse'}'"
    )
    a, b = _two_tables(spark)
    try:
        (
            a.write.bucketBy(8, "conv_id").sortBy("conv_id")
            .mode("overwrite").saveAsTable("bjt.turns")
        )
        (
            b.write.bucketBy(8, "conv_id").sortBy("conv_id")
            .mode("overwrite").saveAsTable("bjt.convs")
        )
        # AQE must not demote the co-located SMJ to broadcast for the
        # proof to be visible at this toy size
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        def _conv_exchanges(plan: str) -> int:
            return sum(
                1
                for ln in plan.splitlines()
                if "Exchange hashpartitioning(conv_id" in ln
            )

        joined = spark.table("bjt.turns").join(
            spark.table("bjt.convs"), "conv_id"
        ).groupBy("status").agg(F.sum("score").alias("s"))
        plan = executed_plan(joined)
        assert _conv_exchanges(plan) == 0, plan

        # twin: identical data as plain parquet — the join MUST shuffle
        # both sides on conv_id
        pa_, pb_ = str(tmp_path / "a"), str(tmp_path / "b")
        a.write.parquet(pa_)
        b.write.parquet(pb_)
        flat = spark.read.parquet(pa_).join(
            spark.read.parquet(pb_), "conv_id"
        ).groupBy("status").agg(F.sum("score").alias("s"))
        fplan = executed_plan(flat)
        assert _conv_exchanges(fplan) == 2, fplan

        # same answer both ways
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, flat.collect())
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bjt.turns")
        spark.sql("DROP TABLE IF EXISTS bjt.convs")
        spark.sql("DROP DATABASE IF EXISTS bjt")
