"""F2 — explicit skew salting (SURVEY.md §2.F), demanded by
BASELINE.json:14 beyond the AQE backstop.

Pattern: per-row salt = pmod(xxhash64(fine-grained key), S); partial
aggregate per (group, salt); final aggregate per group. Result is
provably identical to the unsalted aggregate (tested + oracle-checked);
the win at 10^12 turns is that a whale conversation's partial rows fan
out over S reducers instead of serializing one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io_util import t

N_SALTS = 16


def salted_partial_final(
    df: DataFrame,
    group_cols: list[str],
    salt_cols: list[str],
    aggs_partial: list,
    aggs_final: list,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Generic two-phase salted aggregation."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    )
    partial = salted.groupBy(*group_cols, "_salt").agg(*aggs_partial)
    return partial.groupBy(*group_cols).agg(*aggs_final)


def f2_salted_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted supplier rollup over lineitem: identical result to the
    plain GROUP BY (the DuckDB oracle runs the unsalted form)."""
    li = t(spark, sf_dir, "lineitem")
    partial = [
        F.sum("l_quantity").alias("_sum_qty"),
        F.count(F.lit(1)).alias("_n"),
    ]
    final = [
        F.sum("_sum_qty").alias("sum_qty"),
        F.sum("_n").cast("long").alias("n"),
    ]
    return salted_partial_final(
        li,
        group_cols=["l_suppkey"],
        salt_cols=["l_orderkey", "l_linenumber"],
        aggs_partial=partial,
        aggs_final=final,
    )


def salted_conv_rollup(spans: DataFrame, n_salts: int = N_SALTS) -> DataFrame:
    """Conversation-level rollup of extracted_spans with whale-conv
    salting: partial per (conv_id, salt-of-turn-range), final per
    conv_id (SURVEY.md §2.F F2: salt = hash(conv_id, turn_idx // B))."""
    B = 256  # turn-range block per salt unit
    salted = spans.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.col("conv_id"), (F.col("turn_idx") / B).cast("long")),
            F.lit(n_salts),
        ),
    )
    partial = salted.groupBy("conv_id", "_salt").agg(
        F.count(F.lit(1)).alias("_n_turns"),
        F.sum(F.size("tables")).alias("_n_tables"),
        F.sum(F.size("forms")).alias("_n_forms"),
        F.sum(F.when(F.col("counters.skipped"), 1).otherwise(0)).alias("_n_skipped"),
        F.sum(F.length("extracted_text")).alias("_n_chars"),
    )
    return partial.groupBy("conv_id").agg(
        F.sum("_n_turns").cast("long").alias("n_turns"),
        F.sum("_n_tables").cast("long").alias("n_tables"),
        F.sum("_n_forms").cast("long").alias("n_forms"),
        F.sum("_n_skipped").cast("long").alias("n_skipped"),
        F.sum("_n_chars").cast("long").alias("n_chars"),
    )
