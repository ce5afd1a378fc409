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


# ------------------------------------------------------- z-order layout
#
# Multi-dimensional data clustering for file-level pruning (the Delta
# OPTIMIZE ZORDER BY / Iceberg sort-order analog, built from plain
# expressions + repartitionByRange): interleaving the bits of two
# dimension codes gives every written file a compact z-range, so
# min/max file stats prune scans filtered on EITHER dimension — the
# property a single-column sort only gives its leading column.

ZORDER_BITS = 16


def _bit_interleave_sql(u1: str, u2: str, bits: int = ZORDER_BITS) -> str:
    """SQL expression (valid in BOTH Spark SQL and DuckDB) interleaving
    the low ``bits`` bits of two non-negative int expressions: u1's
    bit b lands at position 2b+1, u2's at 2b (u1 is the major dim)."""
    # every term fully parenthesized: DuckDB/Postgres give << and &
    # LOWER precedence than +, so an unwrapped `x << 3 + y << 5` chain
    # parses as nested shifts and overflows
    terms = []
    for b in range(bits):
        terms.append(f"(((({u1}) >> {b}) & 1) << {2 * b + 1})")
        terms.append(f"(((({u2}) >> {b}) & 1) << {2 * b})")
    return "(" + " + ".join(terms) + ")"


# dimension codes for the documents table: n_chars is order-preserving
# (range predicates prune); lang is categorical, spread over the 16-bit
# space by md5 so equality predicates prune (engine-portable: both
# Spark and DuckDB agree on md5 hex)
_ZORDER_U1 = "least(n_chars, 65535)"
_ZORDER_U2_SPARK = "CAST(conv(substring(md5(lang), 1, 4), 16, 10) AS BIGINT)"
_ZORDER_U2_DUCK = "(('0x' || substr(md5(lang), 1, 4))::BIGINT)"


def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustering key (★) over documents on the
    (n_chars, lang) dimension pair. The key itself is pure codegen —
    32 shift/mask/add terms, no UDF, no shuffle; writers then
    ``repartitionByRange(zkey)`` + sort-within to get z-clustered
    files (see ``zorder_layout`` and test_zorder_layout). The DuckDB
    twin evaluates the identical bit arithmetic, so every interleaved
    bit is value-hash-pinned."""
    z = _bit_interleave_sql(_ZORDER_U1, _ZORDER_U2_SPARK)
    return t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "CAST(least(n_chars, 65535) AS INT) AS u_chars",
        f"CAST({_ZORDER_U2_SPARK} AS INT) AS u_lang",
        f"CAST({z} AS BIGINT) AS zkey",
    )


def zorder_layout(
    df: DataFrame, u1_sql: str, u2_sql: str, n_files: int
) -> DataFrame:
    """Return ``df`` arranged for a z-clustered write: compute the
    interleaved key, range-partition on it into ``n_files`` output
    splits and sort within each — the exact write layout Delta's
    OPTIMIZE ZORDER produces. Cost: one range exchange (sampled
    bounds), no global sort."""
    z = _bit_interleave_sql(u1_sql, u2_sql)
    return (
        df.withColumn("zkey", F.expr(z).cast("long"))
        .repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
    )
