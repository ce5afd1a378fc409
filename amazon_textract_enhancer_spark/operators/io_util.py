"""Shared table loader for the driver testdata parquet tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table; declarative so Catalyst pushes filters
    and prunes columns into the parquet scan."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def t_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table and, WHEN the file is too small to give
    the scan one split per core, round-robin it to the session's
    default parallelism (r6, guide §2.6/§6).

    Why: the fixture tables are single-row-group parquet files, so any
    scan-rooted map stage — shingling, per-row md5 witnesses, the d²
    covariance Generate — ran as ONE task with every other core idle
    (measured: embed_covariance 3.2s → 1.4s, ann_lsh_portable 2.1s →
    1.5s just from spreading). The condition is data-adaptive, not a
    local[32] constant: estimated scan splits = file bytes /
    spark.sql.files.maxPartitionBytes; at production sizes the
    estimate exceeds the core count, the condition is false and the
    plan is EXACTLY ``t()`` — no repartition, no cost. Only
    map-side-heavy consumers opt in (an extra exchange is pure
    overhead for cheap scans feeding an immediate aggregation)."""
    import os

    df = t(spark, sf_dir, name)
    sc = spark.sparkContext
    try:
        nbytes = os.path.getsize(f"{sf_dir}/{name}.parquet")
    except OSError:
        return df
    try:
        max_pb = int(
            spark._jvm.org.apache.spark.util.Utils.byteStringAsBytes(
                spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
            )
        )
    except Exception:
        max_pb = 128 * 1024 * 1024
    est_splits = max(1, nbytes // max_pb)
    if est_splits < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def parquet_row_count(sf_dir: str, name: str) -> int:
    """Row count of a testdata table from parquet FOOTER metadata only
    (pyarrow, no Spark job, no data pages read) — the in-sandbox
    stand-in for a committed stats table / TableIO manifest row count.
    Operators that only need the corpus size's order of magnitude
    (e.g. ``ann_lsh_bucketed``'s plane-count derivation) read this
    instead of running an ``emb.count()`` full-scan job per query call
    (ADVICE r4): at 10^12 indexed rows the footers of the current
    snapshot are exactly what an Iceberg ``snapshot.summary`` /
    manifest ``record_count`` serves for free."""
    import pyarrow.dataset as ds

    return ds.dataset(f"{sf_dir}/{name}.parquet", format="parquet").count_rows()
