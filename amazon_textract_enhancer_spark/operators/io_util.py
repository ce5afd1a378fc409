"""Shared table loader for the driver testdata parquet tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table; declarative so Catalyst pushes filters
    and prunes columns into the parquet scan."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
