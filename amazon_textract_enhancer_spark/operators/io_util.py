"""Shared table loader for the driver testdata parquet tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table; declarative so Catalyst pushes filters
    and prunes columns into the parquet scan."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
