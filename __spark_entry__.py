"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``amazon_textract_enhancer_spark``; this module
only adapts it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.1 M1): extracted main-content text +
    table/form counts per turn, stable (conv_id, turn_idx) order, over
    /root/testdata/sf0.001 ``documents`` treated as 1-turn conversations.
    """
    from pyspark.sql import functions as F

    from amazon_textract_enhancer_spark.stages import extract_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    transcripts = docs.select(
        F.concat(F.lit("doc"), F.format_string("%08d", F.col("doc_id"))).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("text"),
    )
    spans = extract_spans(transcripts)
    return spans.select(
        "conv_id",
        "turn_idx",
        "kind",
        "extracted_text",
        F.size("tables").alias("n_tables"),
        F.size("forms").alias("n_forms"),
        F.col("counters.skipped").alias("skipped"),
    ).orderBy("conv_id", "turn_idx")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Aliases match oracle_sql() column names exactly.
    """
    from amazon_textract_enhancer_spark.operators.registry import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every SQL-expressible query.

    Keys missing here (relative to queries()) are the genuinely
    non-SQL-expressible ✂ operators (MinHash LSH, SimHash, plane-hash
    ANN, difflib turn dedup…) — the driver records rows-only checks for
    those. The x_* twins read the pure-Python reference-extraction
    cache, which this function materializes (idempotent, ~2 s once)
    before returning the SQL, so the twins are runnable regardless of
    whether the Spark side has executed yet.
    """
    from amazon_textract_enhancer_spark.fixture_cache import ensure_fixture_cache
    from amazon_textract_enhancer_spark.operators.registry import ORACLE_SQL, _XN_SF001

    ensure_fixture_cache(_XN_SF001)
    return dict(ORACLE_SQL)
