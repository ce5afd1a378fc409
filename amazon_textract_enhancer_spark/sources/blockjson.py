"""A4/A5/B14 — ingest raw Textract-style Block JSON.

The reference's working data is the paginated ``GetDocumentAnalysis``
response (vendor/textract-service-2.json:2193-2225): chunks of up to
1000 Blocks per JobId, concatenated in NextToken order. A user of the
reference holds exactly this JSON in S3; this module turns it into the
engine's exploded ``blocks`` table so the relational B1–B12 operators
(operators/blocks_relational.py) run on it unchanged.

Parsing is ``from_json`` with the explicit response schema — JVM-side,
codegen'd, never inferSchema (SURVEY.md §2.E JSON fns) — followed by a
relational B14: posexplode keeps intra-chunk order, (page_seq, idx)
gives the order-preserving union across chunks, and dropDuplicates on
block id de-overlaps re-fetched pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Textract Block JSON schema (subset we consume; [SVC:1430-1495])
_REL = StructType(
    [
        StructField("Type", StringType()),
        StructField("Ids", ArrayType(StringType())),
    ]
)
RAW_BLOCK_SCHEMA = StructType(
    [
        StructField("Id", StringType()),
        StructField("BlockType", StringType()),
        StructField("Text", StringType()),
        StructField("Confidence", FloatType()),
        StructField("RowIndex", IntegerType()),
        StructField("ColumnIndex", IntegerType()),
        StructField("RowSpan", IntegerType()),
        StructField("ColumnSpan", IntegerType()),
        StructField("EntityTypes", ArrayType(StringType())),
        StructField("SelectionStatus", StringType()),
        StructField("Page", IntegerType()),
        StructField(
            "Geometry",
            StructType(
                [
                    StructField(
                        "BoundingBox",
                        StructType(
                            [
                                StructField("Left", FloatType()),
                                StructField("Top", FloatType()),
                                StructField("Width", FloatType()),
                                StructField("Height", FloatType()),
                            ]
                        ),
                    )
                ]
            ),
        ),
        StructField("Relationships", ArrayType(_REL)),
        StructField(
            "Query",
            StructType(
                [StructField("Text", StringType()), StructField("Alias", StringType())]
            ),
        ),
    ]
)

# One paginated response chunk: {JobStatus, NextToken, Blocks, ...}
RESPONSE_SCHEMA = StructType(
    [
        StructField("JobStatus", StringType()),
        StructField("NextToken", StringType()),
        StructField("Blocks", ArrayType(RAW_BLOCK_SCHEMA)),
    ]
)


def _rel_ids(rel_type: str):
    """Flattened id list of one relationship type, preserving order."""
    return F.flatten(
        F.transform(
            F.filter(F.col("b.Relationships"), lambda r: r["Type"] == F.lit(rel_type)),
            lambda r: r["Ids"],
        )
    )


def parse_response_chunks(chunks: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, page_seq, response_json string) → exploded
    blocks table in BLOCKS_LONG_SCHEMA shape.

    page_seq is the chunk's position in the NextToken walk; the
    order-preserving union (B14) sorts on (page_seq, idx) and keeps the
    first occurrence of each block id.
    """
    parsed = chunks.select(
        "conv_id",
        "turn_idx",
        "page_seq",
        F.from_json("response_json", RESPONSE_SCHEMA).alias("resp"),
    )
    exploded = parsed.select(
        "conv_id",
        "turn_idx",
        "page_seq",
        F.posexplode("resp.Blocks").alias("idx", "b"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id", "turn_idx", F.col("b.Id")).orderBy(
        "page_seq", "idx"
    )
    deduped = (
        exploded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return deduped.select(
        "conv_id",
        "turn_idx",
        F.col("b.Id").alias("id"),
        F.col("b.BlockType").alias("block_type"),
        # QUERY blocks carry the question under Query.Text ([SVC:3036])
        F.coalesce(F.col("b.Query.Text"), F.col("b.Text")).alias("text"),
        F.col("b.Confidence").alias("confidence"),
        F.col("b.RowIndex").alias("row_index"),
        F.col("b.ColumnIndex").alias("column_index"),
        F.col("b.RowSpan").alias("row_span"),
        F.col("b.ColumnSpan").alias("column_span"),
        F.col("b.EntityTypes").alias("entity_types"),
        F.col("b.SelectionStatus").alias("selection_status"),
        F.col("b.Page").alias("page"),
        F.struct(
            F.col("b.Geometry.BoundingBox.Left").alias("left"),
            F.col("b.Geometry.BoundingBox.Top").alias("top"),
            F.col("b.Geometry.BoundingBox.Width").alias("width"),
            F.col("b.Geometry.BoundingBox.Height").alias("height"),
        ).alias("geometry"),
        _rel_ids("CHILD").alias("child_ids"),
        _rel_ids("VALUE").alias("value_ids"),
        _rel_ids("ANSWER").alias("answer_ids"),
        _rel_ids("MERGED_CELL").alias("merged_ids"),
    )


def answers_relational(blocks: DataFrame) -> DataFrame:
    """B11 — QUERY → ANSWER → QUERY_RESULT over the blocks table, with
    the exact single-node semantics of ``core.blocks.answer_queries``
    ([SVC:3036-3056]): ONE row per QUERY block; the answer is the FIRST
    ANSWER id (relationship order) that resolves to a QUERY_RESULT
    block — dangling ids and non-QUERY_RESULT targets are skipped, a
    query none of whose ids resolve keeps its row with ``("", 0.0)``.
    (The previous inner-explode form dropped no-answer queries and
    emitted one row per id — r5 alignment so the ★ twin can value-hash
    this against the pure-Python reference.)

    Plan shape: posexplode_outer keeps empty-relationship queries, the
    result join is an equi-join on (conv, turn, answer_id), and the
    first-resolved pick is one row_number window partitioned by the
    query block id — co-located on a conv_id-bucketed blocks table."""
    from pyspark.sql import Window

    queries = blocks.filter(F.col("block_type") == "QUERY").select(
        "conv_id",
        "turn_idx",
        F.col("page"),
        F.col("id").alias("query_id"),
        F.col("text").alias("question"),
        F.posexplode_outer("answer_ids").alias("aidx", "answer_id"),
    )
    results = blocks.filter(F.col("block_type") == "QUERY_RESULT").select(
        "conv_id",
        "turn_idx",
        F.col("id").alias("answer_id"),
        F.col("text").alias("answer"),
        F.col("confidence").alias("answer_conf"),
        F.lit(1).alias("_resolved"),
    )
    joined = queries.join(
        results, on=["conv_id", "turn_idx", "answer_id"], how="left"
    )
    # First-resolved = first ANSWER id whose join matched a QUERY_RESULT
    # block — keyed on the join marker, NOT on answer text: a resolved
    # result whose Text is null still wins its position (the reference
    # breaks at it and serves ""), so ordering on answer.isNull() would
    # wrongly let a later text-bearing id overtake it.
    w = Window.partitionBy("conv_id", "turn_idx", "query_id").orderBy(
        F.col("_resolved").isNull().cast("int"), F.col("aidx")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "conv_id",
            "turn_idx",
            # reference: int(qb.get("Page") or 1) — null/0 default to 1
            F.when(
                F.col("page").isNull() | (F.col("page") == 0), F.lit(1)
            ).otherwise(F.col("page")).alias("page"),
            "question",
            F.coalesce(F.col("answer"), F.lit("")).alias("answer"),
            F.coalesce(F.col("answer_conf"), F.lit(0.0)).cast("float").alias(
                "confidence"
            ),
        )
    )
