"""SURVEY.md §3.3 — the SQL-text serving path: spark.sql over the
extracted_spans / tokens temp views answers the C1–C5 surface, matching
the DataFrame-API forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_textract_enhancer_spark.operators.serving import (
    SERVING_SQL,
    c4_fetch_form_value,
    register_serving_views,
)
from amazon_textract_enhancer_spark.stages import extract_spans


@pytest.fixture(scope="module")
def served(spark, transcripts_df):
    spans = extract_spans(transcripts_df).cache()
    register_serving_views(spark, spans)
    return spans


def test_sql_point_lookup(spark, served):
    got = spark.sql(SERVING_SQL["point_lookup"].format(conv_id="conv00000003")).collect()
    want = served.filter(F.col("conv_id") == "conv00000003").count()
    assert len(got) == want > 0
    assert [r["turn_idx"] for r in got] == sorted(r["turn_idx"] for r in got)


def test_sql_table_and_form_fetch(spark, served):
    row = served.filter(F.size("tables") > 0).select("conv_id", "turn_idx").first()
    got = spark.sql(
        SERVING_SQL["table_fetch"].format(conv_id=row["conv_id"], turn_idx=row["turn_idx"])
    ).collect()
    assert len(got) >= 1 and got[0]["csv"]

    kv = served.select("conv_id", F.explode("forms").alias("kv")).first()
    got_kv = spark.sql(
        SERVING_SQL["form_fetch"].format(
            conv_id=kv["conv_id"], key=" " + kv["kv"]["key"].upper() + " "
        )
    ).collect()
    df_kv = c4_fetch_form_value(served, kv["conv_id"], kv["kv"]["key"]).collect()
    assert {(r["key"], r["value"]) for r in got_kv} == {
        (r["key"], r["value"]) for r in df_kv
    }


def test_sql_search_rank(spark, served):
    got = spark.sql(
        SERVING_SQL["search_rank"].format(terms="'alpha','tango','zulu'", k=5)
    ).collect()
    assert 0 < len(got) <= 5
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_sql_skipped_turns(spark, served):
    got = spark.sql(SERVING_SQL["skipped_turns"]).collect()
    want = served.filter(F.col("counters.skipped")).count()
    assert len(got) == want
    assert all(r["skip_reason"] == "empty" for r in got)
