"""SURVEY.md §3.3 — the SQL-text serving path: spark.sql over the
extracted_spans / tokens temp views answers the C1–C5 surface, matching
the DataFrame-API forms. Parameters are engine-bound (never spliced), so
hostile values extracted from documents cannot inject SQL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_textract_enhancer_spark.operators.serving import (
    SERVING_SQL,
    c4_fetch_form_value,
    register_serving_views,
    run_serving_query,
)
from amazon_textract_enhancer_spark.stages import extract_spans


@pytest.fixture(scope="module")
def served(spark, transcripts_df):
    spans = extract_spans(transcripts_df).cache()
    register_serving_views(spark, spans)
    return spans


def test_sql_point_lookup(spark, served):
    got = run_serving_query(spark, "point_lookup", conv_id="conv00000003").collect()
    want = served.filter(F.col("conv_id") == "conv00000003").count()
    assert len(got) == want > 0
    assert [r["turn_idx"] for r in got] == sorted(r["turn_idx"] for r in got)


def test_sql_table_and_form_fetch(spark, served):
    row = served.filter(F.size("tables") > 0).select("conv_id", "turn_idx").first()
    got = run_serving_query(
        spark, "table_fetch", conv_id=row["conv_id"], turn_idx=row["turn_idx"]
    ).collect()
    assert len(got) >= 1 and got[0]["csv"]

    kv = served.select("conv_id", F.explode("forms").alias("kv")).first()
    got_kv = run_serving_query(
        spark, "form_fetch", conv_id=kv["conv_id"], key=" " + kv["kv"]["key"].upper() + " "
    ).collect()
    df_kv = c4_fetch_form_value(served, kv["conv_id"], kv["kv"]["key"]).collect()
    assert {(r["key"], r["value"]) for r in got_kv} == {
        (r["key"], r["value"]) for r in df_kv
    }


def test_sql_search_rank(spark, served):
    got = run_serving_query(
        spark, "search_rank", terms=["alpha", "tango", "zulu"], k=5
    ).collect()
    assert 0 < len(got) <= 5
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_sql_skipped_turns(spark, served):
    got = run_serving_query(spark, "skipped_turns").collect()
    want = served.filter(F.col("counters.skipped")).count()
    assert len(got) == want
    assert all(r["skip_reason"] == "empty" for r in got)


def test_sql_injection_hostile_values_are_inert(spark, served):
    """ADVICE r1 (medium): values containing quotes / SQL fragments are
    bound as literals. A hostile form key must neither error nor change
    the query shape — it just matches nothing (or exactly itself)."""
    hostile_key = "x' OR '1'='1"
    got = run_serving_query(
        spark, "form_fetch", conv_id="conv00000003", key=hostile_key
    ).collect()
    assert got == []  # no error, no tautology row-spray

    hostile_conv = "nope'; DROP TABLE extracted_spans; --"
    got2 = run_serving_query(spark, "point_lookup", conv_id=hostile_conv).collect()
    assert got2 == []
    # the view is still there afterwards
    assert spark.sql("SELECT count(*) AS n FROM extracted_spans").collect()[0]["n"] > 0

    hostile_terms = ["alpha", "') OR true; --"]
    got3 = run_serving_query(spark, "search_rank", terms=hostile_terms, k=3).collect()
    assert len(got3) <= 3


def test_sql_templates_have_no_format_placeholders():
    """Regression guard: no str.format splice points remain."""
    for name, sql in SERVING_SQL.items():
        assert "{" not in sql and "}" not in sql, name


def test_term_frequencies_equals_groupby_tokenize(spark, served):
    """The zero-shuffle run-length tf must equal the exploded groupBy
    form exactly (the pipeline's tokens stage runs the former; the
    latter is the obvious spec)."""
    from pyspark.sql import functions as F

    from amazon_textract_enhancer_spark.operators.serving import (
        term_frequencies,
        tokenize,
    )

    fast = {
        (r["conv_id"], r["turn_idx"], r["term"]): r["tf"]
        for r in term_frequencies(
            served, "extracted_text", ["conv_id", "turn_idx"]
        ).collect()
    }
    spec = {
        (r["conv_id"], r["turn_idx"], r["term"]): r["tf"]
        for r in tokenize(served, "extracted_text", ["conv_id", "turn_idx"])
        .groupBy("conv_id", "turn_idx", "term")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
        .collect()
    }
    assert fast == spec and len(fast) > 1000


def test_term_frequencies_is_shuffle_free(spark, served):
    from amazon_textract_enhancer_spark.operators.serving import term_frequencies
    from amazon_textract_enhancer_spark.plans import n_exchanges

    df = term_frequencies(served, "extracted_text", ["conv_id", "turn_idx"])
    assert n_exchanges(df) == 0


def test_doc_lengths_of_equals_tokens_groupby(spark, served):
    """The narrow spans-side dl derivation (pipeline stage 4) must
    equal sum(tf) over the token index exactly, including which turns
    are PRESENT (zero-token turns have no postings and no dl row) —
    the invariant that lets stage 4 skip the full-index re-aggregation
    the 10×-input run measured going superlinear."""
    from pyspark.sql import functions as F

    from amazon_textract_enhancer_spark.operators.serving import (
        doc_lengths_of,
        term_frequencies,
    )

    fast = {
        (r["conv_id"], r["turn_idx"]): r["dl"]
        for r in doc_lengths_of(
            served, "extracted_text", ["conv_id", "turn_idx"]
        ).collect()
    }
    spec = {
        (r["conv_id"], r["turn_idx"]): r["dl"]
        for r in term_frequencies(served, "extracted_text", ["conv_id", "turn_idx"])
        .groupBy("conv_id", "turn_idx")
        .agg(F.sum("tf").cast("long").alias("dl"))
        .collect()
    }
    assert fast == spec and len(fast) > 100


def test_doc_lengths_of_is_shuffle_free(spark, served):
    from amazon_textract_enhancer_spark.operators.serving import doc_lengths_of
    from amazon_textract_enhancer_spark.plans import n_exchanges

    df = doc_lengths_of(served, "extracted_text", ["conv_id", "turn_idx"])
    assert n_exchanges(df) == 0


def test_bm25_indexed_equals_self_contained(spark):
    """c5_search_bm25_indexed over (tokens, doc_lengths, corpus_stats
    scalars) must score identically to c5_search_bm25_topk's in-plan
    derivation — the committed-index serving path may not drift from
    the self-contained registry form. (Docs with zero tokens would be
    absent from the index and shift avgdl; the pipeline's extracted
    corpus always has non-empty extracted_text for non-skipped turns,
    and this fixture mirrors that.)"""
    from amazon_textract_enhancer_spark.operators.serving import (
        TFIDF_TERMS,
        c5_search_bm25_indexed,
        c5_search_bm25_topk,
        term_frequencies,
    )
    import os
    import tempfile

    words = ["spark", "merge", "window", "alpha", "beta", "gamma", "delta"]
    rows = []
    for d in range(60):
        text = " ".join(words[(d * 7 + i * 3) % len(words)]
                        for i in range(d % 9 + 1))
        rows.append((d, text, "en", "web", len(text)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        expected = {
            r["doc_id"]: r["score"]
            for r in c5_search_bm25_topk(spark, td).collect()
        }

    # index tables as pipeline stage 3/4 would commit them, with
    # (conv_id, turn_idx) = (zero-padded doc_id, 0) — padding keeps the
    # string tie-break order equal to the numeric one at the k boundary
    keyed = docs.select(
        F.format_string("%04d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).alias("turn_idx"), "text",
    )
    tokens = term_frequencies(keyed, "text", ["conv_id", "turn_idx"])
    dl = tokens.groupBy("conv_id", "turn_idx").agg(
        F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("a")) \
        .collect()[0]
    got = {
        int(r["conv_id"]): r["score"]
        for r in c5_search_bm25_indexed(
            tokens, dl, stats["n"], stats["a"], TFIDF_TERMS).collect()
    }
    assert got == expected


def test_phrase_search_overlap_and_chain_semantics(spark):
    """phrase_search counts OVERLAPPING occurrences (positional-engine
    semantics) and the join chain generalizes past 2 words; punctuation
    and case fold through the shared tokenizer."""
    from amazon_textract_enhancer_spark.operators.serving import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "a a a"),                 # phrase (a,a): overlaps -> 2
            (2, "x TABLE, hash! y table hash"),  # case/punct fold -> 2
            (3, "table x hash"),          # words present, not adjacent
            (4, "hash table"),            # wrong order
            (5, None),                    # null text never matches
            (6, "big table hash join table hash scan"),  # 3-word chain
        ],
        "doc_id long, text string",
    )
    two = {
        (r["doc_id"], r["n_occurrences"])
        for r in phrase_search(docs, ("table", "hash")).collect()
    }
    assert two == {(2, 2), (6, 2)}
    assert {
        (r["doc_id"], r["n_occurrences"])
        for r in phrase_search(docs, ("a", "a")).collect()
    } == {(1, 2)}
    assert {
        (r["doc_id"], r["n_occurrences"])
        for r in phrase_search(docs, ("table", "hash", "join")).collect()
    } == {(6, 1)}


def test_fuzzy_search_edit_distance_semantics(spark, monkeypatch):
    """SymSpell neighborhood + levenshtein verify: every ed-1 form of
    the query matches (substitution, deletion, insertion, and the
    exact term); ed-2 words never do, even when the delete
    neighborhoods overlap (the 'ab'/'ba' class)."""
    from amazon_textract_enhancer_spark.operators import serving as S

    docs = spark.createDataFrame(
        [
            (1, "vector"),   # insertion: vectr -> vector (ed 1)
            (2, "vectr"),    # exact (ed 0)
            (3, "vetr"),     # deletion: vectr -> vetr (ed 1)
            (4, "vectz"),    # substitution: vectr -> vectz (ed 1)
            (5, "victor"),   # ed 2 — must NOT match
            (6, "tcevr"),    # anagram, ed > 1 — must NOT match
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(S, "t", lambda _s, _d, _n: docs)
    got = {
        (r["term"], r["dist"])
        for r in S.c5_search_fuzzy(spark, "ignored").collect()
    }
    assert got == {("vector", 1), ("vectr", 0), ("vetr", 1), ("vectz", 1)}


def test_fuzzy_search_candidate_selection_is_a_pushed_filter(spark):
    """No join for candidate selection: the query neighborhood is
    plan-time literals, so the plan contains an isin filter and only
    the vocabulary df aggregation exchanges."""
    from amazon_textract_enhancer_spark.operators import serving as S
    from amazon_textract_enhancer_spark.plans import executed_plan

    plan = executed_plan(S.c5_search_fuzzy(spark, "/root/testdata/sf0.01"))
    assert "TakeOrderedAndProject" in plan, plan
    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    assert not joins, joins
