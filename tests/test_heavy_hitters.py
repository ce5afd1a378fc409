"""Two-pass Misra-Gries heavy-hitter census (textstats.heavy_hitters):
the candidate pass must be a strict SUPERSET of the true heavy hitters
under ANY partitioning (the MG guarantee), the exact pass must produce
brute-force counts, and the exact pass must broadcast-semi-join so
non-candidates never reach an exchange.

The registry twin (`text_heavy_hitters` ★) pins Spark == DuckDB
brute force at fixture scale via the oracle-parity sweep; this file
pins the algorithm where the twin can't see it — a corpus whose
distinct-n-gram count (752) dwarfs the summary capacity (8), so the
MG decrement path actually runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_textract_enhancer_spark.operators.textstats import heavy_hitters
from amazon_textract_enhancer_spark.plans import executed_plan, n_broadcast_joins


def _skewed_docs(spark):
    """150x 'x y z' + 120x 'a b c' + 750 unique tail trigrams.
    N = 1020 grams; with capacity=8 the MG bound is N/9 ~ 113.3, so
    min_count=120 keeps the no-false-negative guarantee while the
    summary is ~94x smaller than the distinct count."""
    rows = [(i, "x y z") for i in range(150)]
    rows += [(1000 + i, "a b c") for i in range(120)]
    rows += [(2000 + i, f"u{i} v{i} w{i}") for i in range(750)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_small_capacity_still_finds_all_heavy_hitters(spark):
    docs = _skewed_docs(spark)
    got = {
        (r["ngram"], r["cnt"])
        for r in heavy_hitters(
            docs, min_count=120, capacity=8, total_grams=1020
        ).collect()
    }
    assert got == {("x y z", 150), ("a b c", 120)}


def test_result_is_partitioning_independent(spark):
    docs = _skewed_docs(spark)
    expect = {("x y z", 150), ("a b c", 120)}
    for df in (
        docs.repartition(1),
        docs.repartition(7, "doc_id"),
        # adversarial: the hot trigrams land in hot partitions, the
        # tail floods the rest — MG summaries differ per layout, the
        # OUTPUT must not
        docs.repartition(16, F.col("text")),
    ):
        got = {
            (r["ngram"], r["cnt"])
            for r in heavy_hitters(df, min_count=120, capacity=8).collect()
        }
        assert got == expect


def test_guarantee_violation_raises(spark):
    docs = _skewed_docs(spark)
    # min_count=50 <= N/(capacity+1)=113.3: a 50-count n-gram could be
    # decremented away in every partition — refuse, don't under-report
    with pytest.raises(ValueError, match="MG guarantee"):
        heavy_hitters(docs, min_count=50, capacity=8, total_grams=1020)


def test_counts_are_exact_not_mg_estimates(spark):
    """The exact pass must report brute-force counts: MG counters are
    lower bounds after decrements, so if the operator leaked pass-1
    estimates the hot counts here (capacity 8, heavy tail) would come
    out low."""
    docs = _skewed_docs(spark)
    brute = {
        (r["ngram"], r["cnt"])
        for r in (
            docs.select(
                F.explode(
                    F.transform(
                        F.sequence(
                            F.lit(1),
                            F.size(F.split(F.lower("text"), "[^a-z0-9]+")) - 2,
                        ),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(F.split(F.lower("text"), "[^a-z0-9]+"), i),
                            F.element_at(
                                F.split(F.lower("text"), "[^a-z0-9]+"), i + 1
                            ),
                            F.element_at(
                                F.split(F.lower("text"), "[^a-z0-9]+"), i + 2
                            ),
                        ),
                    )
                ).alias("ngram")
            )
            .groupBy("ngram")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .filter(F.col("cnt") >= 120)
            .collect()
        )
    }
    got = {
        (r["ngram"], r["cnt"])
        for r in heavy_hitters(docs, min_count=120, capacity=8).collect()
    }
    assert got == brute


def test_exact_pass_broadcasts_candidates(spark):
    """Plan shape: the candidate set joins as a BROADCAST semi-join
    (map-side filter) — a shuffle join here would repartition the full
    n-gram stream and forfeit the operator's entire point."""
    df = heavy_hitters(_skewed_docs(spark), min_count=120, capacity=8)
    plan = executed_plan(df)
    assert n_broadcast_joins(df) >= 1, plan
    assert "LeftSemi" in plan, plan


def test_registry_form_checks_the_mg_bound_from_corpus_stats(spark):
    """ADVICE r5: the registry form must pass the corpus gram count so
    the Misra-Gries no-false-negative precondition is CHECKED, not
    trusted. Pins (a) documents_total_grams == the brute-force gram
    count over the same split, (b) the memo caches (second call does
    not recount), (c) a capacity too small for that N raises through
    the same derived count."""
    from amazon_textract_enhancer_spark.operators.io_util import t
    from amazon_textract_enhancer_spark.operators.textstats import (
        _TOTAL_GRAMS_CACHE,
        HH_NGRAM_K,
        documents_total_grams,
        text_heavy_hitters,
    )
    from amazon_textract_enhancer_spark.operators.serving import TOKEN_PATTERN

    sf = "/root/testdata/sf0.01"
    _TOTAL_GRAMS_CACHE.clear()
    n = documents_total_grams(spark, sf)
    L = F.split(F.lower(F.col("text")), TOKEN_PATTERN)
    brute = (
        t(spark, sf, "documents")
        .select(F.greatest(F.size(L) - (HH_NGRAM_K - 1), F.lit(0)).alias("g"))
        .agg(F.sum("g").alias("n"))
        .collect()[0]["n"]
    )
    assert n == brute and n > 0
    # memoized as ONE (stamp, n) entry per (sf_dir, k) — r5 review: the
    # stamp invalidates the memo if the table is regenerated in place,
    # and superseded stamps are overwritten, not accumulated
    assert _TOTAL_GRAMS_CACHE[(sf, HH_NGRAM_K)][1] == n
    assert documents_total_grams(spark, sf) == n
    # ADVICE r5: assert on THIS (sf, k) entry, not the global cache
    # size — another test may have populated a different key first
    assert (sf, HH_NGRAM_K) in _TOTAL_GRAMS_CACHE
    # a changed stamp misses and recomputes (stale-N hole closed even
    # when the entry predates the change)
    _TOTAL_GRAMS_CACHE[(sf, HH_NGRAM_K)] = ((0, 0), 12345)
    assert documents_total_grams(spark, sf) == n
    assert _TOTAL_GRAMS_CACHE[(sf, HH_NGRAM_K)][1] == n
    # the ★ query itself runs green with the guard armed
    assert text_heavy_hitters(spark, sf).count() >= 0
    # and the guard actually fires when the bound is violated
    from amazon_textract_enhancer_spark.operators.textstats import heavy_hitters

    with pytest.raises(ValueError, match="MG guarantee"):
        heavy_hitters(
            t(spark, sf, "documents"), min_count=1, capacity=8, total_grams=n
        )
