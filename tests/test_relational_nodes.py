"""D3/D4 dual-path equality: the Catalyst-planned density classification
over the exploded NODE table (x_nodes_density_relational) reproduces the
fused in-UDF extraction for every html turn — the same rule, expressed
relationally (referenced from extraction_queries.x_nodes_density_relational).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_relational_density_equals_fused(spark):
    from amazon_textract_enhancer_spark.operators.extraction_queries import (
        x_extract_spans,
        x_nodes_density_relational,
    )

    fused = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"]
        for r in x_extract_spans(spark, "").filter(F.col("kind") == "html").collect()
    }
    rel = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"]
        for r in x_nodes_density_relational(spark, "").collect()
    }
    assert len(fused) > 100
    # every html turn with non-empty main content matches exactly;
    # empty-content turns simply don't appear in the relational groupBy
    for key, want in fused.items():
        got = rel.get(key, "")
        assert got == want, key
    # and the relational path invents nothing
    assert set(rel) <= set(fused)


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """The LSH candidate pass (16 hashes, 4x4 bands) recovers every
    >= 0.8 pair the exact shingle-join finds: at j >= 0.8 the
    probability a band matches is 1-(1-j^4)^4 >= 0.93 per band
    structure, and the planted near-dups here are j >= 0.9 — recall
    must be 100% on this corpus, and precision is exact because of the
    verify stage."""
    from amazon_textract_enhancer_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    sf = "/root/testdata/sf0.01"
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, sf).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_minhash_lsh(spark, sf).collect()
    }
    assert len(exact) >= 20
    missed = set(exact) - set(lsh)
    assert not missed, f"LSH missed {missed}"
    # verify stage makes LSH output a subset of the exact >= 0.8 set
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert abs(v - exact[k]) < 1e-9


def test_percentile_sketch_within_rank_error_of_exact(spark):
    """approx_percentile's contract is a RANK error bound: the sketch
    value's rank in the group differs from the target rank by at most
    n/accuracy. Verify the bound per group against the exact sorted
    values — far stronger than a loose value tolerance."""
    from amazon_textract_enhancer_spark.operators.relational import (
        sketch_percentile_approx,
    )

    sf = "/root/testdata/sf0.01"
    approx = {
        r["event_type"]: r
        for r in sketch_percentile_approx(spark, sf).collect()
    }
    vals = {}
    for r in spark.read.parquet(f"{sf}/events.parquet").select(
        "event_type", "value"
    ).collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    assert set(approx) == set(vals)
    for et, xs in vals.items():
        xs.sort()
        n = len(xs)
        # accuracy=1000 -> rank error ~ n/1000; allow 2x plus a floor
        # of 3 for rank-convention off-by-ones at small n
        tol = max(3.0, 2 * n / 1000)
        for col, q in (("median_approx", 0.5), ("p95_approx", 0.95)):
            got = approx[et][col]
            import bisect

            lo = bisect.bisect_left(xs, got)
            hi = bisect.bisect_right(xs, got) - 1
            target = q * (n - 1)
            err = min(abs(lo - target), abs(hi - target))
            assert err <= tol, (et, col, got, err, tol)
