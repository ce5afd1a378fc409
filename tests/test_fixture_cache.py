"""The committed fixture corpus (round 3): pure-Python cache
determinism/idempotence, and TableIO resume for the Spark-committed
extraction tables (VERDICT r2 item 4)."""

from __future__ import annotations

import os

from amazon_textract_enhancer_spark import fixture_cache as fc

SF_DIR = "/root/testdata/sf0.01"  # → n_convs 40


def test_cache_idempotent_and_deterministic():
    d = fc.ensure_fixture_cache(40)
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    stamps = {f: os.path.getmtime(os.path.join(d, f))
              for f in ("transcripts.parquet", "spans.parquet",
                        "blocks.parquet", "nodes.parquet")}
    # second call is a no-op: no file is rewritten
    assert fc.ensure_fixture_cache(40) == d
    for f, m in stamps.items():
        assert os.path.getmtime(os.path.join(d, f)) == m, f


def test_cache_content_matches_oracle_extraction():
    """spans.parquet must BE the single-node-oracle output for the
    seed-42 corpus — the independence of the DuckDB twins rests on
    this file never being produced by Spark."""
    import pyarrow.parquet as pq

    from amazon_textract_enhancer_spark.fixtures import generate_transcripts
    from amazon_textract_enhancer_spark.oracle import extract_rows

    d = fc.ensure_fixture_cache(40)
    rows, _ = generate_transcripts(seed=fc.SEED, n_convs=40,
                                   whale_cap=fc.WHALE_CAP)
    want = extract_rows(rows)
    got = pq.read_table(os.path.join(d, "spans.parquet")).to_pylist()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["conv_id"], g["turn_idx"]) == (w["conv_id"], w["turn_idx"])
        assert g["extracted_text"] == w["extracted_text"]
        assert g["kind"] == w["kind"]
        assert len(g["tables"]) == len(w["tables"])


def test_committed_spans_resume_no_reextraction(spark, monkeypatch):
    """The second fixture_spans call for the same (seed, sf) must hit
    the TableIO manifest and NEVER re-run the extraction stage."""
    from amazon_textract_enhancer_spark.operators import extraction_queries as xq

    n1 = xq.fixture_spans(spark, SF_DIR).count()  # ensures the commit

    def boom(*a, **k):
        raise AssertionError("extract stage re-ran despite committed manifest")

    monkeypatch.setattr(
        "amazon_textract_enhancer_spark.operators.extraction_queries.extract_spans",
        boom,
    )
    n2 = xq.fixture_spans(spark, SF_DIR).count()
    assert n1 == n2 == 900
