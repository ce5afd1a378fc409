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


def test_fixture_transcripts_distributed_branch(spark, monkeypatch, tmp_path):
    """Above the size threshold, fixture_transcripts must generate
    DISTRIBUTED (per-conv-seeded mapInArrow) and commit via TableIO,
    resuming from the manifest on the second call — no driver-side
    generation. Exercised with a lowered threshold + isolated cache
    root so the real small-sf cache is untouched."""
    from amazon_textract_enhancer_spark.operators import extraction_queries as xq

    monkeypatch.setattr(fc, "CACHE_ROOT", str(tmp_path / "cache"))
    monkeypatch.setattr(xq, "_DISTRIBUTED_GEN_MIN_CONVS", 30)

    df1 = xq.fixture_transcripts(spark, SF_DIR)  # n=40 > 30 → distributed
    n1 = df1.count()
    assert n1 > 300
    assert sorted(df1.columns) == sorted(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    # committed via TableIO: manifest present, second call resumes
    io, snapshot = xq._fixture_io(40)
    assert io.is_committed("transcripts", snapshot, xq._FIXTURE_CFG)

    def boom(*a, **k):
        raise AssertionError("re-generated despite committed manifest")

    monkeypatch.setattr(
        "amazon_textract_enhancer_spark.fixtures"
        ".generate_transcripts_distributed", boom,
    )
    assert xq.fixture_transcripts(spark, SF_DIR).count() == n1
