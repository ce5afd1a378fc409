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


def test_cold_start_with_preexisting_warehouse(spark, monkeypatch, tmp_path):
    """VERDICT r3 item 1: on a clean tree, TableIO used to eagerly
    create ``cache_dir(n)/warehouse`` BEFORE the pure-Python cache
    published, and the whole-dir os.replace then crashed with
    ENOTEMPTY. The per-file publish + ensure-before-TableIO order must
    make the flagship query green from a completely cold cache root,
    even with warehouse/ pre-created."""
    from amazon_textract_enhancer_spark.operators import extraction_queries as xq

    monkeypatch.setattr(fc, "CACHE_ROOT", str(tmp_path / "cache"))
    # the historical trigger: warehouse dir already inside the cache dir
    os.makedirs(os.path.join(fc.cache_dir(8), "warehouse"))

    out = xq.x_extract_spans(spark, "/root/testdata/sf0.002")  # n=8
    assert out.count() > 0
    assert os.path.exists(os.path.join(fc.cache_dir(8), "_SUCCESS"))
    # the pre-existing warehouse dir (now holding committed tables)
    # survived publication
    assert os.path.isdir(os.path.join(fc.cache_dir(8), "warehouse"))


def test_cold_start_after_rm_rf(spark, monkeypatch, tmp_path):
    """rm -rf of the cache dir (the gitignored state of any clean
    clone) followed by a first x_* call must rebuild and pass."""
    import shutil

    from amazon_textract_enhancer_spark.operators import extraction_queries as xq

    monkeypatch.setattr(fc, "CACHE_ROOT", str(tmp_path / "cache"))
    n1 = xq.x_extract_spans(spark, "/root/testdata/sf0.002").count()
    shutil.rmtree(fc.cache_dir(8))
    n2 = xq.x_extract_spans(spark, "/root/testdata/sf0.002").count()
    assert n1 == n2 > 0


def test_orphan_tmp_reaped_fresh_tmp_kept(monkeypatch, tmp_path):
    """Crashed-writer tmp dirs (mtime before this process imported the
    module) are reaped at ensure entry; a live writer's tmp (recent
    mtime) is left alone."""
    monkeypatch.setattr(fc, "CACHE_ROOT", str(tmp_path / "cache"))
    d = fc.cache_dir(8)
    os.makedirs(os.path.dirname(d), exist_ok=True)
    stale = d + ".tmp-deadbeefcafe"
    fresh = d + ".tmp-0123456789ab"
    os.makedirs(stale)
    os.makedirs(fresh)
    old = fc._IMPORT_TIME - 3600
    os.utime(stale, (old, old))

    fc.ensure_fixture_cache(8)
    assert not os.path.exists(stale), "crashed-writer tmp not reaped"
    assert os.path.exists(fresh), "live-writer tmp wrongly reaped"
    assert os.path.exists(os.path.join(d, "_SUCCESS"))


def test_publish_survives_preexisting_destination(monkeypatch, tmp_path):
    """ensure_fixture_cache with a pre-existing, _SUCCESS-less
    destination dir (stray files inside) publishes per-file and leaves
    the stray content untouched."""
    monkeypatch.setattr(fc, "CACHE_ROOT", str(tmp_path / "cache"))
    d = fc.cache_dir(8)
    os.makedirs(os.path.join(d, "warehouse", "some_table"))
    with open(os.path.join(d, "warehouse", "some_table", "x"), "w") as f:
        f.write("keep me")

    out = fc.ensure_fixture_cache(8)
    assert out == d
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    assert os.path.exists(os.path.join(d, "transcripts.parquet"))
    with open(os.path.join(d, "warehouse", "some_table", "x")) as f:
        assert f.read() == "keep me"
    # no tmp leftovers after a clean publish
    leftovers = [p for p in os.listdir(os.path.dirname(d))
                 if p.startswith(os.path.basename(d) + ".tmp-")]
    assert leftovers == []


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
