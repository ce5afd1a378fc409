"""Snapshot time travel / rollback / expiry on TableIO — the Iceberg
``VERSION AS OF`` / ``rollback_to_snapshot`` / ``expire_snapshots``
analog (SURVEY.md §2.F F3), emulated on the same atomic-rename commit
protocol the pipeline uses.

Retention semantics under test:
- retain_snapshots=0 (the pipeline default) keeps exactly the current
  snapshot — byte-for-byte the pre-r4 behavior.
- retain_snapshots=k keeps the k newest superseded data dirs readable
  by snapshot_seq; older ones expire but stay in the log, flagged.
- rollback_to restores a retained snapshot as current, including its
  manifest (so is_committed/resume answers for the restored input).
"""

from __future__ import annotations

import os

import pytest

from amazon_textract_enhancer_spark.sources.tableio import TableIO


def _commit(io, spark, name, values, snap_label):
    df = spark.createDataFrame([(v,) for v in values], "v int")
    return io.commit_stage(df, name, input_snapshot=snap_label)


def _read_vals(io, spark, name, as_of=None):
    return sorted(
        r["v"] for r in io.read_table(spark, name, as_of=as_of).collect()
    )


def test_retention_zero_matches_old_behavior(spark, tmp_path):
    io = TableIO(str(tmp_path / "wh"))
    m1 = _commit(io, spark, "t", [1, 2], "s1")
    m2 = _commit(io, spark, "t", [3, 4], "s2")
    assert (m1["snapshot_seq"], m2["snapshot_seq"]) == (1, 2)
    assert _read_vals(io, spark, "t") == [3, 4]
    # no snap dirs on disk; old snapshot unreadable with a clear error
    tdir = io.table_path("t")
    assert not [d for d in os.listdir(tdir) if d.startswith("snap-")]
    with pytest.raises(ValueError, match="expired or unknown"):
        io.read_table(spark, "t", as_of=1)
    # current seq IS addressable as_of (reads data/)
    assert _read_vals(io, spark, "t", as_of=2) == [3, 4]
    # log keeps full history even at retention 0
    log = io.read_snaplog("t")
    assert [e["snapshot_seq"] for e in log] == [1, 2]
    assert log[0].get("expired") is True


def test_time_travel_reads_superseded_snapshot(spark, tmp_path):
    io = TableIO(str(tmp_path / "wh"), retain_snapshots=2)
    _commit(io, spark, "t", [1], "s1")
    _commit(io, spark, "t", [2, 2], "s2")
    _commit(io, spark, "t", [3, 3, 3], "s3")
    assert _read_vals(io, spark, "t") == [3, 3, 3]
    assert _read_vals(io, spark, "t", as_of=1) == [1]
    assert _read_vals(io, spark, "t", as_of=2) == [2, 2]
    # a 4th commit expires seq 1 (keep 2: seqs 2,3 retained)
    _commit(io, spark, "t", [4], "s4")
    with pytest.raises(ValueError, match="expired or unknown"):
        io.read_table(spark, "t", as_of=1)
    assert _read_vals(io, spark, "t", as_of=2) == [2, 2]
    assert _read_vals(io, spark, "t", as_of=3) == [3, 3, 3]
    log = io.read_snaplog("t")
    assert [e["snapshot_seq"] for e in log] == [1, 2, 3, 4]
    assert [e["snapshot_seq"] for e in log if e.get("expired")] == [1]


def test_rollback_restores_data_and_resume_identity(spark, tmp_path):
    io = TableIO(str(tmp_path / "wh"), retain_snapshots=2)
    _commit(io, spark, "t", [1], "s1")
    _commit(io, spark, "t", [2], "s2")
    m = io.rollback_to("t", 1)
    assert m["snapshot_seq"] == 1 and m["input_snapshot"] == "s1"
    assert _read_vals(io, spark, "t") == [1]
    # resume semantics follow the restored manifest
    assert io.is_committed("t", "s1", "v1")
    assert not io.is_committed("t", "s2", "v1")
    # the replaced current became a retained snapshot — roll forward works
    assert _read_vals(io, spark, "t", as_of=2) == [2]
    io.rollback_to("t", 2)
    assert _read_vals(io, spark, "t") == [2]
    # a fresh commit after rollback gets a NEW head seq (log max + 1)
    m3 = _commit(io, spark, "t", [9], "s3")
    assert m3["snapshot_seq"] == 3
    assert _read_vals(io, spark, "t", as_of=2) == [2]


def test_rollback_to_current_is_noop_and_unknown_raises(spark, tmp_path):
    io = TableIO(str(tmp_path / "wh"), retain_snapshots=1)
    _commit(io, spark, "t", [1], "s1")
    assert io.rollback_to("t", 1)["snapshot_seq"] == 1
    with pytest.raises(ValueError):
        io.rollback_to("t", 7)


def test_explicit_expire_and_audit_trail(spark, tmp_path):
    io = TableIO(str(tmp_path / "wh"), retain_snapshots=5)
    for i, label in enumerate(["s1", "s2", "s3"], start=1):
        _commit(io, spark, "t", [i], label)
    assert io.expire_snapshots("t", keep=1) == [1]
    with pytest.raises(ValueError):
        io.read_table(spark, "t", as_of=1)
    assert _read_vals(io, spark, "t", as_of=2) == [2]
    # expired entries stay in the log for lineage audit
    assert [e["snapshot_seq"] for e in io.read_snaplog("t")] == [1, 2, 3]


# ------------------------------------------- metadata-only counts (r4)


def test_fast_count_serves_from_manifest(spark, tmp_path):
    """count(*) and lineage-counter totals answered from the manifest
    with zero data reads — and they match the scan-derived truth."""
    io = TableIO(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(37)], "k int, amount int"
    )
    io.commit_stage(df, "t", input_snapshot="s1", counter_cols=["amount"],
                    bucket_col="k", n_buckets=4)
    assert io.fast_count("t") == 37
    assert io.fast_counter_sum("t", "amount") == sum(i * 10 for i in range(37))
    assert io.fast_count("t") == io.read_table(spark, "t").count()
    # uncommitted table and unknown counter both fail loudly
    with pytest.raises(ValueError, match="no committed manifest"):
        io.fast_count("nope")
    with pytest.raises(ValueError, match="not recorded"):
        io.fast_counter_sum("t", "missing_col")


# ------------------------------------------- partition evolution (r4)


def test_rebucket_preserves_content_and_updates_layout(spark, tmp_path):
    io = TableIO(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(f"c{i % 5}", i) for i in range(40)], "conv_id string, v int"
    )
    m1 = io.commit_stage(df, "t", input_snapshot="s1",
                         bucket_col="conv_id", n_buckets=2)
    before = sorted((r["conv_id"], r["v"])
                    for r in io.read_table(spark, "t").collect())
    m2 = io.rebucket(spark, "t", 8)
    assert m2["n_buckets"] == 8 and m2["bucket_col"] == "conv_id"
    assert m2["snapshot_seq"] == m1["snapshot_seq"] + 1
    after = sorted((r["conv_id"], r["v"])
                   for r in io.read_table(spark, "t").collect())
    assert after == before
    assert io.fast_count("t") == 40
    # resume semantics: same layout request is a no-op
    m3 = io.rebucket(spark, "t", 8)
    assert m3["snapshot_seq"] == m2["snapshot_seq"]


def test_rebucket_refuses_non_hash_layouts(spark, tmp_path):
    io = TableIO(str(tmp_path / "wh"))
    df = spark.createDataFrame([(i, i) for i in range(10)], "k int, v int")
    io.commit_stage(df, "r", input_snapshot="s1", range_col="k", n_buckets=2)
    with pytest.raises(ValueError, match="not hash-bucketed"):
        io.rebucket(spark, "r", 4)
    with pytest.raises(ValueError, match="no committed manifest"):
        io.rebucket(spark, "absent", 4)


# ------------------------------------------------------ schema evolution


def test_evolve_add_column_is_metadata_only(spark, tmp_path):
    """ADD COLUMN rewrites no data file; readers see the typed default
    everywhere the files lack the column."""
    io = TableIO(str(tmp_path / "wh"))
    _commit(io, spark, "t", [1, 2], "s1")
    data_dir = io.data_path("t")
    before = {
        f: os.path.getmtime(os.path.join(data_dir, f))
        for f in os.listdir(data_dir)
    }
    io.evolve_add_column("t", "quality", "double", default=0.5)
    after = {
        f: os.path.getmtime(os.path.join(data_dir, f))
        for f in os.listdir(data_dir)
    }
    assert before == after  # zero data files touched
    got = io.read_table(spark, "t")
    assert got.schema["quality"].dataType.typeName() == "double"
    assert sorted((r["v"], r["quality"]) for r in got.collect()) == [
        (1, 0.5),
        (2, 0.5),
    ]
    # metadata ops still metadata-only
    assert io.fast_count("t") == 2


def test_evolved_column_survives_recommit_and_time_travel(spark, tmp_path):
    """A later physical write of the column wins over the default; the
    evolution entry carries forward so retained OLD snapshots (which
    physically lack the column) still read through the current schema;
    duplicate evolution is rejected."""
    import pytest as _pytest

    io = TableIO(str(tmp_path / "wh"), retain_snapshots=2)
    _commit(io, spark, "t", [1, 2], "s1")
    io.evolve_add_column("t", "quality", "double", default=0.5)
    df2 = spark.createDataFrame([(3, 0.9), (4, 0.1)], "v int, quality double")
    io.commit_stage(df2, "t", input_snapshot="s2")
    # current snapshot: physical values, not the default
    cur = sorted((r["v"], r["quality"]) for r in
                 io.read_table(spark, "t").collect())
    assert cur == [(3, 0.9), (4, 0.1)]
    # time travel to the pre-evolution snapshot: default projected in
    old = sorted((r["v"], r["quality"]) for r in
                 io.read_table(spark, "t", as_of=1).collect())
    assert old == [(1, 0.5), (2, 0.5)]
    with _pytest.raises(ValueError, match="already added"):
        io.evolve_add_column("t", "quality", "double", default=0.0)


def test_evolve_rejects_physical_column_collision(spark, tmp_path):
    """ADVICE r5: evolving a name that already exists PHYSICALLY in the
    current snapshot's parquet schema must raise (it masks a caller
    bug), exactly like a duplicate evolution entry — and the check is
    footer-only (no data read, no Spark job: pyarrow schema)."""
    io = TableIO(str(tmp_path / "wh"))
    _commit(io, spark, "t", [1, 2], "s1")
    with pytest.raises(ValueError, match="exists physically"):
        io.evolve_add_column("t", "v", "int", default=0)
    # a genuinely new column still works, and duplicates still raise
    io.evolve_add_column("t", "quality", "double", default=0.5)
    with pytest.raises(ValueError, match="already added"):
        io.evolve_add_column("t", "quality", "double", default=0.5)
