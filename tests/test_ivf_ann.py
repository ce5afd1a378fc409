"""IVF ANN gates (VERDICT r1 item 3): two-phase build/search with a
committed index, recall@10 >= 0.9 vs the exact path at nprobe <
n_centroids (not just the degenerate full-probe case), full probe ≡
brute force, resume reuse of the committed index, and partition-pruned
probed reads."""

from __future__ import annotations

import shutil

from amazon_textract_enhancer_spark.operators.similarity import (
    IVF_N_CENTROIDS,
    IVF_NPROBE,
    ann_cosine_topk,
    ann_ivf_topk,
    ivf_build_index,
    ivf_search,
    ivf_warehouse_for,
)
from amazon_textract_enhancer_spark.sources.tableio import TableIO

SF = "/root/testdata/sf0.01"


def _fresh_warehouse():
    wh = ivf_warehouse_for(SF)
    shutil.rmtree(wh, ignore_errors=True)
    return wh


def test_full_probe_equals_brute_force(spark):
    _fresh_warehouse()
    exact = [(r["vec_id"], r["cos_sim"]) for r in ann_cosine_topk(spark, SF).collect()]
    full = [(r["vec_id"], r["cos_sim"])
            for r in ann_ivf_topk(spark, SF, n_centroids=IVF_N_CENTROIDS,
                                  nprobe=IVF_N_CENTROIDS).collect()]
    assert full == exact


def test_recall_gate_at_partial_probe(spark):
    """The headline gate: recall@10 >= 0.9 scanning nprobe/n_centroids
    of the corpus (default 6/8 after 2 Lloyd iterations)."""
    assert IVF_NPROBE < IVF_N_CENTROIDS
    _fresh_warehouse()
    exact = [r["vec_id"] for r in ann_cosine_topk(spark, SF).collect()]
    part = ann_ivf_topk(spark, SF).collect()
    ids = [r["vec_id"] for r in part]
    sims = [r["cos_sim"] for r in part]
    assert sims == sorted(sims, reverse=True)
    recall = len(set(ids) & set(exact)) / len(exact)
    assert recall >= 0.9, f"recall@10 {recall} at nprobe={IVF_NPROBE}/{IVF_N_CENTROIDS}"
    # determinism
    again = [r["vec_id"] for r in ann_ivf_topk(spark, SF).collect()]
    assert ids == again


def test_index_commit_resume_and_probed_scan(spark):
    """Phase split: the index is committed once and REUSED (same
    snapshot → commit no-op); search reads only probed hive partitions
    (bucket is the partition column of the committed index)."""
    wh = _fresh_warehouse()
    from pyspark.sql import functions as F

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    m1 = ivf_build_index(spark, emb, wh)
    assert m1["partition_by"] == "bucket"
    t1 = m1["committed_at_unix"]
    m2 = ivf_build_index(spark, emb, wh)  # resume: no rebuild
    assert m2["committed_at_unix"] == t1

    io = TableIO(wh)
    idx = io.read_table(spark, "ivf_index")
    n_buckets = idx.select("bucket").distinct().count()
    assert n_buckets <= IVF_N_CENTROIDS

    res = ivf_search(spark, wh, nprobe=2, k=5)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the probe semi-join must reach the scan as a partition filter
    # (dynamic pruning on the hive partition column)
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [isnotnull(bucket" in plan, plan
    assert len(res.collect()) == 5


def test_build_and_search_never_collect_to_driver(spark, monkeypatch):
    """VERDICT r1: no driver-side index build / query materialization.
    Plan construction for search must not trigger DataFrame.collect
    (the metadata-only snapshot hash in the build phase is exempt — it
    aggregates to ONE row; the guard here is on the search path)."""
    wh = ivf_warehouse_for(SF)  # committed by earlier tests
    from pyspark.sql import DataFrame

    def boom(self):
        raise AssertionError("driver-side collect during plan construction")

    monkeypatch.setattr(DataFrame, "collect", boom)
    df = ivf_search(spark, wh, nprobe=3, k=5)  # must build lazily
    monkeypatch.undo()
    assert len(df.collect()) == 5


def test_delta_refresh_merge_supersede_delete_and_compaction(spark, tmp_path):
    """Main+delta maintenance: (1) vectors added by refresh are
    assigned with the FROZEN committed centroids and the merged view
    equals a frozen-centroid assignment of the full current corpus;
    (2) a changed vector's main row is superseded by its delta row;
    (3) a stale-only id is deleted from the merged view; (4) compaction
    folds delta into main with identical content and resets the
    segment; (5) merged search ranks exactly like search over the
    compacted main."""
    from pyspark.sql import functions as F

    from amazon_textract_enhancer_spark.operators.io_util import t
    from amazon_textract_enhancer_spark.operators.similarity import (
        _assign_buckets,
        _unit_vectors,
        ivf_compact,
        ivf_index_refresh,
        ivf_search_merged,
        read_ivf_index_merged,
    )

    wh = str(tmp_path / "ivf-wh")
    emb = t(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    base = emb.filter(F.col("vec_id") % 5 != 0)
    ivf_build_index(spark, base, wh)
    io = TableIO(wh)
    cents = io.read_table(spark, "ivf_centroids")

    # refresh 1: the held-out 20% arrive, plus vec 1 changes (negated)
    changed = emb.filter(F.col("vec_id") == 1).select(
        "vec_id", F.transform("v", lambda x: -x).alias("v")
    )
    new = emb.filter(F.col("vec_id") % 5 == 0).unionByName(changed)
    ivf_index_refresh(spark, wh, new, "r1")

    merged = read_ivf_index_merged(spark, wh)
    full_now = emb.filter(F.col("vec_id") != 1).unionByName(changed)
    expect = _assign_buckets(_unit_vectors(full_now), cents).select(
        "vec_id", "bucket"
    )
    got = {(r["vec_id"], r["bucket"]) for r in merged.select("vec_id", "bucket").collect()}
    want = {(r["vec_id"], r["bucket"]) for r in expect.collect()}
    assert got == want
    # the changed vector carries the NEW value in the merged view
    v1 = merged.filter(F.col("vec_id") == 1).select("v").collect()
    orig1 = emb.filter(F.col("vec_id") == 1).select("v").collect()
    assert len(v1) == 1 and v1[0]["v"] == [-x for x in orig1[0]["v"]]

    # refresh 2: delete vec 2 (stale-only, no replacement row)
    ivf_index_refresh(
        spark, wh,
        emb.filter(F.col("vec_id") < 0),  # empty new batch
        "r2",
        stale_vec_ids=spark.createDataFrame([(2,)], "vec_id long"),
    )
    merged2 = read_ivf_index_merged(spark, wh)
    assert merged2.filter(F.col("vec_id") == 2).count() == 0
    assert merged2.count() == emb.count() - 1  # vec 2 gone, vec 1 replaced

    # merged search == search over the compacted main (rebuild equality)
    before = [(r["vec_id"], r["cos_sim"])
              for r in ivf_search_merged(spark, wh).collect()]
    ivf_compact(spark, wh, "r2")
    assert io.read_table(spark, "ivf_index_delta").count() == 0
    assert io.read_table(spark, "ivf_stale_vecs").count() == 0
    after = [(r["vec_id"], r["cos_sim"]) for r in ivf_search(spark, wh).collect()]
    assert before == after
    merged3 = {(r["vec_id"], r["bucket"])
               for r in read_ivf_index_merged(spark, wh).select("vec_id", "bucket").collect()}
    assert merged3 == {(v, b) for v, b in got if v != 2}


def test_mixed_refresh_unions_changed_and_deleted_into_stale(spark, tmp_path):
    """ADVICE r5: a MIXED refresh (changed vectors in new_emb PLUS an
    explicit stale_vec_ids delete list) must land BOTH id sets in the
    stale mask — the old code let stale_vec_ids REPLACE new_emb's ids,
    leaving the changed vectors' superseded main rows unmasked
    (duplicate vec_ids in the merged view) and their prior delta rows
    undropped. Pins: merged view has unique vec_ids, the changed vector
    carries the new value, the deleted vector is gone, and a RE-CHANGED
    vector's prior delta row is dropped on the next mixed refresh."""
    from pyspark.sql import functions as F

    from amazon_textract_enhancer_spark.operators.io_util import t
    from amazon_textract_enhancer_spark.operators.similarity import (
        ivf_index_refresh,
        read_ivf_index_merged,
    )

    wh = str(tmp_path / "ivf-wh-mixed")
    emb = t(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ivf_build_index(spark, emb, wh)

    # mixed call: vec 1 changes (negated) AND vec 2 is deleted
    changed = emb.filter(F.col("vec_id") == 1).select(
        "vec_id", F.transform("v", lambda x: -x).alias("v")
    )
    ivf_index_refresh(
        spark, wh, changed, "m1",
        stale_vec_ids=spark.createDataFrame([(2,)], "vec_id long"),
    )
    merged = read_ivf_index_merged(spark, wh)
    dupes = (
        merged.groupBy("vec_id").count().filter(F.col("count") > 1).count()
    )
    assert dupes == 0  # the ADVICE r5 failure mode: vec 1 twice
    assert merged.filter(F.col("vec_id") == 2).count() == 0
    v1 = merged.filter(F.col("vec_id") == 1).select("v").collect()
    orig1 = emb.filter(F.col("vec_id") == 1).select("v").collect()
    assert len(v1) == 1 and v1[0]["v"] == [-x for x in orig1[0]["v"]]

    # re-change vec 1 in a second mixed call: its m1 delta row must be
    # dropped (superseded), vec 3 deleted alongside
    rechanged = emb.filter(F.col("vec_id") == 1).select(
        "vec_id", F.transform("v", lambda x: 2.0 * x).alias("v")
    )
    ivf_index_refresh(
        spark, wh, rechanged, "m2",
        stale_vec_ids=spark.createDataFrame([(3,)], "vec_id long"),
    )
    merged2 = read_ivf_index_merged(spark, wh)
    assert (
        merged2.groupBy("vec_id").count().filter(F.col("count") > 1).count()
        == 0
    )
    assert merged2.filter(F.col("vec_id").isin(2, 3)).count() == 0
    v1b = merged2.filter(F.col("vec_id") == 1).select("v").collect()
    assert len(v1b) == 1 and v1b[0]["v"] == [2.0 * x for x in orig1[0]["v"]]
