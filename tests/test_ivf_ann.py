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
