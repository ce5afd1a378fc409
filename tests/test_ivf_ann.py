"""IVF-style ANN invariants: full probe degrades to exact brute force;
partial probe returns a correctly-ranked subset with reasonable recall.
"""

from __future__ import annotations

from amazon_textract_enhancer_spark.operators.similarity import (
    ann_cosine_topk,
    ann_ivf_topk,
)

SF = "/root/testdata/sf0.01"


def test_full_probe_equals_brute_force(spark):
    exact = [(r["vec_id"], r["cos_sim"]) for r in ann_cosine_topk(spark, SF).collect()]
    full = [(r["vec_id"], r["cos_sim"])
            for r in ann_ivf_topk(spark, SF, n_centroids=16, nprobe=16).collect()]
    assert full == exact


def test_partial_probe_subset_and_recall(spark):
    exact = [r["vec_id"] for r in ann_cosine_topk(spark, SF).collect()]
    part = ann_ivf_topk(spark, SF, n_centroids=16, nprobe=6).collect()
    ids = [r["vec_id"] for r in part]
    # correctly ordered (desc sim, asc id)
    sims = [r["cos_sim"] for r in part]
    assert sims == sorted(sims, reverse=True)
    # non-trivial recall of the exact top-10 even at 6/16 buckets
    recall = len(set(ids) & set(exact)) / len(exact)
    assert recall >= 0.3, recall
    # determinism
    again = [r["vec_id"] for r in ann_ivf_topk(spark, SF, n_centroids=16, nprobe=6).collect()]
    assert ids == again
