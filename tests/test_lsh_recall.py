"""Hyperplane-LSH recall gate (VERDICT r1 item 3): multi-probe (one-bit
flips) must recover >= 0.9 of PLANTED near-duplicate pairs (cos >= 0.99)
and strictly beat single-probe. The driver's sf testdata has no pairs
above cos ~0.51 (LSH's design regime is near-dups), so the gate plants
its own: 200 seeded unit vectors, the first 40 duplicated with a small
perturbation."""

from __future__ import annotations

import numpy as np
import pytest

from amazon_textract_enhancer_spark.operators.similarity import ann_lsh_bucketed

N_BASE = 200
N_DUPS = 40
EPS = 0.01  # cos(u, u+εg) ≈ 1/sqrt(1+64ε²) ≈ 0.9968


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    rng = np.random.RandomState(11)
    base = rng.normal(size=(N_BASE, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].astype(float).tolist(), 0) for i in range(N_BASE)]
    pairs = set()
    for i in range(N_DUPS):
        dup = base[i] + EPS * rng.normal(size=64)
        vid = N_BASE + i
        rows.append((vid, dup.astype(float).tolist(), 1))
        pairs.add((i, vid))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, label int")
    d = tmp_path_factory.mktemp("lshsf")
    df.coalesce(2).write.parquet(str(d / "embeddings.parquet"))
    return str(d), pairs


def _found_pairs(spark, sf_dir, multi_probe):
    got = ann_lsh_bucketed(
        spark, sf_dir, multi_probe=multi_probe, threshold=0.95
    ).collect()
    return {(r["vec_a"], r["vec_b"]) for r in got}


def test_multi_probe_recall_gate(spark, planted):
    sf_dir, pairs = planted
    found = _found_pairs(spark, sf_dir, multi_probe=True)
    recall = len(found & pairs) / len(pairs)
    assert recall >= 0.9, f"multi-probe recall {recall}"
    # every emitted pair really is a near-dup (exact verify stage works)
    assert found <= pairs


def test_multi_probe_beats_single_probe(spark, planted):
    sf_dir, pairs = planted
    single = len(_found_pairs(spark, sf_dir, multi_probe=False) & pairs)
    multi = len(_found_pairs(spark, sf_dir, multi_probe=True) & pairs)
    assert multi > single, (multi, single)
