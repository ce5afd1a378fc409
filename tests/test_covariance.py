"""embed_covariance: numpy ground truth, planted-anisotropy PCA
recovery, and the d²-accumulator plan shape."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from amazon_textract_enhancer_spark.operators import similarity as S
from amazon_textract_enhancer_spark.plans import executed_plan

SF_DIR = "/root/testdata/sf0.01"


def _cov_matrix(rows, d):
    m = np.zeros((d, d))
    for r in rows:
        m[r["i"] - 1, r["j"] - 1] = r["cov_ij"]
        m[r["j"] - 1, r["i"] - 1] = r["cov_ij"]
    return m


def test_covariance_matches_numpy(spark):
    rows = S.embed_covariance(spark, SF_DIR).collect()
    emb = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    d = emb.shape[1]
    assert len(rows) == d * (d + 1) // 2
    got = _cov_matrix(rows, d)
    want = np.cov(emb, rowvar=False, bias=True)
    # operator rounds each product to 6dp pre-sum and the result to
    # 6dp — tolerance covers that quantization, nothing else
    assert np.abs(got - want).max() < 5e-4


def test_covariance_recovers_planted_principal_axis(spark, monkeypatch):
    """Vectors = small isotropic noise + a strong component along a
    planted direction; the top eigenvector of the operator's
    covariance must align with the plant (|cos| > 0.99)."""
    rng = np.random.default_rng(7)
    d, n = 16, 400
    axis = rng.normal(size=d)
    axis /= np.linalg.norm(axis)
    data = rng.normal(scale=0.05, size=(n, d)) + np.outer(
        rng.normal(scale=1.0, size=n), axis
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in data[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    )
    monkeypatch.setattr(S, "t", lambda _s, _d, _n: df)
    # r6: embed_covariance reads through the size-adaptive t_spread
    monkeypatch.setattr(S, "t_spread", lambda _s, _d, _n: df)
    rows = S.embed_covariance(spark, SF_DIR).collect()
    got = _cov_matrix(rows, d)
    w, v = np.linalg.eigh(got)
    top = v[:, np.argmax(w)]
    assert abs(float(top @ axis)) > 0.99


def test_covariance_shuffle_is_bounded_by_key_count(spark):
    """The pair explosion aggregates map-side: the plan must show a
    partial HashAggregate below the (i, j) exchange, so the shuffle
    carries at most d(d+1)/2 rows per task — never the exploded
    stream."""
    plan = executed_plan(S.embed_covariance(spark, SF_DIR))
    ij_exchange = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(i" in ln and "j#" in ln
    ]
    assert ij_exchange, plan
    assert "partial_sum" in plan or "partial" in plan.lower(), plan


# -------------------------------------------------- random projection


def test_random_projection_is_zero_exchange(spark):
    """The sign matrix is derived per-row (md5), so the plan is scan +
    project + posexplode with no data-sized Exchange. r6: the one
    allowed exchange is the size-adaptive input re-spread (a RoundRobin
    repartition BELOW the projection, fixture-scale only — at
    production sizes t_spread's condition is false and the plan is
    exchange-free); the projected output itself may never shuffle."""
    from amazon_textract_enhancer_spark.plans import n_exchanges

    df = S.embed_random_projection(spark, SF_DIR)
    n = n_exchanges(df)
    assert n <= 1, executed_plan(df)
    if n == 1:
        plan = executed_plan(df)
        assert "RoundRobinPartitioning" in plan, plan
        # the re-spread sits below the Generate (printed after it):
        # nothing above the projection shuffles
        assert plan.index("Generate") < plan.index("RoundRobinPartitioning"), plan


def test_random_projection_preserves_distances_in_aggregate(spark):
    """JL sanity on the fixture corpus: projected squared distances
    are unbiased — over many pairs the mean ratio to true squared
    distances must sit near 1 (loose band: r=8 is a sketch, not an
    isometry), and identical vectors must project identically."""
    rows = S.embed_random_projection(spark, SF_DIR).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .limit(60)
        .collect()
    }
    proj = {}
    for r in rows:
        if r["vec_id"] in emb:
            proj.setdefault(r["vec_id"], [0.0] * 8)[r["k"] - 1] = r["y"]
    ids = sorted(proj)
    ratios = []
    for a in range(0, len(ids) - 1, 2):
        u, v = ids[a], ids[a + 1]
        true = float(np.sum((emb[u] - emb[v]) ** 2))
        got = float(
            np.sum((np.array(proj[u]) - np.array(proj[v])) ** 2)
        )
        if true > 0:
            ratios.append(got / true)
    assert 0.6 < float(np.mean(ratios)) < 1.4, np.mean(ratios)
    # determinism: same input vector -> bitwise-same projection
    again = {
        (r["vec_id"], r["k"]): r["y"]
        for r in S.embed_random_projection(spark, SF_DIR).collect()
    }
    for r in rows[:100]:
        assert again[(r["vec_id"], r["k"])] == r["y"]


# --------------------------------------------------- portable LSH ANN


def test_ann_lsh_portable_equals_bruteforce_within_probes(spark):
    """Candidate selection = bucket membership in the 9-probe set;
    ranking = exact cosine. The default top-10 must equal the
    re-sorted head of the FULL probed candidate set (k = corpus size;
    never pass a huge k to limit() — TakeOrdered allocates k slots)."""
    all_cands = [
        (r["vec_id"], r["cos_sim"], r["bucket"])
        for r in S.ann_lsh_portable(spark, SF_DIR, k=500).collect()
    ]
    assert all_cands, "probe set should be non-empty on the fixture"
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in S.ann_lsh_portable(spark, SF_DIR).collect()
    ]
    assert 1 <= len(got) <= 10
    want = sorted(
        ((v, c) for v, c, _ in all_cands), key=lambda t: (-t[1], t[0])
    )[: len(got)]
    assert got == want
