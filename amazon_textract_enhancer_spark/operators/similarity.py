"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k is the exact baseline (oracle-checked against
DuckDB); the LSH-bucketed variant (random-hyperplane signs) is the
scale path — at 10^12 rows the bucket equi-join touches only candidate
buckets instead of the full cross product.

Dot products are pure Spark expressions (zip_with + aggregate over the
double-cast array) — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .io_util import t

QUERY_VEC_ID = 0
TOP_K = 10


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k vs the vec_id=0 query vector.
    The 1-row query side is broadcast; ranking is
    TakeOrderedAndProject (no full sort)."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv")
    )
    sim = F.round(
        _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))), 6
    )
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def ann_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos >= 0.45), exact — the
    verification stage of an embedding dedup pipeline.

    Scale pattern (block-broadcast all-pairs): the unit-normalized
    matrix is broadcast once; each partition multiplies its row block
    against it with NumPy (C-speed, Arrow-batched) and emits only
    above-threshold pairs. An expression-level pair join (zip_with +
    aggregate per pair) measured 25s at 2k vectors — interpreted
    higher-order functions per element; the block multiply is <1s.
    At 10^12 rows the broadcast side becomes the LSH-bucket centroids
    (ann_lsh_bucketed) instead of the full matrix.
    """
    import numpy as np
    import pyarrow as pa

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    rows = emb.collect()  # bench scale: full matrix broadcast
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.array([r["v"] for r in rows], dtype=np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    bc = spark.sparkContext.broadcast((ids, M))

    out_schema = "vec_a bigint, vec_b bigint, cos_sim double"

    def fn(batches):
        bids, BM = bc.value
        for rb in batches:
            a_ids = np.asarray(rb.column(0).to_pylist(), dtype=np.int64)
            if len(a_ids) == 0:
                continue
            A = np.asarray(rb.column(1).to_pylist(), dtype=np.float64)
            A = A / np.linalg.norm(A, axis=1, keepdims=True)
            S = np.round(A @ BM.T, 6)
            # pairs with a_id < b_id and sim >= threshold
            mask = (S >= 0.45) & (a_ids[:, None] < bids[None, :])
            ai, bj = np.nonzero(mask)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(a_ids[ai], pa.int64()),
                    pa.array(bids[bj], pa.int64()),
                    pa.array(S[ai, bj], pa.float64()),
                ],
                names=["vec_a", "vec_b", "cos_sim"],
            )

    return emb.mapInArrow(fn, out_schema)


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """✂ Scale path: random-hyperplane LSH. Signature bit b =
    sign(dot(v, plane_b)) with deterministic pseudo-planes derived from
    xxhash64(dim, b) — no randomness, no driver-side plane matrix.
    Same-bucket candidate pairs are then exactly verified. Rows-only
    check (engine-specific hashing).

    Recall honesty: with 8 planes, P(two vectors share a bucket) =
    (1 - θ/π)^8 — near 1 for true near-duplicates (cos ≥ 0.95,
    θ ≤ 18°), but only ~3% at cos 0.45. This operator is the
    NEAR-DUPLICATE recall structure; mid-similarity search uses the
    exact block-broadcast path (ann_pairs_threshold) or IVF-style
    bucket centroids at scale. Multi-probe (flip one bit per probe)
    is the standard recall amplifier if needed."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n_planes = 8
    # plane_b[dim] = (xxhash64(dim, b) % 2001 - 1000) / 1000  in [-1, 1]
    def plane_component(dim: Column, b: int) -> Column:
        return (F.pmod(F.xxhash64(dim.cast("int"), F.lit(b)), F.lit(2001)) - 1000) / 1000.0

    sig = F.lit(0).cast("long")
    for b in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col("v"),
                F.transform(F.sequence(F.lit(0), F.size("v") - 1), lambda i: plane_component(i, b)),
                lambda x, p: x * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << b)).otherwise(0)
    bucketed = emb.select("vec_id", "v", sig.alias("bucket"))
    a = bucketed.alias("a")
    b2 = bucketed.alias("b")
    cand = a.join(
        b2,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    cos = _dot(F.col("a.v"), F.col("b.v")) / (_norm(F.col("a.v")) * _norm(F.col("b.v")))
    return cand.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(cos, 6).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= 0.4)


def embed_norm_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column aggregate: avg L2 norm per label (oracle-checked)."""
    emb = t(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(_norm(F.col("v"))), 4).alias("avg_norm"),
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str, n_centroids: int = 16,
                 nprobe: int = 6, k: int = TOP_K) -> DataFrame:
    """✂ IVF-style ANN: deterministic coarse quantizer + probed search.

    Index: centroids are the ``n_centroids`` vectors with the smallest
    xxhash64(vec_id) (deterministic, uniformly spread — no k-means RNG);
    every vector joins the bucket of its most-similar centroid (one
    broadcast NumPy argmax pass). Search: rank centroids against the
    query, scan only the ``nprobe`` nearest buckets exactly, take the
    global top-k. nprobe = n_centroids degrades to exact brute force —
    the invariant tests/test_ivf_ann.py checks; smaller nprobe trades
    recall for scanning ~nprobe/n_centroids of the corpus (at 10^12
    rows the buckets are Iceberg partitions and probing is partition
    pruning).
    """
    import numpy as np
    import pyarrow as pa

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # deterministic centroid choice (hash-ordered vec ids)
    cent_ids = [
        r["vec_id"]
        for r in emb.select("vec_id")
        .orderBy(F.xxhash64("vec_id"), F.col("vec_id"))
        .limit(n_centroids)
        .collect()
    ]
    cents = emb.filter(F.col("vec_id").isin(cent_ids)).collect()
    cents.sort(key=lambda r: r["vec_id"])
    import numpy as _np

    C = _np.array([r["v"] for r in cents], dtype=_np.float64)
    C = C / _np.linalg.norm(C, axis=1, keepdims=True)
    bc_c = spark.sparkContext.broadcast(C)

    def assign(batches):
        CM = bc_c.value
        for rb in batches:
            ids = rb.column(0)
            if len(ids) == 0:
                continue
            A = np.asarray(rb.column(1).to_pylist(), dtype=np.float64)
            U = A / np.linalg.norm(A, axis=1, keepdims=True)
            bucket = np.argmax(U @ CM.T, axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [ids, rb.column(1), pa.array(bucket, pa.int32())],
                names=["vec_id", "v", "bucket"],
            )

    indexed = emb.mapInArrow(assign, "vec_id bigint, v array<double>, bucket int")

    # query side: rank centroids, pick probe set (driver-side, tiny)
    qrow = emb.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0]
    q = _np.asarray(qrow["v"], dtype=_np.float64)
    q = q / _np.linalg.norm(q)
    probe = _np.argsort(-(C @ q))[:nprobe].tolist()

    # exact cosine within probed buckets only
    qv = F.array(*[F.lit(float(x)) for x in qrow["v"]]).cast("array<double>")
    cos = F.round(_dot(F.col("v"), qv) / (_norm(F.col("v")) * _norm(qv)), 6)
    return (
        indexed.filter(F.col("bucket").isin(probe) & (F.col("vec_id") != QUERY_VEC_ID))
        .select("vec_id", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )
