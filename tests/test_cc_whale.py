"""Skew-stress for connected_components' ITERATIVE label-propagation
branch (VERDICT r4 item 6): every prior test forced it only at toy
scale. Here the graph is pathological on purpose —

- a WHALE STAR: one hub document near-duplicated by 100,000 members
  (the boilerplate-cluster shape; the hub key carries 10^5 edges into
  every per-round join, the classic skewed-key hazard), plus
- a CHAIN of diameter 24 (worst case for min-label propagation, which
  moves the minimum one hop per round).

Pins: (a) convergence within diameter + 2 rounds — ``strict=True``
with ``max_iters`` set exactly there raises if propagation needed
more; (b) labels identical to the exact one-task union-find over the
same edges; (c) the run completes inside the suite's bounded-memory
session (no OOM from the whale key: per-round state is one label row
per vertex plus the checkpointed edge list — never a blown-up join
product).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amazon_textract_enhancer_spark.operators.dedup import connected_components

STAR_N = 100_000
CHAIN_N = 24  # diameter of the chain component
CHAIN_BASE = 10_000_000


def _whale_edges(spark):
    star = spark.range(1, STAR_N + 1).select(
        F.lit(0).cast("long").alias("doc_a"), F.col("id").alias("doc_b")
    )
    chain = spark.range(CHAIN_BASE, CHAIN_BASE + CHAIN_N).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    return star.unionByName(chain).repartition(8)


def test_iterative_cc_converges_on_whale_star_plus_chain(spark):
    edges = _whale_edges(spark)
    # (a) rounds <= diameter + 2: the chain needs ~CHAIN_N rounds; if
    # propagation regressed to more, strict=True raises RuntimeError
    labels = connected_components(
        edges, max_iters=CHAIN_N + 2, single_partition=False
    )
    agg = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    got = {r["label"]: r["n"] for r in agg}
    # star: hub 0 + STAR_N members, all labelled 0; chain: CHAIN_N + 1
    # vertices labelled by their minimum (CHAIN_BASE)
    assert got == {0: STAR_N + 1, CHAIN_BASE: CHAIN_N + 1}


def test_iterative_cc_matches_union_find_on_whale(spark):
    # (b) both branches produce identical labels on the same edges;
    # compare via per-component fingerprints (100k rows stay executor-
    # side: the comparison collects one row per component)
    edges = _whale_edges(spark)

    def fingerprint(df):
        return {
            (r["label"], r["n"], r["xmin"], r["xmax"])
            for r in df.groupBy("label")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("doc_id").alias("xmin"),
                F.max("doc_id").alias("xmax"),
            )
            .collect()
        }

    it = connected_components(
        edges, max_iters=CHAIN_N + 2, single_partition=False
    )
    uf = connected_components(edges, single_partition=True)
    assert fingerprint(it) == fingerprint(uf)
