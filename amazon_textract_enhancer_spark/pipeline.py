"""The end-to-end extraction job (SURVEY.md §3.1 "ours"):

    transcripts (scan, column-pruned)
    → fused extraction UDF stage        (stages.extract_spans)
    → extracted_spans commit            (F1 bucketed by conv_id, F3)
    → conversation rollup commit        (F2 salted two-phase agg)
    → tokens inverted-index commit      (A9/C5-ii serving table)

Every stage commits atomically with per-partition lineage counters and
resumes from the manifest if already committed for the same input
snapshot (kill-resume test: tests/test_checkpoint_resume.py). This is
also the job the bench harness runs at two parallelism levels for the
scaling-efficiency evidence (BASELINE.md protocol).

Cluster launch: ``spark-submit --py-files ates.zip run_pipeline.py``
(see bench_scaling.py for the exact invocation used in-sandbox). In
production each stage is typically its own spark-submit (Airflow-style
stage-per-job scheduling) — pass ``stages=[...]`` to run a subset; the
manifest resume protocol makes the split safe.
"""

from __future__ import annotations

import time as _time

from pyspark.sql import DataFrame, SparkSession

from .operators.scale import salted_conv_rollup
from .operators.serving import term_frequencies
from .sources.tableio import TableIO, snapshot_id_of
from .stages import extract_spans

CONFIG_HASH = "pipeline-v1"
STAGES = ("extracted_spans", "conv_rollup", "tokens", "corpus_stats")


def run_extraction_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    warehouse: str,
    n_buckets: int = 16,
    input_snapshot: str | None = None,
    stages: list[str] | None = None,
    retain_snapshots: int = 0,
    sort_tokens: bool = False,
) -> dict:
    """Run (or resume) the pipeline; returns manifests per stage plus a
    ``_stage_seconds`` timing map (per-stage wall, for the
    scaling-evidence split of compute vs commit I/O).

    ``stages``: run only the named subset (stage-per-job scheduling:
    each later stage resumes from the previous stage's committed
    table)."""
    run_set = set(stages) if stages is not None else set(STAGES)
    stage_seconds: dict[str, float] = {}
    # retain_snapshots > 0 keeps that many superseded table snapshots
    # readable (time travel / rollback_to — the Iceberg history knob);
    # 0 keeps only the current snapshot
    io = TableIO(warehouse, retain_snapshots=retain_snapshots)
    if input_snapshot is None:
        # text included: a text-only edit must produce a new snapshot id,
        # else resume would silently serve stale spans (ADVICE round 1)
        input_snapshot = snapshot_id_of(transcripts, ["conv_id", "turn_idx", "text"])

    manifests: dict[str, dict] = {}

    # stage 1: extraction (shuffle-free UDF stage) + bucketed commit (F1)
    if "extracted_spans" in run_set:
        _t = _time.monotonic()
        if io.is_committed("extracted_spans", input_snapshot, CONFIG_HASH):
            manifests["extracted_spans"] = io.read_manifest("extracted_spans")
        else:
            spans = extract_spans(transcripts)
            manifests["extracted_spans"] = io.commit_stage(
                spans,
                "extracted_spans",
                input_snapshot,
                CONFIG_HASH,
                counter_cols=["counters.blocks_parsed", "counters.tables_reconstructed",
                              "counters.kv_pairs"],
                bucket_col="conv_id",
                n_buckets=n_buckets,
            )
        stage_seconds["extracted_spans"] = round(_time.monotonic() - _t, 2)

    if run_set - {"extracted_spans"}:
        # stage-subset safety (ADVICE r2): later stages must read spans
        # committed for THIS (input_snapshot, CONFIG_HASH) — a manifest
        # from an edited input or another config would silently feed
        # stale spans into the rollup/tokens commits under the new
        # snapshot id (the same stale-resume bug class F3 fixed for
        # snapshot ids)
        if not io.is_committed("extracted_spans", input_snapshot, CONFIG_HASH):
            m = io.read_manifest("extracted_spans")
            have = (m.get("input_snapshot"), m.get("config_hash")) if m else None
            raise RuntimeError(
                "stage-subset run needs extracted_spans committed for "
                f"(snapshot={input_snapshot}, config={CONFIG_HASH}); "
                f"found {have} — run the extracted_spans stage first"
            )
        spans = io.read_table(spark, "extracted_spans")

    # stage 2: conversation rollup (explicit salting F2)
    if "conv_rollup" in run_set:
        _t = _time.monotonic()
        if io.is_committed("conv_rollup", input_snapshot, CONFIG_HASH):
            manifests["conv_rollup"] = io.read_manifest("conv_rollup")
        else:
            rollup = salted_conv_rollup(spans)
            manifests["conv_rollup"] = io.commit_stage(
                rollup, "conv_rollup", input_snapshot, CONFIG_HASH,
                counter_cols=["n_turns", "n_tables", "n_forms", "n_skipped"],
            )
        stage_seconds["conv_rollup"] = round(_time.monotonic() - _t, 2)

    # stage 3: tokens inverted index (serving layer A9/C5)
    if "tokens" in run_set:
        _t = _time.monotonic()
        if io.is_committed("tokens", input_snapshot, CONFIG_HASH):
            manifests["tokens"] = io.read_manifest("tokens")
        else:
            # tf is within-turn local: run-length encoding per row, zero
            # shuffle — the only exchange is the bucket-by-term write
            toks = term_frequencies(spans, "extracted_text", ["conv_id", "turn_idx"])
            # sort_tokens (Iceberg write.sort-order analog, default
            # off): sorting each bucket by term lands one term's
            # postings contiguously, which (measured, 1M turns)
            # RLE/dict-compresses the table 131→77 MB and turns parquet
            # row-group min/max stats into real term zone maps for the
            # indexed search path — at the cost of +60% tokens-stage
            # wall (the per-bucket sort). Read-heavy serving deployments
            # flip it on; the default optimizes pipeline throughput.
            manifests["tokens"] = io.commit_stage(
                toks, "tokens", input_snapshot, CONFIG_HASH,
                counter_cols=["tf"], bucket_col="term", n_buckets=n_buckets,
                sort_within=["term", "conv_id", "turn_idx"] if sort_tokens else None,
            )
        stage_seconds["tokens"] = round(_time.monotonic() - _t, 2)

    # stage 4: serving statistics — per-turn token lengths plus the
    # one-row corpus aggregate (n_docs, avgdl, total_tokens). These are
    # what the index-backed rankers consume: BM25's length
    # normalization reads doc_lengths + the corpus_stats scalars
    # (serving.c5_search_bm25_indexed), and ANN's corpus-derived LSH
    # plane count reads a committed count instead of re-running
    # emb.count() per query (ADVICE r3). doc_lengths derives from the
    # committed SPANS table via the shared tokenizer (dl == sum(tf) by
    # construction; serving.doc_lengths_of) — the r4 form re-read the
    # committed token index and pushed its full posting volume through
    # a groupBy, which the 10×-input run measured going superlinear
    # through a data-independent shuffle-partition constant
    # (BENCH/scale10x.json: +152% per-turn at 10×); this form's cost is
    # ∝ turns, and its only exchange is the bucket-by-conv commit.
    if "corpus_stats" in run_set:
        _t = _time.monotonic()
        from pyspark.sql import functions as F

        from .operators.serving import doc_lengths_of

        if io.is_committed("doc_lengths", input_snapshot, CONFIG_HASH):
            manifests["doc_lengths"] = io.read_manifest("doc_lengths")
        else:
            dl = doc_lengths_of(spans, "extracted_text", ["conv_id", "turn_idx"])
            manifests["doc_lengths"] = io.commit_stage(
                dl, "doc_lengths", input_snapshot, CONFIG_HASH,
                counter_cols=["dl"], bucket_col="conv_id", n_buckets=n_buckets,
            )
        if io.is_committed("corpus_stats", input_snapshot, CONFIG_HASH):
            manifests["corpus_stats"] = io.read_manifest("corpus_stats")
        else:
            dl = io.read_table(spark, "doc_lengths")
            stats = dl.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("dl").alias("total_tokens"),
                F.avg("dl").alias("avgdl"),
            )
            manifests["corpus_stats"] = io.commit_stage(
                stats, "corpus_stats", input_snapshot, CONFIG_HASH,
                counter_cols=["n_docs"],
            )
        stage_seconds["corpus_stats"] = round(_time.monotonic() - _t, 2)

    manifests["_stage_seconds"] = stage_seconds
    return manifests
