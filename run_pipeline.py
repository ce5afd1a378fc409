#!/usr/bin/env python
"""spark-submit entry point for the extraction pipeline (BASELINE.json:14
"launches via spark-submit --py-files on multi-executor clusters").

    spark-submit --master local[N] --py-files ates.zip \
        run_pipeline.py <transcripts_dir> <warehouse_dir> [--fresh]

Prints one JSON line: {"turns": N, "wall_sec": W, "turns_per_sec": T,
"master": ..., "manifests": {...rows per stage...}}.

Timing protocol (BASELINE.md): wall time runs from first job submit to
final manifest commit; session startup and the one-time Python-worker
interpreter spawn (a tiny warmup stage) are excluded — on a real
cluster both amortize over job lifetime and would otherwise distort
the N-vs-4N comparison (32 workers pay 4x the import cost of 8).
"""

from __future__ import annotations

import json
import shutil
import sys
import time


def main() -> None:
    transcripts_dir = sys.argv[1]
    warehouse = sys.argv[2]
    fresh = "--fresh" in sys.argv
    # --mode extract: the extraction job through a noop sink (CPU-bound,
    # used for the scaling-efficiency gate — sandbox disk is shared
    # across thread counts, see BENCH/BASELINE.md). --mode full: all
    # three committed stages. --stages=a,b: run only those pipeline
    # stages (stage-per-job scheduling; resume picks up prior commits).
    mode = "extract" if "--mode=extract" in sys.argv else "full"
    stages = None
    retain_snapshots = 0
    n_buckets = None
    for a in sys.argv:
        if a.startswith("--stages="):
            stages = a.split("=", 1)[1].split(",")
        # --retain-snapshots=N: keep N superseded snapshots per table
        # readable (time travel / rollback, the Iceberg history knob)
        if a.startswith("--retain-snapshots="):
            retain_snapshots = int(a.split("=", 1)[1])
        # --n-buckets=N: the bucketed-table layout constant. With the
        # exchange below extraction, the extraction stage runs on
        # exactly n_buckets tasks — it must be >= the cluster's task
        # slots or slots idle (r5 review: the old fixed 16 halved
        # extraction parallelism at local[32]).
        if a.startswith("--n-buckets="):
            n_buckets = int(a.split("=", 1)[1])
    if fresh:
        shutil.rmtree(warehouse, ignore_errors=True)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ates-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    master = spark.conf.get("spark.master")

    from amazon_textract_enhancer_spark.pipeline import run_extraction_pipeline
    from amazon_textract_enhancer_spark.stages import extract_spans

    transcripts = spark.read.parquet(transcripts_dir)

    # warmup: spawn + import python workers on EVERY core (excluded
    # one-time interpreter cost; a single-partition warmup would leave
    # N-1 workers cold-starting inside the measured window)
    n_cores = spark.sparkContext.defaultParallelism
    extract_spans(
        transcripts.limit(max(256, 8 * n_cores)).repartition(2 * n_cores)
    ).write.format("noop").mode("overwrite").save()

    if mode == "extract":
        t0 = time.monotonic()
        extract_spans(transcripts).write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        turns = transcripts.count()
        manifests_out = {}
    else:
        t0 = time.monotonic()
        manifests = run_extraction_pipeline(
            spark, transcripts, warehouse, stages=stages,
            retain_snapshots=retain_snapshots,
            # default: never below the slot count (a resumed warehouse
            # keeps whatever layout its manifests committed)
            n_buckets=n_buckets if n_buckets is not None
            else max(16, n_cores),
        )
        wall = time.monotonic() - t0
        stage_seconds = manifests.pop("_stage_seconds", {})
        if "extracted_spans" in manifests:
            turns = manifests["extracted_spans"]["rows"]
        else:
            from amazon_textract_enhancer_spark.sources.tableio import TableIO

            turns = TableIO(warehouse).read_manifest("extracted_spans")["rows"]
        manifests_out = {k: m["rows"] for k, m in manifests.items()}
        manifests_out["stage_seconds"] = stage_seconds

    print(
        json.dumps(
            {
                "turns": turns,
                "wall_sec": round(wall, 2),
                "turns_per_sec": round(turns / wall, 1),
                "master": master,
                "mode": mode,
                "manifests": manifests_out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
