#!/usr/bin/env python
"""10×-input extraction proof (VERDICT r4 item 5): run the
extraction+commit pipeline once on a ~10M-turn corpus and record
turns/s, per-stage walls, manifest lineage counters, and peak JVM
memory — converting SCALE.md's central extrapolation ("per-job fixed
costs vanish at larger input; per-turn cost is flat") into a measured
two-point curve against the 1.04M-turn scaling runs.

The corpus is the seed-fixed 22k-conv bench input REPLICATED 10× with
remapped conv_ids (``conv_id || '_rK'``) — replication is the honest
scale-up here: per-turn extraction work is content-dependent and
identical across replicas, so any non-flat per-turn cost or
super-linear stage would surface, while generation cost (40+ min of
single-threaded corpus synthesis) stays out of the measurement. The
warehouse sits on tmpfs for the same reason as bench_scaling.py (the
sandbox's one shared virtio disk would measure the disk).

Launches via spark-submit (the mandated path):

    python bench_scale10x.py [master] [replicas]

writes BENCH/scale10x.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
MASTER = sys.argv[1] if len(sys.argv) > 1 else "local[16]"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
INPUT = os.path.join(REPO, ".bench", "transcripts")
ZIP = os.path.join(REPO, ".bench", "ates.zip")
WH = os.path.join(
    "/dev/shm" if os.path.isdir("/dev/shm") else os.path.join(REPO, ".bench"),
    "ates-scale10x",
)

_INNER = r"""
import json, os, sys, time
from pyspark.sql import SparkSession, functions as F

spark = SparkSession.builder.appName("ates-scale10x").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
input_dir, wh, replicas = sys.argv[1], sys.argv[2], int(sys.argv[3])

from amazon_textract_enhancer_spark.pipeline import run_extraction_pipeline
from amazon_textract_enhancer_spark.stages import extract_spans

base = spark.read.parquet(input_dir)
reps = [
    base.select(
        F.concat(F.col("conv_id"), F.lit(f"_r{k}")).alias("conv_id"),
        "turn_idx", "role", "text", "tool", "ts",
    )
    for k in range(replicas)
]
big = reps[0]
for r in reps[1:]:
    big = big.unionByName(r)

# warmup: spawn + import the Arrow workers on every core (excluded
# one-time interpreter cost, same protocol as run_pipeline.py)
n_cores = spark.sparkContext.defaultParallelism
extract_spans(
    base.limit(max(256, 8 * n_cores)).repartition(2 * n_cores)
).write.format("noop").mode("overwrite").save()

t0 = time.monotonic()
manifests = run_extraction_pipeline(spark, big, wh, n_buckets=64)
wall = time.monotonic() - t0
stage_seconds = manifests.pop("_stage_seconds", {})
turns = manifests["extracted_spans"]["rows"]

def peak_java_rss_gb():
    best = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/status") as f:
                s = f.read()
            if s.startswith("Name:\tjava"):
                for line in s.splitlines():
                    if line.startswith("VmHWM:"):
                        best = max(best, int(line.split()[1]))
        except OSError:
            continue
    return round(best / 1024 / 1024, 2)

print(json.dumps({
    "turns": turns,
    "wall_sec": round(wall, 2),
    "turns_per_sec": round(turns / wall, 1),
    "stage_seconds": stage_seconds,
    # lineage block = per-partition counter sums (F4); total them so the
    # 10x run's counters are comparable to the 1x manifests
    "manifest_counters": {
        k: {
            c: sum(p.get(c) or 0 for p in m.get("lineage", []))
            for c in (m.get("lineage") or [{}])[0]
            if c not in ("partition_id", "rows")
        }
        for k, m in manifests.items()
    },
    "manifest_rows": {k: m["rows"] for k, m in manifests.items()},
    "peak_java_rss_gb": peak_java_rss_gb(),
}))
spark.stop()
"""


def main() -> None:
    if not os.path.exists(INPUT):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "gen_bench_input.py"),
             "22000", INPUT],
            check=True,
        )
    import bench_scaling

    bench_scaling.build_zip()
    shutil.rmtree(WH, ignore_errors=True)
    inner = os.path.join(REPO, ".bench", "scale10x_inner.py")
    with open(inner, "w") as f:
        f.write(_INNER)
    cmd = [
        "spark-submit",
        "--master", MASTER,
        "--driver-memory", "48g",
        "--conf", f"spark.local.dir={os.path.join(os.path.dirname(WH), 'spark-local-10x')}",
        "--conf", "spark.sql.shuffle.partitions=128",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", ZIP,
        inner, INPUT, WH, str(REPLICAS),
    ]
    from bench_scaling import _cpu_times

    s0, t0 = _cpu_times()
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         timeout=7200)
    s1, t1 = _cpu_times()
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"scale10x run failed: {out.stderr[-3000:]}")
    res = json.loads(lines[-1])
    res["master"] = MASTER
    res["steal_pct"] = round(100.0 * (s1 - s0) / max(1, t1 - t0), 1)
    res["replicas"] = REPLICAS
    res["warehouse"] = WH
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scale10x.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))
    shutil.rmtree(WH, ignore_errors=True)
    shutil.rmtree(os.path.join(os.path.dirname(WH), "spark-local-10x"),
                  ignore_errors=True)


if __name__ == "__main__":
    main()
