#!/usr/bin/env python
"""Round-6 measurement harness (guide §1) — NOT the frozen bench.py.

Usage:
  python bench_measure.py [--passes N] [--plans-dir plans/r06] \
      [--tag before|after] [query ...]

For each named registry query (default: the bench.py headline set) it
  * captures ``.explain("formatted")`` once to
    ``<plans-dir>/<query>_<tag>.txt`` (guide §7.2), and
  * times the query with the noop sink (guide §1.4) once per
    whole-suite pass (interleaved, like bench.py), printing
    median/best/spread per query plus plan-shape counters
    (Exchange / ReusedExchange / Subquery / BatchEvalPython nodes).

Job descriptions are set per query (guide §1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "x_extract_spans",
    "b12_agg_confidence_stats",
    "b1_join_blockmap_lookup",
    "b4_ordered_text_assembly",
    "b5_two_level_ordered_concat",
    "b13_window_reading_order",
    "c5_search_rank_topk",
    "c6_tokenize_df",
    "f2_salted_two_phase_agg",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "ann_pairs_threshold",
    "text_quality_score",
    "mm_decode_meta",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _plan_counters(txt: str) -> dict:
    return {
        "Exchange": len(re.findall(r"\bExchange\b", txt))
        - len(re.findall(r"\bReusedExchange\b", txt)),
        "ReusedExchange": len(re.findall(r"\bReusedExchange\b", txt)),
        "SortMergeJoin": len(re.findall(r"\bSortMergeJoin\b", txt)),
        "BroadcastHashJoin": len(re.findall(r"\bBroadcastHashJoin\b", txt)),
        "BatchEvalPython": len(re.findall(r"\bBatchEvalPython\b", txt)),
        "ArrowEvalPython": len(re.findall(r"\bArrowEvalPython\b", txt)),
        "Scan parquet": len(re.findall(r"Scan parquet", txt)),
        "Sort": len(re.findall(r"^\s*\(\d+\) Sort\b", txt, re.M)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--plans-dir", default="plans/r06")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ates-measure")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("ATES_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from amazon_textract_enhancer_spark.fixtures import (
        generate_transcripts,
        rows_to_pandas,
    )
    from amazon_textract_enhancer_spark.operators import extraction_queries as _xq
    from amazon_textract_enhancer_spark.operators.registry import SPARK_QUERIES
    from amazon_textract_enhancer_spark.schemas import TRANSCRIPT_SCHEMA
    from amazon_textract_enhancer_spark.stages import extract_spans

    # warmup python workers + fixture tables (mirrors bench.py 0/0b)
    wrows, _ = generate_transcripts(seed=7, n_convs=8)
    wdf = spark.createDataFrame(rows_to_pandas(wrows), schema=TRANSCRIPT_SCHEMA)
    _force(extract_spans(wdf.repartition(CPUS)))
    for _fix in (_xq.fixture_spans, _xq.fixture_blocks, _xq.fixture_nodes):
        _fix(spark, SF_DIR).count()

    names = args.queries or HEADLINE
    os.makedirs(args.plans_dir, exist_ok=True)

    # capture plans once (untimed)
    shapes: dict[str, dict] = {}
    if not args.no_plans:
        for name in names:
            df = SPARK_QUERIES[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(txt)
            shapes[name] = _plan_counters(txt)

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _p in range(args.passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"measure:{name}")
            t0 = time.monotonic()
            _force(SPARK_QUERIES[name](spark, SF_DIR))
            samples[name].append(time.monotonic() - t0)
            spark.sparkContext.setJobDescription(None)

    out = {}
    for name, ts in samples.items():
        s = sorted(ts)
        med = s[len(s) // 2]
        out[name] = {
            "median": round(med, 3),
            "best": round(s[0], 3),
            "spread": round(s[-1] - s[0], 3),
            "samples": [round(x, 3) for x in ts],
            "shape": shapes.get(name),
        }
        print(
            f"{name:32s} med={med:7.3f} best={s[0]:7.3f} "
            f"spread={s[-1]-s[0]:6.3f}  {shapes.get(name)}"
        )
    total_med = round(sum(v["median"] for v in out.values()), 3)
    total_best = round(sum(v["best"] for v in out.values()), 3)
    print(f"TOTAL median={total_med} best={total_best}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"queries": out, "total_median": total_med,
                       "total_best": total_best, "sf_dir": SF_DIR,
                       "cpus": CPUS, "passes": args.passes}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
