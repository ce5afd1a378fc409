"""The Spark pipeline must match the COMMITTED golden parquet
(tests/goldens/, produced by make_goldens.py from the single-node
oracle). Unlike the live-computed goldens, this pins behavior across
rounds: a generator+core co-drift fails HERE even when the two still
agree with each other.
"""

from __future__ import annotations

import json
import os

GOLDEN = os.path.join(
    os.path.dirname(__file__), "goldens", "golden_spans_seed42_n25.parquet"
)


def test_pipeline_matches_committed_goldens(spark, transcripts_df):
    from amazon_textract_enhancer_spark.stages import extract_spans

    golden = {
        (r["conv_id"], r["turn_idx"]): r
        for r in spark.read.parquet(GOLDEN).collect()
    }
    got = extract_spans(transcripts_df).orderBy("conv_id", "turn_idx").collect()
    assert len(got) == len(golden) > 400
    for r in got:
        g = golden[(r["conv_id"], r["turn_idx"])]
        assert r["extracted_text"] == g["extracted_text"], (r["conv_id"], r["turn_idx"])
        assert r["kind"] == g["kind"]
        assert len(r["tables"]) == g["n_tables"]
        assert len(r["forms"]) == g["n_forms"]
        assert bool(r["counters"]["skipped"]) == g["skipped"]
        want_tables = json.loads(g["tables_json"])
        for tb, wt in zip(r["tables"], want_tables):
            assert tb["csv"] == wt["csv"]
            assert (tb["n_rows"], tb["n_cols"]) == (wt["n_rows"], wt["n_cols"])
        want_forms = json.loads(g["forms_json"])
        for f, wf in zip(r["forms"], want_forms):
            assert (f["key"], f["value"]) == (wf["key"], wf["value"])
