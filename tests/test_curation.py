"""Round-3 curation operators: semantic probes on crafted rows (the
oracle-parity sweep covers the fixture corpus; these pin the BEHAVIOR
on inputs built to trip each rule) plus plan-shape assertions."""

from __future__ import annotations

import pyspark.sql.functions as F

from amazon_textract_enhancer_spark.operators import curation as C
from amazon_textract_enhancer_spark.plans import (
    executed_plan,
    n_broadcast_joins,
    n_exchanges,
)

SF_DIR = "/root/testdata/sf0.01"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


# ---------------------------------------------------------------- gopher


def test_gopher_flags_planted_repetitive_doc(spark, monkeypatch):
    clean = "the quick brown fox jumps over a lazy dog near the old river bank today"
    loop = " ".join(["spam ham"] * 20)  # one bigram dominates
    df = _docs(spark, [clean, loop])
    monkeypatch.setattr(
        C, "t", lambda _s, _d, _n: df
    )
    out = {r["doc_id"]: r for r in C.text_gopher_quality(spark, SF_DIR).collect()}
    assert not out[0]["flag_repetitive"]
    assert out[1]["flag_repetitive"]
    # the loop doc's top bigram covers most of its chars and its
    # trigrams are nearly all duplicates
    assert out[1]["top_bigram_char_frac"] > 0.4
    assert out[1]["dup_trigram_frac"] > 0.9
    assert out[0]["dup_trigram_frac"] == 0.0
    # distinct-token ratio is a true ratio
    assert 0 < out[1]["distinct_token_ratio"] < out[0]["distinct_token_ratio"] <= 1


def test_gopher_single_shuffle_pair_plus_join(spark):
    """The bigram mode costs one (doc_id, bigram) aggregation, the
    argmax window and the metrics join — all doc_id-keyed. Assert the
    exchange count stays at that budget (4: partial-agg exchange,
    window sort exchange, and the two join sides) so a regression to
    e.g. a cross join or a global sort shows up here."""
    df = C.text_gopher_quality(spark, SF_DIR)
    assert n_exchanges(df) <= 4, executed_plan(df)


# ------------------------------------------------------------------ pii


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d+x@e-f.org, call 123-456-7890 at 10.0.0.1"),
            (2, "no pii here at all"),
            (3, "v4 addr 192.168.001.200 twice 192.168.001.201"),
        ],
        "doc_id bigint, text string",
    )
    n_e, n_p, n_i, scrub = C.pii_scrub_cols(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            n_e.alias("e"),
            n_p.alias("p"),
            n_i.alias("i"),
            scrub.alias("s"),
        ).collect()
    }
    assert (rows[1]["e"], rows[1]["p"], rows[1]["i"]) == (2, 1, 1)
    assert rows[1]["s"] == "mail <EMAIL> and <EMAIL>, call <PHONE> at <IP>"
    assert (rows[2]["e"], rows[2]["p"], rows[2]["i"]) == (0, 0, 0)
    assert rows[2]["s"] == "no pii here at all"
    assert rows[3]["i"] == 2 and "<IP> twice <IP>" in rows[3]["s"]


def test_pii_scrub_query_is_map_only(spark):
    """regexp count+replace is pure codegen: scan → project with no
    data-derived shuffle. r6: the one allowed exchange is t_spread's
    size-adaptive RoundRobin input re-spread (fixture-scale only;
    false at production sizes)."""
    df = C.text_pii_scrub(spark, SF_DIR)
    n = n_exchanges(df)
    assert n <= 1, executed_plan(df)
    if n == 1:
        assert "RoundRobinPartitioning" in executed_plan(df)
    assert df.filter("n_emails > 0").count() > 0  # the plant is live


# -------------------------------------------------------------- decontam


def test_decontaminate_flags_planted_near_dups(spark):
    """The fixture corpus plants near-duplicate pairs; any pair that
    straddles the eval/corpus md5 split must surface as contamination,
    and every contaminated doc's overlap must be >= the threshold."""
    out = C.decontaminate_ngram_overlap(spark, SF_DIR)
    rows = out.collect()
    contaminated = [r for r in rows if r["contaminated"]]
    assert len(contaminated) > 0
    assert all(r["overlap_frac"] >= C.DECONTAM_OVERLAP_MIN for r in contaminated)
    assert all(
        r["overlap_frac"] < C.DECONTAM_OVERLAP_MIN
        for r in rows
        if not r["contaminated"]
    )
    # eval docs themselves never appear in the output
    eval_ids = {
        r["doc_id"]
        for r in out.sparkSession.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0")
        .collect()
    }
    assert eval_ids.isdisjoint({r["doc_id"] for r in rows})


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The eval n-gram set is the small side by construction (real
    benchmark suites are tiny) — the hit join must be a broadcast, so
    the corpus-side n-gram scan never shuffles on shingle content."""
    df = C.decontaminate_ngram_overlap(spark, SF_DIR)
    assert n_broadcast_joins(df) >= 1, executed_plan(df)
    plan = executed_plan(df)
    # exactly ONE shingle-keyed exchange: the tiny eval side's
    # distinct. A second one would mean the corpus-side n-gram stream
    # is being shuffled for the join — the regression this guards.
    shingle_exchanges = sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning(shingle" in line
    )
    assert shingle_exchanges == 1, plan


# -------------------------------------------------------------- quantize


def test_quantize_error_bounded_by_step_size(spark):
    """Symmetric int8: |x - x̂| <= scale/254 + rounding slack for every
    element, per construction. max_abs_err must respect the bound for
    the worst (largest-norm) vector; unit-norm-ish fixture embeddings
    have scale <= 1."""
    rows = C.embed_quantize_error(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 < r["avg_rmse"] < r["max_abs_err"]
        assert r["max_abs_err"] <= 1.0 / 254 + 1e-6
        assert r["n_vecs"] > 0


def test_quantize_zero_vector_is_safe(spark):
    """The 1e-12 scale floor keeps all-zero vectors from dividing by
    zero: error must be exactly 0, not NaN."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0], 0)],
        "vec_id bigint, embedding array<float>, label int",
    )
    import amazon_textract_enhancer_spark.operators.curation as cur

    orig, orig_sp = cur.t, cur.t_spread
    try:
        cur.t = lambda _s, _d, _n: df
        cur.t_spread = lambda _s, _d, _n: df  # r6: reads via t_spread
        row = cur.embed_quantize_error(spark, SF_DIR).collect()[0]
    finally:
        cur.t, cur.t_spread = orig, orig_sp
    assert row["avg_rmse"] == 0.0 and row["max_abs_err"] == 0.0


def test_quantize_is_single_agg_exchange(spark):
    """All per-vector math is higher-order expressions in the scan
    projection; the only data shuffle is the label rollup (plus, r6,
    t_spread's size-adaptive RoundRobin input re-spread at fixture
    scale)."""
    df = C.embed_quantize_error(spark, SF_DIR)
    n = n_exchanges(df)
    assert n <= 2, executed_plan(df)
    if n == 2:
        assert "RoundRobinPartitioning" in executed_plan(df)


# ---------------------------------------------------------- temperature


def test_temperature_upsamples_tail_languages(spark):
    """alpha=0.5 keep rates must be anti-monotone in language size
    (smaller langs keep a larger fraction), expected kept total close
    to target_frac*N, and the keep decision reproducible (same output
    on a second run)."""
    out = C.sample_temperature(spark, SF_DIR)
    rows = out.collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_by_lang = {r["lang"]: r["n"] for r in
                 docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    rate_by_lang = {r["lang"]: r["keep_rate"] for r in rows}
    langs = sorted(n_by_lang, key=n_by_lang.get)
    rates = [rate_by_lang[lang] for lang in langs if lang in rate_by_lang]
    assert rates == sorted(rates, reverse=True)  # smaller lang → higher rate
    n_total = sum(n_by_lang.values())
    assert abs(len(rows) - C.TEMP_TARGET_FRAC * n_total) < 0.1 * n_total
    again = {(r["doc_id"]) for r in C.sample_temperature(spark, SF_DIR).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_temperature_is_broadcast_mapside(spark):
    """The rate table is broadcast back: exactly ONE lang-keyed
    exchange in the whole plan — the per-lang count agg (map-side
    combined, rows = n_langs per task). A second one would mean the
    corpus is being shuffled for the rate join instead of receiving
    the broadcast."""
    df = C.sample_temperature(spark, SF_DIR)
    assert n_broadcast_joins(df) >= 1, executed_plan(df)
    plan = executed_plan(df)
    lang_exchanges = sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning(lang" in line
    )
    assert lang_exchanges == 1, plan


def test_curation_funnel_is_monotone(spark):
    """Stage counts can only shrink: n_docs >= n_survivors >= n_clean
    >= n_final per language, every stage non-degenerate overall (each
    filter removes something somewhere, nothing removes everything)."""
    rows = C.curation_funnel(spark, SF_DIR).collect()
    assert len(rows) > 1
    for r in rows:
        assert r["n_docs"] >= r["n_survivors"] >= r["n_clean"] >= r["n_final"] >= 0
    tot = {k: sum(r[k] for r in rows)
           for k in ("n_docs", "n_survivors", "n_clean", "n_final")}
    assert tot["n_docs"] > tot["n_survivors"]       # dedup dropped someone
    assert tot["n_clean"] > tot["n_final"] > 0      # sampling dropped someone


# -------------------------------------------------------------- chunking


def test_chunk_documents_reconstructs_and_overlaps(spark):
    """Chunk invariants on the fixture corpus: deterministic
    (doc_id, chunk_idx) keys starting at 0 with no gaps; every chunk
    except possibly the last has exactly CHUNK_TOKENS tokens; stride
    overlap means consecutive chunks share window-stride tokens; and
    concatenating each chunk's first `stride` tokens plus the final
    chunk's tail reconstructs the original token stream exactly."""
    out = C.chunk_documents(spark, SF_DIR).collect()
    docs = {r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()}
    import re as _re
    from collections import defaultdict

    by_doc = defaultdict(dict)
    for r in out:
        by_doc[r["doc_id"]][r["chunk_idx"]] = r
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        idxs = sorted(chunks)
        assert idxs == list(range(len(idxs)))
        toks = [x for x in _re.split("[^a-z0-9]+", docs[doc_id].lower()) if x]
        rebuilt = []
        for i in idxs:
            ct = chunks[i]["chunk_text"].split(" ")
            assert len(ct) == chunks[i]["chunk_tokens"]
            if i < idxs[-1]:
                assert len(ct) == C.CHUNK_TOKENS
                rebuilt.extend(ct[: C.CHUNK_STRIDE])
                # overlap: this chunk's tail == next chunk's head
                nxt = chunks[i + 1]["chunk_text"].split(" ")
                ov = C.CHUNK_TOKENS - C.CHUNK_STRIDE
                assert ct[-ov:] == nxt[:ov]
            else:
                rebuilt.extend(ct)
        assert rebuilt == toks, doc_id


def test_chunk_documents_is_shuffle_free(spark):
    """Chunking is a map-side fan-out: zero exchanges."""
    df = C.chunk_documents(spark, SF_DIR)
    assert n_exchanges(df) == 0, executed_plan(df)


def test_chunk_documents_rejects_gap_strides(spark):
    """ADVICE r3: stride > window leaves uncovered token gaps and
    emits empty chunks with a phantom token count of 1 — reject the
    parameterization instead."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="stride"):
        C.chunk_documents(spark, SF_DIR, window_tokens=8, stride=9)
    with _pytest.raises(ValueError, match="stride"):
        C.chunk_documents(spark, SF_DIR, stride=0)
    # stride == window (no overlap, no gap) stays legal
    C.chunk_documents(spark, SF_DIR, window_tokens=8, stride=8)


def test_greedy_packing_respects_hard_cap(spark):
    """pack_context_windows_greedy: every window total <= W unless the
    window holds exactly one doc that alone exceeds W; window ids per
    lang are contiguous from 0; and it agrees with the offset-binned
    form whenever the latter does not overflow."""
    from amazon_textract_enhancer_spark.operators.textstats import (
        PACK_WINDOW_TOKENS,
        pack_context_windows_greedy,
    )

    rows = pack_context_windows_greedy(spark, SF_DIR).collect()
    from collections import defaultdict

    wins = defaultdict(list)
    for r in rows:
        wins[(r["lang"], r["window_id"])].append(r["n_tokens"])
    for (lang, wid), toks in wins.items():
        total = sum(toks)
        assert total <= PACK_WINDOW_TOKENS or len(toks) == 1, (lang, wid)
    for lang in {r["lang"] for r in rows}:
        ids = sorted({r["window_id"] for r in rows if r["lang"] == lang})
        assert ids == list(range(len(ids))), lang


def test_repeated_spans_detects_planted_dup_boilerplate(spark):
    """Span-level dedup: the planted near-dup pairs share long token
    runs, so k=20 spans recur across docs; every reported span must be
    in >= SPAN_MIN_DOCS docs with occurrences >= doc count, and a
    shuffled-partition rerun returns the identical fingerprint set
    (map-side hashing is partition-agnostic)."""
    from amazon_textract_enhancer_spark.operators.curation import (
        SPAN_MIN_DOCS,
        dedup_repeated_spans,
    )

    rows = dedup_repeated_spans(spark, SF_DIR).collect()
    assert len(rows) > 100  # the planted dups guarantee a rich set
    for r in rows:
        assert r["n_docs"] >= SPAN_MIN_DOCS
        assert r["n_occurrences"] >= r["n_docs"]
        assert len(r["span_fp"]) == 32
    again = {r["span_fp"] for r in dedup_repeated_spans(spark, SF_DIR).collect()}
    assert again == {r["span_fp"] for r in rows}


def test_repeated_spans_single_exchange(spark):
    """No pair join anywhere: one fingerprint-keyed aggregation is the
    only exchange."""
    from amazon_textract_enhancer_spark.operators.curation import (
        dedup_repeated_spans,
    )

    df = dedup_repeated_spans(spark, SF_DIR)
    assert n_exchanges(df) <= 2, executed_plan(df)  # partial+final agg pair


# ------------------------------------------------- conv-prefix dedup


def test_conv_prefix_dedup_planted_retries(spark):
    """Every 7th conv gets a planted '-retry' twin sharing its first-k
    turns: those pairs (and ONLY those) must land in size-2 groups,
    with the original kept as canonical; everything else is singleton."""
    from amazon_textract_enhancer_spark.operators.extraction_queries import (
        RETRY_MOD,
        x_conv_prefix_dedup,
    )

    out = x_conv_prefix_dedup(spark, "/root/testdata/sf0.001").toPandas()
    retries = out[out.conv_id.str.endswith("-retry")]
    originals = out[~out.conv_id.str.endswith("-retry")]
    assert len(retries) == sum(
        1 for i in range(len(originals)) if i % RETRY_MOD == 0
    )
    # each retry pairs with exactly its origin conv
    for _, r in retries.iterrows():
        origin = r.conv_id[: -len("-retry")]
        o = out[out.conv_id == origin].iloc[0]
        assert o.prefix_fp == r.prefix_fp
        assert o.group_size == 2 and r.group_size == 2
        assert bool(o.keep) and not bool(r.keep)
    # non-retry convs that aren't origins are singletons, all kept
    origin_ids = {r.conv_id[: -len("-retry")] for _, r in retries.iterrows()}
    solo = originals[~originals.conv_id.isin(origin_ids)]
    assert (solo.group_size == 1).all() and solo.keep.all()


# ------------------------------------------------- LR quality classifier


def test_quality_lr_separates_learnable_label(spark, monkeypatch):
    """On a corpus where the label IS learnable (disjoint per-class
    vocabularies), two GD steps must already separate the classes:
    every en doc scores above every de doc and preds match labels."""
    en = ["alpha beta gamma delta epsilon zeta", "beta gamma alpha zeta delta",
          "gamma alpha beta epsilon zeta delta", "delta epsilon alpha beta gamma"]
    de = ["eins zwei drei vier funf sechs", "zwei drei eins sechs vier",
          "drei eins zwei funf sechs vier", "vier funf eins zwei drei"]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(en)] + [
        (100 + i, t, "de", "s", len(t)) for i, t in enumerate(de)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    monkeypatch.setattr(C, "t", lambda _s, _d, _n: df)
    out = C.text_quality_lr(spark, SF_DIR).toPandas()
    assert len(out) == 8
    en_scores = out[out.lang == "en"].lr_score
    de_scores = out[out.lang == "de"].lr_score
    assert en_scores.min() > de_scores.max()
    assert (out.pred.astype(int) == out.label).all()


def test_quality_lr_iteration_one_is_exact_half(spark, monkeypatch):
    """w0 = 0 means iteration 1's probabilities are EXACTLY 0.5 — the
    determinism anchor: with a single balanced pair and symmetric
    features, the learned bias stays 0 and scores are symmetric
    around 0.5."""
    rows = [(1, "aa bb aa bb", "en", "s", 11), (2, "cc dd cc dd", "de", "s", 11)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    monkeypatch.setattr(C, "t", lambda _s, _d, _n: df)
    out = C.text_quality_lr(spark, SF_DIR).toPandas().set_index("doc_id")
    s_en, s_de = out.loc[1, "lr_score"], out.loc[2, "lr_score"]
    assert s_en > 0.5 > s_de
    assert abs((s_en - 0.5) - (0.5 - s_de)) <= 2e-4


def test_dpo_pairs_from_retry_families(spark):
    """Every retry family yields exactly one preference pair whose
    prompt is the shared k-turn prefix, whose chosen text is the
    original turn k, and whose rejected text is the planted
    divergence — never equal to chosen."""
    from amazon_textract_enhancer_spark.operators.extraction_queries import (
        PREFIX_K,
        x_dpo_pairs,
    )

    from amazon_textract_enhancer_spark.operators.extraction_queries import (
        fixture_transcripts,
    )

    sf = "/root/testdata/sf0.001"
    out = x_dpo_pairs(spark, sf).toPandas()
    raw = fixture_transcripts(spark, sf).toPandas()
    assert len(out) >= 1
    for _, r in out.iterrows():
        turns = raw[raw.conv_id == r.conv_id].sort_values("turn_idx")
        want = "\n".join(
            f"{t.role}: {t.text}" for t in turns.head(PREFIX_K).itertuples()
        )
        assert r.prompt == want
        assert r.chosen == turns.iloc[PREFIX_K].text
        assert r.rejected.startswith("retry divergence ")
        assert r.chosen != r.rejected
        assert not r.conv_id.endswith("-retry")


def test_leakage_safe_split_keeps_near_dups_together(spark):
    """Every near-dup pair must land on the SAME side of the split —
    the invariant a doc-keyed random split violates."""
    from amazon_textract_enhancer_spark.operators.dedup import (
        dedup_ngram_jaccard,
        split_leakage_safe,
    )

    sf = "/root/testdata/sf0.01"
    split = split_leakage_safe(spark, sf).toPandas().set_index("doc_id")
    pairs = dedup_ngram_jaccard(spark, sf).toPandas()
    assert len(pairs) > 0
    for _, p in pairs.iterrows():
        assert split.loc[p.doc_a, "split"] == split.loc[p.doc_b, "split"]
    assert set(split.split) == {"train", "holdout"}


def test_quality_lr_model_joins_are_broadcast(spark):
    """The 257-row model table must be broadcast onto the feature
    stream in the scoring joins — a shuffle there would move the
    corpus-sized feature table per iteration."""
    df = C.text_quality_lr(spark, SF_DIR)
    assert n_broadcast_joins(df) >= 2, executed_plan(df)


def test_sample_importance_weight_table_is_broadcast(spark):
    """The 256-row bucket log-weight table is broadcast back onto the
    feature stream; exchange budget: feature agg, totals window,
    final doc agg."""
    df = C.sample_importance(spark, SF_DIR)
    assert n_broadcast_joins(df) >= 1, executed_plan(df)
    assert n_exchanges(df) <= 3, executed_plan(df)


def test_norm_outliers_flag_exactly_the_planted_set(spark):
    """The planted broken-encoder vectors (every 97th exploded 3x,
    every 101st collapsed to 0.01x) must be flagged — all of them and
    nothing else."""
    from amazon_textract_enhancer_spark.operators.similarity import (
        embed_norm_outliers,
    )

    out = embed_norm_outliers(spark, SF_DIR).toPandas()
    planted = {i for i in out.vec_id if i % 97 == 0 or i % 101 == 0}
    assert set(out[out.is_outlier].vec_id) == planted
    assert len(planted) > 0


def test_cdc_chunks_realign_after_insertion(spark, monkeypatch):
    """The CDC property fixed-k spans lack: inserting a token before a
    hash-gated boundary leaves every chunk FROM that boundary on
    identical, so the two docs still share the suffix chunk.
    ('gamma' has md5 starting '0' -> it opens a chunk.)"""
    from amazon_textract_enhancer_spark.operators import dedup as D

    a = "one two three gamma tail words here"
    b = "one two INSERTED three gamma tail words here"
    df = spark.createDataFrame(
        [(1, a, "en", "s", len(a)), (2, b, "en", "s", len(b))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    monkeypatch.setattr(D, "t", lambda _s, _d, _n: df)
    out = D.dedup_cdc_chunks(spark, SF_DIR).toPandas()
    # the suffix chunk 'gamma tail words here' is shared by both docs
    shared = out[out.n_docs == 2]
    assert len(shared) >= 1
    assert (shared.n_tokens == 4).any()


def test_contrastive_triplets_alignment_and_negatives(spark):
    """Every triplet's (anchor, positive) is a real user→assistant
    adjacency in its conversation, the negative is genuine assistant
    text from the reported OTHER conversation, and no negative ever
    comes from the anchor's own conversation (the half-pool-stride
    fallback) — at both driver fixture sizes. Deterministic across
    invocations (the hash draw has no RNG)."""
    from amazon_textract_enhancer_spark.operators.extraction_queries import (
        fixture_transcripts,
        x_contrastive_triplets,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        out = x_contrastive_triplets(spark, sf).toPandas()
        raw = fixture_transcripts(spark, sf).toPandas()
        assert len(out) >= 1
        assert (out.neg_conv != out.conv_id).all()
        idx = raw.set_index(["conv_id", "turn_idx"])
        for _, r in out.head(25).iterrows():
            assert idx.loc[(r.conv_id, r.turn_idx)].role == "user"
            assert idx.loc[(r.conv_id, r.turn_idx)].text == r.anchor
            nxt = idx.loc[(r.conv_id, r.turn_idx + 1)]
            assert nxt.role == "assistant" and nxt.text == r.positive
            negs = raw[(raw.conv_id == r.neg_conv) & (raw.role == "assistant")]
            assert (negs.text == r.negative).any()
        again = x_contrastive_triplets(spark, sf).toPandas()
        assert out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).equals(
            again.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )


# ------------------------------------------------------- bloom decontam


def test_bloom_decontaminate_matches_exact_operator(spark):
    """The Bloom gate is a candidate pre-filter whose false positives
    die in the exact verify join — so the bloom-gated operator must be
    ROW-IDENTICAL to the exact one on the same corpus."""
    exact = sorted(
        map(tuple, C.decontaminate_ngram_overlap(spark, SF_DIR).collect())
    )
    gated = sorted(map(tuple, C.decontaminate_bloom(spark, SF_DIR).collect()))
    assert gated == exact
    assert len(exact) > 0


def test_bloom_gate_keeps_members_and_drops_most_nonmembers(spark):
    """Direct unit test of the filter primitives: every true member
    survives the gate (no false negatives, the Bloom guarantee) and
    the non-member pass-through rate is far below 1 (the gate actually
    gates — at m=2^18/j=3 and ~100 set n-grams the FP rate is ~0)."""
    members = spark.createDataFrame(
        [(f"ngram {i} x",) for i in range(100)], "shingle string"
    )
    words = C._bloom_word_table(members)
    probe = spark.createDataFrame(
        [(f"ngram {i} x",) for i in range(100)]
        + [(f"other {i} y",) for i in range(2000)],
        "shingle string",
    )
    kept = {r["shingle"] for r in C._bloom_gate(probe, words).collect()}
    assert all(f"ngram {i} x" in kept for i in range(100))
    false_pos = len(kept) - 100
    assert false_pos <= 20, f"bloom passed {false_pos}/2000 non-members"


def test_bloom_plan_probes_are_broadcast_and_verify_is_shuffled(spark):
    """Plan shape: the three Bloom probes are map-side broadcast-hash
    joins (the corpus n-gram stream never shuffles to be gated), and
    the verify join is the hinted ShuffledHashJoin — the shape that
    holds when the eval side is too big to broadcast."""
    df = C.decontaminate_bloom(spark, SF_DIR)
    plan = executed_plan(df)
    assert n_broadcast_joins(df) >= C.BLOOM_HASHES, plan
    assert "ShuffledHashJoin" in plan, plan


# ---------------------------------------------------------------- novelty


def test_novelty_first_bucket_attribution(spark, monkeypatch):
    """Hand-built two-bucket corpus: bucket 0 is all-novel by
    definition; bucket 1 repeats 3 of its 4 n-gram types, so its
    novelty rate is exactly 0.25."""
    df = spark.createDataFrame(
        [
            (0, "a b c d"),  # bucket 0: "a b c", "b c d"
            (1, "e f g"),    # bucket 0: "e f g"
            (2, "a b c d"),  # bucket 1: repeats both
            (3, "e f g h"),  # bucket 1: "e f g" repeat, "f g h" novel
        ],
        "doc_id bigint, text string",
    )
    monkeypatch.setattr(C, "t", lambda _s, _d, _n: df)
    out = {
        r["bucket"]: r
        for r in C.text_novelty_by_bucket(
            spark, SF_DIR, bucket_docs=2
        ).collect()
    }
    assert out[0]["n_distinct_ngrams"] == 3
    assert out[0]["n_novel"] == 3
    assert out[0]["novelty_rate"] == 1.0
    assert out[1]["n_distinct_ngrams"] == 4
    assert out[1]["n_novel"] == 1
    assert out[1]["novelty_rate"] == 0.25


def test_novelty_shuffles_are_ngram_keyed_once(spark):
    """The heavy lifting is the distinct (bucket, shingle) pass and the
    min-bucket attribution — both shingle-keyed, and Catalyst must
    reuse the distinct's exchange for the attribution instead of
    re-shuffling the corpus."""
    df = C.text_novelty_by_bucket(spark, SF_DIR)
    plan = executed_plan(df)
    shingle_exchanges = sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning(shingle" in line
    )
    assert shingle_exchanges <= 2, plan
    assert "ReusedExchange" in plan or shingle_exchanges == 1, plan


# ---------------------------------------------------- priority sampling


def test_priority_sampling_prefers_heavy_weights(spark, monkeypatch):
    """Efraimidis-Spirakis semantics: with weights 10^5 vs 10, the
    heavy docs dominate the per-stratum top-k (u^(1/w) -> 1 as w
    grows). Deterministic given the md5 draws, so the assertion is
    exact, not statistical."""
    from amazon_textract_enhancer_spark.operators import textstats as T

    rows = [(i, "x" * (100_000 if i < 5 else 10), "en", "s", 100_000 if i < 5 else 10)
            for i in range(100)]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    monkeypatch.setattr(T, "t", lambda _s, _d, _n: df)
    got = T.sample_priority_weighted(spark, "ignored").collect()
    assert len(got) == T.PRIORITY_SAMPLE_K
    heavy = sum(1 for r in got if r["doc_id"] < 5)
    assert heavy >= 4, [(r["doc_id"], r["priority"]) for r in got]
    # ranks are 1..k and priorities are non-increasing
    ranked = sorted(got, key=lambda r: r["rank_in_stratum"])
    assert [r["rank_in_stratum"] for r in ranked] == list(range(1, 6))
    ps = [r["priority"] for r in ranked]
    assert ps == sorted(ps, reverse=True)


def test_contrastive_triplets_single_conversation_pool_is_empty_on_both_engines(
    spark, tmp_path, monkeypatch
):
    """ADVICE r5: with ONE assistant-bearing conversation the negative
    draw is h % (pool_n - 1) — modulo by zero. Spark used to yield null
    and silently drop every anchor while the DuckDB twin raised: a
    cross-engine divergence. Both engines now agree via an explicit
    pool_n > 1 guard — the triplet set is EMPTY (no other conversation
    exists to draw a negative from), and neither engine errors."""
    import duckdb

    from amazon_textract_enhancer_spark.operators import extraction_queries as xq
    from amazon_textract_enhancer_spark.operators.registry import (
        ORACLE_SQL,
        _XTRANS,
    )

    tiny = spark.createDataFrame(
        [
            ("c1", 0, "user", "question one", None),
            ("c1", 1, "assistant", "answer one", None),
            ("c1", 2, "user", "question two", None),
            ("c1", 3, "assistant", "answer two", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    p = str(tmp_path / "single_conv.parquet")
    tiny.toPandas().to_parquet(p)

    monkeypatch.setattr(xq, "fixture_transcripts", lambda s, d: tiny)
    got = xq.x_contrastive_triplets(spark, "unused")
    assert got.count() == 0  # empty, not nulls, not an error

    sql = ORACLE_SQL["x_contrastive_triplets"].replace(_XTRANS, p)
    oracle = duckdb.sql(sql).fetchall()
    assert oracle == []  # twin agrees: empty, no modulo-by-zero error
