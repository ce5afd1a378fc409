"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Generates the north-rule input table
``(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)`` — BASELINE.json:15 — as plain Python rows,
seed-fixed (``random.Random(seed)``), no wall clock, no uuid4.

Alongside each row it emits the *generation-intent golden*: what a
correct extractor must produce for that payload. The goldens are NOT
computed by running the extractor (that would make tests circular) —
they are what the generator deliberately planted:

- html:   golden text = the ``<p>`` main-content texts joined by "\\n";
          boilerplate (nav/header/footer/aside links, script/style,
          short noise divs) must vanish.
- layout: golden text = non-table, non-KV lines in (page, y, x) order;
          golden tables = planted grids (1-based row/col); golden forms
          = planted "Key: Value" pairs.
- plain:  golden text = input with per-line trailing whitespace stripped.

Conversation-length skew per FIXTURES.md: 90% 5–20 turns, 9% 50–200,
1% whales (exercises salting F2). Rows are emitted in a seeded shuffled
order — stable (conv_id, turn_idx) ordering is the pipeline's job (F5).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu amber basalt cedar dune ember fjord garnet "
    "harbor inlet jasper krill lagoon marble nectar onyx prairie quartz "
    "reef summit tundra umber vortex willow zenith orbit pixel quantum "
    "raster stream tensor vector"
).split()

_KEY_WORDS = ("Invoice Total Status Owner Region Priority Vendor Amount "
              "Date Category Account Reference").split()

_ROLES = ("user", "assistant", "tool")
_TOOLS = ("search", "python", "browser")

GRID_XS = (200.0, 320.0, 440.0, 560.0, 680.0)


def _sentence(rng: random.Random, lo: int, hi: int) -> str:
    n = rng.randint(lo, hi)
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _short(rng: random.Random, max_words: int = 2) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, max_words)))


# ---------------------------------------------------------------- html
def _gen_html(rng: random.Random) -> tuple[str, dict]:
    parts = ["<html><head><title>", _short(rng), "</title>"]
    if rng.random() < 0.5:
        parts.append("<style>body{margin:0} .x{color:#888}</style>")
    parts.append("</head><body>")
    # nav: link-dense boilerplate
    parts.append("<nav><ul>")
    for _ in range(rng.randint(3, 6)):
        parts.append(f'<li><a href="#">{_short(rng, 3)}</a></li>')
    parts.append("</ul></nav>")
    parts.append(f"<header><h1>{_short(rng)}</h1></header>")
    # noise divs (nested, short text -> below MIN_CONTENT_CHARS)
    def noise(depth: int) -> str:
        if depth <= 0:
            return f"<div>{_short(rng, 2)}</div>"
        return f"<div>{_short(rng, 2)}{noise(depth - 1)}</div>"
    if rng.random() < 0.7:
        parts.append(noise(rng.randint(1, 7)))
    # main content
    golden_ps: list[str] = []
    golden_tables: list[dict] = []
    golden_forms: list[dict] = []
    parts.append("<main><article>")
    for _ in range(rng.randint(1, 10)):
        p = _sentence(rng, 8, 20)
        if rng.random() < 0.5:
            p += ". " + _sentence(rng, 8, 16)
        golden_ps.append(p)
        parts.append(f"<p>{p}</p>")
    if rng.random() < 0.4:  # structured <table> → TABLE_SPAN
        r, c = rng.randint(2, 4), rng.randint(2, 3)
        rows = []
        parts.append("<table>")
        for ri in range(r):
            parts.append("<tr>")
            row = []
            for _ci in range(c):
                cell = _short(rng, 2)
                row.append(cell)
                tag = "th" if ri == 0 else "td"
                parts.append(f"<{tag}>{cell}</{tag}>")
            rows.append(row)
            parts.append("</tr>")
        parts.append("</table>")
        golden_tables.append({"page": 1, "n_rows": r, "n_cols": c, "rows": rows})
    if rng.random() < 0.3:  # <dl> definition list → KV_SPAN
        parts.append("<dl>")
        for _ in range(rng.randint(1, 3)):
            k = rng.choice(_KEY_WORDS)
            v = _short(rng, 3)
            parts.append(f"<dt>{k}</dt><dd>{v}</dd>")
            golden_forms.append({"key": k, "value": v, "page": 1})
        parts.append("</dl>")
    parts.append("</article></main>")
    if rng.random() < 0.6:
        parts.append("<aside>")
        for _ in range(rng.randint(2, 4)):
            parts.append(f'<a href="#">{_short(rng, 3)}</a>')
        parts.append("</aside>")
    if rng.random() < 0.5:
        parts.append("<script>var q=1;function f(){return q+1}</script>")
    parts.append("<footer><a href='#'>" + _short(rng, 2) + "</a></footer>")
    parts.append("</body></html>")
    golden = {
        "kind": "html",
        "text": "\n".join(golden_ps),
        "tables": golden_tables,
        "forms": golden_forms,
    }
    return "".join(parts), golden


# -------------------------------------------------------------- layout
def _gen_layout(rng: random.Random) -> tuple[str, dict]:
    lines: list[str] = []
    golden_lines: list[str] = []
    golden_tables: list[dict] = []
    golden_forms: list[dict] = []
    n_pages = rng.randint(1, 2)
    for page in range(1, n_pages + 1):
        y = 20.0
        n_grids = rng.randint(0, 2)
        n_kv = rng.randint(0, 5)
        n_plain = rng.randint(2, 8)
        # interleave: plain, maybe grid, plain, maybe kv ... deterministic order
        items: list[str] = ["plain"] * n_plain + ["grid"] * n_grids + ["kv"] * n_kv
        rng.shuffle(items)
        # ensure two grids are never adjacent (they would merge if the
        # column signature matched); separate with a plain line
        fixed: list[str] = []
        for it in items:
            if it == "grid" and fixed and fixed[-1] == "grid":
                fixed.append("plain")
            fixed.append(it)
        for it in fixed:
            if it == "plain":
                t = _sentence(rng, 4, 10)
                lines.append(f"x=50.0 y={y} page={page} | {t}")
                golden_lines.append(t)
                y += 12.0
            elif it == "kv":
                k = rng.choice(_KEY_WORDS)
                v = _short(rng, 3)
                lines.append(f"x=50.0 y={y} page={page} | {k}: {v}")
                golden_forms.append({"key": k, "value": v, "page": page})
                y += 12.0
            else:  # grid
                r = rng.randint(2, 4)
                c = rng.randint(2, 4)
                xs = GRID_XS[:c]
                rows: list[list[str]] = []
                for ri in range(r):
                    row = []
                    for ci in range(c):
                        cell = _short(rng, 2)
                        row.append(cell)
                        lines.append(f"x={xs[ci]} y={y} page={page} | {cell}")
                    rows.append(row)
                    y += 12.0
                golden_tables.append(
                    {"page": page, "n_rows": r, "n_cols": c, "rows": rows}
                )
    golden = {
        "kind": "layout",
        "text": "\n".join(golden_lines),
        "tables": golden_tables,
        "forms": golden_forms,
    }
    return "\n".join(lines), golden


# --------------------------------------------------------------- plain
def _gen_plain(rng: random.Random) -> tuple[str, dict]:
    if rng.random() < 0.08:  # empty payload → D6 skip path
        return "", {"kind": "plain", "text": "", "tables": [], "forms": []}
    raw_lines = []
    golden_lines = []
    for _ in range(rng.randint(2, 8)):
        t = _sentence(rng, 5, 14).replace(":", "")
        trail = " " * rng.randint(0, 3)
        raw_lines.append(t + trail)
        golden_lines.append(t)
    return "\n".join(raw_lines), {
        "kind": "plain",
        "text": "\n".join(golden_lines),
        "tables": [],
        "forms": [],
    }


# ------------------------------------------------------------- driver
def conv_length(rng: random.Random, scale: float) -> int:
    p = rng.random()
    if p < 0.90:
        return rng.randint(5, 20)
    if p < 0.99:
        return rng.randint(50, 200)
    return max(1000, int(50 * scale))


def generate_conversation(
    rng: random.Random,
    conv_idx: int,
    scale: float = 1.0,
    whale_cap: int | None = None,
    with_goldens: bool = True,
) -> tuple[list[dict], list[dict]]:
    """One conversation's (rows, goldens) from the given rng — the
    shared kernel of the sequential small-sf generator and the
    per-conv-seeded distributed generator."""
    conv_id = f"conv{conv_idx:08d}"
    n_turns = conv_length(rng, scale)
    if whale_cap is not None:
        n_turns = min(n_turns, whale_cap)
    role_off = rng.randint(0, 2)
    rows: list[dict] = []
    goldens: list[dict] = []
    for t in range(n_turns):
        role = _ROLES[(t + role_off) % 3]
        p = rng.random()
        if p < 0.5:
            text, golden = _gen_html(rng)
        elif p < 0.8:
            text, golden = _gen_layout(rng)
        else:
            text, golden = _gen_plain(rng)
        tool = rng.choice(_TOOLS) if role == "tool" else None
        ts = _EPOCH + timedelta(seconds=conv_idx * 3600 + t * 7)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": ts,
            }
        )
        if with_goldens:
            golden["conv_id"] = conv_id
            golden["turn_idx"] = t
            goldens.append(golden)
    return rows, goldens


def generate_transcripts(
    seed: int = 42,
    n_convs: int = 20,
    scale: float = 1.0,
    with_goldens: bool = True,
    whale_cap: int | None = None,
) -> tuple[list[dict], list[dict]]:
    """Returns (rows, goldens). Rows are seed-shuffled; goldens are in
    generation order keyed by (conv_id, turn_idx)."""
    rng = random.Random(seed)
    rows: list[dict] = []
    goldens: list[dict] = []
    for i in range(n_convs):
        r, g = generate_conversation(rng, i, scale, whale_cap, with_goldens)
        rows.extend(r)
        goldens.extend(g)
    rng.shuffle(rows)  # never pre-sorted (F5 is the pipeline's job)
    return rows, goldens


def generate_transcripts_distributed(
    spark,
    n_convs: int,
    seed: int = 42,
    scale: float = 1.0,
    whale_cap: int | None = None,
):
    """The sf>=1 generation path: per-conversation seeded rngs
    (``Random(f"{seed}|{conv_idx}")``) inside one mapInArrow stage over
    ``spark.range(n_convs)`` — generation is embarrassingly parallel,
    partition-count agnostic (each conv depends only on its own index),
    and never materializes on the driver. A 100-TB fixture corpus is a
    ``spark.range`` width change.

    NOTE: per-conv seeding necessarily produces a DIFFERENT (equally
    deterministic) corpus than the sequential single-rng generator the
    oracle-checked small-sf fixture uses — the two must not be mixed
    within one sf. ``extraction_queries.fixture_transcripts`` switches
    to this path above _DISTRIBUTED_GEN_MIN_CONVS, where no single-node
    oracle exists anyway."""
    from collections.abc import Iterator

    import pyarrow as pa

    from .schemas import TRANSCRIPT_SCHEMA

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(TRANSCRIPT_SCHEMA)
        names = [f.name for f in arrow_schema]
        for rb in batches:
            out: list[dict] = []
            for i in rb.column(0).to_pylist():
                rng = random.Random(f"{seed}|{i}")
                rows, _ = generate_conversation(
                    rng, i, scale, whale_cap, with_goldens=False
                )
                out.extend(rows)
            arrays = [
                pa.array([r[n] for r in out], arrow_schema.field(n).type)
                for n in names
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    # a handful of convs per task: whale conversations make generation
    # time per conv heavy-tailed, so small partitions level the load
    n_parts = max(8, n_convs // 64)
    return spark.range(0, n_convs, numPartitions=n_parts).mapInArrow(
        gen, TRANSCRIPT_SCHEMA
    )


def query_response_chunks(conv_id: str) -> list[dict]:
    """Deterministic paginated Textract-style ``GetDocumentAnalysis``
    response chunks for ONE conversation — the B11 (query answering)
    fixture corpus ([SVC:2193-2225, 3036-3056]). Content derives from
    md5(conv_id) only (no rng state), so the distributed and
    single-node generators are the same function.

    Every conversation gets a PAGE block and a resolved QUERY → ANSWER
    → QUERY_RESULT chain split across TWO chunks with the QUERY_RESULT
    duplicated in both (exercises the B14 order-preserving dedup on
    ingest). A second query varies by md5 class to cover every B11
    edge: (0) first ANSWER id dangling, second resolves — the skip
    path; (1) no ANSWER relationship at all — the ("", 0.0) default;
    (2) first ANSWER id resolves to a non-QUERY_RESULT block, second
    to the real result — the type-skip path; (3) single query only.
    Confidences are multiples of 0.25, exact in float32 AND float64,
    so the cross-engine value hash is cast-stable.

    Returns [{conv_id, turn_idx, page_seq, response_json}]."""
    import hashlib
    import json as _json

    h = int(hashlib.md5(conv_id.encode()).hexdigest()[:8], 16)
    variant = h % 4
    total = f"${100 + h % 900}.{h % 100:02d}"
    conf1 = 90.0 + (h % 32) * 0.25
    conf2 = 70.0 + (h % 64) * 0.25

    q1 = {
        "Id": "q1", "BlockType": "QUERY", "Page": 1,
        "Query": {"Text": "What is the invoice total?", "Alias": "TOTAL"},
        "Relationships": [{"Type": "ANSWER", "Ids": ["qr1"]}],
    }
    qr1 = {"Id": "qr1", "BlockType": "QUERY_RESULT", "Text": total,
           "Confidence": conf1, "Page": 1}
    chunk0_blocks = [
        {"Id": "p1", "BlockType": "PAGE", "Page": 1,
         "Relationships": [{"Type": "CHILD", "Ids": ["q1"]}]},
        q1,
        qr1,
    ]
    chunk1_blocks = [qr1]  # duplicated across chunks: B14 dedup fodder
    if variant == 0:
        chunk1_blocks += [
            {"Id": "q2", "BlockType": "QUERY", "Page": 1,
             "Query": {"Text": "Who is the vendor?", "Alias": "VENDOR"},
             "Relationships": [{"Type": "ANSWER", "Ids": ["ghost", "qr2"]}]},
            {"Id": "qr2", "BlockType": "QUERY_RESULT",
             "Text": f"vendor-{h % 50}", "Confidence": conf2, "Page": 1},
        ]
    elif variant == 1:
        chunk1_blocks += [
            {"Id": "q2", "BlockType": "QUERY", "Page": 1,
             "Query": {"Text": "Who is the vendor?", "Alias": "VENDOR"}},
        ]
    elif variant == 2:
        chunk1_blocks += [
            {"Id": "q2", "BlockType": "QUERY", "Page": 1,
             "Query": {"Text": "Who is the vendor?", "Alias": "VENDOR"},
             "Relationships": [{"Type": "ANSWER", "Ids": ["w9", "qr2"]}]},
            {"Id": "w9", "BlockType": "WORD", "Text": "not-a-result",
             "Confidence": 99.0, "Page": 1},
            {"Id": "qr2", "BlockType": "QUERY_RESULT",
             "Text": f"vendor-{h % 50}", "Confidence": conf2, "Page": 1},
        ]
    resp0 = {"JobStatus": "SUCCEEDED", "NextToken": "tok1",
             "Blocks": chunk0_blocks}
    resp1 = {"JobStatus": "SUCCEEDED", "Blocks": chunk1_blocks}
    return [
        {"conv_id": conv_id, "turn_idx": 0, "page_seq": 0,
         "response_json": _json.dumps(resp0, sort_keys=True)},
        {"conv_id": conv_id, "turn_idx": 0, "page_seq": 1,
         "response_json": _json.dumps(resp1, sort_keys=True)},
    ]


def generate_query_responses(conv_ids: list[str]) -> list[dict]:
    """Single-node form: response chunks for every conversation, in
    (conv_id, page_seq) order — what the pure-Python fixture cache
    writes to ``responses.parquet``."""
    rows: list[dict] = []
    for cid in sorted(conv_ids):
        rows.extend(query_response_chunks(cid))
    return rows


def generate_query_responses_distributed(spark, transcripts):
    """Distributed form for sf past the single-node-oracle scope: one
    mapInArrow over the DISTINCT conv_ids (same pure per-conv function,
    so small-sf parity transfers), no driver materialization."""
    from collections.abc import Iterator

    import pyarrow as pa

    from .schemas import RESPONSES_SCHEMA

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(RESPONSES_SCHEMA)
        names = [f.name for f in arrow_schema]
        for rb in batches:
            out: list[dict] = []
            for cid in rb.column(0).to_pylist():
                out.extend(query_response_chunks(cid))
            arrays = [
                pa.array([r[n] for r in out], arrow_schema.field(n).type)
                for n in names
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return transcripts.select("conv_id").distinct().mapInArrow(
        gen, RESPONSES_SCHEMA
    )


def rows_to_pandas(rows: list[dict]):
    import pandas as pd

    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"], utc=True).dt.tz_localize(None)
    return df
