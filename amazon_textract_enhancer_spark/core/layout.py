"""D5 — layout payload → Textract-style Block forest synthesis.

Replaces the Textract ML model for PDF/layout-geometry payloads: parses
line-oriented geometry (``x=<float> y=<float> page=<int> | <text>``),
clusters lines into PAGE→LINE→WORD, detects aligned grids → TABLE/CELL
with 1-based RowIndex/ColumnIndex, and ``Key: Value`` patterns →
KEY_VALUE_SET pairs (BASELINE.json:6 "reconstruct Textract-style block
hierarchies ... from PDF/layout geometry").

The synthesized forest uses exactly the Block shapes of
vendor/textract-service-2.json:1430-1495 (enum-conformance tested), so
the downstream B4–B11 post-processing path is IDENTICAL for synthesized
and externally-supplied blocks — one code path, per SURVEY.md §2.D D5.

Determinism: block ids are content-addressed
(sha1 of "<turn key>|<seq>") — never uuid4 (SURVEY.md §7.3 item 7);
confidences are a crc32-seeded pseudo-score in [90, 100).
"""

from __future__ import annotations

import hashlib
import re
import zlib

_ENTRY = re.compile(
    r"^x=(-?\d+(?:\.\d+)?)\s+y=(-?\d+(?:\.\d+)?)\s+page=(\d+)\s+\|\s?(.*)$"
)
_KV = re.compile(r"^([A-Za-z][A-Za-z0-9 _\-]{0,40}):\s+(\S.*)$")

PAGE_SPAN = 1000.0  # layout coordinate space normalized to [0,1] ratios


def parse_layout(text: str) -> tuple[list[dict], int]:
    """Parse layout lines → entry dicts (x, y, page, text); returns
    (entries, n_malformed)."""
    entries: list[dict] = []
    malformed = 0
    for raw in text.split("\n"):
        line = raw.strip()
        if not line:
            continue
        m = _ENTRY.match(line)
        if m is None:
            malformed += 1
            continue
        entries.append(
            {
                "x": float(m.group(1)),
                "y": float(m.group(2)),
                "page": int(m.group(3)),
                "text": m.group(4).rstrip(),
            }
        )
    return entries, malformed


from functools import lru_cache


@lru_cache(maxsize=65536)
def _pseudo_confidence(text: str) -> float:
    """Deterministic stand-in for the model's confidence (90..100).
    Memoized: word vocabularies repeat heavily within a corpus."""
    return 90.0 + (zlib.crc32(text.encode("utf-8")) % 1000) / 100.0


class _IdGen:
    """Content-addressed ids: ONE sha1 of the turn key, then a cheap
    hex counter suffix — uniqueness needs (turn, seq), so hashing every
    seq (a sha1 per block) was pure overhead (~15% of extraction CPU).
    Format stays uuid-ish for fidelity with [CLI-EX] examples."""

    __slots__ = ("_prefix", "_seq")

    def __init__(self, key: str) -> None:
        h = hashlib.sha1(key.encode("utf-8")).hexdigest()
        self._prefix = f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-"
        self._seq = 0

    def __call__(self) -> str:
        s = self._seq
        self._seq += 1
        return f"{self._prefix}{s:012x}"


def _geometry(x: float, y: float, text: str) -> dict:
    return {
        "BoundingBox": {
            "Left": x / PAGE_SPAN,
            "Top": y / PAGE_SPAN,
            "Width": min(1.0, 0.006 * max(1, len(text))),
            "Height": 0.012,
        }
    }


def _word_blocks(newid, line_text: str, x: float, y: float, page: int) -> list[dict]:
    words = []
    wx = x
    for w in line_text.split():
        words.append(
            {
                "Id": newid(),
                "BlockType": "WORD",
                "Text": w,
                "TextType": "PRINTED",
                "Confidence": _pseudo_confidence(w),
                "Page": page,
                "Geometry": _geometry(wx, y, w),
            }
        )
        wx += (len(w) + 1) * 6.0
    return words


def synthesize_blocks(key: str, entries: list[dict]) -> list[dict]:
    """Entries → Block forest. Grid detection: a run of >=2 consecutive
    y-groups on a page whose >=2 x-positions are identical (column
    alignment) becomes a TABLE; first grid row is flagged COLUMN_HEADER.
    Single entries matching ``Key: Value`` become KEY_VALUE_SET pairs.
    Everything else becomes LINEs in (page, y, x) reading order (B13).
    """
    newid = _IdGen(key)
    blocks: list[dict] = []
    pages = sorted({e["page"] for e in entries})
    for page in pages:
        pents = sorted(
            (e for e in entries if e["page"] == page),
            key=lambda e: (e["y"], e["x"]),
        )
        # group by exact y
        groups: list[tuple[float, list[dict]]] = []
        for e in pents:
            if groups and groups[-1][0] == e["y"]:
                groups[-1][1].append(e)
            else:
                groups.append((e["y"], [e]))
        # detect grid runs: consecutive groups with identical multi-x signature
        sigs = [
            tuple(sorted(ent["x"] for ent in g)) if len(g) >= 2 else None
            for _, g in groups
        ]
        in_grid = [False] * len(groups)
        i = 0
        grid_runs: list[tuple[int, int]] = []  # [start, end) group index
        while i < len(groups):
            if sigs[i] is not None:
                j = i + 1
                while j < len(groups) and sigs[j] == sigs[i]:
                    j += 1
                if j - i >= 2:
                    grid_runs.append((i, j))
                    for k in range(i, j):
                        in_grid[k] = True
                    i = j
                    continue
            i += 1

        page_child_ids: list[str] = []
        page_block = {
            "Id": newid(),
            "BlockType": "PAGE",
            "Page": page,
            "Geometry": _geometry(0.0, 0.0, ""),
        }
        blocks.append(page_block)
        emitted: list[dict] = []

        run_starts = {s: e for s, e in grid_runs}
        gi = 0
        while gi < len(groups):
            y, g = groups[gi]
            if gi in run_starts:
                # TABLE
                end = run_starts[gi]
                xs = sorted({ent["x"] for _, grp in groups[gi:end] for ent in grp})
                col_of = {x: c + 1 for c, x in enumerate(xs)}
                cell_ids: list[str] = []
                cell_blocks: list[dict] = []
                for ri, (ry, rg) in enumerate(groups[gi:end], start=1):
                    for ent in sorted(rg, key=lambda e: e["x"]):
                        words = _word_blocks(newid, ent["text"], ent["x"], ry, page)
                        cell = {
                            "Id": newid(),
                            "BlockType": "CELL",
                            "RowIndex": ri,
                            "ColumnIndex": col_of[ent["x"]],
                            "RowSpan": 1,
                            "ColumnSpan": 1,
                            "Confidence": _pseudo_confidence(ent["text"]),
                            "Page": page,
                            "Geometry": _geometry(ent["x"], ry, ent["text"]),
                        }
                        if ri == 1:
                            cell["EntityTypes"] = ["COLUMN_HEADER"]
                        if words:
                            cell["Relationships"] = [
                                {"Type": "CHILD", "Ids": [w["Id"] for w in words]}
                            ]
                        cell_ids.append(cell["Id"])
                        cell_blocks.append(cell)
                        cell_blocks.extend(words)
                table = {
                    "Id": newid(),
                    "BlockType": "TABLE",
                    "Confidence": _pseudo_confidence(f"table@{page}:{y}"),
                    "Page": page,
                    "Geometry": _geometry(min(xs), y, ""),
                    "Relationships": [{"Type": "CHILD", "Ids": cell_ids}],
                    "EntityTypes": ["STRUCTURED_TABLE"],
                }
                emitted.append(table)
                emitted.extend(cell_blocks)
                page_child_ids.append(table["Id"])
                gi = end
                continue
            for ent in g:
                m = _KV.match(ent["text"])
                if m is not None:
                    kwords = _word_blocks(newid, m.group(1), ent["x"], y, page)
                    vwords = _word_blocks(
                        newid, m.group(2), ent["x"] + 6.0 * (len(m.group(1)) + 2), y, page
                    )
                    vblock = {
                        "Id": newid(),
                        "BlockType": "KEY_VALUE_SET",
                        "EntityTypes": ["VALUE"],
                        "Confidence": _pseudo_confidence(m.group(2)),
                        "Page": page,
                        "Geometry": _geometry(ent["x"], y, m.group(2)),
                    }
                    if vwords:
                        vblock["Relationships"] = [
                            {"Type": "CHILD", "Ids": [w["Id"] for w in vwords]}
                        ]
                    kblock = {
                        "Id": newid(),
                        "BlockType": "KEY_VALUE_SET",
                        "EntityTypes": ["KEY"],
                        "Confidence": _pseudo_confidence(m.group(1)),
                        "Page": page,
                        "Geometry": _geometry(ent["x"], y, m.group(1)),
                        "Relationships": [
                            {"Type": "VALUE", "Ids": [vblock["Id"]]},
                        ]
                        + (
                            [{"Type": "CHILD", "Ids": [w["Id"] for w in kwords]}]
                            if kwords
                            else []
                        ),
                    }
                    emitted.append(kblock)
                    emitted.append(vblock)
                    emitted.extend(kwords)
                    emitted.extend(vwords)
                    page_child_ids.append(kblock["Id"])
                else:
                    words = _word_blocks(newid, ent["text"], ent["x"], y, page)
                    line = {
                        "Id": newid(),
                        "BlockType": "LINE",
                        "Text": ent["text"],
                        "Confidence": _pseudo_confidence(ent["text"]),
                        "Page": page,
                        "Geometry": _geometry(ent["x"], y, ent["text"]),
                    }
                    if words:
                        line["Relationships"] = [
                            {"Type": "CHILD", "Ids": [w["Id"] for w in words]}
                        ]
                    emitted.append(line)
                    emitted.extend(words)
                    page_child_ids.append(line["Id"])
            gi += 1

        if page_child_ids:
            page_block["Relationships"] = [{"Type": "CHILD", "Ids": page_child_ids}]
        blocks.extend(emitted)
    return blocks
