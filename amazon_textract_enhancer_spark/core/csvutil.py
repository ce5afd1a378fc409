"""B9 — RFC-4180-ish CSV render (and parse, for the round-trip property
test in SURVEY.md §5.3).

Reference behavior: the enhancer writes one CSV per reconstructed table
(BASELINE.json:6 "table-to-CSV"). Quoting convention: a cell is quoted
iff it contains a comma, double-quote, CR or LF; embedded quotes are
doubled. Rows joined by ``"\\n"`` with no trailing newline — keeps the
string a deterministic pure function of the grid.
"""

from __future__ import annotations

_NEEDS_QUOTE = (",", '"', "\n", "\r")


def _render_cell(cell: str) -> str:
    if any(ch in cell for ch in _NEEDS_QUOTE):
        return '"' + cell.replace('"', '""') + '"'
    return cell


def render_csv(grid: list[list[str]]) -> str:
    """Grid (list of rows of cell strings) → CSV string."""
    return "\n".join(",".join(_render_cell(c) for c in row) for row in grid)


def parse_csv(text: str) -> list[list[str]]:
    """Inverse of render_csv for grids rendered by it (property test:
    parse_csv(render_csv(g)) == g for any grid of str cells)."""
    rows: list[list[str]] = []
    row: list[str] = []
    cell: list[str] = []
    i, n = 0, len(text)
    in_quotes = False
    if n == 0:
        return [[""]] if text == "" else rows
    while i < n:
        ch = text[i]
        if in_quotes:
            if ch == '"':
                if i + 1 < n and text[i + 1] == '"':
                    cell.append('"')
                    i += 2
                    continue
                in_quotes = False
                i += 1
                continue
            cell.append(ch)
            i += 1
            continue
        if ch == '"' and not cell:
            in_quotes = True
            i += 1
            continue
        if ch == ",":
            row.append("".join(cell))
            cell = []
            i += 1
            continue
        if ch == "\n":
            row.append("".join(cell))
            rows.append(row)
            row, cell = [], []
            i += 1
            continue
        cell.append(ch)
        i += 1
    row.append("".join(cell))
    rows.append(row)
    return rows
