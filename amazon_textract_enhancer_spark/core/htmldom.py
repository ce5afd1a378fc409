"""D2/D3/D4 — HTML DOM parse + text/link-density boilerplate removal.

Replaces the Textract ML model for markup payloads with deterministic
DOM-tree text-density heuristics (Boilerpipe-style: Kohlschuetter et al.,
WSDM'10 "Boilerplate Detection using Shallow Text Features"; jusText).
Reference behavior basis: BASELINE.json:6 ("strip HTML boilerplate via
DOM-tree text-density heuristics (tag-depth/link-density scoring over a
parsed node table)").

Parser is stdlib ``html.parser`` (no lxml/bs4 in the environment —
SURVEY.md §0). The node table produced here is *also* the relational
NODE schema (SURVEY.md §1.4): the density classification is defined as
pure per-node arithmetic + a group-by over ``block_id`` so the exact
same rule is re-expressible as Catalyst-planned DataFrame ops
(``operators/relational.py``) — no hidden imperative state.

Model
-----
- Every element gets a preorder ``node_id``; every contiguous run of
  character data becomes a synthetic ``#text`` node so document order
  of mixed inline content (``<p>foo <a>x</a> bar</p>``) is preserved.
- ``block_id`` = node_id of the nearest block-level ancestor element.
  Text nodes aggregate to their block: a *text block* is the unit of
  classification, as in Boilerpipe.
- A block is **content** iff it is not inside a dropped subtree
  (script/style/nav/... — DROP_TAGS), has at least MIN_CONTENT_CHARS
  characters, and link_density <= MAX_LINK_DENSITY.
- Extracted main text = content block texts in document order joined
  by ``"\\n"``.
"""

from __future__ import annotations

from html.parser import HTMLParser

# --- classification constants (mirrored in operators/relational.py) ---
MIN_CONTENT_CHARS = 25
MAX_LINK_DENSITY = 0.35
WRAP_COLS = 80  # virtual line width for text_density

DROP_TAGS = frozenset(
    {
        "script",
        "style",
        "nav",
        "header",
        "footer",
        "aside",
        "form",
        "noscript",
        "template",
        "head",
        "title",
        "button",
        "select",
        "option",
        "iframe",
        "svg",
    }
)

# Non-inline elements: a text chunk belongs to its nearest such ancestor.
BLOCK_TAGS = frozenset(
    {
        "html",
        "body",
        "div",
        "p",
        "li",
        "td",
        "th",
        "tr",
        "table",
        "ul",
        "ol",
        "dl",
        "dt",
        "dd",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "main",
        "article",
        "section",
        "nav",
        "header",
        "footer",
        "aside",
        "blockquote",
        "pre",
        "form",
        "figure",
        "figcaption",
        "caption",
        "address",
        "fieldset",
        "legend",
    }
)

VOID_TAGS = frozenset(
    {
        "br",
        "img",
        "input",
        "meta",
        "link",
        "hr",
        "area",
        "base",
        "col",
        "embed",
        "source",
        "track",
        "wbr",
    }
)


class _NodeCollector(HTMLParser):
    """Streams tags/text into a flat node table (one pass, O(n))."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.nodes: list[dict] = []
        # stack entries:
        # (node_id, tag, depth, block_id, dropped, in_link, in_table)
        self._stack: list[tuple[int, str, int, int, bool, bool, bool]] = []
        self._next_id = 0

    # -- helpers -------------------------------------------------------
    def _top(self):
        if self._stack:
            return self._stack[-1]
        return (-1, "", -1, -1, False, False, False)

    def _emit(self, tag: str, text: str, parent_id: int, depth: int,
              block_id: int, dropped: bool, in_link: bool,
              in_table: bool) -> int:
        nid = self._next_id
        self._next_id += 1
        n_chars = len(text)
        self.nodes.append(
            {
                "node_id": nid,
                "parent_id": parent_id,
                "depth": depth,
                "tag": tag,
                "text": text,
                "n_chars": n_chars,
                "n_link_chars": n_chars if in_link else 0,
                "block_id": block_id,
                "in_dropped": dropped,
                "in_table": in_table,
            }
        )
        return nid

    # -- HTMLParser callbacks ------------------------------------------
    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        pid, _ptag, pdepth, pblock, pdropped, plink, ptable = self._top()
        depth = pdepth + 1
        dropped = pdropped or tag in DROP_TAGS
        in_link = plink or tag == "a"
        in_table = ptable or tag == "table"
        nid = self._emit(tag, "", pid, depth, pblock, dropped, in_link, in_table)
        block_id = nid if tag in BLOCK_TAGS else pblock
        if tag not in VOID_TAGS:
            self._stack.append((nid, tag, depth, block_id, dropped, in_link, in_table))

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        pid, _ptag, pdepth, pblock, pdropped, plink, ptable = self._top()
        self._emit(tag, "", pid, pdepth + 1, pblock, pdropped,
                   plink or tag == "a", ptable)

    def handle_endtag(self, tag):
        tag = tag.lower()
        # pop to the matching open tag if present; tolerate malformed HTML
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][1] == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        text = " ".join(data.split())
        if not text:
            return
        pid, _ptag, pdepth, pblock, pdropped, plink, ptable = self._top()
        self._emit("#text", text, pid, pdepth + 1, pblock, pdropped, plink, ptable)


def parse_html_nodes(text: str) -> list[dict]:
    """Parse HTML into the flat NODE table (SURVEY.md §1.4)."""
    p = _NodeCollector()
    try:
        p.feed(text)
        p.close()
    except Exception:
        # html.parser is lax; only pathological inputs raise. Return what
        # we collected — the caller records a skip counter (D6).
        pass
    return p.nodes


def classify_nodes(nodes: list[dict]) -> list[dict]:
    """D3/D4 — aggregate text nodes into text blocks and classify.

    Relational equivalent (operators/relational.py html_block_scores):

        SELECT block_id,
               min(node_id)                         AS ord,
               sum(n_chars)      + (count(*)-1)     AS n_chars,  -- join spaces
               sum(n_link_chars)                    AS n_link_chars,
               bool_or(in_dropped)                  AS in_dropped
        FROM nodes WHERE tag = '#text' GROUP BY block_id

    then ``link_density = n_link_chars / n_chars`` and the is_content
    predicate below.
    """
    groups: dict[int, dict] = {}
    for n in nodes:
        if n["tag"] != "#text":
            continue
        g = groups.get(n["block_id"])
        if g is None:
            groups[n["block_id"]] = {
                "block_id": n["block_id"],
                "ord": n["node_id"],
                "parts": [n["text"]],
                "n_link_chars": n["n_link_chars"],
                "in_dropped": n["in_dropped"],
                "in_table": n.get("in_table", False),
            }
        else:
            g["parts"].append(n["text"])
            g["n_link_chars"] += n["n_link_chars"]
            g["in_dropped"] = g["in_dropped"] or n["in_dropped"]
    out = []
    for g in sorted(groups.values(), key=lambda g: g["ord"]):
        btext = " ".join(g["parts"])
        n_chars = len(btext)
        link_density = g["n_link_chars"] / n_chars if n_chars else 0.0
        wrapped = max(1, -(-n_chars // WRAP_COLS))  # ceil division
        text_density = n_chars / wrapped
        is_content = (
            not g["in_dropped"]
            and not g["in_table"]  # table text is emitted structurally
            and n_chars >= MIN_CONTENT_CHARS
            and link_density <= MAX_LINK_DENSITY
        )
        out.append(
            {
                "block_id": g["block_id"],
                "ord": g["ord"],
                "text": btext,
                "n_chars": n_chars,
                "n_link_chars": g["n_link_chars"],
                "link_density": link_density,
                "text_density": text_density,
                "in_dropped": g["in_dropped"],
                "in_table": g["in_table"],
                "is_content": is_content,
            }
        )
    return out


def extract_html_main(text: str) -> tuple[str, list[dict], list[dict]]:
    """Full D2→D4 path: returns (main_text, nodes, classified_blocks)."""
    nodes = parse_html_nodes(text)
    blocks = classify_nodes(nodes)
    main = "\n".join(b["text"] for b in blocks if b["is_content"])
    return main, nodes, blocks


def extract_html_structures(nodes: list[dict]) -> tuple[list[dict], list[dict]]:
    """Recover structured spans from the DOM node table:

    - ``<table>`` → grids: each <tr> is a row, each <td>/<th> a cell
      (is_header iff <th>); nested tables attach to their OWN nearest
      table ancestor, not the outer one.
    - ``<dl>`` → form pairs: each <dt> keys the next <dd> sibling.

    Returns (tables, forms) where tables = [{n_rows, n_cols, rows:
    [[(text, is_header), ...]]}] and forms = [{key, value}] — the
    caller (core.extract) shapes them into TABLE_SPAN/KV_SPAN with
    deterministic ids. Dropped-subtree (nav/footer/...) structures are
    skipped.
    """
    # short-circuit: most turns carry no structured markup at all
    if not any(n["tag"] == "table" or n["tag"] == "dl" for n in nodes):
        return [], []

    by_id = {n["node_id"]: n for n in nodes}
    children: dict[int, list[dict]] = {}
    for n in nodes:
        children.setdefault(n["parent_id"], []).append(n)

    def cell_text(cell_id: int) -> str:
        parts = [
            n["text"] for n in nodes
            if n["tag"] == "#text" and n["block_id"] == cell_id
        ]
        return " ".join(parts)

    def nearest_table(nid: int) -> int | None:
        cur = by_id.get(nid)
        while cur is not None:
            cur = by_id.get(cur["parent_id"])
            if cur is not None and cur["tag"] == "table":
                return cur["node_id"]
        return None

    def rows_of_table(table_id: int) -> list[list[dict]]:
        """tr elements whose nearest table ancestor is this table, in
        document order (tr may sit under thead/tbody)."""
        rows = []
        for n in nodes:
            if n["tag"] == "tr" and nearest_table(n["node_id"]) == table_id:
                rows.append(n)
        return rows

    tables: list[dict] = []
    forms: list[dict] = []
    for n in nodes:
        if n["in_dropped"]:
            continue
        if n["tag"] == "table":
            trs = rows_of_table(n["node_id"])
            grid: list[list[tuple[str, bool]]] = []
            for tr in trs:
                cells = [
                    c for c in children.get(tr["node_id"], [])
                    if c["tag"] in ("td", "th")
                ]
                grid.append(
                    [(cell_text(c["node_id"]), c["tag"] == "th") for c in cells]
                )
            grid = [r for r in grid if r]
            if grid:
                tables.append(
                    {
                        "n_rows": len(grid),
                        "n_cols": max(len(r) for r in grid),
                        "rows": grid,
                    }
                )
        elif n["tag"] == "dl":
            items = [
                c for c in children.get(n["node_id"], [])
                if c["tag"] in ("dt", "dd")
            ]
            key = None
            for it in items:
                if it["tag"] == "dt":
                    key = cell_text(it["node_id"])
                elif it["tag"] == "dd" and key is not None:
                    forms.append({"key": key, "value": cell_text(it["node_id"])})
                    key = None
    return tables, forms
