"""D1 — payload-kind sniffing (SURVEY.md §2.D D1).

A transcript turn's ``text`` column carries one of three payload kinds:

- ``html``   — markup; goes through the DOM / density path (D2–D4)
- ``layout`` — line-oriented pseudo-PDF geometry
  (``x=<f> y=<f> page=<i> | <text>`` per line); goes through the
  block-synthesis path (D5 → B4..B11)
- ``plain``  — passthrough text

Deterministic, cheap (regex on a bounded prefix), and identical in the
oracle and the Spark UDF because it *is* the same function.
"""

from __future__ import annotations

import re

_LAYOUT_LINE = re.compile(
    r"^x=-?\d+(?:\.\d+)?\s+y=-?\d+(?:\.\d+)?\s+page=\d+\s+\|"
)
_HTML_TAG = re.compile(
    r"<\s*(?:!doctype|html|head|body|div|p|a|span|nav|main|article|header|"
    r"footer|aside|section|table|tr|td|th|thead|tbody|dl|dt|dd|ul|ol|li|"
    r"h[1-6]|script|style|form|br|img|pre|blockquote)\b",
    re.IGNORECASE,
)

KIND_HTML = "html"
KIND_LAYOUT = "layout"
KIND_PLAIN = "plain"


def sniff_kind(text: str) -> str:
    """Classify a raw payload as html / layout / plain."""
    if not text:
        return KIND_PLAIN
    head = text.lstrip()[:4096]
    if not head:
        return KIND_PLAIN
    first_line = head.split("\n", 1)[0]
    if _LAYOUT_LINE.match(first_line):
        return KIND_LAYOUT
    if _HTML_TAG.search(head):
        return KIND_HTML
    return KIND_PLAIN
