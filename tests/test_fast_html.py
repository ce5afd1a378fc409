"""Pins _fast_nodes == the stdlib html.parser node stream.

The fast tokenizer (core/htmldom._fast_nodes) is the extraction hot
path; its contract is BYTE EQUALITY of the produced node table with the
stdlib parser (parse_html_nodes_stdlib) on every input, with a bail
(None) allowed only for `<![` marked sections — where parse_html_nodes
falls back to the stdlib parser, so the public function is total.

Three layers: a hand-built construct zoo (every stdlib code path the
scanner mirrors, incl. the shortcut-regex boundaries), a corpus sweep
over the deterministic fixture generator, and a hypothesis soup over a
markup-heavy alphabet.

Offline campaigns (not committed as tests — too slow for the suite):
30k-case differential soup at the r5 self-review, and a 500k-case
sweep (seed 20260819, a 37-symbol alphabet extending _SOUP_ALPHABET
with marked sections, NULs, multibyte tags and attr fragments) at the
r5 close — 0 divergences in both.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st

from amazon_textract_enhancer_spark.core.htmldom import (
    _fast_nodes,
    parse_html_nodes,
    parse_html_nodes_stdlib,
)

ZOO = [
    # plain structure + entity runs
    "<html><body><p>hello &amp; goodbye</p></body></html>",
    "<p>a < b</p>",
    "<p>5 &lt; 6 &gt 7 &unknown; &#65; &#x42; &amp x</p>",
    "<p>&#65;&#x41;&#65 &#xG;</p>",
    "&;&&amp;&a",
    "text &amp",
    "no tags at all & plain",
    # cdata elements (script/style), incl. fake ends and case games
    "<SCRIPT>if(a<b){x='</div>'}</SCRIPT>after",
    "<script>var q=1;</script>",
    "<style>b{}</style>t",
    "<script>never closed",
    "<script >x</script >y",
    "<ScRiPt>a</sCrIpT>b",
    "</script>orphan-end",
    "<style>a</style x>never-ends-style",
    # malformed / unterminated tags (goahead end=1 recovery)
    "<div><p>unclosed <b>bold",
    "trailing <",
    "<b unclosed",
    "<b attr='x",
    "<b/",
    "<b /",
    "a<\x00b>",
    "<é>unicode-tag",
    # startend + void tags
    "<br/><img src='x'/>txt<hr />",
    "<div/>sx",
    "<p />z",
    # attributes (incl. '>' inside quoted values)
    '<a href="#">link</a>',
    "<a href='a>b'>x</a>",
    '<a b=">">in-attr-gt</a>',
    "<x y=1 z='2' w=\"3\">t</x>",
    "<a/b>y",
    # declarations / comments / PIs
    "<!DOCTYPE html><p>x</p>",
    "<!doctype junk",
    "<!-- comment --><p>y</p>",
    "<!-- unterminated",
    "<!--><p>z</p>",
    "<!bogus><p>w</p>",
    "<?php echo ?><p>q</p>",
    "<? unterminated",
    # end-tag edge cases
    "</>x</ >y</a junk>z",
    "</123>b",
    "</ div>c",
    "<p>x</p extra>y",
    "<UPPER>X</UPPER>",
    # shortcut-regex boundaries (simple vs general start/end tags)
    "<p\t>tab</p\n>",
    "<p5>digit</p5>",
    "<p.x>dot</p.x>",
    "<p >sp</ p >",
    # structures the extractor consumes
    "<table><tr><td>1</td></tr></table>",
    "<dl><dt>K</dt><dd>V</dd></dl>",
    # empties
    "",
    "   ",
    "\n\t",
    # self-closing DROP_TAGS: handle_startendtag emits the PARENT's
    # dropped flag only (r5 review: the fast path OR'd the tag's own
    # membership in, diverging from the stdlib reference)
    "<div><script/><p>hello</p></div>",
    "<nav/><p>x</p>",
    "<div><iframe/>text</div><style/>",
]

BAIL_ZOO = [
    "<![CDATA[raw]]>tail",
    "<![if gt]>x<![endif]>",
    "<p><![bad</p>",
]


@pytest.mark.parametrize("doc", ZOO)
def test_zoo_equality(doc):
    assert _fast_nodes(doc) == parse_html_nodes_stdlib(doc)


@pytest.mark.parametrize("doc", BAIL_ZOO)
def test_marked_sections_bail_to_stdlib(doc):
    assert _fast_nodes(doc) is None
    # the public function is total: it falls back and matches stdlib
    assert parse_html_nodes(doc) == parse_html_nodes_stdlib(doc)


def test_fixture_corpus_equality():
    """Every html/table/kv turn the deterministic generator produces
    parses identically (the corpus the bench + goldens run on)."""
    from amazon_textract_enhancer_spark.fixtures import generate_transcripts

    rows, _ = generate_transcripts(seed=7, n_convs=150, with_goldens=False)
    seen = 0
    for r in rows:
        t = r["text"]
        if not t or "<" not in t:
            continue
        seen += 1
        got = _fast_nodes(t)
        assert got is not None, t[:120]
        assert got == parse_html_nodes_stdlib(t), t[:200]
    assert seen > 500  # the sweep actually exercised markup turns


def test_mutated_corpus_equality():
    """Seeded byte-level mutations of fixture HTML (truncation, splice,
    case flips) keep fast == stdlib — the malformed-input regime."""
    from amazon_textract_enhancer_spark.fixtures import generate_transcripts

    rows, _ = generate_transcripts(seed=11, n_convs=40, with_goldens=False)
    docs = [r["text"] for r in rows if r["text"] and r["text"].startswith("<html")]
    rng = random.Random(99)
    for d in docs[:120]:
        for _ in range(4):
            mode = rng.randrange(4)
            if mode == 0:  # truncate mid-construct
                m = d[: rng.randrange(1, len(d))]
            elif mode == 1:  # splice junk
                i = rng.randrange(len(d))
                m = d[:i] + rng.choice(["<", ">", "&", "</", "<!", "<x", "&#"]) + d[i:]
            elif mode == 2:  # delete a span
                i = rng.randrange(len(d))
                m = d[:i] + d[i + rng.randrange(1, 20) :]
            else:  # case-flip a window
                i = rng.randrange(len(d))
                m = d[:i] + d[i : i + 30].swapcase() + d[i + 30 :]
            got = _fast_nodes(m)
            if got is None:  # marked-section bail — public fn still total
                got = parse_html_nodes(m)
            assert got == parse_html_nodes_stdlib(m), m[:200]


_SOUP_ALPHABET = list("<>&;/=!?-'\"[] \t\npa") + ["script", "style", "<p>", "</p>",
                                                 "<!--", "-->", "&amp;", "&#65;", "<a href='#'>"]


@settings(max_examples=400, deadline=None)
@given(st.lists(st.sampled_from(_SOUP_ALPHABET), max_size=60).map("".join))
def test_soup_equality(doc):
    got = _fast_nodes(doc)
    if got is None:
        got = parse_html_nodes(doc)
    assert got == parse_html_nodes_stdlib(doc)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=500))
def test_arbitrary_text_equality(doc):
    got = _fast_nodes(doc)
    if got is None:
        got = parse_html_nodes(doc)
    assert got == parse_html_nodes_stdlib(doc)
