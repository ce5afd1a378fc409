"""Property-based robustness: extract_turn must NEVER raise and always
return a schema-complete result for ARBITRARY text (the D6 quarantine
contract — a turn never fails the job), and stays deterministic.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from amazon_textract_enhancer_spark.core import extract_turn

_REQUIRED_KEYS = {"kind", "extracted_text", "tables", "forms", "counters",
                  "blocks", "nodes"}
_COUNTER_KEYS = {"blocks_parsed", "nodes_parsed", "tables_reconstructed",
                 "kv_pairs", "dangling_ids", "skipped", "skip_reason"}


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=4000))
def test_extract_never_raises_on_arbitrary_text(text):
    res = extract_turn("fuzz|0", text)
    assert set(res) == _REQUIRED_KEYS
    assert set(res["counters"]) == _COUNTER_KEYS
    assert res["kind"] in ("html", "layout", "plain")
    assert isinstance(res["extracted_text"], str)
    for tb in res["tables"]:
        assert tb["n_rows"] >= 1 and tb["n_cols"] >= 1
        assert isinstance(tb["csv"], str)
    # determinism
    assert extract_turn("fuzz|0", text) == res


@settings(max_examples=150, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(list("<>/abps xy=.|0123456789\"'&;\n")),
        max_size=2000,
    )
)
def test_extract_never_raises_on_markup_soup(text):
    """Tag-dense garbage aimed at the html/layout parsers specifically."""
    res = extract_turn("fuzz|1", text)
    assert isinstance(res["extracted_text"], str)
    assert res["counters"]["skipped"] in (True, False)
