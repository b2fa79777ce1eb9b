"""Property-based kernel invariants (hypothesis).

At 10^12 documents every weird byte sequence WILL occur.  The kernel's
contract (`lexor_spark/kernel/pipeline.py`) is: never raise, always
deterministic, spans always index into the decoded source.  These
properties complement the golden tests, which pin exact bytes."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lexor_spark.kernel.htmlparser import parse_html
from lexor_spark.kernel.pipeline import extract_document

# HTML-ish soup: plain text, markup fragments, entities, quotes, multibyte
_soup = st.text(
    alphabet=st.sampled_from(list(
        "<>&;/=\"' abcdefgABCDEFG\n\t!-?[]()#éあ😀\x00\\")),
    max_size=400,
)
_bytes_soup = st.binary(max_size=400)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_never_raises_and_deterministic(s: str):
    r1 = extract_document(s, "u")
    r2 = extract_document(s, "u")
    assert r1.ok or r1.err  # error rows carry a reason
    assert r1.text == r2.text
    assert r1.spans == r2.spans
    assert r1.codes == r2.codes


@settings(max_examples=200, deadline=None)
@given(_bytes_soup)
def test_arbitrary_bytes_never_raise(b: bytes):
    r = extract_document(b, "u")
    assert isinstance(r.text, str)
    if not r.ok:
        assert r.err


@settings(max_examples=200, deadline=None)
@given(_soup)
def test_spans_index_into_source(s: str):
    r = extract_document(s, "u")
    n = len(s)
    for start, end, _path in r.spans:
        assert 0 <= start <= end <= n


@settings(max_examples=200, deadline=None)
@given(_soup)
def test_parse_tree_is_consistent(s: str):
    doc, log = parse_html(s, "u")
    # every child points back at its parent; no node appears twice
    seen = set()
    for node in doc.iter():
        assert id(node) not in seen
        seen.add(id(node))
        for child in getattr(node, "children", None) or ():
            assert child.parent is node
    for entry in log:
        assert entry.code in ("E100", "W100", "W101", "W102")


def test_deep_nesting_no_recursion_error():
    html = "<div>" * 50_000 + "x" + "</div>" * 50_000
    r = extract_document(html, "u")
    assert r.ok
    assert "x" in r.text


def test_pathological_unclosed_quote():
    r = extract_document('<a href="' + "y" * 100_000, "u")
    assert r.ok
