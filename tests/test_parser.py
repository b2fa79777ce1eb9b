"""Parser micro-cases — the reference's MSG_EXPLANATION test mechanism
(`/root/reference/lexor/command/test.py:150-215`) ported to parametrized
pytest: each case is a one-liner input labeled with the log codes it must
produce ("Okay" == no codes)."""

from __future__ import annotations

import pytest

from lexor_spark.kernel.dom import Comment, Element, Entity, RawText, Text, Void
from lexor_spark.kernel.htmlparser import parse_html

# (case_id, html, expected_codes multiset) — FIXTURES.md §3 seed set.
CASES = [
    # the reference's own pinned examples (parser.py:426-449)
    ("okay-closed", "<node></node>", []),
    ("e100-unclosed", "<node>", ["E100"]),
    ("okay-sibling-p", "<a><p>stuff</p><p>stuff</p></a>", []),
    ("okay-implied-p", "<a><p>stuff<p>stuff</p></a>", []),
    ("w100-forced", "<a><p>stuff</p><p>stuff</a>", ["W100"]),
    ("w100-forced-implied", "<a><p>stuff<p>stuff</a>", ["W100"]),
    # this engine's rule-set
    ("okay-void", "<p>one<br>two</p>", []),
    ("okay-void-slash", '<img src="x"/>', []),
    ("okay-rawtext", "<script>if (a<b) {}</script>", []),
    ("e100-rawtext", "<script>x<y", ["E100"]),
    ("okay-comment", "<!-- a <p> inside -->", []),
    ("e100-comment", "<!-- never closed", ["E100"]),
    ("okay-doctype", "<!doctype html><p>x</p>", []),
    ("okay-cdata", "<![CDATA[raw <stuff>]]>", []),
    ("e100-cdata", "<![CDATA[raw", ["E100"]),
    ("okay-pi", "<?python print 1 ?>", []),
    ("e100-pi", "<?python never", ["E100"]),
    ("okay-entity", "a &amp; b", []),
    ("okay-list-implied", "<ul><li>one<li>two</ul>", []),
    ("okay-table-implied", "<table><tr><td>a<td>b<tr><td>c</table>", []),
    ("w101-stray", "<p>x</p></q>", ["W101"]),
    ("okay-lt-as-text", "<p>1 < 2</p>", []),
    ("okay-selfclose", "<div/><p>x</p>", []),
    ("e100-nested", "<a><b><c>", ["E100", "E100", "E100"]),
    ("okay-dl", "<dl><dt>t<dd>d</dl>", []),
]


@pytest.mark.parametrize("case_id,html,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_micro_case(case_id, html, expected):
    _, log = parse_html(html)
    assert sorted(e.code for e in log) == sorted(expected)


def test_tree_shape_basic():
    doc, log = parse_html('<div id="a" class="x y">hi <b>there</b></div>')
    assert not log
    div = doc.children[0]
    assert isinstance(div, Element) and div.name == "div"
    assert list(div.attrs.items()) == [("id", "a"), ("class", "x y")]
    assert isinstance(div.children[0], Text)
    assert div.children[0].data == "hi "
    assert div.children[1].name == "b"


def test_attr_order_and_forms():
    doc, _ = parse_html("<x one two=2 three='3' four=\"4 4\">")
    el = doc.children[0]
    assert list(el.attrs.items()) == [
        ("one", ""), ("two", "2"), ("three", "3"), ("four", "4 4")]


def test_adjacent_text_merge():
    # '&' that is not an entity and '<' that opens nothing merge back into
    # one Text node (reference parser.py:323-327 build-time merge).
    doc, _ = parse_html("a & b < c")
    kids = doc.children
    assert len(kids) == 1 and isinstance(kids[0], Text)
    assert kids[0].data == "a & b < c"


def test_entity_nodes_and_offsets():
    src = "x&amp;y"
    doc, _ = parse_html(src)
    kinds = [type(n).__name__ for n in doc.children]
    assert kinds == ["Text", "Entity", "Text"]
    ent = doc.children[1]
    assert src[ent.start:ent.end] == "&amp;"


def test_text_offsets_cover_source():
    src = "<p>hello</p>\n<p>world</p>"
    doc, _ = parse_html(src)
    texts = [n for n in doc.iter() if isinstance(n, Text)]
    for t in texts:
        assert src[t.start:t.end] == t.data


def test_rawtext_payload_not_parsed():
    doc, _ = parse_html('<script type="t">var x = "<p>no</p>";</script>after')
    sc = doc.children[0]
    assert isinstance(sc, RawText)
    assert sc.data == 'var x = "<p>no</p>";'
    assert sc.attrs == {"type": "t"}
    assert doc.children[1].data == "after"


def test_rawtext_close_case_insensitive():
    doc, log = parse_html("<SCRIPT>x</ScRiPt >tail")
    assert not log
    assert doc.children[0].name == "script"
    assert doc.children[1].data == "tail"


def test_comment_doctype_pi_payloads():
    doc, _ = parse_html("<!doctype html>\n<!-- note -->\n<?target body ?>")
    names = [n.name for n in doc.children if not isinstance(n, Text)]
    assert names == ["#doctype", "#comment", "?target"]


def test_deep_nesting_iterative():
    n = 4000
    doc, log = parse_html("<div>" * n + "x" + "</div>" * n)
    assert not log
    d = doc
    depth = 0
    while d.children and isinstance(d.children[0], Element):
        d = d.children[0]
        depth += 1
    assert depth == n


def test_eof_sweep_outermost_first():
    _, log = parse_html("<a><b>")
    assert [e.code for e in log] == ["E100", "E100"]
    assert [e.arg[0] for e in log] == ["a", "b"]


def test_w100_position_args():
    src = "<a><p>stuff</a>"
    _, log = parse_html(src)
    (entry,) = log
    assert entry.code == "W100"
    assert entry.arg[0] == "p"
    # forced-closed at the position of </a>
    assert (entry.arg[1], entry.arg[2]) == (1, 12)


def test_empty_and_whitespace():
    doc, log = parse_html("")
    assert not log and not doc.children
    doc, log = parse_html("   \n  ")
    assert not log and isinstance(doc.children[0], Text)


def test_parse_hooks_p8():
    """P8 hook slots (reference parser.py:174-178): pre runs before the
    loop, post runs after it but before normalize (raw Text runs still
    visible), both see the same parser state object."""
    from lexor_spark.kernel.htmlparser import LogEntry, parse_html

    seen = {}

    def pre(p):
        seen["pre_children"] = len(p.doc.children)
        seen["caret"] = p.caret

    def post(p):
        seen["post_children"] = len(p.doc.children)
        p.log.append(LogEntry("X999", 1, 1))
        p.doc.meta["hooked"] = "yes"

    doc, log = parse_html("<p>a</p>&amp;tail", pre_process=pre,
                          post_process=post)
    assert seen["pre_children"] == 0 and seen["caret"] == 0
    assert seen["post_children"] == len(doc.children)
    assert doc.meta["hooked"] == "yes"
    assert any(e.code == "X999" for e in log)
    # hooks absent -> identical output (hot path untouched)
    doc2, _ = parse_html("<p>a</p>&amp;tail")
    from lexor_spark.kernel.htmlwriter import write_html
    assert write_html(doc2) == write_html(doc)


# -- L5: MSG_EXPLANATION map + embedded micro-tests (reference
# command/test.py:150-239 mechanism, command/lang.py:218-239 query) ------

def _embedded_cases():
    import re as _re
    from lexor_spark.kernel.htmlparser import MSG_EXPLANATION
    case_re = _re.compile(r"^(Okay|[A-Z]\d+):\s*(.*)$")
    for entry in MSG_EXPLANATION:
        for line in entry.splitlines():
            m = case_re.match(line.strip())
            if m:
                yield m.group(1), m.group(2)


def test_every_msg_code_has_explanation():
    from lexor_spark.kernel.htmlparser import MSG, explain
    for code in MSG:
        text = explain(code)
        assert text and code in text
    assert explain("E999") is None


def test_msg_explanation_embedded_cases():
    """The reference's find_failed contract: an `Okay:` input parses
    with no diagnostics; a `CODE:` input logs that code."""
    cases = list(_embedded_cases())
    assert len(cases) >= 12
    for code, snippet in cases:
        _, log = parse_html(snippet)
        got = [e.code for e in log]
        if code == "Okay":
            assert got == [], (snippet, got)
        else:
            assert code in got, (snippet, got)
