"""Selector engine tests (reference S1-S4: lexor/core/selector.py).

Covers the tokenizer grammar, the quick-expression fast paths, full
combinator matching, and the jQuery-like DOM-edit verbs.
"""

import pytest

from lexor_spark.kernel.htmlparser import parse_html
from lexor_spark.kernel.htmlwriter import write_html
from lexor_spark.kernel.selector import (
    Selector, SelectorError, matches, query, tokenize)

DOC = """
<div id="top" class="wrap main">
  <p class="intro">hello <b>world</b></p>
  <p data-x="a b">two</p>
  <span></span>
  <p class="intro outro">three</p>
  <ul><li>1</li><li class="sel">2</li><li>3</li></ul>
</div>
<div class="wrap"><p>outside</p></div>
"""


@pytest.fixture()
def doc():
    tree, _ = parse_html(DOC)
    return tree


def texts(nodes):
    return [n.text_content().strip() for n in nodes]


# -- tokenizer (S2) -------------------------------------------------------

def test_tokenize_groups_and_combinators():
    groups = tokenize("div.a > p, #x ~ i.b[t='v']")
    assert len(groups) == 2
    g0, g1 = groups
    assert [t for t in g0 if isinstance(t, str)] == [">"]
    assert g0[0].tag == "div" and g0[0].classes == ["a"]
    assert g0[2].tag == "p"
    assert [t for t in g1 if isinstance(t, str)] == ["~"]
    assert g1[0].ids == ["x"]
    assert g1[2].classes == ["b"] and g1[2].attrs == [("t", "=", "v")]


def test_tokenize_rejects_garbage_and_pseudos():
    with pytest.raises(SelectorError):
        tokenize("p >")
    with pytest.raises(SelectorError):
        tokenize("")
    with pytest.raises(SelectorError):
        tokenize("p:hover")  # outside the structural subset
    with pytest.raises(SelectorError):
        tokenize("p ? q")


def test_tokenize_cached():
    assert tokenize("div p") is tokenize("div p")


# -- quick paths (S1, reference selector.py:173-199) ----------------------

def test_quick_id_tag_class(doc):
    assert [n.name for n in query(doc, "#top")] == ["div"]
    assert len(query(doc, "p")) == 4
    assert texts(query(doc, ".intro")) == ["hello world", "three"]


# -- full matching --------------------------------------------------------

def test_descendant_and_child(doc):
    assert len(query(doc, "div p")) == 4
    assert len(query(doc, "div > p")) == 4  # 3 in #top + 1 outside, all direct
    assert texts(query(doc, "ul > li.sel")) == ["2"]
    assert query(doc, "ul > p") == []


def test_sibling_combinators(doc):
    # + : immediately preceding element sibling
    assert texts(query(doc, "p + p")) == ["two"]
    # ~ : any preceding element sibling
    assert texts(query(doc, "p ~ p")) == ["two", "three"]
    assert texts(query(doc, "span + p.intro")) == ["three"]


def test_attribute_operators(doc):
    assert len(query(doc, "[data-x]")) == 1
    assert texts(query(doc, 'p[data-x="a b"]')) == ["two"]
    assert texts(query(doc, "p[data-x~=b]")) == ["two"]
    assert texts(query(doc, "div[class^=wr] > p[class$=tro]")) \
        == ["hello world", "three"]
    assert texts(query(doc, "p[class*=ut]")) == ["three"]
    assert len(query(doc, "div[id|=top]")) == 1
    # != matches mismatching AND attribute-less elements (jQuery rule)
    assert texts(query(doc, "p[data-x!='a b']")) \
        == ["hello world", "three", "outside"]


def test_compound_and_groups(doc):
    assert texts(query(doc, "p.intro.outro")) == ["three"]
    got = query(doc, "li.sel, #top > span, .no-such")
    assert [n.name for n in got] == ["span", "li"]  # document order


def test_matches_predicate(doc):
    li = query(doc, "li.sel")[0]
    assert matches(li, "ul li")
    assert matches(li, "#top li.sel")
    assert not matches(li, "span li")


def test_quick_id_scoped_to_context(doc):
    outside = query(doc, "div")[-1]  # the .wrap without id
    assert query(outside, "#top") == []  # #top not under this context


# -- Selector DOM edits (S4, reference selector.py:306-624) ---------------

def test_selector_find_and_contents(doc):
    sel = Selector("div", doc).find("li.sel")
    assert texts(sel.data) == ["2"]
    kids = Selector("ul", doc).contents()
    assert len(kids) == 3


def test_append_string_parses_and_clones(doc):
    Selector("p.intro", doc).append("<i>!</i>")
    ps = query(doc, "p.intro")
    assert all(p.children[-1].name == "i" for p in ps)
    # cloned per target: the two <i> nodes are distinct objects
    assert ps[0].children[-1] is not ps[1].children[-1]


def test_prepend_before_after(doc):
    Selector("ul", doc).prepend("<li>0</li>")
    assert texts(query(doc, "ul > li"))[0] == "0"
    Selector("span", doc).before("<hr>").after("<wbr>")
    top = query(doc, "#top")[0]
    names = [n.name for n in top.children if n.name != "#text"]
    k = names.index("span")
    assert names[k - 1] == "hr" and names[k + 1] == "wbr"


def test_edit_with_function(doc):
    Selector("li", doc).append(lambda node, i: f"<em>{i}</em>")
    ems = query(doc, "li > em")
    assert texts(ems) == ["0", "1", "2"]


def test_remove(doc):
    Selector("ul", doc).remove()
    assert query(doc, "li") == []
    html = write_html(doc)
    assert "<ul>" not in html


def test_append_node_moves_last_clones_rest(doc):
    b = query(doc, "b")[0]
    Selector("p[data-x]", doc).append(b)  # single target: moves, no clone
    assert b.parent.get("data-x") == "a b"
    assert query(doc, "p.intro b") == []


# -- corpus-level batch UDF (Spark-free: feed Arrow batches directly) -----

def test_css_batches_arrow():
    import pyarrow as pa

    from lexor_spark.job import _css_batches

    html1 = b'<div class="a"><p>one</p><p>two</p></div>'
    html2 = b"<ul><li>x</li></ul>"
    batch = pa.RecordBatch.from_pydict(
        {"url": ["u1", "u2", "u3"], "html": [html1, html2, None]})
    out = list(_css_batches(["div.a > p", "li"])([batch]))
    assert len(out) == 1
    rows = out[0].to_pylist()
    assert len(rows) == 6  # 3 urls x 2 selectors
    by_key = {(r["url"], r["selector"]): r for r in rows}
    assert by_key[("u1", "div.a > p")]["n_matches"] == 2
    assert by_key[("u1", "div.a > p")]["first_text"] == "one"
    assert by_key[("u2", "li")]["n_matches"] == 1
    assert by_key[("u3", "li")]["n_matches"] == 0
    assert by_key[("u3", "li")]["first_text"] is None


def test_css_select_validates_on_driver():
    from lexor_spark.kernel.selector import SelectorError, tokenize
    with pytest.raises(SelectorError):
        tokenize("p:hover")


# -- property: query() and matches() agree on random trees/selectors ------

from hypothesis import given, settings
from hypothesis import strategies as st

_TAGS = ["div", "p", "span", "b", "ul", "li"]
_CLASSES = ["a", "b", "c"]


@st.composite
def _tree_html(draw, depth=0):
    tag = draw(st.sampled_from(_TAGS))
    cls = draw(st.lists(st.sampled_from(_CLASSES), max_size=2, unique=True))
    attr = f' class="{" ".join(cls)}"' if cls else ""
    if depth >= 3:
        return f"<{tag}{attr}>x</{tag}>"
    kids = draw(st.lists(_tree_html(depth + 1), max_size=3))
    return f"<{tag}{attr}>{''.join(kids)}</{tag}>"


@st.composite
def _selector(draw):
    def compound():
        tag = draw(st.sampled_from(_TAGS + ["*", ""]))
        cls = draw(st.lists(st.sampled_from(_CLASSES), max_size=1))
        s = tag + "".join(f".{c}" for c in cls)
        return s or "p"
    parts = [compound()]
    for _ in range(draw(st.integers(0, 2))):
        parts.append(draw(st.sampled_from([" ", " > ", " + ", " ~ "])))
        parts.append(compound())
    return "".join(parts)


@given(html=_tree_html(), sel=_selector())
@settings(max_examples=120, deadline=None)
def test_query_matches_consistency(html, sel):
    doc, _ = parse_html(html)
    got = query(doc, sel)
    from lexor_spark.kernel.dom import Element
    all_els = [n for n in doc.iter()
               if n is not doc and isinstance(n, Element)]
    expected = [n for n in all_els if matches(n, sel)]
    assert got == expected  # same nodes, same (document) order


# -- regression: review findings ------------------------------------------

def test_sibling_chain_linear_on_wide_pages():
    """Chained sibling selectors over thousands of identical siblings
    must stay near-linear (set-propagation matcher), not backtrack."""
    import time

    html = "<div>" + '<p class="a">x</p>' * 3000 + "</div>"
    doc, _ = parse_html(html)
    t0 = time.perf_counter()
    got = query(doc, "p.a ~ p.a ~ p.a")
    dt = time.perf_counter() - t0
    assert len(got) == 2998
    assert dt < 2.0, f"sibling chain took {dt:.2f}s"
    t0 = time.perf_counter()
    got = query(doc, "div > p + p")
    dt = time.perf_counter() - t0
    assert len(got) == 2999 and dt < 2.0


def test_escaped_selectors_match():
    doc, _ = parse_html(
        '<p class="a.b">dot</p><p title=\'a"b\'>quote</p>')
    assert texts(query(doc, r"p.a\.b")) == ["dot"]
    assert texts(query(doc, '[title="a\\"b"]')) == ["quote"]


def test_duplicate_ids_all_match_and_scope():
    html = ('<div id="x">first</div>'
            '<section><div id="x"><p>inner</p></div></section>')
    doc, _ = parse_html(html)
    assert len(query(doc, "#x")) == 2  # duplicates are routine in crawls
    section = query(doc, "section")[0]
    got = query(section, "#x")
    assert len(got) == 1 and got[0].children[0].name == "p"
    # query()/matches() agree on every element
    from lexor_spark.kernel.dom import Element
    els = [n for n in doc.iter() if n is not doc and isinstance(n, Element)]
    assert [n for n in els if matches(n, "#x")] == query(doc, "#x")


def test_indent_only_never_rewraps(tmp_path, capsys):
    from lexor_spark.__main__ import main
    from lexor_spark.kernel.pipeline import extract_document

    body = " ".join(f"w{i}" for i in range(40))
    html = f"<main><p>{body}</p></main>"
    res = extract_document(html.encode(), "u", None, "> ")
    lines = res.text.split("\n")
    assert len(lines) == 1 and lines[0].startswith("> ")
    f = tmp_path / "p.html"
    f.write_text(html)
    assert main([str(f), "to", "text", "--indent", "> "]) == 0
    out = capsys.readouterr().out.rstrip("\n")
    assert out.split("\n") == [f"> {body}"]


def test_rewrite_batches_arrow():
    """css_rewrite batch UDF: selector-matched subtrees removed, page
    re-serialized, removal count reported."""
    import pyarrow as pa

    from lexor_spark.job import _rewrite_batches

    html = (b'<body><nav class="nav"><a href="/">x</a></nav>'
            b'<main><p>keep</p></main>'
            b'<footer class="footer">f</footer></body>')
    batch = pa.RecordBatch.from_pydict(
        {"url": ["u1", "u2"], "html": [html, None]})
    [out] = list(_rewrite_batches(["nav.nav", "footer"])([batch]))
    rows = {r["url"]: r for r in out.to_pylist()}
    assert rows["u1"]["n_removed"] == 2
    assert "<nav" not in rows["u1"]["html_out"]
    assert "<footer" not in rows["u1"]["html_out"]
    assert "<p>keep</p>" in rows["u1"]["html_out"]
    assert rows["u2"]["n_removed"] == 0 and rows["u2"]["html_out"] == ""


def test_query_left_hand_outside_context():
    """querySelectorAll semantics: a combinator's LEFT-hand side may
    match ancestors/preceding siblings OUTSIDE the context subtree —
    query() and matches() must agree on non-root contexts."""
    doc, _ = parse_html(
        '<html><body><div id="side"><p>s</p></div>'
        '<div id="main"><p>m1</p><section><p>m2</p></section></div>'
        "</body></html>")
    main = query(doc, "#main")[0]
    # ancestor (body, html) lies outside the #main subtree
    hits = query(main, "body p")
    assert [n.children[0].data for n in hits] == ["m1", "m2"]
    for n in hits:
        assert matches(n, "body p")
    # preceding sibling of the context itself is outside the subtree:
    # "div + div p" matches #main's descendants because #side precedes it
    hits2 = query(main, "div + div p")
    assert [n.children[0].data for n in hits2] == ["m1", "m2"]
    assert all(matches(n, "div + div p") for n in hits2)
    # but results never escape the context subtree
    assert query(main, "p") == [n for n in hits]


# -- CHILD pseudo-class subset (exceeds the reference's stub compiler) ----

def test_child_pseudos():
    doc, _ = parse_html(
        "<html><body><ul>"
        "<li>a</li>text<li>b</li><li>c</li><li>d</li><li>e</li>"
        "</ul><div><p>solo</p></div></body></html>")
    def texts_of(sel):
        return ["".join(n.data for n in el.iter()
                        if type(n).__name__ == "Text")
                for el in query(doc, sel)]
    assert texts_of("li:first-child") == ["a"]
    assert texts_of("li:last-child") == ["e"]
    assert texts_of("li:nth-child(2)") == ["b"]
    assert texts_of("li:nth-child(odd)") == ["a", "c", "e"]
    assert texts_of("li:nth-child(even)") == ["b", "d"]
    assert texts_of("li:nth-child(2n+1)") == ["a", "c", "e"]
    assert texts_of("li:nth-child(-n+2)") == ["a", "b"]
    assert texts_of("li:nth-child(n)") == ["a", "b", "c", "d", "e"]
    assert texts_of("p:only-child") == ["solo"]
    assert texts_of("li:only-child") == []
    # positions count ELEMENT siblings (the text node is invisible)
    assert texts_of("ul :nth-child(3)") == ["c"]
    # pseudo composes with combinators and classes
    assert texts_of("ul > li:last-child") == ["e"]
    # matches() agrees with query()
    li_b = query(doc, "li:nth-child(2)")[0]
    assert matches(li_b, "li:nth-child(even)")
    assert not matches(li_b, "li:first-child")


def test_of_type_and_negation_pseudos():
    doc, _ = parse_html(
        "<html><body><div>"
        "<p class='ad'>x</p><p>k1</p><em>e1</em><p>k2</p><em>e2</em>"
        "</div><section><h1>t</h1></section></body></html>")
    def texts_of(sel):
        return ["".join(n.data for n in el.iter()
                        if type(n).__name__ == "Text")
                for el in query(doc, sel)]
    # *-of-type restrict position counting to same-tag siblings
    assert texts_of("p:first-of-type") == ["x"]
    assert texts_of("p:last-of-type") == ["k2"]
    assert texts_of("em:first-of-type") == ["e1"]
    assert texts_of("p:nth-of-type(2)") == ["k1"]
    assert texts_of("p:nth-of-type(odd)") == ["x", "k2"]
    assert texts_of("h1:only-of-type") == ["t"]
    assert texts_of("p:only-of-type") == []
    # nth-last-* count from the end
    assert texts_of("div :nth-last-child(1)") == ["e2"]
    assert texts_of("p:nth-last-of-type(1)") == ["k2"]
    # last-positions: x=3, k1=2, k2=1 → odd ones are x and k2
    assert texts_of("p:nth-last-of-type(2n+1)") == ["x", "k2"]
    # :not() with class / tag / attribute compounds
    assert texts_of("p:not(.ad)") == ["k1", "k2"]
    assert [e.name for e in query(doc, "div :not(p)")] == ["em", "em"]
    assert texts_of("div :not([class])") == ["k1", "e1", "k2", "e2"]
    # :not composes with other pseudos on the same compound
    assert texts_of("p:not(.ad):nth-of-type(3)") == ["k2"]
    # matches() agrees
    k1 = query(doc, "p:nth-of-type(2)")[0]
    assert matches(k1, "p:not(.ad)")
    assert not matches(k1, "p:not([class]):first-of-type")


def test_unsupported_pseudo_still_rejected():
    import pytest as _pytest
    with _pytest.raises(SelectorError):
        tokenize("a:hover")
    with _pytest.raises(SelectorError):
        tokenize("li:nth-child(2x+1)")
    # CSS3 negation grammar: one compound, no nesting, no combinators
    with _pytest.raises(SelectorError):
        tokenize("p:not(div p)")
    with _pytest.raises(SelectorError):
        tokenize("p:not(a, b)")
