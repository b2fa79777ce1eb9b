"""DOM mutation algebra + converter replacement protocol.

VERDICT r1 item #6: insert_before / extend_before / append_after /
clone_node / contains / slice del-set / innerHTML (reference
`node.py:310-443,481-573`, `elements.py:293-302,353-395,431-481`) and
the converter ``end()``-replacement slot (`converter.py:52-76`).
"""

from __future__ import annotations

import pytest

from lexor_spark.kernel.dom import (
    Document, Element, Entity, Text, Void, dispose,
)
from lexor_spark.kernel.extractor import (
    COPY, DROP, REPLACE, UNWRAP, convert, extraction_decide,
)
from lexor_spark.kernel.htmlparser import parse_html
from lexor_spark.kernel.htmlwriter import write_html
from lexor_spark.kernel.textwriter import write_text


def el(name, *kids, **attrs):
    node = Element(name, dict(attrs) if attrs else None)
    for k in kids:
        node.append_child(k)
    return node


# -- insert / extend / placement ------------------------------------------

def test_insert_before_detaches_and_links():
    a, b, c = Text("a"), Text("b"), Text("c")
    p = el("p", a, c)
    p.insert_before(1, b)
    assert [n.data for n in p.children] == ["a", "b", "c"]
    assert b.parent is p
    # inserting a node that lives elsewhere moves it (append_child is
    # the no-detach parser primitive; the mutation API detaches)
    q = el("q")
    q.extend_children([b])
    assert b.parent is q and len(p) == 2
    p.insert_before(0, b)
    assert len(q) == 0 and p.children[0] is b


def test_extend_before_list_and_fragment():
    p = el("p", Text("z"))
    p.extend_before(0, [Text("x"), Text("y")])
    assert [n.data for n in p.children] == ["x", "y", "z"]
    # a Document fragment is drained; its meta folds into the owner doc
    doc = Document()
    host = el("div")
    doc.append_child(host)
    frag = Document()
    frag.meta["title"] = "T"
    frag.append_child(Text("f1"))
    frag.append_child(Text("f2"))
    host.extend_children(frag)
    assert [n.data for n in host.children] == ["f1", "f2"]
    assert len(frag) == 0
    assert doc.meta["title"] == "T"


def test_append_after_and_prepend_before():
    a, c = Text("a"), Text("c")
    p = el("p", a, c)
    a.append_after(Text("b"))
    assert [n.data for n in p.children] == ["a", "b", "c"]
    c.prepend_before(Text("bb"))
    assert [n.data for n in p.children] == ["a", "b", "bb", "c"]
    last = p.children[-1]
    last.append_after(Text("d"))  # append-at-end path
    assert [n.data for n in p.children][-1] == "d"
    with pytest.raises(ValueError):
        Text("loose").append_after(Text("x"))


# -- slices ------------------------------------------------------------------

def test_getitem_delitem_setitem():
    kids = [Text(ch) for ch in "abcde"]
    p = el("p", *kids)
    assert p[0] is kids[0]
    assert [n.data for n in p[1:3]] == ["b", "c"]
    del p[1]
    assert [n.data for n in p.children] == ["a", "c", "d", "e"]
    assert kids[1].parent is None
    del p[1:3]
    assert [n.data for n in p.children] == ["a", "e"]
    p[1] = Text("E")
    assert [n.data for n in p.children] == ["a", "E"]
    assert kids[4].parent is None
    p[0:1] = [Text("x"), Text("y")]  # plain slice may resize
    assert [n.data for n in p.children] == ["x", "y", "E"]
    with pytest.raises(ValueError):
        p[0:3:2] = [Text("only-one")]  # extended slice size must match
    with pytest.raises(TypeError):
        p[0] = p  # self-adoption


# -- clone / contains / innerHTML ---------------------------------------------

def test_clone_node_deep_independent():
    doc, _ = parse_html('<div id="d"><p>one <b>two</b></p><hr></div>')
    src = doc.children[0]
    copy = src.clone_node(deep=True)
    assert write_html(copy) == write_html(src)
    assert copy is not src and copy.parent is None
    # mutating the clone leaves the source untouched
    copy.attrs["id"] = "changed"
    copy.children[0].append_text(" extra")
    assert src.attrs["id"] == "d"
    assert "extra" not in write_html(src)
    # shallow clone copies the node only
    sh = src.clone_node()
    assert sh.name == "div" and len(sh) == 0


def test_clone_deep_hostile_depth():
    doc, _ = parse_html("<div>" * 3000 + "x" + "</div>" * 3000)
    copy = doc.clone_node(deep=True)
    assert write_html(copy) == write_html(doc)
    dispose(doc)
    dispose(copy)


def test_contains():
    doc, _ = parse_html("<div><p><b>x</b></p></div>")
    div = doc.children[0]
    b = div.children[0].children[0]
    assert div.contains(b)
    assert doc.contains(b)
    assert not div.contains(div)       # strict descendant
    assert not b.parent.contains(div)  # not an ancestor


def test_inner_html_get_set():
    doc, _ = parse_html("<div><p>a &amp; b</p></div>")
    div = doc.children[0]
    assert div.inner_html() == "<p>a &amp; b</p>"
    div.set_inner_html("<ul><li>x</li></ul>")
    assert div.inner_html() == "<ul><li>x</li></ul>"
    assert all(c.parent is div for c in div.children)


# -- converter replacement protocol -------------------------------------------

def _img_alt_decide(node):
    if type(node) is Void and node.name == "img":
        return REPLACE
    return extraction_decide(node)


def test_converter_replace_img_with_alt():
    """The rule round 1 could not express: <img> → its alt text."""
    doc, _ = parse_html('<main><p>see <img src="i.png" alt="a chart"> here</p></main>')

    def replacer(node):
        alt = node.attrs.get("alt")
        return Text(alt) if alt else None

    out = convert(doc, decide=_img_alt_decide, replacer=replacer)
    text, _ = write_text(out)
    assert text == "see a chart here"
    # default rule-set drops the img instead
    base, _ = write_text(convert(doc))
    assert base == "see here"


def test_converter_end_hook_replacement():
    """The reference end() slot: replace a completed element."""
    doc, _ = parse_html("<main><p>keep</p><figure><p>cap</p></figure></main>")

    def end_hook(src, dst):
        if dst.name == "figure":
            repl = Element("p")
            repl.append_text("[figure: " + dst.text_content() + "]")
            return repl
        return None

    out = convert(doc, decide=extraction_decide, end_hook=end_hook)
    text, _ = write_text(out)
    assert text == "keep\n\n[figure: cap]"


# -- navigation / attribute-order surface (N1 / E1 / E6) ----------------------

def test_prev_next_element_skip_text():
    doc, _ = parse_html("<div>t1<p>a</p>t2<b>c</b>t3</div>")
    div = doc.children[0]
    p, b = div.children[1], div.children[3]
    assert p.next_element is b and b.prev_element is p
    assert p.prev_element is None and b.next_element is None
    assert doc.children[0].prev_element is None  # no parentless crash


def test_positional_attribute_access():
    doc, _ = parse_html('<a href="u" class="c" id="i">x</a>')
    a = doc.children[0]
    assert a.attlen == 3
    assert a.attributes == ["href", "class", "id"]
    assert a.values == ["u", "c", "i"]
    assert a.attribute(1) == "class" and a.attr(1) == "c"
    b = Element("b", {"class": "z", "title": "t"})
    a.update_attributes(b)
    assert a.attributes == ["href", "class", "id", "title"]
    assert a.attrs["class"] == "z"


def test_document_create_element():
    el2 = Document.create_element("p", {"class": "x"})
    assert el2.name == "p" and el2.attrs == {"class": "x"} and len(el2) == 0


def test_navigation_tails():
    """N1 tail: previous_element / element_index / sibling properties
    (reference node.py:131-192)."""
    from lexor_spark.kernel.htmlparser import parse_html
    doc, _ = parse_html(
        "<html><body><p>a</p>mid<span>b</span>tail<em>c</em></body></html>")
    body = doc.get_nodes_by_name("body")[0]
    p, span, em = (body.children[0], body.children[2], body.children[4])
    assert p.name == "p" and span.name == "span" and em.name == "em"
    assert span.previous_element is p
    assert span.prev_element is p          # short alias unchanged
    assert p.previous_element is None
    assert em.previous_element is span
    assert [n.element_index for n in (p, span, em)] == [0, 1, 2]
    # text nodes count element predecessors only
    mid = body.children[1]
    assert mid.element_index == 1 and mid.previous_sibling is p
    assert mid.next_sibling is span
    assert em.next_sibling is None
    assert doc.previous_sibling is None and doc.next_sibling is None
