"""Converter + writer unit tests: boilerplate strip, main selection,
break collapsing, spans (golden analogues of the reference's round-trip
mechanism, `/root/reference/lexor/command/test.py:254-294`)."""

from __future__ import annotations

from lexor_spark.kernel import extract_document
from lexor_spark.kernel.extractor import collect_meta, convert, select_main
from lexor_spark.kernel.htmlparser import parse_html
from lexor_spark.kernel.textwriter import write_text


def _extract(html: str) -> str:
    return extract_document(html).text


def test_drop_boilerplate_tags():
    out = _extract(
        "<body><nav>skip</nav><script>skip()</script><style>.x{}</style>"
        "<article><p>keep</p></article><footer>skip</footer></body>")
    assert out == "keep"


def test_drop_by_class_and_id():
    out = _extract(
        '<div class="sidebar">no</div><div id="main-nav">no</div>'
        '<div class="content"><p>yes</p></div>')
    assert out == "yes"


def test_drop_by_role_and_hidden():
    out = _extract(
        '<div role="navigation">no</div><div hidden>no</div>'
        '<div aria-hidden="true">no</div><article><p>yes</p></article>')
    assert out == "yes"


def test_unwrap_inline():
    out = _extract("<article><p>a <b>b</b> <span>c</span> <a href='#'>d</a></p></article>")
    assert out == "a b c d"


def test_main_selection_cascade():
    # main beats article beats div.content beats text-mass
    html = ('<div class="content">c</div><article>a</article>'
            "<main>m</main>")
    assert _extract(html) == "m"
    html = '<div class="content">c</div><article>a</article>'
    assert _extract(html) == "a"
    html = '<div>plain</div><div class="content">c</div>'
    assert _extract(html) == "c"
    # fallback: biggest text mass div
    html = "<div>short</div><div>a much longer block of body text here</div>"
    assert _extract(html) == "a much longer block of body text here"


def test_paragraph_and_line_breaks():
    out = _extract(
        "<article><h1>T</h1><p>one</p><p>two</p>"
        "<ul><li>a<li>b</ul><p>x<br>y</p></article>")
    assert out == "T\n\none\n\ntwo\n\na\nb\n\nx\ny"


def test_empty_blocks_collapse():
    out = _extract("<article><p>one</p><div></div><div><span></span></div><p>two</p></article>")
    assert out == "one\n\ntwo"


def test_whitespace_collapsing():
    out = _extract("<article><p>  a\n\t b   c </p></article>")
    assert out == "a b c"


def test_pre_verbatim():
    out = _extract("<article><p>x</p><pre>\n  code();\n  more();  \n</pre><p>y</p></article>")
    assert out == "x\n\n  code();\n  more();\n\ny"


def test_table_cells():
    out = _extract("<article><table><tr><td>a</td><td>b</td></tr>"
                   "<tr><td>c</td><td>d</td></tr></table></article>")
    assert out == "a b\nc d"


def test_entities_decoded():
    out = _extract("<article><p>a &amp; b &lt;tag&gt; &#233; &nbsp;end</p></article>")
    assert out == "a & b <tag> é end"


def test_title_and_meta():
    doc, _ = parse_html(
        "<head><title> My &amp; Title </title>"
        '<meta name="description" content="desc here">'
        '</head><html lang="fr"></html>')
    meta = collect_meta(doc)
    assert meta["title"] == "My & Title"
    assert meta["description"] == "desc here"
    doc, _ = parse_html('<html lang="fr"><body>x</body></html>')
    assert collect_meta(doc)["lang"] == "fr"


def test_spans_point_into_source():
    src = "<article><p>hello world</p><p>more &amp; text</p></article>"
    res = extract_document(src)
    assert res.text == "hello world\n\nmore & text"
    assert res.spans, "spans must be emitted"
    for start, end, path in res.spans:
        assert 0 <= start < end <= len(src)
        assert path.startswith("article")
    # first span is exactly the first text run
    s0 = res.spans[0]
    assert src[s0[0]:s0[1]] == "hello world"


def test_error_row_on_hostile_bytes():
    res = extract_document(b"\xff\xfe\x00garbage<not html")
    assert res.ok  # replacement decode, parsed as text
    res = extract_document(12345)  # type: ignore[arg-type]
    assert not res.ok and res.err


def test_byte_determinism():
    html = ('<main><p>x &amp; y</p><ul><li>a<li>b</ul>'
            "<script>junk</script></main>")
    a = extract_document(html)
    b = extract_document(html)
    assert a.text == b.text and a.spans == b.spans


def test_convert_normalizes_adjacent_text():
    # unwrapping <b> splices its text between siblings: must merge
    doc, _ = parse_html("<p>a<b>b</b>c</p>")
    conv = convert(doc)
    p = conv.children[0]
    assert len(p.children) == 1
    assert p.children[0].data == "abc"


GOLDEN = [
    # (html, expected_text) — frozen contract (reviewed by hand).
    ("<main><h1>Title</h1><p>Body one.</p><p>Body two.</p></main>",
     "Title\n\nBody one.\n\nBody two."),
    ("<article>Text with <em>emphasis</em> and <code>code</code>.</article>",
     "Text with emphasis and code."),
    ('<body><div id="content"><p>α β γ — ≤ ≥ 中文</p></div></body>',
     "α β γ — ≤ ≥ 中文"),
    ("<main><blockquote><p>quote</p></blockquote>tail</main>",
     "quote\n\ntail"),
    ("<main><hr><p>after rule</p></main>", "after rule"),
]


def test_goldens():
    for html, expected in GOLDEN:
        assert extract_document(html).text == expected, html


def test_writer_hooks_w2():
    """W2 hook slots (reference writer.py:395-400): pre sees the empty
    builder, post sees it before final assembly and may append."""
    from lexor_spark.kernel.htmlparser import parse_html
    from lexor_spark.kernel.textwriter import write_text

    doc, _ = parse_html("<p>body text</p>")
    calls = []

    def pre(tb, root):
        calls.append(("pre", tb.result()))

    def post(tb, root):
        calls.append(("post",))
        tb.add_inline(" [hooked]")

    out, _ = write_text(doc, pre_process=pre, post_process=post)
    assert calls[0] == ("pre", "") and calls[1] == ("post",)
    assert out.endswith("[hooked]")
    # hookless call unchanged
    out2, _ = write_text(doc)
    assert out2 == "body text"
