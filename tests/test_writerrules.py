"""W2 pluggable NodeWriter registry (reference writer.py:54-99):
custom per-tag rules replace built-in handling in all three writers;
absent registry is byte-identical to the pre-registry path."""

from __future__ import annotations

from lexor_spark.kernel.htmlparser import parse_html
from lexor_spark.kernel.htmlwriter import write_html
from lexor_spark.kernel.mdwriter import write_markdown
from lexor_spark.kernel.textwriter import write_text
from lexor_spark.kernel.writerrules import WriterRule

HTML = ('<html><body><p>Before <img src="/a.png" alt="a chart"> '
        "after.</p><div class=ad>buy now</div><p>End</p></body></html>")


def _root(html):
    doc, _ = parse_html(html)
    return doc


class ImgAltRule(WriterRule):
    """img → ![alt] (the VERDICT example)."""

    def start(self, ctx, node):
        ctx.add_inline(f"![{node.attrs.get('alt', '')}]")


class DropRule(WriterRule):
    """Suppress a subtree entirely (child gate)."""

    def child(self, node):
        return False


class UpcaseTextRule(WriterRule):
    def data(self, ctx, node):
        ctx.add_inline(node.data.upper())
        return True


def test_text_rules_img_and_drop():
    text, _ = write_text(_root(HTML))
    assert "a chart" not in text and "buy now" in text
    text2, _ = write_text(_root(HTML),
                          rules={"img": ImgAltRule(), "div": DropRule()})
    assert "![a chart]" in text2
    assert "buy now" not in text2
    assert "Before" in text2 and "End" in text2


def test_text_rules_absent_is_byte_identical():
    a, sa = write_text(_root(HTML))
    b, sb = write_text(_root(HTML), rules={})
    assert a == b
    assert [s.as_tuple() for s in sa] == [s.as_tuple() for s in sb]


def test_text_data_rule_claims_nodes():
    text, spans = write_text(_root("<p>hello there</p>"),
                             rules={"#text": UpcaseTextRule()})
    assert text == "HELLO THERE"
    assert spans == []  # rule-emitted output carries no source span


def test_text_rule_start_end_order():
    class Bracket(WriterRule):
        def start(self, ctx, node):
            ctx.add_inline("<<")

        def end(self, ctx, node):
            ctx.add_inline(">>")

    text, _ = write_text(_root("<p>x <b>y</b> z</p>"),
                         rules={"b": Bracket()})
    assert "<< y >> z" in text or "<<y>> z" in text  # children inside


def test_markdown_rules():
    class Kbd(WriterRule):
        def start(self, ctx, node):
            ctx.wrap("<kbd>")

        def end(self, ctx, node):
            ctx.wrap("</kbd>")

    md = write_markdown(_root("<p>Press <span class=k>Ctrl</span>.</p>"),
                        rules={"span": Kbd()})
    assert "<kbd>" in md and "</kbd>" in md and "Ctrl" in md
    assert write_markdown(_root(HTML)) == write_markdown(_root(HTML),
                                                         rules={})


def test_html_rules_rewrite_tag():
    class BToStrong(WriterRule):
        def start(self, ctx, node):
            ctx.append("<strong>")

        def end(self, ctx, node):
            ctx.append("</strong>")

    out = write_html(_root("<html><body><p><b>hi</b></p></body></html>"),
                     rules={"b": BToStrong()})
    assert "<strong>hi</strong>" in out
    assert write_html(_root(HTML)) == write_html(_root(HTML), rules={})


def test_html_void_rule():
    class ImgComment(WriterRule):
        def start(self, ctx, node):
            ctx.append(f"<!--img:{node.attrs.get('src', '')}-->")

    out = write_html(_root(HTML), rules={"img": ImgComment()})
    assert "<!--img:/a.png-->" in out and "<img" not in out
