"""Golden tests for the html→markdown conversion (the reference's
flagship target: `lexor file.html to markdown`)."""

from __future__ import annotations

import pytest

from lexor_spark.kernel.htmlparser import parse_html
from lexor_spark.kernel.mdwriter import write_markdown


def md(src: str) -> str:
    doc, _ = parse_html(src)
    return write_markdown(doc)


CASES = [
    ("heading", "<h1>Title</h1><p>body</p>", "# Title\n\nbody"),
    ("levels", "<h2>A</h2><h3>B</h3>", "## A\n\n### B"),
    ("bold-italic", "<p><b>fat</b> and <em>slanted</em></p>",
     "**fat** and *slanted*"),
    ("link", '<p>see <a href="http://x.y">here</a>.</p>',
     "see [here](http://x.y)."),
    ("image", '<p><img src="i.png" alt="pic"></p>', "![pic](i.png)"),
    ("ul", "<ul><li>one<li>two</ul>", "- one\n\n- two"),
    ("ol", "<ol><li>first<li>second</ol>", "1. first\n\n2. second"),
    ("blockquote", "<blockquote>wisdom</blockquote>", "> wisdom"),
    ("nested-quote", "<blockquote><blockquote>deep</blockquote></blockquote>",
     "> > deep"),
    ("code-inline", "<p>run <code>ls -la</code> now</p>", "run `ls -la` now"),
    ("pre-fenced", "<pre>line1\nline2</pre>", "```\nline1\nline2\n```"),
    ("hr", "<p>a</p><hr><p>b</p>", "a\n\n---\n\nb"),
    ("br", "<p>one<br>two</p>", "one  \ntwo"),
    ("entity", "<p>a &amp; b</p>", "a & b"),
    ("script-dropped", "<p>x</p><script>var y=1;</script>", "x"),
    ("md-chars-escaped", "<p>2*3 and [x]</p>", r"2\*3 and \[x\]"),
    ("paragraphs", "<p>one</p><p>two</p>", "one\n\ntwo"),
    ("malformed", "<p>open<p>next", "open\n\nnext"),
]


@pytest.mark.parametrize("case_id,src,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_markdown_golden(case_id, src, expected):
    assert md(src) == expected


def test_full_page():
    src = ("<!doctype html><html><head><title>T</title>"
           "<style>.x{}</style></head><body>"
           "<h1>Doc</h1><p>Intro with <b>bold</b>.</p>"
           "<ul><li>alpha</li><li>beta</li></ul>"
           "<blockquote>quoted text</blockquote>"
           "</body></html>")
    assert md(src) == ("# Doc\n\nIntro with **bold**.\n\n"
                       "- alpha\n\n- beta\n\n> quoted text")


def test_deterministic_and_robust():
    src = "<div>" * 2000 + "x" + "</div>" * 2000
    assert md(src) == md(src) == "x"
    assert md("") == ""
    assert md("\xff� <p>ok</p>").endswith("ok")


def test_cli_roundtrip(tmp_path, capsys):
    from lexor_spark.__main__ import main

    f = tmp_path / "x.html"
    f.write_text("<main><p>hello <b>world</b></p></main>")
    assert main([str(f), "to", "text"]) == 0
    assert capsys.readouterr().out == "hello world\n"
    assert main([str(f), "to", "markdown"]) == 0
    assert capsys.readouterr().out == "hello **world**\n"
    assert main([str(f), "to", "html"]) == 0
    assert capsys.readouterr().out == \
        "<main><p>hello <b>world</b></p></main>\n"
