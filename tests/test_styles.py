"""Named writer styles (`kernel/styles.py`): the shipped
'training_text' W2 rule registry through the full extraction pipeline
(parse → convert → styled write), plus default-path byte identity."""

from __future__ import annotations

import pytest

from lexor_spark.kernel import extract_document
from lexor_spark.kernel.styles import STYLES, style_rules

PAGE = (
    "<html><head><title>T</title></head><body><main>"
    '<p>Read the <a href="/docs/guide">full guide</a> and the '
    '<a href="#top">top link</a> and <a href="javascript:void(0)">js</a>.</p>'
    '<p><img src="/x.png" alt="sales chart"> and <img src="/y.png"></p>'
    "<table><tr><th>h1</th><th>h2</th></tr>"
    "<tr><td>a</td><td>b</td></tr></table>"
    "<p>After.</p>"
    "</main></body></html>"
)


def test_link_targets_visible():
    res = extract_document(PAGE, style="training_text")
    assert res.ok
    assert "full guide </docs/guide>" in res.text
    # fragment-only and javascript: targets stay invisible
    assert "<#top>" not in res.text
    assert "javascript" not in res.text
    assert "top link" in res.text and "js" in res.text


def test_image_placeholder_only_with_alt():
    res = extract_document(PAGE, style="training_text")
    assert "[image: sales chart]" in res.text
    # alt-less image: silent (no bare [image: ] marker)
    assert "[image: ]" not in res.text


def test_table_omitted_with_cell_count():
    res = extract_document(PAGE, style="training_text")
    assert "[table: 4 cells]" in res.text
    for cell in ("h1", "h2"):
        assert cell not in res.text
    assert "After." in res.text


def test_default_path_unaffected():
    plain = extract_document(PAGE)
    assert "full guide" in plain.text
    assert "</docs/guide>" not in plain.text
    assert "[table:" not in plain.text
    # table cells render in the default style
    assert "a b" in plain.text


def test_unknown_style_fails_fast():
    with pytest.raises(KeyError, match="training_text"):
        style_rules("no_such_style")
    assert "training_text" in STYLES


def test_styled_output_is_deterministic():
    a = extract_document(PAGE, style="training_text")
    b = extract_document(PAGE, style="training_text")
    assert a.text == b.text
    assert a.spans == b.spans


def test_cli_style_flag(tmp_path, capsys):
    from lexor_spark.__main__ import main
    f = tmp_path / "p.html"
    f.write_text('<main><p><a href="/d">docs</a></p>'
                 "<table><tr><td>x</td></tr></table></main>")
    assert main([str(f), "to", "text", "--style", "training_text"]) == 0
    out = capsys.readouterr().out
    assert "docs </d>" in out and "[table: 1 cells]" in out
    assert main([str(f), "to", "text", "--style", "nope"]) == 2
    assert "unknown writer style" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# parameterized style specs (name:key=val,...)
# ---------------------------------------------------------------------------

def test_style_params_switch_hooks_off():
    res = extract_document(PAGE, style="training_text:links=off")
    assert "</docs/guide>" not in res.text        # link hook disabled
    assert "[image: sales chart]" in res.text      # others untouched
    assert "[table: 4 cells]" in res.text


def test_style_params_tables_keep():
    res = extract_document(PAGE, style="training_text:tables=keep")
    assert "[table:" not in res.text
    assert "h1" in res.text                        # default table rendition
    assert "</docs/guide>" in res.text


def test_style_params_combined():
    res = extract_document(
        PAGE, style="training_text:links=off,images=off,tables=keep")
    # all hooks off == the default rendition (modulo the keep-styled
    # converter path, which COPYs style-keyed tags; with no rules the
    # registry is empty so nothing is keyed)
    assert "</docs/guide>" not in res.text
    assert "[image:" not in res.text
    assert "[table:" not in res.text


def test_style_param_validation():
    from lexor_spark.kernel.styles import parse_style_spec
    assert parse_style_spec("training_text:links=off,tables=keep") == (
        "training_text", {"links": "off", "tables": "keep"})
    assert parse_style_spec("training_text") == ("training_text", {})
    with pytest.raises(ValueError, match="key=val"):
        style_rules("training_text:links")
    with pytest.raises(ValueError, match="on/off"):
        style_rules("training_text:links=maybe")
    with pytest.raises(ValueError, match="unknown parameter"):
        style_rules("training_text:nosuch=1")
    with pytest.raises(KeyError, match="training_text"):
        style_rules("nope:links=off")


def test_cli_style_with_params(tmp_path, capsys):
    from lexor_spark.__main__ import main
    f = tmp_path / "p.html"
    f.write_text('<main><p><a href="/d">docs</a></p>'
                 "<table><tr><td>x</td></tr></table></main>")
    assert main([str(f), "to", "text",
                 "--style", "training_text:tables=keep"]) == 0
    out = capsys.readouterr().out
    assert "docs </d>" in out and "[table:" not in out and "x" in out
    assert main([str(f), "to", "text",
                 "--style", "training_text:bogus=1"]) == 2
    assert "unknown parameter" in capsys.readouterr().err


def test_extract_pages_parameterized_style(spark):
    """A parameterized spec travels as a plain string into the Arrow
    batch UDF and resolves worker-side; per-row output equals the
    serial kernel under the same spec."""
    from lexor_spark.job import extract_pages
    rows = [("u1", PAGE.encode()), ("u2", b"<main><p>plain</p></main>")]
    df = spark.createDataFrame(rows, "url string, html binary")
    spec = "training_text:links=off,tables=keep"
    got = {r.url: r.text for r in
           extract_pages(df, style=spec).select("url", "text").collect()}
    for url, html in rows:
        assert got[url] == extract_document(html, url, style=spec).text
    assert "</docs/guide>" not in got["u1"] and "h1" in got["u1"]


def test_extract_pages_bad_style_param_fails_driver_side(spark):
    from lexor_spark.job import extract_pages
    df = spark.createDataFrame([("u", b"<p>x</p>")],
                               "url string, html binary")
    with pytest.raises(ValueError, match="unknown parameter"):
        extract_pages(df, style="training_text:bogus=1")
