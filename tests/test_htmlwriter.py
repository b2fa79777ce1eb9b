"""Round-trip tests for the DOM→HTML serializer (reference golden-output
mechanism, `test.py:254-271`): parse→serialize must be idempotent."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lexor_spark.kernel.htmlparser import parse_html
from lexor_spark.kernel.htmlwriter import write_html

CASES = [
    ("basic", "<p>hello</p>", "<p>hello</p>"),
    ("attrs", '<a href="x" class="y">t</a>', '<a href="x" class="y">t</a>'),
    ("bare-attr", "<input disabled>", "<input disabled>"),
    ("void", "line<br>two", "line<br>two"),
    ("entity-kept", "a &amp; b", "a &amp; b"),
    ("text-escaped", "<p>1 < 2</p>", "<p>1 &lt; 2</p>"),
    ("comment", "<!-- c -->", "<!-- c -->"),
    ("doctype", "<!doctype html><p>x</p>", "<!doctype html><p>x</p>"),
    ("rawtext", '<script>if (1<2) x("&");</script>',
     '<script>if (1<2) x("&");</script>'),
    ("implied-close", "<ul><li>a<li>b</ul>", "<ul><li>a</li><li>b</li></ul>"),
    ("autoclose", "<a><p>stuff</a>", "<a><p>stuff</p></a>"),
    ("pi", "<?target data?>", "<?target data?>"),
    ("quote-in-attr", "<p title='say \"hi\"'>x</p>",
     '<p title="say &quot;hi&quot;">x</p>'),
]


@pytest.mark.parametrize("case_id,src,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_golden_serialize(case_id, src, expected):
    doc, _ = parse_html(src)
    assert write_html(doc) == expected


@pytest.mark.parametrize("case_id,src,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_serialize_is_idempotent(case_id, src, expected):
    once = write_html(parse_html(src)[0])
    twice = write_html(parse_html(once)[0])
    assert once == twice


_soup = st.text(
    alphabet=st.sampled_from(list("<>&;/=\"' abcdeP\n!-?[]#é")),
    max_size=200,
)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_parse_serialize_fixpoint(s: str):
    """serialize∘parse is a projection: applying it twice equals once."""
    once = write_html(parse_html(s)[0])
    twice = write_html(parse_html(once)[0])
    assert once == twice


def test_fixpoint_on_generated_pages():
    random.seed(3)
    toks = ["<div class='a b'>", "</div>", "<p>", "text & more",
            "<script>x<y</script>", "<br>", "&lt;", "<!-- c -->",
            "<ul><li>i1<li>i2</ul>", "<img src=x>", "é漢", "<td>c</td>"]
    for _ in range(200):
        s = "".join(random.choice(toks) for _ in range(random.randint(0, 25)))
        once = write_html(parse_html(s)[0])
        twice = write_html(parse_html(once)[0])
        assert once == twice
