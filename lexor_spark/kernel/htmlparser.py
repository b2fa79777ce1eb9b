"""HTML parser: text → DOM tree + diagnostic log.

Clean-room reimplementation of the reference parser's *semantics*
(`/root/reference/lexor/core/parser.py` — driver loop `:385-410`, auto-close
recovery `:357-383`, text merge `:337-355`, position bookkeeping `:252-284`,
W100/E100 messages `:413-416`), redesigned for single-pass speed:

* Instead of the reference's per-node-name "next interesting char" regexes
  (`parser.py:137-144,309-319`), one compiled ``[<&]`` scan finds the next
  markup candidate — same effect (skip plain text in C), simpler dispatch.
* Instead of dynamically loaded NodeParser plugin classes
  (`parser.py:123-153`), the HTML construct grammar (tags, comments,
  doctype, CDATA, PIs, entities, rawtext, void) is compiled into this
  module — rule-sets are code shipped with the package, imported once per
  executor.
* The reference's HTML style plugin is **not** in the reference repo (styles
  were separate packages), so the construct-level behavior here (implied end
  tags, void set, rawtext set) is defined by this module and pinned by this
  repo's golden tests; the engine-level recovery semantics (W100 on
  forced close, E100 at EOF, innermost-first close matching) follow
  `parser.py:357-383,408-410` exactly.

Log codes
---------
W100  node force-closed by an ancestor's end tag   (ref `parser.py:415`)
E100  no closing construct found before EOF        (ref `parser.py:414`)
W101  stray end tag matching no open node          (this engine)
W102  malformed markup consumed as text            (this engine)
"""

from __future__ import annotations

import re
from bisect import bisect_left
from typing import Optional

from lexor_spark.kernel.dom import (
    CData, Comment, Document, DocumentType, Element, Entity, Node,
    ProcessingInstruction, RawText, Text, Void,
)

__all__ = ["parse_html", "LogEntry", "MSG", "MSG_EXPLANATION", "explain"]

MSG = {
    "E100": 'closing string for node "{0}" not found',
    "W100": 'auto-closing node "{0}" at {1}:{2}',
    "W101": 'ignoring stray end tag "{0}"',
    "W102": "malformed markup consumed as text",
}

# The reference's queryable explanation surface (`parser.py:417-450`,
# surfaced by `command/lang.py:218-239` as a code→explanation map and by
# `command/test.py:150-239` as embedded micro-tests).  Format contract:
# each entry is prose followed by `Okay:`/`CODE:` lines — an `Okay:`
# input must parse with NO diagnostics, a `CODE:` input must log that
# code.  `tests/test_parser.py` extracts and runs every embedded case.
MSG_EXPLANATION = [
    """
    - The parser did not find the closing construct for the given
      node before the end of the input.

    - Provide the closing tag (or closing sequence for comments,
      CDATA sections and processing instructions).

    Okay: <div></div>
    Okay: <!-- note -->

    E100: <div>
    E100: <!-- note
    E100: <script>var x = 1;
""",
    """
    - The parser was forced to automatically close the node in
      progress when it met an ancestor's end tag.

    - Close the inner node before closing its ancestor.  Implied end
      tags of idiomatic HTML (`<ul><li>x</ul>`, `<p>a<p>b`) are NOT
      warnings — only a non-container mismatch is.

    Okay: <a><p>stuff</p><p>stuff</p></a>
    Okay: <a><p>stuff<p>stuff</p></a>
    Okay: <ul><li>one<li>two</ul>

    W100: <a><p>stuff<p>stuff</a>
    W100: <div><b>bold</div>
""",
    """
    - An end tag matched no open node and was ignored.

    - Remove the stray end tag, or open the element it closes.

    Okay: <p>text</p>

    W101: <p>text</p></i>
    W101: </div>
""",
    """
    - A '<' looked like the start of a tag but no complete tag
      followed; it was consumed as literal text.

    - Escape literal '<' as &lt; in text content.

    Okay: 1 &lt; 2
    Okay: 1 < 2

    W102: <notclosed
""",
]


def explain(code: str) -> Optional[str]:
    """Explanation text for a message code (the reference's
    ``map_explanations`` query, `command/lang.py:218-239`): the first
    MSG_EXPLANATION entry that mentions the code."""
    if code not in MSG:
        return None
    for entry in MSG_EXPLANATION:
        if code in entry:
            return entry
    return None  # pragma: no cover - every MSG code has an entry

MODULE = "lexor_spark.kernel.htmlparser"

# -- HTML construct tables (this engine's rule-set; pinned by goldens) -----
VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
RAWTEXT_ELEMENTS = frozenset("script style textarea title".split())

_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figcaption "
    "figure footer form h1 h2 h3 h4 h5 h6 header hr main nav ol p pre "
    "section table ul".split()
)
# Opening tag T silently closes open element C when T ∈ IMPLIED_END[C]
# (the reference's own docs treat sibling-implied close as Okay:
# `parser.py:445-446` — "<a><p>stuff<p>stuff</p></a>" logs nothing).
IMPLIED_END: dict[str, frozenset] = {
    "p": _P_CLOSERS,
    "li": frozenset(("li",)),
    "dt": frozenset(("dt", "dd")),
    "dd": frozenset(("dt", "dd")),
    "tr": frozenset(("tr",)),
    "td": frozenset(("td", "th", "tr")),
    "th": frozenset(("td", "th", "tr")),
    "thead": frozenset(("tbody", "tfoot")),
    "tbody": frozenset(("tbody", "tfoot")),
    "option": frozenset(("option", "optgroup")),
}

# End tag </container> silently closes these still-open children — the
# idiomatic-HTML case (`<ul><li>x</ul>`), distinct from the reference's
# W100 force-close which this engine keeps for non-container mismatches
# (the reference's own pinned example `parser.py:448`:
# "W100: <a><p>stuff<p>stuff</a>").
SILENT_CONTAINER: dict[str, frozenset] = {
    "ul": frozenset(("li",)),
    "ol": frozenset(("li",)),
    "menu": frozenset(("li",)),
    "dl": frozenset(("dt", "dd")),
    "table": frozenset(("tr", "td", "th", "thead", "tbody", "tfoot",
                        "caption", "colgroup")),
    "thead": frozenset(("tr", "td", "th")),
    "tbody": frozenset(("tr", "td", "th")),
    "tfoot": frozenset(("tr", "td", "th")),
    "tr": frozenset(("td", "th")),
    "select": frozenset(("option", "optgroup")),
    "optgroup": frozenset(("option",)),
    "datalist": frozenset(("option",)),
}

_SPECIAL = re.compile(r"[<&]")
# Fused markup scanner: ONE C-level search both finds the next markup
# candidate and, when it is a well-formed start/end tag, captures the
# whole construct — close flag, name, quote-aware attribute body — so the
# hot loop pays one regex call per tag instead of search + name-match +
# find('>') + quote checks.  The attribute body alternation is
# unambiguous (every char is consumed by exactly one branch), so matching
# and failure are linear, never catastrophic.  A '<' that does not begin
# a complete tag (comment, doctype, PI, unterminated tag, stray text
# '<') falls through to the second branch and takes the slow path.
_MASTER = re.compile(
    r"""<(/?)([a-zA-Z][a-zA-Z0-9:_\-]*)((?:"[^"]*"|'[^']*'|[^>"'])*)>|[<&]"""
)
# Per-spelling tag-info cache: real-web corpora reuse a few dozen tag
# spellings, so one dict hit replaces lowercase allocation + void/rawtext
# set membership + implied-end table lookup per tag.  Value is
# (lowercase name, kind, closers): kind 0 = normal element, 1 = void,
# 2 = rawtext; closers = frozenset of open-element names this tag
# implicitly closes (None for the common no-implied-end case).
# Bounded so hostile inputs (unbounded distinct tag names) can't grow it.
_TAG_INFO: dict[str, tuple] = {}
_TAG_INFO_MAX = 8192


def _tag_info(raw: str) -> tuple:
    name = raw.lower()
    kind = 1 if name in VOID_ELEMENTS else 2 if name in RAWTEXT_ELEMENTS else 0
    closers = frozenset(
        c for c, s in IMPLIED_END.items() if name in s) or None
    info = (name, kind, closers)
    if len(_TAG_INFO) < _TAG_INFO_MAX:
        _TAG_INFO[raw] = info
    return info
# Parsed-attribute cache: boilerplate markup repeats the same attr strings
# (class="nav", class="site-header", …) millions of times across a crawl;
# one dict copy replaces the whole _ATTR.finditer parse on a hit.  Values
# are treated as immutable templates — every tag gets its own dict copy.
_ATTRS_CACHE: dict[str, dict] = {}
_ATTRS_CACHE_MAX = 16384
_NEWLINE = re.compile(r"\n")
# case-insensitive close-tag scanners for rawtext bodies — avoids keeping a
# full lowercased copy of the document just to find "</script" etc.
_RAWTEXT_CLOSE = {}
_DOCTYPE = re.compile(r"<!doctype", re.IGNORECASE)
_TAG_NAME = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9:_\-]*)")
_ATTR = re.compile(
    r"""([^\s=/>"'<]+)(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*)))?"""
)
_ENTITY = re.compile(r"&(?:[a-zA-Z][a-zA-Z0-9]{0,31};|#[0-9]{1,7};|#[xX][0-9a-fA-F]{1,6};)")
_WS_GT = re.compile(r"\s*>")


class LogEntry:
    """One diagnostic message (reference stores these as Void('msg') nodes
    in a log Document, `parser.py:287-303`; a flat record is the columnar
    equivalent)."""

    __slots__ = ("code", "line", "col", "arg")

    def __init__(self, code: str, line: int, col: int, arg: tuple = ()) -> None:
        self.code = code
        self.line = line
        self.col = col
        self.arg = arg

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"LogEntry({self.code}@{self.line}:{self.col}{list(self.arg)})"


class _Parser:
    """Single-document, single-pass parse state."""

    __slots__ = ("text", "end", "caret", "doc", "stack", "log", "_nl")

    def __init__(self, text: str, uri: str) -> None:
        self.text = text
        self.end = len(text)
        self.caret = 0
        self._nl: Optional[list[int]] = None  # lazy newline index
        self.doc = Document("html", uri)
        self.stack: list[Element] = [self.doc]
        self.log: list[LogEntry] = []

    # -- position bookkeeping (reference `parser.py:256-284`) -------------
    # Nodes carry source OFFSETS; (line, col) is derived lazily only when a
    # diagnostic is emitted or an export asks for it — per-event newline
    # arithmetic and a tuple allocation per node were ~10% of parse time.
    # (The reference's ``update`` slot is the plain ``self.caret = x``
    # assignment inlined at every consume site — a method call per consume
    # event was ~8% of parse time.)
    def linecol(self, off: int) -> tuple[int, int]:
        """(1-based line, col) of a source offset; lazy newline index so
        the O(n) scan happens at most once per document, only on the
        diagnostic path."""
        if off < 0:
            return (0, 0)
        nl = self._nl
        if nl is None:
            nl = self._nl = [m.start() for m in _NEWLINE.finditer(self.text)]
        idx = bisect_left(nl, off)
        prev = nl[idx - 1] if idx else -1
        return (idx + 1, off - prev)

    def msg(self, code: str, off: int, arg: tuple = ()) -> None:
        line, col = self.linecol(off)
        self.log.append(LogEntry(code, line, col, arg))

    # -- text accumulation with adjacent-merge (ref `parser.py:337-355`) --
    def emit_text(self, start: int, stop: int) -> None:
        if stop > start:
            self.stack[-1].append_text(self.text[start:stop], start, stop)

    # -- main loop (reference `parser.py:385-410`) -------------------------
    def run(self) -> None:
        text, n = self.text, self.end
        search = _MASTER.search
        ent_match = _ENTITY.match
        tag_match = _TAG_NAME.match
        stack = self.stack
        caret = self.caret
        tag_info = _TAG_INFO
        while caret < n:
            m = search(text, caret)
            if m is None:
                if n > caret:
                    # append_text inlined (merge-with-trailing-Text)
                    kids = stack[-1].children
                    if kids and type(kids[-1]) is Text:
                        last = kids[-1]
                        last.data += text[caret:n]
                        last.end = n
                    else:
                        node = Text(text[caret:n], caret, n)
                        node.parent = stack[-1]
                        kids.append(node)
                caret = n
                break
            i = m.start()
            if i > caret:
                kids = stack[-1].children
                if kids and type(kids[-1]) is Text:
                    last = kids[-1]
                    last.data += text[caret:i]
                    last.end = i
                else:
                    node = Text(text[caret:i], caret, i)
                    node.parent = stack[-1]
                    kids.append(node)
            raw_name = m.group(2)
            if raw_name is not None:
                # complete start/end tag captured in one scan (~95% of
                # markup events); bang/PI constructs take the slow path
                info = tag_info.get(raw_name)
                if info is None:
                    info = _tag_info(raw_name)
                end = m.end()
                if m.group(1):
                    if len(stack) > 1 and stack[-1].name == info[0]:
                        stack.pop()  # balanced close: the common case
                        caret = end
                    else:
                        self._close_tag(i, info[0], end)
                        caret = self.caret
                else:
                    self._open_tag(i, info, m.group(3), end)
                    caret = self.caret
            elif text[i] == "&":
                # entity path inlined (one markup event per '&')
                em = ent_match(text, i)
                if em is None:
                    stack[-1].append_text("&", i, i + 1)
                    caret = i + 1
                else:
                    j = em.end()
                    node = Entity(text[i:j], i, j)
                    node.pos = i
                    top = stack[-1]
                    node.parent = top
                    top.children.append(node)
                    caret = j
            else:
                nxt = text[i + 1: i + 2]
                if nxt == "!" or nxt == "?":
                    self.caret = i
                    self._markup(i)
                    caret = self.caret
                else:
                    # a '<' that opens nothing: tag-shaped but
                    # unterminated → W102 (recovery); otherwise plain text
                    if tag_match(text, i) is not None:
                        self.msg("W102", i)
                    stack[-1].append_text("<", i, i + 1)
                    caret = i + 1
        self.caret = caret
        # EOF sweep: E100 per unclosed node, outermost first
        # (reference `parser.py:408-410`).
        for node in stack[1:]:
            self.msg("E100", node.pos, (node.name,))

    # -- markup dispatch (bang/PI constructs only — complete tags are
    # consumed by the fused _MASTER scan in run) --------------------------
    def _markup(self, i: int) -> None:
        text = self.text
        nxt = text[i + 1: i + 2]
        if nxt == "!":
            if text.startswith("<!--", i):
                return self._comment(i)
            if _DOCTYPE.match(text, i):
                return self._doctype(i)
            if text.startswith("<![CDATA[", i):
                return self._cdata(i)
            return self._bogus_comment(i)
        if nxt == "?":
            return self._pi(i)
        # '<' that opens nothing: plain text (reference fallback,
        # `parser.py:348-349` advances one char).
        self.stack[-1].append_text("<", i, i + 1)
        self.caret = i + 1

    # -- constructs ----------------------------------------------------------
    def _comment(self, i: int) -> None:
        j = self.text.find("-->", i + 4)
        pos = i
        if j == -1:
            node = Comment(self.text[i + 4:])
            node.pos = pos
            self.stack[-1].append_child(node)
            self.msg("E100", pos, ("#comment",))
            self.caret = self.end
            return
        node = Comment(self.text[i + 4: j])
        node.pos = pos
        self.stack[-1].append_child(node)
        self.caret = j + 3

    def _bogus_comment(self, i: int) -> None:
        # "<!" that is not comment/doctype/CDATA: consume to '>' as a
        # comment (HTML-recovery choice of this engine).
        j = self.text.find(">", i + 2)
        pos = i
        if j == -1:
            self.msg("E100", pos, ("#comment",))
            node = Comment(self.text[i + 2:])
            node.pos = pos
            self.stack[-1].append_child(node)
            self.caret = self.end
            return
        node = Comment(self.text[i + 2: j])
        node.pos = pos
        self.stack[-1].append_child(node)
        self.caret = j + 1

    def _doctype(self, i: int) -> None:
        j = self.text.find(">", i + 9)
        pos = i
        if j == -1:
            self.msg("E100", pos, ("#doctype",))
            self.caret = self.end
            return
        node = DocumentType(self.text[i + 9: j].strip())
        node.pos = pos
        self.stack[-1].append_child(node)
        self.caret = j + 1

    def _cdata(self, i: int) -> None:
        j = self.text.find("]]>", i + 9)
        pos = i
        if j == -1:
            self.msg("E100", pos, ("#cdata-section",))
            node = CData(self.text[i + 9:])
            node.pos = pos
            self.stack[-1].append_child(node)
            self.caret = self.end
            return
        node = CData(self.text[i + 9: j])
        node.pos = pos
        self.stack[-1].append_child(node)
        self.caret = j + 3

    def _pi(self, i: int) -> None:
        pos = i
        j = self.text.find("?>", i + 2)
        if j == -1:
            self.msg("E100", pos, ("#pi",))
            self.caret = self.end
            return
        body = self.text[i + 2: j]
        target, _, data = body.partition(" ")
        node = ProcessingInstruction(target or "pi", data)
        node.pos = pos
        self.stack[-1].append_child(node)
        self.caret = j + 2

    def _open_tag(self, i: int, info: tuple, raw: str, end: int) -> None:
        """Open a start tag whose full extent was captured by _MASTER:
        ``info`` is the (name, kind, closers) tuple, ``raw`` the raw
        attribute body (quote-aware, may end with the self-close '/'),
        ``end`` the offset just past '>'."""
        name, kind, closers = info
        attrs: dict[str, str] = {}
        self_close = False
        if raw:  # the bare "<p>" case skips all attr work
            if raw[-1] == "/":
                self_close = True
                raw = raw[:-1]
            if raw:
                cached = _ATTRS_CACHE.get(raw)
                if cached is not None:
                    attrs = dict(cached)
                else:
                    if not raw.isspace():
                        for am in _ATTR.finditer(raw):
                            key = am.group(1).lower()
                            if key not in attrs:  # first occurrence wins
                                g2, g3, g4 = am.group(2, 3, 4)
                                attrs[key] = (g2 if g2 is not None else
                                              g3 if g3 is not None else
                                              g4 if g4 is not None else "")
                    if len(_ATTRS_CACHE) < _ATTRS_CACHE_MAX:
                        _ATTRS_CACHE[raw] = dict(attrs)

        # Implied end tags: silently close (Okay per ref doc example,
        # `parser.py:445-446`).  Popped elements need no normalize: the
        # build path merges adjacent text and never appends empty Text,
        # so parse-time normalize is a provable no-op (the converter
        # re-normalizes every element it rewrites anyway).
        stack = self.stack
        if closers is not None:
            while len(stack) > 1 and stack[-1].name in closers:
                stack.pop()

        top = stack[-1]
        if kind == 0:
            node = Element(name, attrs)
            node.pos = i
            node.parent = top
            top.children.append(node)
            self.caret = end
            if not self_close:  # empty-element protocol: ref `parser.py:328-329`
                stack.append(node)
            return
        if kind == 1:
            node = Void(name, attrs)
            node.pos = i
            node.parent = top
            top.children.append(node)
            self.caret = end
            return
        self.caret = end
        return self._rawtext(name, attrs, i, end)

    def _rawtext(self, name: str, attrs: dict, pos: tuple[int, int],
                 body_start: int) -> None:
        pat = _RAWTEXT_CLOSE.get(name)
        if pat is None:
            pat = _RAWTEXT_CLOSE[name] = re.compile("</" + name, re.IGNORECASE)
        cm = pat.search(self.text, body_start)
        j = cm.start() if cm else -1
        if j == -1:
            node = RawText(name, attrs, self.text[body_start:])
            node.pos = pos
            self.stack[-1].append_child(node)
            self.msg("E100", pos, (name,))
            self.caret = self.end
            return
        node = RawText(name, attrs, self.text[body_start: j])
        node.pos = pos
        self.stack[-1].append_child(node)
        wm = _WS_GT.match(self.text, j + 2 + len(name))
        self.caret = wm.end() if wm else j + 2 + len(name)

    def _close_tag(self, i: int, name: str, end: int) -> None:
        """Unbalanced-close slow path (the balanced case pops inline in
        run).  ``name`` is already lowercased; ``end`` is the offset just
        past '>' (extent captured by _MASTER)."""
        stack = self.stack
        # Innermost-first match (reference `parser.py:357-383`): find the
        # nearest open node with this name; force-close anything deeper
        # with W100; stray end tags are ignored with W101.
        depth = -1
        for k in range(len(stack) - 1, 0, -1):
            if stack[k].name == name:
                depth = k
                break
        if depth == -1:
            self.msg("W101", i, (name,))
            self.caret = end
            return
        silent = SILENT_CONTAINER.get(name, ())
        for k in range(len(stack) - 1, depth, -1):
            forced = stack[k]
            if forced.name not in silent:
                cl, cc = self.linecol(i)
                self.msg("W100", forced.pos, (forced.name, cl, cc))
            stack.pop()
        stack.pop()
        self.caret = end


def parse_html(text: str, uri: str = "",
               pre_process=None,
               post_process=None) -> tuple[Document, list[LogEntry]]:
    """Parse an HTML string into (Document, log).

    The document root's children are exactly the top-level constructs found
    (no synthetic <html>/<body> insertion — the reference inserts nothing
    either; `parser.py:165` just creates an empty Document).

    ``pre_process`` / ``post_process`` are the P8 hook slots (reference
    `parser.py:174-178`: style modules may define both; called with the
    parser state around the main loop).  The hot extraction path passes
    neither — the ``None`` checks are the only cost.  ``pre_process(p)``
    runs after state init, before the loop (e.g. to pre-mark byte
    ranges); ``post_process(p)`` runs after the loop and before
    ``normalize`` so it can still see raw adjacent Text runs and may
    mutate ``p.doc`` / append to ``p.log``."""
    p = _Parser(text, uri)
    if pre_process is not None:
        pre_process(p)
    p.run()
    if post_process is not None:
        post_process(p)
    p.doc.normalize()
    return p.doc, p.log
