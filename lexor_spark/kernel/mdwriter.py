"""DOM → Markdown writer (the reference's flagship conversion target:
``lexor file.html to markdown``, `/root/reference/lexor/command/to.py`).

The reference ships the markdown *style* as a separate plugin package
(not in the repo — SURVEY.md §2 L1), so the construct mapping here is
this engine's rule-set, pinned by golden tests; the engine-level contract
(writer start/data/child/end protocol, `writer.py:54-99`; block/inline
modal emission, `writer.py:233-346`) follows the reference.

Mapping (CommonMark-flavored):
  h1..h6 → ``#``·n;  p/div/... → paragraphs;  b/strong → ``**``;
  i/em → ``*``;  code → backticks (contents verbatim, no escaping);
  pre → fenced block;  a → ``[text](href)``;  img → ``![alt](src)``;
  ul/li → ``- `` (tight: items joined by one newline);  ol/li →
  ``1.``-style;  nested lists indent under their parent item's marker;
  blockquote → ``> `` line prefix (compositional: applied to every block
  produced inside the quote, so quotes nest and mix with lists/tables);
  table/tr/td/th → GitHub pipe tables with a ``---`` separator under the
  header row;  hr → ``---``;  br → hard break (two-space newline).
  script/style/comments/PIs are dropped.

Engine shape: an iterative event walk (hostile nesting depth — no
recursion) over a FRAME STACK.  A frame is an isolated (blocks, inline)
accumulation scope; ``li``/``a``/``td``/``tr`` push frames so that
nested block elements inside them compose into the item instead of
splitting the surrounding buffer (the round-1 defect), and markers /
link syntax are applied to the *assembled* content on frame close.

Runs on the PARSED tree (full fidelity), not the extraction-converted
tree — inline markup that extraction unwraps must survive conversion."""

from __future__ import annotations

import html as _html
import re

from lexor_spark.kernel.dom import (
    Element, Entity, Node, RawText, Text, Void,
)

__all__ = ["write_markdown"]

_WS = re.compile(r"\s+")
_MD_ESCAPE = re.compile(r"([\\`*_\[\]])")
_LIST_ITEM = re.compile(r"^(?:[-*+] |\d+[.)] )")

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_PARA_TAGS = frozenset(
    "p div section article main header footer aside figure figcaption "
    "address fieldset dl".split())
_BOLD = frozenset(("b", "strong"))
_ITAL = frozenset(("i", "em"))
_SKIP = frozenset(("script", "style", "head", "title", "template",
                   "noscript"))


class _Frame:
    """One accumulation scope: completed blocks + the open inline run."""

    __slots__ = ("blocks", "inline", "kind", "data")

    def __init__(self, kind: str = "", data=None) -> None:
        self.blocks: list[str] = []
        self.inline: list[str] = []
        self.kind = kind
        self.data = data  # frame-kind payload (marker, href, cells, ...)


class _MD:
    """Markdown emission state: a stack of frames."""

    __slots__ = ("frames", "code_depth", "list_stack")

    def __init__(self) -> None:
        self.frames: list[_Frame] = [_Frame("root")]
        self.code_depth = 0  # >0 → text is verbatim (code spans)
        self.list_stack: list[tuple[str, int]] = []  # (kind, item counter)

    # -- inline ----------------------------------------------------------
    def text(self, s: str, verbatim: bool = False) -> None:
        inline = self.frames[-1].inline
        if verbatim or self.code_depth:
            # code-span content is literal: `a*b` must not become `a\*b`
            inline.append(s)
            return
        collapsed = _WS.sub(" ", s)
        if collapsed == " " and (not inline
                                 or inline[-1].endswith((" ", "\n"))
                                 or not inline[-1]):
            return
        inline.append(_MD_ESCAPE.sub(r"\\\1", collapsed))

    def wrap(self, marker: str) -> None:
        self.frames[-1].inline.append(marker)

    # -- blocks ----------------------------------------------------------
    def flush_block(self, prefix: str = "") -> None:
        top = self.frames[-1]
        body = "".join(top.inline).strip()
        top.inline = []
        if not body:
            return
        top.blocks.append(prefix + body)

    def fenced(self, code: str) -> None:
        self.flush_block()
        code = code.strip("\n")
        self.frames[-1].blocks.append("```\n" + code + "\n```")

    # -- frames ----------------------------------------------------------
    def push(self, kind: str, data=None, flush: bool = True) -> None:
        # inline frames (links) must not flush the parent's open inline
        # run — the link belongs to the sentence it appears in
        if flush:
            self.flush_block()
        self.frames.append(_Frame(kind, data))

    def pop(self) -> _Frame:
        self.flush_block()
        return self.frames.pop()

    def result(self, width: int = None) -> str:
        # close any frames left open by malformed input, outermost wins
        while len(self.frames) > 1:
            fr = self.pop()
            self.frames[-1].blocks.extend(fr.blocks)
        self.flush_block()
        blocks = self.frames[0].blocks
        if width is not None:
            blocks = [_wrap_block(b, width) for b in blocks]
        return "\n\n".join(blocks)


def _indent_continuation(blocks: list[str], marker: str) -> str:
    """Assemble a list item: the marker heads the first block; every other
    line (continuation paragraphs, nested list lines) is indented to the
    marker's width so it belongs to the item."""
    pad = " " * len(marker)
    parts: list[str] = []
    for bi, block in enumerate(blocks):
        lines = block.split("\n")
        if bi == 0:
            parts.append(marker + lines[0])
        else:
            # blank line before a continuation paragraph, none before a
            # directly nested list (tight nesting)
            if not _LIST_ITEM.match(lines[0]):
                parts.append("")
            parts.append(pad + lines[0])
        parts.extend(pad + ln for ln in lines[1:])
    return "\n".join(parts)


def _attr(node: Element, key: str) -> str:
    v = node.attrs.get(key)
    return v if v is not None else ""


def _cell_text(fr: _Frame) -> str:
    parts = [b for b in fr.blocks if b]
    body = " ".join(parts).strip()
    return body.replace("\n", " ").replace("|", "\\|")


_STRUCTURAL = re.compile(r"^(?:#{1,6} |[-*+] |\d+[.)] |> |\||```|---$)")


def _wrap_block(block: str, width: int) -> str:
    """Wrap one plain paragraph via the W5 engine; structural blocks
    (headings, lists, quotes, tables, fences, rules) pass through —
    their line structure is syntax."""
    if "\n" in block or _STRUCTURAL.match(block):
        return block
    from lexor_spark.kernel.wrapwriter import WrapWriter
    ww = WrapWriter(width=width)
    ww.enable_wrap()
    ww.write(block)
    return ww.getvalue()


def write_markdown(root: Node, width: int = None,
                   rules: dict = None) -> str:
    """Convert a parsed DOM (sub)tree to Markdown text.

    ``width`` switches on W5 paragraph wrapping (reference
    `writer.py:233-346`); block constructs whose newlines are syntax
    are never re-wrapped.

    ``rules`` is the W2 NodeWriter registry (``writerrules.WriterRule``
    keyed by node name): a matching rule replaces the built-in handling
    for that tag, writing through the ``_MD`` accumulator (``text`` /
    ``wrap`` / ``flush_block`` / ``fenced``); ``#text``/``#entity``
    rules may claim character nodes via ``data``."""
    md = _MD()
    has_rules = bool(rules)
    text_rule = rules.get("#text") if has_rules else None
    entity_rule = rules.get("#entity") if has_rules else None
    # events: (node, phase) — 0 = open, 1 = close, 2 = rule close
    stack: list[tuple[Node, int]] = [(root, 0)]
    while stack:
        node, phase = stack.pop()
        cls = type(node)
        if phase == 2:
            rules[node.name].end(md, node)
            continue
        if phase == 1:
            name = node.name
            if name in _HEADINGS:
                md.flush_block("#" * _HEADINGS[name] + " ")
            elif name in _PARA_TAGS:
                md.flush_block()
            elif name in _BOLD:
                md.wrap("**")
            elif name in _ITAL:
                md.wrap("*")
            elif name == "code":
                md.code_depth -= 1
                md.wrap("`")
            elif name == "a":
                fr = md.pop()
                if fr.kind == "a":  # guard against stray close
                    href = _attr(node, "href")
                    body = " ".join(b for b in fr.blocks if b).strip()
                    md.wrap("[" + body + (f"]({href})" if href else "]"))
            elif name == "li":
                fr = md.pop()
                if md.list_stack:
                    kind, counter = md.list_stack[-1]
                    marker = f"{counter}. " if kind == "ol" else "- "
                else:
                    marker = "- "
                if fr.blocks:
                    md.frames[-1].blocks.append(
                        _indent_continuation(fr.blocks, marker))
            elif name in ("ul", "ol"):
                fr = md.pop()
                if md.list_stack:
                    md.list_stack.pop()
                if fr.blocks:
                    # tight list: one block, items separated by single
                    # newlines (each item already carries its marker)
                    md.frames[-1].blocks.append("\n".join(fr.blocks))
            elif name == "blockquote":
                fr = md.pop()
                if fr.kind == "quote" and fr.blocks:
                    quoted = [
                        "\n".join("> " + ln for ln in b.split("\n"))
                        for b in fr.blocks]
                    # one quote: inner paragraphs separated by a bare '>'
                    md.frames[-1].blocks.append("\n>\n".join(quoted))
            elif name in ("td", "th"):
                fr = md.pop()
                if fr.kind == "cell" and md.frames[-1].kind == "row":
                    md.frames[-1].data.append(
                        (_cell_text(fr), name == "th"))
                elif fr.kind == "cell":
                    # malformed markup (cell outside a row): never drop
                    # content — degrade to a plain block
                    body = _cell_text(fr)
                    if body:
                        md.frames[-1].blocks.append(body)
            elif name == "tr":
                fr = md.pop()
                if fr.kind == "row" and md.frames[-1].kind == "table":
                    cells = fr.data
                    if cells:
                        tbl = md.frames[-1].data
                        tbl["rows"].append(
                            "| " + " | ".join(c for c, _ in cells) + " |")
                        if not tbl["sep_done"]:
                            tbl["sep_done"] = True
                            tbl["rows"].append(
                                "|" + "|".join(" --- " for _ in cells) + "|")
                elif fr.kind == "row":
                    # row outside a table: emit its cells as one line
                    body = " ".join(c for c, _ in fr.data if c)
                    if body:
                        md.frames[-1].blocks.append(body)
            elif name == "table":
                fr = md.pop()
                if fr.kind == "table":
                    md.frames[-1].blocks.extend(b for b in fr.blocks if b)
                    if fr.data["rows"]:
                        md.frames[-1].blocks.append(
                            "\n".join(fr.data["rows"]))
            continue

        if cls is Text:
            if text_rule is not None and text_rule.data(md, node):
                continue
            md.text(node.data)
            continue
        if cls is Entity:
            if entity_rule is not None and entity_rule.data(md, node):
                continue
            md.text(_html.unescape(node.data))
            continue
        if cls is Void:
            name = node.name
            if has_rules and name in rules:
                r = rules[name]
                r.start(md, node)
                r.end(md, node)
                continue
            if name == "br":
                md.wrap("  \n")
            elif name == "hr":
                md.flush_block()
                md.frames[-1].blocks.append("---")
            elif name == "img":
                alt = _WS.sub(" ", _attr(node, "alt"))
                md.wrap(f"![{alt}]({_attr(node, 'src')})")
            continue
        if cls is RawText:
            continue  # script/style/title bodies
        if not isinstance(node, Element):
            continue  # comments, doctype, PIs, CDATA
        name = node.name
        if has_rules and name in rules:
            r = rules[name]
            r.start(md, node)
            stack.append((node, 2))
            if r.child(node):
                for child in reversed(node.children):
                    stack.append((child, 0))
            continue
        if name in _SKIP:
            continue
        if name == "pre":
            # whole subtree verbatim as a fenced block
            parts: list[str] = []
            for n in node.iter():
                if type(n) is Text:
                    parts.append(n.data)
                elif type(n) is Entity:
                    parts.append(_html.unescape(n.data))
            md.fenced("".join(parts))
            continue
        # open-phase effects
        if name in _HEADINGS or name in _PARA_TAGS:
            md.flush_block()
        elif name in _BOLD:
            md.wrap("**")
        elif name in _ITAL:
            md.wrap("*")
        elif name == "code":
            md.wrap("`")
            md.code_depth += 1
        elif name == "a":
            md.push("a", flush=False)
        elif name in ("ul", "ol"):
            md.push("list")
            md.list_stack.append((name, 0))
        elif name == "li":
            if md.list_stack:
                kind, counter = md.list_stack[-1]
                md.list_stack[-1] = (kind, counter + 1)
            md.push("li")
        elif name == "blockquote":
            md.push("quote")
        elif name == "table":
            md.push("table", {"rows": [], "sep_done": False})
        elif name == "tr":
            md.push("row", [])
        elif name in ("td", "th"):
            md.push("cell")
        elif name == "caption":
            md.flush_block()
        stack.append((node, 1))
        for child in reversed(node.children):
            stack.append((child, 0))
    return md.result(width)
