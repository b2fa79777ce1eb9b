"""DOM → Markdown writer (the reference's flagship conversion target:
``lexor file.html to markdown``, `/root/reference/lexor/command/to.py`).

The reference ships the markdown *style* as a separate plugin package
(not in the repo — SURVEY.md §2 L1), so the construct mapping here is
this engine's rule-set, pinned by golden tests; the engine-level contract
(writer start/data/child/end protocol, `writer.py:54-99`; block/inline
modal emission, `writer.py:233-346`) follows the reference.

Mapping (CommonMark-flavored):
  h1..h6 → ``#``·n;  p/div/... → paragraphs;  b/strong → ``**``;
  i/em → ``*``;  code → backticks;  pre → fenced block;  a →
  ``[text](href)``;  img → ``![alt](src)``;  ul/li → ``- ``; ol/li →
  ``1.``-style; blockquote → ``> `` prefix; hr → ``---``; br → hard
  break (two-space newline).  script/style/comments/PIs are dropped.

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

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_PARA_TAGS = frozenset(
    "p div section article main header footer aside figure figcaption "
    "address fieldset table caption dl".split())
_BOLD = frozenset(("b", "strong"))
_ITAL = frozenset(("i", "em"))
_SKIP = frozenset(("script", "style", "head", "title", "template",
                   "noscript"))


class _MD:
    """Markdown emission state (block assembly + inline accumulation)."""

    __slots__ = ("blocks", "inline", "quote_depth", "list_stack")

    def __init__(self) -> None:
        self.blocks: list[str] = []
        self.inline: list[str] = []
        self.quote_depth = 0
        self.list_stack: list[tuple[str, int]] = []  # (kind, counter)

    # -- inline ----------------------------------------------------------
    def text(self, s: str, verbatim: bool = False) -> None:
        if verbatim:
            self.inline.append(s)
            return
        collapsed = _WS.sub(" ", s)
        if collapsed == " " and (not self.inline
                                 or self.inline[-1].endswith((" ", "\n"))
                                 or not self.inline[-1]):
            return
        self.inline.append(_MD_ESCAPE.sub(r"\\\1", collapsed))

    def wrap(self, marker: str) -> None:
        self.inline.append(marker)

    # -- blocks ----------------------------------------------------------
    def _prefix(self) -> str:
        return "> " * self.quote_depth

    def flush_block(self, prefix: str = "") -> None:
        body = "".join(self.inline).strip()
        self.inline = []
        if not body:
            return
        self.blocks.append(self._prefix() + prefix + body)

    def fenced(self, code: str) -> None:
        self.flush_block()
        code = code.strip("\n")
        q = self._prefix()
        lines = [q + "```"] + [q + ln for ln in code.split("\n")] + [q + "```"]
        self.blocks.append("\n".join(lines))

    def result(self) -> str:
        self.flush_block()
        return "\n\n".join(self.blocks)


def _attr(node: Element, key: str) -> str:
    v = node.attrs.get(key)
    return v if v is not None else ""


def write_markdown(root: Node) -> str:
    """Convert a parsed DOM (sub)tree to Markdown text."""
    md = _MD()
    # events: (node, phase) — 0 = open, 1 = close
    stack: list[tuple[Node, int]] = [(root, 0)]
    while stack:
        node, phase = stack.pop()
        cls = type(node)
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
                md.wrap("`")
            elif name == "a":
                href = _attr(node, "href")
                md.wrap(f"]({href})" if href else "]")
            elif name == "li":
                kind, counter = md.list_stack[-1] if md.list_stack else ("ul", 0)
                indent = "  " * (len(md.list_stack) - 1) if md.list_stack else ""
                if kind == "ol":
                    md.flush_block(f"{indent}{counter}. ")
                else:
                    md.flush_block(f"{indent}- ")
            elif name in ("ul", "ol"):
                if md.list_stack:
                    md.list_stack.pop()
            elif name == "blockquote":
                md.flush_block()
                md.quote_depth -= 1
            elif name in ("td", "th"):
                md.wrap(" ")
            elif name == "tr":
                md.flush_block()
            continue

        if cls is Text:
            md.text(node.data)
            continue
        if cls is Entity:
            md.text(_html.unescape(node.data))
            continue
        if cls is Void:
            name = node.name
            if name == "br":
                md.wrap("  \n")
            elif name == "hr":
                md.flush_block()
                md.blocks.append(md._prefix() + "---")
            elif name == "img":
                alt = _WS.sub(" ", _attr(node, "alt"))
                md.wrap(f"![{alt}]({_attr(node, 'src')})")
            continue
        if cls is RawText:
            continue  # script/style/title bodies
        if not isinstance(node, Element):
            continue  # comments, doctype, PIs, CDATA
        name = node.name
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
        if name in _HEADINGS or name in _PARA_TAGS or name == "tr":
            md.flush_block()
        elif name in _BOLD:
            md.wrap("**")
        elif name in _ITAL:
            md.wrap("*")
        elif name == "code":
            md.wrap("`")
        elif name == "a":
            md.wrap("[")
        elif name in ("ul", "ol"):
            md.flush_block()
            md.list_stack.append((name, 0))
        elif name == "li" and md.list_stack:
            kind, counter = md.list_stack[-1]
            md.list_stack[-1] = (kind, counter + 1)
            md.flush_block()
        elif name == "blockquote":
            md.flush_block()
            md.quote_depth += 1
        stack.append((node, 1))
        for child in reversed(node.children):
            stack.append((child, 0))
    return md.result()
