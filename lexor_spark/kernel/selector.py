"""CSS selector engine over the kernel DOM (reference S1-S4 surface).

Reference analogue: `lexor/core/selector.py` — a Sizzle-inspired
tokenizer (`selector.py:253-303`), quick-expression fast paths for
``#id`` / ``TAG`` / ``.class`` (`selector.py:173-199`), and a
jQuery-like ``Selector`` object whose ``append/prepend/before/after``
edit the DOM through the node-mutation algebra
(`selector.py:306-624`).

Fidelity notes:

* The reference's selector *compiler* is an empty stub
  (`selector.py:224-228`: ``matcher_from_tokens`` is ``pass``), so
  only its quick-expression paths ever match.  This engine keeps those
  fast paths byte-compatible and additionally implements a real
  matcher for the full grammar the reference tokenizer recognises:
  compound selectors of ``TAG`` / ``#id`` / ``.class`` /
  ``[attr op value]``, the four combinators ``>`` ``+`` ``~``
  *descendant*, and comma-separated groups.
* Pseudo-classes are tokenized by the reference
  (`selector.py:44-47,63-67`) but, with the compiler stubbed, never
  matched.  This engine implements the structural subset for real —
  ``:first/last/only-child``, ``:first/last/only-of-type``,
  ``:nth-child`` / ``:nth-of-type`` / ``:nth-last-child`` /
  ``:nth-last-of-type`` (``an+b | odd | even | k``) with CSS semantics
  (positions count Element siblings, 1-based; ``-of-type`` restricts
  to same-tag siblings; ``nth-last-*`` counts from the end), plus
  ``:not(<compound>)`` (CSS3 negation: one compound, no nesting) —
  and rejects the rest with a clear error instead of silently
  dropping them.
* Everything is iterative over short chains — matching walks parent /
  preceding-sibling links only, so hostile 5000-deep documents cannot
  overflow the stack (chain length = compounds in the selector, not
  document depth).
"""

from __future__ import annotations

import re
from typing import Callable, Iterator, Optional, Union

from lexor_spark.kernel.dom import Document, Element, Node, Text

__all__ = ["tokenize", "query", "matches", "Selector", "SelectorError"]

# Grammar the reference tokenizer recognises (selector.py:37-76),
# re-expressed: identifiers allow word chars, dashes, escapes and
# non-ASCII; attribute operators are the CSS set plus jQuery's ``!=``.
_WS = r"[\x20\t\r\n\f]"
_IDENT = r"(?:\\.|[\w-]|[^\x00-\xa0])+"
_RE_COMMA = re.compile(rf"^{_WS}*,{_WS}*")
_RE_COMBINATOR = re.compile(rf"^{_WS}*([>+~]|{_WS}){_WS}*")
_RE_ID = re.compile(rf"^#({_IDENT})")
_RE_CLASS = re.compile(rf"^\.({_IDENT})")
_RE_TAG = re.compile(rf"^({_IDENT}|\*)")
_RE_ATTR = re.compile(
    rf"^\[{_WS}*({_IDENT}){_WS}*"
    rf"(?:([*^$|!~]?=){_WS}*"
    rf"(?:(['\"])((?:\\.|[^\\])*?)\3|({_IDENT})))?{_WS}*\]"
)
_RE_PSEUDO = re.compile(rf"^:({_IDENT})(\([^)]*\))?")
# reference quick-expression (selector.py:77): a bare #id, tag or .class
_RE_QUICK = re.compile(r"^(?:#([\w-]+)|(\w+)|\.([\w-]+))$")
_RE_UNESCAPE = re.compile(r"\\(.)")


def _unescape(s: str) -> str:
    """Resolve ``\\x`` escapes the identifier grammar admits (the
    reference tokenizes them but its ``funescape`` is commented out,
    `selector.py:85-89` — tokens that can never match; here ``.a\\.b``
    matches class ``a.b`` as CSS intends)."""
    return _RE_UNESCAPE.sub(r"\1", s) if "\\" in s else s


class SelectorError(ValueError):
    """Raised for selectors outside the supported grammar."""


class Compound:
    """One compound selector: ``tag#id.class[attr=v]:pseudo``, no
    spaces."""

    __slots__ = ("tag", "ids", "classes", "attrs", "pseudos", "nots")

    def __init__(self) -> None:
        self.tag: Optional[str] = None
        self.ids: list[str] = []
        self.classes: list[str] = []
        self.attrs: list[tuple[str, Optional[str], Optional[str]]] = []
        # (name, None) for first/last/only-*, (name, (a, b)) for nth-*
        self.pseudos: list[tuple[str, Optional[tuple[int, int]]]] = []
        # :not(<compound>) — CSS3: single compound, no nesting
        self.nots: list["Compound"] = []

    def matches(self, node: Node) -> bool:
        if not isinstance(node, Element):
            return False
        if self.tag is not None and self.tag != "*" and node.name != self.tag:
            return False
        attrs = node.attrs
        for idval in self.ids:
            if attrs.get("id") != idval:
                return False
        if self.classes:
            have = attrs.get("class")
            if not have:
                return False
            words = have.split()
            for cls in self.classes:
                if cls not in words:
                    return False
        for name, op, value in self.attrs:
            if not _attr_test(attrs.get(name), name in attrs, op, value):
                return False
        for name, ab in self.pseudos:
            if not _pseudo_test(node, name, ab):
                return False
        for sub in self.nots:
            if sub.matches(node):
                return False
        return True

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        parts = [self.tag or ""]
        parts += [f"#{i}" for i in self.ids]
        parts += [f".{c}" for c in self.classes]
        parts += [f"[{n}{o or ''}{v or ''}]" for n, o, v in self.attrs]
        parts += [f":{n}" + (f"({a}n+{b})" if ab else "")
                  for n, ab in self.pseudos
                  for a, b in ([ab] if ab else [(0, 0)])]
        return "".join(parts) or "*"


def _pseudo_test(node: Element, name: str,
                 ab: Optional[tuple[int, int]]) -> bool:
    """CHILD/TYPE pseudo-class semantics: positions count Element
    siblings only (as CSS nth-child ignores text/comment nodes) —
    ``*-of-type`` further restricts to siblings with the candidate's
    tag name — 1-based, ``nth-last-*`` counted from the end.  One
    linear pass over the parent's child list per candidate — pseudos
    run last in `Compound.matches`, so only nodes surviving the cheap
    tests pay it."""
    p = node.parent
    kids = p.children if p is not None else (node,)
    of_type = name.endswith("-of-type")
    tag = node.name

    def counts(k: Node) -> bool:
        return isinstance(k, Element) and (not of_type or k.name == tag)

    if name in ("first-child", "first-of-type"):
        for k in kids:
            if counts(k):
                return k is node
        return False  # pragma: no cover - node is among kids
    if name in ("last-child", "last-of-type"):
        for k in reversed(kids):
            if counts(k):
                return k is node
        return False  # pragma: no cover
    if name in ("only-child", "only-of-type"):
        first = None
        for k in kids:
            if counts(k):
                if first is not None:
                    return False
                first = k
        return first is node
    # nth-*(an+b): exists n >= 0 with position == a*n + b
    idx = 0
    it = reversed(kids) if name.startswith("nth-last-") else kids
    for k in it:
        if counts(k):
            idx += 1
            if k is node:
                break
    a, b = ab
    if a == 0:
        return idx == b
    q, r = divmod(idx - b, a)
    return r == 0 and q >= 0


_RE_NTH = re.compile(
    r"^\s*(?:(odd|even)|([+-]?\d*)n\s*(?:([+-])\s*(\d+))?|([+-]?\d+))\s*$",
    re.I)


def _parse_nth(arg: str) -> tuple[int, int]:
    """``an+b`` micro-grammar → (a, b): ``odd``/``even``/``3``/``2n``/
    ``2n+1``/``-n+3``/``n``."""
    m = _RE_NTH.match(arg)
    if m is None:
        raise SelectorError(f"bad :nth-child argument {arg!r}")
    odd_even, a_txt, sign, b_txt, plain = m.groups()
    if odd_even is not None:
        return (2, 1) if odd_even.lower() == "odd" else (2, 0)
    if plain is not None:
        return (0, int(plain))
    a = {"": 1, "+": 1, "-": -1}.get(a_txt, None)
    if a is None:
        a = int(a_txt)
    b = int(sign + b_txt) if sign else 0
    return (a, b)


def _parse_not(inner: str) -> Compound:
    """``:not(<compound>)`` argument: one compound selector, no
    combinators/commas, no nesting (CSS3 negation grammar; arguments
    containing parentheses — :nth-* inside :not — are outside the
    tokenizer's paren-free pseudo regex and rejected upstream)."""
    groups = tokenize(inner)
    if len(groups) != 1 or len(groups[0]) != 1:
        raise SelectorError(
            f":not() takes a single compound selector "
            f"(no combinators or commas): {inner!r}")
    sub = groups[0][0]
    if sub.nots:
        raise SelectorError(":not() cannot nest")
    return sub


def _attr_test(got: Optional[str], present: bool,
               op: Optional[str], want: Optional[str]) -> bool:
    """CSS attribute-operator semantics (grammar of reference
    `selector.py:40-43`; ``~=`` padding mirrors `_pre_filter_attr`,
    `selector.py:83-92`)."""
    if op is None:
        return present
    if got is None:
        # jQuery's != matches elements lacking the attribute entirely
        return op == "!="
    assert want is not None
    if op == "=":
        return got == want
    if op == "!=":
        return got != want
    if op == "^=":
        return want != "" and got.startswith(want)
    if op == "$=":
        return want != "" and got.endswith(want)
    if op == "*=":
        return want != "" and want in got
    if op == "~=":
        return want in got.split()
    if op == "|=":
        return got == want or got.startswith(want + "-")
    raise SelectorError(f"unknown attribute operator {op!r}")


_token_cache: dict[str, list[list[Union[str, Compound]]]] = {}


def tokenize(selector: str) -> list[list[Union[str, Compound]]]:
    """Parse ``selector`` into comma groups of alternating
    ``Compound`` / combinator tokens (reference `selector.py:253-303`,
    which caches identically).

    ``"div.a > p, #x"`` → ``[[div.a, '>', p], [#x]]``.
    """
    cached = _token_cache.get(selector)
    if cached is not None:
        return cached
    so_far = selector.strip()
    if not so_far:
        raise SelectorError("empty selector")
    groups: list[list[Union[str, Compound]]] = []
    tokens: list[Union[str, Compound]] = []
    expect_compound = True
    while so_far:
        if not expect_compound:
            m = _RE_COMMA.match(so_far)
            if m:
                groups.append(tokens)
                tokens = []
                so_far = so_far[m.end():]
                expect_compound = True
                continue
            m = _RE_COMBINATOR.match(so_far)
            if m:
                if m.end() == len(so_far):
                    raise SelectorError(
                        f"selector ends with a combinator: {selector!r}")
                tokens.append(m.group(1).strip() or " ")
                so_far = so_far[m.end():]
                expect_compound = True
                continue
        compound = Compound()
        matched_any = False
        m = _RE_TAG.match(so_far)
        if m:
            compound.tag = _unescape(m.group(1))
            so_far = so_far[m.end():]
            matched_any = True
        while so_far:
            m = _RE_ID.match(so_far)
            if m:
                compound.ids.append(_unescape(m.group(1)))
                so_far = so_far[m.end():]
                matched_any = True
                continue
            m = _RE_CLASS.match(so_far)
            if m:
                compound.classes.append(_unescape(m.group(1)))
                so_far = so_far[m.end():]
                matched_any = True
                continue
            m = _RE_ATTR.match(so_far)
            if m:
                name, op, _q, quoted, bare = m.groups()
                value = quoted if quoted is not None else bare
                compound.attrs.append((
                    _unescape(name), op,
                    _unescape(value) if value is not None else None))
                so_far = so_far[m.end():]
                matched_any = True
                continue
            m = _RE_PSEUDO.match(so_far)
            if m:
                pname = m.group(1).lower()
                parg = m.group(2)
                if pname in ("first-child", "last-child", "only-child",
                             "first-of-type", "last-of-type",
                             "only-of-type") and parg is None:
                    compound.pseudos.append((pname, None))
                elif pname in ("nth-child", "nth-of-type",
                               "nth-last-child", "nth-last-of-type"
                               ) and parg is not None:
                    compound.pseudos.append(
                        (pname, _parse_nth(parg[1:-1])))
                elif pname == "not" and parg is not None:
                    compound.nots.append(_parse_not(parg[1:-1]))
                else:
                    raise SelectorError(
                        f"pseudo-class :{pname} is not supported (the "
                        "structural subset is implemented: first/last/"
                        "only-child, first/last/only-of-type, "
                        "nth-child, nth-of-type, nth-last-child, "
                        "nth-last-of-type with an+b, and :not(compound)"
                        "; the reference tokenizes but never matches "
                        "pseudos — its compiler is a stub, "
                        "selector.py:224-228)")
                so_far = so_far[m.end():]
                matched_any = True
                continue
            break
        if not matched_any:
            raise SelectorError(
                f"could not parse selector at: {so_far!r} (in {selector!r})")
        tokens.append(compound)
        expect_compound = False
    if expect_compound:
        raise SelectorError(f"dangling combinator in {selector!r}")
    groups.append(tokens)
    _token_cache[selector] = groups
    return groups


def _prev_elements(cur: Element) -> Iterator[Element]:
    """Element siblings strictly before ``cur``, nearest first — one
    linear pass over the parent's child list (repeated
    ``prev_element`` calls would rescan the list per step, O(n²) on
    sibling-heavy pages)."""
    p = cur.parent
    if p is None:
        return
    before: list[Element] = []
    for child in p.children:
        if child is cur:
            break
        if isinstance(child, Element):
            before.append(child)
    yield from reversed(before)


def _chain_matches(node: Element, tokens: list[Union[str, Compound]]) -> bool:
    """True when ``node`` matches the rightmost compound of ``tokens``
    with all left-context (combinator) constraints satisfied.

    Right-to-left with backtracking for the non-``first`` combinators
    (descendant, ``~``) — the same relative-direction semantics the
    reference encodes in ``EXPR['relative']`` (`selector.py:143-148`).
    Iterative worklist, no recursion; a visited-state memo bounds the
    work at O(chain_length × candidates) even when sibling runs offer
    exponentially many backtracking paths (e.g. ``.a ~ .a ~ .a`` over
    thousands of identical siblings)."""
    last = tokens[-1]
    assert isinstance(last, Compound)
    if not last.matches(node):
        return False
    # worklist of (token_index_of_next_compound_to_match, candidate node)
    stack: list[tuple[int, Element]] = [(len(tokens) - 3, node)]
    seen: set[tuple[int, int]] = set()
    while stack:
        idx, cur = stack.pop()
        if idx < 0:
            return True
        key = (idx, id(cur))
        if key in seen:
            continue
        seen.add(key)
        comb = tokens[idx + 1]
        compound = tokens[idx]
        assert isinstance(comb, str) and isinstance(compound, Compound)
        if comb == ">":
            parent = cur.parent
            if isinstance(parent, Element) and compound.matches(parent):
                stack.append((idx - 2, parent))
        elif comb == " ":
            anc = cur.parent
            while anc is not None:
                if isinstance(anc, Element) and compound.matches(anc):
                    stack.append((idx - 2, anc))
                anc = anc.parent
        elif comb == "+":
            for prev in _prev_elements(cur):
                if compound.matches(prev):
                    stack.append((idx - 2, prev))
                break  # adjacent only: nearest preceding element
        elif comb == "~":
            for prev in _prev_elements(cur):
                if compound.matches(prev):
                    stack.append((idx - 2, prev))
        else:  # pragma: no cover - tokenize only emits the four above
            raise SelectorError(f"unknown combinator {comb!r}")
    return False


def matches(node: Node, selector: str) -> bool:
    """True when ``node`` matches any comma group of ``selector``."""
    if not isinstance(node, Element):
        return False
    return any(_chain_matches(node, g) for g in tokenize(selector))


def _group_match_ids(context: Element,
                     tokens: list[Union[str, Compound]]) -> set[int]:
    """``id()`` set of elements matching one comma group, by level-wise
    set propagation: one DFS pass per chain step, O(chain_length ×
    nodes) total — no backtracking, so sibling-heavy pages (long
    ``<li>``/``<tr>`` runs) stay linear where a per-node backtracking
    matcher degrades to O(n²)+ (css_select runs arbitrary probes
    corpus-wide; worst-case time per page is a task-stall risk, not
    just a latency one).

    Left-hand compounds (ancestors / preceding siblings) are seeded and
    walked over the WHOLE owner tree, not just the ``context`` subtree —
    querySelectorAll semantics, and the same unbounded walk
    :func:`matches` does, so the two agree on non-root contexts.  The
    caller (:func:`query`) restricts the FINAL set to ``context``
    descendants."""
    root: Element = context
    while isinstance(root.parent, Element):
        root = root.parent
    comps = tokens[0::2]
    combs = tokens[1::2]
    cur: set[int] = {id(n) for n in root.iter()
                     if isinstance(n, Element)
                     and comps[0].matches(n)}  # type: ignore[arg-type]
    for comb, compound in zip(combs, comps[1:]):
        assert isinstance(comb, str) and isinstance(compound, Compound)
        if not cur:
            return cur
        nxt: set[int] = set()
        # DFS frames: (element-or-root, any-strict-ancestor-in-`cur`)
        stack: list[tuple[Element, bool]] = [(root, False)]
        while stack:
            node, anc = stack.pop()
            parent_in = id(node) in cur
            prev_el_in = False   # nearest preceding element sibling ∈ cur
            any_prev_in = False  # any preceding element sibling ∈ cur
            for child in node.children:
                if not isinstance(child, Element):
                    continue
                if compound.matches(child):
                    if ((comb == ">" and parent_in)
                            or (comb == " " and (anc or parent_in))
                            or (comb == "+" and prev_el_in)
                            or (comb == "~" and any_prev_in)):
                        nxt.add(id(child))
                child_in = id(child) in cur
                prev_el_in = child_in
                any_prev_in = any_prev_in or child_in
                if child.children:
                    stack.append((child, anc or parent_in))
        cur = nxt
    return cur


def query(context: Element, selector: str) -> list[Element]:
    """All elements under ``context`` matching ``selector``, document
    order, ``context`` itself excluded (reference ``sizzle``,
    `selector.py:173-200`: quick-expression fast paths first, full
    matching otherwise).  ``#id`` scans the context subtree like any
    other compound — duplicate ids (routine in real crawled HTML) all
    match, and ``query``/``matches`` stay consistent."""
    m = _RE_QUICK.match(selector.strip())
    if m is not None:
        element_id, tag, cls = m.groups()
        if element_id:
            return [n for n in _descendant_elements(context)
                    if n.attrs.get("id") == element_id]
        if tag:
            return [n for n in context.get_nodes_by_name(tag)
                    if n is not context]  # tag idents never hit #text names
        return [n for n in context.get_elements_by_class_name(cls)
                if n is not context]
    groups = tokenize(selector)
    hits: set[int] = set()
    for g in groups:
        hits |= _group_match_ids(context, g)
    if not hits:
        return []
    return [n for n in _descendant_elements(context) if id(n) in hits]


def _descendant_elements(context: Element) -> Iterator[Element]:
    for n in context.iter():
        if n is not context and isinstance(n, Element):
            yield n


Content = Union[str, Node, "Selector", list]


class Selector:
    """jQuery-like matched set with DOM-editing verbs (reference
    `selector.py:306-624`).

    ``append``/``prepend``/``before``/``after`` accept an HTML string
    (parsed inline), a Node, a list of nodes, another ``Selector``, or
    a callable ``(node, index) -> content``; when the matched set has
    several elements, content is deep-cloned for every target but the
    last, exactly as the reference's ``clone_obj`` loop does
    (`selector.py:394-398`).
    """

    def __init__(self, selector_or_nodes: Union[str, list], node: Element):
        if isinstance(selector_or_nodes, str):
            self.data: list[Element] = query(node, selector_or_nodes)
        else:
            self.data = list(selector_or_nodes)

    # -- set access ------------------------------------------------------
    def __getitem__(self, k: int) -> Element:
        return self.data[k]

    def __iter__(self) -> Iterator[Element]:
        return iter(self.data)

    def __len__(self) -> int:
        return len(self.data)

    def find(self, selector: str) -> "Selector":
        """Descendants of the matched set filtered by ``selector``
        (reference `selector.py:328-335`)."""
        found: list[Element] = []
        for node in self.data:
            found.extend(query(node, selector))
        self.data = found
        return self

    def contents(self) -> "Selector":
        """Children of the matched set, text/comment nodes included
        (reference `selector.py:337-345`)."""
        kids: list[Node] = []
        for node in self.data:
            kids.extend(node.children)
        self.data = kids  # type: ignore[assignment]
        return self

    # -- DOM edits -------------------------------------------------------
    def append(self, *content: Content, **kw) -> "Selector":
        """Insert content at the end of each matched element
        (reference `selector.py:364-398`)."""
        return self._edit(content, kw,
                          lambda node, nodes: node.extend_children(nodes))

    def prepend(self, *content: Content, **kw) -> "Selector":
        """Insert content at the beginning of each matched element
        (reference `selector.py:400-452`)."""
        return self._edit(content, kw,
                          lambda node, nodes: node.extend_before(0, nodes))

    def after(self, *content: Content, **kw) -> "Selector":
        """Insert content after each matched element
        (reference `selector.py:454-532`)."""
        def place(node: Element, nodes: list[Node]) -> None:
            anchor = node
            for new in nodes:
                anchor.append_after(new)
                anchor = new
        return self._edit(content, kw, place)

    def before(self, *content: Content, **kw) -> "Selector":
        """Insert content before each matched element
        (reference `selector.py:534-612`)."""
        def place(node: Element, nodes: list[Node]) -> None:
            for new in nodes:
                node.prepend_before(new)
        return self._edit(content, kw, place)

    def remove(self) -> "Selector":
        """Detach every matched element from its tree (extension: the
        reference reaches removal through ``__delitem__`` on the parent,
        `node.py:481-519`; extraction rules want it as a verb)."""
        for node in self.data:
            node.detach()
        return self

    def _edit(self, content: tuple, kw: dict,
              place: Callable[[Element, list[Node]], None]) -> "Selector":
        if len(content) == 1 and callable(content[0]) \
                and not isinstance(content[0], (Node, Selector)):
            fnc = content[0]
            for num, node in enumerate(self.data):
                place(node, _to_nodes(fnc(node, num), clone=False))
            return self
        for item in content:
            # normalize once (strings parse exactly once), deep-clone for
            # every target but the last, which adopts the originals —
            # the reference's clone_obj loop (`selector.py:394-398`)
            nodes = _to_nodes(item, clone=False)
            for i, node in enumerate(self.data):
                if i == len(self.data) - 1:
                    place(node, nodes)
                else:
                    place(node, [n.clone_node(deep=True) for n in nodes])
        return self


def _to_nodes(content: Content, clone: bool) -> list[Node]:
    """Normalize any accepted content form to a list of parentless
    nodes; ``clone`` deep-copies so one source can feed many targets
    (reference ``clone_obj``, `selector.py:159-170`)."""
    if isinstance(content, Selector):
        nodes: list[Node] = list(content.data)
    elif isinstance(content, Node):
        nodes = [content]
    elif isinstance(content, str):
        from lexor_spark.kernel.htmlparser import parse_html
        doc, _ = parse_html(content)
        drained = list(doc.children)
        for n in drained:
            n.parent = None
        doc.children = []
        return drained  # freshly parsed: never needs cloning
    elif hasattr(content, "__iter__"):
        nodes = [n if isinstance(n, Node) else Text(str(n)) for n in content]
    else:
        nodes = [Text(str(content))]
    if clone:
        nodes = [n.clone_node(deep=True) for n in nodes]
    else:
        for n in nodes:
            n.detach()
    return nodes
