"""DOM node types for the extraction kernel.

Clean-room Python-3 redesign of the reference's node taxonomy
(`/root/reference/lexor/core/node.py:59-61`, `elements.py:17-627` — studied
for semantics only; no code copied).  Deliberate deviations, chosen for the
batch-extraction workload:

* children are a plain ``list`` and nodes carry only a ``parent`` back-ref —
  the reference's ``prev``/``next`` doubly-linked siblings and eagerly
  maintained ``level`` (`node.py:144-241`) are dropped; the extraction path
  never mutates mid-tree, so sibling links are derivable from
  ``parent.children[index]``.
* attributes use the insertion-ordered Python-3 ``dict`` instead of the
  reference's ``__dict__`` + ``_order`` pair (`elements.py:206-218`); the
  observable contract (ordered get/set/del/items/rename) is identical.
* ``Text`` nodes carry ``start``/``end`` character offsets into the source
  document — the columnar analogue of the reference's ``pos`` property
  (`parser.py:46-50`) — so the writer can emit source spans.
* everything uses ``__slots__`` (the reference does too: `node.py:60-61`);
  one Python object per node is the single biggest memory lever at
  Arrow-batch scale.
"""

from __future__ import annotations

from typing import Iterator, Optional

__all__ = [
    "Node", "CharacterData", "Text", "Comment", "CData", "Entity",
    "DocumentType", "ProcessingInstruction", "Element", "RawText", "Void",
    "Document", "dispose",
]


def dispose(root: "Node") -> int:
    """Break parent↔child reference cycles so the tree frees by refcount;
    returns the node count of the tree (the walk is fused with counting so
    the pipeline needs no second DFS for its ``n_nodes`` metric).

    The parent back-refs make every subtree a cycle for CPython's cyclic
    GC.  At Arrow-batch scale that GC pressure is the dominant scaling
    limiter (measured: ~+50% extraction throughput at 32 workers with the
    cyclic GC off), so the batch UDF disables it and the pipeline unlinks
    trees explicitly instead.

    Clearing each container's ``children`` list is sufficient to break
    every cycle (the remaining ``parent`` refs point strictly upward, a
    DAG), so the walk visits containers only — leaves are counted via
    ``len`` without being touched.  Idempotent: a second call sees empty
    children and returns 1."""
    root.parent = None
    kids = getattr(root, "children", None)
    if not kids:
        return 1
    count = 1
    containers = _CONTAINERS
    stack: list[Node] = [root]
    while stack:
        node = stack.pop()
        kids = node.children
        count += len(kids)
        for ch in kids:
            if ch.__class__ in containers and ch.children:
                stack.append(ch)
        node.children = []
    return count


class Node:
    """Base node: a ``name`` tag plus tree links.

    Reference analogue: `lexor/core/node.py:59-130` (name/parent/index
    slots; ``level`` dropped — derivable, never needed by extraction).
    """

    __slots__ = ("name", "parent", "pos")

    def __init__(self, name: str) -> None:
        self.name = name
        self.parent: Optional[Element] = None
        # source OFFSET where the node was found; -1 if synthetic.
        # (line, col) is derived on demand — see htmlparser.linecol.
        self.pos: int = -1

    # -- navigation ------------------------------------------------------
    @property
    def index(self) -> int:
        """Position among siblings (reference `node.py:97-130`)."""
        if self.parent is None:
            return 0
        return self.parent.children.index(self)

    def iter(self) -> Iterator["Node"]:
        """Pre-order iterative DFS (recursion-free: hostile HTML nests
        deep; reference is iterative everywhere too, `node.py:220-241`)."""
        stack: list[Node] = [self]
        while stack:
            node = stack.pop()
            yield node
            kids = getattr(node, "children", None)
            if kids:
                stack.extend(reversed(kids))

    @property
    def prev_element(self) -> Optional["Element"]:
        """Nearest Element sibling before this node (reference
        `node.py:170-181`; derived from the parent's list — this engine
        keeps no prev/next links)."""
        p = self.parent
        if p is None:
            return None
        kids = p.children
        for k in range(self.index - 1, -1, -1):
            if isinstance(kids[k], Element):
                return kids[k]
        return None

    @property
    def next_element(self) -> Optional["Element"]:
        """Nearest Element sibling after this node (reference
        `node.py:184-192`)."""
        p = self.parent
        if p is None:
            return None
        kids = p.children
        for k in range(self.index + 1, len(kids)):
            if isinstance(kids[k], Element):
                return kids[k]
        return None

    # reference-name alias (`node.py:155-164`: previous_element)
    previous_element = prev_element

    @property
    def element_index(self) -> int:
        """Number of preceding Element siblings (reference
        `node.py:131-141`)."""
        p = self.parent
        if p is None:
            return 0
        kids = p.children
        n = 0
        for k in range(self.index):
            if isinstance(kids[k], Element):
                n += 1
        return n

    @property
    def previous_sibling(self) -> Optional["Node"]:
        """The node immediately preceding this one (reference
        `node.py:143-153`): x.previous_sibling ⇔ x.parent[x.index-1]."""
        p = self.parent
        if p is None:
            return None
        i = self.index
        return p.children[i - 1] if i > 0 else None

    @property
    def next_sibling(self) -> Optional["Node"]:
        """The node immediately following this one (reference
        `node.py:173-183`)."""
        p = self.parent
        if p is None:
            return None
        kids = p.children
        i = self.index
        return kids[i + 1] if i + 1 < len(kids) else None

    @property
    def owner(self) -> Optional["Document"]:
        """The Document at the root of this node's tree, if any (the
        reference maintains ``owner`` eagerly, `node.py:88-95`; here it
        is derived — extraction never needs it, mutation rarely)."""
        node: Node = self
        while node.parent is not None:
            node = node.parent
        return node if isinstance(node, Document) else None

    # -- mutation (reference `node.py:310-443`) ---------------------------
    def detach(self) -> "Node":
        """Unlink from the parent (the implicit first step of every
        reference insert, `node.py:312-315`)."""
        p = self.parent
        if p is not None:
            kids = p.children
            for k, child in enumerate(kids):
                if child is self:
                    del kids[k]
                    break
            self.parent = None
        return self

    def append_after(self, new_child: "Node") -> None:
        """Place ``new_child`` right after this node among its siblings
        (reference `node.py:423-430`)."""
        parent = self.parent
        if parent is None:
            raise ValueError("append_after on a parentless node")
        parent.insert_before(self.index + 1, new_child)

    def prepend_before(self, new_child: "Node") -> None:
        """Place ``new_child`` right before this node (reference
        `node.py:436-438`)."""
        parent = self.parent
        if parent is None:
            raise ValueError("prepend_before on a parentless node")
        parent.insert_before(self.index, new_child)

    def clone_node(self, deep: bool = False, normalize: bool = True) -> "Node":
        """Copy this node; ``deep`` clones the whole subtree (reference
        `elements.py:353-395` — its spider-walk is replaced by an
        explicit frame stack, recursion-free for hostile depth).  Each
        completed element is ``normalize``d on the way up, exactly as
        the reference does."""
        top = _shallow_clone(self)
        kids = getattr(self, "children", None)
        if not deep or not kids:
            return top
        # frames of (source_children, next_index, dst_element)
        frames: list[tuple] = []
        src, i, dst = kids, 0, top
        n = len(src)
        while True:
            while i < n:
                node = src[i]
                i += 1
                copy = _shallow_clone(node)
                copy.parent = dst
                dst.children.append(copy)
                ch = getattr(node, "children", None)
                if ch:
                    frames.append((src, i, dst))
                    src, i, dst = ch, 0, copy
                    n = len(ch)
            if normalize and isinstance(dst, Element):
                dst.normalize()
            if not frames:
                break
            src, i, dst = frames.pop()
            n = len(src)
        return top


def _shallow_clone(node: "Node") -> "Node":
    """Type-dispatched shallow copy (reference `elements.py:353-360` plus
    each CharacterData subclass's implicit copy contract).  Attribute
    dicts are copied — clones must be independently mutable."""
    cls = type(node)
    if cls is Text:
        return Text(node.data, node.start, node.end)
    if cls is Entity:
        return Entity(node.data, node.start, node.end)
    if cls is Comment:
        return Comment(node.data)
    if cls is CData:
        return CData(node.data)
    if cls is DocumentType:
        return DocumentType(node.data)
    if cls is ProcessingInstruction:
        return ProcessingInstruction(node.target, node.data)
    if cls is RawText:
        out = RawText(node.name, dict(node.attrs), node.data)
    elif cls is Void:
        out = Void(node.name, dict(node.attrs))
    elif cls is Document:
        out = Document(node.lang, node.uri)
        out.meta.update(node.meta)
    elif isinstance(node, Element):
        out = Element(node.name, dict(node.attrs))
    else:
        out = cls(node.name)  # pragma: no cover - future node kinds
    out.pos = node.pos
    return out


class CharacterData(Node):
    """Leaf with a string payload (reference `elements.py:17-40`)."""

    __slots__ = ("data",)

    def __init__(self, name: str, data: str = "") -> None:
        super().__init__(name)
        self.data = data


class Text(CharacterData):
    """Plain text run; adjacent Text siblings are merged at build time
    (reference `parser.py:323-327,342-355`) and by ``normalize``.

    ``start``/``end`` are character offsets into the source string; when two
    Text nodes merge the interval is widened (the merged run is contiguous
    in the source by construction of the parser loop)."""

    __slots__ = ("start", "end")

    def __init__(self, data: str = "", start: int = -1, end: int = -1) -> None:
        # hot path: slots set directly (no super() chain — Text is the
        # most-constructed node type)
        self.name = "#text"
        self.parent = None
        self.pos = -1
        self.data = data
        self.start = start
        self.end = end


class Comment(CharacterData):
    """``<!-- ... -->`` (reference `elements.py:84-110`)."""

    __slots__ = ()

    def __init__(self, data: str = "") -> None:
        super().__init__("#comment", data)


class CData(CharacterData):
    """``<![CDATA[ ... ]]>`` (reference `elements.py:113-130`)."""

    __slots__ = ()

    def __init__(self, data: str = "") -> None:
        super().__init__("#cdata-section", data)


class Entity(CharacterData):
    """Character reference like ``&amp;`` kept verbatim at parse time and
    decoded by the writer (reference `elements.py:133-161`).

    ``start``/``end`` span the full ``&...;`` source range."""

    __slots__ = ("start", "end")

    def __init__(self, data: str = "", start: int = -1, end: int = -1) -> None:
        # hot path: slots set directly (no super() chain — entities are
        # frequent in real markup)
        self.name = "#entity"
        self.parent = None
        self.pos = -1
        self.data = data
        self.start = start
        self.end = end


class DocumentType(CharacterData):
    """``<!doctype ...>`` payload (reference `elements.py:164-186`)."""

    __slots__ = ()

    def __init__(self, data: str = "") -> None:
        super().__init__("#doctype", data)


class ProcessingInstruction(CharacterData):
    """``<?target ... ?>``; ``name`` is ``?target`` (reference
    `elements.py:58-81`).  NOTE: the reference can *execute* python PIs
    (`converter.py:394-447`); that is deliberately not reimplemented
    (arbitrary code exec from crawled data) — PIs are inert nodes here."""

    __slots__ = ("target",)

    def __init__(self, target: str, data: str = "") -> None:
        super().__init__("?" + target, data)
        self.target = target


class Element(Node):
    """Tag with ordered string attributes and children
    (reference `elements.py:189-481`)."""

    __slots__ = ("attrs", "children")

    def __init__(self, name: str, attrs: Optional[dict[str, str]] = None) -> None:
        # hot path: slots set directly (no super() chain)
        self.name = name
        self.parent = None
        self.pos = -1
        self.attrs: dict[str, str] = attrs if attrs is not None else {}
        self.children: list[Node] = []

    # -- attribute surface (reference `elements.py:224-351`) --------------
    def get(self, key: str, default: Optional[str] = None) -> Optional[str]:
        return self.attrs.get(key, default)

    def __contains__(self, key: str) -> bool:
        return key in self.attrs

    def rename_attr(self, old: str, new: str) -> None:
        """Rename preserving position (reference `elements.py:343-351`)."""
        if old not in self.attrs:
            return
        self.attrs = {new if k == old else k: v for k, v in self.attrs.items()}

    @property
    def attlen(self) -> int:
        """Number of attributes (reference `elements.py:309-311`)."""
        return len(self.attrs)

    @property
    def attributes(self) -> list[str]:
        """Attribute names in insertion order (reference
        `elements.py:313-316`)."""
        return list(self.attrs)

    @property
    def values(self) -> list[str]:
        """Attribute values in insertion order (reference
        `elements.py:318-321`)."""
        return list(self.attrs.values())

    def attribute(self, index: int) -> str:
        """Name of the attribute at ``index`` (reference
        `elements.py:323-325`)."""
        return list(self.attrs)[index]

    def attr(self, index: int) -> str:
        """Value of the attribute at ``index`` (reference
        `elements.py:327-330`)."""
        return list(self.attrs.values())[index]

    def update_attributes(self, node: "Element") -> None:
        """Copy ``node``'s attributes into this element, preserving this
        element's existing order for keys it already has (reference
        `elements.py:224-229`)."""
        self.attrs.update(node.attrs)

    # -- child ops ---------------------------------------------------------
    def append_child(self, node: Node) -> None:
        """Parser hot-path primitive: links without detaching (callers
        hand over fresh nodes).  To MOVE a node between trees use the
        mutation API (`insert_before`/`extend_children`/…), which
        detaches first as the reference does (`node.py:312-315`)."""
        node.parent = self
        self.children.append(node)

    def append_text(self, data: str, start: int = -1, end: int = -1) -> None:
        """Append text, merging into a trailing Text sibling — the
        build-time merge that reference `parser.py:342-355` performs."""
        kids = self.children
        if kids:
            last = kids[-1]
            if type(last) is Text:
                last.data += data
                if end >= 0:
                    last.end = end
                return
        node = Text(data, start, end)
        node.parent = self
        kids.append(node)

    def insert_before(self, index: int, new_child: Node) -> "Element":
        """Insert ``new_child`` just before the child at ``index``
        (reference `node.py:327-340`; prev/next/index bookkeeping is
        unnecessary here — siblings are derived from the list)."""
        if not isinstance(new_child, Node):
            new_child = Text(str(new_child))
        new_child.detach()
        self.children.insert(index, new_child)
        new_child.parent = self
        return self

    def extend_before(self, index: int, new_children) -> "Element":
        """Insert several nodes before the child at ``index`` (reference
        `node.py:342-374`).  Accepts a list of nodes or an Element /
        Document fragment, whose children are *drained* into this node;
        a Document's ``meta`` is folded into this tree's owner document
        (the reference's temporary-fragment rule, `node.py:355-360`)."""
        for node in self._drain(new_children):
            node.detach()
            self.children.insert(index, node)
            node.parent = self
            index += 1
        return self

    def extend_children(self, new_children) -> "Element":
        """Append several nodes (reference `node.py:401-421`); same
        fragment/meta semantics as :meth:`extend_before`."""
        for node in self._drain(new_children):
            node.detach()
            node.parent = self
            self.children.append(node)
        return self

    def _drain(self, new_children) -> list[Node]:
        if isinstance(new_children, Element):
            if isinstance(new_children, Document):
                owner = self.owner
                if owner is not None:
                    owner.meta.update(new_children.meta)
                    new_children.meta = {}
            drained = new_children.children
            new_children.children = []
            for node in drained:
                node.parent = None
            return drained
        return list(new_children)

    def contains(self, obj: Node) -> bool:
        """True when ``obj`` is a strict descendant of this element
        (reference `elements.py:293-302`; the level counter is gone, so
        this climbs the parent chain instead)."""
        node = obj.parent
        while node is not None:
            if node is self:
                return True
            node = node.parent
        return False

    # -- child get/del/set (reference `node.py:481-573`) -------------------
    def __len__(self) -> int:
        return len(self.children)

    def __getitem__(self, i):
        return self.children[i]

    def __delitem__(self, i) -> None:
        gone = self.children[i]
        if isinstance(i, slice):
            for node in gone:
                node.parent = None
        else:
            gone.parent = None
        del self.children[i]

    def __setitem__(self, i, value) -> None:
        if isinstance(i, slice):
            nodes = list(value)
            old = self.children[i]
            if len(old) != len(nodes) and i.step is not None:
                raise ValueError(
                    f"attempt to assign sequence of size {len(nodes)} to "
                    f"extended slice of size {len(old)}")
            for node in nodes:
                if node is self:
                    raise TypeError("A node cannot have itself as a child.")
                node.detach()
            for node in old:
                node.parent = None
            self.children[i] = nodes
            for node in nodes:
                node.parent = self
        else:
            if not isinstance(value, Node):
                raise TypeError("items must be Nodes")
            if value is self:
                raise TypeError("A node cannot have itself as a child.")
            value.detach()
            self.children[i].parent = None
            self.children[i] = value
            value.parent = self

    # -- innerHTML (reference `elements.py:431-481`) ------------------------
    def inner_html(self) -> str:
        """Serialize the children to HTML markup (the getter half of the
        reference's ``children()`` dual-role method)."""
        from lexor_spark.kernel.htmlwriter import write_html
        return "".join(write_html(c) for c in self.children)

    def set_inner_html(self, markup: str) -> "Element":
        """Replace the children with the parse of ``markup`` (the setter
        half; parse diagnostics are discarded, as the reference's
        inline-parse path does)."""
        from lexor_spark.kernel.htmlparser import parse_html
        doc, _ = parse_html(markup)
        for node in self.children:
            node.parent = None
        self.children = []
        return self.extend_children(doc)

    def normalize(self) -> "Element":
        """Drop empty Text children; merge adjacent Text runs
        (reference `node.py:445-469`; invoked per completed element during
        conversion, `converter.py:362` — load-bearing for byte-identity)."""
        out: list[Node] = []
        for node in self.children:
            if type(node) is Text:
                if node.data == "":
                    continue
                if out and type(out[-1]) is Text:
                    out[-1].data += node.data
                    out[-1].end = node.end
                    continue
            out.append(node)
        self.children = out
        return self

    # -- queries (reference `node.py:575-604`, `elements.py:397-429`) ------
    def get_nodes_by_name(self, name: str) -> list[Node]:
        return [n for n in self.iter() if n.name == name]

    def get_elements_by_class_name(self, classes: str) -> list["Element"]:
        want = set(classes.split())
        found: list[Element] = []
        for n in self.iter():
            if isinstance(n, Element):
                have = n.attrs.get("class")
                if have and want <= set(have.split()):
                    found.append(n)
        return found

    def class_list(self) -> list[str]:
        c = self.attrs.get("class")
        return c.split() if c else []

    def text_content(self) -> str:
        """Concatenated #text/#entity payloads, document order."""
        parts: list[str] = []
        for n in self.iter():
            if isinstance(n, (Text, Entity)):
                parts.append(n.data)
            elif isinstance(n, RawText):
                pass  # script/style payloads are not text content
        return "".join(parts)


class RawText(Element):
    """Element whose body is an unparsed blob (``<script>``, ``<style>``,
    ...); never has child nodes (reference `elements.py:484-498`)."""

    __slots__ = ("data",)

    def __init__(self, name: str, attrs: Optional[dict[str, str]] = None,
                 data: str = "") -> None:
        # hot path: slots set directly (script/style on every real page)
        self.name = name
        self.parent = None
        self.pos = -1
        self.attrs = attrs if attrs is not None else {}
        self.children = []
        self.data = data


class Void(Element):
    """Self-contained element (``<img>``, ``<br>``, ...); never has
    children (reference `elements.py:501-512`)."""

    __slots__ = ()


class Document(Element):
    """Tree root with document-level services (reference
    `elements.py:515-590`).  ``meta`` is the open metadata dict; the
    reference's ``id_dict`` index is rebuilt on demand instead of being
    maintained incrementally (extraction never mutates ids)."""

    __slots__ = ("lang", "uri", "meta")

    def __init__(self, lang: str = "html", uri: str = "") -> None:
        super().__init__("#document")
        self.lang = lang
        self.uri = uri
        self.meta: dict[str, str] = {}

    @staticmethod
    def create_element(tagname: str,
                       attrs: Optional[dict[str, str]] = None) -> Element:
        """Factory mirror of reference `elements.py:582-585`."""
        return Element(tagname, attrs)

    def get_element_by_id(self, idval: str) -> Optional[Element]:
        for n in self.iter():
            if isinstance(n, Element) and n.attrs.get("id") == idval:
                return n
        return None


# Container classes for dispose's children-clearing walk (defined here,
# after the classes exist; dispose reads it at call time).
_CONTAINERS = frozenset((Element, RawText, Void, Document))
