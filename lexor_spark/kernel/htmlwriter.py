"""DOM → HTML serializer (the reference's DefaultWriter capability).

Clean-room analogue of `/root/reference/lexor/core/writer.py:102-118`
(DefaultWriter: unknown tags → ``<name a="b">…</name>``) plus the
one-pass multi-replace escaping idea (`writer.py:19-39`), specialized to
the HTML node taxonomy of this kernel:

* ``Element``  → ``<name k="v">children</name>``
* ``Void``     → ``<name k="v">`` (HTML void form, no close tag)
* ``RawText``  → ``<name k="v">payload</name>`` — payload verbatim
  (script/style bodies are not entity-escaped, as in HTML)
* ``Text``     → entity-escaped (& < >)
* ``Entity``   → verbatim (the parser kept the source form, e.g. ``&amp;``)
* ``Comment``/``DocumentType``/``CData``/``ProcessingInstruction`` →
  their source forms

``serialize(parse(x))`` is a *normal form*: parse→serialize is
idempotent (serialize∘parse is a projection), which the round-trip tests
pin — the reference's golden-output mechanism (`test.py:254-271`)."""

from __future__ import annotations

from lexor_spark.kernel.dom import (
    CData, Comment, DocumentType, Element, Entity, Node,
    ProcessingInstruction, RawText, Text, Void,
)

__all__ = ["write_html"]

# one-pass multi-replace (reference writer.py:19-39): str.translate IS the
# simultaneous-substitution primitive in Python 3
_TEXT_ESC = str.maketrans({"&": "&amp;", "<": "&lt;", ">": "&gt;"})
# attr values are kept RAW by the parser (entities undecoded, as in the
# reference); escaping anything but the delimiting quote would therefore
# double-escape on re-serialize and break idempotence
_ATTR_ESC = str.maketrans({'"': "&quot;"})


def _open_tag(node: Element) -> str:
    if node.attrs:
        attrs = " ".join(
            k if v == "" else f'{k}="{v.translate(_ATTR_ESC)}"'
            for k, v in node.attrs.items())
        return f"<{node.name} {attrs}>"
    return f"<{node.name}>"


def write_html(root: Node, rules: dict = None) -> str:
    """Serialize a node (sub)tree back to HTML markup.

    Iterative DFS with explicit close events (recursion-free — same
    hostile-depth contract as the parser).

    ``rules`` is the W2 NodeWriter registry (``writerrules.WriterRule``
    keyed by node name, reference `writer.py:54-99` — this writer is
    the analogue of its DefaultWriter): a matching rule replaces the
    default tag serialization; ``ctx`` is the output part list
    (``ctx.append(s)``)."""
    has_rules = bool(rules)
    text_rule = rules.get("#text") if has_rules else None
    entity_rule = rules.get("#entity") if has_rules else None
    out: list[str] = []
    # closing=1: default </name>; closing=2: rule end slot
    stack: list[tuple[Node, int]] = [(root, 0)]
    while stack:
        node, closing = stack.pop()
        if closing:
            if closing == 2:
                rules[node.name].end(out, node)
            else:
                out.append(f"</{node.name}>")
            continue
        cls = type(node)
        if cls is Text:
            if text_rule is not None and text_rule.data(out, node):
                continue
            out.append(node.data.translate(_TEXT_ESC))
        elif cls is Entity:
            if entity_rule is not None and entity_rule.data(out, node):
                continue
            out.append(node.data)
        elif cls is Comment:
            out.append(f"<!--{node.data}-->")
        elif cls is DocumentType:
            out.append(f"<!doctype {node.data}>")
        elif cls is CData:
            out.append(f"<![CDATA[{node.data}]]>")
        elif cls is ProcessingInstruction:
            out.append(f"<?{node.target} {node.data}?>" if node.data
                       else f"<?{node.target}?>")
        elif cls is RawText:
            out.append(_open_tag(node))
            out.append(node.data)
            out.append(f"</{node.name}>")
        elif cls is Void:
            if has_rules and node.name in rules:
                r = rules[node.name]
                r.start(out, node)
                r.end(out, node)
                continue
            out.append(_open_tag(node))
        elif isinstance(node, Element):
            if node.name.startswith("#"):  # Document / fragment roots
                for child in reversed(node.children):
                    stack.append((child, 0))
                continue
            if has_rules and node.name in rules:
                r = rules[node.name]
                r.start(out, node)
                stack.append((node, 2))
                if r.child(node):
                    for child in reversed(node.children):
                        stack.append((child, 0))
                continue
            out.append(_open_tag(node))
            stack.append((node, 1))
            for child in reversed(node.children):
                stack.append((child, 0))
    return "".join(out)
