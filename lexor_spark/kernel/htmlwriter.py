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


def write_html(root: Node) -> str:
    """Serialize a node (sub)tree back to HTML markup.

    Iterative DFS with explicit close events (recursion-free — same
    hostile-depth contract as the parser)."""
    out: list[str] = []
    stack: list[tuple[Node, bool]] = [(root, False)]
    while stack:
        node, closing = stack.pop()
        if closing:
            out.append(f"</{node.name}>")
            continue
        cls = type(node)
        if cls is Text:
            out.append(node.data.translate(_TEXT_ESC))
        elif cls is Entity:
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
            out.append(_open_tag(node))
        elif isinstance(node, Element):
            if node.name.startswith("#"):  # Document / fragment roots
                for child in reversed(node.children):
                    stack.append((child, False))
                continue
            out.append(_open_tag(node))
            stack.append((node, True))
            for child in reversed(node.children):
                stack.append((child, False))
    return "".join(out)
