"""Named writer styles: shippable W2 NodeWriter-rule registries.

The reference's whole writer premise is that an output STYLE is a
mapping of node names to NodeWriter rules loaded as config, not an edit
to the writer (`/root/reference/lexor/core/writer.py:54-99` — rule
contract; `:419-445` — per-style dispatch).  ``writerrules.WriterRule``
ports that contract; this module ships the styles themselves, keyed by
name so a Spark job can select one with a plain string (strings pickle
into Arrow-batch UDF closures cleanly; rule objects are resolved
worker-side).

``training_text`` is the production style for LLM-corpus extraction
where the default (reference-pinned) rendition loses signal:

* ``a``     — link targets become visible: ``anchor text <href>`` (the
  lynx/w3m dump convention); fragment-only and ``javascript:`` hrefs
  stay invisible.
* ``img``   — surviving images (the converter keeps ``img`` voids,
  `extractor.py:114`) render as ``[image: <alt>]`` so multimodal
  aligners can find the anchor; alt-less images are dropped silently.
* ``table`` — tables render as a ``[table: N cells]`` placeholder and
  the subtree is skipped (``child``→False): tabular prose is noise for
  most LM mixes, but the cell count keeps the signal auditable.

The default style (``rules=None``) remains byte-pinned by the
extraction oracle; styles only exist on the opt-in path.
"""

from __future__ import annotations

from lexor_spark.kernel.writerrules import WriterRule

__all__ = ["STYLES", "style_rules", "parse_style_spec"]


class _LinkTarget(WriterRule):
    """`anchor text <href>` — reference NodeWriter ``end`` slot
    (`writer.py:98-99`): fires at the element's last encounter, after
    the anchor text was emitted by the default Text handling."""

    __slots__ = ()

    def end(self, ctx, node) -> None:
        href = node.attrs.get("href", "").strip()
        if href and not href.startswith(("#", "javascript:")):
            ctx.add_inline(" <" + href + ">")


class _ImagePlaceholder(WriterRule):
    """``[image: alt]`` for alt-texted images (``start`` slot; img is a
    Void so start/end fire back-to-back, `writer.py:75-81`)."""

    __slots__ = ()

    def start(self, ctx, node) -> None:
        alt = node.attrs.get("alt", "").strip()
        if alt:
            ctx.add_inline("[image: " + alt + "]")


class _TableOmit(WriterRule):
    """Skip table subtrees (``child``→False, reference `writer.py:88-97`)
    but leave an auditable ``[table: N cells]`` marker."""

    __slots__ = ()

    def child(self, node) -> bool:
        return False

    def start(self, ctx, node) -> None:
        ctx.request_break(2)
        n = sum(1 for _ in _iter_cells(node))
        ctx.add_inline(f"[table: {n} cells]")

    def end(self, ctx, node) -> None:
        ctx.request_break(2)


def _iter_cells(table):
    stack = list(getattr(table, "children", ()) or ())
    while stack:
        node = stack.pop()
        name = getattr(node, "name", None)
        if name in ("td", "th"):
            yield node
        kids = getattr(node, "children", None)
        if kids:
            stack.extend(kids)


def _flag(params: dict, key: str, default: str) -> bool:
    v = params.pop(key, default)
    if v not in ("on", "off"):
        raise ValueError(
            f"style parameter {key!r} must be on/off, got {v!r}")
    return v == "on"


def _training_text(params: dict) -> dict[str, WriterRule]:
    """``training_text[:links=on|off,images=on|off,tables=omit|keep]``
    — each hook is individually switchable; ``tables=keep`` leaves the
    default table rendition instead of the placeholder."""
    rules: dict[str, WriterRule] = {}
    if _flag(params, "links", "on"):
        rules["a"] = _LinkTarget()
    if _flag(params, "images", "on"):
        rules["img"] = _ImagePlaceholder()
    tables = params.pop("tables", "omit")
    if tables not in ("omit", "keep"):
        raise ValueError(
            f"style parameter 'tables' must be omit/keep, got {tables!r}")
    if tables == "omit":
        rules["table"] = _TableOmit()
    return rules


# style name → factory(params) → rule registry.  The reference's CLI
# accepts ``target[style:param=val]`` (`/root/reference/lexor/command/
# to.py:51-131` splits the style token on ``:`` and forwards the params
# to the style plugin); here the same spec grammar selects a factory
# and its keyword parameters.
STYLES: dict[str, object] = {
    "training_text": _training_text,
}


def parse_style_spec(spec: str) -> tuple[str, dict[str, str]]:
    """``name[:key=val[,key=val...]]`` → (name, params).  The spec is a
    plain string end-to-end — it pickles into Arrow-batch UDF closures
    and resolves worker-side, same as a bare style name."""
    name, sep, rest = spec.partition(":")
    name = name.strip()
    params: dict[str, str] = {}
    if sep:
        for kv in rest.split(","):
            kv = kv.strip()
            if not kv:
                continue
            k, eq, v = kv.partition("=")
            if not eq or not k.strip():
                raise ValueError(
                    f"bad style parameter {kv!r} in {spec!r} "
                    f"(expected key=val)")
            params[k.strip()] = v.strip()
    return name, params


def style_rules(spec: str) -> dict[str, WriterRule]:
    """Resolve a style spec (``name`` or ``name:key=val,...``) to its
    rule registry (KeyError lists the available names, ValueError flags
    bad parameters — driver-side validation fails fast)."""
    name, params = parse_style_spec(spec)
    try:
        factory = STYLES[name]
    except KeyError:
        raise KeyError(
            f"unknown writer style {name!r}; available: "
            f"{sorted(STYLES)}") from None
    rules = factory(params)            # factories pop what they accept
    if params:
        raise ValueError(
            f"unknown parameter(s) {sorted(params)} for style "
            f"{name!r}")
    return rules
