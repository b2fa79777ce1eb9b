"""Pluggable per-tag writer rules (the reference's NodeWriter contract).

Clean-room analogue of `/root/reference/lexor/core/writer.py:54-99`: a
``NodeWriter`` writes a node in three steps — ``start``, ``data`` /
``child``, ``end`` — and a writing STYLE is a mapping ``{node name:
NodeWriter}`` consulted by the writer's dispatch loop (reference
`writer.py:419-445`: ``get_node_writer`` falls back to ``__default__``).
The reference loads these mappings from style plugin modules; here a
style is a plain dict passed to the writer — hermetic, no module
loading (the L1/L3 exclusion documented in SURVEY §2.1), but the same
extension contract: adding an output style means writing rules, not
editing kernel files.

Rule slots (all optional — the base class is a no-op that leaves the
node to the writer's built-in handling):

* ``start(ctx, node)``  — called at the first encounter of a matching
  Element/Void node.  ``ctx`` is the writer's native sink (documented
  per writer below); whatever the rule writes lands in the output
  stream at that point.
* ``data(ctx, node) -> bool`` — called for matching character-data
  nodes (registry keys ``#text`` / ``#entity``).  Return True to mark
  the node handled (the writer's default emission is skipped), False
  to fall through (the reference's default ``data`` writes the raw
  payload, `writer.py:82-87`; opting OUT is the safe default here).
* ``child(node) -> bool`` — gate for descending into an Element's
  children (reference `writer.py:88-97`).  Return False to skip the
  subtree (``end`` still fires).
* ``end(ctx, node)``    — called at the last encounter.

``ctx`` per writer:

* ``textwriter.write_text``     — the ``_TextBuilder``: use
  ``add_inline(s)``, ``add_verbatim(s)``, ``request_break(level)``.
* ``mdwriter.write_markdown``   — the ``_MD`` accumulator: use
  ``text(s)``, ``wrap(marker)``, ``flush_block(prefix)``,
  ``fenced(code)``.
* ``htmlwriter.write_html``     — a plain ``list[str]`` of output
  parts: ``ctx.append(s)``.

Default behavior is bit-for-bit unchanged: every writer's hot loop
checks the registry only when one was provided, and an empty/absent
registry takes the exact pre-registry code path (the extraction oracle
pins those bytes).
"""

from __future__ import annotations

__all__ = ["WriterRule", "TEXT_KEY", "ENTITY_KEY"]

TEXT_KEY = "#text"
ENTITY_KEY = "#entity"


class WriterRule:
    """Base rule: all slots default to 'leave it to the writer'."""

    __slots__ = ()

    def start(self, ctx, node) -> None:
        """First encounter with a matching Element/Void node."""

    def data(self, ctx, node) -> bool:
        """Character-data hook (keys ``#text``/``#entity``); return
        True when the node was handled here."""
        return False

    def child(self, node) -> bool:
        """Descend into children?  (reference `writer.py:88-97`)."""
        return True

    def end(self, ctx, node) -> None:
        """Last encounter with a matching Element node."""
