"""Modal wrap/indent string-emission engine (the reference writer's
buffer machinery, W5).

Clean-room reimplementation of `/root/reference/lexor/core/writer.py`:

* width-bounded word wrap with whitespace backtracking
  (`writer.py:42-51,281-311`): a line breaks at the last space before
  the width limit; if none exists the engine looks *ahead* to the next
  space (long tokens overflow rather than split);
* break hints (`writer.py:253-254,295-300`): a caller may mark a just-
  written string as a preferred break point — the wrapper favors it
  when the regular break would overflow;
* indent mode (`writer.py:240-250,271-276`): every emitted line is
  prefixed with the current ``indent`` string (empty lines only when
  ``indent_empty`` is set);
* raw mode (`writer.py:322-328`): bytes pass through untouched;
* ``endl(force=False)`` newline collapse (`writer.py:338-346`): no
  duplicate blank line when the previous write already ended one.

The engine is byte-deterministic: output depends only on the call
sequence, never on ambient state — the property every kernel stage
needs for the resume contract.
"""

from __future__ import annotations

__all__ = ["WrapWriter", "find_whitespace", "wrap_text"]

DEFAULT_WIDTH = 70  # reference `writer.py:389`


def find_whitespace(line: str, start: int, lim: int) -> int:
    """Index of the break point: the last space at or before ``lim``,
    else the first space after it, else ``len(line)`` (reference
    `writer.py:42-51` — overflow beats mid-token splits)."""
    index = line.rfind(" ", start, lim + 1)
    if index != -1:
        return index
    index = line.find(" ", lim)
    if index != -1:
        return index
    return len(line)


class WrapWriter:
    """String sink with wrap / raw / indent modes."""

    __slots__ = ("width", "indent", "indent_empty", "_parts", "_buffer",
                 "_wrap", "_raw", "_hints", "_line", "_col", "_prev")

    def __init__(self, width: int = DEFAULT_WIDTH, indent: str = "",
                 indent_empty: bool = False) -> None:
        self.width = width
        self.indent = indent
        self.indent_empty = indent_empty
        self._parts: list[str] = []
        self._buffer = ""
        self._wrap = False
        self._raw = False
        self._hints: list[str] = []
        self._line = 1
        self._col = 1   # 1-based column of the next character
        self._prev = ""

    # -- low-level sink (reference `_write_str`, writer.py:222-232) -------
    def _emit(self, string: str) -> None:
        if string == "":
            return
        self._prev = string
        self._parts.append(string)
        nl = string.count("\n")
        if nl:
            self._line += nl
            self._col = len(string) - string.rfind("\n")
        else:
            self._col += len(string)

    # -- public surface ----------------------------------------------------
    def write(self, string: str, split: bool = False) -> None:
        """Write a string honoring the current mode (reference
        ``write_str``, writer.py:233-265).  ``split=True`` registers the
        string as a break hint for the wrapper."""
        if self._raw:
            self._emit(string)
            return
        if not self._wrap:
            if self.indent != "":
                lines = string.split("\n")
                if self._col == 1 and (lines[0] != "" or self.indent_empty):
                    lines[0] = self.indent + lines[0]
                for k in range(1, len(lines)):
                    if lines[k] != "" or self.indent_empty:
                        lines[k] = self.indent + lines[k]
                self._emit("\n".join(lines))
            else:
                self._emit(string)
            return
        if split:
            self._hints.append(string)
        lines = string.split("\n")
        for k in range(len(lines) - 1):
            self._buffer += lines[k]
            self._normalize()
            self.flush()
            self._emit("\n")
        self._buffer += lines[-1]
        self._normalize()

    def flush(self, tail: bool = True) -> None:
        """Drain the wrap buffer (reference ``flush_buffer``,
        writer.py:267-279); ``tail=False`` drops one trailing space."""
        if not tail and self._buffer.endswith(" "):
            self._buffer = self._buffer[:-1]
        if self._col == 1:
            if self._buffer.startswith(" "):
                self._buffer = self._buffer[1:]
            if self._buffer != "":
                self._emit(self.indent + self._buffer)
            elif self.indent_empty:
                self._emit(self.indent)
        else:
            self._emit(self._buffer)
        self._buffer = ""

    def _normalize(self) -> None:
        """Keep the buffer under the wrap width, flushing full lines
        (reference ``normalize_buffer``, writer.py:281-311)."""
        line = self._buffer
        indent = self.indent
        if self._col > 1:
            indent = ""
        limit = self.width - self._col - len(indent) + 1
        while len(line) > limit:
            start = 1 if line[:1] == " " else 0
            end = find_whitespace(line, start, limit)
            while self._hints:
                index = line.find(self._hints[0], start)
                del self._hints[0]
                if -1 < index <= limit and (end > limit or index > end):
                    end = index
            if end == len(line):
                break
            self._emit(indent + line[start:end] + "\n")
            line = line[end + 1:] if line[end:end + 1] == " " else line[end:]
            indent = self.indent
            limit = self.width - self._col - len(indent) + 1
        self._buffer = line

    # -- modes (reference writer.py:313-328) --------------------------------
    def enable_wrap(self) -> None:
        self._wrap = True

    def disable_wrap(self) -> None:
        self.flush()
        self._wrap = False

    def enable_raw(self) -> None:
        self.flush()
        self._raw = True

    def disable_raw(self) -> None:
        self._raw = False

    def endl(self, force: bool = True, tot: int = 1, tail: bool = False) -> None:
        """Newline with optional collapse (reference writer.py:338-346)."""
        prev = self.last()
        self.flush(tail)
        if force or (not prev.endswith("\n") and prev != self.indent):
            self._emit("\n" * tot)

    def last(self) -> str:
        """Last written string including the open buffer (reference
        writer.py:348-352)."""
        return self._prev + self._buffer

    def getvalue(self) -> str:
        self.flush()
        return "".join(self._parts)


def wrap_text(text: str, width: int = DEFAULT_WIDTH, indent: str = "") -> str:
    """Wrap already-extracted plain text paragraph-wise: each input line
    is a paragraph, re-broken at ``width`` columns with ``indent`` on
    every output line (the W5 engine applied to flat text — e.g. the PDF
    path, which has no DOM for the writer to drive)."""
    w = WrapWriter(width=width, indent=indent)
    w.enable_wrap()
    lines = text.split("\n")
    for k, line in enumerate(lines):
        w.write(line)
        if k < len(lines) - 1:
            w.endl()
    return w.getvalue()
