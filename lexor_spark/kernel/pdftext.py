"""Minimal PDF text extraction (pure Python, stdlib only).

The north rule covers "PDF/layout parse" alongside HTML.  This module
implements the honest subset a crawl pipeline can do without native
codecs: scan the file for content streams (FlateDecode inflated via
stdlib ``zlib``), tokenize the text-showing operators inside BT/ET
blocks (``Tj``, ``'``, ``"``, ``TJ`` with kerning arrays, both literal
``( )`` and hex ``< >`` strings), and reconstruct reading order from the
text-positioning operators (``Td``/``TD``/``T*`` start new lines; large
negative TJ kerns become spaces).

Scope (documented limitation, same contract style as
`lexor_spark/multimodal.py`): string bytes are interpreted via the
PDFDocEncoding≈Latin-1 fallback — no ToUnicode CMaps, no Type0/CID
subset fonts, no encryption.  Files beyond the subset degrade to
``ok=False`` error rows, never task failures.

Like the HTML kernel, everything here is pure (same bytes → same text on
any executor, any retry) and allocation-light (operates on one
``bytes``/``memoryview`` per document).
"""

from __future__ import annotations

import re
import zlib
from typing import Optional

__all__ = ["PdfResult", "extract_pdf_text", "build_simple_pdf"]

_STREAM = re.compile(rb"stream\r?\n")
_FLATE = re.compile(rb"/(?:FlateDecode|Fl)\b")
# text-showing / positioning operator tokenizer for content streams
_TOKEN = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"      # literal string (with escapes)
    rb"|<[0-9A-Fa-f\s]*>"          # hex string
    rb"|\[|\]"
    rb"|BT|ET|Tj|TJ|Td|TD|T\*|Tm|'|\""
    rb"|[-+]?[0-9]*\.?[0-9]+"
)
_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


class PdfResult:
    __slots__ = ("text", "n_pages", "n_streams", "ok", "err")

    def __init__(self) -> None:
        self.text = ""
        self.n_pages = 0
        self.n_streams = 0
        self.ok = True
        self.err: Optional[str] = None


def _decode_literal(tok: bytes) -> str:
    """Literal PDF string ``(...)`` → text (escapes + octal)."""
    body = tok[1:-1]
    out: list[str] = []
    i, n = 0, len(body)
    while i < n:
        b = body[i]
        if b == 0x5C and i + 1 < n:  # backslash
            nxt = body[i + 1]
            if 0x30 <= nxt <= 0x37:  # octal escape, up to 3 digits
                j = i + 1
                oct_digits = []
                while j < n and len(oct_digits) < 3 and 0x30 <= body[j] <= 0x37:
                    oct_digits.append(body[j] - 0x30)
                    j += 1
                code = 0
                for d in oct_digits:
                    code = code * 8 + d
                out.append(chr(code & 0xFF))
                i = j
                continue
            if nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < n and body[i] == 0x0A:
                    i += 1
                continue
            out.append(_ESCAPES.get(nxt, chr(nxt)))
            i += 2
            continue
        out.append(chr(b))
        i += 1
    return "".join(out)


def _decode_hex(tok: bytes) -> str:
    hx = bytes(c for c in tok[1:-1] if not chr(c).isspace())
    if len(hx) % 2:
        hx += b"0"  # spec: odd-length hex gets a trailing 0
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1")
    except ValueError:
        return ""


def _extract_stream_text(data: bytes, parts: list[str]) -> None:
    """Pull text from one decompressed content stream into ``parts``."""
    in_text = False
    in_array = False
    pending_num: Optional[float] = None
    for m in _TOKEN.finditer(data):
        tok = m.group(0)
        if tok == b"BT":
            in_text = True
            continue
        if tok == b"ET":
            in_text = False
            in_array = False
            continue
        if not in_text:
            continue
        c0 = tok[0]
        if tok == b"[":
            in_array = True
        elif tok == b"]":
            in_array = False
        elif c0 == 0x28:  # literal string
            parts.append(_decode_literal(tok))
        elif c0 == 0x3C:  # hex string
            parts.append(_decode_hex(tok))
        elif tok in (b"Td", b"TD", b"T*"):
            if parts and not parts[-1].endswith("\n"):
                parts.append("\n")
        elif tok in (b"'", b'"'):
            # show-with-newline operators: the string token preceding them
            # was already appended; insert the line break *before* it
            if len(parts) >= 1:
                last = parts.pop()
                if parts and not parts[-1].endswith("\n"):
                    parts.append("\n")
                parts.append(last)
        elif in_array and (0x30 <= c0 <= 0x39 or c0 in (0x2B, 0x2D, 0x2E)):
            # kerning adjustment inside TJ; big negative kern ≈ word gap
            try:
                pending_num = float(tok)
            except ValueError:
                pending_num = None
            if pending_num is not None and pending_num < -180:
                parts.append(" ")
            pending_num = None


def extract_pdf_text(data: bytes) -> PdfResult:
    """Extract text from a PDF byte string (subset documented above)."""
    res = PdfResult()
    try:
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF- header)")
        res.n_pages = data.count(b"/Type /Page") + data.count(b"/Type/Page") \
            - data.count(b"/Type /Pages") - data.count(b"/Type/Pages")
        parts: list[str] = []
        for m in _STREAM.finditer(data):
            start = m.end()
            end = data.find(b"endstream", start)
            if end == -1:
                continue
            raw = data[start:end].rstrip(b"\r\n")
            # the object dict immediately precedes 'stream'
            dict_start = data.rfind(b"<<", 0, m.start())
            obj_dict = data[dict_start:m.start()] if dict_start != -1 else b""
            if _FLATE.search(obj_dict):
                try:
                    raw = zlib.decompress(raw)
                except zlib.error:
                    continue  # not a text stream we can read
            if b"BT" not in raw:
                continue
            res.n_streams += 1
            _extract_stream_text(raw, parts)
        res.text = "".join(parts)
    except Exception as exc:
        res.ok = False
        res.err = f"{type(exc).__name__}: {exc}"[:300]
    return res


# ---------------------------------------------------------------------------
# deterministic synthetic PDF builder (test/bench input; no external data)
# ---------------------------------------------------------------------------

def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_simple_pdf(lines: list[str], compress: bool = True) -> bytes:
    """A valid single-page PDF showing ``lines`` with Tj/Td operators —
    pure function of its inputs, byte-stable across runs/executors.
    Non-Latin-1 characters are replaced (mirroring the extraction
    subset's decoding contract)."""
    body = ["BT", "/F1 11 Tf", "1 0 0 1 72 720 Tm"]
    for ln in lines:
        safe = _pdf_escape(ln.encode("latin-1", "replace").decode("latin-1"))
        body.append(f"({safe}) Tj")
        body.append("0 -14 Td")
    body.append("ET")
    content = "\n".join(body).encode("latin-1")
    filt = b""
    if compress:
        content = zlib.compress(content, 6)
        filt = b" /Filter /FlateDecode"

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + filt + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objects, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
