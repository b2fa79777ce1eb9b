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
`lexor_spark/multimodal.py`): fonts with a ``/ToUnicode`` CMap are
decoded through it (``bfchar``/``bfrange``, UTF-16BE targets) — BOTH
simple 1-byte fonts and Type0/CID composite fonts with 2-byte codes
(Identity-H subset embeddings, the way every modern PDF producer embeds
non-Latin text); the code width comes from the CMap's codespacerange.
Fonts without a ToUnicode table fall back to PDFDocEncoding≈Latin-1
(1-byte) or U+FFFD (2-byte CIDs are glyph ids with no public meaning).
Encryption and non-Identity CID encodings remain out of scope.  Files
beyond the subset degrade to ``ok=False`` error rows, never task
failures.

Like the HTML kernel, everything here is pure (same bytes → same text on
any executor, any retry) and allocation-light (operates on one
``bytes``/``memoryview`` per document).
"""

from __future__ import annotations

import re
import zlib
from typing import Optional

__all__ = ["PdfResult", "extract_pdf_text", "build_simple_pdf",
           "build_cmap_pdf", "build_cid_pdf"]

_STREAM = re.compile(rb"stream\r?\n")
_FLATE = re.compile(rb"/(?:FlateDecode|Fl)\b")
# text-showing / positioning operator tokenizer for content streams
_TOKEN = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"      # literal string (with escapes)
    rb"|<[0-9A-Fa-f\s]*>"          # hex string
    rb"|/[^\s<>\[\]()/%]+"         # name (font selection)
    rb"|\[|\]"
    rb"|BT|ET|Tj|TJ|Tf|Td|TD|T\*|Tm|'|\""
    rb"|[-+]?[0-9]*\.?[0-9]+"
)
# ToUnicode CMap machinery (simple 1-byte fonts)
_OBJ = re.compile(rb"(\d+)\s+0\s+obj\b")
_TOUNICODE_REF = re.compile(rb"/ToUnicode\s+(\d+)\s+0\s+R")
_BFCHAR = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CODESPACE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.S)
_CMAP_TOK = re.compile(rb"<([0-9A-Fa-f]+)>|\[|\]")
_FONT_REF = re.compile(rb"/([^\s<>\[\]()/%]+)\s+(\d+)\s+0\s+R")
_ESCAPES = {
    ord("n"): 0x0A, ord("r"): 0x0D, ord("t"): 0x09, ord("b"): 0x08,
    ord("f"): 0x0C, ord("("): 0x28, ord(")"): 0x29, ord("\\"): 0x5C,
}


class PdfResult:
    __slots__ = ("text", "n_pages", "n_streams", "ok", "err")

    def __init__(self) -> None:
        self.text = ""
        self.n_pages = 0
        self.n_streams = 0
        self.ok = True
        self.err: Optional[str] = None


def _literal_bytes(tok: bytes) -> bytes:
    """Literal PDF string ``(...)`` → raw string bytes (escapes + octal)."""
    body = tok[1:-1]
    out = bytearray()
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
                out.append(code & 0xFF)
                i = j
                continue
            if nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < n and body[i] == 0x0A:
                    i += 1
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.append(b)
        i += 1
    return bytes(out)


def _hex_bytes(tok: bytes) -> bytes:
    hx = bytes(c for c in tok[1:-1] if not chr(c).isspace())
    if len(hx) % 2:
        hx += b"0"  # spec: odd-length hex gets a trailing 0
    try:
        return bytes.fromhex(hx.decode("ascii"))
    except ValueError:
        return b""


class CMap:
    """Parsed ToUnicode table: {code int: unicode str} plus the code
    width in bytes (1 = simple font, 2 = Type0/CID Identity-H)."""
    __slots__ = ("width", "map")

    def __init__(self, width: int = 1) -> None:
        self.width = width
        self.map: dict[int, str] = {}


def _to_text(raw: bytes, cmap: Optional["CMap"]) -> str:
    """String bytes → text: through the active font's ToUnicode CMap
    when one exists, Latin-1≈PDFDocEncoding otherwise.  For 1-byte
    fonts, unmapped codes fall back per-byte (common-viewer behavior);
    for 2-byte CID fonts unmapped codes are glyph ids with no public
    meaning, so they become U+FFFD.  A trailing odd byte in a 2-byte
    string is ignored (malformed producer output)."""
    if cmap is None:
        return raw.decode("latin-1")
    get = cmap.map.get
    if cmap.width == 2:
        n = len(raw) & ~1
        return "".join(get((raw[i] << 8) | raw[i + 1], "�")
                       for i in range(0, n, 2))
    return "".join(get(b) or chr(b) for b in raw)


# -- ToUnicode CMap parsing (1-byte simple fonts, 2-byte CID fonts) ---------

_MAX_BFRANGE = 1 << 16  # defensive cap on one range's expansion


def _parse_cmap(stream: bytes) -> CMap:
    """codespacerange + bfchar/bfrange sections → :class:`CMap`
    (targets are UTF-16BE per the CMap spec).  The code width comes from
    the codespacerange bound length, falling back to the first bfchar
    src length (some producers omit the codespacerange)."""
    width = 0
    cs = _CODESPACE.search(stream)
    if cs is not None:
        bounds = [t for t in _CMAP_TOK.findall(cs.group(1)) if t]
        if bounds:
            width = max(1, min(2, len(bounds[0]) // 2))
    out: dict[int, str] = {}

    def _uni(hx: bytes) -> str:
        try:
            return bytes.fromhex(hx.decode("ascii")).decode(
                "utf-16-be", errors="replace")
        except ValueError:
            return ""

    for m in _BFCHAR.finditer(stream):
        toks = [t for t in _CMAP_TOK.findall(m.group(1)) if t]
        for k in range(0, len(toks) - 1, 2):
            src, dst = toks[k], toks[k + 1]
            if not width:  # producer omitted the codespacerange
                width = max(1, min(2, len(src) // 2))
            if len(src) == 2 * width:
                out[int(src, 16)] = _uni(dst)
    for m in _BFRANGE.finditer(stream):
        body = m.group(1)
        toks: list = []
        for t in _CMAP_TOK.finditer(body):
            toks.append(t.group(1) if t.group(1) else t.group(0))
        k = 0
        while k < len(toks):
            if k + 2 >= len(toks):
                break
            lo_t, hi_t = toks[k], toks[k + 1]
            if not isinstance(lo_t, bytes) or lo_t in (b"[", b"]") \
                    or not isinstance(hi_t, bytes) or hi_t in (b"[", b"]"):
                k += 1
                continue
            if not width:
                width = max(1, min(2, len(lo_t) // 2))
            if toks[k + 2] == b"[":  # list form: <lo> <hi> [<d1> <d2> ...]
                j = k + 3
                code = int(lo_t, 16) if len(lo_t) == 2 * width else None
                while j < len(toks) and toks[j] != b"]":
                    if code is not None and code <= int(hi_t, 16):
                        out[code] = _uni(toks[j])
                        code += 1
                    j += 1
                k = j + 1
                continue
            dst_t = toks[k + 2]
            if len(lo_t) == 2 * width and len(hi_t) == 2 * width:
                lo, hi = int(lo_t, 16), int(hi_t, 16)
                base = int(dst_t, 16)
                tgt_w = len(dst_t) // 2  # bytes in the target
                cap = min(hi, lo + _MAX_BFRANGE, (1 << (8 * width)) - 1)
                for code in range(lo, cap + 1):
                    try:
                        out[code] = _uni(
                            (base + code - lo).to_bytes(tgt_w, "big").hex()
                            .encode("ascii"))
                    except OverflowError:
                        break  # malformed range target: stop, don't fail
            k += 3
    cmap = CMap(width or 1)
    cmap.map = out
    return cmap


def _font_cmaps(data: bytes) -> dict[bytes, CMap]:
    """Map content-stream font resource names (``/F1`` → ``F1``) to
    parsed ToUnicode CMaps.  Resource-name binding is taken document-
    wide (last Resources wins) — the simple-font subset this module
    owns; per-page shadowing belongs to the CID tier above it."""
    # object table: num -> (dict+stream slice)
    objects: dict[int, bytes] = {}
    matches = list(_OBJ.finditer(data))
    for k, m in enumerate(matches):
        end = data.find(b"endobj", m.end())
        if end == -1:
            end = matches[k + 1].start() if k + 1 < len(matches) else len(data)
        objects[int(m.group(1))] = data[m.end():end]

    def _stream_of(obj: bytes) -> bytes:
        sm = _STREAM.search(obj)
        if sm is None:
            return b""
        raw = obj[sm.end():]
        e = raw.find(b"endstream")
        if e != -1:
            raw = raw[:e]
        raw = raw.rstrip(b"\r\n")
        if _FLATE.search(obj[:sm.start()]):
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                return b""
        return raw

    # font obj -> cmap (via /ToUnicode N 0 R in the font dict; for a
    # Type0 font the ref sits on the composite font object itself)
    font_cmap: dict[int, CMap] = {}
    for num, obj in objects.items():
        if b"/Font" not in obj and b"/ToUnicode" not in obj:
            continue
        tm = _TOUNICODE_REF.search(obj)
        if tm is None:
            continue
        cm_obj = objects.get(int(tm.group(1)))
        if cm_obj is None:
            continue
        stream = _stream_of(cm_obj)
        if stream:
            cmap = _parse_cmap(stream)
            if cmap.map:
                font_cmap[num] = cmap

    if not font_cmap:
        return {}
    # resource name -> font obj, from every /Font << /Fx N 0 R ... >> dict
    out: dict[bytes, CMap] = {}
    pos = 0
    while True:
        f = data.find(b"/Font", pos)
        if f == -1:
            break
        seg = data[f:f + 400]  # a font resource dict is short
        for name, num in _FONT_REF.findall(seg):
            cmap = font_cmap.get(int(num))
            if cmap is not None:
                out[name] = cmap
        pos = f + 5
    return out


def _extract_stream_text(data: bytes, parts: list[str],
                         cmaps: Optional[dict] = None) -> None:
    """Pull text from one decompressed content stream into ``parts``.
    ``cmaps`` maps font resource names to ToUnicode tables; the ``Tf``
    operator switches the active table."""
    in_text = False
    in_array = False
    pending_num: Optional[float] = None
    cur_cmap: Optional[CMap] = None
    last_name: Optional[bytes] = None
    for m in _TOKEN.finditer(data):
        tok = m.group(0)
        if tok == b"BT":
            in_text = True
            continue
        if tok == b"ET":
            in_text = False
            in_array = False
            continue
        c0 = tok[0]
        if c0 == 0x2F:  # /Name — remember for a following Tf
            last_name = tok[1:]
            continue
        if tok == b"Tf":
            cur_cmap = cmaps.get(last_name) if cmaps and last_name else None
            continue
        if not in_text:
            continue
        if tok == b"[":
            in_array = True
        elif tok == b"]":
            in_array = False
        elif c0 == 0x28:  # literal string
            parts.append(_to_text(_literal_bytes(tok), cur_cmap))
        elif c0 == 0x3C:  # hex string
            parts.append(_to_text(_hex_bytes(tok), cur_cmap))
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
        # simple-font ToUnicode tables, once per document (cheap gate:
        # most crawl PDFs without embedded subsets skip all of this)
        cmaps = _font_cmaps(data) if b"/ToUnicode" in data else {}
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
            _extract_stream_text(raw, parts, cmaps or None)
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


def _assemble_pdf(objects: list[bytes]) -> bytes:
    """Shared fixture-builder tail: serialize numbered objects with a
    correct xref table and trailer (object 1 is the Catalog)."""
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


def build_cmap_pdf(lines: list[str], mapping: dict[int, str],
                   compress: bool = True) -> bytes:
    """A single-page PDF whose font carries a ToUnicode CMap: byte code
    ``k`` renders as ``mapping[k]``.  Unmapped bytes stay Latin-1.
    Fixture builder for the CMap decode path — pure function of its
    inputs, like :func:`build_simple_pdf`."""
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

    bfchars = "\n".join(
        f"<{code:02X}> <{''.join(f'{ord(ch):04X}' for ch in uni)}>"
        for code, uni in sorted(mapping.items()))
    cmap = (
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        "1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        f"{len(mapping)} beginbfchar\n{bfchars}\nendbfchar\n"
        "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
    ).encode("latin-1")

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + filt + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n"
        + cmap + b"\nendstream",
    ]
    return _assemble_pdf(objects)


def build_cid_pdf(lines: list[str], compress: bool = True) -> bytes:
    """A single-page PDF using a Type0/CID composite font (Identity-H):
    every distinct character of ``lines`` gets a sequential 2-byte code,
    text is shown as 2-byte hex strings, and a ToUnicode CMap with a
    ``<0000> <FFFF>`` codespacerange maps codes back — the layout every
    modern producer emits for non-Latin text.  Deterministic fixture
    builder (pure function of its inputs)."""
    codes: dict[str, int] = {}
    for ln in lines:
        for ch in ln:
            if ch not in codes:
                codes[ch] = len(codes) + 1
    body = ["BT", "/F1 11 Tf", "1 0 0 1 72 720 Tm"]
    for ln in lines:
        hexstr = "".join(f"{codes[ch]:04X}" for ch in ln)
        body.append(f"<{hexstr}> Tj")
        body.append("0 -14 Td")
    body.append("ET")
    content = "\n".join(body).encode("latin-1")
    filt = b""
    if compress:
        content = zlib.compress(content, 6)
        filt = b" /Filter /FlateDecode"

    def _utf16(ch: str) -> str:
        return ch.encode("utf-16-be").hex().upper()

    bfchars = "\n".join(f"<{code:04X}> <{_utf16(ch)}>"
                        for ch, code in sorted(codes.items(),
                                               key=lambda kv: kv[1]))
    cmap = (
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        f"{len(codes)} beginbfchar\n{bfchars}\nendbfchar\n"
        "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
    ).encode("latin-1")

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + filt + b" >>\nstream\n"
        + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth-Identity-H "
        b"/Encoding /Identity-H /DescendantFonts [7 0 R] "
        b"/ToUnicode 6 0 R >>",
        b"<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n"
        + cmap + b"\nendstream",
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> >>",
    ]
    return _assemble_pdf(objects)


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
    return _assemble_pdf(objects)
