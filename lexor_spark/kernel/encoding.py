"""HTML byte-stream encoding sniffing (WHATWG-style, pure Python).

The input table carries ``html`` as **binary** (BASELINE.json
``input_hint``) and real Common-Crawl captures are 5-10% non-UTF-8
(windows-125x, shift_jis, gbk, euc-kr, ...).  The reference kernel
receives already-decoded text (its CLI reads files as text,
`__init__.py`/`to.py`), so byte-level charset detection is a gap a
Spark pipeline over WARC-derived tables must fill itself.  This module
implements the practically-relevant subset of the WHATWG encoding
sniffing algorithm (https://html.spec.whatwg.org/multipage/parsing.html
#determining-the-character-encoding), in priority order:

1. **BOM** — UTF-8 / UTF-16LE / UTF-16BE byte-order marks win over
   everything (spec step 2; the BOM is stripped from the decode).
2. **meta prescan** — scan the first ``PRESCAN_BYTES`` for
   ``<meta charset=...>`` or ``<meta http-equiv=content-type
   content="...charset=...">`` (ASCII-byte regex; attribute order and
   quoting free).  Labels normalize through a WHATWG-label subset
   (https://encoding.spec.whatwg.org/#names-and-labels): notably
   iso-8859-1 / latin1 / us-ascii all mean **windows-1252** on the web,
   gb2312 means gbk, and a meta-declared utf-16 is read as utf-8 (spec
   rule - a page that survived as bytes through an 8-bit channel is not
   utf-16).
3. **UTF-8 validation** — no declaration: strictly validate a prefix
   (truncated trailing multibyte sequence allowed); valid -> utf-8.
4. **windows-1252 fallback** — the web's de-facto legacy default (what
   every browser ships for en/most locales).

``decode_html`` never raises on content: the chosen codec decodes with
``errors="replace"`` so hostile bytes degrade to U+FFFD, never to a
task failure (same contract as the rest of the kernel).
"""

from __future__ import annotations

import codecs
import re
from typing import Tuple, Union

__all__ = ["sniff_encoding", "decode_html", "normalize_label",
           "PRESCAN_BYTES"]

PRESCAN_BYTES = 1024     # spec suggests >= 1024 bytes for the prescan
_UTF8_CHECK_BYTES = 4096

# WHATWG label -> python codec, the subset that covers the web's long
# tail (full table: https://encoding.spec.whatwg.org/#names-and-labels).
# Keys are already lower-cased, values are python codec names.
_LABELS = {
    # utf-8 family
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    # the web's "latin-1" really is windows-1252
    "iso-8859-1": "windows-1252", "iso8859-1": "windows-1252",
    "latin1": "windows-1252", "latin-1": "windows-1252",
    "l1": "windows-1252", "ascii": "windows-1252",
    "us-ascii": "windows-1252", "windows-1252": "windows-1252",
    "cp1252": "windows-1252", "x-cp1252": "windows-1252",
    "ansi_x3.4-1968": "windows-1252",
    # other single-byte windows/iso pages
    "windows-1250": "windows-1250", "cp1250": "windows-1250",
    "iso-8859-2": "iso-8859-2", "latin2": "iso-8859-2",
    "windows-1251": "windows-1251", "cp1251": "windows-1251",
    "windows-1253": "windows-1253", "windows-1254": "windows-1254",
    "iso-8859-9": "windows-1254", "latin5": "windows-1254",
    "windows-1255": "windows-1255", "windows-1256": "windows-1256",
    "windows-1257": "windows-1257", "windows-1258": "windows-1258",
    "windows-874": "cp874", "tis-620": "cp874", "iso-8859-11": "cp874",
    "iso-8859-7": "iso-8859-7", "greek": "iso-8859-7",
    "iso-8859-15": "iso-8859-15", "latin9": "iso-8859-15",
    "koi8-r": "koi8-r", "koi8": "koi8-r", "koi8-u": "koi8-u",
    "macintosh": "mac-roman", "x-mac-roman": "mac-roman",
    # CJK multi-byte
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis", "ms_kanji": "shift_jis",
    "euc-jp": "euc-jp", "x-euc-jp": "euc-jp",
    "iso-2022-jp": "iso-2022-jp",
    "gbk": "gbk", "gb2312": "gbk", "gb_2312": "gbk",
    "gb_2312-80": "gbk", "x-gbk": "gbk", "chinese": "gbk",
    "csgb2312": "gbk", "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs", "cn-big5": "big5",
    "x-x-big5": "big5",
    "euc-kr": "cp949", "korean": "cp949", "ks_c_5601-1987": "cp949",
    "ksc5601": "cp949", "windows-949": "cp949",
    # meta-declared utf-16 is read as utf-8 per spec (see module doc);
    # x-user-defined approximated by windows-1252 (ASCII-compatible)
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
    "x-user-defined": "windows-1252",
}

# <meta ... charset=X ...> (covers both the charset attribute and the
# http-equiv content="text/html; charset=X" form): find meta tags, then
# the charset= token inside them.  Byte-level, ASCII-case-insensitive —
# every encoding this table handles is ASCII-compatible in the prescan
# window (utf-16 is caught earlier by its BOM).
_META_TAG = re.compile(rb"<meta\s[^>]{0,512}", re.IGNORECASE)
_CHARSET = re.compile(
    rb"""charset\s*=\s*["']?\s*([a-zA-Z0-9_][a-zA-Z0-9._:-]{0,30})""",
    re.IGNORECASE)


def normalize_label(label: str) -> str:
    """WHATWG label -> python codec name; '' if unknown/unsupported."""
    codec = _LABELS.get(label.strip().lower())
    if codec is None:
        return ""
    try:
        codecs.lookup(codec)
    except LookupError:          # pragma: no cover - table is curated
        return ""
    return codec


def _utf8_prefix_valid(raw: bytes) -> bool:
    """Strict-validate a prefix as UTF-8, allowing one truncated
    trailing multibyte sequence at the cut point."""
    chunk = raw[:_UTF8_CHECK_BYTES]
    if not chunk:
        return True
    for trim in range(4):
        if trim >= len(chunk):
            return False
        try:
            (chunk[:len(chunk) - trim] if trim else chunk).decode("utf-8")
            return True
        except UnicodeDecodeError:
            continue
    return False


def sniff_encoding(raw: Union[bytes, bytearray, memoryview]
                   ) -> Tuple[str, str]:
    """Return ``(python_codec, source)`` for an HTML byte stream.

    ``source`` is one of ``bom`` / ``meta`` / ``utf8-valid`` /
    ``fallback`` — recorded per document so corpus-level encoding
    telemetry (and the `charset_sniff` gate query) can audit the
    decision, not just the result.
    """
    raw = bytes(raw)
    if raw.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig", "bom"
    if raw.startswith(b"\xff\xfe"):
        return "utf-16-le", "bom"
    if raw.startswith(b"\xfe\xff"):
        return "utf-16-be", "bom"
    head = raw[:PRESCAN_BYTES]
    for tag in _META_TAG.finditer(head):
        m = _CHARSET.search(tag.group(0))
        if not m:
            continue
        codec = normalize_label(m.group(1).decode("ascii", "replace"))
        if codec:
            return codec, "meta"
    if _utf8_prefix_valid(raw):
        return "utf-8", "utf8-valid"
    return "windows-1252", "fallback"


def decode_html(raw: Union[bytes, bytearray, memoryview, str]
                ) -> Tuple[str, str, str]:
    """Decode an HTML byte stream to text: ``(text, codec, source)``.

    ``str`` passes through unchanged (source ``str``).  The BOM, when
    it drove the decision, is stripped (utf-8-sig / utf-16 codecs).
    Decoding always uses ``errors="replace"`` — hostile bytes yield
    U+FFFD, never an exception.
    """
    if isinstance(raw, str):
        return raw, "str", "str"
    codec, source = sniff_encoding(raw)
    data = bytes(raw)
    if codec == "utf-16-le":
        text = data[2:].decode("utf-16-le", errors="replace")
    elif codec == "utf-16-be":
        text = data[2:].decode("utf-16-be", errors="replace")
    else:
        text = data.decode(codec, errors="replace")
    return text, codec, source
