"""kernel/encoding.py — WHATWG-style charset sniffing (pure Python)."""
import pytest

from lexor_spark.kernel.encoding import (decode_html, normalize_label,
                                         sniff_encoding)


def _page(meta: str, body: bytes) -> bytes:
    return (f"<!doctype html><html><head>{meta}<title>t</title></head>"
            "<body><p>").encode("ascii") + body + b"</p></body></html>"


class TestBOM:
    def test_utf8_bom(self):
        raw = b"\xef\xbb\xbf" + _page("", b"caf\xc3\xa9")
        assert sniff_encoding(raw) == ("utf-8-sig", "bom")
        text, codec, source = decode_html(raw)
        assert text.startswith("<!doctype")      # BOM stripped
        assert "café" in text

    def test_utf16_le_bom(self):
        raw = b"\xff\xfe" + "<html>héllo</html>".encode("utf-16-le")
        assert sniff_encoding(raw) == ("utf-16-le", "bom")
        assert "héllo" in decode_html(raw)[0]

    def test_utf16_be_bom(self):
        raw = b"\xfe\xff" + "<html>héllo</html>".encode("utf-16-be")
        assert sniff_encoding(raw) == ("utf-16-be", "bom")
        assert "héllo" in decode_html(raw)[0]

    def test_bom_beats_contradicting_meta(self):
        raw = b"\xef\xbb\xbf" + _page('<meta charset="shift_jis">', b"x")
        assert sniff_encoding(raw) == ("utf-8-sig", "bom")


class TestMetaPrescan:
    @pytest.mark.parametrize("meta,codec", [
        ('<meta charset="utf-8">', "utf-8"),
        ("<meta charset=UTF-8>", "utf-8"),
        ("<meta charset='windows-1251'>", "windows-1251"),
        ('<meta charset="ISO-8859-1">', "windows-1252"),   # web latin-1
        ("<meta charset=gb2312>", "gbk"),                  # label ⇒ gbk
        ('<meta http-equiv="Content-Type" '
         'content="text/html; charset=Shift_JIS">', "shift_jis"),
        ('<meta http-equiv=content-type '
         "content='text/html;charset=euc-kr'>", "cp949"),
        ('<meta charset="KOI8-R">', "koi8-r"),
        ('<meta charset="Big5">', "big5"),
    ])
    def test_declared(self, meta, codec):
        assert sniff_encoding(_page(meta, b"abc")) == (codec, "meta")

    def test_meta_utf16_read_as_utf8(self):
        # WHATWG: a meta-declared utf-16 page that arrived as 8-bit
        # bytes is read as utf-8
        raw = _page('<meta charset="utf-16">', b"caf\xc3\xa9")
        assert sniff_encoding(raw) == ("utf-8", "meta")

    def test_unknown_label_falls_through(self):
        raw = _page('<meta charset="klingon-9">', b"plain ascii")
        assert sniff_encoding(raw) == ("utf-8", "utf8-valid")

    def test_prescan_window_is_bounded(self):
        # a declaration past the 1024-byte prescan window is not seen
        raw = b"<!doctype html><html><head>" + b" " * 1100 + \
            b'<meta charset="windows-1251"></head><body>ascii</body></html>'
        assert sniff_encoding(raw) == ("utf-8", "utf8-valid")

    def test_cp1251_content_decodes(self):
        raw = _page('<meta charset="windows-1251">', b"\xcf\xf0\xe8\xe2\xe5\xf2")
        text, codec, source = decode_html(raw)
        assert (codec, source) == ("windows-1251", "meta")
        assert "Привет" in text

    def test_shift_jis_content_decodes(self):
        raw = _page('<meta charset="shift_jis">', b"\x8c\xea")
        assert "語" in decode_html(raw)[0]

    def test_gbk_content_decodes(self):
        raw = _page("<meta charset=gb2312>", b"\xba\xc3")
        assert "好" in decode_html(raw)[0]


class TestFallbacks:
    def test_valid_utf8_no_meta(self):
        raw = _page("", "naïve café".encode("utf-8"))
        assert sniff_encoding(raw) == ("utf-8", "utf8-valid")

    def test_pure_ascii(self):
        assert sniff_encoding(_page("", b"plain")) == ("utf-8", "utf8-valid")

    def test_invalid_utf8_falls_back_to_cp1252(self):
        raw = _page("", b"r\xe9sum\xe9")          # latin-1 bytes
        codec, source = sniff_encoding(raw)
        assert (codec, source) == ("windows-1252", "fallback")
        assert "résumé" in decode_html(raw)[0]

    def test_truncated_multibyte_at_check_boundary_still_utf8(self):
        # a multi-byte char split exactly at the 4096-byte validation
        # cut must not flip the verdict to fallback
        filler = b"a" * 4095
        raw = filler + "é".encode("utf-8") + b"tail"
        assert sniff_encoding(raw)[0] == "utf-8"

    def test_empty_and_garbage_never_raise(self):
        assert decode_html(b"")[0] == ""
        text, codec, source = decode_html(bytes(range(256)) * 4)
        assert isinstance(text, str) and len(text) > 0

    def test_str_passthrough(self):
        assert decode_html("<p>x</p>") == ("<p>x</p>", "str", "str")


class TestLabels:
    def test_normalize_label_table(self):
        assert normalize_label("  UTF8 ") == "utf-8"
        assert normalize_label("latin1") == "windows-1252"
        assert normalize_label("ks_c_5601-1987") == "cp949"
        assert normalize_label("no-such-codec") == ""


class TestExtractionIntegration:
    def test_extract_document_sniffs_bytes(self):
        from lexor_spark.kernel.pipeline import extract_document
        raw = (b"<!doctype html><html><head>"
               b'<meta charset="windows-1251"></head>'
               b"<body><main><p>\xcf\xf0\xe8\xe2\xe5\xf2 world</p></main>"
               b"</body></html>")
        res = extract_document(raw, "u")
        assert res.ok
        assert "Привет world" in res.text

    def test_utf8_bytes_unchanged_vs_str(self):
        # valid-UTF-8 inputs keep the pinned pre-sniffing contract:
        # bytes and str paths emit byte-identical text
        from lexor_spark.kernel.pipeline import extract_document
        html = ("<!doctype html><html><body><main><p>naïve café — "
                "результат 結果</p></main></body></html>")
        assert extract_document(html.encode("utf-8"), "u").text == \
            extract_document(html, "u").text
