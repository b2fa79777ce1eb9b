"""PDF kernel + job tests: round-trip, both codec paths, hostile input."""

from __future__ import annotations

from lexor_spark.kernel.pdftext import build_simple_pdf, extract_pdf_text
from lexor_spark.pdfjob import extract_pdfs, pdf_pages_df

SF = "/root/testdata/sf0.001"


def test_roundtrip_uncompressed():
    lines = ["Hello, world", "second line (with parens)", "back\\slash"]
    pdf = build_simple_pdf(lines, compress=False)
    res = extract_pdf_text(pdf)
    assert res.ok and res.n_pages == 1 and res.n_streams == 1
    assert res.text.splitlines() == lines


def test_roundtrip_flate():
    lines = ["compressed content", "ärger — latin-1 only"]
    pdf = build_simple_pdf(lines, compress=True)
    res = extract_pdf_text(pdf)
    assert res.ok
    got = res.text.splitlines()
    assert got[0] == "compressed content"
    # non-latin-1 chars were replaced at build time (documented contract)
    assert "rger" in got[1]


def test_hex_strings_and_tj_arrays():
    content = (b"BT /F1 11 Tf (AB) Tj 0 -14 Td "
               b"[(kerned) -250 (words)] TJ ET")
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n")
    res = extract_pdf_text(pdf)
    assert res.ok
    assert "AB" in res.text
    assert "kerned words" in res.text  # big negative kern became a space


def test_hostile_inputs_never_raise():
    for blob in (b"", b"not a pdf", b"%PDF-1.4 garbage",
                 b"%PDF-1.4\nstream\n\xff\xfe\nendstream",
                 build_simple_pdf(["x"])[:-40]):
        res = extract_pdf_text(blob)
        assert res.ok or res.err


def test_pdf_job_end_to_end(spark):
    pdfs = pdf_pages_df(spark, SF)
    out = extract_pdfs(pdfs, partitions=8)
    rows = out.collect()
    assert len(rows) == 500
    assert all(r.ok for r in rows)
    assert all(r.n_pages == 1 for r in rows)
    # extracted text contains the document header line and real content
    docs = {r.url: r for r in rows}
    some = next(iter(docs.values()))
    assert some.text.startswith("Document ")
    # determinism: a second run yields identical text per url
    again = {r.url: r.text for r in extract_pdfs(pdfs, partitions=8).collect()}
    for url, r in docs.items():
        assert again[url] == r.text


# ---------------------------------------------------------------------------
# ToUnicode CMap (simple fonts) — VERDICT r1 item #10
# ---------------------------------------------------------------------------

def test_cmap_bfchar_decode():
    from lexor_spark.kernel.pdftext import build_cmap_pdf
    mapping = {0x41: "Α", 0x42: "β", 0x65: "é"}
    r = extract_pdf_text(build_cmap_pdf(["AB test e"], mapping))
    assert r.ok and r.text == "Αβ tést é\n"
    # uncompressed CMap + content too
    r2 = extract_pdf_text(build_cmap_pdf(["Ae"], mapping, compress=False))
    assert r2.ok and r2.text == "Αé\n"


def test_cmap_unmapped_bytes_fall_back_latin1():
    from lexor_spark.kernel.pdftext import build_cmap_pdf
    r = extract_pdf_text(build_cmap_pdf(["Az"], {0x41: "Ω"}))
    assert r.text == "Ωz\n"


def test_cmap_multichar_target():
    """A subset ligature code expanding to several unicode chars."""
    from lexor_spark.kernel.pdftext import build_cmap_pdf
    r = extract_pdf_text(build_cmap_pdf(["X"], {0x58: "ffi"}))
    assert r.text == "ffi\n"


def test_cmap_bfrange_parsing():
    from lexor_spark.kernel.pdftext import _parse_cmap
    stream = (b"begincmap\n"
              b"2 beginbfrange\n"
              b"<41> <43> <0391>\n"          # A..C -> Alpha..Gamma
              b"<61> <62> [<00E9> <00E8>]\n"  # a,b -> e-acute, e-grave
              b"endbfrange\nendcmap")
    cmap = _parse_cmap(stream)
    assert cmap.width == 1
    m = cmap.map
    assert m[0x41] == "Α" and m[0x42] == "Β" and m[0x43] == "Γ"
    assert m[0x61] == "é" and m[0x62] == "è"


def test_cmap_absent_is_latin1_identical():
    """PDFs without ToUnicode must behave exactly as before."""
    pdf = build_simple_pdf(["plain latin-1 café"])
    r = extract_pdf_text(pdf)
    assert r.ok and r.text == "plain latin-1 café\n"


# ---------------------------------------------------------------------------
# Type0/CID 2-byte fonts (Identity-H + 2-byte ToUnicode CMap)
# ---------------------------------------------------------------------------

def test_cid_font_roundtrip():
    """Non-Latin text through a 2-byte Identity-H subset font — the
    layout every modern PDF producer emits."""
    from lexor_spark.kernel.pdftext import build_cid_pdf
    lines = ["Привет мир", "日本語テキスト", "mixed lätin + ελληνικά"]
    r = extract_pdf_text(build_cid_pdf(lines))
    assert r.ok and r.text.splitlines() == lines
    r2 = extract_pdf_text(build_cid_pdf(lines, compress=False))
    assert r2.ok and r2.text.splitlines() == lines


def test_cid_cmap_width_detection():
    from lexor_spark.kernel.pdftext import _parse_cmap
    stream = (b"begincmap\n"
              b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
              b"2 beginbfchar\n<0001> <0416>\n<0002> <0436>\nendbfchar\n"
              b"1 beginbfrange\n<0010> <0012> <0391>\nendbfrange\n"
              b"endcmap")
    cmap = _parse_cmap(stream)
    assert cmap.width == 2
    assert cmap.map[0x0001] == "Ж" and cmap.map[0x0002] == "ж"
    assert cmap.map[0x0010] == "Α" and cmap.map[0x0012] == "Γ"


def test_cid_width_inferred_without_codespacerange():
    """Some producers omit codespacerange — width falls back to the
    first bfchar source length."""
    from lexor_spark.kernel.pdftext import _parse_cmap
    stream = (b"begincmap\n"
              b"1 beginbfchar\n<0003> <042F>\nendbfchar\nendcmap")
    cmap = _parse_cmap(stream)
    assert cmap.width == 2 and cmap.map[0x0003] == "Я"


def test_cid_unmapped_and_odd_trailing_byte():
    """Unmapped 2-byte CIDs are U+FFFD (glyph ids have no public
    meaning); a trailing odd byte is ignored, never a crash."""
    from lexor_spark.kernel.pdftext import CMap, _to_text
    cm = CMap(2)
    cm.map = {1: "A"}
    assert _to_text(b"\x00\x01\x00\x02", cm) == "A�"
    assert _to_text(b"\x00\x01\x7f", cm) == "A"


def test_cid_bfrange_expansion_capped():
    """A malformed giant bfrange must not OOM the executor: expansion
    is capped, parse still succeeds."""
    from lexor_spark.kernel.pdftext import _MAX_BFRANGE, _parse_cmap
    stream = (b"begincmap\n"
              b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
              b"1 beginbfrange\n<0000> <FFFF> <0041>\nendbfrange\nendcmap")
    cmap = _parse_cmap(stream)
    assert len(cmap.map) <= _MAX_BFRANGE + 1
    assert cmap.map[0x0000] == "A"


def test_cli_pdf_routing(tmp_path, capsys):
    """L2 extension→language defaults (reference command/to.py): .pdf
    (or %PDF- magic) routes through the PDF kernel; non-text targets
    are rejected; --width wraps the flat text."""
    from lexor_spark.__main__ import main
    from lexor_spark.kernel.pdftext import build_simple_pdf

    words = " ".join(f"tok{i}" for i in range(30))
    f = tmp_path / "doc.pdf"
    f.write_bytes(build_simple_pdf([words]))

    assert main([str(f), "to", "text"]) == 0
    out = capsys.readouterr().out
    assert "tok0" in out and "tok29" in out

    assert main([str(f), "to", "markdown"]) == 2

    assert main([str(f), "to", "text", "--width", "20"]) == 0
    wrapped = capsys.readouterr().out
    assert all(len(ln) <= 20 for ln in wrapped.strip().split("\n"))


def test_wrap_text_helper():
    from lexor_spark.kernel.wrapwriter import wrap_text

    s = "aaa bbb ccc ddd eee\n\nsecond para here"
    out = wrap_text(s, width=8, indent="> ")
    lines = out.split("\n")
    assert all(ln.startswith("> ") or ln == "" for ln in lines)
    assert all(len(ln) <= 8 for ln in lines)
