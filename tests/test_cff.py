"""CFF (Type1C) parser + Type 2 charstring interpreter tests.

The live corpus: the reference fixture test.pdf embeds four subset
MyriadPro CFF fonts (FontFile3).  Assertions pin structural facts that
a mis-parse cannot fake: glyph counts, charset names, contour counts
and em-box-plausible extents for known glyphs, and the encoding
routing used by the rasterizer.
"""

import pytest

from img2table_ray.extract.cff import CffError, CffFont
from img2table_ray.extract.pdftext import PdfDocument, _Stream
from img2table_ray.fixtures import fixture_bytes


@pytest.fixture(scope="module")
def fonts():
    doc = PdfDocument(fixture_bytes("test.pdf"))
    page = doc.pages()[0]
    res = doc.resolve(doc.resolve(page.get("Resources"))["Font"])
    out = {}
    for name, f in res.items():
        fd = doc.resolve(f)
        desc = doc.resolve(fd.get("FontDescriptor"))
        st = doc.resolve(desc["FontFile3"])
        assert isinstance(st, _Stream)
        out[str(fd.get("BaseFont"))] = CffFont(st.decoded())
    return out


def test_fixture_fonts_parse(fonts):
    assert len(fonts) == 4
    reg = fonts["RZRBND+MyriadPro-Regular"]
    assert len(reg.charstrings) == 39
    assert reg.glyph_names[0] == ".notdef"
    for name in ("space", "percent", "zero", "a", "e"):
        assert name in reg.gid_of, name


def _extent(outline):
    pts = [(seg[i], seg[i + 1]) for cont in outline for seg in cont
           for i in range(1, len(seg) - 1, 2)]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return min(xs), min(ys), max(xs), max(ys)


def test_glyph_outlines_plausible(fonts):
    reg = fonts["RZRBND+MyriadPro-Regular"]
    a = reg.glyph_by_name("a")
    assert len(a) == 2  # bowl + counter
    x0, y0, x1, y1 = _extent(a)
    # x-height glyph in a 1000-unit em: no descender, no ascender
    assert -60 < y0 < 20 and 380 < y1 < 560
    assert 0 < x0 < 100 and 300 < x1 < 600
    zero = reg.glyph_by_name("zero")
    assert len(zero) == 2
    pct = reg.glyph_by_name("percent")
    assert len(pct) == 5  # two rings with counters + slash
    assert reg.glyph_by_name("space") == []  # marking-free
    assert reg.glyph_by_name("nosuchglyph") is None


def test_bold_italic_variant_differs(fonts):
    reg = fonts["RZRBND+MyriadPro-Regular"]
    boldit = fonts["ACIANK+MyriadPro-BoldIt"]
    # italic 'a' leans: its extent is wider than the upright one
    _, _, x1r, _ = _extent(reg.glyph_by_name("a"))
    _, _, x1b, _ = _extent(boldit.glyph_by_name("a"))
    assert x1b > x1r


def test_cid_keyed_rejected():
    # minimal header + a Top DICT containing ROS (op 12 30) -> CID
    import struct

    def index(items):
        if not items:
            return struct.pack(">H", 0)
        out = struct.pack(">HB", len(items), 1)
        off = 1
        offs = [off]
        for it in items:
            off += len(it)
            offs.append(off)
        return out + bytes(offs) + b"".join(items)

    top = bytes([139, 139, 139, 12, 30])  # three SIDs + ROS op
    data = bytes([1, 0, 4, 1]) + index([b"F"]) + index([top]) + index([]) + index([])
    with pytest.raises(CffError):
        CffFont(data)
