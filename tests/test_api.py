"""User-facing API tests mirroring the reference's document tests
(tests/document/image/test_image.py flow with the mocked-Tesseract hOCR)."""

from io import BytesIO

import pytest

REF = "/root/reference/tests"


@pytest.fixture(scope="module")
def mock_hocr():
    return open(f"{REF}/_mock_data/tesseract_hocr.html").read()


def test_validators():
    from img2table_ray.api import Image

    with pytest.raises(TypeError):
        Image(src=1)
    with pytest.raises(TypeError):
        Image(src="img", detect_rotation=3)


def test_load_image():
    from img2table_ray.api import Image

    p = f"{REF}/document/image/test_data/test.png"
    from_path = Image(src=p)
    from_bytes = Image(src=open(p, "rb").read())
    from_bytesio = Image(src=BytesIO(open(p, "rb").read()))
    assert from_path.bytes == from_bytes.bytes == from_bytesio.bytes
    assert from_path.images[0].shape == (417, 1365, 3)


def test_image_extract_tables(mock_hocr):
    from img2table_ray.api import HocrOCR, Image

    img = Image(src=f"{REF}/document/image/test_data/test.png", detect_rotation=True)
    result = img.extract_tables(ocr=HocrOCR([mock_hocr]), implicit_rows=True,
                                min_confidence=50)
    assert len(result) == 2
    assert (result[0].bbox.x1, result[0].bbox.y1,
            result[0].bbox.x2, result[0].bbox.y2) == (36, 21, 770, 327)
    assert (result[0].nb_rows, result[0].nb_columns) == (6, 3)
    assert (result[1].nb_rows, result[1].nb_columns) == (2, 2)


def test_image_to_xlsx(mock_hocr):
    from img2table_ray.api import HocrOCR, Image
    from img2table_ray.core.xlsx import read_xlsx_values

    img = Image(src=f"{REF}/document/image/test_data/test.png", detect_rotation=True)
    buf = img.to_xlsx(BytesIO(), ocr=HocrOCR([mock_hocr]), implicit_rows=True,
                      min_confidence=50)
    got = read_xlsx_values(buf.read())
    exp = read_xlsx_values(open(f"{REF}/document/image/test_data/expected.xlsx", "rb").read())
    assert list(got) == list(exp)
    for name in exp:
        assert got[name] == exp[name], name


def test_multipage_document():
    from img2table_ray.api import MultiPageDocument
    from img2table_ray.extract.pdf import encode_mpng
    from img2table_ray.imgops.png import encode_png
    from img2table_ray.sources.pages import synth_table_image

    pages_png = []
    for k in range(3):
        g, _ = synth_table_image(3, 3, 10 + k)
        pages_png.append(encode_png(g))
    doc = MultiPageDocument(src=encode_mpng(pages_png))
    tables = doc.extract_tables()
    assert sorted(tables) == [0, 1, 2]
    assert all(len(v) == 1 and (v[0].nb_rows, v[0].nb_columns) == (3, 3)
               for v in tables.values())

    # page selection remaps output keys (ref base/__init__.py:138-140)
    sel = MultiPageDocument(src=encode_mpng(pages_png), pages=[2, 0])
    tables_sel = sel.extract_tables()
    assert sorted(tables_sel) == [0, 2]
