"""Cloud / local-ML OCR adapters: response -> word-record converters.

The reference ships ten OCR engines; seven of them wrap an external
service or ML model (ref: src/img2table/ocr/google_vision.py,
aws_textract.py, azure.py, paddle.py, easyocr.py, doctr.py, surya.py).
The services and model weights are out of scope in this container, but
each adapter's *response parser* — the code that turns an engine's raw
response into the hOCR-style word table — is pure Python and fully
testable offline against the reference's own canned-response fixtures
(ref tests/ocr/*/test_data/*, tests/_mock_data/*).

Each adapter here:

- validates constructor arguments with the same TypeError/ValueError
  contract as the reference, then raises ``ModuleNotFoundError`` when the
  backing SDK is absent (identical behavior to the reference on a machine
  without the optional extra installed);
- exposes the converter as a static/class method over plain data
  (``map_response`` / ``to_word_records``) so pre-fetched responses can
  be parsed without the SDK — this is also the shape a Ray actor-pool
  stage would use: fetch once, convert per batch;
- implements ``to_ocr_words(content) -> OCRWords`` feeding the same
  word schema (WORD_COLUMNS) the rest of the engine consumes.

Word records follow the reference's semantics exactly, including quirks
(Vision's break/hyphen handling, Textract's child-relationship parenting,
Paddle's float confidences, EasyOCR's bankers' rounding) — pinned by
tests/test_ocr_engines.py against the reference's ocr_df.csv goldens.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from img2table_ray.api import OCRInstance


def _require(module: str, extra: str) -> None:
    """Raise the reference's ModuleNotFoundError message when an optional
    SDK is missing (ref ocr/aws_textract.py:26-29 et al.)."""
    import importlib.util

    if importlib.util.find_spec(module.split(".")[0]) is None:
        raise ModuleNotFoundError(
            f"Missing dependencies, please install '{extra}' to use this class.")


def _to_ocr_words(records: list[dict]):
    from img2table_ray.extract.content import OCRWords

    return OCRWords.from_records(records)


class TextractOCR(OCRInstance):
    """AWS Textract adapter (ref ocr/aws_textract.py:13-106).

    ``map_response`` parses a ``detect_document_text`` response dict:
    WORD blocks become word records; parents come from walking every
    block's CHILD relationships (LINE blocks list their word ids), and
    the ratio geometry is scaled to pixel space by the page size.
    """

    def __init__(self, aws_access_key_id: Optional[str] = None,
                 aws_secret_access_key: Optional[str] = None,
                 aws_session_token: Optional[str] = None,
                 region: Optional[str] = None) -> None:
        _require("boto3", "img2table[aws]")
        import boto3

        creds = [aws_access_key_id, aws_secret_access_key, aws_session_token]
        if not any(v is None for v in creds):
            self.client = boto3.client(
                service_name="textract", aws_access_key_id=aws_access_key_id,
                aws_secret_access_key=aws_secret_access_key,
                aws_session_token=aws_session_token, region_name=region)
        else:
            self.client = boto3.client(service_name="textract", region_name=region)

    @staticmethod
    def map_response(response: dict, width: int, height: int,
                     page: int = 0) -> list[dict]:
        children: dict[str, str] = {}
        words = []
        for block in response.get("Blocks", []):
            for rel in block.get("Relationships", []):
                if rel.get("Type") == "CHILD":
                    for child in rel.get("Ids", []):
                        children[child] = block.get("Id")
            if block.get("BlockType") != "WORD":
                continue
            poly = block.get("Geometry", {}).get("Polygon", [])
            xs = [pt.get("X") for pt in poly]
            ys = [pt.get("Y") for pt in poly]
            words.append({
                "page": page,
                "class": "ocrx_word",
                "id": block.get("Id"),
                "parent": children.get(block.get("Id")),
                "value": block.get("Text"),
                "confidence": round(block.get("Confidence", 0)),
                "x1": round(min(xs) * width), "x2": round(max(xs) * width),
                "y1": round(min(ys) * height), "y2": round(max(ys) * height),
            })
        return words

    def content(self, document) -> list[list[dict]]:
        pages = []
        for page, image in enumerate(document.images):
            from img2table_ray.imgops.png import encode_png

            data = encode_png(np.ascontiguousarray(image))
            resp = self.client.detect_document_text(Document={"Bytes": data})
            h, w = image.shape[:2]
            pages.append(self.map_response(resp, width=w, height=h, page=page))
        return pages

    @classmethod
    def to_ocr_words(cls, content: list[list[dict]]):
        return _to_ocr_words([w for page in content for w in page])

    def of(self, document):
        return self.to_ocr_words(self.content(document))


class VisionOCR(OCRInstance):
    """Google Vision adapter (ref ocr/google_vision.py).

    Two response shapes exist — the REST endpoint's JSON
    (``map_endpoint_response``, ref VisionEndpointContent.map_response)
    and the client library's proto objects (``map_api_response``, ref
    VisionAPIContent.map_response).  Both walk
    blocks -> paragraphs -> words -> symbols, synthesize line ids from
    detected breaks (EOL_SURE_SPACE / LINE_BREAK increment the line,
    HYPHEN increments AND appends '-' to the word), and substitute a
    missing vertex coordinate with whichever image edge is nearer to the
    mean of the present ones.
    """

    def __init__(self, api_key: Optional[str] = None, timeout: int = 15) -> None:
        import os

        if not (isinstance(api_key, str) or api_key is None):
            raise TypeError(f"Invalid type {type(api_key)} for api_key argument")
        gcp_credentials = os.getenv("GOOGLE_APPLICATION_CREDENTIALS")
        if gcp_credentials is None and api_key is None:
            raise ValueError(
                "The GOOGLE_APPLICATION_CREDENTIALS environment variable should "
                "be set if no API key is provided")
        self.api_key = api_key
        self.timeout = timeout
        self.use_client = gcp_credentials is not None
        if self.use_client:
            _require("google.cloud", "img2table[gcp]")

    # -- shared word walk ------------------------------------------------
    @staticmethod
    def _word_records(pages_blocks, page: int, width: int, height: int,
                      get) -> list[dict]:
        """``get(obj, key)`` abstracts dict vs attribute access so the
        endpoint-JSON and proto walks share one implementation."""
        elements = []
        for id_block, block in enumerate(pages_blocks):
            for id_par, par in enumerate(get(block, "paragraphs") or []):
                id_line = 0
                for id_word, word in enumerate(get(par, "words") or []):
                    vertices = get(get(word, "boundingBox"), "vertices")
                    xs_present = [get(v, "x") for v in vertices if get(v, "x")]
                    ys_present = [get(v, "y") for v in vertices if get(v, "y")]
                    x_repl = min((0, width),
                                 key=lambda val: abs(val - float(np.mean(xs_present))))
                    y_repl = min((0, height),
                                 key=lambda val: abs(val - float(np.mean(ys_present))))
                    xs = [get(v, "x") or x_repl for v in vertices]
                    ys = [get(v, "y") or y_repl for v in vertices]
                    symbols = get(word, "symbols")
                    d_el = {
                        "page": page,
                        "class": "ocrx_word",
                        "id": f"word_{id_block}_{id_par}_{id_line}_{id_word}",
                        "parent": f"line_{id_block}_{id_par}_{id_line}",
                        "value": "".join(get(s, "text") for s in symbols),
                        "confidence": round(100 * get(word, "confidence")),
                        "x1": min(xs), "x2": max(xs),
                        "y1": min(ys), "y2": max(ys),
                    }
                    brk = get(get(get(symbols[-1], "property"), "detectedBreak"),
                              "type")
                    if brk in ("EOL_SURE_SPACE", "LINE_BREAK"):
                        id_line += 1
                    elif brk == "HYPHEN":
                        id_line += 1
                        d_el["value"] += "-"
                    elements.append(d_el)
        return elements

    @staticmethod
    def map_endpoint_response(response: dict, page: int, width: int,
                              height: int) -> list[dict]:
        """REST-endpoint JSON response for one image."""

        def get(obj, key):
            return (obj or {}).get(key)

        blocks = response["responses"][0]["fullTextAnnotation"]["pages"][0]["blocks"]
        return VisionOCR._word_records(blocks, page, width, height, get)

    @staticmethod
    def map_api_response(response: Any,
                         shapes: list[tuple[int, int]]) -> list[list[dict]]:
        """Client-library response object covering all pages; ``shapes``
        is [(height, width), ...] per image."""
        attr_names = {"boundingBox": "bounding_box", "detectedBreak": "detected_break"}

        def get(obj, key):
            if obj is None:
                return None
            val = getattr(obj, attr_names.get(key, key), None)
            if key == "type" and val is not None and not isinstance(val, str):
                val = getattr(val, "name", val)  # proto enum -> name string
            return val

        pages = []
        for id_page, resp in enumerate(get(response, "responses")):
            height, width = shapes[id_page]
            blocks = get(get(get(resp, "full_text_annotation"), "pages")[0], "blocks")
            pages.append(VisionOCR._word_records(blocks, id_page, width, height, get))
        return pages

    def content(self, document) -> list[list[dict]]:
        _require("requests" if not self.use_client else "google.cloud",
                 "img2table[gcp]")
        raise ModuleNotFoundError(
            "Missing dependencies, please install 'img2table[gcp]' to use this class.")

    @classmethod
    def to_ocr_words(cls, content: list[list[dict]]):
        return _to_ocr_words([w for page in content for w in page])

    def of(self, document):
        return self.to_ocr_words(self.content(document))


class AzureOCR(OCRInstance):
    """Azure Cognitive Services Read adapter (ref ocr/azure.py:18-123).

    ``to_word_records`` walks a list of ReadOperationResult-shaped
    objects (attribute access: ``.analyze_result.read_results[].lines[]
    .words[]``); counters are 1-based and — reference quirk preserved —
    the parent id uses the ``word_`` prefix with the line counter.
    """

    def __init__(self, endpoint: Optional[str] = None,
                 subscription_key: Optional[str] = None) -> None:
        import os

        if not (isinstance(endpoint, str) or endpoint is None):
            raise TypeError(f"Invalid type {type(endpoint)} for endpoint argument")
        endpoint = endpoint or os.getenv("COMPUTER_VISION_ENDPOINT")
        if endpoint is None:
            raise ValueError(
                "The COMPUTER_VISION_ENDPOINT environment variable should be set "
                "if no endpoint is provided")
        if not (isinstance(subscription_key, str) or subscription_key is None):
            raise TypeError(
                f"Invalid type {type(subscription_key)} for endpoint argument")
        subscription_key = subscription_key or os.getenv(
            "COMPUTER_VISION_SUBSCRIPTION_KEY")
        if subscription_key is None:
            raise ValueError(
                "The COMPUTER_VISION_SUBSCRIPTION_KEY environment variable should "
                "be set if no API key is provided")
        _require("azure.cognitiveservices.vision.computervision",
                 "img2table[azure]")

    @staticmethod
    def to_word_records(content: list[Any]) -> list[dict]:
        records = []
        for page, result in enumerate(content):
            line_cnt = 0
            word_cnt = 0
            for read_result in result.analyze_result.read_results:
                for line in read_result.lines:
                    line_cnt += 1
                    for word in line.words:
                        word_cnt += 1
                        bbox = [int(v) for v in word.bounding_box]
                        records.append({
                            "page": page,
                            "class": "ocrx_word",
                            "id": f"word_{page + 1}_{word_cnt}",
                            "parent": f"word_{page + 1}_{line_cnt}",
                            "value": word.text,
                            "confidence": round(100 * word.confidence),
                            "x1": min(bbox[::2]), "x2": max(bbox[::2]),
                            "y1": min(bbox[1::2]), "y2": max(bbox[1::2]),
                        })
        return records

    def content(self, document) -> list[Any]:
        raise ModuleNotFoundError(
            "Missing dependencies, please install 'img2table[azure]' to use this class.")

    @classmethod
    def to_ocr_words(cls, content: list[Any]):
        return _to_ocr_words(cls.to_word_records(content))

    def of(self, document):
        return self.to_ocr_words(self.content(document))


class PaddleOCR(OCRInstance):
    """PaddleOCR adapter (ref ocr/paddle.py).  Two response generations:

    - v2 (ref PaddleOCR2.to_ocr_dataframe): per page a list of
      ``[bbox(4 points), (text, confidence)]`` pairs;
    - v3 (ref PaddleOCR3.to_ocr_dataframe): per page a dict with
      ``rec_texts`` / ``rec_scores`` / ``rec_boxes`` (xyxy boxes).

    ``to_word_records`` dispatches on the page shape.  The reference
    computes ``100 * score`` as a float and then casts the frame through
    its Int64 pl_schema (ref ocr/base.py:12-22), which truncates — so the
    records here truncate to int to match the final table.
    """

    def __init__(self, lang: str = "en", kw: Optional[dict] = None) -> None:
        if not isinstance(lang, str):
            raise TypeError(f"Invalid type {type(lang)} for lang argument")
        self.lang = lang
        _require("paddleocr", "img2table[paddle]")

    @staticmethod
    def to_word_records(content: list[Any]) -> list[dict]:
        records = []
        for page, ocr_result in enumerate(content):
            if isinstance(ocr_result, dict):  # v3
                rows = zip(ocr_result["rec_texts"], ocr_result["rec_scores"],
                           ocr_result["rec_boxes"])
                for idx, (text, score, bbox) in enumerate(rows):
                    records.append({
                        "page": page,
                        "class": "ocrx_word",
                        "id": f"word_{page + 1}_{idx + 1}",
                        "parent": f"word_{page + 1}_{idx + 1}",
                        "value": text,
                        "confidence": int(100 * score),
                        "x1": int(bbox[0]), "y1": int(bbox[1]),
                        "x2": int(bbox[2]), "y2": int(bbox[3]),
                    })
            else:  # v2
                for idx, (bbox, word) in enumerate(ocr_result):
                    records.append({
                        "page": page,
                        "class": "ocrx_word",
                        "id": f"word_{page + 1}_{idx + 1}",
                        "parent": f"word_{page + 1}_{idx + 1}",
                        "value": word[0],
                        "confidence": int(100 * word[1]),
                        "x1": round(min(pt[0] for pt in bbox)),
                        "y1": round(min(pt[1] for pt in bbox)),
                        "x2": round(max(pt[0] for pt in bbox)),
                        "y2": round(max(pt[1] for pt in bbox)),
                    })
        return records

    def content(self, document) -> list[Any]:
        raise ModuleNotFoundError(
            "Missing dependencies, please install 'img2table[paddle]' to use this class.")

    @classmethod
    def to_ocr_words(cls, content: list[Any]):
        return _to_ocr_words(cls.to_word_records(content))

    def of(self, document):
        return self.to_ocr_words(self.content(document))


class EasyOCR(OCRInstance):
    """EasyOCR adapter (ref ocr/easyocr.py:10-69).  Response: per page a
    list of ``[bbox(4 points), text, confidence]`` triples."""

    def __init__(self, lang: Optional[list[str]] = None,
                 kw: Optional[dict] = None) -> None:
        lang = lang or ["en"]
        if not isinstance(lang, list):
            raise TypeError(f"Invalid type {type(lang)} for lang argument")
        self.lang = lang
        _require("easyocr", "img2table[easyocr]")

    @staticmethod
    def to_word_records(content: list[Any]) -> list[dict]:
        records = []
        for page, ocr_result in enumerate(content):
            for idx, word in enumerate(ocr_result):
                bbox, text, conf = word[0], word[1], word[2]
                records.append({
                    "page": page,
                    "class": "ocrx_word",
                    "id": f"word_{page + 1}_{idx + 1}",
                    "parent": f"word_{page + 1}_{idx + 1}",
                    "value": text,
                    "confidence": round(100 * conf),
                    "x1": round(min(pt[0] for pt in bbox)),
                    "y1": round(min(pt[1] for pt in bbox)),
                    "x2": round(max(pt[0] for pt in bbox)),
                    "y2": round(max(pt[1] for pt in bbox)),
                })
        return records

    def content(self, document) -> list[Any]:
        raise ModuleNotFoundError(
            "Missing dependencies, please install 'img2table[easyocr]' to use this class.")

    @classmethod
    def to_ocr_words(cls, content: list[Any]):
        return _to_ocr_words(cls.to_word_records(content))

    def of(self, document):
        return self.to_ocr_words(self.content(document))


class DocTR(OCRInstance):
    """docTR adapter (ref ocr/doctr.py:13-69).  Response: a docTR
    Document (attribute access: ``.pages[].blocks[].lines[].words[]``)
    with ratio geometry scaled by ``page.dimensions``.  Reference quirks
    preserved: the word counter runs document-page-wide while the line id
    resets per block, and both land in the ``id`` string."""

    def __init__(self, detect_language: bool = False,
                 kw: Optional[dict] = None) -> None:
        try:
            from doctr.models import ocr_predictor  # noqa: F401
        except ModuleNotFoundError as err:
            raise ModuleNotFoundError(
                "Missing dependencies, please install doctr to use this class."
            ) from err

    @staticmethod
    def to_word_records(content: Any) -> list[dict]:
        records = []
        for page_id, page in enumerate(content.pages):
            height, width = page.dimensions
            word_id = 0
            for block in page.blocks:
                for line_id, line in enumerate(block.lines):
                    for word in line.words:
                        word_id += 1
                        (gx1, gy1), (gx2, gy2) = word.geometry
                        records.append({
                            "page": page_id,
                            "class": "ocrx_word",
                            "id": f"word_{page_id + 1}_{line_id}_{word_id}",
                            "parent": f"word_{page_id + 1}_{line_id}",
                            "value": word.value,
                            "confidence": round(100 * word.confidence),
                            "x1": round(gx1 * width), "y1": round(gy1 * height),
                            "x2": round(gx2 * width), "y2": round(gy2 * height),
                        })
        return records

    def content(self, document) -> Any:
        raise ModuleNotFoundError(
            "Missing dependencies, please install doctr to use this class.")

    @classmethod
    def to_ocr_words(cls, content: Any):
        return _to_ocr_words(cls.to_word_records(content))

    def of(self, document):
        return self.to_ocr_words(self.content(document))


class SuryaOCR(OCRInstance):
    """Surya adapter (ref ocr/surya.py:14-77).  Response: per page an
    OCRResult with ``.text_lines[]`` carrying text/confidence/bbox —
    lines, not words; the reference emits one record per line."""

    def __init__(self, langs: Optional[list[str]] = None) -> None:
        if not isinstance(langs, list):
            raise TypeError(f"Invalid type {type(langs)} for langs argument")
        if not all(isinstance(lng, str) for lng in langs):
            raise TypeError("All values should be strings for langs argument")
        self.langs = langs or ["en"]
        _require("surya", "img2table[surya]")

    @staticmethod
    def to_word_records(content: list[Any]) -> list[dict]:
        records = []
        for page_id, ocr_result in enumerate(content):
            for idx, text_line in enumerate(ocr_result.text_lines):
                records.append({
                    "page": page_id,
                    "class": "ocrx_word",
                    "id": f"word_{page_id + 1}_{idx + 1}_0",
                    "parent": f"word_{page_id + 1}_{idx + 1}",
                    "value": text_line.text,
                    "confidence": round(100 * text_line.confidence),
                    "x1": int(text_line.bbox[0]), "y1": int(text_line.bbox[1]),
                    "x2": int(text_line.bbox[2]), "y2": int(text_line.bbox[3]),
                })
        return records

    def content(self, document) -> list[Any]:
        raise ModuleNotFoundError(
            "Missing dependencies, please install 'img2table[surya]' to use this class.")

    @classmethod
    def to_ocr_words(cls, content: list[Any]):
        return _to_ocr_words(cls.to_word_records(content))

    def of(self, document):
        return self.to_ocr_words(self.content(document))
