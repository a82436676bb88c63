"""PDF / OCR text extraction — S2 (text layer), S3 (OCR fallback),
S4 (word boxes).

Reference: lib/pipeline_runner.py:23-42,59-82; lib/ocr_utils.py:17-34.

These are the only operators in the engine that *must* run Python (they
wrap pdfplumber / pytesseract). They are Arrow-batched ``mapInPandas``
transforms: one Python worker per partition, content bytes → text lines,
so extraction parallelism equals input-split parallelism — the right shape
for a 1000-executor scan of binary files.

The container for this repo does not ship pdfplumber/pytesseract (SURVEY
§7.3(c)): both engines are import-gated. Since round 6 the S2 text layer
no longer needs them — real ``%PDF-`` bytes go through the pure-stdlib
extractor in ``sources/pdf_text.py`` (zlib FlateDecode + BT/ET text-
operator interpretation; validated over the reference's full 99-PDF
corpus), with pdfplumber still preferred when present. The UTF-8 stub
remains only for fixture corpora written as .txt-in-.pdf; S3/S4 OCR of
image-only scans still requires pytesseract and keeps its stub.

Deliberate divergence from the reference, per SURVEY §7.3(d): the OCR
fallback for image-only PDFs (S3) is *wired in* here — the reference
defines it but never calls it, so "Bids As Read" scans silently produced
empty text.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not in this container
    import pdfplumber  # type: ignore

    HAVE_PDFPLUMBER = True
except ImportError:
    pdfplumber = None
    HAVE_PDFPLUMBER = False

try:  # pragma: no cover - not in this container
    import pytesseract  # type: ignore
    from PIL import Image  # type: ignore

    HAVE_TESSERACT = True
except ImportError:
    pytesseract = None
    HAVE_TESSERACT = False


def _stub_decode(content: bytes | None) -> list[str]:
    """Deterministic fallback: treat bytes as UTF-8 text lines (used for
    fixture corpora written as .txt-in-.pdf and for environments without
    the PDF libraries)."""
    if content is None:
        return []
    try:
        text = bytes(content).decode("utf-8")
    except (UnicodeDecodeError, ValueError):
        return []
    return [l for l in text.splitlines() if l.strip()]


def _extract_pdf_lines(content: bytes | None) -> list[str]:
    """S2 + S3: text layer per page; pages with no text layer get OCR'd
    (the reference's dead fallback, lib/pipeline_runner.py:34-40, wired in)."""
    if not HAVE_PDFPLUMBER:
        from pdf_etl_pipeline_spark.sources.pdf_text import (
            extract_pdf_text_lines,
            looks_like_pdf,
        )

        if looks_like_pdf(content):
            return extract_pdf_text_lines(bytes(content))
        return _stub_decode(content)
    import io

    lines: list[str] = []
    with pdfplumber.open(io.BytesIO(content)) as pdf:  # pragma: no cover
        for page in pdf.pages:
            text = page.extract_text()
            if text:
                lines.extend(text.split("\n"))
            elif HAVE_TESSERACT:
                img = page.to_image(resolution=300).original
                lines.extend(pytesseract.image_to_string(img).split("\n"))
    return [l for l in lines if l.strip()]


def _try_bitmap_ocr(content: bytes | None) -> list[dict] | None:
    """Decode BMP/PNG/PPM bytes with the pure-numpy codecs and run the
    5×7 bitmap OCR; None when the payload is not a decodable bitmap
    (callers fall back to the stub)."""
    if not content:
        return None
    try:
        from pdf_etl_pipeline_spark.llmdata import multimodal as MM
        from pdf_etl_pipeline_spark.sources.ocr import ocr_bitmap

        raw = bytes(content)
        if raw.startswith(b"BM"):
            img = MM._decode_bmp(raw)
        elif raw.startswith(b"\x89PNG"):
            img = MM._decode_png(raw)
        elif raw[:2] in (b"P5", b"P6"):
            img = MM._decode_ppm(raw)
        else:
            return None
        return ocr_bitmap(img)
    except Exception:
        return None  # corrupt/unsupported bitmap -> stub path


def _extract_image_words(content: bytes | None) -> list[dict]:
    """S4: word boxes [x0,y0,x2,y2,word] — tesseract when present; for
    real decodable bitmaps (BMP/PNG/PPM) the in-container deterministic
    bitmap OCR (sources/ocr.py) runs on the actual pixels; otherwise the
    documented synthetic stub."""
    if not HAVE_TESSERACT:
        real = _try_bitmap_ocr(content)
        if real is not None:
            return real
        out = []
        for y, line in enumerate(_stub_decode(content)):
            x = 0
            for tok in line.split():
                out.append({"x0": x, "y0": y * 20, "x2": x + 8 * len(tok), "y2": y * 20 + 10, "word": tok})
                x += 8 * len(tok) + 8
        return out
    import io  # pragma: no cover

    img = Image.open(io.BytesIO(content))  # pragma: no cover
    data = pytesseract.image_to_data(img, output_type=pytesseract.Output.DATAFRAME)
    data = data.dropna(subset=["text"])
    return [
        {
            "x0": int(r.left),
            "y0": int(r.top),
            "x2": int(r.left + r.width),
            "y2": int(r.top + r.height),
            "word": str(r.text),
        }
        for r in data.itertuples()
    ]


EXTRACT_SCHEMA = "path string, lines array<string>"
WORDS_SCHEMA = (
    "path string, words array<struct<x0:int, y0:int, x2:int, y2:int, word:string>>"
)


def extract_text_lines(corpus: DataFrame) -> DataFrame:
    """(path, content, ext) → (path, lines[]) for PDFs; Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            yield pd.DataFrame(
                {
                    "path": pdf_batch["path"],
                    "lines": pdf_batch["content"].map(_extract_pdf_lines),
                }
            )

    return corpus.select("path", "content").mapInPandas(run, EXTRACT_SCHEMA)


def extract_word_boxes(corpus: DataFrame) -> DataFrame:
    """(path, content) → exploded word-box rows (FIXTURES.md §3 schema),
    ready for ``operators.sessionize.group_ocr_words``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            yield pd.DataFrame(
                {
                    "path": pdf_batch["path"],
                    "words": pdf_batch["content"].map(_extract_image_words),
                }
            )

    nested = corpus.select("path", "content").mapInPandas(run, WORDS_SCHEMA)
    w = F.explode("words")
    return nested.select(F.col("path").alias("filename"), w.alias("w")).select(
        "filename",
        F.col("w.x0").alias("x0"),
        F.col("w.y0").alias("y0"),
        F.col("w.x2").alias("x2"),
        F.col("w.y2").alias("y2"),
        F.col("w.word").alias("line"),
    )


def visualize_bboxes_svg(words: "DataFrame") -> "DataFrame":
    """T13 (reference lib/ocr_utils.py:37-85): debug overlay of OCR word
    boxes — re-expressed as data: one SVG document per image, generated
    natively (concat of <rect>/<text> elements in reading order)."""
    from pyspark.sql import functions as F

    rect = F.format_string(
        '<rect x="%d" y="%d" width="%d" height="%d" fill="none" stroke="red"/>'
        '<text x="%d" y="%d" font-size="8">%s</text>',
        F.col("x0"),
        F.col("y0"),
        F.col("x2") - F.col("x0"),
        F.col("y2") - F.col("y0"),
        F.col("x0"),
        F.col("y2"),
        F.col("line"),
    )
    per_word = words.select("filename", F.struct("y0", "x0").alias("ord"), rect.alias("r"))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("ord", "r"))), lambda s: s["r"]
    )
    return per_word.groupBy("filename").agg(
        F.concat(
            F.lit('<svg xmlns="http://www.w3.org/2000/svg">'),
            F.array_join(ordered, ""),
            F.lit("</svg>"),
        ).alias("svg")
    )
