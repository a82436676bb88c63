"""Deterministic bitmap OCR (S3/S4 real path, in-container).

The reference shells out to pytesseract (``lib/ocr_utils.py:17-34``),
which is absent here — but "OCR never actually executed" was the gap, not
tesseract itself. This module closes it the same way the pure-stdlib PDF
extractor closed S2: a real pixel-level implementation with no external
packages. It renders and recognizes a fixed 5×7 bitmap font:

- segmentation: ink-free pixel ROWS split lines; within a line, ink-free
  COLUMN runs ≥ the word gap split words; glyphs advance on a fixed
  6-px pitch (5 px glyph + 1 px spacing);
- recognition: each 5×7 glyph cell is matched against the font table by
  Hamming distance over the 35 binary pixels (exact for clean renders,
  nearest-neighbor under noise);
- output: the FIXTURES.md §3 word-box schema [x0, y0, x2, y2, word] that
  ``operators.sessionize.group_ocr_words`` consumes — the identical
  downstream path tesseract output takes.

This is NOT a general OCR (it reads its own font family, like any
template matcher); it is the real-execution proof for the Spark side:
real images in, pixel analysis in an Arrow-batched UDF, real word boxes
out, end-to-end against the real BMP/PNG codecs in llmdata/multimodal.
"""

from __future__ import annotations

import numpy as np

# 5x7 font: '#' = ink. Uppercase, digits, and the symbols the receipt
# fixtures use. Derived from the classic public-domain 5x7 LCD glyphs.
FONT = {
    "A": ".###.|#...#|#...#|#####|#...#|#...#|#...#",
    "B": "####.|#...#|#...#|####.|#...#|#...#|####.",
    "C": ".###.|#...#|#....|#....|#....|#...#|.###.",
    "D": "####.|#...#|#...#|#...#|#...#|#...#|####.",
    "E": "#####|#....|#....|####.|#....|#....|#####",
    "F": "#####|#....|#....|####.|#....|#....|#....",
    "G": ".###.|#...#|#....|#.###|#...#|#...#|.###.",
    "H": "#...#|#...#|#...#|#####|#...#|#...#|#...#",
    "I": ".###.|..#..|..#..|..#..|..#..|..#..|.###.",
    "J": "..###|...#.|...#.|...#.|...#.|#..#.|.##..",
    "K": "#...#|#..#.|#.#..|##...|#.#..|#..#.|#...#",
    "L": "#....|#....|#....|#....|#....|#....|#####",
    "M": "#...#|##.##|#.#.#|#.#.#|#...#|#...#|#...#",
    "N": "#...#|##..#|#.#.#|#..##|#...#|#...#|#...#",
    "O": ".###.|#...#|#...#|#...#|#...#|#...#|.###.",
    "P": "####.|#...#|#...#|####.|#....|#....|#....",
    "Q": ".###.|#...#|#...#|#...#|#.#.#|#..#.|.##.#",
    "R": "####.|#...#|#...#|####.|#.#..|#..#.|#...#",
    "S": ".####|#....|#....|.###.|....#|....#|####.",
    "T": "#####|..#..|..#..|..#..|..#..|..#..|..#..",
    "U": "#...#|#...#|#...#|#...#|#...#|#...#|.###.",
    "V": "#...#|#...#|#...#|#...#|#...#|.#.#.|..#..",
    "W": "#...#|#...#|#...#|#.#.#|#.#.#|##.##|#...#",
    "X": "#...#|#...#|.#.#.|..#..|.#.#.|#...#|#...#",
    "Y": "#...#|#...#|.#.#.|..#..|..#..|..#..|..#..",
    "Z": "#####|....#|...#.|..#..|.#...|#....|#####",
    "0": ".###.|#...#|#..##|#.#.#|##..#|#...#|.###.",
    "1": "..#..|.##..|..#..|..#..|..#..|..#..|.###.",
    "2": ".###.|#...#|....#|...#.|..#..|.#...|#####",
    "3": ".###.|#...#|....#|..##.|....#|#...#|.###.",
    "4": "...#.|..##.|.#.#.|#..#.|#####|...#.|...#.",
    "5": "#####|#....|####.|....#|....#|#...#|.###.",
    "6": ".###.|#....|#....|####.|#...#|#...#|.###.",
    "7": "#####|....#|...#.|..#..|.#...|.#...|.#...",
    "8": ".###.|#...#|#...#|.###.|#...#|#...#|.###.",
    "9": ".###.|#...#|#...#|.####|....#|....#|.###.",
    ".": ".....|.....|.....|.....|.....|.##..|.##..",
    "-": ".....|.....|.....|.###.|.....|.....|.....",
    "$": "..#..|.####|#.#..|.###.|..#.#|####.|..#..",
    "/": "....#|...#.|...#.|..#..|.#...|.#...|#....",
    ":": ".....|.##..|.##..|.....|.##..|.##..|.....",
    ",": ".....|.....|.....|.....|.##..|..#..|.#...",
    "@": ".###.|#...#|....#|.##.#|#.#.#|#.#.#|.###.",
    "%": "##..#|##..#|...#.|..#..|.#...|#..##|#..##",
}

GLYPH_W, GLYPH_H = 5, 7
PITCH = GLYPH_W + 1  # 1 px inter-glyph spacing
WORD_GAP = 4  # rendering: a space advances WORD_GAP + 1 px
LINE_GAP = 3  # >= this many ink-free rows separates lines
# The widest ink-free run INSIDE a word is 4 columns ('.' followed by a
# leading-blank glyph: 2 trailing blanks + 1 spacing + 1 leading blank);
# between words it is >= 5 (1 trailing + WORD_GAP+1 advance). Split at 5.
SPLIT_BLANKS = 5


def _glyph_array(ch: str) -> np.ndarray:
    rows = FONT[ch].split("|")
    return np.array([[c == "#" for c in row] for row in rows], dtype=bool)


_TABLE = {ch: _glyph_array(ch) for ch in FONT}


def render_text_image(lines: list[str], margin: int = 2, line_gap: int = LINE_GAP) -> np.ndarray:
    """Render lines of FONT-supported text to a float image in [0, 1]
    (1 = ink on 0 background) — the test-asset generator. ``line_gap``
    must be >= LINE_GAP for the decoder's line segmentation."""
    width = margin * 2 + max(
        (sum(PITCH if c != " " else WORD_GAP + 1 for c in ln) for ln in lines), default=0
    )
    height = margin * 2 + len(lines) * (GLYPH_H + line_gap)
    img = np.zeros((height, width), dtype=np.float64)
    for li, ln in enumerate(lines):
        y = margin + li * (GLYPH_H + line_gap)
        x = margin
        for ch in ln:
            if ch == " ":
                x += WORD_GAP + 1
                continue
            img[y : y + GLYPH_H, x : x + GLYPH_W] = _TABLE[ch.upper()]
            x += PITCH
    return img


def _segments(mask: np.ndarray, min_gap: int) -> list[tuple[int, int]]:
    """[start, end) runs of True, merging runs separated by < min_gap."""
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return []
    runs = []
    start = prev = int(idx[0])
    for i in idx[1:]:
        i = int(i)
        if i - prev >= min_gap + 1:
            runs.append((start, prev + 1))
            start = i
        prev = i
    runs.append((start, prev + 1))
    return runs


def _read_cells(band: np.ndarray, anchor: int, x1: int) -> tuple[str, int]:
    """Decode glyph cells from ``anchor`` on the PITCH grid; returns the
    text and the total Hamming distance (the alignment score)."""
    chars, total = [], 0
    gx = anchor
    while gx < x1:
        cell = np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
        patch = band[:, max(gx, 0) : gx + GLYPH_W]
        h = min(patch.shape[0], GLYPH_H)
        w = min(patch.shape[1], GLYPH_W)
        cell[:h, :w] = patch[:h, :w]
        if cell.any():
            best, best_d = "?", GLYPH_H * GLYPH_W + 1
            for ch, g in _TABLE.items():
                d = int(np.sum(cell ^ g))
                if d < best_d:
                    best, best_d = ch, d
            chars.append(best)
            total += best_d
        gx += PITCH
    return "".join(chars), total


def ocr_bitmap(img: np.ndarray, ink_threshold: float = 0.5) -> list[dict]:
    """Recognize FONT text in an image → FIXTURES.md §3 word boxes.

    A word's first glyph may have leading blank columns (e.g. 'I', '.'),
    so the pitch-grid anchor is not simply the first ink column — the
    decoder tries the three feasible anchors (x0, x0−1, x0−2) and keeps
    the alignment with the smallest total Hamming distance."""
    ink = img >= ink_threshold
    out = []
    for y0, y1 in _segments(ink.any(axis=1), LINE_GAP - 1):
        band = ink[y0:y1]
        for x0, x1 in _segments(band.any(axis=0), SPLIT_BLANKS):
            word, _ = min(
                (_read_cells(band, x0 - off, x1) for off in range(3)),
                key=lambda t: t[1],
            )
            out.append(
                {
                    "x0": int(x0),
                    "y0": int(y0),
                    "x2": int(x1),
                    "y2": int(y1),
                    "word": word,
                }
            )
    return out
