"""Pure-stdlib PDF text-layer extraction (S2 real path).

The reference extracts the text layer with pdfplumber
(lib/pipeline_runner.py:59-64); that package is absent in this container,
and the engine's real-PDF branch was a documented stub through round 5.
This module closes the gap with zlib + re only — the same
no-third-party-codec move as the pure-numpy BMP/PPM/PGM image decoders in
llmdata/multimodal.py — implementing the subset of ISO 32000 the corpus
actually uses (surveyed over all 105 PDFs under /root/reference/data/):

- classic xref tables AND hybrid files: we never parse xref at all —
  every top-level ``N G obj`` is scanned in file order (later definitions
  win, which is exactly the incremental-update rule), and compressed
  object streams (/Type/ObjStm) are expanded for dict-only objects;
- FlateDecode (the only content-stream filter in the corpus; DCT/CCITT
  appear only inside image XObjects, which the text layer ignores);
- the page tree (Catalog -> Pages -> Kids) for page-ordered output, with
  a file-order fallback when the tree is unresolvable;
- the text operator subset Word-family generators emit: BT/ET, Tm, Td,
  TD, T*, TL, Tf, Tj, ', ", TJ (with kerning), plus q/Q//cm tracking for
  translated/scaled text space. Simple byte fonts only — the corpus has
  no /Type0 (CID) fonts, so bytes decode as WinAnsi (cp1252).

Line assembly mirrors pdfplumber's defaults closely enough for the T1-T9
parsers: runs are clustered by baseline y (tolerance 2pt), sorted by x,
and joined with a space when the inter-run gap exceeds a quarter of the
font size (glyph widths are estimated at 0.5 em — we ship no font
metrics, and the downstream parsers only need token *separation*, not
typography).

This code path is driven per-row inside the Arrow-batched ``mapInPandas``
of sources/pdf.py — extraction parallelism equals input-split parallelism,
so a 1000-executor scan of 100 TB of PDFs runs this many-thousand-ways
parallel with zero driver involvement.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_INT_RE = re.compile(rb"[+-]?\d+")

# ---------------------------------------------------------------------------
# object scanning
# ---------------------------------------------------------------------------


def _balanced_dict(data: bytes, start: int) -> tuple[bytes, int]:
    """Slice the ``<< ... >>`` dict starting at ``start``; returns
    (dict_bytes, end_index). Tolerates nested dicts; strings inside dicts
    with unbalanced brackets are rare enough to ignore for this corpus."""
    depth = 0
    i = start
    n = len(data)
    while i < n - 1:
        two = data[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[start:i], i
        else:
            i += 1
    return data[start:], n


def _scan_objects(
    data: bytes,
) -> tuple[dict[int, tuple[bytes, bytes | None]], dict[int, int]]:
    """All top-level objects: ({num: (dict_bytes, raw_stream_or_None)},
    {num: file_position}).
    File order, later wins — the incremental-update rule without touching
    xref tables (hybrid-xref files Just Work). The scan is SEQUENTIAL and
    jumps over stream bodies: binary image data is full of accidental
    ``N G obj`` byte patterns, and matching them would turn the scan
    quadratic (each false hit searching to EOF for its endobj)."""
    out: dict[int, tuple[bytes, bytes | None]] = {}
    positions: dict[int, int] = {}
    pos, n = 0, len(data)
    while pos < n:
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        positions[num] = m.start()
        i = m.end()
        while i < n and data[i : i + 1] in b" \r\n\t":
            i += 1
        if data[i : i + 2] != b"<<":
            # non-dict object (int/array); body runs to the nearby endobj
            end = data.find(b"endobj", i, i + 4096)
            out[num] = (data[i : end if end != -1 else i + 64], None)
            pos = (end + 6) if end != -1 else i
            continue
        dct, j = _balanced_dict(data, i)
        ws = re.match(rb"\s*", data[j:])
        sm = _STREAM_RE.match(data, j + ws.end())
        if sm:
            s = sm.end()
            ln = _direct_length(dct, out)
            if ln is not None and data[s + ln : s + ln + 20].lstrip().startswith(
                b"endstream"
            ):
                e = s + ln
            else:
                e = data.find(b"endstream", s)
                e = e if e != -1 else n
            out[num] = (dct, data[s:e].rstrip(b"\r\n"))
            pos = e  # jump over the stream body — never scan inside it
        else:
            out[num] = (dct, None)
            pos = j
    return out, positions


def _direct_length(dct: bytes, objs: dict) -> int | None:
    m = re.search(rb"/Length\s+(\d+)(\s+\d+\s+R)?", dct)
    if not m:
        return None
    if m.group(2):  # indirect /Length N G R
        ref = objs.get(int(m.group(1)))
        if ref and ref[1] is None:
            n = _INT_RE.search(ref[0])
            return int(n.group(0)) if n else None
        return None
    return int(m.group(1))


def _inflate(raw: bytes) -> bytes | None:
    try:
        return zlib.decompress(raw)
    except zlib.error:
        try:  # tolerate truncated trailers
            return zlib.decompressobj().decompress(raw)
        except zlib.error:
            return None


def _decoded_stream(dct: bytes, raw: bytes | None) -> bytes | None:
    if raw is None:
        return None
    if b"FlateDecode" in dct:
        return _inflate(raw)
    if b"/Filter" in dct:
        return None  # DCT/CCITT etc: image data, never a text layer
    return raw


def _expand_objstms(
    objs: dict[int, tuple[bytes, bytes | None]],
    positions: dict[int, int] | None = None,
) -> None:
    """Merge objects embedded in /Type/ObjStm streams (dict-only objects —
    the spec forbids streams inside object streams). Precedence follows
    the incremental-update rule — LATER in the file wins: an ObjStm
    appended by an update overrides stale top-level objects from the
    original body (a member's position is its container ObjStm's
    position). Without a position map, members only fill absent numbers."""
    positions = positions or {}
    for stm_num, (dct, raw) in list(objs.items()):
        if b"/ObjStm" not in dct:
            continue
        data = _decoded_stream(dct, raw)
        mn = re.search(rb"/N\s+(\d+)", dct)
        mf = re.search(rb"/First\s+(\d+)", dct)
        if data is None or not mn or not mf:
            continue
        stm_pos = positions.get(stm_num, -1)
        first = int(mf.group(1))
        header = _INT_RE.findall(data[:first])
        pairs = [
            (int(header[i]), int(header[i + 1]))
            for i in range(0, 2 * int(mn.group(1)) - 1, 2)
        ]
        for idx, (num, off) in enumerate(pairs):
            if num in objs and positions.get(num, -1) >= stm_pos:
                continue  # existing definition is not older than this ObjStm
            end = pairs[idx + 1][1] if idx + 1 < len(pairs) else len(data) - first
            objs[num] = (data[first + off : first + end], None)
            positions[num] = stm_pos


# ---------------------------------------------------------------------------
# page tree
# ---------------------------------------------------------------------------


def _page_content_streams(objs: dict) -> list[bytes]:
    """Per-page concatenated content streams, page-tree order; falls back
    to file-order BT-containing streams when the tree is unresolvable."""
    root_kids: list[int] = []
    for num, (dct, _) in objs.items():
        if b"/Type" in dct and b"/Catalog" in dct:
            m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", dct)
            if m:
                root_kids = [int(m.group(1))]
    pages: list[int] = []
    seen: set[int] = set()

    def walk(num: int) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        dct = objs[num][0]
        if b"/Kids" in dct:
            km = re.search(rb"/Kids\s*\[(.*?)\]", dct, re.S)
            for r in _REF_RE.finditer(km.group(1) if km else b""):
                walk(int(r.group(1)))
        elif b"/Page" in dct:
            pages.append(num)

    for r in root_kids:
        walk(r)

    out: list[bytes] = []
    for p in pages:
        dct = objs[p][0]
        cm = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", dct, re.S)
        if not cm:
            continue
        parts = []
        for r in _REF_RE.finditer(cm.group(1)):
            obj = objs.get(int(r.group(1)))
            if obj:
                dec = _decoded_stream(*obj)
                if dec:
                    parts.append(dec)
        if parts:
            out.append(b"\n".join(parts))
    if out:
        return out
    # fallback: any decodable stream that looks like a content stream
    return [
        dec
        for dct, raw in objs.values()
        if (dec := _decoded_stream(dct, raw)) is not None
        and b"BT" in dec
        and (b"Tj" in dec or b"TJ" in dec)
    ]


# ---------------------------------------------------------------------------
# content-stream interpretation
# ---------------------------------------------------------------------------

_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _read_literal(data: bytes, i: int) -> tuple[str, int]:
    """Parse a ( ) literal string starting AT the '('; returns (text, end)."""
    out: list[int] = []
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt.isdigit():  # octal \d{1,3}
                j = i + 1
                while j < min(i + 4, n) and data[j : j + 1].isdigit():
                    j += 1
                out.append(int(data[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            if nxt in (b"\r", b"\n"):  # line continuation
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
                continue
            out.extend(_ESCAPES.get(nxt, nxt.decode("latin-1")).encode("latin-1"))
            i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if not depth:
                i += 1
                break
        if depth:
            out.extend(c)
        i += 1
    return bytes(out).decode("cp1252", "replace"), i


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9'\"*]*")


def _est_width(text: str, size: float) -> float:
    """Advance estimate without font metrics: Helvetica-ish per-class em
    widths (tabular digits 0.556, caps ~0.7, lowercase ~0.5, thin
    punctuation 0.28). Only the line-join gap heuristic consumes this —
    good enough to separate table columns without splitting small-caps
    words."""
    w = 0.0
    for ch in text:
        if ch.isdigit():
            w += 0.556
        elif ch.isupper():
            w += 0.70
        elif ch.islower():
            w += 0.50
        elif ch in " .,:;'|!i" or ch in "\t":
            w += 0.28
        else:
            w += 0.55
    return w * size


class _TextState:
    __slots__ = ("x", "y", "lx", "ly", "size", "leading", "ctm", "stack")

    def __init__(self) -> None:
        self.x = self.y = self.lx = self.ly = 0.0
        self.size = 12.0
        self.leading = 0.0
        self.ctm = (1.0, 1.0, 0.0, 0.0)  # (sx, sy, tx, ty) — no rotation
        self.stack: list[tuple[float, float, float, float]] = []


def _runs_of(content: bytes) -> list[tuple[float, float, float, str]]:
    """Interpret one page's content stream into text runs
    (y_device, x_device, font_size, text)."""
    st = _TextState()
    runs: list[tuple[float, float, float, str]] = []
    operands: list = []
    i, n = 0, len(content)

    def emit(text: str) -> None:
        text = text.replace("\x00", "")  # stray high bytes of 2-byte hex strings
        if not text:
            return
        sx, sy, tx, ty = st.ctm
        runs.append((st.y * sy + ty, st.x * sx + tx, st.size * sy, text))
        st.x += _est_width(text, st.size)

    def show_tj(arr: list) -> None:
        pieces: list[str] = []
        for el in arr:
            if isinstance(el, str):
                pieces.append(el)
            elif el <= -180:  # large negative kern == an implicit space
                pieces.append(" ")
            # x-advance bookkeeping for the gap heuristic
        emit("".join(pieces))

    while i < n:
        c = content[i : i + 1]
        if c in b" \t\r\n\x00":
            i += 1
        elif c == b"%":  # comment to EOL
            j = content.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c == b"(":
            s, i = _read_literal(content, i)
            operands.append(s)
        elif c == b"<" and content[i + 1 : i + 2] == b"<":
            _, i = _balanced_dict(content, i)
            operands.append(None)
        elif c == b"<":
            j = content.find(b">", i)
            j = n if j == -1 else j
            hx = re.sub(rb"\s", b"", content[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            operands.append(bytes.fromhex(hx.decode("ascii")).decode("cp1252", "replace"))
            i = j + 1
        elif c == b"[":
            arr: list = []
            i += 1
            while i < n and content[i : i + 1] != b"]":
                cc = content[i : i + 1]
                if cc in b" \t\r\n":
                    i += 1
                elif cc == b"(":
                    s, i = _read_literal(content, i)
                    arr.append(s)
                elif cc == b"<":
                    j = content.find(b">", i)
                    j = n if j == -1 else j
                    hx = re.sub(rb"\s", b"", content[i + 1 : j])
                    if len(hx) % 2:
                        hx += b"0"
                    arr.append(bytes.fromhex(hx.decode("ascii")).decode("cp1252", "replace"))
                    i = j + 1
                else:
                    nm = _NUM_RE.match(content, i)
                    if nm:
                        arr.append(float(nm.group(0)))
                        i = nm.end()
                    else:
                        i += 1
            operands.append(arr)
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and content[j : j + 1] not in b" \t\r\n/[]()<>{}%":
                j += 1
            operands.append(None)  # names carry no text
            i = j
        else:
            nm = _NUM_RE.match(content, i)
            if nm:
                operands.append(float(nm.group(0)))
                i = nm.end()
                continue
            om = _OP_RE.match(content, i)
            if not om:
                i += 1
                continue
            op = om.group(0)
            i = om.end()
            nums = [v for v in operands if isinstance(v, float)]
            if op == b"BT":
                st.x = st.y = st.lx = st.ly = 0.0
            elif op == b"Tm" and len(nums) >= 6:
                st.lx, st.ly = nums[-2], nums[-1]
                st.x, st.y = st.lx, st.ly
            elif op in (b"Td", b"TD") and len(nums) >= 2:
                if op == b"TD":
                    st.leading = -nums[-1]
                st.lx += nums[-2]
                st.ly += nums[-1]
                st.x, st.y = st.lx, st.ly
            elif op == b"T*":
                st.ly -= st.leading
                st.x, st.y = st.lx, st.ly
            elif op == b"TL" and nums:
                st.leading = nums[-1]
            elif op == b"Tf" and nums:
                st.size = nums[-1]
            elif op == b"Tj" and operands and isinstance(operands[-1], str):
                emit(operands[-1])
            elif op in (b"'", b'"') and operands and isinstance(operands[-1], str):
                st.ly -= st.leading
                st.x, st.y = st.lx, st.ly
                emit(operands[-1])
            elif op == b"TJ" and operands and isinstance(operands[-1], list):
                show_tj(operands[-1])
            elif op == b"q":
                st.stack.append(st.ctm)
            elif op == b"Q" and st.stack:
                st.ctm = st.stack.pop()
            elif op == b"cm" and len(nums) >= 6:
                a, b_, c_, d, e, f = nums[-6:]
                if b_ == 0 and c_ == 0:  # ignore rotated text space
                    sx, sy, tx, ty = st.ctm
                    st.ctm = (sx * a, sy * d, sx * e + tx, sy * f + ty)
            operands = []
    return runs


# ---------------------------------------------------------------------------
# line assembly
# ---------------------------------------------------------------------------

Y_TOL = 2.0  # pdfplumber's default y clustering tolerance ballpark


def _lines_from_runs(runs: list[tuple[float, float, float, str]]) -> list[str]:
    lines: list[str] = []
    runs = sorted(runs, key=lambda r: (-r[0], r[1]))
    cluster: list[tuple[float, float, float, str]] = []
    cur_y: float | None = None
    for r in runs:
        if cur_y is None or cur_y - r[0] <= Y_TOL:
            cluster.append(r)
            cur_y = r[0] if cur_y is None else cur_y
        else:
            lines.append(_join_line(cluster))
            cluster, cur_y = [r], r[0]
    if cluster:
        lines.append(_join_line(cluster))
    return [l for l in (ln.strip() for ln in lines) if l]


def _join_line(cluster: list[tuple[float, float, float, str]]) -> str:
    parts: list[str] = []
    prev_end: float | None = None
    for _, x, size, text in sorted(cluster, key=lambda r: r[1]):
        if prev_end is not None and x - prev_end > max(0.3 * size, 1.0):
            if parts and not parts[-1].endswith(" ") and not text.startswith(" "):
                parts.append(" ")
        parts.append(text)
        prev_end = x + _est_width(text, size)
    return re.sub(r"\s+", " ", "".join(parts))


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def extract_pdf_text_lines(content: bytes) -> list[str]:
    """Text-layer lines of a PDF, page order then reading order (top-down,
    left-right). Image-only pages yield nothing (S3's OCR fallback owns
    those). Raises nothing: malformed input degrades to []."""
    try:
        objs, positions = _scan_objects(bytes(content))
        _expand_objstms(objs, positions)
        out: list[str] = []
        for page in _page_content_streams(objs):
            out.extend(_lines_from_runs(_runs_of(page)))
        return out
    except Exception:
        return []


def looks_like_pdf(content: bytes | None) -> bool:
    return content is not None and bytes(content[:5]) == b"%PDF-"
