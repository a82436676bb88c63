"""Multimodal columns for training-data pipelines (north-star op set).

Images/audio/video are opaque ``binary`` columns + a typed metadata struct.
The Spark-side plumbing — schema, Arrow batch shape, partition sizing — is
real and tested; the codec step honors the driver brief (image/audio
libraries are not in this container): ``decode=\"fake\"`` produces a
deterministic synthetic decode so the downstream plumbing is exercised,
``decode=\"real\"`` runs pure stdlib/numpy codecs for BMP, PPM/PGM, PNG
(zlib + per-row unfilter), baseline JPEG (Huffman + dequant + 8x8
IDCT — covers the reference's own receipt scans in
data/company-A/raw/sample*.jpg), RIFF/WAVE PCM audio, and RIFF/AVI MJPEG
video (per-frame JPEGs through the same JPEG decoder), and raises
``NotImplementedError`` only for formats that genuinely need torchcodec
(compressed audio, mp4/mkv, progressive JPEG).

Scale notes: binary payloads dominate partition bytes — the asset table
should set ``spark.sql.files.maxPartitionBytes`` so one task holds a few
hundred MB of media, and metadata-only queries must NOT read the blob
(keep metadata in separate parquet columns → column pruning skips the
bytes; verified in tests via ReadSchema).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

FEATURE_SCHEMA = "asset_id long, kind string, feature array<float>, feat_dim int"
THUMB_SCHEMA = "asset_id long, width int, height int, thumb binary"
FRAME_SCHEMA = "asset_id long, frame_idx int, frame binary"


def synthetic_assets(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake asset table (content = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = bytes(((i * 37 + j * 11) % 251) for j in range(256))
        rows.append((i, kind, payload, (64, 48, 16000, 16, "fake")))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def synthetic_real_assets(spark, n: int = 16, codec: str = "bmp") -> DataFrame:
    """Asset table whose ``content`` is REAL encoded bytes (BMP or PPM) —
    deterministic gradient patterns, for exercising ``decode="real"``."""
    enc = {"bmp": encode_bmp, "ppm": encode_ppm, "png": encode_png}[codec]
    w, h = 12, 9
    rows = []
    for i in range(n):
        img = ((np.arange(h * w).reshape(h, w) * (i + 3)) % 251).astype(np.uint8)
        rows.append((i, "image", enc(img), (w, h, 0, 1, codec)))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _decode_stub(content: bytes, meta) -> np.ndarray:
    """Deterministic fake decode: bytes → (h, w) float array."""
    arr = np.frombuffer(bytes(content), dtype=np.uint8).astype(np.float32)
    h, w = int(meta["height"]), int(meta["width"])
    return np.resize(arr, (h, w)) / 255.0


# --- Real codecs (pure stdlib/numpy — no Pillow needed) ----------------------
# BMP (24-bit uncompressed) and PPM/PGM (binary P6/P5) are header-plus-raster
# formats, PNG is zlib (stdlib) + per-row unfiltering, baseline JPEG is
# Huffman + dequant + IDCT, WAV is a RIFF chunk walk, and MJPEG-AVI frames
# are JPEGs — ``decode="real"`` genuinely decodes all of these in this
# container; the NotImplementedError surface shrinks to codecs that need
# external libraries (compressed audio / mp4 / mkv → torchcodec).
def _decode_ppm(content: bytes) -> np.ndarray:
    """Binary PPM (P6, RGB) / PGM (P5, gray) → (h, w) float grayscale."""
    raw = bytes(content)
    magic = raw[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM: magic={magic!r}")
    # header: magic, whitespace-separated w h maxval (comments start with #)
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(raw) and raw[i : i + 1].isspace():
            i += 1
        if raw[i : i + 1] == b"#":
            while i < len(raw) and raw[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(raw) and not raw[j : j + 1].isspace():
            j += 1
        fields.append(int(raw[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(raw, dtype=np.uint8, count=w * h * ch, offset=i).astype(np.float32)
    img = px.reshape(h, w, ch).mean(axis=2)
    return img / float(maxval)


def _decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) → (h, w) float grayscale."""
    import struct

    raw = bytes(content)
    if raw[:2] != b"BM":
        raise ValueError(f"not a BMP: magic={raw[:2]!r}")
    (data_off,) = struct.unpack_from("<I", raw, 10)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiihHI", raw, 14)
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant: hdr={hdr_size} bpp={bpp} comp={comp}")
    bottom_up = h > 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4  # rows pad to 4-byte boundaries
    rows = np.frombuffer(raw, dtype=np.uint8, count=h * stride, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3).astype(np.float32)
    if bottom_up:
        img = img[::-1]
    return img.mean(axis=2) / 255.0  # BGR order — channel mean is order-free


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(content: bytes) -> np.ndarray:
    """Non-interlaced 8-bit grayscale/RGB PNG → (h, w) float grayscale.

    Pure stdlib/numpy: chunk walk, IDAT concat, ``zlib.decompress``, then the
    five scanline filters (None/Sub/Up/Average/Paeth) undone per row. Up is
    vectorized; the left-referencing filters (Sub/Average/Paeth) run a per-
    pixel loop, which is fine at thumbnail scale — production cluster images
    carry Pillow and never reach this path."""
    import struct
    import zlib

    raw = bytes(content)
    if raw[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(f"not a PNG: magic={raw[:8]!r}")
    idat = []
    w = h = depth = color = interlace = None
    i = 8
    while i + 8 <= len(raw):
        (length,) = struct.unpack_from(">I", raw, i)
        ctype = raw[i + 4 : i + 8]
        data = raw[i + 8 : i + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + data + crc
    if w is None:
        raise ValueError("PNG: no IHDR chunk")
    if depth != 8 or color not in (0, 2) or interlace != 0:
        raise ValueError(f"unsupported PNG variant: depth={depth} color={color} interlace={interlace}")
    ch = 1 if color == 0 else 3
    stride = w * ch
    decomp = zlib.decompress(b"".join(idat))
    if len(decomp) < h * (stride + 1):
        raise ValueError("PNG: truncated raster")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = decomp[pos]
        row = np.frombuffer(decomp, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(ch, stride):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            row = (row.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG: bad filter type {ftype} on row {y}")
        out[y] = row
    img = out.reshape(h, w, ch).astype(np.float32).mean(axis=2)
    return img / 255.0


# --- baseline JPEG (ITU-T T.81 sequential DCT) ------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# orthonormal 8-point DCT-II basis: spatial = M.T @ F @ M
_DCT_M = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy-coded bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, n: int) -> int:
    """JPEG EXTEND: map an n-bit magnitude to its signed value."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def _huff_decode(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid huffman code")


def _decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline sequential JPEG (SOF0/SOF1) → (h, w) float grayscale.

    Pure stdlib/numpy — marker walk, per-block Huffman entropy decode,
    dequantize in zigzag order, then ONE vectorized 8×8 IDCT over all luma
    blocks. Only the Y channel is reconstructed (chroma blocks are
    entropy-decoded to keep the bitstream aligned but never IDCT'd), which
    is exactly what the grayscale feature/phash consumers need. Restart
    markers (DRI/RSTn) reset DC predictors per spec. Progressive (SOF2)
    raises — that genuinely needs a multi-pass coefficient store.
    """
    import struct

    raw = bytes(content)
    if raw[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG: magic={raw[:2]!r}")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> code table
    comps: list[tuple[int, int, int, int]] = []  # (cid, hsamp, vsamp, qtab)
    w = h = None
    restart = 0
    scan: list[tuple[int, int, int]] = []  # (comp_idx, dc_tab, ac_tab)
    i = 2
    while i + 4 <= len(raw):
        if raw[i] != 0xFF:
            i += 1
            continue
        m = raw[i + 1]
        if m == 0xD8 or 0xD0 <= m <= 0xD7 or m == 0x01:
            i += 2
            continue
        (seglen,) = struct.unpack_from(">H", raw, i + 2)
        seg = raw[i + 4 : i + 2 + seglen]
        if m == 0xDB:  # DQT — may hold several tables
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                if prec:
                    qt[tid] = np.frombuffer(seg, dtype=">u2", count=64, offset=p).astype(np.int32)
                    p += 128
                else:
                    qt[tid] = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p).astype(np.int32)
                    p += 64
        elif m in (0xC0, 0xC1):  # SOF0/1: baseline (extended-sequential shares the layout)
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + c * 3 : 9 + c * 3]
                comps.append((cid, samp >> 4, samp & 15, tq))
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF{m - 0xC0} (non-baseline) not supported")
        elif m == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(seg):
                tclass, tid = seg[p] >> 4, seg[p] & 15
                counts = seg[p + 1 : p + 17]
                p += 17
                table: dict[tuple[int, int], int] = {}
                code = 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = seg[p]
                        code += 1
                        p += 1
                    code <<= 1
                huff[(tclass, tid)] = table
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:  # SOS — entropy-coded data follows
            ns = seg[0]
            for c in range(ns):
                cs, tabs = seg[1 + c * 2], seg[2 + c * 2]
                idx = next(k for k, cp in enumerate(comps) if cp[0] == cs)
                scan.append((idx, tabs >> 4, tabs & 15))
            i += 2 + seglen
            break
        i += 2 + seglen
    if w is None or not scan:
        raise ValueError("JPEG: missing SOF/SOS")

    # split entropy data at restart markers, de-stuff 0xFF00 within each
    segments: list[bytes] = []
    start = i
    j = i
    while j + 1 < len(raw):
        if raw[j] == 0xFF and raw[j + 1] != 0x00:
            mk = raw[j + 1]
            if 0xD0 <= mk <= 0xD7:
                segments.append(raw[start:j].replace(b"\xff\x00", b"\xff"))
                j += 2
                start = j
                continue
            break  # EOI or next marker
        j += 1
    segments.append(raw[start:j].replace(b"\xff\x00", b"\xff"))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    y_idx = scan[0][0]  # first scan component is luma
    y_h, y_v = comps[y_idx][1], comps[y_idx][2]
    yw, yh = mcus_x * y_h * 8, mcus_y * y_v * 8

    y_blocks: list[np.ndarray] = []
    y_pos: list[tuple[int, int]] = []
    dc_pred = [0] * len(comps)
    seg_iter = iter(segments)
    r = _BitReader(next(seg_iter))
    n_mcus = mcus_x * mcus_y
    for mcu in range(n_mcus):
        if restart and mcu and mcu % restart == 0:
            r = _BitReader(next(seg_iter))  # RST: byte-aligned, DC reset
            dc_pred = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, dc_t, ac_t in scan:
            _cid, ch, cv, tq = comps[ci]
            q = qt[tq]
            dct, act = huff[(0, dc_t)], huff[(1, ac_t)]
            for by in range(cv):
                for bx in range(ch):
                    coef = np.zeros(64, dtype=np.int32)
                    s = _huff_decode(r, dct)
                    dc_pred[ci] += _extend(r.receive(s), s)
                    coef[0] = dc_pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(r, act)
                        rr, ss = rs >> 4, rs & 15
                        if ss == 0:
                            if rr == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += rr
                        if k > 63:
                            raise ValueError("JPEG: AC index overrun")
                        coef[k] = _extend(r.receive(ss), ss)
                        k += 1
                    if ci == y_idx:
                        dq = np.zeros(64, dtype=np.int32)
                        dq[_ZIGZAG] = coef * q
                        y_blocks.append(dq.reshape(8, 8))
                        y_pos.append(((my * cv + by) * 8, (mx * ch + bx) * 8))

    # one vectorized IDCT over every luma block
    blocks = np.stack(y_blocks).astype(np.float64)
    spatial = np.einsum("ux,nuv,vy->nxy", _DCT_M, blocks, _DCT_M) + 128.0
    out = np.zeros((yh, yw), dtype=np.float64)
    for (py, px), blk in zip(y_pos, spatial):
        out[py : py + 8, px : px + 8] = blk
    return np.clip(out[:h, :w], 0.0, 255.0).astype(np.float32) / 255.0


# --- WAV (RIFF PCM) audio ----------------------------------------------------


def _decode_wav(content: bytes) -> np.ndarray:
    """RIFF/WAVE PCM (8- or 16-bit) → 1-D float samples in [-1, 1],
    channel-meaned to mono. Pure stdlib/numpy chunk walk."""
    import struct

    raw = bytes(content)
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError(f"not a WAV: magic={raw[:4]!r}/{raw[8:12]!r}")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(raw):
        cid = raw[i : i + 4]
        (clen,) = struct.unpack_from("<I", raw, i + 4)
        body = raw[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # chunks pad to even length
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_fmt, n_ch, _rate, _bps, _align, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV variant: fmt={audio_fmt} bits={bits}")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    else:
        # 8-bit PCM is unsigned; the 127.5 midpoint maps [0, 255] onto
        # exactly [-1, 1] (the encoder's inverse)
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float32) / 127.5 - 1.0
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x


def encode_wav(samples: np.ndarray, sample_rate: int = 16000, bits: int = 16) -> bytes:
    """1-D float samples in [-1, 1] → mono RIFF/WAVE PCM bytes."""
    import struct

    if bits == 16:
        # symmetric with the decoder's /32768: quantization stays within
        # half an LSB everywhere except the +1.0 clip edge (one LSB)
        pcm = np.clip(np.rint(samples * 32768.0), -32768, 32767).astype("<i2").tobytes()
    else:
        pcm = np.rint((np.clip(samples, -1, 1) + 1.0) * 127.5).astype(np.uint8).tobytes()
    block = bits // 8
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --- AVI (RIFF) with MJPEG frames --------------------------------------------
# MJPEG = one baseline JPEG per frame, so the in-repo JPEG decoder makes
# this a REAL video path: RIFF walk → per-frame JPEG bytes → _decode_jpeg.


def _avi_mjpeg_frames(content: bytes) -> list[bytes]:
    """RIFF/AVI → list of per-frame JPEG byte strings ('00dc'/'00db'
    chunks inside the movi LIST)."""
    import struct

    raw = bytes(content)
    if raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError(f"not an AVI: magic={raw[:4]!r}/{raw[8:12]!r}")
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        i = lo
        while i + 8 <= hi:
            cid = raw[i : i + 4]
            (clen,) = struct.unpack_from("<I", raw, i + 4)
            if cid == b"LIST":
                walk(i + 12, i + 8 + clen)  # skip the 4-byte list type
            elif cid[2:4] in (b"dc", b"db"):
                frames.append(raw[i + 8 : i + 8 + clen])
            i += 8 + clen + (clen & 1)

    walk(12, len(raw))
    return frames


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int, fps: int = 4) -> bytes:
    """Per-frame JPEG bytes → minimal RIFF/AVI (hdrl + movi, no idx1)."""
    import struct

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<14I", 10**6 // fps, 0, 0, 0, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    return b"RIFF" + struct.pack("<I", len(b"AVI " + hdrl + movi)) + b"AVI " + hdrl + movi


_REAL_DECODERS = {
    "bmp": _decode_bmp,
    "ppm": _decode_ppm,
    "pgm": _decode_ppm,
    "png": _decode_png,
    "jpg": _decode_jpeg,
    "jpeg": _decode_jpeg,
}


def _decode(content: bytes, meta, decode: str) -> np.ndarray:
    if decode == "fake":
        return _decode_stub(content, meta)
    codec = str(meta["codec"]).lower()
    dec = _REAL_DECODERS.get(codec)
    if dec is None:
        raise NotImplementedError(
            f"real decode for codec {codec!r} requires Pillow/torchcodec on the cluster image"
        )
    return dec(content)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale → binary P6 RGB bytes (gray replicated)."""
    h, w = img.shape
    rgb = np.repeat(img.astype(np.uint8)[:, :, None], 3, axis=2)
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def encode_png(img: np.ndarray, filters: str = "cycle") -> bytes:
    """(h, w) uint8 grayscale → 8-bit grayscale PNG bytes.

    ``filters="none"`` writes every scanline with filter 0; ``"cycle"``
    rotates through all five filter types so round-trip tests exercise the
    full unfilter path in :func:`_decode_png`."""
    import struct
    import zlib

    h, w = img.shape
    img = img.astype(np.uint8)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    lines = bytearray()
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        row = img[y]
        ftype = (y % 5) if filters == "cycle" else 0
        if ftype == 0:
            filt = row
        elif ftype == 1:  # Sub
            filt = (row.astype(np.int32) - np.concatenate(([0], row[:-1]))).astype(np.uint8)
        elif ftype == 2:  # Up
            filt = (row.astype(np.int32) - prev).astype(np.uint8)
        elif ftype == 3:  # Average
            filt = np.empty(w, dtype=np.uint8)
            for x in range(w):
                left = int(row[x - 1]) if x else 0
                filt[x] = (int(row[x]) - (left + int(prev[x])) // 2) & 0xFF
        else:  # Paeth
            filt = np.empty(w, dtype=np.uint8)
            for x in range(w):
                left = int(row[x - 1]) if x else 0
                ul = int(prev[x - 1]) if x else 0
                filt[x] = (int(row[x]) - _paeth(left, int(prev[x]), ul)) & 0xFF
        lines.append(ftype)
        lines.extend(filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray, no interlace
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale → uncompressed 24-bit BMP bytes."""
    import struct

    h, w = img.shape
    stride = ((w * 3 + 3) // 4) * 4
    raster = np.zeros((h, stride), dtype=np.uint8)
    bgr = np.repeat(img.astype(np.uint8)[:, :, None], 3, axis=2)
    raster[:, : w * 3] = bgr[::-1].reshape(h, w * 3)  # bottom-up rows
    data = raster.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiihHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def extract_features(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode → pooled feature vector, as an Arrow-batched mapInPandas op.

    The batch shape (one pandas batch per input split, vectorized numpy
    inside) is the production shape. ``decode="real"`` runs the pure-numpy
    BMP/PPM/PGM/PNG/baseline-JPEG codecs in-container; audio/video raise
    NotImplementedError (torchcodec lives on the cluster image, not here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for content, meta in zip(b["content"], b["meta"]):
                img = _decode(content, meta, decode)
                # 8-bin row-mean pooling — stands in for a real embedding
                pooled = img.mean(axis=1)
                feats.append(np.resize(pooled, 8).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "asset_id": b["asset_id"],
                    "kind": b["kind"],
                    "feature": feats,
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def resize_thumbnails(
    assets: DataFrame, width: int = 8, height: int = 6, decode: str = "fake"
) -> DataFrame:
    """Decode → resize → re-encode (nearest-neighbor subsample; the decode
    step honors the same fake/real codec dispatch as ``extract_features``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            thumbs = []
            for content, meta in zip(b["content"], b["meta"]):
                img = _decode(content, meta, decode)
                ys = np.linspace(0, img.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, width).astype(int)
                thumb = (img[np.ix_(ys, xs)] * 255).astype(np.uint8)
                thumbs.append(thumb.tobytes())
            yield pd.DataFrame(
                {
                    "asset_id": b["asset_id"],
                    "width": [width] * len(b),
                    "height": [height] * len(b),
                    "thumb": thumbs,
                }
            )

    return assets.mapInPandas(run, THUMB_SCHEMA)


def extract_audio_features(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Audio → 8-dim feature (per-window RMS energy over 8 equal frames),
    Arrow-batched mapInPandas like the image path. ``decode="real"``
    decodes RIFF/WAVE PCM in-repo; other audio codecs (mp3/flac/opus)
    genuinely need torchcodec and raise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for content, meta in zip(b["content"], b["meta"]):
                if decode == "fake":
                    x = (
                        np.frombuffer(bytes(content), dtype=np.uint8).astype(np.float32)
                        - 128.0
                    ) / 128.0
                elif str(meta["codec"]).lower() in ("wav", "wave"):
                    x = _decode_wav(content)
                else:
                    raise NotImplementedError(
                        f"real audio decode for codec {meta['codec']!r} requires torchcodec"
                    )
                wins = np.array_split(x, 8)
                feats.append(
                    [float(np.sqrt(np.mean(np.square(w)))) if len(w) else 0.0 for w in wins]
                )
            yield pd.DataFrame(
                {
                    "asset_id": b["asset_id"],
                    "kind": b["kind"],
                    "feature": feats,
                    "feat_dim": [8] * len(feats),
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_n: int = 4, decode: str = "fake") -> DataFrame:
    """Video frame sampling: one input row → n_frames/every_n rows (UDTF
    shape, like the document parsers). ``decode="real"`` walks RIFF/AVI
    and emits the actual per-frame MJPEG bytes — each sampled frame is a
    baseline JPEG the in-repo ``_decode_jpeg`` can open; other containers
    (mp4/mkv) genuinely need torchcodec and raise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_id, out_idx, out_frame = [], [], []
            for asset_id, content, meta in zip(b["asset_id"], b["content"], b["meta"]):
                if decode == "fake":
                    n = int(meta["n_frames"])
                    frames = None
                elif str(meta["codec"]).lower() == "avi":
                    frames = _avi_mjpeg_frames(content)
                    n = len(frames)
                else:
                    raise NotImplementedError(
                        f"real video decode for codec {meta['codec']!r} requires torchcodec"
                    )
                for idx in range(0, n, every_n):
                    out_id.append(asset_id)
                    out_idx.append(idx)
                    out_frame.append(
                        # stub frame: deterministic payload slice
                        bytes(content)[idx : idx + 16]
                        if frames is None
                        else frames[idx]
                    )
            yield pd.DataFrame({"asset_id": out_id, "frame_idx": out_idx, "frame": out_frame})

    return assets.mapInPandas(run, FRAME_SCHEMA)


def metadata_only_projection(assets: DataFrame) -> DataFrame:
    """Metadata queries must not touch the blob — this projection prunes
    ``content`` at the scan (check .explain ReadSchema)."""
    return assets.select(
        "asset_id", "kind", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )


# --- Perceptual-hash image dedup (MM2) ---------------------------------------
PHASH_SCHEMA = "asset_id long, phash long"
PHASH_BANDS = 4  # 4 x 16-bit bands: Hamming <= 3 => some band matches exactly


def _ahash(img: np.ndarray) -> np.int64:
    """64-bit average-hash of one grayscale image: 8×8 nearest-neighbor
    downsample → threshold at the mean → bit per cell."""
    ys = np.linspace(0, img.shape[0] - 1, 8).astype(int)
    xs = np.linspace(0, img.shape[1] - 1, 8).astype(int)
    small = img[np.ix_(ys, xs)].astype(np.float64)
    h = np.uint64(0)
    for bit in (small > small.mean()).flatten():
        h = np.uint64(h << np.uint64(1)) | np.uint64(int(bit))
    return np.int64(h.astype(np.int64))


def perceptual_hash(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """64-bit average-hash (aHash) per image. Near-identical images
    (recompression, mild noise, small edits) land within a few bits of
    each other — the standard first-pass image dedup for training
    corpora. Only the hash extraction is Python (Arrow-batched
    mapInPandas); everything downstream is native columnar."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            hashes = [
                _ahash(_decode(content, meta, decode))
                for content, meta in zip(b["content"], b["meta"])
            ]
            yield pd.DataFrame({"asset_id": b["asset_id"], "phash": hashes})

    return assets.mapInPandas(run, PHASH_SCHEMA)


def _require_banding_complete(max_hamming: int) -> None:
    if max_hamming > PHASH_BANDS - 1:
        raise ValueError(
            f"pigeonhole banding with {PHASH_BANDS} bands is complete only for "
            f"Hamming <= {PHASH_BANDS - 1}; max_hamming={max_hamming} would "
            "silently return an incomplete pair set (add bands to go further)"
        )


# A (band_idx, band_val) bucket holding more DISTINCT hashes than this
# is "hot": its members pair through the recursive sub-banding on the
# remaining 48 bits instead of the direct self-join (cap² direct pairs
# per bucket is the bound the cap buys; dd9's cell_cap discipline).
HOT_BAND_CAP = 256
_SUB_BANDS = 4  # 4 × 12-bit sub-bands over the remaining 48 bits


def _remaining48(h, band_idx):
    """The 48 bits of ``h`` OUTSIDE the 16-bit band ``band_idx`` (bands
    above it shifted down) — the space the recursive pigeonhole re-bands.
    Positive by construction (< 2^48), so long arithmetic is exact. The
    top band is special-cased: a JVM long shift is mod 64, so
    ``shiftrightunsigned(h, 64)`` would return ``h`` itself."""
    expr = None
    for i in range(PHASH_BANDS):
        if i == PHASH_BANDS - 1:
            r = h.bitwiseAND(F.lit((1 << 48) - 1).cast("long"))
        else:
            hi = F.shiftrightunsigned(h, 16 * (i + 1)) * F.lit(1 << (16 * i)).cast("long")
            lo = (
                h.bitwiseAND(F.lit((1 << (16 * i)) - 1).cast("long"))
                if i
                else F.lit(0).cast("long")
            )
            r = hi + lo
        expr = r if expr is None else F.when(band_idx == i, r).otherwise(expr)
    return expr


def _band_explode(hashes: DataFrame, hash_col: str) -> DataFrame:
    """DISTINCT hash values exploded into their ``PHASH_BANDS`` 16-bit
    bands: ``(h, band_idx, band_val)`` — the shared banding front of the
    unary (:func:`_distinct_hash_band_pairs`) and bipartite
    (:func:`_bipartite_distinct_band_pairs`) pigeonhole joins."""
    dh = hashes.select(F.col(hash_col).alias("h")).distinct()
    return dh.select(
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("h"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("h", "b.band_idx", "b.band_val")


def _sub_band_explode(banded: DataFrame) -> DataFrame:
    """Hot-band members re-banded: the remaining 48 bits (outside the
    member's own 16-bit band) exploded into ``_SUB_BANDS`` 12-bit
    sub-bands — the recursive pigeonhole level. Members of a hot bucket
    agree on their 16-bit band, so a qualifying pair's ≤ ``PHASH_BANDS−1``
    differing bits all live in the shared remaining-48 space and some
    sub-band must agree exactly (completeness preserved)."""
    return (
        banded.withColumn("r48", _remaining48(F.col("h"), F.col("band_idx")))
        .select(
            "h",
            "band_idx",
            "band_val",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("sub_idx"),
                            F.shiftrightunsigned(F.col("r48"), 12 * k)
                            .bitwiseAND(F.lit(0xFFF))
                            .alias("sub_val"),
                        )
                        for k in range(_SUB_BANDS)
                    ]
                )
            ).alias("s"),
        )
        .select("h", "band_idx", "band_val", "s.sub_idx", "s.sub_val")
    )


def _distinct_hash_band_pairs(
    hashes: DataFrame, hash_col: str, hot_cap: int = HOT_BAND_CAP
) -> DataFrame:
    """Banding candidates over DISTINCT hash values: (ha, hb) with
    ha < hb (signed 64-bit order, the canonical pair orientation) that
    agree exactly on at least one 16-bit band. This is the hot-band
    degeneracy guard (r12 VERDICT finding 2): a degenerate corpus — a
    million black frames, constant digital silence, letterboxed images —
    collapses to ONE row per distinct hash before the self-equi-join, so
    identical-hash pile-ups can never make a (band_idx, band_val) bucket
    quadratic. Identical-hash pairs (Hamming 0 by definition) are
    reconstructed by the callers' output-bounded expansion joins instead.

    Residual hot bands — more than ``hot_cap`` DISTINCT hashes sharing
    one band value (structured corpora: identical headers, letterbox
    rows) — go through the RECURSIVE pigeonhole instead of the direct
    self-join: members of a hot bucket agree on that 16-bit band, so a
    qualifying pair's ≤ ``PHASH_BANDS − 1`` differing bits all live in
    the remaining 48, and re-banding those into ``_SUB_BANDS`` 12-bit
    sub-bands guarantees some sub-band agrees exactly — completeness is
    preserved, per-bucket candidates drop from n²/2 to the sub-bucket
    sum. Direct pairs per bucket are thereby bounded by ``hot_cap``²/2;
    a second recursion level (hot SUB-buckets: many distinct hashes
    agreeing on band + sub-band — 28 shared bits) has never been
    warranted by a measured regime and is left undone deliberately."""
    banded = _band_explode(hashes, hash_col)
    sizes = banded.groupBy("band_idx", "band_val").agg(
        F.count(F.lit(1)).alias("_n")
    )
    # broadcast is bounded by the band KEY SPACE, not the corpus:
    # at most PHASH_BANDS × 2^16 = 262,144 rows regardless of corpus size
    # (a wider-band refactor must re-check this bound before keeping the hint)
    banded = banded.join(F.broadcast(sizes), ["band_idx", "band_val"])
    cold = banded.filter(F.col("_n") <= hot_cap)
    a, b = cold.alias("a"), cold.alias("b")
    direct = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.h") < F.col("b.h")),
        )
        .select(F.col("a.h").alias("ha"), F.col("b.h").alias("hb"))
    )
    sub = _sub_band_explode(banded.filter(F.col("_n") > hot_cap))
    sa, sb = sub.alias("a"), sub.alias("b")
    recursed = (
        sa.join(
            sb,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.sub_idx") == F.col("b.sub_idx"))
            & (F.col("a.sub_val") == F.col("b.sub_val"))
            & (F.col("a.h") < F.col("b.h")),
        )
        .select(F.col("a.h").alias("ha"), F.col("b.h").alias("hb"))
    )
    return direct.unionByName(recursed).dropDuplicates(["ha", "hb"])


def _bipartite_distinct_band_pairs(
    left: DataFrame,
    left_col: str,
    right: DataFrame,
    right_col: str,
    hot_cap: int = HOT_BAND_CAP,
) -> DataFrame:
    """The BIPARTITE twin of :func:`_distinct_hash_band_pairs`: distinct
    left-hashes × distinct right-hashes ``(hl, hr)`` agreeing exactly on
    at least one 16-bit band, with the SAME hot-band degeneracy guard on
    both sides (r13 VERDICT finding 2). Equal hashes agree on every band
    (and every sub-band), so Hamming-0 cross matches need no separate
    branch.

    Hotness is judged on the bucket's CROSS-PRODUCT size — a band value
    where ``n_left × n_right > hot_cap²`` (letterboxed frames vs a black
    test card, shared title cards) routes through the recursive 12-bit
    sub-banding over the shared remaining-48 space instead of the direct
    band join, bounding direct candidates per bucket at ``hot_cap²``.
    Completeness: both sides of a qualifying pair agree on the hot band,
    so its ≤ ``PHASH_BANDS−1`` differing bits live in the remaining 48
    and some 12-bit sub-band agrees exactly — the `_sub_band_explode`
    argument, applied bipartitely. The inner size-join also prunes bands
    present on only one side before any pairing work."""
    bl, br = _band_explode(left, left_col), _band_explode(right, right_col)
    sizes = (
        bl.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("_nl"))
        .join(
            br.groupBy("band_idx", "band_val").agg(F.count(F.lit(1)).alias("_nr")),
            ["band_idx", "band_val"],
        )
    )
    # bounded by the band key space (≤ PHASH_BANDS × 2^16 rows), never the corpus
    bl = bl.join(F.broadcast(sizes), ["band_idx", "band_val"])
    br = br.join(F.broadcast(sizes), ["band_idx", "band_val"])
    hot = F.col("_nl") * F.col("_nr") > hot_cap * hot_cap
    li, rf = bl.filter(~hot).alias("i"), br.filter(~hot).alias("f")
    direct = li.join(
        rf,
        (F.col("i.band_idx") == F.col("f.band_idx"))
        & (F.col("i.band_val") == F.col("f.band_val")),
    ).select(F.col("i.h").alias("hl"), F.col("f.h").alias("hr"))
    sl = _sub_band_explode(bl.filter(hot)).alias("i")
    sr = _sub_band_explode(br.filter(hot)).alias("f")
    recursed = sl.join(
        sr,
        (F.col("i.band_idx") == F.col("f.band_idx"))
        & (F.col("i.band_val") == F.col("f.band_val"))
        & (F.col("i.sub_idx") == F.col("f.sub_idx"))
        & (F.col("i.sub_val") == F.col("f.sub_val")),
    ).select(F.col("i.h").alias("hl"), F.col("f.h").alias("hr"))
    return direct.unionByName(recursed).dropDuplicates(["hl", "hr"])


def _banded_hash_pairs(hashes: DataFrame, hash_col: str, max_hamming: int) -> DataFrame:
    """(asset_a, asset_b, hamming) pairs with Hamming(hash) ≤ ``max_hamming``
    — the EXACT pigeonhole banding shared by the image (phash) and audio
    (afp) dedup paths: split the 64-bit hash into ``PHASH_BANDS`` 16-bit
    bands; any pair within Hamming ``PHASH_BANDS − 1`` must agree exactly
    on at least one band, so a per-band equi-join finds every qualifying
    pair with NO false negatives (unlike probabilistic LSH) and the exact
    popcount verify prunes band-collision false positives.

    Scale shape: the band self-join runs over DISTINCT hash values only
    (:func:`_distinct_hash_band_pairs` — the hot-band degeneracy guard),
    so candidate count is bounded by hash DIVERSITY, never by duplicate
    multiplicity. Asset pairs reconstruct by two output-bounded
    expansion joins: identical-hash members pair directly at Hamming 0,
    qualifying distinct-hash pairs fan out to their member cross
    product — every row either join emits IS a true pair, so the
    quadratic cost exists only where the answer itself is quadratic.
    The verify (xor + bit_count, pure codegen) runs once per distinct
    hash pair. Never an all-pairs product."""
    _require_banding_complete(max_hamming)
    members = hashes.select("asset_id", F.col(hash_col).alias("h"))
    ma, mb = members.alias("a"), members.alias("b")
    same = (
        ma.join(
            mb,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.lit(0).alias("hamming"),
        )
    )
    hp = (
        _distinct_hash_band_pairs(hashes, hash_col)
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    cross = (
        hp.join(
            members.select(F.col("h").alias("ha"), F.col("asset_id").alias("ia")), "ha"
        )
        .join(
            members.select(F.col("h").alias("hb"), F.col("asset_id").alias("ib")), "hb"
        )
        .select(
            F.least("ia", "ib").alias("asset_a"),
            F.greatest("ia", "ib").alias("asset_b"),
            "hamming",
        )
    )
    return (
        same.unionByName(cross)
        .select("asset_a", "asset_b", "hamming")
        .orderBy("asset_a", "asset_b")
    )


def phash_dup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-dup pairs with Hamming(phash) ≤ ``max_hamming`` via the
    exact pigeonhole banding (see :func:`_banded_hash_pairs`)."""
    return _banded_hash_pairs(hashes, "phash", max_hamming)


# --- Spectral-fingerprint audio dedup ------------------------------------------
AUDIO_FP_SCHEMA = "asset_id long, afp long"
AUDIO_FP_FRAMES = 8  # time frames
AUDIO_FP_FBANDS = 9  # spectral bands -> 8 sign bits per frame


def audio_fingerprint(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """64-bit spectral fingerprint per audio asset (Haitsma–Kalker 2002
    shape, sized to the pigeonhole banding): split the samples into
    ``AUDIO_FP_FRAMES`` frames, take each frame's magnitude spectrum
    (rFFT, DC dropped), sum energy into ``AUDIO_FP_FBANDS`` equal bands,
    and emit one bit per (frame, band-pair) — the sign of the
    band-energy difference, temporally differenced against the previous
    frame (the first frame keeps its plain band differences). Sign-of-
    difference bits survive level changes, re-quantization and mild
    additive noise, so near-copies land within a few bits — the audio
    twin of the image aHash. Only the fingerprint extraction is Python
    (Arrow-batched mapInPandas); matching is native columnar.

    ``decode="real"`` decodes RIFF/WAVE PCM in-repo; other audio codecs
    (mp3/flac/opus) genuinely need torchcodec and raise."""

    def fp_of(x: np.ndarray) -> np.int64:
        x = np.asarray(x, dtype=np.float64)
        if x.size < AUDIO_FP_FRAMES:
            x = np.pad(x, (0, AUDIO_FP_FRAMES - x.size))
        energies = []
        for fr in np.array_split(x, AUDIO_FP_FRAMES):
            mag = np.abs(np.fft.rfft(fr))
            spec = mag[1:] if mag.size > 1 else mag  # drop DC
            bands = np.array_split(spec, AUDIO_FP_FBANDS)
            energies.append(
                [float(np.sum(np.square(bd))) if bd.size else 0.0 for bd in bands]
            )
        e = np.asarray(energies)  # (frames, fbands)
        d = e[:, :-1] - e[:, 1:]  # (frames, fbands-1) band diffs
        dd = np.vstack([d[:1], d[1:] - d[:-1]])  # temporal difference
        h = 0
        for bit in (dd > 0).flatten():
            h = (h << 1) | int(bit)
        return np.int64(np.uint64(h).astype(np.int64))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            fps = []
            for content, meta in zip(b["content"], b["meta"]):
                if decode == "fake":
                    x = (
                        np.frombuffer(bytes(content), dtype=np.uint8).astype(np.float32)
                        - 128.0
                    ) / 128.0
                elif str(meta["codec"]).lower() in ("wav", "wave"):
                    x = _decode_wav(content)
                else:
                    raise NotImplementedError(
                        f"real audio decode for codec {meta['codec']!r} requires torchcodec"
                    )
                fps.append(fp_of(x))
            yield pd.DataFrame({"asset_id": b["asset_id"], "afp": fps})

    return assets.mapInPandas(run, AUDIO_FP_SCHEMA)


def audio_dup_pairs(fingerprints: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Audio near-dup pairs with Hamming(afp) ≤ ``max_hamming`` via the
    exact pigeonhole banding (see :func:`_banded_hash_pairs`) — never
    all-pairs, no false negatives within the banding's Hamming budget."""
    return _banded_hash_pairs(fingerprints, "afp", max_hamming)


# --- Video near-dup dedup (frame-hash banding) --------------------------------
VIDEO_FH_SCHEMA = "asset_id long, frame_idx int, fhash long"
VIDEO_MIN_MATCH_FRAC = 0.5


def video_frame_hashes(
    assets: DataFrame, every_n: int = 4, decode: str = "fake"
) -> DataFrame:
    """Per sampled frame, the 64-bit aHash — the video twin of the image
    path: ``decode="real"`` walks RIFF/AVI containers and aHashes each
    sampled MJPEG frame through the in-repo baseline-JPEG decoder; the
    stub path hashes the deterministic payload slice (plumbing-true, the
    codec honestly gated); other containers (mp4/mkv) genuinely need
    torchcodec and raise. One input row → n_frames/every_n rows (UDTF
    shape); only the extraction is Python (Arrow-batched mapInPandas)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_id, out_idx, out_h = [], [], []
            for asset_id, content, meta in zip(b["asset_id"], b["content"], b["meta"]):
                if decode == "fake":
                    n = int(meta["n_frames"])
                    frames = None
                elif str(meta["codec"]).lower() == "avi":
                    frames = _avi_mjpeg_frames(content)
                    n = len(frames)
                else:
                    raise NotImplementedError(
                        f"real video decode for codec {meta['codec']!r} requires torchcodec"
                    )
                for idx in range(0, n, every_n):
                    if frames is None:
                        payload = bytes(content)[idx : idx + 16]
                        h = np.int64(
                            np.uint64(
                                int.from_bytes(
                                    hashlib.md5(payload).digest()[:8], "big"
                                )
                            ).astype(np.int64)
                        )
                    else:
                        h = _ahash(_decode_jpeg(frames[idx]))
                    out_id.append(asset_id)
                    out_idx.append(idx)
                    out_h.append(h)
            yield pd.DataFrame(
                {"asset_id": out_id, "frame_idx": out_idx, "fhash": out_h}
            )

    return assets.mapInPandas(run, VIDEO_FH_SCHEMA)


def video_dup_pairs(
    frame_hashes: DataFrame,
    max_hamming: int = 3,
    min_match_frac: float = VIDEO_MIN_MATCH_FRAC,
) -> DataFrame:
    """(asset_a, asset_b, n_frames_a, n_frames_b, n_matched_a,
    n_matched_b, match_frac) for video pairs whose sampled frames
    near-match: the image pigeonhole banding applied at FRAME granularity
    (every frame pair within Hamming ``max_hamming`` is found exactly —
    no false negatives, never all-pairs), then rolled up per video pair.
    ``match_frac`` is the CONTAINMENT maximum — the matched fraction of
    whichever side is better covered — so a clip (a strict frame subset)
    of a longer video still reads 1.0. Pairs at or above
    ``min_match_frac`` survive.

    Scale shape: dd3's — the band self-join runs over DISTINCT frame-hash
    values only (:func:`_distinct_hash_band_pairs`: the hot-band
    degeneracy guard — a black-frame pile-up collapses to ONE banding row
    per distinct hash, so candidate count tracks hash diversity, not
    duplicate multiplicity), codegen popcount verify once per distinct
    hash pair, then two output-bounded expansion joins reconstruct the
    frame pairs (identical hashes at Hamming 0 directly; qualifying
    distinct-hash pairs via their member cross product — every emitted
    row is a true frame match), and two keyed aggregations roll up;
    frames themselves never shuffle (only 64-bit hashes)."""
    _require_banding_complete(max_hamming)
    members = frame_hashes.select(
        "asset_id", "frame_idx", F.col("fhash").alias("h")
    )
    ma, mb = members.alias("a"), members.alias("b")
    same = (
        ma.join(
            mb,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("a.frame_idx").alias("frame_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.col("b.frame_idx").alias("frame_b"),
        )
    )
    hp = _distinct_hash_band_pairs(frame_hashes, "fhash").filter(
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= max_hamming
    )
    cross = (
        hp.join(
            members.select(
                F.col("h").alias("ha"),
                F.col("asset_id").alias("ia"),
                F.col("frame_idx").alias("fa"),
            ),
            "ha",
        )
        .join(
            members.select(
                F.col("h").alias("hb"),
                F.col("asset_id").alias("ib"),
                F.col("frame_idx").alias("fb"),
            ),
            "hb",
        )
        .filter(F.col("ia") != F.col("ib"))
        .select(
            F.least("ia", "ib").alias("asset_a"),
            F.when(F.col("ia") < F.col("ib"), F.col("fa"))
            .otherwise(F.col("fb"))
            .alias("frame_a"),
            F.greatest("ia", "ib").alias("asset_b"),
            F.when(F.col("ia") < F.col("ib"), F.col("fb"))
            .otherwise(F.col("fa"))
            .alias("frame_b"),
        )
    )
    matched = same.unionByName(cross)
    per_pair = matched.groupBy("asset_a", "asset_b").agg(
        F.count_distinct("frame_a").alias("n_matched_a"),
        F.count_distinct("frame_b").alias("n_matched_b"),
    )
    counts = frame_hashes.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    frac = F.greatest(
        F.col("n_matched_a") / F.col("n_frames_a"),
        F.col("n_matched_b") / F.col("n_frames_b"),
    )
    return (
        per_pair.join(
            counts.select(
                F.col("asset_id").alias("asset_a"), F.col("n_frames").alias("n_frames_a")
            ),
            "asset_a",
        )
        .join(
            counts.select(
                F.col("asset_id").alias("asset_b"), F.col("n_frames").alias("n_frames_b")
            ),
            "asset_b",
        )
        .withColumn("match_frac", F.round(frac, 6))
        .filter(F.col("match_frac") >= min_match_frac)
        .select(
            "asset_a", "asset_b", "n_frames_a", "n_frames_b",
            "n_matched_a", "n_matched_b", "match_frac",
        )
        .orderBy("asset_a", "asset_b")
    )


# --- Cross-modal: image-in-video containment search ---------------------------


def image_in_video_pairs(
    image_hashes: DataFrame,
    frame_hashes: DataFrame,
    max_hamming: int = 3,
) -> DataFrame:
    """(asset_img, asset_vid, n_matched_frames, n_frames, match_frac,
    best_hamming): which videos CONTAIN which images — an image matches a
    video when at least one sampled frame's aHash is within Hamming
    ``max_hamming`` of the image's. The cross-modal dedup/provenance
    question a multimodal training corpus asks ("is this still a frame
    grab of a video we already hold?"); both sides share the 64-bit
    aHash space (``perceptual_hash`` / ``video_frame_hashes``), so the
    match is the same exact pigeonhole banding, made BIPARTITE.

    Scale shape: distinct image hashes band-join distinct frame hashes
    through :func:`_bipartite_distinct_band_pairs` — the hot-band
    degeneracy guard holds on BOTH sides in BOTH regimes: identical-hash
    pile-ups (a black test card, a black-frame pile) collapse to one
    banding row each, and residual hot bands (many DISTINCT hashes
    sharing one 16-bit band value — letterboxed frames, shared title
    cards) route through the recursive 12-bit sub-band pigeonhole
    instead of the bipartite cross product. Codegen popcount verify once
    per distinct cross pair, output-bounded expansion to (image, frame)
    matches, one keyed roll-up per (image, video). No self-join, never
    all-pairs."""
    _require_banding_complete(max_hamming)
    hp = (
        _bipartite_distinct_band_pairs(image_hashes, "phash", frame_hashes, "fhash")
        .select(F.col("hl").alias("hi"), F.col("hr").alias("hf"))
        .withColumn("hamming", F.bit_count(F.col("hi").bitwiseXOR(F.col("hf"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    matched = (
        hp.join(
            image_hashes.select(
                F.col("phash").alias("hi"), F.col("asset_id").alias("asset_img")
            ),
            "hi",
        )
        .join(
            frame_hashes.select(
                F.col("fhash").alias("hf"),
                F.col("asset_id").alias("asset_vid"),
                "frame_idx",
            ),
            "hf",
        )
    )
    per_pair = matched.groupBy("asset_img", "asset_vid").agg(
        F.count_distinct("frame_idx").alias("n_matched_frames"),
        F.min("hamming").alias("best_hamming"),
    )
    counts = frame_hashes.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    return (
        per_pair.join(
            counts.select(F.col("asset_id").alias("asset_vid"), "n_frames"),
            "asset_vid",
        )
        .select(
            "asset_img",
            "asset_vid",
            "n_matched_frames",
            "n_frames",
            F.round(F.col("n_matched_frames") / F.col("n_frames"), 6).alias(
                "match_frac"
            ),
            "best_hamming",
        )
        .orderBy("asset_img", "asset_vid")
    )
