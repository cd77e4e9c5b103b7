"""Pure-numpy PNG codec — no PIL/libpng dependency (zlib is stdlib).

Decoder: every legal depth/color combination in the spec — bit depths
1/2/4 (bit-packed gray and palette; gray scales to the full 8-bit
range), 8, and 16 (big-endian uint16 out), all five color types
(grayscale 0, RGB 2, palette 3, gray+alpha 4, RGBA 6), all five
scanline filters (None/Sub/Up/Average/Paeth — filters run over the
byte stream, so the left neighbor is max(1, channels·depth/8) bytes
back per spec), both interlace methods (sequential and Adam7 — each of
the 7 passes unfilters as its own sub-image and scatters onto the
pixel grid), multi-IDAT streams, tRNS palette alpha. Illegal
depth/color combinations raise ValueError naming them. Together with the baseline-JPEG codec (multimodal/jpeg.py)
and the PPM/BMP readers (multimodal/binary_ops.py) this makes every
common still-image container decodable natively; the reference has no
image surface at all (/root/reference/src/main.rs ships only a Parquet
demo), so this serves the multimodal extension family (mm_* queries,
ahash64, image_stats).

Encoder: the test-fixture counterpart — writes 8-bit gray/RGB/RGBA with
a caller-chosen scanline filter (default Paeth, so roundtrips exercise
the decoder's hardest unfilter path), zlib-compressed, single IDAT.
Lossless: decode(encode(a)) == a exactly.

Scale note: like the JPEG codec this runs inside Arrow-batched
mapInPandas kernels (image_stats / extract_features) — per-row Python on
thumbnail-scale payloads, never in a shuffle or on the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Adam7 passes: (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]

#: legal bit depths per color type (PNG spec §11.2.2)
_LEGAL_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                 4: (8, 16), 6: (8, 16)}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §6.6): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering. ``raw`` is h rows of
    (1 filter byte + stride data bytes); returns (h, stride) uint8.

    None/Up are fully vectorized; Sub is a per-byte-lane prefix sum
    (mod-256 cumsum); Average/Paeth have a true left-neighbor data
    dependency, so those rows fall back to a per-byte Python loop —
    fixture-scale payloads only, same budget as the JPEG Huffman loop."""
    rows = raw.reshape(h, 1 + stride)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:]
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            cur = line.astype(np.uint64).reshape(-1)
            for lane in range(bpp):
                lane_view = cur[lane::bpp]
                np.cumsum(lane_view, out=lane_view)
            cur = (cur & 0xFF).astype(np.uint8)
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256, exactly the spec
        elif ftype == 3:  # Average
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype} on row {y}")
        out[y] = cur
        prev = cur
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to (h, w) or (h, w, channels) — uint8,
    except depth 16 which yields uint16.

    Supports every legal depth (1/2/4/8/16) and color type (0/2/3/4/6)
    combination, both interlace methods, multiple IDAT chunks, tRNS
    alpha for palette images."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    palette = None
    trns = None
    idat = []
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc (crc not verified)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if color not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color}")
    if depth not in _LEGAL_DEPTHS.get(color, ()):
        raise ValueError(
            f"PNG bit depth {depth} is illegal for color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if not idat:
        raise ValueError("PNG missing IDAT")
    ch = _CHANNELS[color]
    # filters see BYTES: the left neighbor is bpp bytes back (1 byte
    # for sub-byte depths, per spec)
    bpp = max(1, ch * depth // 8)

    def pixels(rows: np.ndarray, width: int) -> np.ndarray:
        """(n, scanline_bytes) decoded bytes -> (n, width, pixel_bytes);
        sub-byte depths unpack bit-packed samples (one per pixel)."""
        if depth >= 8:
            return rows.reshape(rows.shape[0], width, bpp)
        bits = np.unpackbits(rows, axis=1)[:, :width * depth]
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        samp = (bits.reshape(rows.shape[0], width, depth)
                * weights).sum(axis=2).astype(np.uint8)
        return samp[:, :, None]

    def scan_bytes(width: int) -> int:
        return -(-(width * ch * depth) // 8)  # ceil

    pxb = bpp if depth >= 8 else 1  # bytes per pixel in sample space
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if interlace == 0:
        stride = scan_bytes(w)
        if raw.size != h * (1 + stride):
            raise ValueError(
                f"PNG data size {raw.size} != expected {h * (1 + stride)}")
        img = pixels(_unfilter(raw, h, stride, bpp), w)
    else:  # Adam7: 7 independently-filtered sub-images, scattered
        img = np.zeros((h, w, pxb), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = max(0, -(-(w - x0) // dx))
            ph = max(0, -(-(h - y0) // dy))
            if pw == 0 or ph == 0:
                continue
            stride = scan_bytes(pw)
            need = ph * (1 + stride)
            sub = raw[pos:pos + need]
            if sub.size != need:
                raise ValueError(
                    f"PNG data size {raw.size} short of Adam7 passes")
            pos += need
            img[y0::dy, x0::dx] = pixels(_unfilter(sub, ph, stride, bpp),
                                         pw)
        if pos != raw.size:
            raise ValueError(
                f"PNG data size {raw.size} != Adam7 expectation {pos}")
    if depth == 16:  # network byte order -> native uint16 samples
        img = np.ascontiguousarray(img).view(">u2").astype(np.uint16) \
                .reshape(h, w, ch)
    elif depth < 8 and color == 0:  # gray: scale to full 8-bit range
        img = img * np.uint8(255 // ((1 << depth) - 1))
    if color == 3:  # palette expansion
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[:, :, 0]
        if idx.max(initial=0) >= palette.shape[0]:
            raise ValueError("PNG palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(palette.shape[0], 255, dtype=np.uint8)
            alpha[:trns.size] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if ch == 1:
        return img[:, :, 0]
    return img


def _filter_rows(sub: np.ndarray, ch: int, filter_type: int) -> bytes:
    """Filter the rows of one (sub-)image (h, w*ch int16) per the PNG
    scanline scheme; returns the (1 filter byte + data) row stream."""
    prev = np.zeros(sub.shape[1], dtype=np.int16)
    lines = []
    for y in range(sub.shape[0]):
        cur = sub[y]
        left = np.zeros_like(cur)
        left[ch:] = cur[:-ch]
        if filter_type == 0:
            f = cur
        elif filter_type == 1:
            f = cur - left
        elif filter_type == 2:
            f = cur - prev
        elif filter_type == 3:
            f = cur - ((left + prev) >> 1)
        else:  # Paeth
            ul = np.zeros_like(prev)
            ul[ch:] = prev[:-ch]
            pred = np.array([_paeth(int(l), int(u), int(c))
                             for l, u, c in zip(left, prev, ul)],
                            dtype=np.int16)
            f = cur - pred
        lines.append(bytes([filter_type]) + (f & 0xFF).astype(np.uint8)
                     .tobytes())
        prev = cur
    return b"".join(lines)


def encode_png(arr, filter_type: int = 4, level: int = 6,
               interlace: bool = False, depth: int | None = None) -> bytes:
    """(h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA → PNG bytes.

    ``filter_type`` applies to every scanline (0=None 1=Sub 2=Up
    3=Average 4=Paeth — default Paeth so roundtrip tests hit the
    decoder's sequential unfilter path). ``interlace=True`` writes
    Adam7 (each pass filtered as its own sub-image). ``depth`` defaults
    to the dtype (uint16 → 16, else 8); 1/2/4 write bit-packed
    grayscale (2-D input only, sample values < 2**depth — note the
    DECODER scales these to the full 0..255 range per the PNG
    convention, so roundtrips compare against scaled values). Filters
    always run over the byte stream per spec. Lossless by
    construction."""
    arr = np.asarray(arr)
    if depth is None:
        depth = 16 if arr.dtype == np.uint16 else 8
    a = np.ascontiguousarray(arr,
                             dtype=np.uint16 if depth == 16 else np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3, 4):
        raise ValueError("encode_png expects (h,w), (h,w,3) or (h,w,4)")
    h, w, ch = a.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    if depth not in _LEGAL_DEPTHS[color]:
        raise ValueError(
            f"depth {depth} is illegal for {ch}-channel input")
    if depth < 8 and a.max(initial=0) >= (1 << depth):
        raise ValueError(f"samples exceed {depth}-bit range")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"invalid filter type {filter_type}")
    if depth == 16:  # filters run over the big-endian BYTE stream
        a = np.ascontiguousarray(a.astype(">u2")).view(np.uint8) \
              .reshape(h, w, ch * 2)
    bpp = max(1, a.shape[2] if depth >= 8 else ch * depth // 8)

    def scan(sub: np.ndarray) -> np.ndarray:
        """(n, pw, pixel_bytes) pixels -> (n, scanline_bytes)."""
        n = sub.shape[0]
        if depth >= 8:
            return sub.reshape(n, -1)
        shifts = np.arange(depth - 1, -1, -1, dtype=np.uint8)
        bits = ((sub[:, :, 0, None] >> shifts) & 1).astype(np.uint8)
        return np.packbits(bits.reshape(n, -1), axis=1)

    if interlace:
        body = b"".join(
            _filter_rows(scan(a[y0::dy, x0::dx]).astype(np.int16),
                         bpp, filter_type)
            for x0, y0, dx, dy in _ADAM7
            if len(range(y0, h, dy)) and len(range(x0, w, dx)))
    else:
        body = _filter_rows(scan(a).astype(np.int16), bpp, filter_type)
    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       1 if interlace else 0)
    idat = zlib.compress(body, level)
    return (_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))
