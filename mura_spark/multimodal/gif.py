"""Pure-numpy GIF decoder and fixture encoder (no PIL).

Completes the repo's native legacy-format coverage (PPM/BMP/JPEG/PNG
already decode for real — multimodal/binary_ops.py): GIF87a/89a with
global and local color tables, variable-width LZW, interlaced images,
GIF89a transparency (decodes to RGBA), and multi-frame animations
(``frame=`` selects one; frames are composited per the disposal
basics a first-frame/any-frame reader needs — draw onto the previous
canvas, the dominant disposal-1 behavior). The encoder exists to make
the decoder testable offline: global palette, LZW with dictionary
reset, optional interlace/transparency/multi-frame.

Spec: GIF89a (CompuServe, public specification); LZW per the spec's
variable-code-size variant (initial width = min_code_size + 1, codes
grow at 2^width, 12-bit cap, CLEAR resets the table).
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------- LZW

def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width, next_code
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1
        next_code = end + 1

    width = next_code = 0
    reset()
    acc = bits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
            elif code == next_code:
                entry = prev + [prev[0]]  # the KwKwK case
            else:
                raise ValueError(f"corrupt GIF: LZW code {code} "
                                 f"beyond table size {next_code}")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table.append(prev + [entry[0]])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = list(entry)
            if len(out) >= n_pixels:
                return out
    return out


def _lzw_encode(min_code_size: int, pixels: list[int]) -> bytes:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    run: tuple = ()
    for p in pixels:
        cand = run + (p,)
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the decoder's table lags the encoder's by ONE code (it
            # creates an entry only after reading the FOLLOWING code),
            # so the encoder widens one emission later than its own
            # count: when next_code passes 2^width
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = (p,)
    if run:
        emit(table[run], width)
    emit(end, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = idx[src]
            src += 1
    return out


# ----------------------------------------------------------- decode

def _sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        n = buf[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(buf[pos:pos + n])
        pos += n


def decode_gif(payload: bytes, frame: int = 0) -> np.ndarray:
    """Decode one frame to ``(h, w, 3)`` uint8 — or ``(h, w, 4)`` when
    any decoded frame carries GIF89a transparency. Frames composite
    onto the logical screen (disposal method 1 semantics)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    # canvas starts fully transparent: modern renderers ignore the
    # header background color, and a transparent first-frame pixel
    # must decode with alpha 0, not as painted background
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    alpha = np.zeros((h, w), dtype=np.uint8)
    transparent: int | None = None
    seen_transparency = False
    frames_done = 0
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gflags, _delay_lo, _delay_hi, tidx = data[0], \
                    data[1], data[2], data[3]
                transparent = tidx if gflags & 0x01 else None
                seen_transparency |= bool(gflags & 0x01)
            continue
        if b0 != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{b0:02x}")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB",
                                               payload[pos:pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(payload[pos:pos + 3 * n],
                               dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("corrupt GIF: no color table")
        min_code = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        idx = np.array(_lzw_decode(min_code, data, iw * ih),
                       dtype=np.int32)
        if idx.size < iw * ih:
            raise ValueError(
                f"corrupt GIF: {idx.size} of {iw * ih} pixels")
        idx = idx[:iw * ih].reshape(ih, iw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        region_rgb = ct[np.clip(idx, 0, len(ct) - 1)]
        if transparent is not None:
            opaque = idx != transparent
            sub_c = canvas[iy:iy + ih, ix:ix + iw]
            sub_a = alpha[iy:iy + ih, ix:ix + iw]
            sub_c[opaque] = region_rgb[opaque]
            sub_a[opaque] = 255
        else:
            canvas[iy:iy + ih, ix:ix + iw] = region_rgb
            alpha[iy:iy + ih, ix:ix + iw] = 255
        if frames_done == frame:
            if seen_transparency:
                return np.dstack([canvas, alpha])
            return canvas.copy()
        frames_done += 1
        transparent = None
    raise ValueError(f"GIF has {frames_done} frame(s), "
                     f"frame {frame} requested")


def gif_frame_count(payload: bytes) -> int:
    """Number of image frames, from structure alone (no LZW work)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    flags = payload[10]
    pos = 13 + (3 * (2 << (flags & 0x07)) if flags & 0x80 else 0)
    count = 0
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:
            break
        if b0 == 0x21:
            pos += 1
            _, pos = _sub_blocks(payload, pos)
            continue
        if b0 != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{b0:02x}")
        iflags = payload[pos + 8]
        pos += 9
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 0x07))
        pos += 1  # min code size
        _, pos = _sub_blocks(payload, pos)
        count += 1
    return count


# ----------------------------------------------------------- encode

def _palettize(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF fixture encoder: {len(colors)} colors "
                         f"> 256 — quantize first")
    return colors, inverse.astype(np.int32).reshape(img.shape[:2])


def encode_gif(frames, interlace: bool = False,
               transparent_rgb: tuple | None = None) -> bytes:
    """Deterministic GIF89a fixture encoder. ``frames`` is one
    ``(h, w, 3)`` uint8 array or a list of same-shape arrays (an
    animation, one shared global palette). ``transparent_rgb`` marks
    that exact color transparent in every frame."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w = frames[0].shape[:2]
    stack = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inverse = np.unique(stack, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("more than 256 distinct colors across frames")
    depth = max(2, int(np.ceil(np.log2(max(len(colors), 2)))))
    n = 1 << depth
    palette = np.zeros((n, 3), dtype=np.uint8)
    palette[:len(colors)] = colors
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    tindex = None
    if transparent_rgb is not None:
        match = np.where((colors == np.array(transparent_rgb,
                                             dtype=np.uint8)).all(1))[0]
        if len(match):
            tindex = int(match[0])
    per_frame = np.split(inverse.astype(np.int32),
                         np.cumsum([f.shape[0] * f.shape[1]
                                    for f in frames])[:-1])
    for fi, idx_flat in enumerate(per_frame):
        idx = idx_flat.reshape(h, w)
        if tindex is not None:
            out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, tindex, 0])
        elif len(frames) > 1:
            out += bytes([0x21, 0xF9, 4, 0x00, 0, 0, 0, 0])
        iflags = 0x40 if interlace else 0
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, iflags)
        if interlace:
            rows = [y for start, step in _INTERLACE_PASSES
                    for y in range(start, h, step)]
            idx = idx[rows]
        min_code = max(2, depth)
        out.append(min_code)
        lzw = _lzw_encode(min_code, idx.reshape(-1).tolist())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
