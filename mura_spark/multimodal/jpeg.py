"""Pure-numpy JPEG codec (baseline SOF0/SOF1 + progressive SOF2) — no
PIL/libjpeg dependency.

Decoder: 8-bit, grayscale or YCbCr with any H/V sampling factors
(4:4:4, 4:2:2, 4:2:0, ...), restart markers, byte stuffing, and FULL
progressive decoding per ITU-T T.81 §G — spectral selection,
successive approximation (DC/AC first and refinement passes, EOBRUN,
correction bits), coefficients accumulated across scans and
reconstructed once at EOI. All quantization and Huffman tables are
read from the stream (DQT/DHT segments, between scans too), so any
spec-conformant baseline or progressive file decodes; lossless and
arithmetic-coded files raise NotImplementedError with the marker
named. Closes the decode gap noted for
``decode_image`` — the reference has no image surface at all
(/root/reference/src/main.rs ships only a Parquet demo), so this serves
the multimodal extension family (mm_* queries, ahash64, image_stats).

Encoder: the test-fixture counterpart — grayscale or color, 4:4:4 or
4:2:0, sequential or progressive (progressive=True writes a full scan
script and reconstructs the SAME quantized coefficients, so baseline
and progressive decodes are bit-identical — the roundtrip oracle),
standard Annex-K-style tables scaled by a quality factor and WRITTEN
INTO the stream (the decoder trusts the stream, never these
constants). Both sides are plain Python/numpy: fast enough for
fixtures and Arrow-batched per-row decode of thumbnail-scale payloads,
and fully deterministic (fixed IEEE ops, no SIMD reassociation).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- tables

#: zigzag scan: position k in the stream -> (row, col) in the 8x8 block
def _zigzag() -> list[tuple[int, int]]:
    order = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        for r in (reversed(rows) if s % 2 == 0 else rows):
            order.append((r, s - r))
    return order


_ZIGZAG = _zigzag()

#: orthonormal DCT-II matrix: F = _C @ f @ _C.T, f = _C.T @ F @ _C
_C = np.array([[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)])

#: Annex-K-style base quantization tables (natural order), luma/chroma
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99]).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99]).reshape(8, 8)

#: encoder Huffman specs (counts per code length 1..16, then symbols).
#: These only need to be valid prefix codes — they are serialized into
#: the DHT segment, so the decoder reads them back from the stream.
#: flat tables: every symbol at one code length keeps construction
#: trivially canonical and decode unambiguous; they are serialized into
#: DHT, so conformance only requires a valid prefix code, not the
#: Annex-K statistics. DC categories 0..12 cover the worst-case diff of
#: +-2048 (orthonormal DC <= 1024 at q=1); AC sizes 1..11 cover
#: |coef| <= 1024.
_DC_SYMBOLS = list(range(13))
_DC_COUNTS = [0] * 16
_DC_COUNTS[7] = len(_DC_SYMBOLS)  # all 13 DC symbols at 8 bits
_AC_SYMBOLS = ([0x00, 0xF0]
               + [(r << 4) | s for r in range(16) for s in range(1, 12)])
_AC_COUNTS = [0] * 16
_AC_COUNTS[8] = len(_AC_SYMBOLS)  # all 178 symbols at 9 bits


def _canonical_codes(counts, symbols):
    """(symbol -> (code, length)) for a canonical Huffman table."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# --------------------------------------------------------------- decode

class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; RSTn markers are surfaced to the caller."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self):
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt - 0xD0)
            else:
                raise EOFError(f"marker 0x{nxt:02x} inside scan")
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        return out

    def align(self):
        self.nbits = 0
        self.bits = 0

    def skip_restart(self):
        # consume the FFDn marker after align()
        assert self.buf[self.pos] == 0xFF
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, n):
        self.n = n


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _parse_dqt(seg: bytes, qtables: dict) -> None:
    i = 0
    while i < len(seg):
        pq, tq = seg[i] >> 4, seg[i] & 0x0F
        i += 1
        if pq == 0:
            vals = np.frombuffer(seg, np.uint8, 64, i)
            i += 64
        else:
            vals = np.frombuffer(seg, ">u2", 64, i)
            i += 128
        q = np.zeros((8, 8))
        for k, (r, c) in enumerate(_ZIGZAG):
            q[r, c] = vals[k]
        qtables[tq] = q


def _parse_dht(seg: bytes, htables: dict) -> None:
    i = 0
    while i < len(seg):
        tc, th = seg[i] >> 4, seg[i] & 0x0F
        counts = list(seg[i + 1:i + 17])
        n = sum(counts)
        symbols = list(seg[i + 17:i + 17 + n])
        i += 17 + n
        table, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                table[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        htables[(tc, th)] = table


def _parse_sos(seg: bytes) -> dict:
    """SOS segment -> {comps: [(cid, td, ta)], ss, se, ah, al}."""
    ns = seg[0]
    comps = []
    for c in range(ns):
        cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        comps.append((cid, tt >> 4, tt & 0x0F))
    ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    return {"comps": comps, "ss": ss, "se": se,
            "ah": a >> 4, "al": a & 0x0F}


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline or progressive JPEG -> (h, w) uint8 (grayscale) or
    (h, w, 3) uint8 RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode map
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # parameterless
        seglen = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qtables)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, htables)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding (SOF marker 0xFF{marker:02X}); "
                "baseline sequential (SOF0/SOF1) and progressive (SOF2) "
                "are supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise ValueError("SOS before SOF")
            if frame["progressive"]:
                return _decode_progressive(payload, pos, frame,
                                           _parse_sos(seg), qtables,
                                           htables, restart_interval)
            scan = {cid: (td, ta)
                    for cid, td, ta in _parse_sos(seg)["comps"]}
            missing = [c["id"] for c in frame["comps"]
                       if c["id"] not in scan]
            if missing:
                # T.81 allows baseline frames split across several
                # sequential scans; this decoder handles the (near-
                # universal) single-interleaved-scan layout only.
                # NotImplementedError (not KeyError) so decode_image's
                # PIL fallback can take over when available.
                raise NotImplementedError(
                    f"multi-scan baseline JPEG (first scan lacks "
                    f"component(s) {missing})")
            return _decode_scan(payload, pos, frame, scan, qtables,
                                htables, restart_interval)
        # APPn/COM/others: skipped
    raise ValueError("no SOS segment found")


def _decode_scan(payload, pos, frame, scan, qtables, htables,
                 restart_interval):
    comps = frame["comps"]
    if len(comps) == 1:
        # T.81 §A.2: a single-component scan is NON-interleaved — the
        # MCU is one 8x8 block rastered over the component's own grid,
        # and the frame's sampling factors (which only define
        # multi-component interleave geometry) are ignored. A grayscale
        # SOF0 declaring h=v=2 would otherwise decode 2x2 block groups
        # the stream never encoded.
        comps = [{**comps[0], "h": 1, "v": 1}]
        frame = {**frame, "comps": comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-frame["w"] // mcu_w)
    mcus_y = -(-frame["h"] // mcu_h)
    planes = []
    for c in comps:
        pw, ph = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw)))
    reader = _BitReader(payload, pos)
    preds = [0] * len(comps)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                reader.align()
                reader.skip_restart()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                dc_t = htables[(0, td)]
                ac_t = htables[(1, ta)]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros((8, 8))
                        s = _huff_decode(reader, dc_t)
                        diff = _extend(reader.read(s), s)
                        preds[ci] += diff
                        coef[0, 0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(reader, ac_t)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 0x0F
                            r, cc = _ZIGZAG[k]
                            coef[r, cc] = _extend(reader.read(size),
                                                  size)
                            k += 1
                        block = _C.T @ (coef * q) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            n_mcu += 1
    return _assemble(frame, planes, hmax, vmax)


# --------------------------------------------------- progressive decode

def _next_marker(payload: bytes, pos: int) -> int:
    """Scan forward to the next real marker (skips stuffed FF00 and
    stray RSTn left at the end of an entropy segment)."""
    while pos < len(payload) - 1:
        if payload[pos] == 0xFF and payload[pos + 1] not in (0x00,) \
                and not (0xD0 <= payload[pos + 1] <= 0xD7):
            return pos
        pos += 1
    raise ValueError("ran off the end of the JPEG stream")


def _decode_progressive(payload, pos, frame, scan, qtables, htables,
                        restart_interval):
    """Progressive (SOF2) decode: accumulate DCT coefficients across
    every scan (spectral selection + successive approximation, per
    ITU-T T.81 §G), then dequantize/IDCT once at EOI.

    Supports all four scan procedures — DC first/refine (interleaved or
    not) and AC first/refine (EOBRUN, ZRL, correction bits) — plus
    between-scan DHT/DQT/DRI updates and restart intervals inside any
    scan."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    for c in comps:
        c["bx"], c["by"] = mcus_x * c["h"], mcus_y * c["v"]  # MCU-padded
        cw = -(-frame["w"] * c["h"] // hmax)   # real component extent
        chh = -(-frame["h"] * c["v"] // vmax)
        c["nbx"], c["nby"] = -(-cw // 8), -(-chh // 8)
    coefs = {c["id"]: np.zeros((c["by"], c["bx"], 64), dtype=np.int64)
             for c in comps}
    by_id = {c["id"]: c for c in comps}

    while True:
        pos = _decode_prog_scan(payload, pos, frame, scan, coefs, by_id,
                                htables, restart_interval, mcus_x,
                                mcus_y)
        # between-scan marker loop
        while True:
            pos = _next_marker(payload, pos)
            marker = payload[pos + 1]
            pos += 2
            if marker == 0xD9:  # EOI: reconstruct
                planes = []
                for c in comps:
                    q = qtables[c["tq"]]
                    arr = coefs[c["id"]]
                    plane = np.zeros((c["by"] * 8, c["bx"] * 8))
                    coef = np.zeros((8, 8))
                    for by in range(c["by"]):
                        for bx in range(c["bx"]):
                            zz = arr[by, bx]
                            for k, (r, cc) in enumerate(_ZIGZAG):
                                coef[r, cc] = zz[k]
                            plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] \
                                = _C.T @ (coef * q) @ _C + 128.0
                    planes.append(plane)
                return _assemble(frame, planes, hmax, vmax)
            seglen = struct.unpack_from(">H", payload, pos)[0]
            seg = payload[pos + 2:pos + seglen]
            pos += seglen
            if marker == 0xDB:
                _parse_dqt(seg, qtables)
            elif marker == 0xC4:
                _parse_dht(seg, htables)
            elif marker == 0xDD:
                restart_interval = struct.unpack_from(">H", seg, 0)[0]
            elif marker == 0xDA:
                scan = _parse_sos(seg)
                break  # entropy data follows: decode the next scan
            # APPn/COM: skip


def _decode_prog_scan(payload, pos, frame, scan, coefs, by_id, htables,
                      restart_interval, mcus_x, mcus_y):
    """One progressive scan; returns the stream position after it."""
    reader = _BitReader(payload, pos)
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    ids = [cid for cid, _td, _ta in scan["comps"]]
    tabs = {cid: (td, ta) for cid, td, ta in scan["comps"]}
    interleaved = len(ids) > 1

    # scan-order block list: (component id, by, bx)
    order = []
    if interleaved:  # DC scans only, MCU order over the padded grid
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cid in ids:
                    c = by_id[cid]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            order.append((cid, my * c["v"] + by,
                                          mx * c["h"] + bx))
        unit = sum(by_id[cid]["v"] * by_id[cid]["h"] for cid in ids)
    else:  # single component: raster over its REAL block grid
        c = by_id[ids[0]]
        for by in range(c["nby"]):
            for bx in range(c["nbx"]):
                order.append((ids[0], by, bx))
        unit = 1

    preds = {cid: 0 for cid in ids}
    eobrun = 0
    n_units = 0

    def restart():
        nonlocal eobrun
        reader.align()
        reader.skip_restart()
        for cid in preds:
            preds[cid] = 0
        eobrun = 0

    for i, (cid, by, bx) in enumerate(order):
        if restart_interval and i % unit == 0:
            if (i // unit) and (i // unit) % restart_interval == 0:
                restart()
        blk = coefs[cid][by, bx]
        if ss == 0:  # DC scan (se must be 0)
            if ah == 0:  # first
                s = _huff_decode(reader, htables[(0, tabs[cid][0])])
                preds[cid] += _extend(reader.read(s), s)
                blk[0] = preds[cid] << al
            else:  # refinement: one bit
                if reader.read(1):
                    blk[0] |= 1 << al
        elif ah == 0:  # AC first pass
            if eobrun:
                eobrun -= 1
                continue
            ac_t = htables[(1, tabs[cid][1])]
            k = ss
            while k <= se:
                sym = _huff_decode(reader, ac_t)
                r, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read(r)
                    break
                k += r
                blk[k] = _extend(reader.read(s), s) << al
                k += 1
        else:  # AC refinement pass (T.81 §G.1.2.3 / libjpeg shape)
            ac_t = htables[(1, tabs[cid][1])]
            p1, m1 = 1 << al, -1 << al
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _huff_decode(reader, ac_t)
                    r, s = sym >> 4, sym & 0x0F
                    val = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read(r)
                            break
                        # r == 15: skip 16 zero-history coefficients
                    else:  # s must be 1 in a refinement scan
                        val = p1 if reader.read(1) else m1
                    while k <= se:
                        if blk[k] != 0:
                            if reader.read(1) and (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] >= 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val:
                        blk[k] = val
                    k += 1
            if eobrun > 0:  # refine the rest of the band, then count
                while k <= se:
                    if blk[k] != 0:
                        if reader.read(1) and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    k += 1
                eobrun -= 1
    return reader.pos


def _assemble(frame, planes, hmax, vmax):
    """Upsample component planes, crop, and color-convert — shared by
    the sequential and progressive reconstruction paths."""
    h, w = frame["h"], frame["w"]
    out = []
    for ci, c in enumerate(frame["comps"]):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(out[0].round(), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb.round(), 0, 255).astype(np.uint8)


# --------------------------------------------------------------- encode

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _size_of(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(writer, coef_q, pred, dc_codes, ac_codes):
    zz = np.array([coef_q[r, c] for (r, c) in _ZIGZAG], dtype=np.int64)
    diff = int(zz[0]) - pred
    s = _size_of(diff)
    writer.write(*dc_codes[s])
    if s:
        writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                writer.write(*ac_codes[0x00])  # EOB
                break
            run += 1
            continue
        while run >= 16:
            writer.write(*ac_codes[0xF0])
            run -= 16
        s = _size_of(v)
        writer.write(*ac_codes[(run << 4) | s])
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    return int(zz[0])


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


# ------------------------------------------------- progressive encode

def _emit_dc_first(writer, zz, pred, dc_codes, al):
    v = int(zz[0]) >> al  # DC point transform: arithmetic shift
    diff = v - pred
    s = _size_of(diff)
    writer.write(*dc_codes[s])
    if s:
        writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    return v


def _emit_ac_first(writer, zz, ss, se, al, ac_codes):
    """One block of an AC first pass: magnitudes right-shifted by al
    (truncation toward zero), run/ZRL/EOB coding; per-block EOB only
    (eobrun = 1), which every conformant decoder accepts."""
    def tval(k):
        v = int(zz[k])
        m = abs(v) >> al
        return m if v >= 0 else -m
    nz = [k for k in range(ss, se + 1) if tval(k) != 0]
    run = 0
    for k in range(ss, (nz[-1] if nz else ss - 1) + 1):
        v = tval(k)
        if v == 0:
            run += 1
            continue
        while run >= 16:
            writer.write(*ac_codes[0xF0])
            run -= 16
        s = _size_of(v)
        writer.write(*ac_codes[(run << 4) | s])
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if not nz or nz[-1] < se:
        writer.write(*ac_codes[0x00])  # EOB


def _emit_ac_refine(writer, zz, ss, se, al, ac_codes):
    """One block of an AC refinement pass (T.81 §G.1.2.3): newly
    nonzero coefficients code as (run, 1) + sign; coefficients already
    sent append correction bits in the positions the decoder's advance
    crosses them; ZRL every 16 zero-history zeros; EOB covers the tail.
    """
    def cls(k):
        av = abs(int(zz[k]))
        if (av >> (al + 1)) != 0:   # history nonzero: correction bit
            return "H", (av >> al) & 1
        if (av >> al) != 0:         # newly nonzero this pass
            return "N", 1 if int(zz[k]) > 0 else 0
        return "Z", 0

    kinds = [cls(k) for k in range(ss, se + 1)]
    last_new = max((i for i, (t, _b) in enumerate(kinds) if t == "N"),
                   default=None)
    run, pending = 0, []
    upto = -1 if last_new is None else last_new
    for i in range(0, upto + 1):
        t, b = kinds[i]
        if t == "H":
            pending.append(b)
        elif t == "Z":
            run += 1
            if run == 16:  # decoder's ZRL advance consumes 16 zeros
                writer.write(*ac_codes[0xF0])
                for bit in pending:
                    writer.write(bit, 1)
                pending, run = [], 0
        else:  # newly nonzero: (run, 1) + sign, then crossed H bits
            writer.write(*ac_codes[(run << 4) | 1])
            writer.write(b, 1)
            for bit in pending:
                writer.write(bit, 1)
            pending, run = [], 0
    tail = [b for (t, b) in kinds[upto + 1:] if t == "H"]
    if last_new is None or last_new < se - ss:
        writer.write(*ac_codes[0x00])  # EOB: refines the rest of band
        for bit in tail:
            writer.write(bit, 1)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((q * scale + 50) / 100), 1, 255)


def _encode_progressive(h, w, gray, padded, samp, qsel, qtabs,
                        dc_codes, ac_codes, hmax, vmax,
                        mcus_x, mcus_y) -> bytes:
    """Emit a progressive (SOF2) stream from the padded sample planes:
    DC first (Al=1, interleaved when multi-component), spectrally
    selected AC first passes (Al=1; luma split 1-5/6-63), then DC and
    AC refinement passes down to Al=0 — every scan procedure a real
    progressive decoder must implement, which is the point of the
    fixture."""
    ncomp = len(padded)
    zz_blocks = []
    real_grid = []
    for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
        q = qtabs[qsel[ci]]
        by, bx = p.shape[0] // 8, p.shape[1] // 8
        arr = np.zeros((by, bx, 64), dtype=np.int64)
        for yb in range(by):
            for xb in range(bx):
                block = p[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8] - 128.0
                cq = np.round((_C @ block @ _C.T) / q)
                arr[yb, xb] = [int(cq[r, c]) for (r, c) in _ZIGZAG]
        zz_blocks.append(arr)
        cw = -(-w * sh // hmax)
        chh = -(-h * sv // vmax)
        real_grid.append((-(-chh // 8), -(-cw // 8)))

    def dc_scan(ah, al) -> bytes:
        wtr = _BitWriter()
        preds = [0] * ncomp
        if ncomp > 1:  # interleaved MCU order over the padded grids
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci, (sh, sv) in enumerate(samp):
                        for by in range(sv):
                            for bx in range(sh):
                                zz = zz_blocks[ci][my * sv + by,
                                                   mx * sh + bx]
                                if ah == 0:
                                    preds[ci] = _emit_dc_first(
                                        wtr, zz, preds[ci], dc_codes, al)
                                else:
                                    wtr.write((int(zz[0]) >> al) & 1, 1)
        else:
            nby, nbx = real_grid[0]
            for by in range(nby):
                for bx in range(nbx):
                    zz = zz_blocks[0][by, bx]
                    if ah == 0:
                        preds[0] = _emit_dc_first(wtr, zz, preds[0],
                                                  dc_codes, al)
                    else:
                        wtr.write((int(zz[0]) >> al) & 1, 1)
        wtr.flush()
        return bytes(wtr.out)

    def ac_scan(ci, ss, se, ah, al) -> bytes:
        wtr = _BitWriter()
        nby, nbx = real_grid[ci]
        for by in range(nby):
            for bx in range(nbx):
                zz = zz_blocks[ci][by, bx]
                if ah == 0:
                    _emit_ac_first(wtr, zz, ss, se, al, ac_codes)
                else:
                    _emit_ac_refine(wtr, zz, ss, se, al, ac_codes)
        wtr.flush()
        return bytes(wtr.out)

    def sos(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # DC table 0 / AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qtabs[:1 if gray else 2]):
        out += _seg(0xDB, bytes([tq]) + bytes(
            int(q[r, c]) for (r, c) in _ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, qsel[ci])
    out += _seg(0xC2, sof)  # SOF2: progressive
    for tc, counts, symbols in ((0, _DC_COUNTS, _DC_SYMBOLS),
                                (1, _AC_COUNTS, _AC_SYMBOLS)):
        out += _seg(0xC4, bytes([tc << 4]) + bytes(counts)
                    + bytes(symbols))
    all_ids = list(range(1, ncomp + 1))
    bands = {ci: ([(1, 5), (6, 63)] if ci == 0 else [(1, 63)])
             for ci in range(ncomp)}
    out += sos(all_ids, 0, 0, 0, 1) + dc_scan(0, 1)
    for ci in range(ncomp):
        for ss, se in bands[ci]:
            out += sos([ci + 1], ss, se, 0, 1) + ac_scan(ci, ss, se, 0, 1)
    out += sos(all_ids, 0, 0, 1, 0) + dc_scan(1, 0)
    for ci in range(ncomp):
        for ss, se in bands[ci]:
            out += sos([ci + 1], ss, se, 1, 0) + ac_scan(ci, ss, se, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """(h, w) or (h, w, 3) uint8 -> baseline JPEG bytes.

    Color uses YCbCr; ``subsampling`` is ``"444"`` or ``"420"`` (2x2
    box-averaged chroma — exercises the decoder's multi-block MCU +
    upsampling path). Tables are written into DQT/DHT, so any
    conformant decoder (including :func:`decode_jpeg`) reads them back.
    ``restart_interval`` > 0 writes a DRI segment and emits RST0..RST7
    markers every that many MCUs (byte-aligned, DC predictors reset) —
    the resync structure camera JPEGs carry, and the decoder's
    restart path. ``progressive=True`` writes SOF2 with a full scan
    script (spectral selection + successive approximation); it
    reconstructs the SAME quantized coefficients as the baseline
    stream, so both decode bit-identically.
    """
    a = np.asarray(arr, dtype=np.float64)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    qly = _quality_scale(_Q_LUMA, quality)
    qlc = _quality_scale(_Q_CHROMA, quality)
    dc_codes = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
    ac_codes = _canonical_codes(_AC_COUNTS, _AC_SYMBOLS)

    if gray:
        planes = [a]
        samp = [(1, 1)]
        qsel = [0]
    else:
        y = (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
             + 0.114 * a[:, :, 2])
        cb = 128.0 + (a[:, :, 2] - y) / 1.772
        cr = 128.0 + (a[:, :, 0] - y) / 1.402
        if subsampling == "420":
            def down(p):
                ph, pw = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
                pp = np.pad(p, ((0, ph - p.shape[0]),
                                (0, pw - p.shape[1])), mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2]
                        + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4.0
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "444":
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcus_y * sv * 8, mcus_x * sh * 8
        padded.append(np.pad(p, ((0, ph - p.shape[0]),
                                 (0, pw - p.shape[1])), mode="edge"))

    if progressive:
        if restart_interval:
            raise ValueError(
                "restart markers with progressive scans not supported")
        return _encode_progressive(h, w, gray, padded, samp, qsel,
                                   [qly, qlc], dc_codes, ac_codes,
                                   hmax, vmax, mcus_x, mcus_y)

    writer = _BitWriter()
    preds = [0] * len(planes)
    qtabs = [qly, qlc]
    n_mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            n_mcu += 1
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                q = qtabs[qsel[ci]]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = _C @ block @ _C.T
                        coef_q = np.round(coef / q)
                        preds[ci] = _encode_block(
                            writer, coef_q, preds[ci], dc_codes,
                            ac_codes)
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    for tq, q in enumerate(qtabs[:1 if gray else 2]):
        zz = bytes(int(q[r, c]) for (r, c) in _ZIGZAG)
        out += _seg(0xDB, bytes([tq]) + zz)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, qsel[ci])
    out += _seg(0xC0, sof)
    for tc, counts, symbols in ((0, _DC_COUNTS, _DC_SYMBOLS),
                                (1, _AC_COUNTS, _AC_SYMBOLS)):
        body = bytes([tc << 4]) + bytes(counts) + bytes(symbols)
        out += _seg(0xC4, body)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0 for all
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
