"""Pure-numpy PNG codec (multimodal/png.py) and its decode_image
integration — closes the "PNG decode absent without PIL" gap: the
NotImplementedError branch is now unreachable for 8-bit non-interlaced
PNG payloads (every color type, every scanline filter)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from mura_spark.multimodal.png import decode_png, encode_png


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randint(0, 256, shape).astype(np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_rgb_every_filter_lossless(filter_type):
    img = _rand((13, 17, 3), seed=filter_type)
    out = decode_png(encode_png(img, filter_type=filter_type))
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


@pytest.mark.parametrize("shape", [(1, 1), (1, 9), (9, 1), (24, 31),
                                   (5, 5, 3), (7, 3, 4)])
def test_roundtrip_shapes_and_channels(shape):
    img = _rand(shape, seed=len(shape) + shape[0])
    out = decode_png(encode_png(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_roundtrip_gradient_compresses_and_survives():
    x = np.linspace(0, 255, 64)
    img = np.stack(np.meshgrid(x, x)[0:1] * 3, axis=-1).astype(np.uint8)
    payload = encode_png(img)
    assert len(payload) < img.size  # filtering + zlib actually compress
    assert np.array_equal(decode_png(payload), img)


def test_decode_is_deterministic():
    payload = encode_png(_rand((16, 16, 3), seed=3))
    assert np.array_equal(decode_png(payload), decode_png(payload))


def test_multi_idat_stream_decodes():
    img = _rand((8, 8, 3), seed=5)
    payload = encode_png(img, filter_type=0)
    # split the single IDAT into two chunks: spec allows any split
    sig, rest = payload[:8], payload[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        length, ctype = struct.unpack_from(">I4s", rest, pos)
        chunks.append((ctype, rest[pos + 8:pos + 8 + length]))
        pos += 12 + length
    out = sig
    for ctype, data in chunks:
        parts = [data[:7], data[7:]] if ctype == b"IDAT" else [data]
        for p in parts:
            out += (struct.pack(">I", len(p)) + ctype + p
                    + struct.pack(">I", zlib.crc32(ctype + p)))
    assert np.array_equal(decode_png(out), img)


def test_palette_png_expands_to_rgb_and_trns_alpha():
    # hand-build a 2x3 color-type-3 image over a 4-entry palette
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                       dtype=np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    base = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", palette.tobytes())
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
    out = decode_png(base)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out, palette[idx])
    # with tRNS: entry 0 transparent, others default opaque
    with_trns = (base[:8 + 25 + 12 + len(palette.tobytes())]
                 + chunk(b"tRNS", b"\x00")
                 + base[8 + 25 + 12 + len(palette.tobytes()):])
    out_a = decode_png(with_trns)
    assert out_a.shape == (2, 3, 4)
    assert np.array_equal(out_a[:, :, :3], palette[idx])
    expected_alpha = np.where(idx == 0, 0, 255)
    assert np.array_equal(out_a[:, :, 3], expected_alpha)


def test_gray_alpha_color_type_4():
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))
    ga = _rand((4, 5, 2), seed=11)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(4))
    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 8, 4, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), ga)


def test_illegal_depth_color_combinations_rejected():
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))
    # RGB at depth 4 and palette at depth 16 are illegal per spec
    for depth, color in [(4, 2), (16, 3), (2, 6)]:
        payload = (b"\x89PNG\r\n\x1a\n"
                   + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, depth,
                                                color, 0, 0, 0))
                   + chunk(b"IDAT", zlib.compress(b"\x00" * 6))
                   + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="illegal"):
            decode_png(payload)


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_sub8_gray_roundtrip_scaled(depth, interlace):
    rng = np.random.RandomState(depth)
    # widths straddling byte boundaries exercise the bit packing
    for w in (1, 7, 8, 9, 13):
        samples = rng.randint(0, 1 << depth, (5, w)).astype(np.uint8)
        out = decode_png(encode_png(samples, depth=depth, filter_type=1,
                                    interlace=interlace))
        scale = 255 // ((1 << depth) - 1)
        assert np.array_equal(out, samples * scale), (depth, w)


def test_sub8_palette_decodes_indices():
    import struct as _s
    def chunk(ctype, data):
        return (_s.pack(">I", len(data)) + ctype + data
                + _s.pack(">I", zlib.crc32(ctype + data)))
    palette = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9], [10, 11, 12]],
                       dtype=np.uint8)
    idx = np.array([[0, 1, 2, 3, 2], [3, 2, 1, 0, 1]], dtype=np.uint8)
    # 2-bit palette: 5 samples -> 10 bits -> 2 bytes per scanline
    rows = b""
    for y in range(2):
        bits = "".join(format(v, "02b") for v in idx[y])
        bits += "0" * (-len(bits) % 8)
        rows += b"\x00" + int(bits, 2).to_bytes(len(bits) // 8, "big")
    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", _s.pack(">IIBBBBB", 5, 2, 2, 3, 0, 0, 0))
               + chunk(b"PLTE", palette.tobytes())
               + chunk(b"IDAT", zlib.compress(rows))
               + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), palette[idx])


def test_encoder_rejects_out_of_range_sub8_samples():
    with pytest.raises(ValueError, match="exceed"):
        encode_png(np.full((2, 2), 4, dtype=np.uint8), depth=2)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_16bit_roundtrip_lossless(filter_type, interlace):
    rng = np.random.RandomState(filter_type + 10 * interlace)
    img = rng.randint(0, 65536, (9, 7, 3)).astype(np.uint16)
    out = decode_png(encode_png(img, filter_type=filter_type,
                                interlace=interlace))
    assert out.dtype == np.uint16
    assert np.array_equal(out, img)


def test_16bit_gray_and_rgba_roundtrip():
    rng = np.random.RandomState(3)
    gray = rng.randint(0, 65536, (5, 11)).astype(np.uint16)
    out = decode_png(encode_png(gray))
    assert out.dtype == np.uint16 and np.array_equal(out, gray)
    rgba = rng.randint(0, 65536, (4, 6, 4)).astype(np.uint16)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


@pytest.mark.parametrize("shape", [(1, 1), (7, 9), (8, 8, 3), (13, 5, 4),
                                   (2, 11), (16, 17, 3)])
def test_adam7_interlaced_roundtrip_lossless(shape):
    img = _rand(shape, seed=sum(shape))
    out = decode_png(encode_png(img, interlace=True))
    assert np.array_equal(out, img)


def test_adam7_equals_sequential_decode():
    img = _rand((21, 19, 3), seed=77)
    seq = decode_png(encode_png(img, interlace=False))
    adam = decode_png(encode_png(img, interlace=True, filter_type=2))
    assert np.array_equal(seq, adam)


def test_adam7_truncated_stream_rejected():
    img = _rand((9, 9, 3), seed=5)
    payload = bytearray(encode_png(img, interlace=True, filter_type=0))
    pos = 8
    while True:
        length, ctype = struct.unpack_from(">I4s", bytes(payload), pos)
        if ctype == b"IDAT":
            data = zlib.decompress(bytes(payload[pos + 8:pos + 8 + length]))
            short = zlib.compress(data[:-5])
            payload[pos:pos + 8 + length] = (
                struct.pack(">I", len(short)) + b"IDAT" + short)
            break
        pos += 12 + length
    with pytest.raises(ValueError, match="data size"):
        decode_png(bytes(payload))


def test_truncated_and_non_png_rejected():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a....")
    img = _rand((4, 4, 3), seed=2)
    payload = bytearray(encode_png(img, filter_type=0))
    # corrupt the decompressed length by dropping the last data row
    # from the IDAT payload: size check must trip, not silent garbage
    pos = 8
    while True:
        length, ctype = struct.unpack_from(">I4s", bytes(payload), pos)
        if ctype == b"IDAT":
            data = zlib.decompress(bytes(payload[pos + 8:pos + 8 + length]))
            short = zlib.compress(data[:-13])
            payload[pos:pos + 8 + length] = (
                struct.pack(">I", len(short)) + b"IDAT" + short)
            break
        pos += 12 + length
    with pytest.raises(ValueError, match="data size"):
        decode_png(bytes(payload))


def test_decode_image_dispatches_png():
    from mura_spark.multimodal.binary_ops import decode_image
    img = _rand((9, 12, 3), seed=21)
    assert np.array_equal(decode_image(encode_png(img)), img)
    gray = _rand((6, 6), seed=22)
    assert np.array_equal(decode_image(encode_png(gray)), gray)


def test_property_roundtrip_random_sizes_filters():
    rng = np.random.RandomState(42)
    for trial in range(20):
        h, w = rng.randint(1, 40), rng.randint(1, 40)
        ch = rng.choice([0, 3, 4])
        shape = (h, w) if ch == 0 else (h, w, ch)
        img = rng.randint(0, 256, shape).astype(np.uint8)
        ft = int(rng.randint(0, 5))
        out = decode_png(encode_png(img, filter_type=ft))
        assert np.array_equal(out, img), (shape, ft)
