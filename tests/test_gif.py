"""Pure-numpy GIF codec (multimodal/gif.py): LZW variable-width codes,
palettes, interlace, GIF89a transparency, animation frames. The core
invariant is LOSSLESS roundtrip — GIF is palette-exact, so encode →
decode must be bit-identical to the input frame."""

from __future__ import annotations

import numpy as np
import pytest

from mura_spark.multimodal.gif import (decode_gif, encode_gif,
                                       gif_frame_count)


def _img(h, w, colors=8, seed=0):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
    idx = rng.integers(0, colors, (h, w))
    return palette[idx]


def test_roundtrip_is_lossless():
    for h, w, colors, seed in [(1, 1, 2, 0), (7, 5, 4, 1),
                               (16, 16, 8, 2), (33, 21, 200, 3),
                               (64, 64, 256, 4)]:
        img = _img(h, w, colors, seed)
        got = decode_gif(encode_gif(img))
        assert got.shape == img.shape and (got == img).all(), \
            (h, w, colors)


def test_interlaced_roundtrip():
    for h in (1, 4, 7, 8, 9, 37):
        img = _img(h, 11, 16, seed=h)
        got = decode_gif(encode_gif(img, interlace=True))
        assert (got == img).all(), h


def test_lzw_dictionary_reset_path():
    # noise at 256 colors on a big image forces the 12-bit table to
    # fill and CLEAR mid-stream
    img = _img(120, 120, 256, seed=9)
    assert (decode_gif(encode_gif(img)) == img).all()


def test_transparency_decodes_to_rgba():
    img = np.zeros((6, 6, 3), dtype=np.uint8)
    img[2:4, 2:4] = [255, 0, 0]
    payload = encode_gif(img, transparent_rgb=(0, 0, 0))
    got = decode_gif(payload)
    assert got.shape == (6, 6, 4)
    assert (got[2:4, 2:4, 3] == 255).all()
    assert (got[0, 0, 3] == 0).all()
    assert (got[2:4, 2:4, :3] == [255, 0, 0]).all()


def test_animation_frames_and_count():
    f0 = np.zeros((5, 5, 3), dtype=np.uint8)
    f1 = f0.copy()
    f1[1, 1] = [0, 255, 0]
    f2 = f1.copy()
    f2[3, 3] = [255, 0, 0]
    payload = encode_gif([f0, f1, f2])
    assert gif_frame_count(payload) == 3
    assert (decode_gif(payload, frame=0) == f0).all()
    assert (decode_gif(payload, frame=1) == f1).all()
    assert (decode_gif(payload, frame=2) == f2).all()
    with pytest.raises(ValueError, match="frame 3"):
        decode_gif(payload, frame=3)


def test_corrupt_payloads_refuse():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTAGIF" * 4)
    good = encode_gif(_img(8, 8, 4))
    with pytest.raises(ValueError):
        decode_gif(good[:20])  # truncated mid-structure
    with pytest.raises(ValueError, match="> 256|256 distinct"):
        encode_gif(np.arange(20 * 20 * 3, dtype=np.uint8)
                   .reshape(20, 20, 3) * 0 +
                   np.random.default_rng(0)
                   .integers(0, 256, (20, 20, 3)).astype(np.uint8))


def test_decode_image_dispatches_gif(spark):
    from mura_spark.multimodal.binary_ops import decode_image
    img = _img(9, 9, 8, seed=5)
    assert (decode_image(encode_gif(img)) == img).all()
    # and the Spark-side stats path consumes GIF payloads
    from mura_spark.multimodal.binary_ops import image_stats
    df = spark.createDataFrame([(1, bytearray(encode_gif(img)))],
                               "id long, content binary")
    row = image_stats(df).collect()[0]
    assert (row.width, row.height) == (9, 9)
