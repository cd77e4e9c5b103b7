"""Pure-numpy baseline JPEG codec (multimodal/jpeg.py) and its
decode_image integration — closes the "JPEG decode absent without PIL"
gap: the NotImplementedError branch is now unreachable for baseline
JPEG payloads."""

from __future__ import annotations

import numpy as np
import pytest

from mura_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 200, h)
    return np.stack(np.meshgrid(x, y) + [np.full((h, w), 77.0)],
                    axis=-1).astype(np.uint8)


def test_roundtrip_solid_gray_exact():
    a = np.full((16, 24), 99, dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(a, quality=90))
    assert d.shape == (16, 24) and d.dtype == np.uint8
    assert np.abs(d.astype(int) - 99).max() == 0


def test_roundtrip_color_gradient_444():
    img = _gradient(32, 40)
    d = decode_jpeg(encode_jpeg(img, quality=92))
    assert d.shape == img.shape
    assert np.abs(d.astype(int) - img.astype(int)).max() <= 4


def test_roundtrip_420_subsampling_odd_size():
    # odd dims + 2x2 chroma downsample: exercises multi-block MCUs,
    # edge padding, and the decoder's upsample/crop path
    img = _gradient(29, 37)
    d = decode_jpeg(encode_jpeg(img, quality=92, subsampling="420"))
    assert d.shape == img.shape
    assert np.abs(d.astype(int) - img.astype(int)).max() <= 12


def test_roundtrip_noise_quality_100_near_lossless():
    rng = np.random.RandomState(7)
    n = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(n, quality=100))
    # residual error is the YCbCr float roundtrip, not quantization
    assert np.abs(d.astype(int) - n.astype(int)).max() <= 2


def test_decode_is_deterministic():
    img = _gradient(16, 16)
    payload = encode_jpeg(img, quality=80)
    assert np.array_equal(decode_jpeg(payload), decode_jpeg(payload))


def test_unsupported_coding_raises_named_marker():
    # lossless (SOF3) must be refused loudly, not mis-decoded
    img = np.full((8, 8), 50, dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="FFC3"):
        decode_jpeg(bytes(payload))


def _prog_eq(img, **kw):
    base = decode_jpeg(encode_jpeg(img, **kw))
    prog = decode_jpeg(encode_jpeg(img, progressive=True, **kw))
    assert np.array_equal(base, prog), "progressive != baseline decode"
    return prog


def test_progressive_bit_identical_to_baseline_gray():
    _prog_eq(np.full((16, 24), 99, dtype=np.uint8), quality=90)


def test_progressive_bit_identical_color_444_and_420():
    img = _gradient(29, 37)
    _prog_eq(img, quality=92)
    _prog_eq(img, quality=92, subsampling="420")


def test_progressive_noise_stresses_refinement_paths():
    # dense high-frequency content exercises ZRL, EOB tails, and the
    # AC-refinement correction-bit ordering
    rng = np.random.RandomState(3)
    for q in (35, 75, 100):
        _prog_eq(rng.randint(0, 256, (24, 31, 3)).astype(np.uint8),
                 quality=q)


def test_progressive_property_random_shapes():
    rng = np.random.RandomState(11)
    for _ in range(8):
        h, w = rng.randint(1, 50), rng.randint(1, 50)
        gray = bool(rng.randint(0, 2))
        shape = (h, w) if gray else (h, w, 3)
        img = rng.randint(0, 256, shape).astype(np.uint8)
        kw = {} if gray else {"subsampling":
                              "420" if rng.randint(0, 2) else "444"}
        _prog_eq(img, quality=int(rng.choice([40, 85, 100])), **kw)


def test_progressive_restart_combo_refused():
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(np.zeros((8, 8), dtype=np.uint8),
                    progressive=True, restart_interval=2)


def test_decode_image_dispatches_progressive():
    from mura_spark.multimodal.binary_ops import decode_image
    img = _gradient(16, 16)
    d = decode_image(encode_jpeg(img, quality=95, progressive=True))
    assert d.shape == img.shape
    assert np.abs(d.astype(int) - img.astype(int)).max() <= 4


def test_decode_image_dispatches_jpeg_natively():
    from mura_spark.multimodal.binary_ops import decode_image
    img = _gradient(16, 16)
    d = decode_image(encode_jpeg(img, quality=95))
    assert d.shape == img.shape
    assert np.abs(d.astype(int) - img.astype(int)).max() <= 4


def test_image_ops_run_on_jpeg_payloads(spark):
    # the Spark-side plumbing accepts JPEG content end-to-end: stats
    # and perceptual hashing over a mixed PPM/JPEG corpus
    from mura_spark.multimodal.binary_ops import (ahash64, encode_ppm,
                                                  image_stats)
    img = _gradient(16, 16)
    rows = [(0, bytearray(encode_jpeg(img, quality=95))),
            (1, bytearray(encode_ppm(img))),
            (2, bytearray(b"\xff\xd8garbage"))]
    df = spark.createDataFrame(rows, "id long, content binary")
    stats = {r.id: r for r in image_stats(df).collect()}
    assert stats[0].width == 16 and stats[0].height == 16
    assert stats[2].width is None  # quarantine row, not a crash
    assert abs(stats[0].mean_r - stats[1].mean_r) < 3.0
    hashes = {r.id: (r.lo, r.hi) for r in
              ahash64(df.where("id < 2")).collect()}
    ham = (bin(hashes[0][0] ^ hashes[1][0]).count("1")
           + bin(hashes[0][1] ^ hashes[1][1]).count("1"))
    assert ham <= 6  # same picture, lossy codec: near-identical hash


def test_restart_markers_decode_identically():
    # DRI/RSTn: the resync structure camera JPEGs carry. The restart
    # stream must decode to exactly the same pixels as the plain one
    # (byte-aligned boundaries + DC predictor resets are lossless), and
    # the wrap past RST7 must be exercised (>8 restarts).
    img = _gradient(24, 48)  # 3x6 MCUs at 4:4:4 -> 17 restarts at DRI=1
    plain = decode_jpeg(encode_jpeg(img, quality=92))
    for interval in (1, 2, 5):
        payload = encode_jpeg(img, quality=92, restart_interval=interval)
        assert b"\xff\xdd" in payload  # DRI segment present
        assert np.array_equal(decode_jpeg(payload), plain)


def test_restart_markers_420_color():
    # restart + multi-block MCUs (2x2 luma sampling) together
    img = _gradient(33, 31)  # odd size: edge-padded partial MCUs
    plain = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    payload = encode_jpeg(img, quality=90, subsampling="420",
                          restart_interval=2)
    assert np.array_equal(decode_jpeg(payload), plain)


# ------------------------------------------------------- property-based

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40), w=st.integers(1, 40),
    quality=st.integers(30, 100),
    color=st.booleans(),
    subsampling=st.sampled_from(["444", "420"]),
    dri=st.sampled_from([0, 1, 3]),
    seed=st.integers(0, 2**32 - 1),
)
def test_codec_total_on_random_images(h, w, quality, color,
                                      subsampling, dri, seed):
    # totality: any size (incl. 1x1 and non-multiple-of-8/16 edges),
    # any quality, both samplings, with/without restarts -> decodes to
    # the right shape/dtype with plausible error, never crashes
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    if not color:
        subsampling = "444"
    payload = encode_jpeg(img, quality=quality, subsampling=subsampling,
                          restart_interval=dri)
    d = decode_jpeg(payload)
    assert d.shape == img.shape and d.dtype == np.uint8
    if quality >= 90 and subsampling == "444":
        # near-lossless regime: bounded per-pixel error on pure noise
        assert np.abs(d.astype(int) - img.astype(int)).max() <= 64
    if dri:
        # restarts are lossless re-sync: identical to the plain stream
        plain = decode_jpeg(encode_jpeg(img, quality=quality,
                                        subsampling=subsampling))
        assert np.array_equal(d, plain)
