"""Multimodal plumbing tests: schema, batch shape, null handling, and
deterministic stub features (real decoders are stubbed per module docs)."""

import pytest
import pyspark.sql.types as T
from pyspark.sql import functions as F

from mura_spark.multimodal import binary_ops as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x00" * 16, ("image", "image/png", 4, 4, None, None)),
        (2, b"\xff" * 8, ("image", "image/png", 2, 2, None, None)),
        (3, None, ("video", "video/mp4", 8, 8, None, 25)),
        (4, bytes(range(256)), ("audio", "audio/wav", None, None, 16000, None)),
    ]
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("content_meta", MM.CONTENT_META_TYPE),
    ])
    return spark.createDataFrame(rows, schema)


def test_extract_features_schema_and_shape(media):
    out = MM.extract_features(media)
    assert out.schema == MM.FEATURE_SCHEMA
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 4
    # NULL payload (id 3) -> NULL features; every decoded row is
    # fixed-width
    assert rows[3].features is None
    assert all(len(r.features) == MM.FEATURE_DIM
               for i, r in rows.items() if i != 3)


def test_feature_determinism_and_values(media):
    rows = {r.id: r for r in MM.extract_features(media).collect()}
    assert rows[1].features[0] == 1.0          # all bytes in bucket 0
    assert rows[2].features[15] == 1.0         # all bytes in bucket 15
    # NULL payload: NULL stats, row kept — not a zero histogram (a
    # fabricated all-zeros vector would read as a real decoded asset)
    assert rows[3].n_bytes is None and rows[3].features is None
    assert all(abs(f - 1 / 16) < 1e-12 for f in rows[4].features)  # uniform
    again = {r.id: r for r in MM.extract_features(media).collect()}
    assert all(rows[i].features == again[i].features for i in rows)


def test_decode_image_env_path():
    """Exercises whichever decode path this environment provides: with PIL
    present, a real encode→decode round-trip; without it, the documented
    NotImplementedError (the probe is at module load — HAS_REAL_DECODER)."""
    if not MM.HAS_REAL_DECODER:
        with pytest.raises(NotImplementedError):
            MM.decode_image(b"\x89PNG")
        return
    import io

    import numpy as np
    import PIL.Image
    img = PIL.Image.fromarray(
        np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    arr = MM.decode_image(buf.getvalue())
    assert arr.shape == (4, 4, 3)
    assert arr[0, 0, 2] == 2


def test_frame_sample_plan(media):
    out = {r.id: r.sample_frames
           for r in MM.frame_sample_plan(media, every_n=10).collect()}
    assert out[3] == [0, 10, 20]   # 25 frames, every 10th
    assert out[1] is None          # unknown frame count → NULL plan
    # (an empty plan is reserved for a KNOWN zero frame count;
    # fabricating one for missing metadata throws in ANSI element_at)


def test_resize_stub_plumbing(spark):
    """Resize: payload bounded by w·h bytes, deterministic stride subsample,
    metadata struct updated with the output dimensions."""
    from pyspark.sql import functions as F

    from mura_spark.multimodal import binary_ops as MM

    rows = [(1, b"x" * 5000), (2, b"short"), (3, None)]
    df = spark.createDataFrame(rows, ["id", "content"]).select(
        "id", "content",
        F.struct(
            F.lit("image").alias("modality"), F.lit("image/raw").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames")).alias("content_meta"))
    out = {r.id: r for r in MM.resize_stub(df, 32, 32).collect()}
    # 5000 bytes → stride ceil(5000/1024)=5 → 1000 bytes out
    assert len(out[1].content) == 1000
    assert out[1].content == (b"x" * 5000)[::5]
    assert out[1].content_meta.width == 32 and out[1].content_meta.height == 32
    assert bytes(out[2].content) == b"short"  # under target: untouched
    assert out[3].content is None             # null payload passes through


def test_ppm_roundtrip_decodes_exactly():
    """Pure-numpy P6 decode inverts encode_ppm bit-for-bit, including
    comment-bearing headers."""
    import numpy as np

    from mura_spark.multimodal.binary_ops import decode_image, encode_ppm
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    commented = (b"P6\n# a comment\n9 5\n# more\n255\n"
                 + img.tobytes())
    assert np.array_equal(decode_image(commented), img)


def test_bmp_decode_bottom_up_with_padding():
    """Uncompressed 24-bit BMP: bottom-up rows, 4-byte row padding, BGR
    order — decoded against a hand-built reference."""
    import struct

    import numpy as np

    from mura_spark.multimodal.binary_ops import decode_image
    rng = np.random.default_rng(11)
    w, h = 3, 2  # stride = 12 (9 data + 3 pad)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y][:, ::-1].tobytes()  # RGB → BGR
        rows += row + b"\x00" * (stride - len(row))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(rows), 0, 0, 0, 0))
    assert np.array_equal(decode_image(header + rows), img)


def test_image_stats_real_decode_and_quarantine(spark):
    """image_stats decodes real PPM payloads (exact channel means) and
    yields NULL stats for undecodable payloads instead of failing."""
    import numpy as np

    from mura_spark.multimodal.binary_ops import encode_ppm, image_stats
    rng = np.random.default_rng(3)
    imgs = {i: rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
            for i in range(3)}
    rows = [(i, bytearray(encode_ppm(a))) for i, a in imgs.items()]
    rows.append((99, bytearray(b"\xff\xd8 not decodable jpeg-ish")))
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r["id"]: r for r in image_stats(df).collect()}
    for i, a in imgs.items():
        assert (got[i]["width"], got[i]["height"]) == (6, 4)
        means = a.reshape(-1, 3).mean(axis=0)
        assert got[i]["mean_r"] == means[0]
        assert got[i]["mean_g"] == means[1]
        assert got[i]["mean_b"] == means[2]
    assert got[99]["width"] is None and got[99]["mean_r"] is None


def test_wav_roundtrip_and_audio_stats(spark):
    """Pure-struct WAV decode inverts encode_wav (incl. stereo and odd
    chunk alignment); audio_stats reproduces exact mean/RMS and
    quarantines undecodable payloads."""
    import math

    import numpy as np

    from mura_spark.multimodal.binary_ops import (_decode_wav, audio_stats,
                                                  encode_wav)
    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32768, size=(25, 1), dtype=np.int16)
    stereo = rng.integers(-32768, 32768, size=(10, 2), dtype=np.int16)
    for arr, rate in ((mono, 8000), (stereo, 44100)):
        got, r = _decode_wav(encode_wav(arr, rate))
        assert r == rate and np.array_equal(got, arr)

    rows = [(1, bytearray(encode_wav(mono, 8000))),
            (2, bytearray(b"OggS not a wav"))]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {r["id"]: r for r in audio_stats(df).collect()}
    ch0 = mono[:, 0].astype("int64")
    assert out[1]["n_samples"] == 25
    assert out[1]["duration_ms"] == 25 * 1000.0 / 8000
    assert out[1]["mean_amp"] == int(ch0.sum()) / 25
    assert out[1]["rms"] == math.sqrt(int((ch0 * ch0).sum()) / 25)
    assert out[2]["n_samples"] is None and out[2]["rms"] is None


def test_y4m_decode_and_frame_sampling(spark):
    """Pure-numpy Y4M decode: Cmono and C420 frames round-trip; stride
    sampling picks frames 0, k, 2k...; corrupt payloads quarantine."""
    import numpy as np

    from mura_spark.multimodal.binary_ops import (_decode_y4m,
                                                  video_frame_stats)
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, size=(5, 2, 4), dtype=np.uint8)
    mono = b"YUV4MPEG2 W4 H2 F25:1 Cmono\n" + b"".join(
        b"FRAME\n" + f.tobytes() for f in frames)
    got, w, h = _decode_y4m(mono)
    assert (w, h) == (4, 2) and np.array_equal(got, frames)
    # C420: luma plane + half-res chroma planes per frame
    chroma = rng.integers(0, 256, size=(5, 2 * (2 * 1)), dtype=np.uint8)
    c420 = b"YUV4MPEG2 W4 H2 F25:1 C420\n" + b"".join(
        b"FRAME\n" + f.tobytes() + c.tobytes()
        for f, c in zip(frames, chroma))
    got2, _, _ = _decode_y4m(c420)
    assert np.array_equal(got2, frames)

    df = spark.createDataFrame(
        [(1, bytearray(mono)), (2, bytearray(b"AVI nope"))],
        "id long, content binary")
    rows = video_frame_stats(df, stride=2).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    idxs = sorted(r["frame_idx"] for r in by_id[1])
    assert idxs == [0, 2, 4]
    for r in by_id[1]:
        want = int(frames[r["frame_idx"]].astype("int64").sum()) / 8
        assert r["mean_luma"] == want
    assert by_id[2][0]["frame_idx"] is None


def test_resize_image_real_nearest_neighbor():
    """Real resize for decodable payloads: nearest-neighbor index math
    verified against a direct numpy reference, output re-encoded PPM."""
    import numpy as np

    from mura_spark.multimodal.binary_ops import (decode_image, encode_ppm,
                                                  resize_image)
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    out = decode_image(resize_image(encode_ppm(img), 4, 3))
    rows = (np.arange(3) * 6) // 3
    cols = (np.arange(4) * 8) // 4
    assert np.array_equal(out, img[rows][:, cols])
    assert out.shape == (3, 4, 3)
