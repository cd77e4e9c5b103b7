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
    assert all(len(r.features) == MM.FEATURE_DIM for r in rows.values())


def test_feature_determinism_and_values(media):
    rows = {r.id: r for r in MM.extract_features(media).collect()}
    assert rows[1].features[0] == 1.0          # all bytes in bucket 0
    assert rows[2].features[15] == 1.0         # all bytes in bucket 15
    assert rows[3].n_bytes == 0 and rows[3].features == [0.0] * MM.FEATURE_DIM
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
    assert out[1] == []            # no frame count → empty plan


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
