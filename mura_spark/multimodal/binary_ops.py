"""Multimodal (image/audio/video) column conventions + processing operators.

Convention: a modality column is an opaque ``binary`` payload column plus a
typed metadata struct::

    content      binary                 -- raw encoded bytes
    content_meta struct<modality:string, mime:string, width:int, height:int,
                        sample_rate:int, n_frames:int>

Processing runs through ``mapInPandas`` so bytes cross the Python boundary
in Arrow batches (never row-at-a-time). Decoding: PPM (P6), uncompressed
24-bit BMP, baseline JPEG, and 8-bit PNG decode for REAL via pure numpy
(:func:`decode_image` / :func:`image_stats` — no media libs needed);
exotic variants and audio/video codecs need PIL/ffmpeg, absent here, so the
format-agnostic feature kernel is STUBBED: a clearly-marked deterministic
fake (byte-histogram features) behind the same batch-shaped API a real
decoder would use — schema, partitioning, UDF signature, and batch shape
are real and tested.

Scale notes: batches are bounded by ``spark.sql.execution.arrow.
maxRecordsPerBatch``; binary payloads never participate in shuffles here —
feature extraction is a narrow map, and downstream joins carry only the
extracted (small) features. Repartition *before* extraction to spread large
blobs evenly.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata struct type for modality columns.
CONTENT_META_TYPE = T.StructType([
    T.StructField("modality", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])

#: Output schema of :func:`extract_features`.
FEATURE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("modality", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])

FEATURE_DIM = 16


def _fake_decode_features(payload: bytes) -> list[float]:
    """STUB decode kernel. A real implementation would decode the media and
    produce model features; containers here have no media libs, so this is a
    deterministic byte-histogram: fraction of bytes in each of 16 buckets.
    Swap this single function for a real decoder in production."""
    if payload is None:
        return None  # NULL payload -> NULL features (not a zero vector)
    if len(payload) == 0:
        return [0.0] * FEATURE_DIM
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b >> 4] += 1
    n = float(len(payload))
    return [c / n for c in counts]


try:  # guarded probe: upgrade to a real decoder if the env ever gains PIL
    import PIL.Image as _PIL_Image  # noqa: N811
except ImportError:  # pragma: no cover - env-dependent
    _PIL_Image = None

HAS_REAL_DECODER = _PIL_Image is not None


def _decode_ppm(payload: bytes):
    """REAL decoder for binary PPM (P6): pure numpy, no media libs.
    Header: 'P6', whitespace/comment-separated width height maxval, one
    whitespace byte, then width·height·3 raw RGB bytes."""
    import numpy as np
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                        offset=pos)
    return pix.reshape(h, w, 3)


def _decode_bmp(payload: bytes):
    """REAL decoder for uncompressed 24-bit BMP: pure numpy. Rows are
    4-byte aligned, stored bottom-up (top-down when height < 0), BGR."""
    import struct

    import numpy as np
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=data_offset).reshape(h, stride)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img if top_down else img[::-1]


def encode_ppm(arr) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6) bytes — the test/fixture
    counterpart of :func:`_decode_ppm`."""
    import numpy as np
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("encode_ppm expects (h, w, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_image(payload: bytes):
    """Decode an encoded image payload to a (height, width[, channels])
    numpy array — uint8, except 16-bit PNG which decodes to uint16.

    PPM (P6), uncompressed 24-bit BMP, JPEG (baseline SOF0/SOF1 AND
    progressive SOF2, any chroma subsampling, restart markers), PNG
    (complete: every legal depth 1-16, color type, filter, and
    interlace method), and GIF (87a/89a: LZW, local/global palettes,
    interlace, transparency, animation frames) decode for REAL via
    pure numpy — no media libs needed (JPEG:
    multimodal/jpeg.decode_jpeg, a full Huffman+IDCT decoder reading
    its tables from the stream; PNG: multimodal/png.decode_png over
    stdlib zlib; GIF: multimodal/gif.decode_gif). Remaining exotica
    (lossless/arithmetic JPEG, RLE BMP, TIFF/WebP containers) go
    through PIL when importable (probed at module load; this container
    normally lacks PIL/libjpeg, but the operator upgrades itself the
    moment the library appears), else raise NotImplementedError.
    """
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from mura_spark.multimodal.jpeg import decode_jpeg
        try:
            return decode_jpeg(payload)
        except NotImplementedError:
            if _PIL_Image is None:  # lossless/arithmetic without PIL
                raise
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from mura_spark.multimodal.png import decode_png
        # full spec coverage: every legal depth/color/interlace combo
        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from mura_spark.multimodal.gif import decode_gif
        # LZW, local/global palettes, interlace, transparency, frames
        return decode_gif(payload)
    if _PIL_Image is None:
        raise NotImplementedError(
            "this image variant requires PIL, not present in this "
            "container; PPM/BMP/baseline-JPEG/PNG decode natively "
            "— use extract_features (deterministic stub) for "
            "format-agnostic pipeline testing")
    import io

    import numpy as np
    with _PIL_Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img)


#: Output schema of :func:`image_stats`.
IMAGE_STATS_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
])


def image_stats(df: DataFrame, id_col: str = "id",
                content_col: str = "content") -> DataFrame:
    """REAL pixel statistics via :func:`decode_image` over Arrow batches:
    (id, width, height, per-channel means). Undecodable payloads yield
    NULL stats rather than failing the batch (quarantine-friendly — the
    ingest convention of scan_jsonl_permissive). Channel means are exact
    int-sum/count arithmetic in float64, so the values are renderable as
    oracle SQL when the payload bytes are SQL-reachable."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, mr, mg, mb = [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[content_col]):
                ids.append(int(i))
                try:
                    img = decode_image(bytes(p))
                    h, w = img.shape[:2]
                    if img.ndim == 2:  # grayscale: one channel, not w cols
                        img = img[:, :, None]
                    means = img.reshape(-1, img.shape[-1]).mean(axis=0)
                    if means.size < 3:  # gray / gray+alpha → replicate luma
                        means = [means[0]] * 3
                    ws.append(w); hs.append(h)
                    mr.append(float(means[0]))
                    mg.append(float(means[1]))
                    mb.append(float(means[2]))
                except Exception:
                    ws.append(None); hs.append(None)
                    mr.append(None); mg.append(None); mb.append(None)
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="Int32"),
                "height": pd.Series(hs, dtype="Int32"),
                "mean_r": pd.Series(mr, dtype="float64"),
                "mean_g": pd.Series(mg, dtype="float64"),
                "mean_b": pd.Series(mb, dtype="float64"),
            })

    from mura_spark.sources.parquet import ensure_min_partitions
    return ensure_min_partitions(df.select(id_col, content_col)) \
        .mapInPandas(batches, schema=IMAGE_STATS_SCHEMA)


def extract_features(df: DataFrame, id_col: str = "id",
                     content_col: str = "content",
                     meta_col: str = "content_meta") -> DataFrame:
    """Binary payloads → fixed-width feature vectors via Arrow-batched
    ``mapInPandas``. Output: FEATURE_SCHEMA (id, modality, n_bytes, features).
    """
    id_name, content_name, meta_name = id_col, content_col, meta_col

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame({
                "id": pdf[id_name].astype("int64"),
                "modality": [
                    (m or {}).get("modality") if isinstance(m, dict) else
                    getattr(m, "modality", None)
                    for m in pdf[meta_name]],
                "n_bytes": [len(p) if p is not None else None
                            for p in pdf[content_name]],
                "features": [_fake_decode_features(p)
                             for p in pdf[content_name]],
            })
            yield out

    from mura_spark.sources.parquet import ensure_min_partitions
    cols = [id_col, content_col, meta_col]
    return ensure_min_partitions(df.select(*cols)).mapInPandas(
        batches, schema=FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int,
                id_col: str = "id", content_col: str = "content",
                meta_col: str = "content_meta") -> DataFrame:
    """Resize operator with a STUBBED pixel kernel.

    A real implementation decodes, resizes to ``width×height``, and
    re-encodes; no media libs exist in this container, so the kernel is a
    deterministic byte-stride subsample to at most ``width·height`` bytes
    (stride = ceil(n / (w·h)) — integer arithmetic, renderable as oracle
    SQL). Everything around the kernel is real: Arrow-batched
    ``mapInPandas``, binary output column, and the metadata struct updated
    with the new dimensions — swap the one marked line for a real resampler
    in production.
    """
    target = width * height
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(content_col, T.BinaryType()),
        T.StructField(meta_col, CONTENT_META_TYPE),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for p, m in zip(pdf[content_col], pdf[meta_col]):
                if p is None:
                    payloads.append(None)
                else:
                    n = len(p)
                    stride = 1 if n <= target else -(-n // target)
                    payloads.append(bytes(p[::stride]))  # STUB pixel kernel
                md = dict(m) if m is not None else {}
                md["width"] = width
                md["height"] = height
                metas.append(md)
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"),
                                content_col: payloads, meta_col: metas})

    from mura_spark.sources.parquet import ensure_min_partitions
    cols = [id_col, content_col, meta_col]
    return ensure_min_partitions(df.select(*cols)).mapInPandas(
        batches, schema=out_schema)


def frame_sample_plan(df: DataFrame, every_n: int,
                      meta_col: str = "content_meta") -> DataFrame:
    """Plan-level frame sampling: computes the frame indices a video decoder
    would extract (0, every_n, 2·every_n, …) from metadata only — no byte
    touch, fully JVM-side. Pairs with a real decoder downstream."""
    n_frames = F.col(f"{meta_col}.n_frames")
    # unknown frame count (NULL metadata) -> NULL plan, not an empty
    # one: element_at over a fabricated empty array throws under ANSI,
    # and "no frames known" is not the same fact as "zero frames"
    idxs = (F.when(n_frames.isNotNull() & (n_frames > 0),
                   F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)))
             .when(n_frames.isNotNull(), F.array().cast("array<int>")))
    return df.withColumn("sample_frames", idxs)


def _decode_wav(payload: bytes):
    """REAL decoder for RIFF/WAVE PCM16: pure struct/numpy. Returns
    (samples int16 ndarray of shape (n, channels), sample_rate)."""
    import struct

    import numpy as np
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 supported (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2",
                            count=len(data) // 2)
    return samples.reshape(-1, channels), sample_rate


def encode_wav(samples, sample_rate: int) -> bytes:
    """(n, channels) int16 array → RIFF/WAVE PCM16 bytes — the
    test/fixture counterpart of :func:`_decode_wav`."""
    import struct

    import numpy as np
    a = np.ascontiguousarray(samples, dtype="<i2")
    n, channels = a.shape
    data = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


#: Output schema of :func:`audio_stats`.
AUDIO_STATS_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_ms", T.DoubleType()),
    T.StructField("mean_amp", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
])


def audio_stats(df: DataFrame, id_col: str = "id",
                content_col: str = "content") -> DataFrame:
    """REAL audio statistics via :func:`_decode_wav` over Arrow batches:
    per-clip sample count, duration, mean amplitude, RMS (mono mixdown =
    first channel). Undecodable payloads yield NULL stats (quarantine
    convention). Arithmetic is exact-int sums with one double division
    (+ one IEEE sqrt for RMS), so values are oracle-renderable when the
    payload bytes are SQL-reachable."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("id", "n_samples", "sample_rate",
                                   "duration_ms", "mean_amp", "rms")}
            for i, p in zip(pdf[id_col], pdf[content_col]):
                out["id"].append(int(i))
                try:
                    samples, rate = _decode_wav(bytes(p))
                    ch0 = samples[:, 0].astype("int64")
                    n = int(ch0.shape[0])
                    out["n_samples"].append(n)
                    out["sample_rate"].append(int(rate))
                    out["duration_ms"].append(n * 1000.0 / rate)
                    out["mean_amp"].append(float(int(ch0.sum()) / n))
                    out["rms"].append(
                        math.sqrt(int((ch0 * ch0).sum()) / n))
                except Exception:
                    for k in ("n_samples", "sample_rate", "duration_ms",
                              "mean_amp", "rms"):
                        out[k].append(None)
            yield pd.DataFrame({
                "id": pd.Series(out["id"], dtype="int64"),
                "n_samples": pd.Series(out["n_samples"], dtype="Int32"),
                "sample_rate": pd.Series(out["sample_rate"],
                                         dtype="Int32"),
                "duration_ms": pd.Series(out["duration_ms"],
                                         dtype="float64"),
                "mean_amp": pd.Series(out["mean_amp"], dtype="float64"),
                "rms": pd.Series(out["rms"], dtype="float64"),
            })

    from mura_spark.sources.parquet import ensure_min_partitions
    return ensure_min_partitions(df.select(id_col, content_col)) \
        .mapInPandas(batches, schema=AUDIO_STATS_SCHEMA)


def _decode_y4m(payload: bytes):
    """REAL decoder for YUV4MPEG2 (Y4M) video: pure numpy. Returns
    (luma_frames uint8 ndarray of shape (n_frames, h, w), width, height).
    Supports Cmono and C420* colorspaces (chroma planes are skipped —
    the luma plane is what frame-level statistics and sampling need)."""
    import numpy as np
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    colorspace = "C420"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            colorspace = t
    if not w or not h:
        raise ValueError("missing W/H in Y4M header")
    if colorspace.startswith("Cmono"):
        frame_bytes = w * h
    elif colorspace.startswith("C420"):
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    else:
        raise NotImplementedError(f"colorspace {colorspace} not supported")
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        data_start = fnl + 1
        luma = np.frombuffer(payload, dtype=np.uint8, count=w * h,
                             offset=data_start).reshape(h, w)
        frames.append(luma)
        pos = data_start + frame_bytes
    return np.stack(frames) if frames else np.empty((0, h, w),
                                                    dtype=np.uint8), w, h


#: Output schema of :func:`video_frame_stats`.
VIDEO_FRAME_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
])


def video_frame_stats(df: DataFrame, stride: int = 1,
                      id_col: str = "id",
                      content_col: str = "content") -> DataFrame:
    """REAL frame sampling + statistics via :func:`_decode_y4m` over
    Arrow batches: every ``stride``-th frame yields one row
    (id, frame_idx, width, height, mean_luma) — the decode-side
    counterpart of the metadata-only ``sample_frames`` planner.
    Undecodable payloads yield a single NULL-stats row (quarantine
    convention). Mean luma is an exact int sum over w·h pixels with one
    double division — oracle-renderable for SQL-reachable bytes."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, ws, hs, ml = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[content_col]):
                try:
                    frames, w, h = _decode_y4m(bytes(p))
                    for j in range(0, frames.shape[0], stride):
                        ids.append(int(i)); idxs.append(j)
                        ws.append(w); hs.append(h)
                        ml.append(int(frames[j].astype("int64").sum())
                                  / (w * h))
                except Exception:
                    ids.append(int(i)); idxs.append(None)
                    ws.append(None); hs.append(None); ml.append(None)
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="Int32"),
                "width": pd.Series(ws, dtype="Int32"),
                "height": pd.Series(hs, dtype="Int32"),
                "mean_luma": pd.Series(ml, dtype="float64"),
            })

    from mura_spark.sources.parquet import ensure_min_partitions
    return ensure_min_partitions(df.select(id_col, content_col)) \
        .mapInPandas(batches, schema=VIDEO_FRAME_SCHEMA)


def to_rgb8(img):
    """Canonical (h, w, 3) uint8 view of any :func:`decode_image`
    output — the normalization every RGB-assuming consumer (resize,
    aHash, luma sums) must apply: 16-bit samples scale to 8-bit
    (high byte, the standard conversion; a bare uint8 cast would wrap
    mod 256), grayscale replicates, alpha channels DROP (alpha is
    coverage, not color — summing it into luma would make visually
    identical RGB and RGBA images hash apart)."""
    import numpy as np
    if img.dtype == np.uint16:
        img = (img >> 8).astype(np.uint8)
    if img.ndim == 2:
        return np.stack([img] * 3, axis=-1)
    ch = img.shape[2]
    if ch == 2:  # gray + alpha
        return np.stack([img[:, :, 0]] * 3, axis=-1)
    if ch == 4:  # RGBA
        return np.ascontiguousarray(img[:, :, :3])
    return img


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize for decodable payloads (PPM/BMP/PIL formats):
    decode → nearest-neighbor resample (integer index mapping — fully
    deterministic, no filtering kernels) → re-encode as PPM. The
    format-agnostic pipeline stub (byte-stride) remains in
    :func:`resize_stub` for undecodable formats."""
    import numpy as np
    img = to_rgb8(decode_image(payload))
    h, w = img.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return encode_ppm(img[rows][:, cols])


def ahash64(df: DataFrame, id_col: str = "id",
            content_col: str = "content") -> DataFrame:
    """Perceptual average-hash (aHash) of REAL-decoded images, packed as
    two 32-bit halves ``(id, lo, hi)`` — the perceptual-dedup signature
    (identical pixels → identical hash; small edits → small Hamming
    distance). The bit rule is pure integer arithmetic — bit_j set iff
    ``64·luma_j > Σluma`` with luma = r+g+b — so an oracle can recompute
    the hash from raw channel values without any float. Images of any
    size are first downsampled to the canonical 8×8 aHash grid by the
    same nearest-neighbor index map as :func:`resize_image` (identity
    for already-8×8 inputs, so existing oracle hashes are unchanged),
    and normalized to RGB via :func:`to_rgb8` — alpha is dropped, not
    summed, so identical-looking RGB and RGBA images hash identically.
    Narrow Arrow map over the decoded bytes; blobs never shuffle — only
    the 16-byte signature leaves the map."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            los, his = [], []
            for payload in pdf[content_col]:
                arr = to_rgb8(decode_image(bytes(payload)))
                h, w = arr.shape[:2]
                if (h, w) != (8, 8):
                    arr = arr[(np.arange(8) * h) // 8][
                        :, (np.arange(8) * w) // 8]
                s = arr.astype(np.int64).sum(axis=2).reshape(-1)
                total = int(s.sum())
                bits = (64 * s > total)
                lo = sum(1 << j for j in range(32) if bits[j])
                hi = sum(1 << j for j in range(32) if bits[32 + j])
                los.append(lo)
                his.append(hi)
            yield pd.DataFrame({"id": pdf[id_col],
                                "lo": pd.Series(los, dtype="int64"),
                                "hi": pd.Series(his, dtype="int64")})

    return df.mapInPandas(batches, "id bigint, lo bigint, hi bigint")


def audio_fingerprint31(df: DataFrame, id_col: str = "id",
                        content_col: str = "content") -> DataFrame:
    """Acoustic fingerprint of REAL-decoded PCM16 audio: 32 two-sample
    frame energies, bit_i set iff ``energy(i+1) > energy(i)`` — the
    energy-delta sign chain (the integer skeleton of a Shazam/
    chromaprint-style fingerprint; identical audio → identical bits,
    local edits → local bit flips). All arithmetic is exact int64
    (sample², sums, comparisons), so an oracle recomputes the 31-bit
    fingerprint from raw byte values. Narrow Arrow map; only the 8-byte
    fingerprint leaves it."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fps = []
            for payload in pdf[content_col]:
                samples, _ = _decode_wav(bytes(payload))
                s = samples.reshape(-1).astype(np.int64)[:64]
                e = (s[0::2] * s[0::2] + s[1::2] * s[1::2])
                fp = sum(1 << i for i in range(31) if e[i + 1] > e[i])
                fps.append(fp)
            yield pd.DataFrame({"id": pdf[id_col],
                                "fp": pd.Series(fps, dtype="int64")})

    return df.mapInPandas(batches, "id bigint, fp bigint")


#: Output schema of :func:`scene_changes`.
SCENE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_cuts", T.IntegerType()),
    T.StructField("max_sad", T.LongType()),
    T.StructField("first_cut", T.IntegerType()),
])


def scene_changes(df: DataFrame, threshold_sad: int,
                  id_col: str = "id",
                  content_col: str = "content") -> DataFrame:
    """REAL shot-boundary detection over decoded Y4M luma: per video,
    the sum-of-absolute-differences between adjacent frames, a cut
    wherever SAD exceeds ``threshold_sad`` — the classic first pass of
    every video-ingest pipeline (keyframe selection, dedup at shot
    grain). Output ``(id, n_frames, n_cuts, max_sad, first_cut)``;
    ``first_cut`` is the 0-based index of the first post-cut frame
    (NULL if no cut). Undecodable payloads yield a NULL-stats row
    (quarantine convention).

    Pure-integer SAD over uint8 luma — exact, oracle-renderable for
    SQL-reachable bytes. Arrow-batched; blobs never shuffle.
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in it:
            ids, nf, nc, mx, fc = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[content_col]):
                try:
                    frames, w, h = _decode_y4m(bytes(p))
                    a = frames.astype(np.int64)
                    if a.shape[0] < 2:
                        ids.append(int(i)); nf.append(a.shape[0])
                        nc.append(0); mx.append(0); fc.append(None)
                        continue
                    sad = np.abs(a[1:] - a[:-1]).sum(axis=(1, 2))
                    cuts = np.nonzero(sad > threshold_sad)[0]
                    ids.append(int(i)); nf.append(int(a.shape[0]))
                    nc.append(int(cuts.size))
                    mx.append(int(sad.max()))
                    fc.append(int(cuts[0] + 1) if cuts.size else None)
                except Exception:
                    ids.append(int(i)); nf.append(None); nc.append(None)
                    mx.append(None); fc.append(None)
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype="int64"),
                "n_frames": pd.Series(nf, dtype="Int32"),
                "n_cuts": pd.Series(nc, dtype="Int32"),
                "max_sad": pd.Series(mx, dtype="Int64"),
                "first_cut": pd.Series(fc, dtype="Int32"),
            })

    from mura_spark.sources.parquet import ensure_min_partitions
    return ensure_min_partitions(df.select(id_col, content_col)) \
        .mapInPandas(batches, schema=SCENE_SCHEMA)


#: Output schema of :func:`vad_segments`.
VAD_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_active", T.IntegerType()),
    T.StructField("n_segments", T.IntegerType()),
    T.StructField("max_segment", T.IntegerType()),
])


def vad_segments(df: DataFrame, frame_samples: int, threshold: int,
                 id_col: str = "id",
                 content_col: str = "content") -> DataFrame:
    """REAL energy-threshold voice-activity detection over decoded
    PCM16: frames of ``frame_samples`` samples, a frame is ACTIVE when
    its integer amplitude sum exceeds ``threshold``, and maximal runs
    of active frames are the speech segments — the silence-trimming /
    utterance-splitting first pass of every audio-ingest pipeline.
    Output ``(id, n_frames, n_active, n_segments, max_segment)``;
    undecodable payloads yield a NULL-stats row (quarantine).

    Pure-integer energies over exact sample values; run detection is a
    numpy diff on the boolean mask. Arrow-batched; blobs never
    shuffle.
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in it:
            ids, nf, na, ns, mx = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[content_col]):
                try:
                    samples, _sr = _decode_wav(bytes(p))
                    s = np.asarray(samples, dtype=np.int64).ravel()
                    n = (len(s) // frame_samples) * frame_samples
                    frames = s[:n].reshape(-1, frame_samples)
                    e = frames.sum(axis=1)
                    act = e > threshold
                    d = np.diff(act.astype(np.int8), prepend=0)
                    starts = int((d == 1).sum())
                    if act.any():
                        # run lengths via indices of mask transitions
                        idx = np.flatnonzero(
                            np.diff(np.concatenate(
                                ([0], act.astype(np.int8), [0]))))
                        runs = idx[1::2] - idx[0::2]
                        longest = int(runs.max())
                    else:
                        longest = 0
                    ids.append(int(i)); nf.append(int(frames.shape[0]))
                    na.append(int(act.sum())); ns.append(starts)
                    mx.append(longest)
                except Exception:
                    ids.append(int(i)); nf.append(None); na.append(None)
                    ns.append(None); mx.append(None)
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype="int64"),
                "n_frames": pd.Series(nf, dtype="Int32"),
                "n_active": pd.Series(na, dtype="Int32"),
                "n_segments": pd.Series(ns, dtype="Int32"),
                "max_segment": pd.Series(mx, dtype="Int32"),
            })

    from mura_spark.sources.parquet import ensure_min_partitions
    return ensure_min_partitions(df.select(id_col, content_col)) \
        .mapInPandas(batches, schema=VAD_SCHEMA)


def image_luma_sums(df: DataFrame, id_col: str = "id",
                    content_col: str = "content") -> DataFrame:
    """Exact integer luminance: ``(id, n_pixels, luma_milli_sum)``
    with per-pixel ITU-R 601 luma in milli-units (299·R + 587·G +
    114·B — integers end-to-end, so per-source rollups stay
    order-independent and oracle-hashable). REAL decode via
    :func:`decode_image`; undecodable payloads yield NULLs."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, np_, ls = [], [], []
            for i, p in zip(pdf[id_col], pdf[content_col]):
                ids.append(int(i))
                try:
                    img = to_rgb8(decode_image(bytes(p))).astype("int64")
                    flat = img.reshape(-1, 3)
                    luma = (299 * flat[:, 0] + 587 * flat[:, 1]
                            + 114 * flat[:, 2])
                    np_.append(int(flat.shape[0]))
                    ls.append(int(luma.sum()))
                except Exception:
                    np_.append(None)
                    ls.append(None)
            yield pd.DataFrame({
                "id": pd.Series(ids, dtype="int64"),
                "n_pixels": pd.Series(np_, dtype="Int64"),
                "luma_milli_sum": pd.Series(ls, dtype="Int64"),
            })

    from mura_spark.sources.parquet import ensure_min_partitions
    return ensure_min_partitions(
        df.select(F.col(id_col).alias("id"), content_col)).mapInPandas(
        batches, schema="id bigint, n_pixels bigint, "
                        "luma_milli_sum bigint")
