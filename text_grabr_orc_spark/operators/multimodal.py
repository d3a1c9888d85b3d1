"""North-star multimodal operators: typed binary columns + metadata
with decode / feature-extract / resize / frame-sample stages.

Everything Spark-side is real (binaryFile scans, Arrow-batched
mapInPandas, schemas, partitioning); the codecs are:

- images: REAL (the from-scratch PNG codec in imaging/png.py)
- audio:  REAL for PCM WAV (RIFF parsing is a few struct unpacks;
          features are vectorized numpy) — generated fixtures are
          deterministic sine waves
- video:  the container is a deterministic in-repo format (length-
          prefixed PNG frames) so frame-sampling logic is real;
          REAL codecs (mp4/h264) would slot into `_decode_video`,
          which raises a clearly-marked NotImplementedError for
          anything but the fixture container (no ffmpeg/PyAV in this
          environment).
"""

from __future__ import annotations

import io
import os
import struct
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_grabr_orc_spark.imaging.png import decode_png, encode_png
from text_grabr_orc_spark.registry import register

# ---------------------------------------------------------------------------
# Image resize
# ---------------------------------------------------------------------------


def resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index math)."""
    src_h, src_w = img.shape[:2]
    ys = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return img[ys][:, xs]


def resize_images(files: DataFrame, h: int, w: int) -> DataFrame:
    """(path, content) -> (path, width, height, content) resized PNGs
    via Arrow-batched mapInPandas — the thumbnail/normalize stage of
    an image-corpus pipeline."""
    from pyspark.sql.types import (
        BinaryType, IntegerType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("content", BinaryType()),
            StructField("error", StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    img = resize_nearest(decode_png(bytes(content)), h, w)
                    out.append((path, w, h, encode_png(img), None))
                except Exception as e:  # noqa: BLE001 - error-column semantics
                    out.append((path, None, None, None, str(e)))
            yield pd.DataFrame(
                out, columns=["path", "width", "height", "content", "error"]
            )

    return files.select("path", "content").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Audio: PCM WAV decode + features
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE writer for mono 16-bit PCM (public format)."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE mono 16-bit PCM -> (samples, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate, samples = None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack("<4sI", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={fmt} ch={ch} bits={bits}")
        elif cid == b"data":
            samples = np.frombuffer(body, "<i2")
        pos += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


def audio_features(files: DataFrame, frame_ms: int = 25) -> DataFrame:
    """(path, content WAV bytes) -> per-file audio features: duration,
    RMS, zero-crossing rate, peak — the filter/QA stage of an audio
    corpus. Vectorized numpy per file, Arrow-batched."""
    from pyspark.sql.types import (
        DoubleType, IntegerType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_samples", IntegerType()),
            StructField("duration_sec", DoubleType()),
            StructField("rms", DoubleType()),
            StructField("zero_crossing_rate", DoubleType()),
            StructField("peak", DoubleType()),
            StructField("error", StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    s, rate = decode_wav_pcm16(bytes(content))
                    x = s.astype(np.float64) / 32768.0
                    zc = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
                    out.append(
                        (path, rate, len(s), round(len(s) / rate, 6),
                         round(float(np.sqrt(np.mean(x * x))), 6),
                         round(zc, 6), round(float(np.max(np.abs(x))), 6), None)
                    )
                except Exception as e:  # noqa: BLE001
                    out.append((path, None, None, None, None, None, None, str(e)))
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return files.select("path", "content").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Video: deterministic frame container + frame sampling
# ---------------------------------------------------------------------------

_VIDEO_MAGIC = b"TGOSVID1"


def encode_video(frames: list[np.ndarray]) -> bytes:
    """Length-prefixed PNG frame container (fixture format)."""
    parts = [_VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        png = encode_png(f)
        parts.append(struct.pack("<I", len(png)))
        parts.append(png)
    return b"".join(parts)


def _decode_video(data: bytes) -> list[np.ndarray]:
    if data[:8] != _VIDEO_MAGIC:
        # REAL codecs would go here (ffmpeg/PyAV, absent in this env)
        raise NotImplementedError(
            "only the TGOSVID1 fixture container is supported; "
            "mp4/h264 decode requires ffmpeg/PyAV"
        )
    (n,) = struct.unpack("<I", data[8:12])
    pos, frames = 12, []
    for _ in range(n):
        (ln,) = struct.unpack("<I", data[pos : pos + 4])
        frames.append(decode_png(data[pos + 4 : pos + 4 + ln]))
        pos += 4 + ln
    return frames


def sample_video_frames(files: DataFrame, every_k: int = 2) -> DataFrame:
    """(path, content) -> one row per SAMPLED frame (every k-th),
    carrying the frame index and the frame's pixel sha — the
    frame-extraction stage of a video-training pipeline. One input
    row fans out to many output rows (mapInPandas is a flat map)."""
    import hashlib

    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("frame_idx", IntegerType()),
            StructField("n_frames", IntegerType()),
            StructField("frame_sha", StringType()),
            StructField("error", StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    frames = _decode_video(bytes(content))
                    for i in range(0, len(frames), every_k):
                        sha = hashlib.sha256(frames[i].tobytes()).hexdigest()[:16]
                        out.append((path, i, len(frames), sha, None))
                except NotImplementedError as e:
                    out.append((path, None, None, None, f"stub: {e}"))
                except Exception as e:  # noqa: BLE001
                    out.append((path, None, None, None, str(e)))
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return files.select("path", "content").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Driver-visible queries (deterministic synthesized fixtures)
# ---------------------------------------------------------------------------

_MM_CACHE: dict[str, str] = {}


def synthesize_media_dir(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic media fixtures derived from the embeddings table:
    per vector an 8x8 PNG, a 0.5s sine WAV (freq from the label), and
    a 4-frame video of shifted copies."""
    if sf_dir in _MM_CACHE:
        return _MM_CACHE[sf_dir]
    rows = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding", "label")
        .collect()
    )
    out = tempfile.mkdtemp(prefix="tgos_media_")
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        img = ((v - v.min()) / max(v.max() - v.min(), 1e-9) * 255).astype(np.uint8)
        img = img.reshape(8, 8)
        with open(os.path.join(out, f"img_{r['vec_id']:03d}.png"), "wb") as f:
            f.write(encode_png(img))
        t = np.arange(4000) / 8000.0
        freq = 200.0 + 50.0 * int(r["label"])
        wav = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
        with open(os.path.join(out, f"aud_{r['vec_id']:03d}.wav"), "wb") as f:
            f.write(encode_wav_pcm16(wav))
        frames = [np.roll(img, k, axis=1) for k in range(4)]
        with open(os.path.join(out, f"vid_{r['vec_id']:03d}.bin"), "wb") as f:
            f.write(encode_video(frames))
        if r["vec_id"] < 2:
            # planted near-duplicates for the perceptual-hash dedup:
            # a uniform brightness shift preserves every horizontal
            # gradient sign, so dHash distance is exactly 0
            bright = np.clip(img.astype(np.int16) + 10, 0, 255).astype(np.uint8)
            with open(
                os.path.join(out, f"img_{r['vec_id']:03d}_dup.png"), "wb"
            ) as f:
                f.write(encode_png(bright))
    _MM_CACHE[sf_dir] = out
    return out


@register("multimodal_image_resize")  # binaryFile + Python stage -> rows-only
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize the synthesized PNGs 8x8 -> 4x4 and report dims + sha of
    the resized bytes (deterministic)."""
    d = synthesize_media_dir(spark, sf_dir)
    files = spark.read.format("binaryFile").load(os.path.join(d, "*.png"))
    resized = resize_images(files, 4, 4)
    return resized.select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("file"),
        "width",
        "height",
        F.sha2("content", 256).alias("resized_sha"),
        "error",
    ).orderBy("file")


@register("multimodal_audio_features")  # rows-only (Python stage)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV decode + per-file features over the synthesized sine
    fixtures (deterministic float features, rounded)."""
    d = synthesize_media_dir(spark, sf_dir)
    files = spark.read.format("binaryFile").load(os.path.join(d, "*.wav"))
    return audio_features(files).select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("file"),
        "sample_rate",
        "n_samples",
        "duration_sec",
        "rms",
        "zero_crossing_rate",
        "peak",
        "error",
    ).orderBy("file")


@register("multimodal_video_frames")  # rows-only (Python stage)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample (every 2nd frame) the synthesized videos."""
    d = synthesize_media_dir(spark, sf_dir)
    files = spark.read.format("binaryFile").load(os.path.join(d, "*.bin"))
    return sample_video_frames(files, 2).select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("file"),
        "frame_idx",
        "n_frames",
        "frame_sha",
        "error",
    ).orderBy("file", "frame_idx")


# ---------------------------------------------------------------------------
# Image near-dup via difference hash (perceptual dedup for image corpora)
# ---------------------------------------------------------------------------

_DHASH_W = 8  # 8x8 gradient bits -> 64-bit hash
_DHASH_MAX_DIST = 5


def image_dhash(files: DataFrame) -> DataFrame:
    """(path, dhash bigint, error) — difference hash: grayscale,
    nearest-resize to (h=8, w=9), bit (r, c) = px[r, c+1] > px[r, c].
    Brightness/contrast shifts preserve gradient signs, so visually
    identical re-encodes collapse to hamming 0 — the standard cheap
    perceptual fingerprint for image corpus dedup. The Python stage
    emits ONE int64 per image; everything pairwise stays relational."""
    from text_grabr_orc_spark.imaging import decode_image
    from text_grabr_orc_spark.imaging.ops import to_grayscale

    def run(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    g = to_grayscale(decode_image(bytes(content)))
                    small = resize_nearest(g, _DHASH_W, _DHASH_W + 1)
                    bits = (small[:, 1:] > small[:, :-1]).reshape(-1)
                    h = 0
                    for i, b in enumerate(bits):
                        if b:
                            h |= 1 << i
                    if h >= 1 << 63:  # two's-complement into int64
                        h -= 1 << 64
                    out.append((path, h, None))
                except Exception as e:  # noqa: BLE001 - errors become rows
                    out.append((path, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(out, columns=["path", "dhash", "error"])

    return files.select("path", "content").mapInPandas(
        run, "path string, dhash bigint, error string"
    )


@register("multimodal_image_dedup_dhash")  # Python decode stage -> rows-only;
# hamming semantics pinned by tests/test_multimodal.py goldens
def multimodal_image_dedup_dhash(
    spark: SparkSession, sf_dir: str, max_distance: int = _DHASH_MAX_DIST
) -> DataFrame:
    """Image near-dup pairs over the synthesized PNG fixtures
    (including the planted brightness-shifted duplicates): dHash per
    image in one Arrow batch pass, then the SAME pigeonhole block
    self-join the SimHash text dedup uses — signatures split into
    max_distance+1 blocks, candidates from an equi-join on
    (block_idx, block_val), exact popcount verify. No all-pairs join:
    at a 10^9-image corpus the shuffle carries block keys, and AQE
    splits the all-flat-images hot bucket.

    This is the image twin of dedup_simhash — same scale shape, the
    only modality-specific part is the 1-int-per-image Python stage."""
    d = synthesize_media_dir(spark, sf_dir)
    files = spark.read.format("binaryFile").load(os.path.join(d, "*.png"))
    sigs = image_dhash(files).filter(F.col("error").isNull()).select(
        F.regexp_extract("path", r"([^/]+)$", 1).alias("file"), "dhash"
    ).persist()
    n_blocks = max_distance + 1
    bb = [(i * 64) // n_blocks for i in range(n_blocks + 1)]
    blocks = sigs.select(
        "file",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftright(F.col("dhash"), bb[i])
                        .bitwiseAND((1 << (bb[i + 1] - bb[i])) - 1)
                        .alias("block_val"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("b"),
    ).select("file", "dhash", "b.block_idx", "b.block_val")
    a, b = blocks.alias("a"), blocks.alias("b")
    dist = F.bit_count(F.expr("h_a ^ h_b"))
    return (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.file") < F.col("b.file")),
        )
        .select(
            F.col("a.file").alias("file_a"),
            F.col("b.file").alias("file_b"),
            F.col("a.dhash").alias("h_a"),
            F.col("b.dhash").alias("h_b"),
        )
        .filter(dist <= max_distance)
        .select("file_a", "file_b", dist.cast("bigint").alias("hamming"))
        .distinct()
        .orderBy("file_a", "file_b")
    )


# ---------------------------------------------------------------------------
# Scanned-document JPEG variants: EXIF orientation + Adobe CMYK/YCCK
# ---------------------------------------------------------------------------

_SCAN_CACHE: dict[str, str] = {}


def synthesize_scan_dir(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic scanned-corpus JPEG fixtures from the embeddings
    table: per vector one JPEG cycling through the shapes a real OCR
    corpus contains — grayscale JFIF, RGB, Adobe CMYK (APP14
    transform 0) and YCCK (transform 2) — each tagged with an EXIF
    orientation 1..8 so the normalization stage has work to do.

    Cached per fixture CONTENT tag (``tables.cache_tag``: path +
    per-table mtime/size fingerprint) — the repo-wide staleness
    convention — so a regenerated fixture can never be served stale
    scan JPEGs; the cached dir is re-verified to still exist."""
    from text_grabr_orc_spark.imaging.jpeg import (
        encode_jpeg,
        encode_jpeg_cmyk,
        insert_exif,
    )
    from text_grabr_orc_spark.tables import cache_tag

    tag = cache_tag(sf_dir)
    cached = _SCAN_CACHE.get(tag)
    if cached is not None and os.path.isdir(cached):
        return cached
    rows = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    )
    out = tempfile.mkdtemp(prefix="tgos_scan_")
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        g = ((v - v.min()) / max(v.max() - v.min(), 1e-9) * 255).astype(np.uint8)
        img = np.repeat(np.repeat(g.reshape(8, 8), 2, axis=0), 3, axis=1)
        vid = int(r["vec_id"])
        kind = vid % 4
        if kind == 0:  # grayscale JFIF
            data = encode_jpeg(img)
        elif kind == 1:  # RGB
            rgb = np.stack([img, 255 - img, np.roll(img, 3, axis=1)], -1)
            data = encode_jpeg(rgb)
        else:  # Adobe CMYK / YCCK
            cmyk = np.stack(
                [img, 255 - img, np.roll(img, 5, axis=1), img // 3], -1
            )
            data = encode_jpeg_cmyk(cmyk, ycck=(kind == 3))
        data = insert_exif(data, (vid % 8) + 1)
        with open(os.path.join(out, f"scan_{vid:03d}.jpg"), "wb") as f:
            f.write(data)
    _SCAN_CACHE[tag] = out
    return out


@register("multimodal_image_exif_cmyk")  # Python decode stage -> rows-only;
# decode/orientation semantics pinned by tests/test_jpeg.py goldens
def multimodal_image_exif_cmyk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-corpus normalization over the synthesized JPEG variants:
    binaryFile scan -> one Arrow mapInPandas pass that decodes
    (grayscale / RGB / Adobe CMYK / YCCK), reads the EXIF orientation
    tag, applies the upright transform, and emits scalar facts per
    file (orientation, pre/post dims, channel count, mean luma,
    content sha); decode failures become error rows, never task
    failures. The Spark-side shape is the production one — schema'd
    binary column in, per-file scalars out, all pairwise/aggregate
    work stays relational downstream."""
    from text_grabr_orc_spark.imaging import decode_image
    from text_grabr_orc_spark.imaging.jpeg import (
        apply_exif_orientation,
        exif_orientation,
    )

    d = synthesize_scan_dir(spark, sf_dir)
    files = spark.read.format("binaryFile").load(os.path.join(d, "*.jpg"))

    def run(batches):
        import hashlib

        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    raw = bytes(content)
                    img = decode_image(raw)
                    o = exif_orientation(raw)
                    up = apply_exif_orientation(img, o)
                    out.append(
                        (
                            path,
                            o,
                            img.shape[0],
                            img.shape[1],
                            up.shape[0],
                            up.shape[1],
                            1 if up.ndim == 2 else up.shape[2],
                            round(float(up.mean()), 3),
                            hashlib.sha256(up.tobytes()).hexdigest(),
                            None,
                        )
                    )
                except Exception as e:  # noqa: BLE001 - errors become rows
                    out.append(
                        (path, None, None, None, None, None, None, None,
                         None, f"{type(e).__name__}: {e}")
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "path", "orientation", "raw_h", "raw_w", "h", "w",
                    "channels", "mean_px", "sha", "error",
                ],
            )

    schema = (
        "path string, orientation int, raw_h int, raw_w int, h int, w int,"
        " channels int, mean_px double, sha string, error string"
    )
    return (
        files.select("path", "content")
        .mapInPandas(run, schema)
        .select(
            F.regexp_extract("path", r"([^/]+)$", 1).alias("file"),
            "orientation", "raw_h", "raw_w", "h", "w", "channels",
            "mean_px", "sha", "error",
        )
        .orderBy("file")
    )
