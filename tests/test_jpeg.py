"""Golden tests for the pure-Python baseline JPEG codec — mirrors the
PNG codec tests, plus a hand-built 4:2:0 stream for the subsampled
decode path and the JPEG half of the OCR pipeline (main.go:73-80
accepts .jpg/.jpeg; main.go:149 decodes them)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from text_grabr_orc_spark.imaging import ImageError, decode_image
from text_grabr_orc_spark.imaging.jpeg import (
    _AC_CHROMA,
    _AC_LUMA,
    _DC_CHROMA,
    _DC_LUMA,
    _QT_CHROMA,
    _QT_LUMA,
    _BitWriter,
    _build_encode_table,
    _encode_block,
    _huff_segment,
    JpegError,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def gradient(h=24, w=32):
    g = np.add.outer(np.arange(h) * 5, np.arange(w) * 3) % 256
    return g.astype(np.uint8)


def test_jpeg_roundtrip_gray_close():
    img = gradient()
    back = decode_jpeg(encode_jpeg(img))
    assert back.shape == img.shape and back.dtype == np.uint8
    err = np.abs(back.astype(int) - img.astype(int))
    assert err.max() <= 24 and err.mean() < 8  # lossy, but close


def test_jpeg_roundtrip_rgb_close():
    g = gradient()
    rgb = np.stack([g, 255 - g, np.roll(g, 5, axis=1)], axis=-1)
    back = decode_jpeg(encode_jpeg(rgb))
    assert back.shape == rgb.shape
    assert np.abs(back.astype(int) - rgb.astype(int)).mean() < 12


def test_jpeg_flat_block_is_exact():
    # a constant image quantizes to DC-only blocks: zero loss
    img = np.full((9, 13), 200, np.uint8)  # odd size -> edge padding
    assert (decode_jpeg(encode_jpeg(img)) == 200).all()


def test_jpeg_deterministic_bytes():
    img = gradient()
    assert encode_jpeg(img) == encode_jpeg(img)


def test_jpeg_decode_rejects_garbage():
    for bad in (b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8trunc"):
        with pytest.raises(JpegError):
            decode_jpeg(bad)


def test_jpeg_rejects_unsupported_sof():
    # splice a SOF3 (lossless) marker into a valid stream: must error
    # clearly instead of mis-decoding
    good = bytearray(encode_jpeg(gradient()))
    idx = good.index(b"\xff\xc0")
    good[idx + 1] = 0xC3
    with pytest.raises(JpegError, match="SOF"):
        decode_jpeg(bytes(good))


def test_jpeg_progressive_gray_matches_baseline():
    # the progressive scan script delivers the SAME quantized
    # coefficients as the sequential encoder: decoded pixels must be
    # bit-identical, not merely close
    img = gradient()
    assert (
        decode_jpeg(encode_jpeg_progressive(img)) == decode_jpeg(encode_jpeg(img))
    ).all()


def test_jpeg_progressive_rgb_matches_baseline():
    g = gradient()
    rgb = np.stack([g, 255 - g, np.roll(g, 5, axis=1)], axis=-1)
    assert (
        decode_jpeg(encode_jpeg_progressive(rgb)) == decode_jpeg(encode_jpeg(rgb))
    ).all()


def test_jpeg_progressive_odd_size_and_flat():
    img = np.full((9, 13), 200, np.uint8)  # edge-padded blocks
    assert (decode_jpeg(encode_jpeg_progressive(img)) == 200).all()


def test_jpeg_progressive_deterministic_bytes():
    img = gradient()
    assert encode_jpeg_progressive(img) == encode_jpeg_progressive(img)


def _encode_420_gray_chroma(y_img: np.ndarray) -> bytes:
    """Hand-assemble a single-scan 4:2:0 JPEG (Y at full res, flat
    chroma at half res) to exercise the subsampled MCU interleave +
    upsampling decode path the 4:4:4 encoder never produces."""
    h, w = y_img.shape
    assert h % 16 == 0 and w % 16 == 0
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in _QT_LUMA)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
        int(x) for x in _QT_CHROMA)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x22, 0])  # Y: 2x2 sampling
    sof += bytes([2, 0x11, 1])  # Cb: 1x1
    sof += bytes([3, 0x11, 1])  # Cr: 1x1
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _huff_segment(0, 0, *_DC_LUMA)
    out += _huff_segment(1, 0, *_AC_LUMA)
    out += _huff_segment(0, 1, *_DC_CHROMA)
    out += _huff_segment(1, 1, *_AC_CHROMA)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    dc = {0: _build_encode_table(*_DC_LUMA), 1: _build_encode_table(*_DC_CHROMA)}
    ac = {0: _build_encode_table(*_AC_LUMA), 1: _build_encode_table(*_AC_CHROMA)}
    qt = {0: _QT_LUMA.astype(float), 1: _QT_CHROMA.astype(float)}
    bw = _BitWriter()
    pred = [0, 0, 0]
    flat = np.full((8, 8), 128.0)  # neutral chroma
    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):
                for bx in range(2):
                    blk = y_img[
                        my * 16 + by * 8: my * 16 + by * 8 + 8,
                        mx * 16 + bx * 8: mx * 16 + bx * 8 + 8,
                    ].astype(float)
                    pred[0] = _encode_block(bw, blk, qt[0], dc[0], ac[0], pred[0])
            pred[1] = _encode_block(bw, flat, qt[1], dc[1], ac[1], pred[1])
            pred[2] = _encode_block(bw, flat, qt[1], dc[1], ac[1], pred[2])
    out += bw.flush() + b"\xff\xd9"
    return bytes(out)


def test_jpeg_420_subsampled_decode():
    y = gradient(16, 32)
    rgb = decode_jpeg(_encode_420_gray_chroma(y))
    assert rgb.shape == (16, 32, 3)
    # neutral chroma -> R=G=B=Y (within quantization noise)
    assert np.abs(rgb[..., 0].astype(int) - rgb[..., 2].astype(int)).max() <= 2
    assert np.abs(rgb[..., 1].astype(int) - y.astype(int)).mean() < 8


def test_decode_image_magic_dispatch():
    from text_grabr_orc_spark.imaging.png import encode_png

    img = gradient(8, 8)
    assert (decode_image(encode_png(img)) == img).all()
    assert decode_image(encode_jpeg(img)).shape == (8, 8)
    with pytest.raises(ImageError):
        decode_image(b"GIF89a not supported")


def test_ocr_pipeline_decodes_jpegs(spark, tmp_path):
    """JPEG uploads must now produce text rows, not ocr_error rows —
    the round-1 parity gap (reference decodes JPEG, main.go:149)."""
    from text_grabr_orc_spark.operators import ocr

    img = np.full((16, 16), 200, np.uint8)
    (tmp_path / "flat.jpg").write_bytes(encode_jpeg(img))
    (tmp_path / "flat.jpeg").write_bytes(encode_jpeg(img))
    (tmp_path / "flat.png").write_bytes(
        __import__(
            "text_grabr_orc_spark.imaging.png", fromlist=["encode_png"]
        ).encode_png(img)
    )
    out = {r["path"].rsplit("/", 1)[-1]: r
           for r in ocr.ocr_pipeline(spark, str(tmp_path)).collect()}
    assert set(out) == {"flat.jpg", "flat.jpeg", "flat.png"}
    for r in out.values():
        assert r["ocr_error"] is None and r["text"].startswith("OCRSTUB 16x16")
    # flat 200 > threshold: binarizes all-white regardless of codec ->
    # identical preprocessed pixels -> identical stub text
    assert out["flat.jpg"]["text"] == out["flat.png"]["text"]


# ---------------------------------------------------------------------------
# Adobe CMYK / YCCK (4-component) decode
# ---------------------------------------------------------------------------


def _cmyk_fixture(h=24, w=32):
    g = gradient(h, w).astype(np.float64)
    c = g
    m = 255 - g
    y = np.roll(g, 7, axis=1)
    k = (g * 0.3).astype(np.float64)  # light black plate
    return np.stack([c, m, y, k], axis=-1).astype(np.uint8)


def _cmyk_reference_rgb(cmyk):
    """Ground-truth conversion on the TRUE ink densities:
    R = (255-C)(255-K)/255 — the color.CMYK/libjpeg formula."""
    f = 255.0 - cmyk.astype(np.float64)
    rgb = f[..., :3] * (f[..., 3:4] / 255.0)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def test_jpeg_cmyk_adobe_roundtrip_close():
    from text_grabr_orc_spark.imaging.jpeg import encode_jpeg_cmyk

    cmyk = _cmyk_fixture()
    back = decode_jpeg(encode_jpeg_cmyk(cmyk, ycck=False))
    want = _cmyk_reference_rgb(cmyk)
    assert back.shape == want.shape == (24, 32, 3)
    assert np.abs(back.astype(int) - want.astype(int)).mean() < 12


def test_jpeg_ycck_adobe_roundtrip_close():
    from text_grabr_orc_spark.imaging.jpeg import encode_jpeg_cmyk

    cmyk = _cmyk_fixture()
    back = decode_jpeg(encode_jpeg_cmyk(cmyk, ycck=True))
    want = _cmyk_reference_rgb(cmyk)
    assert back.shape == want.shape
    # YCCK rides the coarse chroma table: looser but still recognizable
    assert np.abs(back.astype(int) - want.astype(int)).mean() < 20


def test_jpeg_cmyk_unmarked_is_direct_ink():
    """A 4-component frame WITHOUT an Adobe APP14 marker stores direct
    ink densities (libjpeg/Go convention) — the inverted-ink reading
    applies only when the marker is present. Fixture: strip APP14 from
    an Adobe-encoded stream; its stored channels are 255 - true ink,
    so the unmarked decode must equal the reference conversion of the
    STORED values as ink."""
    from text_grabr_orc_spark.imaging.jpeg import encode_jpeg_cmyk

    cmyk = _cmyk_fixture()
    data = encode_jpeg_cmyk(cmyk, ycck=False)
    i = data.find(b"\xff\xee")
    assert i >= 0
    seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
    stripped = data[:i] + data[i + 2 + seglen :]
    back = decode_jpeg(stripped)
    want = _cmyk_reference_rgb(255 - cmyk)  # stored = 255 - true ink
    assert np.abs(back.astype(int) - want.astype(int)).mean() < 12


def test_jpeg_cmyk_flat_is_near_exact():
    from text_grabr_orc_spark.imaging.jpeg import encode_jpeg_cmyk

    cmyk = np.full((16, 16, 4), 0, np.uint8)
    cmyk[..., 3] = 51  # 20% black only
    back = decode_jpeg(encode_jpeg_cmyk(cmyk))
    want = _cmyk_reference_rgb(cmyk)
    assert np.abs(back.astype(int) - want.astype(int)).max() <= 1


# ---------------------------------------------------------------------------
# EXIF orientation
# ---------------------------------------------------------------------------


def test_exif_orientation_read_and_decode_parity():
    """The tag reads back for all 8 values; decode_jpeg output is
    BYTE-IDENTICAL with and without the APP1 (Go image.Decode parity:
    the stdlib decoder ignores EXIF)."""
    from text_grabr_orc_spark.imaging.jpeg import (
        exif_orientation,
        insert_exif,
    )

    plain = encode_jpeg(gradient())
    base = decode_jpeg(plain)
    assert exif_orientation(plain) == 1
    for o in range(1, 9):
        tagged = insert_exif(plain, o)
        assert exif_orientation(tagged) == o
        assert (decode_jpeg(tagged) == base).all()


def test_exif_orientation_little_endian_and_malformed():
    from text_grabr_orc_spark.imaging.jpeg import (
        exif_app1_segment,
        exif_orientation,
    )

    plain = encode_jpeg(gradient())
    # little-endian TIFF variant, hand-assembled
    tiff = (
        b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
        + struct.pack("<H", 1)
        + struct.pack("<HHIHH", 0x0112, 3, 1, 6, 0)
        + struct.pack("<I", 0)
    )
    body = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    assert exif_orientation(plain[:2] + seg + plain[2:]) == 6
    # malformed/out-of-range -> identity, never an exception
    bad = plain[:2] + exif_app1_segment(9) + plain[2:]
    assert exif_orientation(bad) == 1
    trunc = b"\xff\xd8\xff\xe1\x00\x04Ex"
    assert exif_orientation(trunc) == 1
    assert exif_orientation(b"") == 1


def test_apply_exif_orientation_semantics():
    """Hand-checked transform table on an asymmetric array: 6 is a
    clockwise quarter turn (np.rot90 k=-1), 8 counterclockwise, 3 a
    half turn; mirrored variants = flip of the rotated ones; applying
    the correction leaves an orientation-1 image untouched."""
    from text_grabr_orc_spark.imaging.jpeg import apply_exif_orientation

    a = np.arange(6, dtype=np.uint8).reshape(2, 3)
    assert (apply_exif_orientation(a, 1) == a).all()
    assert (apply_exif_orientation(a, 2) == a[:, ::-1]).all()
    assert (apply_exif_orientation(a, 3) == np.rot90(a, 2)).all()
    assert (apply_exif_orientation(a, 4) == a[::-1, :]).all()
    assert (apply_exif_orientation(a, 5) == a.T).all()
    assert (apply_exif_orientation(a, 6) == np.rot90(a, -1)).all()
    assert (apply_exif_orientation(a, 7) == np.rot90(a.T, 2)).all()
    assert (apply_exif_orientation(a, 8) == np.rot90(a, 1)).all()
    # RGB arrays keep the channel axis
    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert apply_exif_orientation(rgb, 6).shape == (4, 2, 3)


def test_exif_orientation_inverses_restore_original():
    """Group property: each orientation's inverse transform restores
    the original array (6 and 8 are mutual inverses; all others are
    involutions)."""
    from text_grabr_orc_spark.imaging.jpeg import apply_exif_orientation

    inv = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    a = np.arange(24, dtype=np.uint8).reshape(4, 6)
    rgb = np.arange(72, dtype=np.uint8).reshape(4, 6, 3)
    for o, io_ in inv.items():
        assert (apply_exif_orientation(apply_exif_orientation(a, o), io_) == a).all(), o
        assert (
            apply_exif_orientation(apply_exif_orientation(rgb, o), io_) == rgb
        ).all(), o
