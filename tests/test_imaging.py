"""Golden tests for the imaging stack (FIXTURES.md §B.1/§B.3) and the
end-to-end OCR pipeline plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from text_grabr_orc_spark.imaging.ops import binarize, to_grayscale
from text_grabr_orc_spark.imaging.png import PngError, decode_png, encode_png
from text_grabr_orc_spark.operators import ocr


def gray_ramp() -> np.ndarray:
    """16x16 ramp: pixel (x,y) = 16*y + x (FIXTURES.md §B.1)."""
    y, x = np.mgrid[0:16, 0:16]
    return (16 * y + x).astype(np.uint8)


def test_png_roundtrip_gray():
    img = gray_ramp()
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_rgb_and_rgba():
    rgb = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    rgba = np.arange(4 * 5 * 4, dtype=np.uint8).reshape(4, 5, 4)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


def test_png_decode_rejects_garbage():
    with pytest.raises(PngError):
        decode_png(b"definitely not a png")


def test_grayscale_go_parity():
    """Go color.GrayModel: y = (19595r + 38470g + 7471b + 1<<15) >> 24
    on 16-bit channels. Spot values computed by hand from the Go
    formula (main.go:131-136 uses exactly this via img.Set)."""
    px = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [128, 128, 128]]],
                  dtype=np.uint8)
    got = to_grayscale(px)[0]
    def go_gray(r, g, b):
        r16, g16, b16 = r * 0x101, g * 0x101, b * 0x101
        return (19595 * r16 + 38470 * g16 + 7471 * b16 + (1 << 15)) >> 24
    want = [go_gray(255, 0, 0), go_gray(0, 255, 0), go_gray(0, 0, 255),
            go_gray(128, 128, 128)]
    assert got.tolist() == want
    assert got.tolist() == [76, 150, 29, 128]


def test_binarize_threshold_128():
    """main.go:173/181-185: pixel < 128 -> 0, else 255; 127|128 edge."""
    ramp = gray_ramp()
    out = binarize(ramp)
    assert set(np.unique(out)) <= {0, 255}
    assert out[7, 15] == 0    # value 127 -> black
    assert out[8, 0] == 255   # value 128 -> white
    assert (out[:8] == 0).all() and (out[8:] == 255).all()


def test_ocr_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """binaryFile -> filters -> decode -> preprocess -> stub OCR."""
    # golden image dir: one ramp png, one uppercase-ext png (must be
    # ACCEPTED: reference lowercases first, main.go:73), distractors
    (tmp_path / "ramp.png").write_bytes(encode_png(gray_ramp()))
    (tmp_path / "RAMP2.PNG").write_bytes(encode_png(gray_ramp()))
    (tmp_path / "notes.txt").write_bytes(b"x")
    (tmp_path / "broken.png").write_bytes(b"not a png")
    out = {r["path"].rsplit("/", 1)[-1]: r
           for r in ocr.ocr_pipeline(spark, str(tmp_path)).collect()}
    assert set(out) == {"ramp.png", "RAMP2.PNG", "broken.png"}  # txt filtered
    ok = out["ramp.png"]
    assert ok["ocr_error"] is None and ok["ocr_engine"] == "stub"
    assert ok["text"].startswith("OCRSTUB 16x16 ")
    assert ok["textCount"] == 3  # strings.Fields count of the stub text
    assert out["RAMP2.PNG"]["text"] == ok["text"]  # same pixels, same hash
    bad = out["broken.png"]
    assert bad["ocr_error"] is not None and bad["text"] is None


def test_ocr_stub_hash_reflects_preprocessing(spark, tmp_path):
    """Two images that binarize identically must give the same stub
    text; images differing above/below threshold must not."""
    a = np.full((4, 4), 100, np.uint8)   # all < 128 -> all black
    b = np.full((4, 4), 20, np.uint8)    # also all black after binarize
    c = np.full((4, 4), 200, np.uint8)   # all white
    for name, img in [("a.png", a), ("b.png", b), ("c.png", c)]:
        (tmp_path / name).write_bytes(encode_png(img))
    out = {r["path"].rsplit("/", 1)[-1]: r["text"]
           for r in ocr.ocr_pipeline(spark, str(tmp_path)).collect()}
    assert out["a.png"] == out["b.png"]
    assert out["a.png"] != out["c.png"]


def test_results_as_json_shape(spark, tmp_path):
    (tmp_path / "r.png").write_bytes(encode_png(gray_ramp()))
    j = ocr.results_as_json(ocr.ocr_pipeline(spark, str(tmp_path))).collect()
    assert len(j) == 1
    assert '"text":"OCRSTUB' in j[0]["json"] and '"textCount":3' in j[0]["json"]
