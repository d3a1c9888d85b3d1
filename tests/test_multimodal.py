"""Multimodal operator tests: WAV codec round-trip, audio features on
known signals, video frame sampling, image resize goldens."""

from __future__ import annotations

import numpy as np
import pytest

from text_grabr_orc_spark.operators import multimodal as mm


def test_wav_roundtrip():
    s = (np.sin(np.arange(800) / 10.0) * 10000).astype(np.int16)
    back, rate = mm.decode_wav_pcm16(mm.encode_wav_pcm16(s, 8000))
    assert rate == 8000
    assert np.array_equal(back, s)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        mm.decode_wav_pcm16(b"RIFFxxxxNOPE")


def test_resize_nearest_golden():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = mm.resize_nearest(img, 2, 2)
    assert out.tolist() == [[0, 2], [8, 10]]
    up = mm.resize_nearest(img, 8, 8)
    assert up.shape == (8, 8) and up[0, 0] == 0 and up[7, 7] == 15


def test_video_container_roundtrip_and_stub():
    frames = [np.full((3, 3), v, np.uint8) for v in (0, 80, 160, 240)]
    data = mm.encode_video(frames)
    back = mm._decode_video(data)
    assert len(back) == 4 and all(np.array_equal(a, b) for a, b in zip(frames, back))
    with pytest.raises(NotImplementedError):
        mm._decode_video(b"\x00\x00\x00\x00mp4?....")


def test_audio_features_of_known_sine(spark, sf_dir):
    rows = mm.multimodal_audio_features(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["error"] is None
        assert r["sample_rate"] == 8000 and r["duration_sec"] == 0.5
        # full-scale-ish sine: rms ≈ peak/sqrt(2)
        assert r["rms"] == pytest.approx(r["peak"] / np.sqrt(2), rel=0.01)
        assert r["zero_crossing_rate"] > 0


def test_video_frames_sampled_every_2(spark, sf_dir):
    rows = mm.multimodal_video_frames(spark, sf_dir).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["file"], []).append(r)
    assert len(by_file) == 8
    for frames in by_file.values():
        assert [f["frame_idx"] for f in frames] == [0, 2]  # every 2nd of 4
        assert all(f["n_frames"] == 4 for f in frames)
        # shifted copies differ -> different frame hashes
        assert frames[0]["frame_sha"] != frames[1]["frame_sha"]


def test_image_resize_pipeline(spark, sf_dir):
    rows = mm.multimodal_image_resize(spark, sf_dir).collect()
    # 8 originals + 2 planted brightness-shifted near-dups
    assert len(rows) == 10
    assert all(r["width"] == 4 and r["height"] == 4 and r["error"] is None
               for r in rows)
    # dups differ in raw pixels (brightness), so all shas distinct
    assert len({r["resized_sha"] for r in rows}) == 10


def test_image_dhash_brightness_invariant_and_dedup(spark, sf_dir):
    from text_grabr_orc_spark.operators.multimodal import (
        multimodal_image_dedup_dhash,
    )

    pairs = {
        (r["file_a"], r["file_b"]): r["hamming"]
        for r in multimodal_image_dedup_dhash(spark, sf_dir).collect()
    }
    # the planted brightness-shifted copies must pair with their
    # originals at hamming 0 (gradient signs unchanged)
    assert pairs[("img_000.png", "img_000_dup.png")] == 0
    assert pairs[("img_001.png", "img_001_dup.png")] == 0
    # a dup never pairs with the WRONG original
    assert ("img_000.png", "img_001_dup.png") not in pairs


def test_scan_corpus_exif_cmyk_normalization(spark, sf_dir):
    """The scanned-document variants (gray JFIF / RGB / Adobe CMYK /
    YCCK, EXIF orientations 1..8) all decode through the Spark stage:
    no error rows, the orientation tag reads back, quarter-turn
    orientations (5..8) swap the upright dims, and CMYK/YCCK files
    come out as 3-channel RGB."""
    from text_grabr_orc_spark.operators.multimodal import (
        multimodal_image_exif_cmyk,
    )

    rows = multimodal_image_exif_cmyk(spark, sf_dir).collect()
    assert len(rows) == 8
    assert all(r["error"] is None for r in rows)
    for r in rows:
        vid = int(r["file"][5:8])
        assert r["orientation"] == (vid % 8) + 1
        assert (r["raw_h"], r["raw_w"]) == (16, 24)
        if r["orientation"] >= 5:
            assert (r["h"], r["w"]) == (24, 16)
        else:
            assert (r["h"], r["w"]) == (16, 24)
        # kind cycle: 0 gray, 1 rgb, 2 cmyk, 3 ycck
        assert r["channels"] == (1 if vid % 4 == 0 else 3)
