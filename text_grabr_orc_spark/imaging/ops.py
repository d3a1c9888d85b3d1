"""Image preprocessing with bit-exact reference parity.

The reference preprocesses every upload before OCR
(``/root/reference/main.go:124-190``): convert to 8-bit grayscale via
Go's ``color.GrayModel`` and binarize at a fixed threshold of 128
(``main.go:173``: pixel < 128 -> black, else white). These are the
vectorized numpy equivalents, matching Go's integer luma math exactly
(Go scales 8-bit channels to 16-bit by *0x101, then
``(19595r + 38470g + 7471b + 1<<15) >> 24`` — public Go stdlib
``image/color`` semantics).
"""

from __future__ import annotations

import numpy as np

#: reference binarization threshold (main.go:173)
BINARIZE_THRESHOLD = 128


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """RGB/RGBA/gray uint8 -> gray uint8, Go color.GrayModel parity.

    Replaces the reference's per-pixel ``Set`` loop
    (``main.go:131-136``) with one vectorized expression — the
    'vectorized execution' half of the Spark redesign (SURVEY.md §4).
    """
    if img.ndim == 2:
        return img
    r = img[:, :, 0].astype(np.uint64) * 0x101
    g = img[:, :, 1].astype(np.uint64) * 0x101
    b = img[:, :, 2].astype(np.uint64) * 0x101
    y = (19595 * r + 38470 * g + 7471 * b + (1 << 15)) >> 24
    return y.astype(np.uint8)


def binarize(gray: np.ndarray, threshold: int = BINARIZE_THRESHOLD) -> np.ndarray:
    """gray uint8 -> {0, 255} uint8; pixel < threshold -> black
    (main.go:181-185 parity)."""
    return np.where(gray < threshold, 0, 255).astype(np.uint8)
