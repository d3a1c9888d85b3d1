"""Pure-Python image codecs + preprocessing (no PIL in the container).

``decode_image`` dispatches on magic bytes the way the reference's
``image.Decode`` does on registered formats (``/root/reference/
main.go:149``): PNG signature -> png codec, JPEG SOI -> jpeg codec.
"""

from __future__ import annotations

import numpy as np

from text_grabr_orc_spark.imaging.jpeg import JpegError, decode_jpeg
from text_grabr_orc_spark.imaging.png import PngError, decode_png


class ImageError(ValueError):
    pass


def decode_image(data: bytes) -> np.ndarray:
    """bytes -> uint8 array, PNG or baseline JPEG by magic bytes —
    the decode half of the reference's `image.Decode` (main.go:149)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    raise ImageError("unrecognized image format (not PNG or JPEG)")


__all__ = [
    "ImageError",
    "JpegError",
    "PngError",
    "decode_image",
    "decode_jpeg",
    "decode_png",
]
