"""Minimal pure-Python PNG codec (stdlib zlib + numpy).

The container has no PIL/OpenCV, but the reference's whole image
pipeline (decode -> grayscale -> binarize -> encode,
``/root/reference/main.go:99-190``) only needs straightforward PNG
support: 8-bit depth, color types 0/2/6 (gray / RGB / RGBA), no
interlace. This codec implements exactly that from the public PNG
spec (RFC 2083), so the Spark-side pipeline is REAL — the only
stubbed stage is Tesseract itself (see operators/ocr.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


class PngError(ValueError):
    pass


def _chunk(kind: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + kind
        + data
        + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """Encode HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 -> PNG."""
    if img.dtype != np.uint8:
        raise PngError(f"expected uint8, got {img.dtype}")
    if img.ndim == 2:
        color_type, arr = 0, img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, arr = 2, img
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type, arr = 6, img
    else:
        raise PngError(f"unsupported shape {img.shape}")
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter type 0 (None) per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, -1)], axis=1
    ).tobytes()
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG -> uint8 array: HxW (gray), HxWx3/4 (RGB/RGBA)."""
    if data[:8] != _SIGNATURE:
        raise PngError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        kind = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if kind == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif kind == b"IDAT":
            idat.append(body)
        elif kind == b"IEND":
            break
    if ihdr is None or not idat:
        raise PngError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _CHANNELS or interlace:
        raise PngError(
            f"unsupported PNG: depth={depth} color_type={color_type} "
            f"interlace={interlace}"
        )
    ch = _CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise PngError("corrupt IDAT payload")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters, scan = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    for y in range(h):
        line = scan[y].copy()
        prev = out[y - 1] if y > 0 else np.zeros(stride, np.uint8)
        f = filters[y]
        if f == 0:
            out[y] = line
        elif f == 2:  # Up
            out[y] = line + prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = out[y]
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                up = prev[x]
                ul = prev[x - ch] if x >= ch else 0
                if f == 1:
                    cur[x] = (int(line[x]) + int(left)) & 0xFF
                elif f == 3:
                    cur[x] = (int(line[x]) + (int(left) + int(up)) // 2) & 0xFF
                else:
                    cur[x] = (
                        int(line[x])
                        + int(_paeth(np.uint8(left), np.uint8(up), np.uint8(ul)))
                    ) & 0xFF
        else:
            raise PngError(f"unknown filter {f}")
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img
