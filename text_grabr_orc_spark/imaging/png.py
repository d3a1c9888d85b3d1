"""Minimal pure-Python PNG codec (stdlib zlib + numpy).

The container has no PIL/OpenCV, but the reference's whole image
pipeline (decode -> grayscale -> binarize -> encode,
``/root/reference/main.go:99-190``) needs real PNG support. The
encoder emits straightforward 8-bit type 0/2/6 streams; the DECODER
covers the full baseline feature set of Go's stdlib ``image/png``
(what ``image.Decode`` at ``main.go:149`` accepts): all five color
types (gray / RGB / palette / gray+alpha / RGBA), bit depths
1/2/4/8/16, PLTE + tRNS transparency, and Adam7 interlace — from the
public PNG spec (RFC 2083). The only stubbed stage in the pipeline is
Tesseract itself (see operators/ocr.py).
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


#: channels per color type (all five PNG color types)
_TYPE_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: legal bit depths per color type (PNG spec table 11.1)
_TYPE_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

#: Adam7 pass geometry: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _defilter(raw: bytes, off: int, h: int, stride: int, bpp: int):
    """Undo PNG scanline filtering for one (sub-)image of ``h`` rows of
    ``stride`` bytes (+1 filter byte each); returns (rows, next_off)."""
    need = h * (stride + 1)
    if len(raw) - off < need:
        raise PngError("corrupt IDAT payload")
    rows = np.frombuffer(raw, np.uint8, count=need, offset=off).reshape(
        h, stride + 1
    )
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
                left = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
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
    return out, off + need


def _unpack_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """(h, stride_bytes) filtered-out rows -> (h, w, ch) uint8 samples.
    depth<8 unpacks bit-packed samples; depth 16 keeps the high byte
    (the standard 16->8 reduction, matching Go's color conversion to
    within 1/257)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * ch].reshape(h, w, ch)
    if depth == 16:
        return rows[:, : w * ch * 2].reshape(h, w, ch, 2)[..., 0]
    # 1/2/4-bit: only single-channel types (gray or palette indices)
    bits = np.unpackbits(rows, axis=1)
    per = bits[:, : w * depth].reshape(h, w, depth)
    vals = np.zeros((h, w), np.uint8)
    for i in range(depth):
        vals = (vals << 1) | per[:, :, i]
    return vals[:, :, None]


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG -> uint8 array: HxW (gray), HxWx3/4 (RGB/RGBA).

    Full baseline coverage mirroring Go's stdlib decoder (the
    reference's ``image.Decode``, ``main.go:149``): all five color
    types (gray / RGB / palette / gray+alpha / RGBA), bit depths
    1/2/4/8/16, PLTE + tRNS, and Adam7 interlace. Palette resolves to
    RGB (RGBA with tRNS); gray+alpha expands to RGBA; 16-bit reduces
    to the high byte; sub-8-bit gray scales to the full 0-255 range.
    """
    if data[:8] != _SIGNATURE:
        raise PngError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    plte: bytes | None = None
    trns: bytes | None = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        kind = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if kind == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif kind == b"PLTE":
            plte = body
        elif kind == b"tRNS":
            trns = body
        elif kind == b"IDAT":
            idat.append(body)
        elif kind == b"IEND":
            break
    if ihdr is None or not idat:
        raise PngError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if color_type not in _TYPE_CHANNELS or depth not in _TYPE_DEPTHS.get(
        color_type, ()
    ):
        raise PngError(
            f"unsupported PNG: depth={depth} color_type={color_type}"
        )
    if interlace not in (0, 1):
        raise PngError(f"unsupported interlace method {interlace}")
    if color_type == 3 and plte is None:
        raise PngError("palette image without PLTE")
    ch = _TYPE_CHANNELS[color_type]
    bpp = max(1, ch * depth // 8)
    raw = zlib.decompress(b"".join(idat))

    def stride_of(width: int) -> int:
        return (width * ch * depth + 7) // 8

    samples = np.zeros((h, w, ch), np.uint8)
    if interlace == 0:
        rows, _ = _defilter(raw, 0, h, stride_of(w), bpp)
        samples = _unpack_samples(rows, w, ch, depth)
    else:  # Adam7: seven independently-filtered sub-images
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, off = _defilter(raw, off, ph, stride_of(pw), bpp)
            sub = _unpack_samples(rows, pw, ch, depth)
            samples[y0::dy, x0::dx] = sub

    if color_type == 3:
        pal = np.frombuffer(plte, np.uint8)
        if len(pal) % 3:
            raise PngError("PLTE length not a multiple of 3")
        pal = pal.reshape(-1, 3)
        idx = samples[:, :, 0]
        if idx.max() >= len(pal):
            raise PngError("palette index out of range")
        rgb = pal[idx]
        if trns is None:
            return rgb
        alpha = np.full(len(pal), 255, np.uint8)
        alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
        return np.dstack([rgb, alpha[idx]])
    if color_type == 0:
        g = samples[:, :, 0]
        if depth < 8:  # scale to full range like Go's Gray conversion
            g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(
                np.uint8
            )
        return g
    if color_type == 4:  # gray+alpha -> RGBA
        g, a = samples[:, :, 0], samples[:, :, 1]
        return np.dstack([g, g, g, a])
    return samples  # RGB / RGBA
