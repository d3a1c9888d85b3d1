"""Minimal pure-Python baseline JPEG codec (numpy).

The reference accepts ``.jpg/.jpeg`` uploads (``/root/reference/
main.go:73-80``) and decodes them with the Go stdlib ``image.Decode``
(``main.go:149``); the container has no PIL, so — like ``png.py`` —
this implements the needed subset straight from the public JPEG
specs (ITU-T T.81 / ISO 10918-1 baseline DCT, JFIF 1.02):

- decode: baseline sequential (SOF0) AND progressive (SOF2), 8-bit,
  grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling, byte
  stuffing, restart markers. Progressive covers the full T.81 Annex G
  Huffman mode: spectral selection, successive approximation (DC and
  AC refinement scans), EOB runs, interleaved DC scans and
  non-interleaved per-component AC scans — the same feature set the
  Go stdlib decoder accepts (``main.go:149``). Arithmetic coding and
  hierarchical mode are rejected with a clear error (the Go stdlib
  rejects them too).
- encode: baseline grayscale / YCbCr 4:4:4 with the T.81 Annex K
  example quantization + Huffman tables, plus a progressive encoder
  (libjpeg-style scan script with DC/AC successive approximation)
  used to synthesize fixtures that exercise every progressive decode
  path — enough for deterministic round-trip tests without PIL.

JPEG is lossy: round-trips assert closeness, not equality. The OCR
pipeline binarizes at 128 afterward, so codec-level rounding noise
rarely moves a pixel across the threshold for the synthetic fixtures.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


#: zigzag index order: zigzag position -> (row-major) block index
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

#: T.81 Annex K.1 example luminance / chrominance quantization tables
#: (zigzag order), the de-facto "quality 50" baseline.
_QT_LUMA = np.array([
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
    103, 99,
], dtype=np.int32)
_QT_CHROMA = np.array([
    17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

#: T.81 Annex K.3 example Huffman tables: (BITS counts, HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis matrix C with orthonormal scaling."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0, :] = 1.0
    scale = np.full((8, 1), np.sqrt(2.0 / 8.0))
    scale[0, 0] = np.sqrt(1.0 / 8.0)
    return c * scale


_C = _dct_matrix()


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, per T.81 C.2 canonical ordering."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, code_length)."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_decode_table(bits, vals).items()
    }


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing removal; stops at any real marker (incl. RSTn handled by
    the caller via ``sync_restart``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise JpegError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")

    def sync_restart(self) -> None:
        """Consume an RSTn marker at a byte boundary and reset bits."""
        self.bitbuf = 0
        self.nbits = 0
        while self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
            return
        raise JpegError("expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: map t raw bits to a signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JPEG -> uint8 HxW (gray) or HxWx3 (RGB).

    4-component Adobe CMYK / YCCK (APP14 transform 0 / 2 — scanned-
    document and print-pipeline corpora) decode to RGB via the
    libjpeg/Adobe convention (ink values stored inverted, so
    R = s_c * s_k / 255 on the stored bytes). EXIF orientation is NOT
    applied here — ``image.Decode`` parity (``main.go:149``; the Go
    stdlib ignores EXIF too); callers normalize explicitly with
    :func:`exif_orientation` + :func:`apply_exif_orientation`."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    adobe_transform = None  # APP14 "Adobe" color-transform byte
    coef = None  # progressive: per-component zigzag coefficient store
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        seg = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 15
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(seg[i:i + 64], np.uint8).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i:i + 128], ">u2").astype(np.int32)
                    i += 128
                qt[tid] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if precision != 8:
                raise JpegError(f"unsupported precision {precision}")
            comps = []
            for c in range(ncomp):
                cid, sampling, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": sampling >> 4, "v": sampling & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported SOF marker 0xFF{marker:02X} "
                "(baseline sequential and progressive are implemented)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                (huff_dc if cls == 0 else huff_ac)[tid] = _build_decode_table(
                    bits, vals
                )
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            # APP14: "Adobe" + version(2) + flags0(2) + flags1(2) +
            # transform(1): 0 = CMYK/RGB, 1 = YCbCr, 2 = YCCK
            adobe_transform = seg[11]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            frame["adobe"] = adobe_transform
            ns = seg[0]
            scan_map = {}
            scan_comps = []
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_map[cid] = (tables >> 4, tables & 15)
                scan_comps.append(cid)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if not frame["progressive"]:
                return _decode_scan(
                    data, pos + 2 + seglen, frame, scan_map, qt, huff_dc,
                    huff_ac, restart_interval,
                )
            if coef is None:
                coef = _init_coef_store(frame)
            pos = _decode_progressive_scan(
                data, pos + 2 + seglen, frame, scan_comps, scan_map,
                ss, se, ah, al, huff_dc, huff_ac, restart_interval, coef,
            )
            continue
        # APPn / COM / others: skip
        pos += 2 + seglen
    if coef is not None:
        return _reconstruct_progressive(frame, qt, coef)
    raise JpegError("no scan data found")


def _decode_scan(data, pos, frame, scan_map, qt, huff_dc, huff_ac, dri):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), np.float64)
        for c in comps
    ]
    pred = [0] * len(comps)
    reader = _BitReader(data, pos)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_index and mcu_index % dri == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan_map[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, np.int32)
                        t = reader.decode_symbol(huff_dc[td])
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(huff_ac[ta])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC run overflow")
                            coeffs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, np.float64)
                        block[_ZIGZAG] = coeffs * qt[c["tq"]]
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_index += 1
    return _assemble_planes(
        planes, comps, hmax, vmax, h, w, frame.get("adobe")
    )


def _ycc_to_rgb(y, cb, cr):
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return r, g, b


def _assemble_planes(planes, comps, hmax, vmax, h, w, adobe=None) -> np.ndarray:
    """Upsample chroma to full resolution, crop to (h, w), and
    color-convert — the shared reconstruction tail of the baseline and
    progressive decoders. ``adobe`` is the APP14 transform byte (or
    None), consulted only for 4-component frames."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(comps) == 4:
        # 4-component color handling follows libjpeg/Go: the
        # inverted-ink convention (stored s = 255 - true ink, so
        # R = s_c * s_k / 255) applies ONLY when an Adobe APP14
        # marker was present (transform 0 = CMYK, 2 = YCCK). A plain
        # unmarked 4-component frame stores direct ink densities —
        # R = (255 - C)(255 - K)/255 on the stored values.
        if adobe == 2:  # YCCK: first three channels ride YCbCr
            sc, sm, sy = _ycc_to_rgb(
                full[0], full[1] - 128.0, full[2] - 128.0
            )
        elif adobe is not None:  # Adobe CMYK (transform 0)
            sc, sm, sy = full[0], full[1], full[2]
        else:  # no APP14: direct ink densities, invert to Adobe form
            sc, sm, sy = 255.0 - full[0], 255.0 - full[1], 255.0 - full[2]
        sk = full[3] if adobe is not None else 255.0 - full[3]
        rgb = np.stack([sc, sm, sy], axis=-1) * (sk[..., None] / 255.0)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    if len(comps) != 3:
        raise JpegError(f"unsupported component count {len(comps)}")
    r, g, b = _ycc_to_rgb(full[0], full[1] - 128.0, full[2] - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive decoder (T.81 Annex G, Huffman coding)
# ---------------------------------------------------------------------------


def _mcu_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcus_x, mcus_y


def _init_coef_store(frame) -> list[np.ndarray]:
    """Per-component (blocks_y, blocks_x, 64) int32 arrays in ZIGZAG
    coefficient order, sized for the full interleaved-MCU grid (so
    interleaved DC scans can write the padding blocks of subsampled
    components; non-interleaved AC scans touch only the real blocks)."""
    _, _, mcus_x, mcus_y = _mcu_geometry(frame)
    return [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
        for c in frame["comps"]
    ]


def _comp_blocks(frame, c) -> tuple[int, int]:
    """Non-interleaved block grid of one component: blocks covering
    ceil(dim * sampling / max_sampling) samples (T.81 A.1.1)."""
    hmax, vmax, _, _ = _mcu_geometry(frame)
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _dc_first_block(reader, table, blk, al, pred_box):
    t = reader.decode_symbol(table)
    diff = _extend(reader.read_bits(t), t)
    pred_box[0] += diff
    blk[0] = pred_box[0] << al


def _dc_refine_block(reader, blk, al):
    if reader.read_bit():
        blk[0] = int(blk[0]) | (1 << al)


def _ac_first_block(reader, table, blk, ss, se, al, eobrun):
    """Returns the updated EOB-run counter (blocks still to skip)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            return eobrun
        k += r
        if k > se:
            raise JpegError("AC run overflow in progressive scan")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, table, blk, ss, se, al, eobrun):
    """T.81 G.1.2.3 AC successive-approximation refinement; returns
    the updated EOB-run counter. History-nonzero coefficients receive
    correction bits; newly-significant ones arrive as ±1 << al."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(table)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:
                    # the run INCLUDES the current block: its remaining
                    # history-nonzero coefficients still receive
                    # correction bits in the tail loop below (T.81
                    # G.1.2.3; EOB0 -> run of exactly this block)
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegError("invalid AC refinement symbol")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if reader.read_bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0 and reader.read_bit() and (v & p1) == 0:
                blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    data, pos, frame, scan_comps, scan_map, ss, se, ah, al,
    huff_dc, huff_ac, dri, coef,
) -> int:
    """Decode one progressive scan into the coefficient store; returns
    the byte position of the next marker after the entropy data.

    Scan kinds (T.81 G.1): DC first (Ss=0, Ah=0; may be interleaved),
    DC refinement (Ss=0, Ah>0), AC first (Ss>0, Ah=0) and AC
    refinement (Ss>0, Ah>0) — AC scans are always single-component and
    traverse the component's own block grid, not the MCU grid."""
    comps = frame["comps"]
    hmax, vmax, mcus_x, mcus_y = _mcu_geometry(frame)
    if ss > 0 and len(scan_comps) != 1:
        raise JpegError("progressive AC scan must be single-component")
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    # unit list: each entry is the blocks of one MCU as (ci, by, bx)
    units: list[list[tuple[int, int, int]]] = []
    if len(scan_comps) == 1:
        ci = by_id[scan_comps[0]]
        nby, nbx = _comp_blocks(frame, comps[ci])
        for by in range(nby):
            for bx in range(nbx):
                units.append([(ci, by, bx)])
    else:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                mcu = []
                for cid in scan_comps:
                    ci = by_id[cid]
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            mcu.append((ci, my * c["v"] + by, mx * c["h"] + bx))
                units.append(mcu)
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    eobrun = 0
    for mcu_index, mcu in enumerate(units):
        if dri and mcu_index and mcu_index % dri == 0:
            reader.sync_restart()
            pred = [0] * len(comps)
            eobrun = 0
        for ci, by, bx in mcu:
            td, ta = scan_map[comps[ci]["id"]]
            blk = coef[ci][by, bx]
            if ss == 0:
                if ah == 0:
                    pred_box = [pred[ci]]
                    _dc_first_block(reader, huff_dc[td], blk, al, pred_box)
                    pred[ci] = pred_box[0]
                else:
                    _dc_refine_block(reader, blk, al)
            elif ah == 0:
                eobrun = _ac_first_block(
                    reader, huff_ac[ta], blk, ss, se, al, eobrun
                )
            else:
                eobrun = _ac_refine_block(
                    reader, huff_ac[ta], blk, ss, se, al, eobrun
                )
    # advance to the next marker (skip stuffed 0xFF00 and RSTn)
    p = reader.pos
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise JpegError("no marker after progressive scan")


def _reconstruct_progressive(frame, qt, coef) -> np.ndarray:
    comps = frame["comps"]
    hmax, vmax, mcus_x, mcus_y = _mcu_geometry(frame)
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        nby, nbx = coef[ci].shape[0], coef[ci].shape[1]
        plane = np.zeros((nby * 8, nbx * 8), np.float64)
        for by in range(nby):
            for bx in range(nbx):
                block = np.zeros(64, np.float64)
                block[_ZIGZAG] = coef[ci][by, bx] * q
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    _idct2(block.reshape(8, 8)) + 128.0
                )
        planes.append(plane)
    return _assemble_planes(
        planes, comps, hmax, vmax, frame["h"], frame["w"], frame.get("adobe")
    )


# ---------------------------------------------------------------------------
# Encoder (fixtures / round-trip tests; gray + RGB 4:4:4)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _encode_block(bw, block, q, dc_tab, ac_tab, pred):
    # _ZIGZAG maps zigzag position -> block index, and the quant
    # tables are stored in zigzag order, so gather-then-divide lines up
    coeffs = np.round(
        _fdct2(block - 128.0).reshape(64)[_ZIGZAG] / q
    ).astype(np.int32)
    diff = int(coeffs[0]) - pred
    t = int(diff != 0 and int(np.floor(np.log2(abs(diff)))) + 1)
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = np.nonzero(coeffs[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(coeffs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = int(np.floor(np.log2(abs(v)))) + 1
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(coeffs[0])


def _huff_segment(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img: np.ndarray) -> bytes:
    """uint8 HxW (gray) or HxWx3 (RGB) -> baseline JPEG (4:4:4)."""
    if img.dtype != np.uint8:
        raise JpegError(f"expected uint8, got {img.dtype}")
    if img.ndim == 2:
        ycc = img[:, :, None].astype(np.float64)
        ncomp = 1
    elif img.ndim == 3 and img.shape[2] == 3:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        ycc = np.stack([y, cb, cr], axis=-1)
        ncomp = 3
    else:
        raise JpegError(f"unsupported shape {img.shape}")
    h, w = img.shape[:2]
    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00"
            + b"\x00\x01\x00\x01\x00\x00")  # APP0
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in _QT_LUMA)
    if ncomp == 3:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
            int(x) for x in _QT_CHROMA)
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _huff_segment(0, 0, *_DC_LUMA)
    out += _huff_segment(1, 0, *_AC_LUMA)
    if ncomp == 3:
        out += _huff_segment(0, 1, *_DC_CHROMA)
        out += _huff_segment(1, 1, *_AC_CHROMA)
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    dc_enc = {0: _build_encode_table(*_DC_LUMA), 1: _build_encode_table(*_DC_CHROMA)}
    ac_enc = {0: _build_encode_table(*_AC_LUMA), 1: _build_encode_table(*_AC_CHROMA)}
    qts = {0: _QT_LUMA.astype(np.float64), 1: _QT_CHROMA.astype(np.float64)}
    bw = _BitWriter()
    pred = [0] * ncomp
    blocks_y = (h + 7) // 8
    blocks_x = (w + 7) // 8
    # edge padding: replicate last row/col (standard practice)
    padded = np.pad(
        ycc, ((0, blocks_y * 8 - h), (0, blocks_x * 8 - w), (0, 0)), mode="edge"
    )
    for by in range(blocks_y):
        for bx in range(blocks_x):
            for c in range(ncomp):
                tid = 0 if c == 0 else 1
                block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8, c]
                pred[c] = _encode_block(
                    bw, block, qts[tid], dc_enc[tid], ac_enc[tid], pred[c]
                )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (fixtures for the Annex G decoder paths)
# ---------------------------------------------------------------------------

#: flat AC Huffman table for progressive scans: every AC symbol the
#: mode can emit — EOBn (n<=14), ZRL, and (run<<4)|size for size 1-10
#: — at code length 8 (176 codes < 255, so the table is canonical and
#: the all-ones code stays unused as T.81 requires). Unlike the Annex
#: K baseline tables it contains EOBn for n>0, which lets fixtures
#: exercise multi-block EOB runs in the decoder.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted({(n << 4) for n in range(15)} | {0xF0}
           | {(r << 4) | s for r in range(16) for s in range(1, 11)}),
)


class _ProgState:
    """Pending EOB run + the correction bits buffered behind it."""

    def __init__(self):
        self.eobrun = 0
        self.pending_bits: list[int] = []


def _emit_eobrun(bw: _BitWriter, actab, state: _ProgState) -> None:
    if state.eobrun > 0:
        nbits = state.eobrun.bit_length() - 1
        code, ln = actab[nbits << 4]
        bw.write(code, ln)
        if nbits:
            bw.write(state.eobrun & ((1 << nbits) - 1), nbits)
        state.eobrun = 0
        for b in state.pending_bits:
            bw.write(b, 1)
        state.pending_bits = []


def _encode_dc_first_block(bw, dctab, blk, al, pred: int) -> int:
    t = int(blk[0]) >> al  # arithmetic shift: point transform
    diff = t - pred
    s = int(diff != 0 and abs(diff).bit_length())
    code, ln = dctab[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    return t


def _encode_dc_refine_block(bw, blk, al) -> None:
    bw.write((int(blk[0]) >> al) & 1, 1)


def _encode_ac_first_block(bw, actab, blk, ss, se, al, state) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        _emit_eobrun(bw, actab, state)
        while r > 15:
            code, ln = actab[0xF0]
            bw.write(code, ln)
            r -= 16
        s = t.bit_length()
        code, ln = actab[(r << 4) | s]
        bw.write(code, ln)
        bw.write(t if v > 0 else t ^ ((1 << s) - 1), s)
        r = 0
    if r > 0:
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            _emit_eobrun(bw, actab, state)


def _encode_ac_refine_block(bw, actab, blk, ss, se, al, state) -> None:
    """T.81 G.1.2.3 encoder side, mirroring the decoder: corrections
    for history-nonzero coefficients ride behind run/EOB symbols."""
    absv = [0] * (se + 1)
    eob = ss - 1
    for k in range(ss, se + 1):
        t = abs(int(blk[k])) >> al
        absv[k] = t
        if t == 1:
            eob = k
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _emit_eobrun(bw, actab, state)
            code, ln = actab[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in br:
                bw.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        _emit_eobrun(bw, actab, state)
        code, ln = actab[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if int(blk[k]) >= 0 else 0, 1)
        for b in br:
            bw.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        state.eobrun += 1
        state.pending_bits.extend(br)
        if state.eobrun == 0x7FFF:
            _emit_eobrun(bw, actab, state)


def encode_jpeg_progressive(img: np.ndarray) -> bytes:
    """uint8 HxW (gray) or HxWx3 (RGB) -> progressive JPEG (SOF2,
    4:4:4) with a libjpeg-style scan script: DC first at Al=1, AC
    bands with successive approximation, then DC and AC refinement
    scans down to Al=0. Decodes to EXACTLY the same pixels as
    ``encode_jpeg`` of the same image (identical quantized
    coefficients, delivered progressively)."""
    if img.dtype != np.uint8:
        raise JpegError(f"expected uint8, got {img.dtype}")
    if img.ndim == 2:
        ycc = img[:, :, None].astype(np.float64)
        ncomp = 1
    elif img.ndim == 3 and img.shape[2] == 3:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        ycc = np.stack([y, cb, cr], axis=-1)
        ncomp = 3
    else:
        raise JpegError(f"unsupported shape {img.shape}")
    h, w = img.shape[:2]
    blocks_y = (h + 7) // 8
    blocks_x = (w + 7) // 8
    padded = np.pad(
        ycc, ((0, blocks_y * 8 - h), (0, blocks_x * 8 - w), (0, 0)), mode="edge"
    )
    qts = {0: _QT_LUMA.astype(np.float64), 1: _QT_CHROMA.astype(np.float64)}
    # quantized zigzag coefficients for every (component, block)
    coef = [
        np.zeros((blocks_y, blocks_x, 64), np.int32) for _ in range(ncomp)
    ]
    for c in range(ncomp):
        q = qts[0 if c == 0 else 1]
        for by in range(blocks_y):
            for bx in range(blocks_x):
                block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8, c]
                coef[c][by, bx] = np.round(
                    _fdct2(block - 128.0).reshape(64)[_ZIGZAG] / q
                ).astype(np.int32)
    out = bytearray(b"\xff\xd8")
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00"
            + b"\x00\x01\x00\x01\x00\x00")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in _QT_LUMA)
    if ncomp == 3:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
            int(x) for x in _QT_CHROMA)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    out += _huff_segment(0, 0, *_DC_LUMA)
    if ncomp == 3:
        out += _huff_segment(0, 1, *_DC_CHROMA)
    out += _huff_segment(1, 0, *_AC_PROG)
    dc_enc = {0: _build_encode_table(*_DC_LUMA), 1: _build_encode_table(*_DC_CHROMA)}
    ac_enc = _build_encode_table(*_AC_PROG)
    if ncomp == 3:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([2], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([2], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    for scan_comps, ss, se, ah, al in script:
        sos = bytes([len(scan_comps)])
        for c in scan_comps:
            td = 0 if c == 0 else 1
            sos += bytes([c + 1, (td << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        bw = _BitWriter()
        state = _ProgState()
        pred = [0] * ncomp
        # 4:4:4 => the MCU grid equals every component's block grid
        for by in range(blocks_y):
            for bx in range(blocks_x):
                for c in scan_comps:
                    blk = coef[c][by, bx]
                    if ss == 0:
                        if ah == 0:
                            pred[c] = _encode_dc_first_block(
                                bw, dc_enc[0 if c == 0 else 1], blk, al, pred[c]
                            )
                        else:
                            _encode_dc_refine_block(bw, blk, al)
                    elif ah == 0:
                        _encode_ac_first_block(bw, ac_enc, blk, ss, se, al, state)
                    else:
                        _encode_ac_refine_block(bw, ac_enc, blk, ss, se, al, state)
        _emit_eobrun(bw, ac_enc, state)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# EXIF orientation (APP1 / TIFF tag 0x0112) — scanned-document corpora
# ---------------------------------------------------------------------------


def exif_orientation(data: bytes) -> int:
    """Read the EXIF Orientation tag (1..8) from a JPEG's APP1
    segment; 1 (identity) when absent or malformed. Parses only the
    TIFF IFD0 header (public EXIF 2.x / TIFF 6.0 spec) — no thumbnail
    or maker-note walking. ``decode_jpeg`` deliberately does NOT apply
    it (Go ``image.Decode`` parity); pair with
    :func:`apply_exif_orientation` to normalize a scan corpus."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return 1
    try:
        pos, n = 2, len(data)
        while pos + 4 <= n and data[pos] == 0xFF:
            marker = data[pos + 1]
            if marker in (0x01, 0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                # standalone markers carry no length field
                pos += 2
                continue
            seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
            if marker == 0xDA:  # entropy-coded data: EXIF must precede it
                return 1
            if marker == 0xE1:
                seg = data[pos + 4:pos + 2 + seglen]
                if seg[:6] == b"Exif\x00\x00":
                    return _tiff_orientation(seg[6:])
            pos += 2 + seglen
        return 1
    except (IndexError, struct.error):
        return 1


def _tiff_orientation(t: bytes) -> int:
    try:
        if t[:2] == b"II":
            u16 = lambda b, i: int.from_bytes(b[i:i + 2], "little")  # noqa: E731
            u32 = lambda b, i: int.from_bytes(b[i:i + 4], "little")  # noqa: E731
        elif t[:2] == b"MM":
            u16 = lambda b, i: int.from_bytes(b[i:i + 2], "big")  # noqa: E731
            u32 = lambda b, i: int.from_bytes(b[i:i + 4], "big")  # noqa: E731
        else:
            return 1
        if u16(t, 2) != 42:
            return 1
        ifd = u32(t, 4)
        n_entries = u16(t, ifd)
        for i in range(n_entries):
            e = ifd + 2 + 12 * i
            if u16(t, e) == 0x0112 and u16(t, e + 2) == 3:  # SHORT
                v = u16(t, e + 8)
                return v if 1 <= v <= 8 else 1
        return 1
    except (IndexError, struct.error):
        return 1


def apply_exif_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Map a decoded image to upright display orientation per the EXIF
    tag (1 identity, 2 mirror-H, 3 rot180, 4 mirror-V, 5 transpose,
    6 rot90 CW, 7 transverse, 8 rot270 CW). Pure numpy views +
    ``ascontiguousarray`` so downstream codecs see packed buffers."""
    if orientation == 2:
        out = img[:, ::-1]
    elif orientation == 3:
        out = img[::-1, ::-1]
    elif orientation == 4:
        out = img[::-1, :]
    elif orientation == 5:
        out = np.swapaxes(img, 0, 1)
    elif orientation == 6:
        out = np.swapaxes(img, 0, 1)[:, ::-1]
    elif orientation == 7:
        out = np.swapaxes(img, 0, 1)[::-1, ::-1]
    elif orientation == 8:
        out = np.swapaxes(img, 0, 1)[::-1, :]
    else:
        out = img
    return np.ascontiguousarray(out)


def exif_app1_segment(orientation: int) -> bytes:
    """Minimal valid APP1/EXIF segment carrying only the Orientation
    tag (big-endian TIFF, one IFD0 entry) — fixture material for the
    orientation tests; byte-level layout from the public TIFF 6.0 /
    EXIF specs."""
    tiff = (
        b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8)
        + struct.pack(">H", 1)                      # 1 IFD entry
        + struct.pack(">HHIHH", 0x0112, 3, 1, orientation, 0)
        + struct.pack(">I", 0)                      # next IFD: none
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_exif(jpeg: bytes, orientation: int) -> bytes:
    """Splice an Orientation-only APP1 right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG")
    return jpeg[:2] + exif_app1_segment(orientation) + jpeg[2:]


# ---------------------------------------------------------------------------
# CMYK / YCCK encoder (fixtures for the 4-component decode path)
# ---------------------------------------------------------------------------


def encode_jpeg_cmyk(cmyk: np.ndarray, ycck: bool = False) -> bytes:
    """uint8 HxWx4 TRUE ink densities -> baseline Adobe JPEG
    (4 components, 4:4:4, APP14 transform 0=CMYK / 2=YCCK). Channels
    are stored INVERTED per the Adobe/libjpeg convention
    (s = 255 - ink), matching what ``decode_jpeg``'s 4-component
    branch reads back; for YCCK the inverted CMY additionally rides
    the YCbCr transform. Fixture/round-trip material — real corpora
    are decoded, not produced, by this module."""
    if cmyk.dtype != np.uint8 or cmyk.ndim != 3 or cmyk.shape[2] != 4:
        raise JpegError(f"expected uint8 HxWx4, got {cmyk.dtype} {cmyk.shape}")
    inv = 255.0 - cmyk.astype(np.float64)
    if ycck:
        sc, sm, sy = inv[..., 0], inv[..., 1], inv[..., 2]
        y = 0.299 * sc + 0.587 * sm + 0.114 * sy
        cb = -0.168736 * sc - 0.331264 * sm + 0.5 * sy + 128
        cr = 0.5 * sc - 0.418688 * sm - 0.081312 * sy + 128
        chans = np.stack([y, cb, cr, inv[..., 3]], axis=-1)
        tids = [0, 1, 1, 0]
    else:
        chans = inv
        tids = [0, 0, 0, 0]
    h, w = cmyk.shape[:2]
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in _QT_LUMA)
    if ycck:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
            int(x) for x in _QT_CHROMA)
    # APP14 Adobe: version 100, flags 0, transform byte last
    adobe = b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 2 if ycck else 0)
    out += b"\xff\xee" + struct.pack(">H", len(adobe) + 2) + adobe
    sof = struct.pack(">BHHB", 8, h, w, 4)
    for c in range(4):
        sof += bytes([c + 1, 0x11, tids[c]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _huff_segment(0, 0, *_DC_LUMA)
    out += _huff_segment(1, 0, *_AC_LUMA)
    if ycck:
        out += _huff_segment(0, 1, *_DC_CHROMA)
        out += _huff_segment(1, 1, *_AC_CHROMA)
    sos = bytes([4])
    for c in range(4):
        sos += bytes([c + 1, 0x11 * tids[c]])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    dc_enc = {0: _build_encode_table(*_DC_LUMA), 1: _build_encode_table(*_DC_CHROMA)}
    ac_enc = {0: _build_encode_table(*_AC_LUMA), 1: _build_encode_table(*_AC_CHROMA)}
    qts = {0: _QT_LUMA.astype(np.float64), 1: _QT_CHROMA.astype(np.float64)}
    bw = _BitWriter()
    pred = [0] * 4
    blocks_y = (h + 7) // 8
    blocks_x = (w + 7) // 8
    padded = np.pad(
        chans, ((0, blocks_y * 8 - h), (0, blocks_x * 8 - w), (0, 0)),
        mode="edge",
    )
    for by in range(blocks_y):
        for bx in range(blocks_x):
            for c in range(4):
                tid = tids[c]
                block = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8, c]
                pred[c] = _encode_block(
                    bw, block, qts[tid], dc_enc[tid], ac_enc[tid], pred[c]
                )
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
