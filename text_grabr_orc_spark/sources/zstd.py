"""From-scratch Zstandard (RFC 8878) codec — pure Python, stdlib only.

The environment has no ``zstandard`` module, so the Avro ``zstandard``
block codec stayed out of subset through round 13 (the codec-table
check raised descriptively).  Same resolution as the snappy/PNG/JPEG
codecs: implement the PUBLIC wire format from its specification —
RFC 8878 / ``zstd/doc/zstd_compression_format.md`` — and pin duplex
parity against the real implementation (zstd-jni ships on Spark's
classpath; Avro's ``CodecFactory.zstandardCodec()`` loads it).

What is implemented:

- ``decompress``: the FULL decoder — frame headers (all FCS widths,
  single-segment, window descriptor, content checksum via a
  from-scratch XXH64), skippable frames, concatenated frames, raw /
  RLE / compressed blocks, all four literals types (raw, RLE,
  Huffman-compressed with direct or FSE-compressed weight tables,
  treeless reuse), 1- and 4-stream literals, FSE table descriptions
  with repeat-zero coding, the three predefined sequence
  distributions, RLE / FSE / repeat sequence-table modes, interleaved
  backward bitstreams, repeat-offset history, and overlapping LZ77
  match execution.  Every malformed-input path raises ``ValueError``
  descriptively — never silent garbage.
- ``compress``: a REAL compressor with BOTH zstd entropy stages —
  per 128 KiB block, a greedy 8-byte-hash LZ matcher (the snappy
  encoder's shape; min-match 8 measured better than 4 on BOTH ratio
  and speed for text) emits zstd sequences coded by a from-scratch
  FSE *encoder* against the three predefined distributions, and the
  literals are Huffman-coded with package-merge length-limited
  canonical codes (direct 4-bit weight description, or an
  FSE-compressed weight description — normalization, table
  description writer, two interleaved encode states — when the
  alphabet extends past 128 or it is simply smaller); single-byte
  runs become RLE blocks, and anything the entropy stages cannot
  shrink falls back to raw forms.  Frames carry the content size and
  XXH64 checksum.  Corpus text lands at ~31% of input (the C
  library's level 3 reaches ~28% with per-block custom sequence
  tables); every conforming decoder (zstd-jni, libzstd, this module)
  reads the output back bit-exactly.

Throughput is pure-Python (the Huffman/FSE hot loops run ~1-5 MB/s
on literals-heavy frames); Avro blocks are bounded (``block_rows``),
so per-block cost stays bounded at any file size — at 100 TB the
cost rides inside the same executor tasks that already decode the
blocks, exactly like the snappy codec's budget.

Used by ``sources/avro_io.py`` ``_compress``/``_decompress``; the
Avro spec adds no extra trailer for zstandard (unlike snappy's CRC).
"""

from __future__ import annotations

_MAGIC = 0xFD2FB528
_SKIP_MAGIC_LO = 0x184D2A50
_SKIP_MAGIC_HI = 0x184D2A5F
_BLOCK_MAX = 128 * 1024
_WINDOW_LIMIT = 1 << 27  # zstd's own default decoder limit (128 MiB)
#: total decoded bytes one decompress() call may produce: a backstop
#: against no-FCS zstd bombs (~32000x expansion), far above any real
#: Avro block (bounded by block_rows) yet small enough to fail loudly
#: before exhausting executor memory
_OUTPUT_LIMIT = 1 << 31

# ---------------------------------------------------------------- XXH64

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — the frame content checksum hash (public
    algorithm; cross-checked against Spark's ``xxhash64`` expression
    and zstd-jni's frame checksums in the tests)."""
    n = len(data)
    mv = memoryview(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        limit = n - 32
        while pos <= limit:
            v1 = (_rotl((v1 + int.from_bytes(mv[pos : pos + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + int.from_bytes(mv[pos + 8 : pos + 16], "little") * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + int.from_bytes(mv[pos + 16 : pos + 24], "little") * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + int.from_bytes(mv[pos + 24 : pos + 32], "little") * _P2) & _M64, 31) * _P1) & _M64
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl((v * _P2) & _M64, 31) * _P1) & _M64) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        k = (_rotl((int.from_bytes(mv[pos : pos + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        h = ((_rotl(h ^ (int.from_bytes(mv[pos : pos + 4], "little") * _P1) & _M64, 23) * _P2) + _P3) & _M64
        pos += 4
    while pos < n:
        h = (_rotl(h ^ (mv[pos] * _P5) & _M64, 11) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ------------------------------------------------------- bitstreams

class _BackBits:
    """Backward bitstream (RFC 8878 §3.1.1.1): bytes are consumed from
    the END; the last byte's highest set bit is the padding sentinel.
    Reads past the start zero-pad (matching the C library's container
    semantics) and drive ``pos`` negative, which callers use as the
    exhaustion signal."""

    __slots__ = ("data", "pos", "b0", "win")

    def __init__(self, data) -> None:
        if len(data) == 0:
            raise ValueError("zstd: empty bitstream")
        last = data[-1]
        if last == 0:
            raise ValueError("zstd: bitstream missing sentinel bit")
        self.data = data
        # bits below the sentinel are the payload
        self.pos = len(data) * 8 - (8 - last.bit_length()) - 1
        self.b0 = len(data)  # lowest loaded byte index
        self.win = 0

    def _ensure(self, lowbit: int) -> None:
        if lowbit < 0:
            lowbit = 0
        while self.b0 * 8 > lowbit:
            k = self.b0 - (lowbit >> 3)
            if k > 8:
                k = 8
            self.win = (self.win << (8 * k)) | int.from_bytes(
                self.data[self.b0 - k : self.b0], "little"
            )
            self.b0 -= k
        # trim consumed high bits so the window stays small
        keep = self.pos - self.b0 * 8
        if keep >= 0 and self.win.bit_length() > keep:
            self.win &= (1 << keep) - 1

    def read(self, n: int) -> int:
        """Consume ``n`` bits; zero-padded once the stream runs out."""
        if n == 0:
            return 0
        p = self.pos - n
        if p >= 0:
            self._ensure(p)
            self.pos = p
            return (self.win >> (p - self.b0 * 8)) & ((1 << n) - 1)
        avail = self.pos
        v = 0
        if avail > 0:
            self._ensure(0)
            v = self.win & ((1 << avail) - 1)
        self.pos = p  # negative: exhausted
        return v << (-p)


class _FwdBits:
    """Forward little-endian bitstream (FSE table descriptions only)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data) -> None:
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        lo = self.bitpos >> 3
        hi = (self.bitpos + n + 7) >> 3
        if hi > len(self.data):
            raise ValueError("zstd: FSE table description truncated")
        chunk = int.from_bytes(self.data[lo:hi], "little")
        v = (chunk >> (self.bitpos & 7)) & ((1 << n) - 1)
        self.bitpos += n
        return v

    def bytes_consumed(self) -> int:
        return (self.bitpos + 7) >> 3


# ------------------------------------------------------------- FSE

def _fse_read_distribution(data, max_symbol: int, max_log: int):
    """Parse an FSE table description (RFC 8878 §4.1.1).  Returns
    ``(probs, accuracy_log, bytes_consumed)`` where probs[i] is the
    normalized probability of symbol i (−1 = less-than-one)."""
    bs = _FwdBits(data)
    al = bs.read(4) + 5
    if al > max_log:
        raise ValueError(
            f"zstd: FSE accuracy log {al} exceeds maximum {max_log}"
        )
    remaining = (1 << al) + 1
    probs: list[int] = []
    prev_zero = False
    while remaining > 1:
        if len(probs) > max_symbol:
            raise ValueError("zstd: FSE distribution has too many symbols")
        if prev_zero:
            n0 = 0
            while True:
                rep = bs.read(2)
                n0 += rep
                if rep != 3:
                    break
            probs.extend([0] * n0)
            if len(probs) > max_symbol + 1:
                raise ValueError(
                    "zstd: FSE repeat-zero run overflows symbol range"
                )
            prev_zero = False
            continue
        # variable-width probability read (threshold coding)
        nbits = remaining.bit_length()
        max_small = (1 << nbits) - 1 - remaining
        low = bs.read(nbits - 1)
        if low < max_small:
            count = low
        else:
            extra = bs.read(1)
            count = low | (extra << (nbits - 1))
            if count >= (1 << (nbits - 1)):
                count -= max_small
        count -= 1  # −1 encodes the less-than-one probability
        remaining -= -count if count < 0 else count
        probs.append(count)
        prev_zero = count == 0
    if remaining != 1:
        raise ValueError("zstd: FSE distribution does not sum to table size")
    return probs, al, bs.bytes_consumed()


def _fse_build_dtable(probs, al: int):
    """FSE decode table: list of (symbol, nb_bits, baseline) per state
    (RFC 8878 §4.1.1 table construction)."""
    size = 1 << al
    symbols = [0] * size
    high = size - 1
    nexts = [0] * len(probs)
    for s, p in enumerate(probs):
        if p == -1:
            symbols[high] = s
            high -= 1
            nexts[s] = 1
        else:
            nexts[s] = p
    step = (size >> 1) + (size >> 3) + 3
    pos = 0
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            symbols[pos] = s
            pos = (pos + step) & (size - 1)
            while pos > high:
                pos = (pos + step) & (size - 1)
    if pos != 0:
        raise ValueError("zstd: corrupt FSE distribution (spread mismatch)")
    table = [None] * size
    for i in range(size):
        s = symbols[i]
        x = nexts[s]
        nexts[s] = x + 1
        nb = al - (x.bit_length() - 1)
        table[i] = (s, nb, (x << nb) - size)
    return table


def _fse_rle_table(symbol: int):
    """Degenerate 1-state table for RLE sequence mode."""
    return [(symbol, 0, 0)]


def _fse_decode_interleaved(data, table, al: int, max_out: int):
    """Two interleaved FSE states over one backward stream (Huffman
    weight decoding, RFC 8878 §4.2.1.2)."""
    bs = _BackBits(data)
    s1 = bs.read(al)
    s2 = bs.read(al)
    if bs.pos < 0:
        raise ValueError("zstd: FSE weight stream shorter than two states")
    out: list[int] = []
    while True:
        sym, nb, base = table[s1]
        out.append(sym)
        s1 = base + bs.read(nb)
        if bs.pos < 0:
            out.append(table[s2][0])
            break
        sym, nb, base = table[s2]
        out.append(sym)
        s2 = base + bs.read(nb)
        if bs.pos < 0:
            out.append(table[s1][0])
            break
        if len(out) > max_out:
            raise ValueError("zstd: too many Huffman weights")
    if len(out) > max_out:
        raise ValueError("zstd: too many Huffman weights")
    return out


# --------------------------------------------------------- Huffman

def _huf_build_dtable(weights):
    """Canonical Huffman decode table from weights (last weight
    implied, RFC 8878 §4.2.1.3): returns (table, max_bits) where
    table[peek_value] = (symbol, nb_bits)."""
    total = 0
    for w in weights:
        if w > 11:
            raise ValueError(f"zstd: Huffman weight {w} exceeds maximum 11")
        if w > 0:
            total += 1 << (w - 1)
    if total == 0:
        raise ValueError("zstd: Huffman weights are all zero")
    max_bits = total.bit_length()  # log2 of next power of two > total
    left = (1 << max_bits) - total
    if left & (left - 1):
        raise ValueError("zstd: Huffman weights do not complete a power of 2")
    last_w = left.bit_length()  # log2(left) + 1
    weights = list(weights) + [last_w]
    if max_bits > 11:
        raise ValueError(f"zstd: Huffman code length {max_bits} exceeds 11")
    # fill table from position 0: longest codes (lowest weight) first,
    # natural symbol order within a rank
    size = 1 << max_bits
    table = [None] * size
    rank_pos = [0] * (max_bits + 2)
    for w in weights:
        if w > 0:
            rank_pos[w] += 1 << (w - 1)
    acc = 0
    starts = [0] * (max_bits + 2)
    for w in range(1, max_bits + 2):
        starts[w] = acc
        acc += rank_pos[w]
    for sym, w in enumerate(weights):
        if w == 0:
            continue
        nb = max_bits + 1 - w
        span = 1 << (w - 1)
        p = starts[w]
        for j in range(span):
            table[p + j] = (sym, nb)
        starts[w] = p + span
    if any(t is None for t in table):
        raise ValueError("zstd: Huffman table not fully populated")
    return table, max_bits


def _huf_read_table(data):
    """Huffman tree description (RFC 8878 §4.2.1): direct 4-bit
    weights or FSE-compressed weights.  Returns (table, max_bits,
    bytes_consumed)."""
    if len(data) < 1:
        raise ValueError("zstd: missing Huffman tree description")
    hb = data[0]
    if hb >= 128:
        n = hb - 127
        nbytes = (n + 1) // 2
        if 1 + nbytes > len(data):
            raise ValueError("zstd: truncated direct Huffman weights")
        weights = []
        for i in range(n):
            b = data[1 + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        table, max_bits = _huf_build_dtable(weights)
        return table, max_bits, 1 + nbytes
    if 1 + hb > len(data):
        raise ValueError("zstd: truncated FSE-compressed Huffman weights")
    sub = data[1 : 1 + hb]
    probs, al, used = _fse_read_distribution(sub, 255, 6)
    ftab = _fse_build_dtable(probs, al)
    weights = _fse_decode_interleaved(sub[used:], ftab, al, 255)
    table, max_bits = _huf_build_dtable(weights)
    return table, max_bits, 1 + hb


def _huf_decode_stream(data, table, max_bits: int, n_out: int) -> bytearray:
    """Huffman-decode ``n_out`` literals from one backward stream.

    Hot loop: the bitstream is managed with local integers (a small
    sliding window over the byte tail) instead of the ``_BackBits``
    object — the per-symbol cost is a handful of int ops, no method
    calls (~3x throughput on literals-heavy frames)."""
    out = bytearray()
    if n_out == 0:
        return out
    if len(data) == 0 or data[-1] == 0:
        raise ValueError("zstd: bitstream missing sentinel bit")
    pos = len(data) * 8 - (8 - data[-1].bit_length()) - 1
    b0 = len(data)  # lowest loaded byte index
    win = 0
    mask = (1 << max_bits) - 1
    append = out.append
    for _ in range(n_out):
        low = pos - max_bits
        floor = b0 * 8
        if low < floor:
            need = low >> 3 if low > 0 else 0
            win = (win << (8 * (b0 - need))) | int.from_bytes(
                data[need:b0], "little"
            )
            b0 = need
            floor = need * 8
        shift = low - floor
        v = (win >> shift) & mask if shift >= 0 else (win << -shift) & mask
        sym, nb = table[v]
        append(sym)
        pos -= nb
        if pos < 0:
            raise ValueError("zstd: Huffman literal stream over-consumed")
        win &= (1 << (pos - floor)) - 1  # trim consumed top bits
    if pos != 0:
        raise ValueError(
            f"zstd: Huffman literal stream not exactly consumed"
            f" ({pos} bits left)"
        )
    return out


# ------------------------------------------------- sequence tables

# LL code -> (baseline, extra bits); codes 0-15 are the value itself
_LL_EXTRA = [
    (0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 0), (7, 0),
    (8, 0), (9, 0), (10, 0), (11, 0), (12, 0), (13, 0), (14, 0), (15, 0),
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10),
    (2048, 11), (4096, 12), (8192, 13), (16384, 14), (32768, 15),
    (65536, 16),
]

# ML code -> (baseline, extra bits); codes 0-31 are value+3
_ML_EXTRA = [(c + 3, 0) for c in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]

# predefined distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)

_SEQ_KINDS = (
    # (max symbol, max accuracy log, default distribution)
    ("literals-length", 35, 9, _LL_DEFAULT),
    ("offset", 31, 8, _OF_DEFAULT),
    ("match-length", 52, 9, _ML_DEFAULT),
)

_DEFAULT_DTABLES = {}


def _seq_table(mode: int, kind_idx: int, data, pos: int, prev):
    """Resolve one sequence code table per its 2-bit mode.  Returns
    (dtable, accuracy_log, new_pos)."""
    name, max_sym, max_log, default = _SEQ_KINDS[kind_idx]
    if mode == 0:  # predefined
        if kind_idx not in _DEFAULT_DTABLES:
            probs, al = default
            _DEFAULT_DTABLES[kind_idx] = (_fse_build_dtable(probs, al), al)
        return (*_DEFAULT_DTABLES[kind_idx], pos)
    if mode == 1:  # RLE: one byte, the only symbol
        if pos >= len(data):
            raise ValueError(f"zstd: truncated RLE {name} table")
        sym = data[pos]
        if sym > max_sym:
            raise ValueError(
                f"zstd: RLE {name} symbol {sym} exceeds maximum {max_sym}"
            )
        return _fse_rle_table(sym), 0, pos + 1
    if mode == 2:  # FSE-compressed description
        probs, al, used = _fse_read_distribution(
            data[pos:], max_sym, max_log
        )
        return _fse_build_dtable(probs, al), al, pos + used
    # mode == 3: repeat previous table
    if prev is None:
        raise ValueError(
            f"zstd: repeat mode for {name} codes with no previous table"
        )
    return prev[0], prev[1], pos


# ------------------------------------------------- block decoding

class _FrameState:
    """Entropy state that persists across blocks within one frame."""

    __slots__ = ("huf", "seq_tables", "reps")

    def __init__(self) -> None:
        self.huf = None  # (table, max_bits) from last compressed literals
        self.seq_tables = [None, None, None]  # LL / OF / ML
        self.reps = [1, 4, 8]


def _decode_literals(block, pos: int, fstate: _FrameState):
    """Literals section (RFC 8878 §3.1.1.3.1).  Returns
    (literals: bytearray, new_pos)."""
    if pos >= len(block):
        raise ValueError("zstd: missing literals section header")
    b0 = block[pos]
    ltype = b0 & 3
    size_fmt = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if size_fmt in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif size_fmt == 1:
            if pos + 2 > len(block):
                raise ValueError("zstd: truncated literals header")
            regen = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            if pos + 3 > len(block):
                raise ValueError("zstd: truncated literals header")
            regen = (b0 >> 4) | (block[pos + 1] << 4) | (block[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            if pos + regen > len(block):
                raise ValueError("zstd: truncated raw literals")
            lits = bytearray(block[pos : pos + regen])
            return lits, pos + regen
        if pos >= len(block):
            raise ValueError("zstd: truncated RLE literal byte")
        return bytearray([block[pos]]) * regen, pos + 1
    # compressed (2) / treeless (3)
    if size_fmt == 0:
        streams, hlen = 1, 3
    elif size_fmt == 1:
        streams, hlen = 4, 3
    elif size_fmt == 2:
        streams, hlen = 4, 4
    else:
        streams, hlen = 4, 5
    if pos + hlen > len(block):
        raise ValueError("zstd: truncated literals header")
    h = int.from_bytes(block[pos : pos + hlen], "little")
    nbits = {3: 10, 4: 14, 5: 18}[hlen]
    regen = (h >> 4) & ((1 << nbits) - 1)
    comp = (h >> (4 + nbits)) & ((1 << nbits) - 1)
    pos += hlen
    if pos + comp > len(block):
        raise ValueError("zstd: truncated compressed literals")
    region = block[pos : pos + comp]
    pos += comp
    rpos = 0
    if ltype == 2:
        table, max_bits, used = _huf_read_table(region)
        fstate.huf = (table, max_bits)
        rpos = used
    else:
        if fstate.huf is None:
            raise ValueError(
                "zstd: treeless literals with no previous Huffman table"
            )
        table, max_bits = fstate.huf
    if streams == 1:
        return _huf_decode_stream(region[rpos:], table, max_bits, regen), pos
    if rpos + 6 > len(region):
        raise ValueError("zstd: truncated 4-stream jump table")
    s1 = int.from_bytes(region[rpos : rpos + 2], "little")
    s2 = int.from_bytes(region[rpos + 2 : rpos + 4], "little")
    s3 = int.from_bytes(region[rpos + 4 : rpos + 6], "little")
    rpos += 6
    tail = len(region) - rpos
    if s1 + s2 + s3 > tail:
        raise ValueError("zstd: 4-stream jump table exceeds literals region")
    per = (regen + 3) // 4
    last = regen - 3 * per
    if last < 0:
        raise ValueError("zstd: 4-stream regenerated size underflow")
    lits = bytearray()
    bounds = (
        (rpos, s1, per),
        (rpos + s1, s2, per),
        (rpos + s1 + s2, s3, per),
        (rpos + s1 + s2 + s3, tail - s1 - s2 - s3, last),
    )
    for start, ln, n_out in bounds:
        lits += _huf_decode_stream(
            region[start : start + ln], table, max_bits, n_out
        )
    return lits, pos


def _decode_sequences_header(block, pos: int):
    """Number_of_Sequences varint (RFC 8878 §3.1.1.3.2.1)."""
    if pos >= len(block):
        raise ValueError("zstd: missing sequences header")
    b0 = block[pos]
    if b0 == 0:
        return 0, pos + 1
    if b0 < 128:
        return b0, pos + 1
    if b0 < 255:
        if pos + 2 > len(block):
            raise ValueError("zstd: truncated sequences count")
        return ((b0 - 128) << 8) | block[pos + 1], pos + 2
    if pos + 3 > len(block):
        raise ValueError("zstd: truncated sequences count")
    return int.from_bytes(block[pos + 1 : pos + 3], "little") + 0x7F00, pos + 3


def _decode_block(block, fstate: _FrameState, out: bytearray,
                  window_size: int) -> None:
    """Decode one compressed block's content into ``out`` (which holds
    the frame decoded so far — matches may reach into it)."""
    base = len(out)
    lits, pos = _decode_literals(block, 0, fstate)
    n_seq, pos = _decode_sequences_header(block, pos)
    if n_seq == 0:
        if pos != len(block):
            raise ValueError("zstd: trailing bytes after empty sequences")
        out += lits
        if len(out) - base > _BLOCK_MAX:
            raise ValueError("zstd: block regenerates more than 128 KiB")
        return
    if pos >= len(block):
        raise ValueError("zstd: missing symbol compression modes")
    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence mode bits set")
    tables = []
    for kind_idx, shift in ((0, 6), (1, 4), (2, 2)):
        mode = (modes >> shift) & 3
        dtable, al, pos = _seq_table(
            mode, kind_idx, block, pos, fstate.seq_tables[kind_idx]
        )
        fstate.seq_tables[kind_idx] = (dtable, al)
        tables.append((dtable, al))
    (ll_tab, ll_al), (of_tab, of_al), (ml_tab, ml_al) = tables
    # hot loop: the backward bitstream is managed with local integers
    # (sliding window over the byte tail, one fused read for the three
    # value fields and one for the three state updates), fully inlined
    # — no function calls per sequence (~5x over the _BackBits object)
    sdata = block[pos:]
    if len(sdata) == 0 or sdata[-1] == 0:
        raise ValueError("zstd: bitstream missing sentinel bit")
    spos = len(sdata) * 8 - (8 - sdata[-1].bit_length()) - 1
    sb0 = len(sdata)
    floor = sb0 * 8
    swin = 0
    from_bytes = int.from_bytes
    ml_extra = _ML_EXTRA
    ll_extra = _LL_EXTRA
    rep0, rep1, rep2 = fstate.reps
    lits_b = bytes(lits)
    nlits = len(lits_b)
    lit_pos = 0

    # initial FSE states: LL, OF, ML read order (fused: LL topmost)
    n = ll_al + of_al + ml_al
    low = spos - n
    if low < 0:
        raise ValueError("zstd: sequence bitstream shorter than FSE states")
    if low < floor:
        need = low >> 3
        swin = (swin << (8 * (sb0 - need))) | from_bytes(
            sdata[need:sb0], "little"
        )
        sb0 = need
        floor = need * 8
    v = (swin >> (low - floor)) & ((1 << n) - 1)
    spos = low
    swin &= (1 << (low - floor)) - 1
    ml_state = v & ((1 << ml_al) - 1)
    of_state = (v >> ml_al) & ((1 << of_al) - 1)
    ll_state = v >> (ml_al + of_al)

    for i in range(n_seq):
        of_code = of_tab[of_state][0]
        if of_code > 31:
            raise ValueError(f"zstd: offset code {of_code} out of range")
        ml_base, ml_bits = ml_extra[ml_tab[ml_state][0]]
        ll_base, ll_bits = ll_extra[ll_tab[ll_state][0]]
        # one fused read: offset bits, then match-length bits, then
        # literals-length bits (RFC 8878 §3.1.1.3.2.1.1 read order)
        n = of_code + ml_bits + ll_bits
        if n:
            low = spos - n
            if low < 0:
                raise ValueError("zstd: sequence bitstream overrun")
            if low < floor:
                need = low >> 3
                swin = (swin << (8 * (sb0 - need))) | from_bytes(
                    sdata[need:sb0], "little"
                )
                sb0 = need
                floor = need * 8
            sh = low - floor
            v = (swin >> sh) & ((1 << n) - 1)
            spos = low
            swin &= (1 << sh) - 1
        else:
            v = 0
        ll = ll_base + (v & ((1 << ll_bits) - 1))
        ml = ml_base + ((v >> ll_bits) & ((1 << ml_bits) - 1))
        of_value = (1 << of_code) + (v >> (ml_bits + ll_bits))
        # offset conversion with repeat history (RFC 8878 §3.1.1.3.2.3)
        if of_value > 3:
            offset = of_value - 3
            rep2 = rep1
            rep1 = rep0
            rep0 = offset
        else:
            idx = of_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep0
            else:
                if idx == 1:
                    offset = rep1
                elif idx == 2:
                    offset = rep2
                    rep2 = rep1
                else:
                    offset = rep0 - 1
                    rep2 = rep1
                if offset == 0:
                    raise ValueError("zstd: corrupt repeat offset of 0")
                rep1 = rep0
                rep0 = offset
        # execute: literals then match copy
        if ll:
            np = lit_pos + ll
            if np > nlits:
                raise ValueError(
                    "zstd: sequence consumes more literals than exist"
                )
            out += lits_b[lit_pos:np]
            lit_pos = np
        have = len(out)
        if offset > have or offset > window_size:
            raise ValueError(
                f"zstd: match offset {offset} outside {have} decoded bytes"
                f" (window {window_size})"
            )
        start = have - offset
        if offset >= ml:
            out += out[start : start + ml]
        else:
            pat = bytes(out[start:])
            out += (pat * (ml // offset + 1))[:ml]
        if len(out) - base > _BLOCK_MAX:
            # guard INSIDE the loop: a crafted sequence list must not
            # balloon memory before the post-loop size check fires
            raise ValueError("zstd: block regenerates more than 128 KiB")
        if i != n_seq - 1:
            # state updates in LL, ML, OF order — one fused read
            ll_nb, ll_sbase = ll_tab[ll_state][1:]
            ml_nb, ml_sbase = ml_tab[ml_state][1:]
            of_nb, of_sbase = of_tab[of_state][1:]
            n = ll_nb + ml_nb + of_nb
            if n:
                low = spos - n
                if low < 0:
                    raise ValueError(
                        "zstd: sequence bitstream overrun in states"
                    )
                if low < floor:
                    need = low >> 3
                    swin = (swin << (8 * (sb0 - need))) | from_bytes(
                        sdata[need:sb0], "little"
                    )
                    sb0 = need
                    floor = need * 8
                sh = low - floor
                v = (swin >> sh) & ((1 << n) - 1)
                spos = low
                swin &= (1 << sh) - 1
            else:
                v = 0
            of_state = of_sbase + (v & ((1 << of_nb) - 1))
            ml_state = ml_sbase + ((v >> of_nb) & ((1 << ml_nb) - 1))
            ll_state = ll_sbase + (v >> (of_nb + ml_nb))
    if spos != 0:
        raise ValueError(
            f"zstd: sequence bitstream not exactly consumed"
            f" ({spos} bits left)"
        )
    fstate.reps = [rep0, rep1, rep2]
    out += lits[lit_pos:]
    if len(out) - base > _BLOCK_MAX:
        raise ValueError("zstd: block regenerates more than 128 KiB")


# ---------------------------------------------------------- frames

def decompress(data: bytes) -> bytes:
    """Decode one or more concatenated Zstandard frames (skippable
    frames are skipped).  Raises ``ValueError`` on any malformed
    input."""
    mv = memoryview(bytes(data))
    n = len(mv)
    if n == 0:
        raise ValueError("zstd: empty input")
    out_all = bytearray()
    pos = 0
    saw_frame = False
    while pos < n:
        if len(out_all) > _OUTPUT_LIMIT:
            raise ValueError(
                "zstd: decoded output exceeds the decoder limit"
                f" {_OUTPUT_LIMIT} bytes"
            )
        if pos + 4 > n:
            raise ValueError("zstd: truncated frame magic")
        magic = int.from_bytes(mv[pos : pos + 4], "little")
        pos += 4
        if _SKIP_MAGIC_LO <= magic <= _SKIP_MAGIC_HI:
            if pos + 4 > n:
                raise ValueError("zstd: truncated skippable frame size")
            sk = int.from_bytes(mv[pos : pos + 4], "little")
            pos += 4
            if pos + sk > n:
                raise ValueError("zstd: truncated skippable frame")
            pos += sk
            continue
        if magic != _MAGIC:
            raise ValueError(f"zstd: bad frame magic 0x{magic:08x}")
        saw_frame = True
        pos = _decode_frame(mv, pos, out_all,
                            _OUTPUT_LIMIT - len(out_all))
    if not saw_frame:
        raise ValueError("zstd: input contains only skippable frames")
    return bytes(out_all)


def _decode_frame(mv, pos: int, out_all: bytearray,
                  budget: int) -> int:
    n = len(mv)
    if pos >= n:
        raise ValueError("zstd: missing frame header descriptor")
    fhd = mv[pos]
    pos += 1
    if fhd & 0x08:
        raise ValueError("zstd: reserved frame header bit set")
    fcs_flag = fhd >> 6
    single = (fhd >> 5) & 1
    has_checksum = (fhd >> 2) & 1
    did_flag = fhd & 3
    window_size = None
    if not single:
        if pos >= n:
            raise ValueError("zstd: missing window descriptor")
        wd = mv[pos]
        pos += 1
        wlog = 10 + (wd >> 3)
        wbase = 1 << wlog
        window_size = wbase + (wbase >> 3) * (wd & 7)
    did_len = (0, 1, 2, 4)[did_flag]
    if did_len:
        if pos + did_len > n:
            raise ValueError("zstd: truncated dictionary id")
        did = int.from_bytes(mv[pos : pos + did_len], "little")
        pos += did_len
        if did != 0:
            raise ValueError(
                f"zstd: dictionary {did} required but dictionaries are"
                " not supported"
            )
    fcs = None
    fcs_len = (1 if single else 0, 2, 4, 8)[fcs_flag]
    if fcs_len:
        if pos + fcs_len > n:
            raise ValueError("zstd: truncated frame content size")
        fcs = int.from_bytes(mv[pos : pos + fcs_len], "little")
        if fcs_len == 2:
            fcs += 256
        pos += fcs_len
    if single:
        if fcs is None:
            raise ValueError(
                "zstd: single-segment frame without content size"
            )
        window_size = fcs
    if window_size > _WINDOW_LIMIT and not (single and fcs <= _WINDOW_LIMIT):
        raise ValueError(
            f"zstd: window size {window_size} exceeds the decoder limit"
            f" {_WINDOW_LIMIT}"
        )
    block_max = min(window_size, _BLOCK_MAX) if window_size else _BLOCK_MAX
    fstate = _FrameState()
    out = bytearray()
    while True:
        if pos + 3 > n:
            raise ValueError("zstd: truncated block header")
        bh = int.from_bytes(mv[pos : pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            if bsize > block_max:
                raise ValueError("zstd: raw block exceeds block maximum")
            if pos + bsize > n:
                raise ValueError("zstd: truncated raw block")
            out += mv[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            if bsize > block_max:
                raise ValueError("zstd: RLE block exceeds block maximum")
            if pos >= n:
                raise ValueError("zstd: truncated RLE block byte")
            out += bytes([mv[pos]]) * bsize
            pos += 1
        elif btype == 2:  # compressed
            if bsize > block_max:
                raise ValueError("zstd: compressed block exceeds maximum")
            if pos + bsize > n:
                raise ValueError("zstd: truncated compressed block")
            _decode_block(mv[pos : pos + bsize], fstate, out, window_size)
            pos += bsize
        else:
            raise ValueError("zstd: reserved block type")
        if fcs is not None and len(out) > fcs:
            raise ValueError(
                f"zstd: decoded output exceeds the declared frame"
                f" content size {fcs}"
            )
        if len(out) > budget:
            # total-output backstop: a no-FCS frame of repeated RLE
            # blocks expands ~32000x per input byte — without this, a
            # crafted 1 MiB payload OOMs the reader before any
            # per-block check can fire (round-13 review)
            raise ValueError(
                "zstd: decoded output exceeds the decoder limit"
                f" {_OUTPUT_LIMIT} bytes"
            )
        if last:
            break
    if fcs is not None and len(out) != fcs:
        raise ValueError(
            f"zstd: decoded {len(out)} bytes, frame header declared {fcs}"
        )
    if has_checksum:
        if pos + 4 > n:
            raise ValueError("zstd: truncated content checksum")
        want = int.from_bytes(mv[pos : pos + 4], "little")
        pos += 4
        got = xxh64(out) & 0xFFFFFFFF
        if got != want:
            raise ValueError(
                "zstd: content checksum mismatch: decoded data does not"
                " match the frame's XXH64"
            )
    out_all += out
    return pos


# --------------------------------------------------------- encoder

def _fse_build_ctable(probs, al: int):
    """FSE encode table against a normalized distribution — the
    mirror of ``_fse_build_dtable`` (zstd FSE_buildCTable semantics):
    returns (state_table, symbol_tt) where symbol_tt[s] =
    (delta_nb_bits, delta_find_state)."""
    size = 1 << al
    # spread identically to the decoder
    symbols = [0] * size
    high = size - 1
    for s, p in enumerate(probs):
        if p == -1:
            symbols[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    pos = 0
    for s, p in enumerate(probs):
        for _ in range(max(p, 0)):
            symbols[pos] = s
            pos = (pos + step) & (size - 1)
            while pos > high:
                pos = (pos + step) & (size - 1)
    # cumulative start index per symbol, then the state table
    counts = [1 if p == -1 else max(p, 0) for p in probs]
    cumul = [0] * (len(probs) + 1)
    for s, c in enumerate(counts):
        cumul[s + 1] = cumul[s] + c
    fill = list(cumul[:-1])
    table = [0] * size
    for p_ in range(size):
        s = symbols[p_]
        table[fill[s]] = size + p_
        fill[s] += 1
    symbol_tt = [None] * len(probs)
    total = 0
    for s, p in enumerate(probs):
        if p == 0:
            continue
        if p in (1, -1):
            symbol_tt[s] = ((al << 16) - size, total - 1)
            total += 1
        else:
            max_bits_out = al - ((p - 1).bit_length() - 1)
            symbol_tt[s] = (
                (max_bits_out << 16) - (p << max_bits_out),
                total - p,
            )
            total += p
    return table, symbol_tt


_DEFAULT_CTABLES = None


def _default_ctables():
    global _DEFAULT_CTABLES
    if _DEFAULT_CTABLES is None:
        _DEFAULT_CTABLES = (
            _fse_build_ctable(*_LL_DEFAULT),
            _fse_build_ctable(*_OF_DEFAULT),
            _fse_build_ctable(*_ML_DEFAULT),
        )
    return _DEFAULT_CTABLES


def _ll_code(ll: int) -> int:
    if ll < 16:
        return ll
    for code in range(35, 15, -1):
        if ll >= _LL_EXTRA[code][0]:
            return code
    raise AssertionError("unreachable: code 16 baseline is 16")


def _ml_code(ml: int) -> int:
    if ml < 35:
        return ml - 3
    for code in range(52, 31, -1):
        if ml >= _ML_EXTRA[code][0]:
            return code
    raise AssertionError("unreachable: code 32 baseline is 35")


def _find_sequences(data, base: int, end: int):
    """Greedy hash matcher over one block (the snappy encoder's
    shape, emitting zstd sequences): returns (sequences, literal-runs)
    where each sequence is (lit_len, match_len, offset) and runs index
    into ``data``.

    Min-match is 8: on natural text the marginal 4-7 byte matches
    cost more sequence-stream bytes than they save AND triple the
    sequence count (slower encode and decode) — measured 41.7% ratio
    at min-match 4 vs 32.5% at 8 on the documents corpus. Matches
    extend backward into pending literals, like the reference
    matcher."""
    seqs: list[tuple[int, int, int]] = []
    runs: list[tuple[int, int]] = []
    table: dict[bytes, int] = {}
    i = lit = base
    limit = end - 7  # i < limit keeps every 8-byte key in bounds
    while i < limit:
        key = data[i : i + 8]
        cand = table.get(key)
        table[key] = i
        if cand is None:
            i += 1
            continue
        m = i + 8
        c = cand + 8
        while m < end and data[m] == data[c]:
            m += 1
            c += 1
        # extend backward into the pending literal run
        while i > lit and cand > base and data[i - 1] == data[cand - 1]:
            i -= 1
            cand -= 1
        seqs.append((i - lit, m - i, i - cand))
        runs.append((lit, i))
        if m - 1 < limit:
            table[data[m - 1 : m + 7]] = m - 1
        i = lit = m
    runs.append((lit, end))  # trailing literals (no sequence)
    return seqs, runs



def _package_merge(hist_items, max_len: int):
    """Optimal length-limited prefix-code lengths via boundary
    package-merge: ``hist_items`` is [(freq, symbol), ...] with at
    least two entries; returns {symbol: nb_bits} satisfying Kraft
    EQUALITY at ``max_len`` (the decoder's implied-last-weight rule
    requires the lengths to complete a power of two exactly)."""
    items = sorted(hist_items, key=lambda t: t[0])
    pool = list(items)
    for _ in range(max_len - 1):
        packages = [
            (pool[i][0] + pool[i + 1][0], (pool[i], pool[i + 1]))
            for i in range(0, len(pool) - 1, 2)
        ]
        pool = sorted(items + packages, key=lambda t: t[0])
    lengths = {s: 0 for _, s in items}

    def touch(item) -> None:
        x = item[1]
        if type(x) is tuple:
            touch(x[0])
            touch(x[1])
        else:
            lengths[x] += 1

    for it in pool[: 2 * len(items) - 2]:
        touch(it)
    return lengths



def _fse_normalize(hist, al: int):
    """Normalize symbol counts to probabilities summing to ``1 <<
    al`` (largest share absorbs the rounding difference).  Returns a
    dense prob list over 0..max_symbol or None when the adjustment
    would starve a symbol."""
    size = 1 << al
    total = sum(c for _, c in hist)
    probs = {s: max(1, c * size // total) for s, c in hist}
    big = max(hist, key=lambda t: t[1])[0]
    probs[big] += size - sum(probs.values())
    if probs[big] < 1:
        return None
    return [probs.get(s, 0) for s in range(max(probs) + 1)]


def _fse_write_distribution(probs, al: int) -> bytes:
    """FSE table description (RFC 8878 §4.1.1) — the exact mirror of
    ``_fse_read_distribution``: 4-bit accuracy-log nibble, threshold-
    coded probabilities (+1 wire offset, short form when the value
    fits), 2-bit repeat fields after a zero."""
    acc = 0
    nbits_acc = 0
    out = bytearray()

    def put(v: int, n: int) -> None:
        nonlocal acc, nbits_acc
        acc |= v << nbits_acc
        nbits_acc += n
        while nbits_acc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits_acc -= 8

    put(al - 5, 4)
    remaining = (1 << al) + 1
    i = 0
    while remaining > 1 and i < len(probs):
        p = probs[i]
        i += 1
        value = p + 1  # wire offset: -1 encodes as 0, 0 as 1, ...
        nb = remaining.bit_length()
        threshold = 1 << (nb - 1)
        max_small = 2 * threshold - 1 - remaining
        enc = value + max_small if value >= threshold else value
        put(enc, nb if value >= max_small else nb - 1)
        remaining -= p if p > 0 else -p if p < 0 else 0
        if p == 0:
            # repeat-zero runs: 2-bit fields, 3 = continue
            run = 0
            while i < len(probs) and probs[i] == 0 and remaining > 1:
                run += 1
                i += 1
            while run >= 3:
                put(3, 2)
                run -= 3
            put(run, 2)
    if nbits_acc:
        out.append(acc & 0xFF)
    return bytes(out)


def _fse_compress_weights(weights) -> bytes | None:
    """FSE-compressed Huffman weight description payload (RFC 8878
    §4.2.1.2): a custom distribution over the weight alphabet plus the
    two-interleaved-state backward stream, mirroring the decoder in
    ``_fse_decode_interleaved``.  Returns description+stream bytes or
    None when the alphabet degenerates (a single distinct weight gives
    zero-bit state transitions, which the stream-exhaustion
    termination rule cannot encode)."""
    n = len(weights)
    if n < 2:
        return None
    hist_map: dict[int, int] = {}
    for w in weights:
        hist_map[w] = hist_map.get(w, 0) + 1
    if len(hist_map) < 2:
        return None
    al = 6  # HUF weight tables cap at accuracy log 6
    probs = _fse_normalize(sorted(hist_map.items()), al)
    if probs is None or max(probs) == 1 << al:
        return None
    desc = _fse_write_distribution(probs, al)
    table, symbol_tt = _fse_build_ctable(probs, al)
    acc = 0
    nbits = 0
    stream = bytearray()

    def put(v: int, nb: int) -> None:
        nonlocal acc, nbits
        acc |= v << nbits
        nbits += nb

    def init_state(code: int) -> int:
        d_nb, d_fs = symbol_tt[code]
        nb_out = (d_nb + (1 << 15)) >> 16
        v = (nb_out << 16) - d_nb
        return table[(v >> nb_out) + d_fs]

    def enc(state: int, code: int) -> int:
        d_nb, d_fs = symbol_tt[code]
        nb = (state + d_nb) >> 16
        put(state & ((1 << nb) - 1), nb)
        return table[(state >> nb) + d_fs]

    # zstd FSE_compress order: process backward; even indices decode
    # from state1, odd from state2
    ip = n
    if n & 1:
        ip -= 1
        s1 = init_state(weights[ip])
        ip -= 1
        s2 = init_state(weights[ip])
        ip -= 1
        s1 = enc(s1, weights[ip])
    else:
        ip -= 1
        s2 = init_state(weights[ip])
        ip -= 1
        s1 = init_state(weights[ip])
    while ip > 0:
        ip -= 1
        s2 = enc(s2, weights[ip])
        ip -= 1
        s1 = enc(s1, weights[ip])
    put(s2 & ((1 << al) - 1), al)
    put(s1 & ((1 << al) - 1), al)
    put(1, 1)  # sentinel
    stream += acc.to_bytes((nbits + 7) >> 3, "little")
    payload = desc + bytes(stream)
    if len(payload) >= 128 or len(payload) >= n // 2 + (n & 1):
        return None  # direct 4-bit form would be no larger
    return payload


def _huf_encode_literals(lit_bytes) -> bytes | None:
    """Compressed_Literals_Block section (type 2): length-limited
    canonical Huffman over the block's literals, direct 4-bit weight
    description, 1 stream for small payloads / 4 jump-tabled streams
    otherwise.  Returns the complete literals section or None when
    Huffman cannot be described (highest byte > 128 — the direct
    description lists weights up to the implied-last symbol, capped
    at 128 entries) or does not pay."""
    n = len(lit_bytes)
    if n < 64:
        return None
    hist = [0] * 256
    for s in set(lit_bytes):
        hist[s] = lit_bytes.count(s)
    present = [s for s in range(256) if hist[s]]
    max_sym = present[-1]
    if len(present) < 2:
        return None
    lengths = _package_merge([(hist[s], s) for s in present], 11)
    max_bits = max(lengths.values())
    weights = [0] * (max_sym + 1)
    for s, nb in lengths.items():
        weights[s] = max_bits + 1 - nb
    # worth it? estimated stream + table must beat raw literals
    comp_bits = sum(hist[s] * nb for s, nb in lengths.items())
    if comp_bits // 8 + 1 + (max_sym + 1) // 2 + 16 >= n:
        return None
    # canonical codes: same rank layout the decode table uses
    # (longest codes from cell 0, symbols ascending within a weight)
    rank_cells = [0] * (max_bits + 2)
    for s in present:
        rank_cells[weights[s]] += 1 << (weights[s] - 1)
    acc = 0
    starts = [0] * (max_bits + 2)
    for w in range(1, max_bits + 2):
        starts[w] = acc
        acc += rank_cells[w]
    codes = [None] * 256
    for s in present:
        w = weights[s]
        nb = max_bits + 1 - w
        codes[s] = (starts[w] >> (max_bits - nb), nb)
        starts[w] += 1 << (w - 1)
    # tree description: FSE-compressed weights when they are smaller
    # (and the only option past 128 listed weights), else the direct
    # 4-bit form — both list symbols 0..max_sym-1, the last present
    # symbol's weight is implied
    fse_payload = _fse_compress_weights(weights[:max_sym])
    if fse_payload is not None:
        desc = bytearray([len(fse_payload)]) + fse_payload
    elif max_sym <= 128:
        desc = bytearray([127 + max_sym])
        for i in range(0, max_sym, 2):
            w2 = weights[i + 1] if i + 1 < max_sym else 0
            desc.append((weights[i] << 4) | w2)
    else:
        return None  # >128 weights and no FSE win: raw literals

    def stream(chunk) -> bytes:
        # decoder reads the FIRST literal from the stream top, so the
        # last literal's code is written first (zstd HUF encode order)
        sacc = 0
        snb = 0
        out = bytearray()
        for b in reversed(chunk):
            val, nb = codes[b]
            sacc |= val << snb
            snb += nb
            if snb >= 64:
                n8 = snb >> 3
                out += (sacc & ((1 << (n8 * 8)) - 1)).to_bytes(
                    n8, "little"
                )
                sacc >>= n8 * 8
                snb -= n8 * 8
        sacc |= 1 << snb  # sentinel
        snb += 1
        out += sacc.to_bytes((snb + 7) >> 3, "little")
        return bytes(out)

    if n <= 1023:  # Size_Format 00: one stream, 10-bit sizes
        s = stream(lit_bytes)
        comp = len(desc) + len(s)
        if comp > 1023 or comp >= n:
            return None
        h = 2 | (n << 4) | (comp << 14)
        return h.to_bytes(3, "little") + bytes(desc) + s
    per = (n + 3) // 4
    s1 = stream(lit_bytes[:per])
    s2 = stream(lit_bytes[per : 2 * per])
    s3 = stream(lit_bytes[2 * per : 3 * per])
    s4 = stream(lit_bytes[3 * per :])
    if max(len(s1), len(s2), len(s3)) > 0xFFFF:
        return None
    comp = len(desc) + 6 + len(s1) + len(s2) + len(s3) + len(s4)
    if comp >= n:
        return None
    jump = (
        len(s1).to_bytes(2, "little")
        + len(s2).to_bytes(2, "little")
        + len(s3).to_bytes(2, "little")
    )
    if n <= 16383 and comp <= 16383:  # Size_Format 10: 14-bit sizes
        h = 2 | (2 << 2) | (n << 4) | (comp << 18)
        hb = h.to_bytes(4, "little")
    else:  # Size_Format 11: 18-bit sizes
        h = 2 | (3 << 2) | (n << 4) | (comp << 22)
        hb = h.to_bytes(5, "little")
    return hb + bytes(desc) + jump + s1 + s2 + s3 + s4


def _encode_block(data, base: int, end: int) -> bytes | None:
    """One compressed block: literals (Huffman-coded via
    ``_huf_encode_literals`` when that pays, raw otherwise) +
    predefined-FSE-coded sequences (RFC 8878 §3.1.1.3, all three
    sequence modes Predefined); a matchless block with compressible
    literals becomes a literals-only block (Number_of_Sequences = 0).
    Returns None when no form beats a raw block."""
    seqs, runs = _find_sequences(data, base, end)
    n_seq = len(seqs)
    if n_seq > 0x7EFF:
        return None
    lit_bytes = bytearray()
    for s, e in runs:
        lit_bytes += data[s:e]
    n_lit = len(lit_bytes)
    # literals section: Huffman-compressed when it pays, else raw
    huf = _huf_encode_literals(lit_bytes)
    if huf is not None:
        lits = bytearray(huf)
    else:
        if n_seq == 0:
            return None  # no matches, no literal entropy win: raw block
        lits = bytearray()
        if n_lit < 32:
            lits.append(n_lit << 3)
        elif n_lit < 4096:
            lits.append(((n_lit & 0x0F) << 4) | 0x04)
            lits.append(n_lit >> 4)
        else:
            lits.append(((n_lit & 0x0F) << 4) | 0x0C)
            lits.append((n_lit >> 4) & 0xFF)
            lits.append(n_lit >> 12)
        lits += lit_bytes
    if n_seq == 0:
        # literals-only compressed block: Number_of_Sequences = 0
        block = bytes(lits) + b"\x00"
        if len(block) >= end - base:
            return None
        return block
    # sequences section header
    head = bytearray()
    if n_seq < 128:
        head.append(n_seq)
    else:
        head.append((n_seq >> 8) + 128)
        head.append(n_seq & 0xFF)
    head.append(0)  # modes: LL/OF/ML all Predefined
    (ll_tab, ll_tt), (of_tab, of_tt), (ml_tab, ml_tt) = _default_ctables()
    ll_extra = _LL_EXTRA
    ml_extra = _ML_EXTRA
    # precompute codes per sequence (encoded in reverse below)
    codes = []
    cap = codes.append
    for ll, ml, offset in seqs:
        ofv = offset + 3  # never use repeat-offset shortcuts
        of_code = ofv.bit_length() - 1
        cap((
            _ll_code(ll), of_code, _ml_code(ml),
            ll, ml, ofv - (1 << of_code),
        ))
    # backward bitstream, zstd compressSequences order: the hot loop
    # runs on local integers (accumulator flushed little-endian), the
    # FSE state math inlined — no per-sequence function calls
    acc = 0
    nbits = 0
    stream = bytearray()

    def init_state(tt, code, table):
        d_nb, d_fs = tt[code]
        nb_out = (d_nb + (1 << 15)) >> 16
        v = (nb_out << 16) - d_nb
        return table[(v >> nb_out) + d_fs]

    lc, oc, mc, ll, ml, of_x = codes[-1]
    ml_state = init_state(ml_tt, mc, ml_tab)
    of_state = init_state(of_tt, oc, of_tab)
    ll_state = init_state(ll_tt, lc, ll_tab)
    lb, lnb = ll_extra[lc]
    mb, mnb = ml_extra[mc]
    acc = ll - lb
    nbits = lnb
    acc |= (ml - mb) << nbits
    nbits += mnb
    acc |= of_x << nbits
    nbits += oc
    for k in range(n_seq - 2, -1, -1):
        lc, oc, mc, ll, ml, of_x = codes[k]
        # FSE state transitions: OF, ML, LL symbol order
        d_nb, d_fs = of_tt[oc]
        nb = (of_state + d_nb) >> 16
        acc |= (of_state & ((1 << nb) - 1)) << nbits
        nbits += nb
        of_state = of_tab[(of_state >> nb) + d_fs]
        d_nb, d_fs = ml_tt[mc]
        nb = (ml_state + d_nb) >> 16
        acc |= (ml_state & ((1 << nb) - 1)) << nbits
        nbits += nb
        ml_state = ml_tab[(ml_state >> nb) + d_fs]
        d_nb, d_fs = ll_tt[lc]
        nb = (ll_state + d_nb) >> 16
        acc |= (ll_state & ((1 << nb) - 1)) << nbits
        nbits += nb
        ll_state = ll_tab[(ll_state >> nb) + d_fs]
        # value bits: LL, ML, OF write order (decoder reads OF first)
        lb, lnb = ll_extra[lc]
        mb, mnb = ml_extra[mc]
        acc |= (ll - lb) << nbits
        nbits += lnb
        acc |= (ml - mb) << nbits
        nbits += mnb
        acc |= of_x << nbits
        nbits += oc
        if nbits >= 64:
            n8 = nbits >> 3
            stream += (acc & ((1 << (n8 * 8)) - 1)).to_bytes(n8, "little")
            acc >>= n8 * 8
            nbits -= n8 * 8
    al_ll, al_of, al_ml = _LL_DEFAULT[1], _OF_DEFAULT[1], _ML_DEFAULT[1]
    acc |= (ml_state & ((1 << al_ml) - 1)) << nbits
    nbits += al_ml
    acc |= (of_state & ((1 << al_of) - 1)) << nbits
    nbits += al_of
    acc |= (ll_state & ((1 << al_ll) - 1)) << nbits
    nbits += al_ll
    acc |= 1 << nbits  # sentinel
    nbits += 1
    stream += acc.to_bytes((nbits + 7) >> 3, "little")
    block = bytes(lits) + bytes(head) + bytes(stream)
    if len(block) >= end - base:
        return None  # raw block is no larger — emit that instead
    return block


def compress(data: bytes) -> bytes:
    """Zstandard frame with both entropy stages: per 128 KiB block, a
    greedy 8-byte-hash matcher emits sequences coded with the three
    PREDEFINED FSE distributions, over literals that are Huffman-
    coded when that pays (package-merge lengths; direct or
    FSE-compressed weight description) and raw otherwise; blocks
    with no matches but skewed literals become literals-only
    compressed blocks; single-byte runs become RLE blocks; anything
    the entropy stages cannot shrink falls back to raw. Frame
    content size and the XXH64 content checksum are always present.
    Every conforming decoder (zstd-jni, the C library, this module)
    reads the output back byte-exactly; corpus text lands at ~31%
    of input."""
    data = bytes(data)
    n = len(data)
    out = bytearray()
    out += _MAGIC.to_bytes(4, "little")
    if n < 256:
        # single-segment, 1-byte FCS, checksum
        out.append((0 << 6) | (1 << 5) | (1 << 2))
        out.append(n)
    else:
        if n < 65536 + 256:
            fcs_flag, fcs_len, stored = 1, 2, n - 256
        elif n < 1 << 32:
            fcs_flag, fcs_len, stored = 2, 4, n
        else:
            fcs_flag, fcs_len, stored = 3, 8, n
        out.append((fcs_flag << 6) | (1 << 2))
        out.append(0x38)  # window descriptor: 2^(10+7) = 128 KiB
        out += stored.to_bytes(fcs_len, "little")
    pos = 0
    if n == 0:
        out += (1).to_bytes(3, "little")  # last, raw, size 0
    while pos < n:
        end = min(pos + _BLOCK_MAX, n)
        last = 1 if end == n else 0
        b = data[pos]
        if end - pos >= 32 and data.count(b, pos, end) == end - pos:
            # whole chunk is one byte: RLE block
            out += (((end - pos) << 3) | (1 << 1) | last).to_bytes(3, "little")
            out.append(b)
        else:
            blk = _encode_block(data, pos, end)
            if blk is not None:
                out += ((len(blk) << 3) | (2 << 1) | last).to_bytes(
                    3, "little"
                )
                out += blk
            else:
                out += (((end - pos) << 3) | last).to_bytes(3, "little")
                out += data[pos:end]
        pos = end
    out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)
