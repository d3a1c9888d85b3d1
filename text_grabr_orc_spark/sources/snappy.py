"""From-scratch Snappy (raw format) codec — pure Python, stdlib only.

The environment has no ``snappy``/``cramjam`` module, so the Avro
``snappy`` block codec was out of subset through round 12 (the header
check raised descriptively). Same resolution as the PNG/JPEG/Avro
codecs themselves: implement the PUBLIC wire format from its
specification — Google's ``snappy/format_description.txt`` — and pin
duplex parity against the real implementation (snappy-java ships on
Spark's classpath for Parquet/ORC; the Avro ``CodecFactory.
snappyCodec()`` loads it).

Raw-format layout (this is the format Avro blocks carry — NOT the
framing format of ``.sz`` streams):

- preamble: uncompressed length as a little-endian base-128 varint
  (plain, not zigzag);
- elements, each starting with a tag byte whose low 2 bits select:

  ==  =======================================================
  00  LITERAL. ``tag >> 2`` is length-1 when < 60; 60..63 mean
      the length-1 follows in that many minus 59 little-endian
      bytes (1..4).
  01  COPY, 1-byte offset: length = ((tag >> 2) & 7) + 4
      (4..11), offset = ((tag >> 5) << 8) | next byte (< 2048).
  10  COPY, 2-byte little-endian offset: length = (tag >> 2)+1
      (1..64).
  11  COPY, 4-byte little-endian offset: same length encoding.
  ==  =======================================================

- copies may reach back into earlier output only (offset >= 1), and
  may OVERLAP forward (offset < length replays the last ``offset``
  bytes as a repeating pattern — LZ77 run semantics).

The compressor is the reference implementation's shape simplified:
input is processed in 64 KiB fragments (so offsets always fit the
2-byte form), a dict of 4-byte substrings finds the most recent
match, greedy emit of literal-run + copy (copies longer than 64 split
into 64-byte elements). Compression ratio on text is within ~10-20%
of the C encoder — parity of BYTES is not a goal (snappy never
promises canonical output), parity of ROUND-TRIP is, and that is what
the JVM duplex tests pin. Throughput is pure-Python (~5-20 MB/s);
Avro blocks are bounded (``block_rows``), so per-block cost stays
bounded at any file size — at 100 TB the cost rides inside the same
executor tasks that already decode the blocks.

Used by ``sources/avro_io.py`` ``_compress``/``_decompress`` with the
Avro-specific trailer (4-byte big-endian CRC32 of the UNCOMPRESSED
payload) applied by the caller per the Avro spec.
"""

from __future__ import annotations

_MAX_FRAGMENT = 65536  # reference encoder's working-window granularity


def _emit_literal(out: bytearray, data, start: int, end: int) -> None:
    n = end - start
    if n <= 0:
        return
    n1 = n - 1
    if n1 < 60:
        out.append(n1 << 2)
    elif n1 < (1 << 8):
        out.append(60 << 2)
        out.append(n1)
    elif n1 < (1 << 16):
        out.append(61 << 2)
        out += n1.to_bytes(2, "little")
    elif n1 < (1 << 24):
        out.append(62 << 2)
        out += n1.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += n1.to_bytes(4, "little")
    out += data[start:end]


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    # split long matches: 2-byte-offset elements carry at most 64
    # bytes. The 1-byte-offset form saves a byte for short nearby
    # matches; emit it when it fits, like the reference encoder.
    while length >= 68:
        out.append((63 << 2) | 2)
        out += offset.to_bytes(2, "little")
        length -= 64
    if length > 64:
        # leave a >=4-byte remainder so the final element is legal
        out.append((59 << 2) | 2)
        out += offset.to_bytes(2, "little")
        length -= 60
    if length >= 12 or offset >= 2048:
        out.append(((length - 1) << 2) | 2)
        out += offset.to_bytes(2, "little")
    else:
        out.append(((offset >> 8) << 5) | ((length - 4) << 2) | 1)
        out.append(offset & 0xFF)


def compress(data: bytes) -> bytes:
    """Snappy raw-format compression of ``data`` (greedy 4-byte-hash
    matcher over 64 KiB fragments)."""
    data = bytes(data)
    n = len(data)
    out = bytearray()
    # preamble: plain LE base-128 varint of the uncompressed length
    v = n
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    frag_start = 0
    while frag_start < n:
        frag_end = min(frag_start + _MAX_FRAGMENT, n)
        table: dict[bytes, int] = {}
        i = lit = frag_start
        limit = frag_end - 3  # last position a 4-byte key fits
        while i < limit:
            key = data[i : i + 4]
            cand = table.get(key)
            table[key] = i
            if cand is None:  # table is fresh per fragment, so any
                i += 1        # hit is already >= frag_start
                continue
            # extend the match greedily
            m = i + 4
            c = cand + 4
            while m < frag_end and data[m] == data[c]:
                m += 1
                c += 1
            _emit_literal(out, data, lit, i)
            _emit_copy(out, i - cand, m - i)
            # seed the table at the match tail so runs keep chaining
            if m - 1 < limit:
                table[data[m - 1 : m + 3]] = m - 1
            i = lit = m
        _emit_literal(out, data, lit, frag_end)
        frag_start = frag_end
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Snappy raw-format decompression; raises ``ValueError`` on any
    malformed input (bad preamble, zero/backward offsets, truncated
    elements, length mismatch) — never returns garbage silently."""
    mv = memoryview(data)
    n = len(mv)
    # preamble varint
    expected = 0
    shift = pos = 0
    while True:
        if pos >= n:
            raise ValueError("snappy: truncated preamble")
        b = mv[pos]
        pos += 1
        expected |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 28:
            # spec: uncompressed length is a 32-bit value, at most 5
            # varint bytes — reference decoders reject longer preambles
            # outright rather than relying on the final length check
            raise ValueError("snappy: preamble varint too long")
    if expected > 0xFFFFFFFF:
        raise ValueError("snappy: preamble length exceeds 32 bits")
    out = bytearray()
    while pos < n:
        tag = mv[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(mv[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal")
            out += mv[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            if pos >= n:
                raise ValueError("snappy: truncated copy")
            length = ((tag >> 2) & 7) + 4
            offset = ((tag >> 5) << 8) | mv[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy")
            length = (tag >> 2) + 1
            offset = int.from_bytes(mv[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy")
            length = (tag >> 2) + 1
            offset = int.from_bytes(mv[pos : pos + 4], "little")
            pos += 4
        have = len(out)
        if offset == 0 or offset > have:
            raise ValueError(
                f"snappy: copy offset {offset} outside {have} decoded"
                " bytes"
            )
        start = have - offset
        if offset >= length:
            out += out[start : start + length]
        else:
            # overlapping copy: the last `offset` bytes repeat as an
            # LZ77 run — bytes multiplication builds the whole run in
            # one shot (bytearray += itself would BufferError on the
            # self-export during resize)
            pat = bytes(out[start:])
            out += (pat * (length // offset + 1))[:length]
    if len(out) != expected:
        raise ValueError(
            f"snappy: decoded {len(out)} bytes, preamble declared"
            f" {expected}"
        )
    return bytes(out)
