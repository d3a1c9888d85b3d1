"""From-scratch Snappy raw-format codec: golden decodes, round-trip
property (hypothesis), malformed-input rejection, the Avro block
framing (CRC32 trailer), and JVM duplex parity via snappy-java on
Spark's classpath."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from text_grabr_orc_spark.sources.avro_io import (
    read_container,
    write_container,
)
from text_grabr_orc_spark.sources.snappy import compress, decompress


def test_snappy_golden_decodes():
    """Hand-assembled elements pin the tag-byte wire format, one per
    element kind (spec format_description.txt)."""
    # literal(4)="abcd" + copy len 8 via 2-byte offset 4
    assert (
        decompress(b"\x0c\x0c" + b"abcd" + b"\x1e\x04\x00")
        == b"abcdabcdabcd"
    )
    # same via the 1-byte-offset form: tag ((8-4)<<2)|1, offset 4
    assert (
        decompress(b"\x0c\x0c" + b"abcd" + b"\x11\x04")
        == b"abcdabcdabcd"
    )
    # OVERLAPPING copy: literal "ab" then len 10 at offset 2 -> the
    # 2-byte pattern repeats (LZ77 run semantics)
    assert decompress(b"\x0c\x04ab\x19\x02") == b"ab" * 6
    # 4-byte-offset copy form decodes too (our encoder never emits it
    # — fragments cap offsets at 64 KiB — but foreign encoders may)
    assert (
        decompress(b"\x0c\x0c" + b"abcd" + b"\x1f\x04\x00\x00\x00")
        == b"abcdabcdabcd"
    )
    # empty input: preamble 0, no elements
    assert decompress(b"\x00") == b""


def test_snappy_literal_length_boundaries():
    """Literal lengths around the inline/extra-byte encoding edges
    (59/60/61) and past one and two extra bytes."""
    for n in (1, 59, 60, 61, 255, 256, 257, 65536, 65537, 70000):
        data = bytes((i * 131 + 17) % 256 for i in range(n))
        assert decompress(compress(data)) == data


def test_snappy_compresses_text():
    """Repetitive text actually shrinks (the matcher finds copies) and
    incompressible bytes stay ~1x (all-literal fallback)."""
    text = b"the quick brown fox jumps over the lazy dog. " * 400
    z = compress(text)
    assert len(z) < len(text) // 4
    assert decompress(z) == text
    import random

    rnd = bytes(random.Random(11).randbytes(100000))
    z2 = compress(rnd)
    assert len(z2) <= len(rnd) + len(rnd) // 100 + 16
    assert decompress(z2) == rnd


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4096))
def test_snappy_roundtrip_property(data):
    assert decompress(compress(data)) == data


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.sampled_from([b"abc", b"lorem ipsum ", b"\x00\x00", b"xyz"]),
        max_size=200,
    )
)
def test_snappy_roundtrip_repetitive_property(chunks):
    data = b"".join(chunks)
    assert decompress(compress(data)) == data


def test_snappy_malformed_inputs_raise():
    for bad in (
        b"",  # no preamble
        b"\x80",  # unterminated preamble varint
        b"\x04\x0cab",  # truncated literal
        b"\x04\x01\x01",  # copy offset beyond decoded output
        b"\x0a\x04abcd",  # decoded length != preamble
        b"\x02\x19\x02",  # copy with nothing decoded yet
        b"\x06\x04ab\x00",  # zero-offset copy... (tag 0 = literal
        # len 1, truncated) — still must raise, not return garbage
        b"\x80\x80\x80\x80\x80\x01",  # 6-byte preamble varint: spec
        # caps the length at 32 bits / 5 bytes — reject at parse, not
        # via the final length check (round-13 review)
        b"\xff\xff\xff\xff\x1f",  # 5 bytes but > 32 bits declared
    ):
        with pytest.raises(ValueError, match="snappy"):
            decompress(bad)


def test_avro_snappy_container_roundtrip(tmp_path):
    """Avro block framing: snappy-compressed payload + 4-byte
    big-endian CRC32 of the UNCOMPRESSED bytes (spec); a flipped data
    byte fails the CRC check loudly."""
    fields = [("id", "long", False), ("t", "string", True)]
    rows = [
        (i, None if i % 5 == 0 else f"document body {i} " * 8)
        for i in range(500)
    ]
    p = str(tmp_path / "s.avro")
    n = write_container(p, fields, iter(rows), codec="snappy",
                        block_rows=128)
    assert n == 500
    assert list(read_container(p)) == rows
    raw = bytearray(open(p, "rb").read())
    assert b"snappy" in raw[:200]
    # flip one byte INSIDE the first block's compressed payload —
    # offset computed from the parsed header end (+2 block-header
    # varints +20 into the payload), so schema growth can never quietly
    # move the flip back into header metadata (round-13 review). The
    # decoder must surface a CRC mismatch or a malformed element —
    # never wrong rows.
    import io

    from text_grabr_orc_spark.sources.avro_io import read_header

    fh = io.BytesIO(bytes(raw))
    read_header(fh)
    flip_at = fh.tell() + 2 + 20
    assert flip_at < len(raw)
    raw[flip_at] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        list(read_container(p))


def test_snappy_jvm_duplex_parity(spark, tmp_path):
    """Python-written snappy containers read by the real Avro library
    (CodecFactory.snappyCodec -> snappy-java), and JVM-written snappy
    containers read back here — full duplex, the same pin the
    bzip2/xz codecs carry."""
    from text_grabr_orc_spark.sources.avro_io import _schema_json

    fields = [("id", "long", False), ("t", "string", True)]
    rows = [(i, None if i % 7 == 0 else "lorem ipsum " * 10)
            for i in range(300)]
    jvm = spark._jvm
    p = str(tmp_path / "py_snappy.avro")
    write_container(p, fields, iter(rows), codec="snappy",
                    block_rows=64)
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    assert str(rdr.getMetaString("avro.codec")) == "snappy"
    got = []
    while rdr.hasNext():
        rec = rdr.next()
        t = rec.get("t")
        got.append((rec.get("id"), None if t is None else str(t)))
    rdr.close()
    assert got == rows
    # JVM writes snappy -> python reads
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        _schema_json("row", fields)
    )
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.snappyCodec())
    p2 = str(tmp_path / "jvm_snappy.avro")
    dfw.create(schema, jvm.java.io.File(p2))
    for i in range(50):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", jvm.java.lang.Long.valueOf(i))
        rec.put("t", None if i % 3 == 0 else f"jvm row {i} " * 6)
        dfw.append(rec)
    dfw.close()
    assert list(read_container(p2)) == [
        (i, None if i % 3 == 0 else f"jvm row {i} " * 6)
        for i in range(50)
    ]


def test_snappy_crc_is_of_uncompressed_data(tmp_path):
    """The trailer is CRC32(uncompressed), not CRC32(compressed) —
    verified against the bytes the codec table emits."""
    from text_grabr_orc_spark.sources.avro_io import (
        _compress,
        _decompress,
    )

    payload = b"avro block payload " * 50
    framed = _compress("snappy", payload)
    assert framed[-4:] == zlib.crc32(payload).to_bytes(4, "big")
    assert _decompress("snappy", framed) == payload
    # corrupt the trailer: loud CRC error
    bad = framed[:-4] + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="CRC"):
        _decompress("snappy", bad)
