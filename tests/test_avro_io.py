"""From-scratch Avro container codec: spec golden bytes, round-trip
property, torn-block detection, and the Spark DataSource halves."""

from __future__ import annotations

import os

from text_grabr_orc_spark.sources.avro_io import (
    _MAGIC,
    container_fields,
    read_container,
    read_long,
    write_container,
    write_long,
)


def _varint(n: int) -> bytes:
    buf = bytearray()
    write_long(buf, n)
    return bytes(buf)


def test_zigzag_varint_golden_bytes():
    # the worked examples from the Avro specification's binary
    # encoding section — pins wire compatibility, not just symmetry
    assert _varint(0) == b"\x00"
    assert _varint(-1) == b"\x01"
    assert _varint(1) == b"\x02"
    assert _varint(-2) == b"\x03"
    assert _varint(2) == b"\x04"
    assert _varint(-64) == b"\x7f"
    assert _varint(64) == b"\x80\x01"


def test_varint_roundtrip_extremes():
    for n in (0, 1, -1, 63, -64, 64, 2**31, -(2**31), 2**62, -(2**63)):
        mv = memoryview(_varint(n))
        val, pos = read_long(mv, 0)
        assert val == n and pos == len(mv)


_FIELDS = [
    ("id", "long", False),
    ("name", "string", True),
    ("score", "double", False),
    ("flag", "boolean", False),
    ("blob", "bytes", True),
]

_ROWS = [
    (1, "alpha", 1.5, True, b"\x00\xff"),
    (-7, None, -2.25, False, None),
    (2**40, "utf8 é中", 0.0, True, b""),
]


def test_container_roundtrip_multiblock(tmp_path):
    p = str(tmp_path / "t.avro")
    # block_rows=2 forces multiple blocks over 3 rows — the sync
    # marker boundary path is exercised, not just one happy block
    n = write_container(p, _FIELDS, iter(_ROWS), block_rows=2)
    assert n == 3
    with open(p, "rb") as fh:
        assert fh.read(4) == _MAGIC
    assert container_fields(p) == [tuple(f) for f in _FIELDS]
    assert list(read_container(p)) == _ROWS


def test_container_write_is_deterministic(tmp_path):
    a, b = str(tmp_path / "x.avro"), str(tmp_path / "y.avro")
    write_container(a, _FIELDS, iter(_ROWS))
    write_container(b, _FIELDS, iter(_ROWS))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        ba, bb = fa.read(), fb.read()
    # same basename -> same sync -> byte-equal; different basename
    # differs only in the sync marker bytes
    assert len(ba) == len(bb)
    write_container(a, _FIELDS, iter(_ROWS))
    with open(a, "rb") as fa:
        assert fa.read() == ba


def test_deflate_codec_roundtrip_and_compresses(tmp_path):
    rows = [(i, "lorem ipsum " * 20, 1.0, True, b"\x01" * 64)
            for i in range(200)]
    pn = str(tmp_path / "n.avro")
    pd_ = str(tmp_path / "d.avro")
    write_container(pn, _FIELDS, iter(rows), block_rows=64)
    n = write_container(pd_, _FIELDS, iter(rows), block_rows=64,
                        codec="deflate")
    assert n == 200
    assert list(read_container(pd_)) == rows
    # repetitive payload: deflate must be materially smaller
    assert os.path.getsize(pd_) < os.path.getsize(pn) / 4
    assert container_fields(pd_) == [tuple(f) for f in _FIELDS]


def test_torn_block_detected(tmp_path):
    p = str(tmp_path / "t.avro")
    write_container(p, _FIELDS, iter(_ROWS), block_rows=2)
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # corrupt the final sync marker
    open(p, "wb").write(bytes(raw))
    try:
        list(read_container(p))
        raise AssertionError("corrupt sync not detected")
    except ValueError as e:
        assert "sync" in str(e)


def test_container_roundtrip_property():
    """Property test: any row set in the supported type lattice
    round-trips bit-exactly (longs at the int64 extremes, any unicode
    text, ±inf doubles, empty bytes, NULL union branches)."""
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    fields = [
        ("a", "long", False),
        ("b", "string", True),
        ("c", "double", False),
        ("d", "boolean", False),
        ("e", "bytes", True),
    ]
    row_st = st.tuples(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.one_of(st.none(), st.text(max_size=40)),
        st.floats(allow_nan=False, width=64),
        st.booleans(),
        st.one_of(st.none(), st.binary(max_size=24)),
    )

    @given(st.lists(row_st, max_size=40))
    @settings(max_examples=60, deadline=None)
    def check(rows):
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "p.avro")
            n = write_container(p, fields, iter(rows), block_rows=7)
            assert n == len(rows)
            assert list(read_container(p)) == rows

    check()


def test_spark_datasource_roundtrip(spark, tmp_path):
    from text_grabr_orc_spark.sources.avro_io import register_avro_source

    register_avro_source(spark)
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"n{i}", i / 8.0) for i in range(100)],
        "id bigint, name string, val double",
    )
    out = str(tmp_path / "avro_out")
    df.repartition(4, "id").write.format("tgos_avro").option(
        "path", out
    ).mode("append").save()
    files = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert len(files) == 4  # one container file per task
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = spark.read.format("tgos_avro").option("path", out).load()
    assert back.schema.simpleString() == df.schema.simpleString()
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
    # split planning: one input partition per file
    assert back.rdd.getNumPartitions() == 4
    # deflate through the datasource option: same rows back
    out2 = str(tmp_path / "avro_out_deflate")
    df.repartition(2).write.format("tgos_avro").option("path", out2).option(
        "codec", "deflate"
    ).mode("append").save()
    back2 = spark.read.format("tgos_avro").option("path", out2).load()
    assert sorted(map(tuple, back2.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_spark_datasource_append_and_overwrite(spark, tmp_path):
    from text_grabr_orc_spark.sources.avro_io import register_avro_source

    register_avro_source(spark)
    out = str(tmp_path / "avro_modes")
    a = spark.createDataFrame([(i, float(i)) for i in range(10)],
                              "id bigint, v double")
    b = spark.createDataFrame([(i, float(i)) for i in range(10, 16)],
                              "id bigint, v double")
    a.repartition(4).write.format("tgos_avro").option("path", out).mode(
        "append"
    ).save()
    # append with a DIFFERENT partition count: job-unique file names
    # mean no collision with the first write's part files
    b.repartition(2).write.format("tgos_avro").option("path", out).mode(
        "append"
    ).save()
    back = spark.read.format("tgos_avro").option("path", out).load()
    assert sorted(r["id"] for r in back.collect()) == list(range(16))
    assert len([f for f in os.listdir(out) if f.endswith(".avro")]) == 6
    # overwrite clears ALL prior part files, not just colliding names
    b.repartition(2).write.format("tgos_avro").option("path", out).mode(
        "overwrite"
    ).save()
    back2 = spark.read.format("tgos_avro").option("path", out).load()
    assert sorted(r["id"] for r in back2.collect()) == list(range(10, 16))
    assert len([f for f in os.listdir(out) if f.endswith(".avro")]) == 2


_ARR_FIELDS = [
    ("id", "long", False),
    ("vec", "array:float", False),
    ("tags", "array:long", True),
]

_ARR_ROWS = [
    (1, [1.5, -2.25, 0.0], [7, -8]),
    (2, [], None),
    (3, [3.5], [0]),
]


def test_array_columns_roundtrip(tmp_path):
    p = str(tmp_path / "arr.avro")
    n = write_container(p, _ARR_FIELDS, iter(_ARR_ROWS), block_rows=2,
                        codec="deflate")
    assert n == 3
    assert container_fields(p) == [tuple(f) for f in _ARR_FIELDS]
    assert list(read_container(p)) == _ARR_ROWS


def test_jvm_avro_reads_python_written_arrays(spark, tmp_path):
    import json as _json

    p = str(tmp_path / "arr_jvm.avro")
    write_container(p, _ARR_FIELDS, iter(_ARR_ROWS), codec="deflate")
    jvm = spark._jvm
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while rdr.hasNext():
        rec = _json.loads(str(rdr.next()))
        got.append((rec["id"], rec["vec"], rec["tags"]))
    rdr.close()
    assert got == [(i, v, t) for i, v, t in _ARR_ROWS]


def test_spark_datasource_embeddings_roundtrip(spark, sf_dir, tmp_path):
    """The vector-shard shape end-to-end: the embeddings table
    (vec_id bigint, embedding array<float>, label int) through the
    deflate Avro sink and back, row-for-row equal — float32 components
    survive exactly because they originate as float32."""
    from text_grabr_orc_spark.sources.avro_io import register_avro_source
    from text_grabr_orc_spark.tables import load_table

    register_avro_source(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path / "emb_avro")
    emb.repartition(3, "vec_id").write.format("tgos_avro").option(
        "path", out
    ).option("codec", "deflate").mode("append").save()
    back = spark.read.format("tgos_avro").option("path", out).load()
    assert back.schema.simpleString() == emb.schema.simpleString()
    a = sorted(
        (r["vec_id"], tuple(r["embedding"]), r["label"])
        for r in emb.collect()
    )
    b = sorted(
        (r["vec_id"], tuple(r["embedding"]), r["label"])
        for r in back.collect()
    )
    assert a == b


def test_jvm_avro_reads_python_written_file(spark, tmp_path):
    """Reference-implementation parity, write side: the REAL Apache
    Avro library (avro-1.12.1.jar on Spark's classpath) must read a
    file this codec wrote — deflate blocks, null unions, unicode and
    all. The same parity style the imaging codecs pin against the Go
    stdlib."""
    import json as _json

    fields = [
        ("id", "long", False),
        ("name", "string", True),
        ("score", "double", False),
        ("flag", "boolean", False),
    ]
    rows = [
        (1, "alpha", 1.5, True),
        (-7, None, -2.25, False),
        (2**40, "é中", 0.0, True),
    ]
    p = str(tmp_path / "py_written.avro")
    write_container(p, fields, iter(rows), codec="deflate", block_rows=2)
    jvm = spark._jvm
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while rdr.hasNext():
        rec = _json.loads(str(rdr.next()))
        got.append(
            (rec["id"], rec["name"], rec["score"], rec["flag"])
        )
    rdr.close()
    assert got == rows


def test_python_codec_reads_jvm_written_file(spark, tmp_path):
    """Reference-implementation parity, read side: this codec must
    read a deflate container the real Apache Avro library wrote."""
    from text_grabr_orc_spark.sources.avro_io import _schema_json

    fields = [
        ("id", "long", False),
        ("name", "string", True),
        ("score", "double", False),
    ]
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        _schema_json("row", fields)
    )
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    p = str(tmp_path / "jvm_written.avro")
    dfw.create(schema, jvm.java.io.File(p))
    want = [(10**12, "hello", 3.5), (-3, None, -0.25)]
    for idv, nm, sc in want:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", jvm.java.lang.Long.valueOf(idv))
        rec.put("name", nm)
        rec.put("score", jvm.java.lang.Double.valueOf(sc))
        dfw.append(rec)
    dfw.close()
    assert container_fields(p) == fields
    assert list(read_container(p)) == want


def test_avro_roundtrip_stats_registered(spark, sf_dir):
    from text_grabr_orc_spark import registry

    registry.load_all()
    out = registry.QUERIES["avro_roundtrip_stats"](spark, sf_dir)
    rows = {r["lang"]: r for r in out.collect()}
    assert rows, "empty result"
    # token sanity: totals add back up to the raw table
    import pyspark.sql.functions as F

    from text_grabr_orc_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    want = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    for r in want:
        assert rows[r["lang"]]["n_docs"] == r["n"]


def test_union_value_first_order_roundtrip(tmp_path):
    """[T, "null"] union order (legal per spec, produced by other
    writers): branch 0 carries the VALUE — the codec must honor the
    declared order in both directions, not silently normalize it
    (round-10 ADVICE: the old parser decoded these shifted)."""
    import json as _json

    from text_grabr_orc_spark.sources.avro_io import NULL_SECOND, _schema_json

    fields = [("id", "long", False), ("name", "string", NULL_SECOND)]
    # the emitted schema preserves the declared branch order
    sch = _json.loads(_schema_json("row", fields))
    assert sch["fields"][1]["type"] == ["string", "null"]
    rows = [(1, "alpha"), (2, None), (3, "gamma")]
    p = str(tmp_path / "vf.avro")
    write_container(p, fields, iter(rows), block_rows=2)
    assert container_fields(p) == fields
    assert list(read_container(p)) == rows


def test_python_reads_jvm_value_first_union(spark, tmp_path):
    """The real Apache Avro library writing a [T,"null"] schema: this
    codec must decode branch indices per the DECLARED order."""
    import json as _json

    schema_json = _json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": ["string", "null"]},
            ],
        }
    )
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    p = str(tmp_path / "jvm_vf.avro")
    dfw.create(schema, jvm.java.io.File(p))
    want = [(5, "hello"), (6, None), (7, "é中")]
    for idv, nm in want:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", jvm.java.lang.Long.valueOf(idv))
        rec.put("name", nm)
        dfw.append(rec)
    dfw.close()
    assert list(read_container(p)) == want
    # and the JVM reads back what this codec re-writes in that order
    fields = container_fields(p)
    p2 = str(tmp_path / "py_vf.avro")
    write_container(p2, fields, iter(want))
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p2), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while rdr.hasNext():
        rec = _json.loads(str(rdr.next()))
        got.append((rec["id"], rec["name"]))
    rdr.close()
    assert got == want


def test_abort_removes_this_jobs_part_files(tmp_path):
    """A failed job must not leave eagerly-published part files for
    later reads to pick up (round-10 ADVICE: append mode would
    silently duplicate rows from the failed job)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from text_grabr_orc_spark.sources.avro_io import make_avro_datasource

    src_cls = make_avro_datasource()
    ds = src_cls(options={"path": str(tmp_path)})
    schema = StructType([StructField("id", LongType(), False)])
    w = ds.writer(schema, False)
    mine = tmp_path / f"part-{w.job}-00000.avro"
    mine2 = tmp_path / f"part-{w.job}-00003.avro"
    other = tmp_path / "part-feedc0ffee12-00000.avro"
    for f in (mine, mine2, other):
        f.write_bytes(b"placeholder")
    w.abort([])
    assert not mine.exists() and not mine2.exists()
    assert other.exists()  # an EARLIER job's data is untouched


def test_enumerate_block_ranges_covers_file(tmp_path):
    """Block-range enumeration: contiguous, covering, and grouped by
    the byte target — the driver-side split plan for one big file."""
    from text_grabr_orc_spark.sources.avro_io import enumerate_block_ranges

    p = str(tmp_path / "big.avro")
    rows = [(i, f"name-{i}", i / 3.0, i % 2 == 0, b"\x01" * 8)
            for i in range(500)]
    write_container(p, _FIELDS, iter(rows), block_rows=50)  # 10 blocks
    ranges = enumerate_block_ranges(p, 1)  # every block its own range
    assert len(ranges) == 10
    # contiguous and ending at EOF
    for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
        assert e1 == s2
    assert ranges[-1][1] == os.path.getsize(p)
    # reading the union of ranges reproduces the file exactly, in order
    got = [r for s, e in ranges for r in read_container(p, s, e)]
    assert got == rows
    # a huge target folds everything into one range
    assert enumerate_block_ranges(p, 1 << 30) == [
        (ranges[0][0], ranges[-1][1])
    ]
    # empty container (header only): no ranges
    p0 = str(tmp_path / "empty.avro")
    write_container(p0, _FIELDS, iter([]))
    assert enumerate_block_ranges(p0, 1) == []


def test_datasource_splits_single_large_file(spark, tmp_path):
    """One container file must fan out across >1 input partition when
    its blocks exceed split_bytes — the 100 TB skewed-file-size story
    (round-10 verdict: per-file granularity serialized on the largest
    container)."""
    import pyspark.sql.functions as F

    from text_grabr_orc_spark.sources.avro_io import register_avro_source

    register_avro_source(spark)
    df = spark.createDataFrame(
        [(i, f"payload-{i}" * 4, i * 0.5) for i in range(2000)],
        "id bigint, name string, val double",
    )
    out = str(tmp_path / "one_big")
    # ONE file, many small blocks
    df.repartition(1).write.format("tgos_avro").option("path", out).option(
        "block_rows", "100"
    ).mode("append").save()
    assert len([f for f in os.listdir(out) if f.endswith(".avro")]) == 1
    back = (
        spark.read.format("tgos_avro")
        .option("path", out)
        .option("split_bytes", "4096")
        .load()
    )
    assert back.rdd.getNumPartitions() > 1
    n_pids = (
        back.select(F.spark_partition_id().alias("pid")).distinct().count()
    )
    assert n_pids > 1  # actually READ through multiple tasks
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
    # default split_bytes (32 MiB) keeps a small file in one partition
    back1 = spark.read.format("tgos_avro").option("path", out).load()
    assert back1.rdd.getNumPartitions() == 1


def test_timestamp_and_map_roundtrip(tmp_path):
    """Logical types + maps through the pure-Python codec: instant
    (timestamp-micros, tz-aware UTC out), wall clock
    (local-timestamp-micros, naive), and string-keyed int maps."""
    import datetime as dt

    UTC = dt.timezone.utc
    fields = [
        ("id", "long", False),
        ("at", "tsmicros", False),
        ("wall", "ltsmicros", True),
        ("props", "map:int", False),
    ]
    rows = [
        (
            1,
            dt.datetime(2024, 1, 1, 0, 9, 58, 778549, tzinfo=UTC),
            dt.datetime(2024, 1, 1, 0, 9, 58, 778549),
            {"k": 87, "j": -3},
        ),
        (2, dt.datetime(1969, 12, 31, 23, 59, 59, 999999, tzinfo=UTC),
         None, {}),
        (3, dt.datetime(2262, 4, 11, 23, 47, 16, 854775, tzinfo=UTC),
         dt.datetime(1, 1, 1), {"z": 0}),
    ]
    p = str(tmp_path / "lt.avro")
    assert write_container(p, fields, iter(rows), block_rows=2) == 3
    assert container_fields(p) == fields
    assert list(read_container(p)) == rows
    # naive instants encode via process-local time, the exact inverse
    # of what Spark's worker hands over — spot-pin one value
    from text_grabr_orc_spark.sources.avro_io import (
        _instant_to_micros,
        _micros_to_instant,
    )

    m = 1704067200123456
    assert _instant_to_micros(_micros_to_instant(m)) == m
    local_naive = dt.datetime.fromtimestamp(m / 1e6)
    assert abs(_instant_to_micros(local_naive) - m) < 1000  # float µs


def test_jvm_duplex_parity_logical_types(spark, tmp_path):
    """The real Apache Avro library must agree with this codec on
    timestamp-micros / local-timestamp-micros / map encodings — both
    directions."""
    import datetime as dt
    import json as _json

    from text_grabr_orc_spark.sources.avro_io import _schema_json

    UTC = dt.timezone.utc
    fields = [
        ("id", "long", False),
        ("at", "tsmicros", False),
        ("wall", "ltsmicros", False),
        ("props", "map:long", False),
    ]
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0, 123456, tzinfo=UTC),
         dt.datetime(2024, 6, 1, 12, 30), {"k": 87}),
        (2, dt.datetime(1970, 1, 1, tzinfo=UTC),
         dt.datetime(1970, 1, 1), {"a": -1, "b": 2}),
    ]
    # python writes -> JVM reads (GenericDatumReader yields raw longs
    # for logical types; its JSON renders maps as objects)
    p = str(tmp_path / "py_lt.avro")
    write_container(p, fields, iter(rows), codec="deflate")
    jvm = spark._jvm
    sch = _json.loads(_schema_json("row", fields))
    assert sch["fields"][1]["type"]["logicalType"] == "timestamp-micros"
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while rdr.hasNext():
        rec = _json.loads(str(rdr.next()))
        got.append((rec["id"], rec["at"], rec["wall"], rec["props"]))
    rdr.close()
    assert got == [
        (1, 1704067200123456, 1717245000000000, {"k": 87}),
        (2, 0, 0, {"a": -1, "b": 2}),
    ]
    # JVM writes raw longs under the logical-type schema -> python
    # reads them back as datetimes
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        _schema_json("row", fields)
    )
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    p2 = str(tmp_path / "jvm_lt.avro")
    dfw.create(schema, jvm.java.io.File(p2))
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("id", jvm.java.lang.Long.valueOf(9))
    rec.put("at", jvm.java.lang.Long.valueOf(1704067200123456))
    rec.put("wall", jvm.java.lang.Long.valueOf(1717245000000000))
    m = jvm.java.util.HashMap()
    m.put("k", jvm.java.lang.Long.valueOf(5))
    rec.put("props", m)
    dfw.append(rec)
    dfw.close()
    assert container_fields(p2) == fields
    assert list(read_container(p2)) == [
        (9, dt.datetime(2024, 1, 1, 0, 0, 0, 123456, tzinfo=UTC),
         dt.datetime(2024, 6, 1, 12, 30), {"k": 5})
    ]


def test_spark_datasource_timestamp_instant_roundtrip(spark, tmp_path):
    """TIMESTAMP (instant) columns through the datasource: internal
    epoch micros must survive the write/read detour exactly."""
    import pyspark.sql.functions as F

    from text_grabr_orc_spark.sources.avro_io import register_avro_source

    register_avro_source(spark)
    df = spark.sql(
        """
        SELECT id,
               timestampadd(
                   SECOND, CAST(id * 3601.5 AS INT),
                   timestamp'2024-03-09 23:30:00'
               ) AS at
        FROM range(200) -- spans a US DST spring-forward wall-clock gap
        """
    )
    out = str(tmp_path / "ts_avro")
    df.write.format("tgos_avro").option("path", out).mode("append").save()
    back = spark.read.format("tgos_avro").option("path", out).load()
    assert dict(back.dtypes)["at"] == "timestamp"
    a = sorted(map(tuple, df.select("id", F.unix_micros("at")).collect()))
    b = sorted(map(tuple, back.select("id", F.unix_micros("at")).collect()))
    assert a == b


def test_avro_events_roundtrip_registered(spark, sf_dir):
    from text_grabr_orc_spark import registry

    registry.load_all()
    out = registry.QUERIES["avro_events_roundtrip"](spark, sf_dir)
    rows = out.collect()
    assert rows
    import pyspark.sql.functions as F

    from text_grabr_orc_spark.sources.events import load_events

    want = (
        load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {}
    for r in rows:
        got[r["event_type"]] = got.get(r["event_type"], 0) + r["n"]
    assert got == {r["event_type"]: r["n"] for r in want}


def test_date_logical_type_roundtrip(spark, tmp_path):
    """date logical type (epoch days on int): pure-python roundtrip,
    Spark DATE column through the datasource, and JVM read parity."""
    import datetime as dt
    import json as _json

    import pyspark.sql.functions as F

    from text_grabr_orc_spark.sources.avro_io import register_avro_source

    fields = [("id", "long", False), ("d", "date", True)]
    rows = [
        (1, dt.date(2024, 2, 29)),
        (2, None),
        (3, dt.date(1969, 12, 31)),
        (4, dt.date(1970, 1, 1)),
    ]
    p = str(tmp_path / "d.avro")
    write_container(p, fields, iter(rows), block_rows=3)
    assert container_fields(p) == fields
    assert list(read_container(p)) == rows
    # JVM reads epoch days under the logical-type schema
    jvm = spark._jvm
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while rdr.hasNext():
        rec = _json.loads(str(rdr.next()))
        got.append((rec["id"], rec["d"]))
    rdr.close()
    assert got == [(1, 19782), (2, None), (3, -1), (4, 0)]
    # Spark DATE column end-to-end
    register_avro_source(spark)
    df = spark.sql(
        "SELECT id, date_add(date'2024-01-01', CAST(id AS INT)) AS d "
        "FROM range(400)"
    )
    out = str(tmp_path / "date_ds")
    df.write.format("tgos_avro").option("path", out).mode("append").save()
    back = spark.read.format("tgos_avro").option("path", out).load()
    assert dict(back.dtypes)["d"] == "date"
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_nullable_map_values(spark, tmp_path):
    """Spark maps always carry valueContainsNull — a None value must
    round-trip as the ["null",T] value union, not crash (int) or
    corrupt ('None' string) (round-11 review)."""
    import json as _json

    from text_grabr_orc_spark.sources.avro_io import (
        _schema_json,
        register_avro_source,
    )

    # pure-python: mapn token, including null-valued and empty maps
    fields = [("id", "long", False), ("m", "mapn:string", False)]
    rows = [
        (1, {"a": "x", "b": None}),
        (2, {}),
        (3, {"c": None}),
    ]
    p = str(tmp_path / "mn.avro")
    write_container(p, fields, iter(rows), block_rows=2)
    assert container_fields(p) == fields
    assert list(read_container(p)) == rows
    sch = _json.loads(_schema_json("row", fields))
    assert sch["fields"][1]["type"]["values"] == ["null", "string"]
    # a PLAIN map refuses nulls loudly instead of writing 'None'
    try:
        write_container(
            str(tmp_path / "bad.avro"),
            [("id", "long", False), ("m", "map:string", False)],
            iter([(1, {"a": None})]),
        )
        raise AssertionError("null in plain map not rejected")
    except ValueError as e:
        assert "non-nullable map" in str(e)
    # Spark end-to-end: from_json with an explicit null value
    register_avro_source(spark)
    df = spark.createDataFrame(
        [(1, '{"k": 7, "z": null}'), (2, '{"k": null}'), (3, "{}")],
        "id bigint, props string",
    ).select("id", __import__("pyspark.sql.functions", fromlist=["F"])
             .from_json("props", "map<string,int>").alias("props"))
    out = str(tmp_path / "mn_ds")
    df.write.format("tgos_avro").option("path", out).mode("append").save()
    back = spark.read.format("tgos_avro").option("path", out).load()
    got = {r["id"]: r["props"] for r in back.collect()}
    assert got == {1: {"k": 7, "z": None}, 2: {"k": None}, 3: {}}


def test_corrupt_block_header_fails_fast(tmp_path):
    """A corrupt varint in a block header must raise at plan time,
    never loop (a negative decoded size would stall pos forever —
    round-11 review)."""
    from text_grabr_orc_spark.sources.avro_io import (
        enumerate_block_ranges,
        read_header,
    )

    p = str(tmp_path / "c.avro")
    write_container(p, _FIELDS, iter(_ROWS), block_rows=2)
    with open(p, "rb") as fh:
        read_header(fh)
        first_block = fh.tell()
    raw = bytearray(open(p, "rb").read())
    raw[first_block] = 0x01  # zigzag 0x01 = -1 row count
    open(p, "wb").write(bytes(raw))
    try:
        enumerate_block_ranges(p, 1)
        raise AssertionError("corrupt header not detected")
    except ValueError as e:
        assert "corrupt block header" in str(e)


_NEST_FIELDS = [
    ("id", "long", False),
    (
        "meta",
        [
            ("status", "string", False),
            (
                "detail",
                [
                    ("price", "double", True),
                    ("placed", "ltsmicros", False),
                ],
                True,
            ),
        ],
        True,
    ),
]


def test_nested_record_roundtrip(tmp_path):
    """Two-level nested records with nullable inner records, logical
    types at the bottom, and union order preserved through nesting."""
    import datetime as dt

    rows = [
        (1, ("O", (12.5, dt.datetime(2024, 1, 2, 3, 4, 5, 6)))),
        (2, None),
        (3, ("F", None)),
        (4, ("P", (None, dt.datetime(1999, 12, 31, 23, 59, 59)))),
    ]
    p = str(tmp_path / "n.avro")
    assert write_container(p, _NEST_FIELDS, iter(rows), block_rows=2) == 4
    assert container_fields(p) == _NEST_FIELDS
    assert list(read_container(p)) == rows


def test_jvm_duplex_parity_nested_records(spark, tmp_path):
    """The real Apache Avro library agrees with this codec on nested
    record encodings — both directions, nullable inner record
    included."""
    import datetime as dt
    import json as _json

    from text_grabr_orc_spark.sources.avro_io import _schema_json

    rows = [
        (1, ("O", (12.5, dt.datetime(2024, 1, 2, 3, 4, 5, 6)))),
        (2, ("F", None)),
    ]
    p = str(tmp_path / "py_nest.avro")
    write_container(p, _NEST_FIELDS, iter(rows), codec="deflate")
    jvm = spark._jvm
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while rdr.hasNext():
        rec = _json.loads(str(rdr.next()))
        m = rec["meta"]
        d = m.get("detail")
        got.append(
            (rec["id"],
             (m["status"],
              None if d is None else (d["price"], d["placed"])))
        )
    rdr.close()
    assert got == [
        (1, ("O", (12.5, 1704164645000006))),
        (2, ("F", None)),
    ]
    # JVM writes the same nested schema -> python reads it back
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        _schema_json("row", _NEST_FIELDS)
    )
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    p2 = str(tmp_path / "jvm_nest.avro")
    dfw.create(schema, jvm.java.io.File(p2))
    meta_s = schema.getField("meta").schema().getTypes().get(1)
    det_s = meta_s.getField("detail").schema().getTypes().get(1)
    det = jvm.org.apache.avro.generic.GenericData.Record(det_s)
    det.put("price", jvm.java.lang.Double.valueOf(7.25))
    det.put("placed", jvm.java.lang.Long.valueOf(123456789))
    meta = jvm.org.apache.avro.generic.GenericData.Record(meta_s)
    meta.put("status", "Z")
    meta.put("detail", det)
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("id", jvm.java.lang.Long.valueOf(9))
    rec.put("meta", meta)
    dfw.append(rec)
    dfw.close()
    assert container_fields(p2) == _NEST_FIELDS
    got2 = list(read_container(p2))
    import datetime as dt2

    assert got2 == [
        (9, ("Z", (7.25,
                   dt2.datetime(1970, 1, 1, 0, 2, 3, 456789))))
    ]


def test_spark_datasource_struct_roundtrip(spark, tmp_path):
    """Struct columns end-to-end through the datasource: nested Row
    values, a null inner struct, schema inference back to struct
    DDL."""
    from text_grabr_orc_spark.sources.avro_io import register_avro_source

    register_avro_source(spark)
    df = spark.sql(
        """
        SELECT id,
               named_struct(
                   'status', CASE WHEN id % 3 = 0 THEN 'A' ELSE 'B' END,
                   'fin', CASE WHEN id % 5 = 0 THEN NULL
                          ELSE named_struct('total',
                                            CAST(id AS DOUBLE) * 1.5d,
                                            'n', CAST(id AS INT)) END
               ) AS detail
        FROM range(300)
        """
    )
    out = str(tmp_path / "nest_ds")
    df.repartition(3).write.format("tgos_avro").option("path", out).mode(
        "append"
    ).save()
    back = spark.read.format("tgos_avro").option("path", out).load()
    assert dict(back.dtypes)["detail"] == (
        "struct<status:string,fin:struct<total:double,n:int>>"
    )
    canon = lambda rows: sorted(
        (r["id"], r["detail"]["status"],
         None if r["detail"]["fin"] is None
         else (r["detail"]["fin"]["total"], r["detail"]["fin"]["n"]))
        for r in rows
    )
    assert canon(back.collect()) == canon(df.collect())


def test_decimal_logical_type_roundtrip(spark, tmp_path):
    """decimal on bytes (unscaled two's-complement big-endian): exact
    at full DECIMAL(38,18) width, negative, zero, and through the
    Spark datasource; JVM duplex parity via Avro's own
    DecimalConversion."""
    from decimal import Decimal

    fields = [("id", "long", False), ("v", "dec:38:18", True)]
    rows = [
        (1, Decimal("12345.670000000000000001")),
        (2, Decimal("-0.000000000000000001")),
        (3, Decimal("0E-18")),
        (4, None),
        (5, Decimal("99999999999999999999.999999999999999999")),
    ]
    p = str(tmp_path / "dec.avro")
    write_container(p, fields, iter(rows), block_rows=2)
    assert container_fields(p) == fields
    assert list(read_container(p)) == rows
    # a value with more fractional digits than the scale fails loudly
    try:
        write_container(
            str(tmp_path / "bad.avro"),
            [("v", "dec:10:2", False)],
            iter([(Decimal("1.005"),)]),
        )
        raise AssertionError("scale overflow not rejected")
    except ValueError as e:
        assert "scale" in str(e)
    # JVM parity, both directions, via the reference DecimalConversion
    import json as _json

    from text_grabr_orc_spark.sources.avro_io import _schema_json

    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        _schema_json("row", [("v", "dec:12:2", False)])
    )
    vschema = schema.getField("v").schema()
    conv = jvm.org.apache.avro.Conversions.DecimalConversion()
    ltype = jvm.org.apache.avro.LogicalTypes.fromSchema(vschema)
    p2 = str(tmp_path / "jvm_dec.avro")
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    dfw.create(schema, jvm.java.io.File(p2))
    for s in ("12345.67", "-0.01", "0.00"):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put(
            "v",
            conv.toBytes(jvm.java.math.BigDecimal(s), vschema, ltype),
        )
        dfw.append(rec)
    dfw.close()
    assert list(read_container(p2)) == [
        (Decimal("12345.67"),), (Decimal("-0.01"),), (Decimal("0.00"),)
    ]
    # python-written bytes read back through the JVM conversion
    p3 = str(tmp_path / "py_dec.avro")
    write_container(
        p3,
        [("v", "dec:12:2", False)],
        iter([(Decimal("999.99"),), (Decimal("-123.45"),)]),
    )
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p3), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while rdr.hasNext():
        buf = rdr.next().get("v")
        got.append(str(conv.fromBytes(buf, vschema, ltype)))
    rdr.close()
    assert got == ["999.99", "-123.45"]
    # Spark datasource end-to-end
    from text_grabr_orc_spark.sources.avro_io import register_avro_source

    register_avro_source(spark)
    df = spark.sql(
        "SELECT id, CAST(CAST(id AS DOUBLE) * 1.01 AS DECIMAL(14,4)) AS v"
        " FROM range(500)"
    )
    out = str(tmp_path / "dec_ds")
    df.write.format("tgos_avro").option("path", out).mode("append").save()
    back = spark.read.format("tgos_avro").option("path", out).load()
    assert dict(back.dtypes)["v"] == "decimal(14,4)"
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_generalized_arrays_roundtrip(spark, tmp_path):
    """Arrays past the legacy non-null-prim subset: record items,
    NULL elements (Spark's containsNull), logical types inside —
    written as ["null", item] unions per the spec; JVM parity and the
    datasource end-to-end."""
    import datetime as dt
    import json as _json

    item = [("s", "ltsmicros", False), ("v", "double", True)]
    fields = [("id", "long", False), ("evs", ("arr", item, True), True)]
    rows = [
        (1, [(dt.datetime(2024, 1, 1), 1.5), None,
             (dt.datetime(2024, 1, 2), None)]),
        (2, []),
        (3, None),
        (4, [(dt.datetime(1999, 12, 31, 23, 59, 59, 999999), -2.0)]),
    ]
    p = str(tmp_path / "as.avro")
    assert write_container(p, fields, iter(rows), block_rows=2,
                           codec="deflate") == 4
    assert container_fields(p) == fields
    assert list(read_container(p)) == rows
    # nullable primitive array (what Spark's default containsNull is)
    f2 = [("id", "long", False), ("xs", ("arr", "long", True), False)]
    r2 = [(1, [1, None, 3]), (2, [])]
    p2 = str(tmp_path / "np.avro")
    write_container(p2, f2, iter(r2))
    assert list(read_container(p2)) == r2
    # a null element in a non-null array fails loudly
    try:
        write_container(
            str(tmp_path / "bad.avro"),
            [("xs", ("arr", "long", False), False)],
            iter([([1, None],)]),
        )
        raise AssertionError("null element not rejected")
    except ValueError as e:
        assert "non-null array" in str(e)
    # JVM reads the array-of-records file this codec wrote
    jvm = spark._jvm
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while rdr.hasNext():
        rec = _json.loads(str(rdr.next()))
        evs = rec["evs"]
        got.append(
            (rec["id"],
             None if evs is None else [
                 None if e is None else (e["s"], e["v"]) for e in evs
             ])
        )
    rdr.close()
    us = lambda d: (d - __import__("datetime").datetime(1970, 1, 1))
    to_us = lambda d: (us(d).days * 86400 + us(d).seconds) * 10**6 + us(d).microseconds
    want = [
        (i, None if evs is None else [
            None if e is None else (to_us(e[0]), e[1]) for e in evs
        ])
        for i, evs in rows
    ]
    assert got == want
    # Spark datasource end-to-end: array<struct> with null elements
    from text_grabr_orc_spark.sources.avro_io import register_avro_source

    register_avro_source(spark)
    df = spark.sql(
        """
        SELECT id, array(
                 named_struct('a', id, 'b', concat('x', id)),
                 CASE WHEN id % 3 = 0 THEN NULL
                      ELSE named_struct('a', id * 2, 'b', 'y') END
               ) AS evs
        FROM range(200)
        """
    )
    out = str(tmp_path / "as_ds")
    df.repartition(2).write.format("tgos_avro").option("path", out).mode(
        "append"
    ).save()
    back = spark.read.format("tgos_avro").option("path", out).load()
    assert dict(back.dtypes)["evs"] == "array<struct<a:bigint,b:string>>"
    canon = lambda rows_: sorted(
        (r["id"],
         tuple(None if e is None else (e["a"], e["b"]) for e in r["evs"]))
        for r in rows_
    )
    assert canon(back.collect()) == canon(df.collect())


def test_schema_hygiene_review_fixes(spark, tmp_path):
    """Round-11 second review pass: nested record names are unique
    even when field paths collide under '_' joining (a redefined
    fullname makes the file unreadable by spec-compliant readers);
    unsupported map VALUE types raise ValueError; zero-column frames
    keep their row count through the Arrow exchange."""
    import json as _json

    from text_grabr_orc_spark.sources.avro_io import (
        _schema_json,
        _token_of_spark_type,
        register_avro_source,
    )

    # path-colliding record names: user.id_x vs user_id.x
    fields = [
        ("user", [("id_x", [("q", "long", False)], False)], False),
        ("user_id", [("x", [("q", "long", False)], False)], False),
    ]
    sj = _schema_json("row", fields)
    # the REAL reference parser is the arbiter of name legality
    spark._jvm.org.apache.avro.Schema.Parser().parse(sj)
    names = []

    def walk(t):
        if isinstance(t, dict) and t.get("type") == "record":
            names.append(t["name"])
            for f in t["fields"]:
                walk(f["type"])

    walk(_json.loads(sj))
    assert len(names) == len(set(names)), names
    # logical-typed map values now ship through the generalized map
    # token (round-11 ADVICE item 3 — these used to raise)
    from pyspark.sql import types as T

    assert _token_of_spark_type(
        T.MapType(T.StringType(), T.TimestampType(), True)
    ) == ("map", "tsmicros", True)
    # value types outside the subset still raise ValueError (from the
    # recursive scalar mapping), never a raw KeyError
    try:
        _token_of_spark_type(
            T.MapType(T.StringType(), T.ByteType(), True)
        )
        raise AssertionError("tinyint map value not rejected")
    except ValueError as e:
        assert "unsupported avro field type" in str(e)
    # zero-column frames: write + read round-trip without error (the
    # empty DDL string used to crash schema inference). Row COUNT is
    # not preserved — probed: Spark itself hands the Arrow writer
    # num_rows=0 batches for zero-column frames, so the loss is
    # upstream of this codec; the degenerate case is documented
    # rather than worked around.
    register_avro_source(spark)
    df0 = spark.range(37).select()
    assert len(df0.columns) == 0
    out = str(tmp_path / "zerocol")
    df0.repartition(1).write.format("tgos_avro").option("path", out).mode(
        "append"
    ).save()
    back = spark.read.format("tgos_avro").option("path", out).load()
    assert back.columns == [] and back.count() == 0


def test_enum_fixed_gmap_container_roundtrip(tmp_path):
    """Named types (enum, fixed) and generalized map values — pure
    python write/read, schema-token parse round-trip, and the
    contract errors (unknown symbol, wrong fixed length)."""
    import datetime as dt

    fields = [
        ("id", "long", False),
        ("status", ("enum", "status_enum", ("F", "O", "P")), False),
        ("digest", ("fixed", "digest_fixed", 4), False),
        # generalized maps: logical-typed scalar AND record values
        ("meta", ("map", "ltsmicros", True), False),
        ("deep", ("map", [("a", "long", True)], False), True),
    ]
    rows = [
        (1, "F", b"\x01\x02\x03\x04",
         {"placed": dt.datetime(2024, 6, 1, 12, 30), "x": None},
         {"k": (7,)}),
        (2, "P", b"\xff\xee\xdd\xcc", {}, None),
    ]
    p = str(tmp_path / "named.avro")
    assert write_container(p, fields, iter(rows), codec="deflate") == 2
    # schema JSON -> tokens is an exact inverse (names included)
    assert container_fields(p) == fields
    assert list(read_container(p)) == rows
    # contract errors, not silent coercion
    import pytest

    with pytest.raises(ValueError, match="not in enum symbols"):
        write_container(
            str(tmp_path / "bad1.avro"), fields,
            iter([(3, "Z", b"\x00" * 4, {}, None)]),
        )
    with pytest.raises(ValueError, match="fixed\\(4\\)"):
        write_container(
            str(tmp_path / "bad2.avro"), fields,
            iter([(3, "F", b"\x00" * 3, {}, None)]),
        )


def test_map_sort_and_scalar_token_advice_fixes():
    """Round-11 ADVICE regressions: (1) map writers sort by KEY only —
    an Arrow MapArray slice can carry duplicate keys with unorderable
    values (None vs int), which a whole-tuple sort would TypeError on;
    (2) unsupported scalar types raise ValueError, not KeyError."""
    import pytest

    from text_grabr_orc_spark.sources.avro_io import (
        _cached_writer,
        _token_of_spark,
    )

    buf = bytearray()
    # duplicate key, None-then-int values: whole-tuple sort raises
    _cached_writer("mapn:long")(buf, [("k", None), ("k", 1)])
    assert buf  # encoded without TypeError
    buf2 = bytearray()
    _cached_writer(("map", "long", True))(buf2, [("k", None), ("k", 1)])
    assert bytes(buf) == bytes(buf2)  # legacy and generalized agree
    with pytest.raises(ValueError, match="unsupported avro field type"):
        _token_of_spark("tinyint")


def test_jvm_duplex_parity_enum_fixed(spark, tmp_path):
    """The real Apache Avro library agrees with this codec on enum
    (symbol-position varint), fixed (raw bytes), and generalized map
    values — both directions."""
    import datetime as dt

    from text_grabr_orc_spark.sources.avro_io import _schema_json

    fields = [
        ("id", "long", False),
        ("status", ("enum", "status_enum", ("F", "O", "P")), False),
        ("digest", ("fixed", "digest_fixed", 4), False),
        ("meta", ("map", "ltsmicros", False), False),
    ]
    rows = [
        (1, "P", b"\x01\x02\x03\x04",
         {"placed": dt.datetime(2024, 6, 1, 12, 30)}),
        (2, "F", b"\xff\x00\x7f\x80", {}),
    ]
    p = str(tmp_path / "py_named.avro")
    write_container(p, fields, iter(rows), codec="deflate")
    jvm = spark._jvm
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while rdr.hasNext():
        rec = rdr.next()
        m = rec.get("meta")
        got.append((
            rec.get("id"),
            str(rec.get("status")),
            bytes(rec.get("digest").bytes()),
            {str(e.getKey()): e.getValue()
             for e in m.entrySet().toArray()},
        ))
    rdr.close()
    assert got == [
        (1, "P", b"\x01\x02\x03\x04", {"placed": 1717245000000000}),
        (2, "F", b"\xff\x00\x7f\x80", {}),
    ]
    # JVM writes the same named-type schema -> python reads it back
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        _schema_json("row", fields)
    )
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    p2 = str(tmp_path / "jvm_named.avro")
    dfw.create(schema, jvm.java.io.File(p2))
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("id", jvm.java.lang.Long.valueOf(9))
    rec.put(
        "status",
        jvm.org.apache.avro.generic.GenericData.EnumSymbol(
            schema.getField("status").schema(), "O"
        ),
    )
    rec.put(
        "digest",
        jvm.org.apache.avro.generic.GenericData.Fixed(
            schema.getField("digest").schema(),
            bytearray(b"\xca\xfe\xba\xbe"),
        ),
    )
    m = jvm.java.util.HashMap()
    m.put("placed", jvm.java.lang.Long.valueOf(123456789))
    rec.put("meta", m)
    dfw.append(rec)
    dfw.close()
    assert container_fields(p2) == fields
    assert list(read_container(p2)) == [
        (9, "O", b"\xca\xfe\xba\xbe",
         {"placed": dt.datetime(1970, 1, 1, 0, 2, 3, 456789)}),
    ]


def test_spark_datasource_enum_fixed_gmap(spark, tmp_path):
    """Datasource end-to-end: enum/fixed writer declarations, a
    struct-valued generalized map, and declaration errors at plan
    time."""
    import json as _json

    import pyspark.sql.functions as F

    from text_grabr_orc_spark.sources.avro_io import register_avro_source

    register_avro_source(spark)
    df = spark.sql(
        """
        SELECT id,
               CASE WHEN id % 3 = 0 THEN 'A'
                    WHEN id % 3 = 1 THEN 'B' ELSE 'C' END AS grade,
               unhex(md5(CAST(id AS STRING))) AS digest,
               map('v', named_struct('a', id, 'b',
                   CASE WHEN id % 4 = 0 THEN NULL
                        ELSE CAST(id AS DOUBLE) / 2 END)) AS attrs
        FROM range(500)
        """
    )
    out = str(tmp_path / "named_ds")
    (
        df.repartition(3)
        .write.format("tgos_avro")
        .option("path", out)
        .option("enums", _json.dumps({"grade": ["A", "B", "C"]}))
        .option("fixed", _json.dumps({"digest": 16}))
        .option("codec", "deflate")
        .mode("append")
        .save()
    )
    # the embedded schema really declares the named types
    import glob

    first = sorted(glob.glob(os.path.join(out, "*.avro")))[0]
    fields = container_fields(first)
    by_name = {n: t for n, t, _ in fields}
    assert by_name["grade"][0] == "enum"
    assert by_name["digest"] == ("fixed", "digest_fixed", 16)
    assert by_name["attrs"][0] == "map"
    back = spark.read.format("tgos_avro").option("path", out).load()
    assert dict(back.dtypes)["grade"] == "string"
    assert dict(back.dtypes)["digest"] == "binary"
    assert dict(back.dtypes)["attrs"] == (
        "map<string,struct<a:bigint,b:double>>"
    )
    canon = lambda rows: sorted(
        (r["id"], r["grade"], bytes(r["digest"]),
         r["attrs"]["v"]["a"], r["attrs"]["v"]["b"])
        for r in rows
    )
    assert canon(back.collect()) == canon(df.collect())
    # declaration errors surface at plan time with clear messages
    import pytest

    with pytest.raises(Exception, match="needs a string column"):
        df.write.format("tgos_avro").option(
            "path", str(tmp_path / "bad_ds")
        ).option("enums", _json.dumps({"id": ["A"]})).mode(
            "append"
        ).save()
    with pytest.raises(Exception, match="needs a binary column"):
        df.write.format("tgos_avro").option(
            "path", str(tmp_path / "bad_ds2")
        ).option("fixed", _json.dumps({"grade": 16})).mode(
            "append"
        ).save()


def test_avro_enum_roundtrip_registered(spark, sf_dir):
    from text_grabr_orc_spark import registry

    registry.load_all()
    out = registry.QUERIES["avro_enum_roundtrip"](spark, sf_dir)
    rows = {r["status"]: r for r in out.collect()}
    assert set(rows) == {"F", "O", "P"}
    import pyspark.sql.functions as F

    from text_grabr_orc_spark.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    want = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("key_sum"),
    ).collect()
    for r in want:
        assert rows[r["o_orderstatus"]]["n"] == r["n"]
        assert rows[r["o_orderstatus"]]["key_sum"] == r["key_sum"]


def test_codegen_codec_matches_closure_codecs():
    """The source-generated block codecs (avro_codegen — the Arrow
    hot path) are byte-identical to the closure codecs on write and
    value-identical on read (modulo the documented raw-temporal int
    representation), across the full supported type lattice including
    nullable unions in both declared orders, nested records, arrays,
    maps, enums, fixed, and decimals. Property-tested: any divergence
    between the two implementations is a wire-format bug."""
    import datetime as dt
    import decimal

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from text_grabr_orc_spark.sources.avro_codegen import (
        block_decoder,
        block_encoder,
    )
    from text_grabr_orc_spark.sources.avro_io import (
        _compile_record_writer,
        _decode_rows,
        _EPOCH_NAIVE,
        _EPOCH_UTC,
    )

    fields = [
        ("id", "long", False),
        ("name", "string", True),
        ("score", "double", False),
        ("when", "ltsmicros", "null_second"),  # [T,"null"] order
        ("at", "tsmicros", True),
        ("tags", ("arr", "long", True), True),
        ("props", "mapn:long", False),
        ("grade", ("enum", "g", ("A", "B", "C")), False),
        ("dg", ("fixed", "f", 4), True),
        ("nested", [("a", "long", True),
                    ("b", [("c", "string", False)], True)], True),
        ("price", "dec:12:3", True),
    ]
    micros = st.integers(min_value=0, max_value=2**48)
    row_st = st.tuples(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.one_of(st.none(), st.text(max_size=12)),
        st.floats(allow_nan=False, width=64),
        st.one_of(st.none(), micros),
        st.one_of(st.none(), micros),
        st.one_of(st.none(), st.lists(
            st.one_of(st.none(), st.integers(-100, 100)), max_size=4)),
        st.dictionaries(st.text(max_size=4),
                        st.one_of(st.none(), st.integers(-9, 9)),
                        max_size=3),
        st.sampled_from(["A", "B", "C"]),
        st.one_of(st.none(), st.binary(min_size=4, max_size=4)),
        st.one_of(st.none(), st.tuples(
            st.one_of(st.none(), st.integers(-5, 5)),
            st.one_of(st.none(), st.tuples(st.text(max_size=4))))),
        st.one_of(st.none(), st.decimals(
            min_value=-999999, max_value=999999, places=3)),
    )

    def to_raw_cols(rows):
        # the columnar (Arrow-exchange) representation: per-column
        # lists, temporals as ints, structs as dicts
        cols = [[] for _ in fields]
        for r in rows:
            cols[0].append(r[0])
            cols[1].append(r[1])
            cols[2].append(r[2])
            cols[3].append(r[3])
            cols[4].append(r[4])
            cols[5].append(r[5])
            cols[6].append(r[6])
            cols[7].append(r[7])
            cols[8].append(r[8])
            nested = r[9]
            cols[9].append(
                None if nested is None else {
                    "a": nested[0],
                    "b": None if nested[1] is None
                    else {"c": nested[1][0]},
                }
            )
            cols[10].append(r[10])
        return cols

    def to_closure_rows(rows):
        # the row-tuple representation the closure codecs speak:
        # temporals as datetime objects
        out = []
        for r in rows:
            out.append((
                r[0], r[1], r[2],
                None if r[3] is None
                else _EPOCH_NAIVE + dt.timedelta(microseconds=r[3]),
                None if r[4] is None
                else _EPOCH_UTC + dt.timedelta(microseconds=r[4]),
                r[5], r[6], r[7], r[8], r[9], r[10],
            ))
        return out

    enc = block_encoder(fields)
    dec = block_decoder(fields)
    wr = _compile_record_writer(fields)

    @given(st.lists(row_st, max_size=20))
    @settings(max_examples=60, deadline=None)
    def check(rows):
        cols = to_raw_cols(rows)
        crows = to_closure_rows(rows)
        # write: codegen bytes == closure bytes
        buf = bytearray()
        enc(buf, cols, 0, len(rows))
        buf2 = bytearray()
        for cr in crows:
            wr(buf2, cr)
        assert bytes(buf) == bytes(buf2)
        # read: codegen columns == input columns (raw form; decoded
        # structs come back as TUPLES — the pa.array-compatible form —
        # while the encoder consumed to_pylist DICTS)
        got = [[] for _ in fields]
        used = dec(memoryview(bytes(buf)), len(rows), got)
        assert used == len(buf)
        want = [list(c) for c in cols]
        want[9] = [r[9] for r in rows]  # nested: tuple form
        for want_col, got_col in zip(want, got):
            assert got_col == want_col
        # ...and the closure decode agrees on the same bytes
        ref, used2 = _decode_rows(memoryview(bytes(buf)), 0,
                                  len(rows), fields)
        assert used2 == used and ref == crows

    check()


def test_codegen_review_fixes(tmp_path):
    """Round-12 review findings on the generated codecs: (1) a
    zero-field schema compiles (empty loop body used to
    IndentationError, making rows-bearing zero-column containers
    unreadable); (2) quotes/backslashes in column names survive
    source generation; (3) block_rows <= 0 raises instead of spinning
    the columnar writer forever; (4) generated codecs are memoized
    per schema (hundreds of split partitions must not re-exec)."""
    import os as _os

    import pytest

    from text_grabr_orc_spark.sources.avro_codegen import (
        block_decoder,
        block_encoder,
    )
    from text_grabr_orc_spark.sources.avro_io import (
        read_blocks_columns,
        write_container_columns,
    )

    # (1) zero-field schema: codecs compile; rows-bearing zero-column
    # containers round-trip their COUNT through the columnar path
    p = str(tmp_path / "zero.avro")
    write_container(p, [], iter([(), (), ()]))
    got = [(len(cols), n) for _, cols, n in read_blocks_columns(p)]
    assert got == [(0, 3)]
    enc0 = block_encoder([])
    buf = bytearray()
    enc0(buf, [], 0, 3)
    assert bytes(buf) == b""
    # (2) hostile column names: generation must not break the source
    fields = [("it's \\ a \"name\"\n", "long", False)]
    enc = block_encoder(fields)
    dec = block_decoder(fields)
    buf = bytearray()
    enc(buf, [[7]], 0, 1)
    cols = [[]]
    assert dec(memoryview(bytes(buf)), 1, cols) == len(buf)
    assert cols == [[7]]
    with pytest.raises(ValueError, match="null in non-nullable"):
        enc(bytearray(), [[None]], 0, 1)
    # (3) non-positive block_rows: loud error, not an infinite loop
    with pytest.raises(ValueError, match="block_rows"):
        write_container_columns(
            str(tmp_path / "x.avro"), [("a", "long", False)],
            [([[1]], 1)], block_rows=0,
        )
    # (4) memoization: same schema -> same compiled object
    f2 = [("a", "long", False), ("b", "string", True)]
    assert block_decoder(f2) is block_decoder(list(f2))
    assert block_encoder(f2) is block_encoder(list(f2))


def test_reader_schema_resolution_skip_and_promote():
    """Schema resolution unit coverage: writer-only fields of every
    shape SKIP with exact widths (a wrong skip shifts every following
    byte), spec promotions decode as the reader type, defaults fill,
    and incompatibilities raise."""
    import pytest

    from text_grabr_orc_spark.sources.avro_codegen import (
        resolve_reader,
        resolved_block_decoder,
    )
    from text_grabr_orc_spark.sources.avro_io import (
        _compile_record_writer,
    )

    writer = [
        ("a", "int", False),
        ("skip_str", "string", True),
        ("skip_arr", ("arr", [("x", "long", False)], True), False),
        ("skip_map", "mapn:long", False),
        ("skip_rec", [("p", "double", False),
                      ("q", "boolean", True)], True),
        ("skip_fixed", ("fixed", "f8", 8), False),
        ("skip_enum", ("enum", "e", ("X", "Y")), False),
        ("f", "float", False),
        ("s", "string", False),
        ("b", "bytes", False),
    ]
    reader = [
        ("b", "string", False),    # bytes -> string
        ("a", "double", False),    # int -> double
        ("f", "double", False),    # float -> double
        ("s", "bytes", False),     # string -> bytes
        ("added", "long", False),  # reader-only (default by caller)
    ]
    rows = [
        # the bytes field carries VALID utf-8 (bytes->string promotion
        # is a reinterpretation of the payload, spec-legal only for
        # utf-8 content)
        (7, "drop", [(1,), None], {"k": 9, "z": None},
         (2.5, None), b"12345678", "Y", 1.5, "hi", "héllo".encode()),
        (-3, None, [], {}, None, b"abcdefgh", "X", -0.25, "", b""),
    ]
    wr = _compile_record_writer(writer)
    buf = bytearray()
    for r in rows:
        wr(buf, r)
    dec = resolved_block_decoder(writer, reader)
    cols = [[] for _ in reader]
    used = dec(memoryview(bytes(buf)), 2, cols)
    assert used == len(buf)  # every skip consumed exactly its bytes
    assert cols[0] == ["héllo", ""]  # bytes -> string
    assert cols[1] == [7.0, -3.0]
    assert cols[2] == [1.5, -0.25]
    assert cols[3] == [b"hi", b""]
    assert cols[4] == []  # caller fills defaults
    ops, missing = resolve_reader(writer, reader)
    assert [reader[i][0] for i in missing] == ["added"]
    # incompatibilities: type and nullability mismatches raise
    with pytest.raises(ValueError, match="cannot resolve"):
        resolve_reader([("a", "string", False)],
                       [("a", "long", False)])
    with pytest.raises(ValueError, match="nullable writer"):
        resolve_reader([("a", "long", True)],
                       [("a", "long", False)])


def test_reader_schema_jvm_resolver_parity(spark, tmp_path):
    """The real Avro library's resolving decoder
    (GenericDatumReader(expected=reader)) agrees with this codec on a
    skip+promote+default resolution of a python-written file."""
    import json as _json

    from text_grabr_orc_spark.sources.avro_io import _schema_json

    writer = [
        ("a", "int", False),
        ("junk", "string", False),
        ("f", "float", False),
    ]
    rows = [(5, "drop-me", 1.5), (-9, "", -2.25)]
    p = str(tmp_path / "evo.avro")
    write_container(p, writer, iter(rows), codec="deflate")
    reader_json = _json.dumps({
        "type": "record", "name": "row",
        "fields": [
            {"name": "a", "type": "long"},          # int -> long
            {"name": "f", "type": "double"},        # float -> double
            {"name": "extra", "type": "string", "default": "dflt"},
        ],
    })
    jvm = spark._jvm
    expected = jvm.org.apache.avro.Schema.Parser().parse(reader_json)
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(expected),
    )
    got = []
    while rdr.hasNext():
        rec = rdr.next()
        got.append((rec.get("a"), rec.get("f"), str(rec.get("extra"))))
    rdr.close()
    assert got == [(5, 1.5, "dflt"), (-9, -2.25, "dflt")]
    # our resolver on the same file and reader schema
    from text_grabr_orc_spark.sources.avro_io import (
        _parse_reader_schema,
        read_blocks_columns,
    )

    rf, dflts = _parse_reader_schema(reader_json)
    ours = []
    for _f, cols, n in read_blocks_columns(p, None, None, rf, dflts):
        ours.extend(zip(*cols))
    assert ours == got


def test_spark_datasource_reader_schema(spark, sf_dir, tmp_path):
    """Datasource end-to-end resolution: projection skips wide writer
    fields, promotions change the Spark type, the default fills a
    reader-only column, and the registered query passes against a
    direct computation."""
    import json as _json

    import pyspark.sql.functions as F

    from text_grabr_orc_spark import registry
    from text_grabr_orc_spark.sources.avro_io import register_avro_source
    from text_grabr_orc_spark.tables import load_table

    register_avro_source(spark)
    df = spark.sql(
        """
        SELECT id, CAST(id AS INT) AS small,
               repeat('x', 50) AS wide,
               map('k', id) AS m,
               timestamp_ntz'2024-06-01 12:30:00' AS ts
        FROM range(500)
        """
    )
    out = str(tmp_path / "evo_ds")
    df.repartition(2).write.format("tgos_avro").option(
        "path", out
    ).mode("append").save()
    reader = _json.dumps({
        "type": "record", "name": "row",
        "fields": [
            {"name": "small", "type": "long"},
            {"name": "ts", "type": {
                "type": "long",
                "logicalType": "local-timestamp-micros"}},
            {"name": "channel", "type": "string", "default": "web"},
        ],
    })
    back = (
        spark.read.format("tgos_avro")
        .option("path", out)
        .option("reader_schema", reader)
        .load()
    )
    assert dict(back.dtypes) == {
        "small": "bigint", "ts": "timestamp_ntz", "channel": "string",
    }
    rows = back.agg(
        F.count(F.lit(1)), F.sum("small"),
        F.count_distinct("channel"), F.min("ts").cast("string"),
    ).collect()[0]
    assert tuple(rows) == (500, 124750, 1, "2024-06-01 12:30:00")
    # the registered evolution query against a direct computation
    registry.load_all()
    got = {
        r["status"]: r
        for r in registry.QUERIES["avro_reader_schema_evolution"](
            spark, sf_dir
        ).collect()
    }
    want = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("o_orderkey").alias("key_sum"))
        .collect()
    )
    for r in want:
        assert got[r["o_orderstatus"]]["n"] == r["n"]
        assert got[r["o_orderstatus"]]["key_sum"] == r["key_sum"]
        assert got[r["o_orderstatus"]]["channel"] == "store"


def test_bzip2_xz_codecs_jvm_duplex_parity(spark, tmp_path):
    """The optional spec codecs bzip2 and xz (stdlib bz2/lzma): python
    writes -> the real Avro library reads (its CodecFactory loads
    bzip2 via commons-compress and xz via the xz jar, both on Spark's
    classpath), and JVM-compressed files read back here — full duplex
    for both codecs, plus python round-trip and an unsupported-codec
    header raising descriptively."""
    import pytest

    fields = [("id", "long", False), ("t", "string", True)]
    rows = [(i, None if i % 7 == 0 else "lorem ipsum " * 10)
            for i in range(300)]
    jvm = spark._jvm
    for codec in ("bzip2", "xz"):
        p = str(tmp_path / f"py_{codec}.avro")
        write_container(p, fields, iter(rows), codec=codec,
                        block_rows=64)
        rdr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(p),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        assert str(rdr.getMetaString("avro.codec")) == codec
        got = []
        while rdr.hasNext():
            rec = rdr.next()
            t = rec.get("t")
            got.append((rec.get("id"),
                        None if t is None else str(t)))
        rdr.close()
        assert got == rows
        # JVM writes the codec -> python reads
        from text_grabr_orc_spark.sources.avro_io import _schema_json

        schema = jvm.org.apache.avro.Schema.Parser().parse(
            _schema_json("row", fields)
        )
        dfw = jvm.org.apache.avro.file.DataFileWriter(
            jvm.org.apache.avro.generic.GenericDatumWriter(schema)
        )
        factory = jvm.org.apache.avro.file.CodecFactory
        dfw.setCodec(
            factory.bzip2Codec() if codec == "bzip2"
            else factory.xzCodec(6)
        )
        p2 = str(tmp_path / f"jvm_{codec}.avro")
        dfw.create(schema, jvm.java.io.File(p2))
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", jvm.java.lang.Long.valueOf(42))
        rec.put("t", "from the jvm")
        dfw.append(rec)
        dfw.close()
        assert list(read_container(p2)) == [(42, "from the jvm")]
    # unknown codec in the header: descriptive error, not garbage rows
    p3 = str(tmp_path / "py_null.avro")
    write_container(p3, fields, iter(rows[:5]))
    raw = open(p3, "rb").read()
    assert b"null" in raw[:200]
    open(p3, "wb").write(raw.replace(b"\x08null", b"\x08zstd", 1))
    with pytest.raises(ValueError, match="unsupported codec"):
        list(read_container(p3))
    with pytest.raises(ValueError, match="unsupported codec"):
        # "brotli" is not an Avro spec codec; "zstandard" IS in
        # subset as of round 13 (sources/zstd.py) so it no longer
        # serves as the unknown-name probe
        write_container(str(tmp_path / "bad.avro"), fields,
                        iter(rows[:1]), codec="brotli")


def test_avro_stream_reader_offsets(tmp_path):
    """The streaming reader's offset contract, without Spark: one file
    per batch, no-progress offset identity at catch-up, exact replay
    between committed offsets, and a picklable batch iterator (Spark
    pickles the prefetched batch; a generator would crash
    planPartitions)."""
    import pickle

    from text_grabr_orc_spark.sources.avro_io import (
        make_avro_datasource,
    )

    fields = [("id", "long", False)]
    for k in range(3):
        write_container(
            str(tmp_path / f"part-{k}.avro"), fields,
            iter([(k * 10 + i,) for i in range(4)]),
        )
    src = make_avro_datasource()(
        {"path": str(tmp_path), "max_files_per_batch": "1"}
    )
    rdr = src.simpleStreamReader("id bigint")
    off0 = rdr.initialOffset()
    rows1, off1 = rdr.read(off0)
    rows1 = list(pickle.loads(pickle.dumps(rows1)))
    assert rows1 == [(i,) for i in range(4)]
    assert off1 == {"seen": ["part-0.avro"]}
    rows2, off2 = rdr.read(off1)
    assert [r[0] for r in rows2] == [10, 11, 12, 13]
    rows3, off3 = rdr.read(off2)
    assert [r[0] for r in rows3] == [20, 21, 22, 23]
    # caught up: same offset object back, empty batch
    rows4, off4 = rdr.read(off3)
    assert list(rows4) == [] and off4 == off3
    # a NEW drop resumes the stream
    write_container(str(tmp_path / "part-9.avro"), fields,
                    iter([(99,)]))
    rows5, off5 = rdr.read(off3)
    assert [r[0] for r in rows5] == [99]
    # exact replay of a committed range (recovery contract)
    assert [r[0] for r in rdr.readBetweenOffsets(off1, off3)] == [
        10, 11, 12, 13, 20, 21, 22, 23,
    ]


def test_streaming_avro_ingest_registered(spark, sf_dir):
    """The registered streaming query end-to-end at the test sf: the
    totals match the batch events table and the offset log really
    advanced file-by-file (multiple micro-batches)."""
    import pyspark.sql.functions as F

    from text_grabr_orc_spark import registry
    from text_grabr_orc_spark.sources.events import load_events

    registry.load_all()
    out = registry.QUERIES["streaming_avro_ingest"](spark, sf_dir)
    got = {r["event_type"]: r for r in out.collect()}
    want = (
        load_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("user_id").alias("user_sum"))
        .collect()
    )
    assert len(got) == len(want)
    for r in want:
        assert got[r["event_type"]]["n"] == r["n"]
        assert got[r["event_type"]]["user_sum"] == r["user_sum"]


def test_resolution_review_fixes(tmp_path):
    """Round-12 second-review findings: (1) temporals NESTED inside
    records/arrays/maps re-hydrate to datetimes on the row-exchange
    paths; (2) non-null writer -> nullable reader resolves (spec-legal
    widening); (3) max_files_per_batch <= 0 raises instead of
    stalling; (4) unknown codec names raise in the compress paths."""
    import datetime as dt

    import pytest

    from text_grabr_orc_spark.sources.avro_io import (
        _compress,
        _decompress,
        iter_resolved_rows,
        make_avro_datasource,
    )

    writer = [
        ("id", "long", False),
        ("ev", [("ts", "ltsmicros", False),
                ("d", "date", True)], True),
        ("times", ("arr", "ltsmicros", False), False),
        ("meta", ("map", "tsmicros", False), False),
    ]
    rows = [
        (1, (dt.datetime(2024, 6, 1, 12, 30), dt.date(2024, 6, 2)),
         [dt.datetime(2020, 1, 1)],
         {"at": dt.datetime(2021, 2, 3,
                            tzinfo=dt.timezone.utc)}),
        (2, None, [], {}),
    ]
    p = str(tmp_path / "nested_t.avro")
    write_container(p, writer, iter(rows))
    # reader widens id to nullable (spec-legal) and keeps the rest
    reader = [
        ("id", "long", True),
        ("ev", writer[1][1], True),
        ("times", writer[2][1], False),
        ("meta", writer[3][1], False),
    ]
    got = list(iter_resolved_rows(p, reader, {}))
    assert got == rows  # datetimes at EVERY depth, not raw ints
    # unsafe direction still rejected
    from text_grabr_orc_spark.sources.avro_codegen import resolve_reader

    with pytest.raises(ValueError, match="nullable writer"):
        resolve_reader([("a", "long", True)], [("a", "long", False)])
    # stream option validation
    with pytest.raises(ValueError, match="max_files_per_batch"):
        make_avro_datasource()(
            {"path": str(tmp_path), "max_files_per_batch": "0"}
        ).simpleStreamReader("id bigint")
    # codec fallthrough is loud (zstandard is IN subset since round
    # 13's sources/zstd.py; an unknown name still trips the guard)
    with pytest.raises(ValueError, match="no compressor"):
        _compress("brotli", b"x")
    with pytest.raises(ValueError, match="no decompressor"):
        _decompress("brotli", b"x")
    # and a zstandard payload that is not a frame fails loudly
    with pytest.raises(ValueError, match="zstd"):
        _decompress("zstandard", b"x")
    # snappy is IN subset since round 13 (sources/snappy.py), but a
    # payload shorter than its CRC trailer still fails loudly
    with pytest.raises(ValueError, match="CRC trailer"):
        _decompress("snappy", b"x")


def test_stream_defers_uncommitted_writer_jobs(tmp_path):
    """The commit-gate: a tgos_avro part file published by a task of
    an UNCOMMITTED job is invisible to the stream until the job's
    token reaches the ledger; foreign file names pass through; a
    ledger-less directory is treated as foreign (everything
    consumable)."""
    from text_grabr_orc_spark.sources.avro_io import (
        make_avro_datasource,
    )

    fields = [("id", "long", False)]
    # foreign-named drop in a ledger-less dir: consumable
    write_container(str(tmp_path / "drop-1.avro"), fields,
                    iter([(1,)]))
    src = make_avro_datasource()({"path": str(tmp_path)})
    rdr = src.simpleStreamReader("id bigint")
    rows, off = rdr.read(rdr.initialOffset())
    assert [r[0] for r in rows] == [1]
    # now the dir becomes writer-managed: ledger exists, a part file
    # of an in-flight (uncommitted) job appears
    (tmp_path / "_committed_jobs").write_text("")
    job = "abcdef012345"
    write_container(
        str(tmp_path / f"part-{job}-00000.avro"), fields,
        iter([(2,)]),
    )
    rows2, off2 = rdr.read(off)
    assert list(rows2) == [] and off2 == off  # deferred, no progress
    # foreign names still pass while the job is pending
    write_container(str(tmp_path / "drop-2.avro"), fields,
                    iter([(3,)]))
    rows3, off3 = rdr.read(off)
    assert [r[0] for r in rows3] == [3]
    # commit: the token lands in the ledger -> the part file streams
    (tmp_path / "_committed_jobs").write_text(job + "\n")
    rows4, off4 = rdr.read(off3)
    assert [r[0] for r in rows4] == [2]


def test_writer_ledger_lifecycle(spark, tmp_path):
    """The datasource writer maintains the ledger: present from plan
    time (empty), the job token appended exactly at commit — and an
    end-to-end write is immediately streamable."""
    from text_grabr_orc_spark.sources.avro_io import (
        make_avro_datasource,
        register_avro_source,
    )

    register_avro_source(spark)
    out = tmp_path / "led"
    df = spark.range(10).selectExpr("id")
    df.repartition(2).write.format("tgos_avro").option(
        "path", str(out)
    ).mode("append").save()
    ledger = (out / "_committed_jobs").read_text().split()
    assert len(ledger) == 1
    parts = [f for f in os.listdir(out) if f.endswith(".avro")]
    assert all(f.split("-")[1] == ledger[0] for f in parts)
    # a second append adds a second token
    df.repartition(1).write.format("tgos_avro").option(
        "path", str(out)
    ).mode("append").save()
    assert len((out / "_committed_jobs").read_text().split()) == 2
    # the stream sees all committed rows
    src = make_avro_datasource()(
        {"path": str(out), "max_files_per_batch": "10"}
    )
    rdr = src.simpleStreamReader("id bigint")
    rows, _ = rdr.read(rdr.initialOffset())
    assert sorted(r[0] for r in rows) == sorted(list(range(10)) * 2)


def _flatten_split(batches) -> list[int]:
    """Values of the single ``id`` column from read_split output —
    Arrow RecordBatches when pyarrow is present, row tuples on the
    fallback path."""
    vals: list[int] = []
    for b in batches:
        if hasattr(b, "column"):
            vals.extend(b.column(0).to_pylist())
        else:
            vals.append(b[0])
    return vals


def test_part_file_name_regex_contract():
    """The writer's part-file name and the stream-consumability regex
    derive from one format helper: partition ids past 5 digits
    (>= 100000) still match (round-12 ADVICE: a hard ``\\d{5}``
    treated them as foreign, letting a stream consume an uncommitted
    job's parts); foreign names stay unmatched."""
    import re

    from text_grabr_orc_spark.sources.avro_io import (
        _PART_FILE_RE,
        part_file_name,
    )

    pr = re.compile(_PART_FILE_RE)
    for pid in (0, 7, 99999, 100000, 1234567):
        m = pr.match(part_file_name("abcdef012345", pid))
        assert m is not None and m.group(1) == "abcdef012345"
    for foreign in ("drop-1.avro", "part-XYZ-00000.avro",
                    "part-abcdef012345-123.avro"):
        assert pr.match(foreign) is None


def test_consumable_gates_six_digit_partition_ids(tmp_path):
    """The ledger gate holds for partition ids >= 100000 (6+ name
    digits): deferred while the job is uncommitted, consumable after
    commit — the round-12 ADVICE regression."""
    from text_grabr_orc_spark.sources.avro_io import (
        consumable_avro_files,
        part_file_name,
    )

    fields = [("id", "long", False)]
    (tmp_path / "_committed_jobs").write_text("")
    job = "0123456789ab"
    name = part_file_name(job, 123456)
    write_container(str(tmp_path / name), fields, iter([(1,)]))
    assert consumable_avro_files(str(tmp_path)) == []
    (tmp_path / "_committed_jobs").write_text(job + "\n")
    assert consumable_avro_files(str(tmp_path)) == [name]


def test_enum_decode_bounds_check():
    """A corrupt/foreign enum index fails loudly in BOTH decoders
    (closure and source-generated) instead of wrapping via Python
    negative indexing — round-12 ADVICE."""
    import pytest

    from text_grabr_orc_spark.sources import avro_codegen as cg
    from text_grabr_orc_spark.sources.avro_io import (
        _compile_reader,
        write_long,
    )

    tok = ("enum", "E", ("A", "B"))
    rd = _compile_reader(tok)
    ok = bytearray()
    write_long(ok, 1)
    assert rd(memoryview(bytes(ok)), 0)[0] == "B"
    for bad in (2, 5, -1):
        buf = bytearray()
        write_long(buf, bad)
        with pytest.raises(ValueError, match="enum index"):
            rd(memoryview(bytes(buf)), 0)
    dec = cg.block_decoder([("s", tok, False)])
    cols: list[list] = [[]]
    two = bytearray()
    write_long(two, 0)
    write_long(two, 1)
    dec(memoryview(bytes(two)), 2, cols)
    assert cols[0] == ["A", "B"]
    for bad in (2, -1):
        buf = bytearray()
        write_long(buf, bad)
        with pytest.raises(ValueError, match="enum index"):
            dec(memoryview(bytes(buf)), 1, [[]])


def test_partitioned_stream_reader_offsets_and_fanout(tmp_path):
    """The PARTITIONED stream reader's planning contract, without
    Spark: initial/latest offsets, set-difference partition planning
    (>= 1 split per new file, 4-for-4 files), exact replay between
    offsets, zero partitions at catch-up, and latestOffset honoring
    the committed-jobs gate (round-12 verdict #1: the reader landed
    after the final gate with no dedicated unit tests)."""
    from text_grabr_orc_spark.sources.avro_io import (
        make_avro_stream_datasource,
        part_file_name,
    )

    fields = [("id", "long", False)]
    names = []
    for k in range(4):
        n = f"drop-{k}.avro"
        write_container(
            str(tmp_path / n), fields,
            iter([(k * 10 + i,) for i in range(5)]),
        )
        names.append(n)
    src = make_avro_stream_datasource()({"path": str(tmp_path)})
    rdr = src.streamReader("id bigint")
    off0 = rdr.initialOffset()
    assert off0 == {"seen": []}
    off1 = rdr.latestOffset()
    assert off1 == {"seen": names}
    # catch-up: identical offsets plan ZERO partitions
    assert rdr.partitions(off1, off1) == []
    parts = rdr.partitions(off0, off1)
    assert len(parts) >= 4  # at least one split per file
    got = []
    for p in parts:
        got.extend(_flatten_split(rdr.read(p)))
    assert sorted(got) == [k * 10 + i for k in range(4) for i in range(5)]
    # replay of a committed sub-range is exactly the delta files
    mid = {"seen": names[:2]}
    redo = []
    for p in rdr.partitions(mid, off1):
        redo.extend(_flatten_split(rdr.read(p)))
    assert sorted(redo) == [
        k * 10 + i for k in (2, 3) for i in range(5)
    ]
    # the ledger gate flows through latestOffset: an uncommitted
    # writer part is invisible, then appears at commit
    (tmp_path / "_committed_jobs").write_text("")
    job = "abcdef012345"
    gated = part_file_name(job, 0)
    write_container(str(tmp_path / gated), fields, iter([(99,)]))
    assert rdr.latestOffset() == off1
    (tmp_path / "_committed_jobs").write_text(job + "\n")
    off2 = rdr.latestOffset()
    assert gated in off2["seen"]
    new = []
    for p in rdr.partitions(off1, off2):
        new.extend(_flatten_split(rdr.read(p)))
    assert new == [99]


def test_partitioned_stream_single_file_block_fanout(tmp_path):
    """ONE large container with many sync-marker blocks + a small
    ``split_bytes`` fans into multiple block-range partitions whose
    union reads every row exactly once — the scale path for a single
    multi-GB drop (round-12 verdict #4). The partition count is pinned
    to the planner's own enumerate_block_ranges answer."""
    from text_grabr_orc_spark.sources.avro_io import (
        enumerate_block_ranges,
        make_avro_stream_datasource,
    )

    fields = [("id", "long", False)]
    p = tmp_path / "big.avro"
    write_container(
        str(p), fields, iter([(i,) for i in range(1000)]),
        block_rows=50,  # 20 blocks
    )
    split = 256  # bytes: force multiple ranges
    ranges = enumerate_block_ranges(str(p), split)
    assert len(ranges) >= 4
    src = make_avro_stream_datasource()(
        {"path": str(tmp_path), "split_bytes": str(split)}
    )
    rdr = src.streamReader("id bigint")
    parts = rdr.partitions(rdr.initialOffset(), rdr.latestOffset())
    assert len(parts) == len(ranges)
    got = []
    for part in parts:
        got.extend(_flatten_split(rdr.read(part)))
    assert sorted(got) == list(range(1000))


def test_millis_codegen_matches_closure():
    """The generated block codecs agree with the closure codecs on
    the MILLIS timestamp family: identical wire bytes on write
    (micros exchange -> floor-divided millis), identical values on
    read (wire millis -> scaled micros / datetimes)."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from text_grabr_orc_spark.sources.avro_codegen import (
        block_decoder,
        block_encoder,
    )
    from text_grabr_orc_spark.sources.avro_io import (
        _compile_record_writer,
        _decode_rows,
        _EPOCH_NAIVE,
        _EPOCH_UTC,
    )

    fields = [
        ("id", "long", False),
        ("ts", "tsmillis", True),
        ("lts", "ltsmillis", False),
    ]
    ms = st.integers(min_value=-(2**40), max_value=2**40)
    row_st = st.tuples(
        st.integers(min_value=-(2**31), max_value=2**31),
        st.one_of(st.none(), ms),
        ms,
    )
    enc = block_encoder(fields)
    dec = block_decoder(fields)
    wr = _compile_record_writer(fields)

    @given(st.lists(row_st, max_size=16))
    @settings(max_examples=60, deadline=None)
    def check(rows):
        # raw exchange form: micros (millis-aligned, as produced by
        # the decoders and consumed by the Arrow cast)
        cols = [
            [r[0] for r in rows],
            [None if r[1] is None else r[1] * 1000 for r in rows],
            [r[2] * 1000 for r in rows],
        ]
        crows = [
            (
                r[0],
                None if r[1] is None
                else _EPOCH_UTC + dt.timedelta(milliseconds=r[1]),
                _EPOCH_NAIVE + dt.timedelta(milliseconds=r[2]),
            )
            for r in rows
        ]
        buf = bytearray()
        enc(buf, cols, 0, len(rows))
        buf2 = bytearray()
        for cr in crows:
            wr(buf2, cr)
        assert bytes(buf) == bytes(buf2)
        got = [[], [], []]
        used = dec(memoryview(bytes(buf)), len(rows), got)
        assert used == len(buf) and got == cols
        ref, used2 = _decode_rows(memoryview(bytes(buf)), 0,
                                  len(rows), fields)
        assert used2 == used and ref == crows

    check()


def test_millis_jvm_duplex_parity(spark, tmp_path):
    """timestamp-millis / local-timestamp-millis duplex with the real
    Avro library, plus the spec's unknown-logical-type fallback: a JVM
    file with a uuid logical type reads as its string base."""
    import datetime as dt
    import json

    from text_grabr_orc_spark.sources.avro_io import _schema_json

    jvm = spark._jvm
    fields = [
        ("id", "long", False),
        ("ts", "tsmillis", True),
        ("lts", "ltsmillis", False),
    ]
    rows = [
        (1,
         dt.datetime(2024, 6, 1, 12, 30, 15, 123000,
                     tzinfo=dt.timezone.utc),
         dt.datetime(2020, 1, 2, 3, 4, 5, 678000)),
        (2, None, dt.datetime(1969, 12, 31, 23, 59, 59, 999000)),
    ]
    # python writes millis -> JVM reads the raw longs
    p = str(tmp_path / "py_millis.avro")
    write_container(p, fields, iter(rows))
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while rdr.hasNext():
        rec = rdr.next()
        got.append((rec.get("id"), rec.get("ts"), rec.get("lts")))
    rdr.close()
    # JVM generic reader surfaces the raw wire longs (millis)
    assert got == [(1, 1717245015123, 1577934245678), (2, None, -1)]
    # JVM writes millis + a uuid-annotated string -> python reads
    schema_json = json.dumps({
        "type": "record", "name": "row", "fields": [
            {"name": "ts", "type": {
                "type": "long", "logicalType": "timestamp-millis"}},
            {"name": "u", "type": {
                "type": "string", "logicalType": "uuid"}},
        ],
    })
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    p2 = str(tmp_path / "jvm_millis.avro")
    dfw.create(schema, jvm.java.io.File(p2))
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("ts", jvm.java.lang.Long.valueOf(1717245015123))
    rec.put("u", "0f0e0d0c-0b0a-0908-0706-050403020100")
    dfw.append(rec)
    dfw.close()
    back = list(read_container(p2))
    assert back == [(
        dt.datetime(2024, 6, 1, 12, 30, 15, 123000,
                    tzinfo=dt.timezone.utc),
        "0f0e0d0c-0b0a-0908-0706-050403020100",
    )]
    # our own schema emit carries the millis logical types verbatim
    sj = json.loads(_schema_json("row", fields))
    assert sj["fields"][1]["type"][1]["logicalType"] == "timestamp-millis"
    assert (sj["fields"][2]["type"]["logicalType"]
            == "local-timestamp-millis")


def test_millis_writer_declaration(spark, tmp_path):
    """The datasource writer's ``millis`` option: declared timestamp
    columns ship as millis (wire value truncated), undeclared stay
    micros; wrong column types and unknown names raise at plan time."""
    import datetime as dt

    import pytest

    from text_grabr_orc_spark.sources.avro_io import (
        container_fields,
        register_avro_source,
    )

    register_avro_source(spark)
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1, 12, 30, 15, 123456))],
        "id bigint, ts timestamp_ntz",
    )
    out = tmp_path / "ms"
    df.coalesce(1).write.format("tgos_avro").option(
        "path", str(out)
    ).option("millis", '["ts"]').mode("append").save()
    part = next(f for f in os.listdir(out) if f.endswith(".avro"))
    assert container_fields(str(out / part)) == [
        ("id", "long", True), ("ts", "ltsmillis", True),
    ]
    back = spark.read.format("tgos_avro").option(
        "path", str(out)
    ).load().collect()
    # sub-millis truncated on the wire, scaled back to micros on read
    assert back[0]["ts"] == dt.datetime(2024, 6, 1, 12, 30, 15, 123000)
    # declaration errors are plan-time and descriptive
    with pytest.raises(Exception, match="millis declaration"):
        df.write.format("tgos_avro").option(
            "path", str(tmp_path / "bad1")
        ).option("millis", '["id"]').mode("append").save()
    with pytest.raises(Exception, match="millis declaration"):
        df.write.format("tgos_avro").option(
            "path", str(tmp_path / "bad2")
        ).option("millis", '["nope"]').mode("append").save()


def test_unknown_logical_types_fall_back_to_base(tmp_path):
    """Spec §Logical Types: unrecognized annotations read as the
    underlying type — time-millis as int, time-micros as long,
    timestamp-nanos as long — while recognized-but-wrong-base combos
    still raise."""
    import json

    import pytest

    from text_grabr_orc_spark.sources.avro_io import _parse_schema

    fs = _parse_schema(json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "tn", "type": {
                "type": "long", "logicalType": "timestamp-nanos"}},
            {"name": "u", "type": {
                "type": "string", "logicalType": "uuid"}},
            {"name": "dur", "type": {
                "type": "int", "logicalType": "made-up-annotation"}},
        ],
    }))
    assert fs == [("tn", "long", False), ("u", "string", False),
                  ("dur", "int", False)]
    # time-millis / time-micros are REAL types (Spark 4.1 TIME), not
    # fallbacks
    fs_t = _parse_schema(json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "tm", "type": {
                "type": "int", "logicalType": "time-millis"}},
            {"name": "tu", "type": {
                "type": "long", "logicalType": "time-micros"}},
        ],
    }))
    assert fs_t == [("tm", "timemillis", False),
                    ("tu", "timemicros", False)]
    # an INVALID logical-type application (decimal on boolean) also
    # falls back to the base type — spec: "if a logical type is
    # invalid... implementations should ignore the logical type and
    # use the underlying Avro type"
    fs2 = _parse_schema(json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "d", "type": {
                "type": "boolean", "logicalType": "decimal"}},
        ],
    }))
    assert fs2 == [("d", "boolean", False)]
    # but a bare unsupported BASE type still raises, annotation or not
    with pytest.raises(ValueError, match="unsupported avro type"):
        _parse_schema(json.dumps({
            "type": "record", "name": "r", "fields": [
                {"name": "x", "type": {
                    "type": "weird", "logicalType": "uuid"}},
            ],
        }))


def test_time_of_day_codegen_matches_closure():
    """Generated vs closure codecs on the TIME family: identical wire
    bytes (nanos exchange -> micros/millis wire), identical values on
    read (wire -> nanos / datetime.time)."""
    import datetime as dt

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from text_grabr_orc_spark.sources.avro_codegen import (
        block_decoder,
        block_encoder,
    )
    from text_grabr_orc_spark.sources.avro_io import (
        _compile_record_writer,
        _decode_rows,
        _micros_to_time,
    )

    fields = [
        ("id", "long", False),
        ("tu", "timemicros", True),
        ("tm", "timemillis", False),
    ]
    us_of_day = st.integers(min_value=0, max_value=86_399_999_999)
    ms_of_day = st.integers(min_value=0, max_value=86_399_999)
    row_st = st.tuples(st.integers(-100, 100),
                       st.one_of(st.none(), us_of_day), ms_of_day)
    enc = block_encoder(fields)
    dec = block_decoder(fields)
    wr = _compile_record_writer(fields)

    @given(st.lists(row_st, max_size=16))
    @settings(max_examples=60, deadline=None)
    def check(rows):
        cols = [
            [r[0] for r in rows],
            [None if r[1] is None else r[1] * 1000 for r in rows],
            [r[2] * 1_000_000 for r in rows],
        ]
        crows = [
            (r[0],
             None if r[1] is None else _micros_to_time(r[1]),
             _micros_to_time(r[2] * 1000))
            for r in rows
        ]
        buf = bytearray()
        enc(buf, cols, 0, len(rows))
        buf2 = bytearray()
        for cr in crows:
            wr(buf2, cr)
        assert bytes(buf) == bytes(buf2)
        got = [[], [], []]
        used = dec(memoryview(bytes(buf)), len(rows), got)
        assert used == len(buf) and got == cols
        ref, used2 = _decode_rows(memoryview(bytes(buf)), 0,
                                  len(rows), fields)
        assert used2 == used and ref == crows

    check()
    # out-of-range wire values fail loudly, not wrap
    import pytest

    with pytest.raises(ValueError):
        _micros_to_time(-1)
    with pytest.raises(ValueError):
        _micros_to_time(86_400_000_000)


def test_time_jvm_duplex_parity(spark, tmp_path):
    """time-micros / time-millis duplex with the real Avro library."""
    import datetime as dt
    import json as _json

    from text_grabr_orc_spark.sources.avro_io import _schema_json

    jvm = spark._jvm
    fields = [
        ("tu", "timemicros", False),
        ("tm", "timemillis", True),
    ]
    rows = [
        (dt.time(12, 30, 15, 123456), dt.time(1, 2, 3, 456000)),
        (dt.time(0, 0), None),
        (dt.time(23, 59, 59, 999999), dt.time(23, 59, 59, 999000)),
    ]
    p = str(tmp_path / "py_time.avro")
    write_container(p, fields, iter(rows))
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while rdr.hasNext():
        rec = rdr.next()
        got.append((rec.get("tu"), rec.get("tm")))
    rdr.close()
    # generic reader surfaces raw wire ints: micros and millis of day
    assert got == [
        (45015123456, 3723456),
        (0, None),
        (86399999999, 86399999),
    ]
    # JVM writes both time logical types -> python reads
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        _schema_json("row", fields)
    )
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    p2 = str(tmp_path / "jvm_time.avro")
    dfw.create(schema, jvm.java.io.File(p2))
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("tu", jvm.java.lang.Long.valueOf(45015123456))
    rec.put("tm", jvm.java.lang.Integer.valueOf(3723456))
    dfw.append(rec)
    dfw.close()
    assert list(read_container(p2)) == [
        (dt.time(12, 30, 15, 123456), dt.time(1, 2, 3, 456000)),
    ]
    # schema emit carries the spec names on the spec base types
    sj = _json.loads(_schema_json("row", fields))
    assert sj["fields"][0]["type"] == {
        "type": "long", "logicalType": "time-micros"}
    assert sj["fields"][1]["type"][1] == {
        "type": "int", "logicalType": "time-millis"}


def test_time_datasource_roundtrip_and_declarations(spark, tmp_path):
    """Spark TIME columns through the datasource: a real time(6)
    column round-trips (Arrow time64[ns] exchange), a bigint
    nanos-of-day column ships as time-micros via the ``times``
    declaration (composable with ``millis`` -> time-millis), and
    declaration errors raise at plan time."""
    import datetime as dt

    import pytest

    from text_grabr_orc_spark.sources.avro_io import (
        container_fields,
        register_avro_source,
    )

    register_avro_source(spark)
    df = spark.createDataFrame(
        [(1, dt.time(12, 30, 15, 123456)), (2, dt.time(0, 0))],
        "id bigint, t time(6)",
    )
    out = tmp_path / "time_rt"
    df.coalesce(1).write.format("tgos_avro").option(
        "path", str(out)
    ).mode("append").save()
    part = next(f for f in os.listdir(out) if f.endswith(".avro"))
    assert container_fields(str(out / part)) == [
        ("id", "long", True), ("t", "timemicros", True),
    ]
    back = {
        r["id"]: r["t"]
        for r in spark.read.format("tgos_avro").option(
            "path", str(out)
        ).load().collect()
    }
    assert back == {1: dt.time(12, 30, 15, 123456), 2: dt.time(0, 0)}
    # times declaration + millis flip: nanos-of-day -> time-millis
    df2 = spark.createDataFrame(
        [(1, 45015123456000)], "id bigint, t_ns bigint"
    )
    out2 = tmp_path / "time_decl"
    df2.coalesce(1).write.format("tgos_avro").option(
        "path", str(out2)
    ).option("times", '{"t_ns": "micros"}').option(
        "millis", '["t_ns"]'
    ).mode("append").save()
    part2 = next(f for f in os.listdir(out2) if f.endswith(".avro"))
    assert container_fields(str(out2 / part2)) == [
        ("id", "long", True), ("t_ns", "timemillis", True),
    ]
    back2 = spark.read.format("tgos_avro").option(
        "path", str(out2)
    ).load().collect()
    assert back2[0]["t_ns"] == dt.time(12, 30, 15, 123000)  # truncated
    # declaration errors: wrong type, unknown column, bad unit
    df3 = spark.createDataFrame([(1, "x")], "id bigint, s string")
    for frame, opts in (
        (df3, {"times": '{"s": "micros"}',
               "path": str(tmp_path / "b1")}),
        (df2, {"times": '{"nope": "micros"}',
               "path": str(tmp_path / "b2")}),
        (df2, {"times": '{"t_ns": "seconds"}',
               "path": str(tmp_path / "b3")}),
    ):
        w = frame.write.format("tgos_avro").mode("append")
        for k, v in opts.items():
            w = w.option(k, v)
        with pytest.raises(Exception, match="times declaration"):
            w.save()


def test_time_range_guards_review_fixes(tmp_path):
    """Round-13 review: (1) out-of-range time-of-day is rejected on
    BOTH write paths (codegen for times-declared bigints, closure for
    the row fallback) and on codegen decode (the int64->time64 Arrow
    cast does not validate); (2) an invalid decimal annotation
    (missing precision) falls back to plain bytes per spec instead of
    a raw KeyError; (3) duplicate millis declarations raise clearly."""
    import json

    import pytest

    from text_grabr_orc_spark.sources import avro_codegen as cg
    from text_grabr_orc_spark.sources.avro_io import (
        _parse_schema,
        _time_to_micros,
        write_long,
    )

    # (1a) codegen encoder rejects out-of-range nanos
    enc = cg.block_encoder([("t", "timemicros", False)])
    for bad in (-1, 86_400_000_000_000):
        with pytest.raises(ValueError, match="time-of-day"):
            enc(bytearray(), [[bad]], 0, 1)
    # ...in-range still writes
    buf = bytearray()
    enc(buf, [[45015123456000]], 0, 1)
    # (1b) codegen decoder rejects an out-of-range wire value
    dec = cg.block_decoder([("t", "timemicros", False)])
    wire = bytearray()
    write_long(wire, 86_400_000_000)  # exactly 24h: invalid
    with pytest.raises(ValueError, match="time-of-day"):
        dec(memoryview(bytes(wire)), 1, [[]])
    # (1c) closure row-fallback int path rejects too
    with pytest.raises(ValueError, match="time-of-day"):
        _time_to_micros(-1)
    assert _time_to_micros(45015123456000) == 45015123456
    # (2) invalid decimal annotation -> plain bytes base (spec)
    fs = _parse_schema(json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "d", "type": {
                "type": "bytes", "logicalType": "decimal"}},
            {"name": "d2", "type": {
                "type": "bytes", "logicalType": "decimal",
                "precision": "garbage"}},
        ],
    }))
    assert fs == [("d", "bytes", False), ("d2", "bytes", False)]
    # (3) duplicate millis declaration raises clearly at plan time
    # (writer constructed directly: no session needed)
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    from text_grabr_orc_spark.sources.avro_io import (
        make_avro_datasource,
    )

    schema = StructType([
        StructField("id", LongType()),
        StructField("ts", TimestampNTZType()),
    ])
    src = make_avro_datasource()({
        "path": str(tmp_path / "dup"),
        "millis": '["ts", "ts"]',
    })
    with pytest.raises(ValueError, match="duplicate millis"):
        src.writer(schema, False)
    # membership is validated BEFORE any rewrite for both options
    for opts in ({"millis": '["nope"]'}, {"times": '{"nope": "micros"}'}):
        src2 = make_avro_datasource()(
            {"path": str(tmp_path / "nm"), **opts}
        )
        with pytest.raises(ValueError, match="no such column"):
            src2.writer(schema, False)


def test_fast_pylist_matches_to_pylist():
    """fast_pylist (the writer's Arrow->python conversion fast path,
    round-13 optimization) must be value-identical to to_pylist for
    every shape it special-cases: maps (tuple-pair lists), lists,
    structs (dicts), nulls at every level, empties, and nesting —
    plus the fall-backs (primitives, sliced arrays)."""
    import pyarrow as pa

    from text_grabr_orc_spark.sources.avro_io import fast_pylist

    cases = [
        pa.array(
            [[("a", 1), ("b", 2)], [], None, [("c", None)]],
            type=pa.map_(pa.string(), pa.int64()),
        ),
        pa.array(
            [[1.5, None], None, [], [2.5]], type=pa.list_(pa.float64())
        ),
        pa.array(
            [{"x": 1, "y": "u"}, None, {"x": None, "y": "w"}],
            type=pa.struct([("x", pa.int64()), ("y", pa.string())]),
        ),
        # nested: list<struct>, map values that are lists
        pa.array(
            [[{"k": 1}], [], None],
            type=pa.list_(pa.struct([("k", pa.int64())])),
        ),
        pa.array(
            [[("a", [1, 2])], None],
            type=pa.map_(pa.string(), pa.list_(pa.int64())),
        ),
        # primitives fall through to to_pylist
        pa.array([1, None, 3], pa.int64()),
        pa.array(["s", None], pa.string()),
    ]
    for arr in cases:
        assert fast_pylist(arr) == arr.to_pylist(), arr.type
    # sliced arrays must fall back (offsets/values ignore slices)
    sliced = cases[0].slice(1)
    assert sliced.offset != 0
    assert fast_pylist(sliced) == sliced.to_pylist()
    # empty and zero-length
    empty = pa.array([], type=pa.map_(pa.string(), pa.int64()))
    assert fast_pylist(empty) == []
