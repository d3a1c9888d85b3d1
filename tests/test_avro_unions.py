"""Multi-branch Avro unions as one-hot structs (the spark-avro
complex-union convention): schema parse and re-emission, closure and
source-generated codec duplex, skip-projection, the writer ``unions``
declaration through the Spark DataSource, JVM duplex parity both
directions, and the error paths (two members set, null without a null
branch, out-of-range branch index)."""

from __future__ import annotations

import json
import os

import pytest

from text_grabr_orc_spark.sources.avro_io import (
    _ddl_of,
    _parse_schema,
    _schema_json,
    _token_valid,
    read_container,
    write_container,
)

UNION = ("union", ("string", "long"), 0)
FIELDS = [("id", "long", False), ("u", UNION, False)]
ROWS = [(1, ("hello", None)), (2, None), (3, (None, 42))]


def test_union_token_parse_ddl_and_reemission():
    sj = _schema_json("row", FIELDS)
    assert json.loads(sj)["fields"][1]["type"] == ["null", "string", "long"]
    assert _parse_schema(sj) == FIELDS
    assert _ddl_of(UNION) == "struct<member0:string,member1:bigint>"
    # null in a non-first position survives the round trip
    mid = ("union", ("string", "long"), 1)
    sj2 = _schema_json("row", [("u", mid, False)])
    assert json.loads(sj2)["fields"][0]["type"] == ["string", "null", "long"]
    assert _parse_schema(sj2) == [("u", mid, False)]
    # no null branch at all
    non = ("union", ("string", "long", "double"), -1)
    sj3 = _schema_json("row", [("u", non, False)])
    assert json.loads(sj3)["fields"][0]["type"] == [
        "string", "long", "double",
    ]
    assert _parse_schema(sj3) == [("u", non, False)]
    assert _token_valid(UNION) and _token_valid(non)
    # unions may not immediately contain unions (spec)
    assert not _token_valid(("union", (UNION, "long"), -1))


def test_union_row_codec_roundtrip(tmp_path):
    p = str(tmp_path / "u.avro")
    write_container(p, FIELDS, iter(ROWS))
    assert list(read_container(p)) == ROWS


def test_union_without_null_branch(tmp_path):
    fields = [("u", ("union", ("string", "long", "double"), -1), False)]
    rows = [(("a", None, None),), ((None, 7, None),), ((None, None, 1.5),)]
    p = str(tmp_path / "u3.avro")
    write_container(p, fields, iter(rows))
    assert list(read_container(p)) == rows
    with pytest.raises(ValueError, match="no null branch"):
        write_container(str(tmp_path / "bad.avro"), fields, iter([(None,)]))


def test_union_write_rejects_multi_member(tmp_path):
    with pytest.raises(ValueError, match="exactly one member"):
        write_container(
            str(tmp_path / "bad.avro"), FIELDS, iter([(1, ("x", 5))])
        )


def test_union_codegen_duplex_and_skip():
    from text_grabr_orc_spark.sources.avro_codegen import (
        block_decoder,
        block_encoder,
        resolved_block_decoder,
    )

    enc = block_encoder(FIELDS)
    buf = bytearray()
    # Arrow to_pylist hands structs over as dicts
    enc(buf, [
        [1, 2, 3],
        [{"member0": "hello", "member1": None}, None,
         {"member0": None, "member1": 42}],
    ], 0, 3)
    dec = block_decoder(FIELDS)
    cols = [[], []]
    assert dec(memoryview(bytes(buf)), 3, cols) == len(buf)
    assert cols == [[1, 2, 3], [("hello", None), None, (None, 42)]]
    # skip-projection prunes past the union without materializing it
    rdec = resolved_block_decoder(FIELDS, [("id", "long", False)])
    only_id = [[]]
    assert rdec(memoryview(bytes(buf)), 3, only_id) == len(buf)
    assert only_id == [[1, 2, 3]]
    # corrupt branch index raises in the generated decoder too
    bad = bytearray()
    from text_grabr_orc_spark.sources.avro_io import write_long

    write_long(bad, 1)
    write_long(bad, 9)  # branch 9 of 3
    with pytest.raises(ValueError, match="out of range"):
        dec(memoryview(bytes(bad)), 1, [[], []])


def test_union_closure_reader_rejects_bad_branch():
    from text_grabr_orc_spark.sources.avro_io import (
        _compile_reader,
        write_long,
    )

    rd = _compile_reader(UNION)
    bad = bytearray()
    write_long(bad, 7)
    with pytest.raises(ValueError, match="out of range"):
        rd(memoryview(bytes(bad)), 0)


def test_union_datasource_declaration_end_to_end(spark, tmp_path):
    """Spark writes a struct column as a REAL Avro union via the
    ``unions`` declaration; reading back restores the one-hot struct
    with the null branch as a NULL struct."""
    from pyspark.sql import functions as F

    from text_grabr_orc_spark.sources.avro_io import (
        register_avro_source,
    )

    register_avro_source(spark)
    df = spark.range(90).select(
        F.col("id"),
        F.when(
            F.col("id") % 3 < 2,
            F.struct(
                F.when(
                    F.col("id") % 3 == 0,
                    F.concat(F.lit("doc-"), F.col("id")),
                ).alias("member0"),
                F.when(F.col("id") % 3 == 1, F.col("id") * 10)
                .alias("member1"),
            ),
        ).alias("u"),
    )
    out = str(tmp_path / "uds")
    df.write.format("tgos_avro").option("path", out).option(
        "unions", json.dumps(["u"])
    ).mode("overwrite").save()
    back = spark.read.format("tgos_avro").option("path", out).load()
    assert back.schema["u"].dataType.simpleString() == (
        "struct<member0:string,member1:bigint>"
    )
    got = {r["id"]: (None if r["u"] is None
                     else (r["u"]["member0"], r["u"]["member1"]))
           for r in back.collect()}
    for i in range(90):
        want = (f"doc-{i}", None) if i % 3 == 0 else \
            (None, i * 10) if i % 3 == 1 else None
        assert got[i] == want, i
    # declaration errors are loud
    with pytest.raises(Exception, match="no such column"):
        df.write.format("tgos_avro").option(
            "path", str(tmp_path / "x")
        ).option("unions", json.dumps(["nope"])).mode("append").save()
    with pytest.raises(Exception, match="struct"):
        df.select("id").write.format("tgos_avro").option(
            "path", str(tmp_path / "y")
        ).option("unions", json.dumps(["id"])).mode("append").save()


def test_union_jvm_duplex_parity(spark, tmp_path):
    """Python-written union containers read by the real Avro library,
    and JVM-written multi-branch unions (including a record branch)
    read back here as one-hot structs — full duplex."""
    jvm = spark._jvm
    p = str(tmp_path / "py_union.avro")
    write_container(p, FIELDS, iter(ROWS))
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    sch = json.loads(str(rdr.getSchema()))
    assert sch["fields"][1]["type"] == ["null", "string", "long"]
    got = []
    while rdr.hasNext():
        rec = rdr.next()
        u = rec.get("u")
        got.append((rec.get("id"), None if u is None else
                    (str(u), None) if not isinstance(u, int)
                    else (None, u)))
    rdr.close()
    assert got == ROWS
    # JVM writes ["null","string",{"type":"record",...}] -> we read
    schema_json = json.dumps({
        "type": "record", "name": "row", "fields": [
            {"name": "id", "type": "long"},
            {"name": "u", "type": ["null", "string", {
                "type": "record", "name": "pt", "fields": [
                    {"name": "x", "type": "long"},
                    {"name": "y", "type": "double"},
                ]}]},
        ]})
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    p2 = str(tmp_path / "jvm_union.avro")
    dfw.create(schema, jvm.java.io.File(p2))
    usch = schema.getField("u").schema()
    for i in range(30):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", jvm.java.lang.Long.valueOf(i))
        if i % 3 == 0:
            rec.put("u", f"s{i}")
        elif i % 3 == 1:
            sub = jvm.org.apache.avro.generic.GenericData.Record(
                usch.getTypes().get(2)
            )
            sub.put("x", jvm.java.lang.Long.valueOf(i))
            sub.put("y", jvm.java.lang.Double.valueOf(i / 2.0))
            rec.put("u", sub)
        dfw.append(rec)
    dfw.close()
    rows = list(read_container(p2))
    for i in range(30):
        rid, u = rows[i]
        assert rid == i
        if i % 3 == 0:
            assert u == (f"s{i}", None)
        elif i % 3 == 1:
            assert u == (None, (i, i / 2.0))
        else:
            assert u is None


def test_union_declaration_validates_member_names_and_types():
    """Round-13 review: the encoders map member values by the
    member0..N names, so the declaration must reject other names at
    PLAN time (not KeyError mid-task), and the spec's union
    uniqueness rule (one schema per wire type) must fail the plan
    before the JVM parser rejects the written file."""
    from text_grabr_orc_spark.sources.avro_io import _union_token_of

    with pytest.raises(ValueError, match="member0"):
        _union_token_of("u", [("s", "string", True), ("n", "long", True)])
    with pytest.raises(ValueError, match="in order"):
        _union_token_of(
            "u", [("member1", "string", True), ("member0", "long", True)]
        )
    with pytest.raises(ValueError, match="wire type"):
        _union_token_of(
            "u",
            [("member0", "string", True), ("member1", "string", True)],
        )
    # logical types do NOT distinguish: timestamp + long both wire long
    with pytest.raises(ValueError, match="wire type"):
        _union_token_of(
            "u",
            [("member0", "tsmicros", True), ("member1", "long", True)],
        )
    ok = _union_token_of(
        "u", [("member0", "string", True), ("member1", "long", True)]
    )
    assert ok == ("union", ("string", "long"), 0)


def test_union_closure_writer_accepts_one_hot_dicts(tmp_path):
    """Round-13 review: tuple(dict) silently encoded the KEY strings;
    dict values must map by member name like the record writer."""
    p = str(tmp_path / "d.avro")
    write_container(
        p, FIELDS,
        iter([(1, {"member0": "x", "member1": None}),
              (2, {"member1": 42}), (3, None)]),
    )
    assert list(read_container(p)) == [
        (1, ("x", None)), (2, (None, 42)), (3, None)
    ]


def test_union_inside_array_rejected_at_write(tmp_path):
    """Union-typed array items are excluded (docstring); the writer
    must fail fast instead of emitting a self-unreadable file."""
    fields = [("a", ("arr", UNION, False), False)]
    with pytest.raises(ValueError, match="unsupported"):
        write_container(
            str(tmp_path / "x.avro"), fields, iter([([("s", None)],)])
        )


def test_union_skip_raises_on_corrupt_branch():
    """Round-13 review: a corrupt branch index in a PROJECTED-AWAY
    union column must raise, not skip zero bytes and desync the
    stream into silently wrong values for other columns."""
    from text_grabr_orc_spark.sources.avro_codegen import (
        block_encoder,
        resolved_block_decoder,
    )
    from text_grabr_orc_spark.sources.avro_io import write_long

    fields = [("u", UNION, False), ("id", "long", False)]
    enc = block_encoder(fields)
    good = bytearray()
    enc(good, [[{"member0": "x", "member1": None}], [7]], 0, 1)
    rdec = resolved_block_decoder(fields, [("id", "long", False)])
    cols = [[]]
    assert rdec(memoryview(bytes(good)), 1, cols) == len(good)
    assert cols == [[7]]
    bad = bytearray()
    write_long(bad, 9)  # union branch 9 of 3
    write_long(bad, 7)
    with pytest.raises(ValueError, match="out of range"):
        rdec(memoryview(bytes(bad)), 1, [[]])


def test_union_temporal_member_hydrates(tmp_path):
    """A timestamp member inside a union re-hydrates to a datetime on
    the row exchange (the _hydrator recursion covers unions)."""
    import datetime

    from text_grabr_orc_spark.sources.avro_io import _hydrator

    tok = ("union", ("tsmicros", "long"), 0)
    hy = _hydrator(tok)
    assert hy is not None
    out = hy((1_700_000_000_000_000, None))
    assert isinstance(out[0], datetime.datetime)
    assert _hydrator(("union", ("string", "long"), 0)) is None
