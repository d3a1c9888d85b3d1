"""Spark 4 API-surface operators: VariantType semi-structured data,
Python UDTFs, and the Python DataSource API.

These close the last API-surface rows of SURVEY.md §2b's checklist
with Spark-4-native features:

- ``events_props_variant``   semi-structured analytics through
  VariantType (``parse_json`` + ``variant_get``) instead of a typed
  ``from_json`` schema — the open-schema path for evolving event
  payloads
- ``udtf_tokenize_positions``  a Python UDTF in a LATERAL join,
  emitting (position, token) rows per document — the user-defined
  TABLE function surface (bounded input by construction: UDTFs are
  row-at-a-time Python, the documented slow path; the same result at
  corpus scale is the posexplode expression next to it)
- ``python_datasource_sequence``  a custom Python DataSource with
  explicit input partitions — the extension point for reading systems
  Spark has no connector for; here a deterministic arithmetic table
  so DuckDB can oracle it exactly

Scale notes: variant_get is a JVM expression (codegen, no Python);
the UDTF query bounds its input to a filtered slice before the
LATERAL join reaches Python; the datasource demonstrates partition
PLANNING (one InputPartition per split, read in parallel) which is
the part that matters at 100 TB — a real connector swaps the
generator body for client reads per split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_grabr_orc_spark.registry import register
from text_grabr_orc_spark.sources.events import load_events
from text_grabr_orc_spark.tables import load_table

# ---------------------------------------------------------------------------
# VariantType
# ---------------------------------------------------------------------------


@register(
    "events_props_variant",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(coalesce(sum(CAST(json_extract(props, '$.k') AS INT)), -1)
                AS BIGINT) AS sum_k,
           CAST(count(DISTINCT CAST(json_extract(props, '$.k') AS INT))
                AS BIGINT) AS n_distinct_k
    FROM events
    GROUP BY event_type
    """,
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured rollup through VariantType: ``parse_json`` the
    raw ``props`` payload into a variant, extract ``$.k`` with
    ``variant_get`` and aggregate per event type — the open-schema
    twin of events_batch.events_json_props (which uses a typed
    from_json). Variant keeps the full payload queryable when the
    schema evolves; extraction stays a JVM expression.

    Scale: parse_json/variant_get run inside codegen on the scan
    projection; the aggregate partial-combines map-side, so the
    shuffle carries one row per (event_type) per partition."""
    ev = load_events(spark, sf_dir)
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("k"), F.lit(-1)).cast("bigint").alias("sum_k"),
            F.countDistinct("k").cast("bigint").alias("n_distinct_k"),
        )
    )


# ---------------------------------------------------------------------------
# Python UDTF
# ---------------------------------------------------------------------------

#: only documents with doc_id % UDTF_MOD == 0 flow through the UDTF —
#: row-at-a-time Python is the slow path; the query exists for the
#: API surface, bounded by construction
_UDTF_MOD = 50


def _make_tokenize_udtf():
    """Build the UDTF class lazily (the decorator needs an active
    Spark context on import in some versions; keep module import
    side-effect free)."""
    from pyspark.sql.functions import udtf

    from text_grabr_orc_spark.functions.text import py_fields

    @udtf(returnType="pos: bigint, tok: string")
    class TokenizePositions:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(py_fields(text)):
                yield i, tok

    return TokenizePositions


@register(
    "udtf_tokenize_positions",
    oracle=f"""
    SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.tok
    FROM (
        SELECT doc_id,
               unnest([{{'pos': i - 1, 'tok': toks[i]}}
                       for i in range(1, len(toks) + 1)]) AS u
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(text,
                       '[\\t\\n\\x0b\\f\\r\\x{{85}}\\x{{2028}}\\x{{2029}}\\p{{Zs}}]+'),
                       t -> t <> '') AS toks
            FROM documents WHERE doc_id % {_UDTF_MOD} = 0
        )
    )
    """,
)
def udtf_tokenize_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface: a table function emitting (position,
    token) per document, applied with a LATERAL join over a bounded
    document slice. The tokenizer inside is the shared Go
    strings.Fields-parity ``py_fields`` — the same function the
    Catalyst expression path fuzz-tests against, so the UDTF and the
    native ``posexplode(tokens(..))`` provably agree.

    Scale: UDTFs are row-at-a-time Python (slower than an Arrow
    pandas UDF, far slower than builtin explode) — the right use is
    logic that genuinely needs per-row Python with table output, on
    pre-filtered slices like this one; corpus-wide tokenization stays
    on the native expression."""
    cls = _make_tokenize_udtf()
    spark.udtf.register("tgos_tokenize_positions", cls)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _UDTF_MOD == 0
    )
    docs.createOrReplaceTempView("tgos_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.tok
        FROM tgos_udtf_docs d,
             LATERAL tgos_tokenize_positions(d.text) t
        """
    )


# ---------------------------------------------------------------------------
# Python DataSource
# ---------------------------------------------------------------------------

_SEQ_ROWS = 1000
_SEQ_PARTS = 8


def _make_sequence_datasource():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _SeqReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", _SEQ_ROWS))
            self.parts = int(options.get("parts", _SEQ_PARTS))

        def partitions(self):
            # one InputPartition per contiguous id split — the planning
            # half of the connector API (executors read splits in
            # parallel; a real source returns file chunks / shards)
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            i = partition.value
            lo = i * self.n // self.parts
            hi = (i + 1) * self.n // self.parts
            for x in range(lo, hi):
                # deterministic arithmetic so DuckDB replicates exactly:
                # integer bucket + an exact-in-double ratio
                yield x, x % 7, (x * 3) % 1000 / 8.0

    class SequenceSource(DataSource):
        @classmethod
        def name(cls):
            return "tgos_sequence"

        def schema(self):
            return "id bigint, bucket int, val double"

        def reader(self, schema):
            return _SeqReader(self.options)

    return SequenceSource


@register(
    "python_datasource_sequence",
    oracle=f"""
    SELECT CAST(x % 7 AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(coalesce(sum(x), -1) AS BIGINT) AS sum_id,
           round(sum((x * 3) % 1000 / 8.0), 6) AS sum_val
    FROM (SELECT unnest(range({_SEQ_ROWS}))::BIGINT AS x)
    GROUP BY bucket
    """,
)
def python_datasource_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python DataSource API surface: a custom source with explicit
    input partitions (the batch-read connector extension point Spark 4
    exposes to Python), aggregated per bucket. The source yields a
    deterministic arithmetic table, so the oracle replicates it from
    ``range()`` — proving the partitioned reads reassemble the exact
    full dataset (no split lost, none duplicated).

    Scale: partition planning is the load-bearing half — splits read
    in parallel on executors with no driver materialization. sum_val
    sums eighths (exact in binary doubles), rounded only at the end."""
    src = _make_sequence_datasource()
    try:
        spark.dataSource.register(src)
    except Exception:
        pass  # already registered in this session
    df = (
        spark.read.format("tgos_sequence")
        .option("n", str(_SEQ_ROWS))
        .option("parts", str(_SEQ_PARTS))
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("id"), F.lit(-1)).cast("bigint").alias("sum_id"),
        F.round(F.sum("val"), 6).alias("sum_val"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4)
# ---------------------------------------------------------------------------

#: BFS depth bound for the recursive-SQL connected components. Spark's
#: recursive CTEs support UNION ALL only (no UNION dedup yet), so an
#: unbounded closure over a CYCLIC graph would never reach a fixpoint —
#: the depth bound makes termination structural. Near-dup components
#: are shallow (the iterative operator converges in 2-4 rounds); the
#: oracle below is the UNBOUNDED DuckDB closure, so a pass proves the
#: bound covers every real component diameter.
_RCTE_DEPTH = 6

#: Spark SQL fragment: exact pair cosine over double-widened arrays —
#: the SQL twin of functions.vectors (sequential aggregate sum)
_SQL_COS = """
    aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
    / (sqrt(aggregate({a}, 0D, (acc, x) -> acc + x * x))
       * sqrt(aggregate({b}, 0D, (acc, x) -> acc + x * x)))
"""


@register(
    "dedup_clusters_rsql",
    oracle="""
    WITH RECURSIVE v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ), p AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.e, b.e) /
              (sqrt(list_dot_product(a.e, a.e)) *
               sqrt(list_dot_product(b.e, b.e))) >= 0.4
    ), e AS (
        SELECT vec_a AS s, vec_b AS d FROM p
        UNION
        SELECT vec_b, vec_a FROM p
    ), r(n, l) AS (
        SELECT DISTINCT s, s FROM e
        UNION
        SELECT e.s, r.l FROM e JOIN r ON r.n = e.d
    )
    SELECT n AS node_id, min(l) AS cluster_id FROM r GROUP BY n
    """,
)
def dedup_clusters_rsql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters via Spark 4's recursive CTEs: the same
    connected components as ``dedup_clusters`` expressed as ONE SQL
    statement — min-label BFS where the recursive member expands each
    label one hop per level, bounded at depth ``_RCTE_DEPTH`` (Spark
    recursion is UNION ALL-only, so cycles require a structural
    bound). CORRECTNESS CONTRACT: the result is only correct for
    components whose min-label radius is <= ``_RCTE_DEPTH``; a deeper
    component would be SILENTLY split, not error. Two guards keep that
    honest: the DuckDB oracle runs the UNBOUNDED closure (so the
    driver gate fails loudly if the fixture ever outgrows the bound),
    and ``test_rsql_clusters_fixpoint`` asserts post-hoc that no node
    keeps a smaller-labeled neighbor. ``min(l)`` per node collapses
    the path explosion.

    Scale: each recursion level is one shuffle join of the frontier
    against the edge list — the same per-round cost as the iterative
    DataFrame loop, with the loop driven by the engine instead of the
    driver. The path-counting blowup of UNION ALL recursion is real
    on dense components: for those the iterative operator (or
    small-star/large-star) is the production path; this one is the
    declarative-surface twin."""
    from text_grabr_orc_spark.operators.dedup import _gemm_pairs_cached

    # materialize the pair graph ONCE — the recursive member re-reads
    # its inputs at every level, and re-running the all-pairs cosine
    # per level would multiply the dominant cost by the depth; the
    # cached set is also shared with the rest of the graph family.
    # localCheckpoint truncates the GEMM lineage BEFORE the view is
    # registered: the recursive member re-references the view per
    # level, so an un-truncated lineage multiplies into the analyzed
    # plan (150k chars / 66 FlatMapGroupsInPandas, round-12 verdict
    # #2 — driver-side planning cost only; same device the triangle
    # and LPA consumers use in operators/dedup.py).
    pairs = _gemm_pairs_cached(spark, sf_dir).localCheckpoint()
    pairs.createOrReplaceTempView("tgos_rsql_pairs")
    return spark.sql(
        f"""
        WITH RECURSIVE e AS (
            SELECT vec_a AS s, vec_b AS d FROM tgos_rsql_pairs
            UNION
            SELECT vec_b, vec_a FROM tgos_rsql_pairs
        ), r(n, l, depth) AS (
            SELECT DISTINCT s, s, 0 FROM e
            UNION ALL
            SELECT e.s, r.l, r.depth + 1
            FROM e JOIN r ON r.n = e.d
            WHERE r.depth < {_RCTE_DEPTH} AND r.l < e.s
        )
        SELECT n AS node_id, min(l) AS cluster_id FROM r GROUP BY n
        """
    )


# ---------------------------------------------------------------------------
# Arrow-optimized scalar Python UDF
# ---------------------------------------------------------------------------


@register(
    "arrow_udf_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(text,
               '[\\t\\n\\x0b\\f\\r\\x{{85}}\\x{{2028}}\\x{{2029}}\\p{{Zs}}]+'),
               t -> t <> '')) AS BIGINT) AS n_tokens,
           CAST(len(text) AS BIGINT) AS n_chars
    FROM documents WHERE doc_id % {_UDTF_MOD} = 0
    """,
)
def arrow_udf_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (``udf(..., useArrow=True)``)
    — the third Python execution flavor next to pandas UDFs (Arrow
    batches, scalar Python semantics, no pandas dependency in the
    function body). Same bounded-slice device as the UDTF query:
    row-at-a-time Python never runs corpus-wide; the fuzz-shared
    ``py_fields`` tokenizer guarantees the count agrees with the
    Catalyst expression path."""
    from pyspark.sql.functions import udf

    from text_grabr_orc_spark.functions.text import py_field_count

    count_udf = udf(
        lambda s: 0 if s is None else py_field_count(s),
        "bigint",
        useArrow=True,
    )
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _UDTF_MOD == 0
    )
    return docs.select(
        "doc_id",
        count_udf("text").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# mapInArrow (PyArrow-native batch map, no pandas materialization)
# ---------------------------------------------------------------------------


@register(
    "arrow_native_doc_stats",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(length(text) AS BIGINT) AS n_codepoints,
           CAST(CASE WHEN octet_length(encode(text)) = length(text)
                     THEN 1 ELSE 0 END AS BIGINT) AS is_ascii
    FROM documents
    """,
)
def arrow_native_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` surface — the fourth Python batch-execution
    flavor (next to mapInPandas / applyInPandas / UDTF): the function
    receives raw ``pyarrow.RecordBatch``es and computes entirely with
    Arrow compute kernels — no pandas materialization, no Python
    per-row code, zero-copy in and out. Byte-vs-codepoint length (and
    the derived is_ascii flag) exercises Arrow's binary and utf8
    kernels on the same column.

    Scale: the narrowest possible Python boundary — vectorized C++
    kernels under a thin Arrow shim; batch size bounded by
    maxRecordsPerBatch. Used where the logic is already expressed
    against the Arrow type system (feature extraction libraries,
    tensor interchange)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            n_bytes = pc.binary_length(pc.cast(text, pa.binary()))
            n_cp = pc.utf8_length(text)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(n_bytes, pa.int64()),
                    pc.cast(n_cp, pa.int64()),
                    pc.cast(pc.equal(n_bytes, n_cp), pa.int64()),
                ],
                ["doc_id", "n_bytes", "n_codepoints", "is_ascii"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        stats,
        "doc_id bigint, n_bytes bigint, n_codepoints bigint, is_ascii bigint",
    )


# ---------------------------------------------------------------------------
# pandas API on Spark (pyspark.pandas)
# ---------------------------------------------------------------------------


@register(
    "ps_api_event_value_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS sum_value,
           round(CAST(max(value) AS DOUBLE), 6) AS max_value
    FROM events GROUP BY event_type
    """,
)
def ps_api_event_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-API-on-Spark surface (``pyspark.pandas``): the same
    per-type rollup written as idiomatic pandas — groupby/agg on a
    ps.DataFrame — compiling down to the identical Catalyst aggregate
    plan as the DataFrame version (to_spark() returns the plan, not a
    materialization). This is the migration surface for pandas
    codebases: same source text, distributed execution.

    The sum rides a DECIMAL cast injected before the groupby so the
    money total stays order-independent — the pandas API composes
    with Spark-typed columns exactly because nothing ever leaves the
    JVM plan."""
    import pyspark.pandas as ps

    from text_grabr_orc_spark.sources.events import load_events

    sdf = load_events(spark, sf_dir).select(
        "event_type",
        "value",
        F.expr("CAST(value AS DECIMAL(18,2))").alias("value_dec"),
    )
    pdf = sdf.pandas_api()
    g = pdf.groupby("event_type").agg(
        n=("value", "count"), sum_dec=("value_dec", "sum"), mx=("value", "max")
    )
    out = g.reset_index().to_spark()
    return out.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("sum_dec").cast("double"), 2).alias("sum_value"),
        F.round(F.col("mx").cast("double"), 6).alias("max_value"),
    )


# ---------------------------------------------------------------------------
# SQL session variables + parameterized SQL (Spark 4 surface)
# ---------------------------------------------------------------------------


@register(
    "sql_variables_param_query",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0)
                AS DOUBLE) AS revenue
    FROM orders
    WHERE o_totalprice > 150000.0
      AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_variables_param_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (DECLARE/SET VARIABLE) + parameterized
    ``spark.sql`` with named parameter markers — the Spark 4 textual
    surface for reusable, injection-safe query templates (the
    parameter marker is a true literal in the plan, so Catalyst
    constant-folds and PUSHES IT DOWN like any constant — asserted in
    the plan test; string-concatenated SQL can't promise either).
    The threshold rides a session variable read via
    ``system.session.threshold``; the status filter arrives as a
    named parameter."""
    from text_grabr_orc_spark.tables import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "tgos_param_orders"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE threshold DOUBLE DEFAULT 0.0")
    spark.sql("SET VARIABLE threshold = 150000.0")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0)
                    AS DOUBLE) AS revenue
        FROM tgos_param_orders
        WHERE o_totalprice > system.session.threshold
          AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"status": "O"},
    )


# ---------------------------------------------------------------------------
# Python STREAMING DataSource (SimpleDataSourceStreamReader)
# ---------------------------------------------------------------------------

#: rows emitted per micro-batch by the streaming sequence source.
_SEQ_STREAM_STEP = 128


def _make_sequence_stream_source():
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class _SeqStreamReader(SimpleDataSourceStreamReader):
        """Offset-tracked finite arithmetic stream: each micro-batch
        advances the offset by STEP until n rows have been emitted,
        after which read() reports no progress (same offset back) —
        which is what lets processAllAvailable() detect catch-up.
        readBetweenOffsets replays any committed range exactly, the
        contract that makes recovery exactly-once."""

        def __init__(self, options):
            self.n = int(options.get("n", _SEQ_ROWS))

        def initialOffset(self):
            return {"pos": 0}

        def _rows(self, lo, hi):
            return iter(
                [(x, x % 7, (x * 3) % 1000 / 8.0) for x in range(lo, hi)]
            )

        def read(self, start):
            lo = int(start["pos"])
            hi = min(lo + _SEQ_STREAM_STEP, self.n)
            return (self._rows(lo, hi), {"pos": hi})

        def readBetweenOffsets(self, start, end):
            return self._rows(int(start["pos"]), int(end["pos"]))

    class SequenceStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "tgos_sequence_stream"

        def schema(self):
            return "id bigint, bucket int, val double"

        def simpleStreamReader(self, schema):
            return _SeqStreamReader(self.options)

    return SequenceStreamSource


@register(
    "python_datasource_stream",
    oracle=f"""
    SELECT CAST(x % 7 AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(coalesce(sum(x), -1) AS BIGINT) AS sum_id,
           round(sum((x * 3) % 1000 / 8.0), 6) AS sum_val
    FROM (SELECT unnest(range({_SEQ_ROWS}))::BIGINT AS x)
    GROUP BY bucket
    """,
)
def python_datasource_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python STREAMING DataSource surface (Spark 4's
    SimpleDataSourceStreamReader): the custom-connector extension
    point for streams — driver-side offset management (initialOffset
    / read / readBetweenOffsets), micro-batch chunking, exactly-once
    replay of committed ranges. The source streams the same
    deterministic arithmetic table as the batch connector next door,
    in {step}-row micro-batches into an append-mode memory sink; the
    oracle replicates the full table from range(), so a hash match
    proves no batch was lost, duplicated, or re-chunked wrongly
    across the offset log.

    Scale note: the simple reader API reads on the DRIVER (prototype
    connectors, control planes); the partitioned streamReader API
    hands splits to executors for data-plane volumes — the batch
    sibling demonstrates that planning half."""
    import os
    import tempfile
    import time

    src = _make_sequence_stream_source()
    try:
        spark.dataSource.register(src)
    except Exception:
        pass  # already registered in this session
    df = (
        spark.readStream.format("tgos_sequence_stream")
        .option("n", str(_SEQ_ROWS))
        .load()
    )
    name = f"tgos_seqstream_{int(time.time() * 1000) % 10**9}"
    cp = tempfile.mkdtemp(prefix="tgos_seqstream_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(cp, "cp"))
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.table(name).count() >= _SEQ_ROWS:
                break
            time.sleep(0.2)
    finally:
        q.stop()
    return spark.table(name).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("id"), F.lit(-1)).cast("bigint").alias("sum_id"),
        F.round(F.sum("val"), 6).alias("sum_val"),
    )


python_datasource_stream.__doc__ = python_datasource_stream.__doc__.format(
    step=_SEQ_STREAM_STEP
)


# ---------------------------------------------------------------------------
# Python DataSource WRITER (the sink half of the connector API)
# ---------------------------------------------------------------------------

_PDW_KNUTH = 2654435761
_PDW_MOD = 4294967296


def _make_jsonl_sink_datasource():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _Commit(WriterCommitMessage):
        def __init__(self, part_id, n_rows, key_sum):
            self.part_id = part_id
            self.n_rows = n_rows
            self.key_sum = key_sum

    class _JsonlWriter(DataSourceWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, rows):
            import json as _json
            import os as _os

            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            _os.makedirs(self.path, exist_ok=True)
            n, ks = 0, 0
            # tmp-then-rename so a retried task never leaves a torn file
            tmp = _os.path.join(self.path, f".part-{pid}.jsonl.tmp")
            with open(tmp, "w") as f:
                for r in rows:
                    f.write(
                        _json.dumps(
                            {"doc_id": r["doc_id"], "n_chars": r["n_chars"]}
                        )
                        + "\n"
                    )
                    n += 1
                    ks += r["doc_id"] * _PDW_KNUTH % _PDW_MOD
            _os.replace(tmp, _os.path.join(self.path, f"part-{pid}.jsonl"))
            return _Commit(pid, n, ks)

        def commit(self, messages):
            import json as _json
            import os as _os

            manifest = {
                "n_tasks": len(messages),
                "n_rows": sum(m.n_rows for m in messages),
                "key_checksum": sum(m.key_sum for m in messages),
                "shards": sorted(
                    [m.part_id, m.n_rows, m.key_sum] for m in messages
                ),
            }
            with open(_os.path.join(self.path, "manifest.json"), "w") as f:
                _json.dump(manifest, f)

        def abort(self, messages):
            pass

    class JsonlSink(DataSource):
        @classmethod
        def name(cls):
            return "tgos_jsonl_sink"

        def writer(self, schema, overwrite):
            return _JsonlWriter(self.options)

    return JsonlSink


_PDW_PARTS = 8


@register(
    "python_datasource_writer",
    oracle=f"""
    SELECT CAST({_PDW_PARTS} AS BIGINT) AS n_tasks,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(doc_id * {_PDW_KNUTH} % {_PDW_MOD}) AS BIGINT)
               AS key_checksum,
           CAST(count(*) AS BIGINT) AS jsonl_rows,
           CAST(sum(n_chars) AS BIGINT) AS jsonl_chars
    FROM documents
    """,
)
def python_datasource_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITER half of the Python DataSource API (the batch-sink
    connector extension point — ``python_datasource_sequence`` and
    ``python_datasource_stream`` cover the two read halves): the
    documents table written through a custom JSONL sink whose tasks
    each emit a WriterCommitMessage (rows + Knuth-hash key checksum)
    and whose driver-side commit() writes a shard manifest — the
    exporter-with-integrity-manifest shape of
    ``shard_export_manifest``, implemented AS a connector. Task
    writes are tmp-then-rename so a retried task can't leave a torn
    shard, and commit() only sees messages from successful tasks —
    the exactly-once contract of the V2 write path.

    The registered result re-reads what was WRITTEN: manifest totals
    (n_tasks/n_rows/key_checksum from commit messages) joined with a
    re-aggregation of the JSONL files themselves via spark.read.json
    — the oracle computes the same numbers straight from documents,
    so a green hash proves no row was lost, duplicated, or torn
    between writer tasks, commit protocol, and on-disk bytes.

    Scale: each task streams its partition to its own shard file —
    no driver materialization; the manifest is #tasks-sized. The
    checksum sums exact int64s (order-free)."""
    import json as _json
    import os as _os
    import tempfile as _tempfile

    src = _make_jsonl_sink_datasource()
    try:
        spark.dataSource.register(src)
    except Exception:
        pass  # already registered in this session
    out = _tempfile.mkdtemp(prefix="tgos_pdw_")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    (
        docs.repartition(_PDW_PARTS, "doc_id")
        .write.format("tgos_jsonl_sink")
        .mode("append")
        .option("path", out)
        .save()
    )
    with open(_os.path.join(out, "manifest.json")) as f:
        man = _json.load(f)
    manifest = spark.createDataFrame(
        [
            (
                int(man["n_tasks"]),
                int(man["n_rows"]),
                int(man["key_checksum"]),
            )
        ],
        "n_tasks bigint, n_rows bigint, key_checksum bigint",
    )
    back = spark.read.json(_os.path.join(out, "part-*.jsonl"))
    re_agg = back.agg(
        F.count(F.lit(1)).cast("bigint").alias("jsonl_rows"),
        F.sum("n_chars").cast("bigint").alias("jsonl_chars"),
    )
    return manifest.crossJoin(re_agg)
