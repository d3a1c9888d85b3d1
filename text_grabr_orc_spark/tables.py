"""Loaders for the driver fixture tables (see FIXTURES.md / TESTDATA.md).

Ten parquet tables per scale-factor directory. Loading goes straight
through ``spark.read.parquet`` so Catalyst gets native scans with
predicate pushdown and column pruning — no custom source needed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at ANY scale factor —
#: region/nation are bounded by geography (5/25 rows at every sf).
BROADCAST_TABLES = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (native parquet scan)."""
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all fixture tables keyed by name."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def cache_tag(sf_dir: str) -> str:
    """Cache-directory tag for derived /tmp artifacts: the sf path
    plus a fingerprint of every source table's (mtime, size). Derived
    caches (CSV/JSON/XML round-trips, sorted layouts, ...) are guarded
    by a does-it-exist check — keying them by fixture CONTENT means a
    regenerated testdata directory invalidates them automatically
    instead of silently serving rows from the previous fixture
    generation."""
    import hashlib

    base = sf_dir.strip("/").replace("/", "_")
    h = hashlib.sha256()
    for name in TABLE_NAMES:
        p = table_path(sf_dir, name)
        try:
            st = os.stat(p)
            h.update(f"{name}:{st.st_mtime_ns}:{st.st_size};".encode())
        except OSError:
            h.update(f"{name}:absent;".encode())
    return f"{base}-{h.hexdigest()[:12]}"


def published_cache_dir(
    family: str,
    sf_dir: str,
    build,
    marker: str = "_SUCCESS",
) -> str:
    """Atomically published, content-addressed /tmp cache directory.

    Replaces the old check-then-act guard (``if not exists(_SUCCESS):
    write.mode("overwrite")``) which raced: two concurrent runs (e.g.
    parallel --exact and --vanilla sweeps, or two users on one host)
    could interleave so one process read a directory the other was
    mid-overwrite — partial scans or poisoned state.

    Protocol (single-writer-wins, lock-free):

    - The parent dir carries the caller's uid (``tgos_x-1000``) so
      users on a shared host never share (or can poison) state.
    - ``build(tmp_path)`` writes into a UNIQUE scratch dir
      (pid + random suffix) that no other process knows about.
    - The scratch dir is published with ``os.rename`` — atomic on
      POSIX — so the final path either does not exist or is COMPLETE
      (its marker was written before the rename). Readers can never
      observe a partial directory, and published dirs are immutable:
      content changes alter ``cache_tag`` and land at a NEW path, so
      no re-verification after read is needed.
    - Losing a publish race (rename onto an existing complete dir
      fails) just discards the duplicate scratch build.

    ``marker`` is the completeness sentinel relative to the dir
    (multi-write builds use a last-write marker like ``v2/_SUCCESS``).
    """
    import shutil
    import tempfile
    import uuid

    uid = os.getuid() if hasattr(os, "getuid") else 0
    base = os.path.join(tempfile.gettempdir(), f"{family}-{uid}")
    final = os.path.join(base, cache_tag(sf_dir))
    marker_path = os.path.join(final, marker)
    if os.path.exists(marker_path):
        return final
    os.makedirs(base, exist_ok=True)
    tmp = os.path.join(
        base, f".build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    )
    try:
        build(tmp)
    except BaseException:
        # a failed build (OOM, disk full) must not leak a
        # multi-gigabyte half-written scratch tree under /tmp
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    if not os.path.exists(os.path.join(tmp, marker)):
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"cache build for {family} left no {marker} marker"
        )
    try:
        os.rename(tmp, final)
    except OSError:
        if os.path.exists(marker_path):
            # lost the race to another COMPLETE publish — use theirs
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            # stale/partial occupant (crashed pre-atomic-era run):
            # move it aside, then publish ours
            aside = f"{final}.stale-{os.getpid()}-{uuid.uuid4().hex[:8]}"
            try:
                os.rename(final, aside)
            except OSError:
                pass
            try:
                os.rename(tmp, final)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(aside, ignore_errors=True)
    # every path above must leave a COMPLETE dir at `final`; if the
    # race handling lost both renames (concurrent stale-handlers, or
    # an unexpected OSError like EXDEV) a caller would otherwise scan
    # a partial/stale directory this function just promised is
    # complete (round-7 advice)
    if not os.path.exists(marker_path):
        raise RuntimeError(
            f"cache publish for {family} left no {marker} marker at"
            f" {final}; retry the build"
        )
    return final
