"""File writers — K1-K4 in SURVEY.md §2.1.

The reference's ``COPY view TO path (FORMAT ...)`` always produces a single
file (reference: backend/services/duckdb_engine.py:184-191). Distributed
writes produce a directory of part files — the correct shape at scale — so
single-file output is an explicit compat option that coalesces to one
partition and renames the lone part file. Never use ``single_file`` for big
data; it serializes the write through one task.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame

_EXT = {"csv": "csv", "json": "json", "parquet": "parquet"}


def write_file(
    df: DataFrame,
    path: str,
    file_format: str | None = None,
    mode: str = "overwrite",
    single_file: bool = False,
    partition_by: list[str] | str | None = None,
    **options,
) -> str:
    """Write ``df`` to ``path``; returns the written path.

    Unknown formats default to csv, matching duckdb_engine.py:190-191.
    CSV writes include a header like the reference's ``HEADER`` flag.
    ``partition_by`` lays the output out hive-style (one directory per
    value) — the knob that turns downstream filters on those columns into
    partition pruning; incompatible with ``single_file``.
    """
    from etl_mark1_spark.sources.readers import detect_format

    fmt = (file_format or detect_format(path)).lower()
    if fmt not in _EXT:
        fmt = "csv"

    if single_file:
        if partition_by:
            raise ValueError("partition_by and single_file are exclusive")
        return _write_single_file(df, path, fmt, mode=mode, **options)

    writer = df.write.mode(mode).options(**options)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        writer = writer.partitionBy(*cols)
    if fmt == "csv":
        writer = writer.option("header", True)
    getattr(writer, fmt)(path)
    return path


def _write_single_file(df: DataFrame, path: str, fmt: str,
                       mode: str = "overwrite", **options) -> str:
    """K1 single-file semantics: coalesce(1) into a temp dir, move the part
    file to ``path``. Compat-only — one task does the whole write.

    ``mode`` is honored against the DESTINATION file: ``error`` raises if it
    exists, ``ignore`` returns without writing, ``append`` is rejected (a
    single target file can't be appended to transactionally — use a
    directory write for append semantics)."""
    if mode == "append":
        raise ValueError(
            "mode='append' is not supported with single_file=True; "
            "use a directory write for append semantics")
    if os.path.exists(path):
        if mode in ("error", "errorifexists"):
            raise FileExistsError(f"destination exists: {path}")
        if mode == "ignore":
            return path
    tmp_dir = tempfile.mkdtemp(prefix="etl_mark1_write_")
    try:
        out_dir = os.path.join(tmp_dir, "out")
        writer = df.coalesce(1).write.mode("overwrite").options(**options)
        if fmt == "csv":
            writer = writer.option("header", True)
        getattr(writer, fmt)(out_dir)
        part = glob.glob(os.path.join(out_dir, f"part-*.{_EXT[fmt]}")) or glob.glob(
            os.path.join(out_dir, "part-*")
        )
        if not part:
            raise FileNotFoundError(f"no part file produced under {out_dir}")
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        shutil.move(part[0], path)
        return path
    finally:
        shutil.rmtree(tmp_dir, ignore_errors=True)


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "overwrite",
               **options) -> None:
    """K5/K9 — JDBC sink (reference: builtin.py:175-183 round-trips through a
    DuckDB mysql extension; here it's a straight distributed JDBC write).
    Use ``batchsize`` and ``numPartitions`` options to bound connection count
    at scale."""
    df.write.mode(mode).format("jdbc").option("url", url).option(
        "dbtable", table
    ).options(**options).save()


def backfill_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str] | str,
    file_format: str = "parquet",
    **options,
) -> str:
    """Idempotent partition backfill: overwrite ONLY the hive partitions
    present in ``df``, leaving every other partition untouched.

    This is the rerun-safe shape for incremental pipelines: reprocessing
    one day replaces exactly that day's directory — a plain overwrite
    would truncate the whole table, append would duplicate the rerun.
    Implemented with Spark's dynamic partition-overwrite mode, scoped to
    this write and restored after (session-level INSERT OVERWRITE
    semantics shouldn't leak to other writers)."""
    cols = [partition_by] if isinstance(partition_by, str) else partition_by
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        (df.write.mode("overwrite").options(**options)
         .partitionBy(*cols).format(file_format).save(path))
    finally:
        spark.conf.set(key, before)
    return path
