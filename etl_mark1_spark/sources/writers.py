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

_EXT = {"csv": "csv", "json": "json", "parquet": "parquet",
        "orc": "orc"}


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


def write_bucketed_table(df: DataFrame, name: str, bucket_cols: list[str],
                         num_buckets: int,
                         sort_cols: list[str] | None = None,
                         path: str | None = None,
                         file_format: str = "parquet",
                         mode: str = "overwrite") -> str:
    """Write ``df`` as a BUCKETED catalog table: rows hash-clustered into
    ``num_buckets`` files per partition by ``bucket_cols`` (optionally
    sorted within each bucket by ``sort_cols``).

    This is the storage-layout half of the co-located join: two tables
    bucketed on the same key with the same bucket count sort-merge-join
    WITHOUT exchanging either side — the scan itself reports the
    hash-partitioning, so Catalyst drops both shuffles (and, with
    ``sort_cols`` on the key, both sorts). At 100 TB that converts every
    recurring fact-to-fact join on the bucket key from the single most
    expensive shuffle in the pipeline into a zero-movement merge; the
    one-time bucketing write costs one shuffle, amortized across every
    downstream join/aggregation on that key (``groupBy`` on the bucket
    key also skips its exchange).

    Bucketing must go through the session catalog (``saveAsTable``) —
    bucket metadata lives in the table definition, not the parquet files;
    a plain ``.parquet(path)`` write silently drops it. ``path`` makes it
    an external table at that location. No reference counterpart (the
    reference has no storage layout control at all); this is the Spark
    idiom for the pre-partitioned tables SURVEY.md §2.3 anticipates.

    Returns the table name (query it back with ``spark.table(name)``)."""
    writer = (df.write.mode(mode).format(file_format)
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)
    return name


def write_training_shards(df: DataFrame, path: str, num_shards: int = 64,
                          id_col: str = "doc_id",
                          order_col: str | None = None,
                          epoch: int | None = None,
                          file_format: str = "parquet",
                          compression: str | None = None) -> dict:
    """Write a curated corpus as deterministic training shards — the
    last-mile sink of the curation pipeline (the reference's closest
    surface is the plain file_output node, backend/executor/engine.py).

    - Shard membership is md5-of-id (same rule as train_test_split):
      a function of the ROW, so re-runs, backfills, and repartitions
      produce byte-identical shard contents — never ``rand()`` or
      round-robin, which reshuffle every run and break resumable
      training.
    - Rows sort by ``order_col`` (default: the id) WITHIN each shard
      (sortWithinPartitions — no global sort), giving reproducible
      within-shard sample order.
    - One file per shard (``shard=K/`` hive dirs), written in a single
      distributed pass: repartition on the shard key is the only
      shuffle.
    - A ``_manifest.json`` records per-shard row counts and the total,
      so downstream loaders can size epochs and detect partial writes;
      the manifest is written LAST and only after the data commits —
      its absence marks an incomplete shard set.
    - ``epoch`` switches both the shard rule and the within-shard order
      to md5 functions of (id, epoch) — operators/corpus.py:
      epoch_shuffle's layout as files: each epoch gets a different
      deterministic global order, each re-run of an epoch the identical
      one. ``order_col`` still wins the within-shard sort if given.

    - ``file_format="jsonl"`` (or ``"json"``) writes line-delimited JSON
      instead of parquet — the interchange format training datasets ship
      in; pair with ``compression="gzip"`` for ``.json.gz`` shard files.
      Same layout, same determinism, same manifest.

    Returns the manifest dict (including the epoch when set).
    """
    import json
    import os

    from pyspark.sql import functions as F

    hash_input = F.col(id_col).cast("string") if epoch is None else \
        F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(epoch)))
    hcol = F.conv(F.substring(F.md5(hash_input), 1, 8), 16, 10) \
        .cast("bigint")
    tagged = df.withColumn("shard", (hcol % num_shards).alias("shard"))
    order = [order_col] if order_col else (
        [id_col] if epoch is None else [hcol, F.col(id_col)])
    # sort leads with the partition column: FileFormatWriter requires
    # rows sorted by partition cols and INSERTS its own (order-scrambling)
    # sort when they are not — leading with shard satisfies it, so the
    # within-shard order actually reaches the files
    writer = (tagged.repartition(num_shards, "shard")
              .sortWithinPartitions("shard", *order)
              .write.mode("overwrite").partitionBy("shard"))
    if compression is not None:
        writer = writer.option("compression", compression)
    if file_format in ("json", "jsonl"):
        writer.json(path)
    elif file_format == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported shard format: {file_format}")

    counts = {int(r["shard"]): r["n"] for r in
              tagged.groupBy("shard")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    manifest = {
        "num_shards": num_shards,
        "format": "jsonl" if file_format in ("json", "jsonl")
                  else file_format,
        "total_rows": int(sum(counts.values())),
        "shard_rows": {str(k): int(v) for k, v in sorted(counts.items())},
    }
    if epoch is not None:
        manifest["epoch"] = int(epoch)
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def plan_shards(df: DataFrame, target_bytes: int,
                strata_col: str = "source",
                bytes_col: str | None = None,
                text_col: str = "text") -> DataFrame:
    """Shard-count planner: per stratum, the byte volume, the shard
    count ``ceil(bytes / target_bytes)``, and the resulting mean shard
    size — the sizing pass a writer runs BEFORE ``write_training_shards``
    so shards land near the target instead of inheriting whatever the
    upstream partitioning produced (oversized shards straggle loaders;
    undersized ones multiply object-store requests). Byte volume is
    ``octet_length`` of the payload column unless a precomputed
    ``bytes_col`` is given. One algebraic aggregation at stratum
    cardinality; map-side partials collapse the corpus."""
    from pyspark.sql import functions as F

    size = (F.col(bytes_col) if bytes_col
            else F.octet_length(F.col(text_col)))
    # A zero-byte stratum (all-empty payloads) still needs ONE shard —
    # ceil(0/target)=0 would yield n_shards=0 and a NULL mean, which no
    # writer downstream can act on; greatest(…, 1) pins the floor.
    n_shards = F.greatest(
        F.ceil(F.col("n_bytes") / F.lit(target_bytes)), F.lit(1))
    return (df.groupBy(strata_col)
            .agg(F.sum(size).cast("bigint").alias("n_bytes"),
                 F.count(F.lit(1)).cast("bigint").alias("n_rows"))
            .select(strata_col, "n_bytes", "n_rows",
                    n_shards.cast("bigint").alias("n_shards"),
                    F.round(F.col("n_bytes") / n_shards, 2)
                    .alias("mean_shard_bytes")))
