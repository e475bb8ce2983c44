"""Data-layout operators: Z-order clustering for multi-dimensional skipping.

A 100 TB table is pruned, not scanned: parquet keeps per-file / per-row-
group min-max statistics, and a reader with predicates on the sort columns
skips everything outside the bounds. A single-column sort only prunes that
column; Z-ordering (bit-interleaving several quantized columns into one
sort key) keeps files tight in EVERY interleaved dimension, so selective
predicates on any of them skip most files. This is the same layout idea
Delta Lake's OPTIMIZE ZORDER BY applies; here it is plain DataFrame
algebra — quantize, interleave with shift/mask expressions (whole-stage
codegen, no UDF), ``repartitionByRange`` on the z-value (one range
shuffle), sort within partitions, write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["spread_bits", "zvalue", "zorder_write", "compact_files"]

_BITS = 16  # per-dimension quantization width (2 dims -> 32-bit z-value)


def spread_bits(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to even bit positions 0,2,..,30
    (the classic Morton-code magic-mask sequence, as integer expressions)."""
    x = col.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zvalue(a: Column, b: Column) -> Column:
    """Morton z-value of two already-quantized [0, 65536) dimensions."""
    return spread_bits(a).bitwiseOR(F.shiftleft(spread_bits(b), 1))


def quantize(col: Column, lo: float, hi: float) -> Column:
    """Map ``col`` in [lo, hi] to an integer in [0, 2^16): fixed bounds so
    the layout is stable across incremental writes (stats-derived bounds
    would reshuffle the whole key space every batch)."""
    scaled = (col.cast("double") - F.lit(lo)) / F.lit((hi - lo) or 1.0)
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * F.lit((1 << _BITS) - 1)).cast("bigint")


def zorder_write(
    df: DataFrame,
    path: str,
    dims: list[tuple[str, float, float]],
    num_files: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` Z-ordered on two dimensions.

    ``dims`` is ``[(col, lo, hi), (col, lo, hi)]`` — fixed quantization
    bounds per dimension. The range shuffle on the z-value is the only
    exchange; each output file then covers a compact z-range, i.e. a small
    rectangle in (dim1, dim2) space, which is what min-max pruning needs.
    """
    if len(dims) != 2:
        raise ValueError("zorder_write interleaves exactly 2 dimensions")
    (c1, lo1, hi1), (c2, lo2, hi2) = dims
    z = zvalue(quantize(F.col(c1), lo1, hi1), quantize(F.col(c2), lo2, hi2))
    (df.withColumn("_z", z)
       .repartitionByRange(num_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.format(fmt).mode("overwrite").save(path))


def compact_files(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite a directory of many small files into files of roughly
    ``target_bytes`` each; returns the new file count.

    The small-file problem is the quiet killer of 100 TB tables:
    streaming micro-batches and over-partitioned writes leave thousands
    of KB-sized files, and every later scan pays per-file open/footer
    cost while min-max pruning degrades to noise. Compaction is one
    sized repartition: the on-disk byte size (from the file listing, via
    Hadoop's FileSystem so object stores work the same) divides by the
    target to give the output file count, an optional sort restores
    clustering, and the rewrite swaps in atomically (write to a sibling
    temp dir, then rename) so concurrent readers never see a half-written
    table.
    """
    import math
    import uuid

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(conf)
    total = fs.getContentSummary(src).getLength()
    n_files = max(1, math.ceil(total / target_bytes))

    df = spark.read.format(fmt).load(path)
    writer = df.repartition(n_files)
    if sort_by:
        writer = writer.sortWithinPartitions(*sort_by)
    tmp = f"{path.rstrip('/')}_compact_{uuid.uuid4().hex[:8]}"
    writer.write.format(fmt).mode("overwrite").save(tmp)

    trash = jvm.org.apache.hadoop.fs.Path(tmp + "_old")
    fs.rename(src, trash)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), src)
    fs.delete(trash, True)
    return n_files
