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

__all__ = ["spread_bits", "zvalue", "zorder_write"]

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
