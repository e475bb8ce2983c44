"""Bloom-filter membership prefilter: set-membership tests against a
reference corpus without shuffling (or even joining) the big side.

The reference engine expresses decontamination as a plain semi-join
(shonejj/etl-mark1 runs it as SQL through backend/services/duckdb_engine.py);
`operators/corpus.py:ngram_contamination` keeps that exact-join form. This
module adds the shape that survives 100 TB: a Bloom filter built over the
reference keys is a few MB *by construction* (1.2 bytes/key at 1% fpp),
so the probe side — the 100 TB corpus — is filtered entirely map-side, with
the exact join deferred to the tiny surviving fraction. Because a Bloom
filter has NO false negatives, "bloom prefilter + exact confirm on
survivors" equals the exact semi/anti join bit-for-bit — which is what lets
the catalog entry carry a plain-SQL DuckDB oracle despite the sketch in the
middle.

Layout: the filter is a dense array of 64-bit words. Build is a distributed
aggregation — explode each key into its k bit positions, `bit_or` partial-
aggregate per word index (map-side combine), and collect at most
``num_bits / 64`` words to the driver. The collect is bounded by the filter
size regardless of corpus size; that bound is the whole point of the sketch.

Two probe paths, identical results (tested):

- **jvm** (default): the word array ships as a literal array column and the
  k bit tests are pure Spark expressions (`element_at` + `shiftleft` +
  bitwise AND) — whole-stage codegen, zero Python, zero shuffle. Right up
  to a few-MB filter (the literal travels inside the plan, like a broadcast
  hint's threshold).
- **arrow**: bit positions are still computed JVM-side; a vectorized Pandas
  UDF tests them against a shared numpy word array. Use when the filter is
  tens of MB and too big to inline in the plan.

Hashing is Kirsch–Mitzenmacher double hashing over ``xxhash64`` (two hash
evaluations give all k positions). The positions only need to agree between
build and probe inside Spark — cross-engine reproducibility is carried by
the exact confirm step, not the sketch — so the engine-native hash is the
right choice (vs the md5 used for split membership in corpus.py, where the
hash itself must match DuckDB).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 64
# Above this the literal-array plan node gets heavy (~4 MB of words);
# callers should switch to the arrow path.
_MAX_JVM_BITS = 1 << 25


def optimal_num_bits(n_items: int, fpp: float = 0.01) -> int:
    """Standard Bloom sizing, rounded up to a whole number of 64-bit
    words: m = -n ln p / (ln 2)^2."""
    n = max(1, n_items)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    return ((m + _WORD_BITS - 1) // _WORD_BITS) * _WORD_BITS


def optimal_num_hashes(num_bits: int, n_items: int) -> int:
    """k = (m/n) ln 2, clamped to [1, 16]."""
    n = max(1, n_items)
    return max(1, min(16, round(num_bits / n * math.log(2))))


def _positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions of a value: pmod(h1 + i*h2, m) with h1/h2 two
    seeded xxhash64 evaluations (Kirsch–Mitzenmacher — k positions from two
    hash computations). Both hashes are reduced mod m before the combine so
    the arithmetic stays far from long overflow (ANSI mode would throw)."""
    h1 = F.pmod(F.xxhash64(col, F.lit(0x51ED)), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(0x2C9A)), F.lit(num_bits))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits))
            for i in range(num_hashes)]


def build_bloom(reference: DataFrame, col: str, num_bits: int,
                num_hashes: int) -> list[int]:
    """Build the filter over ``reference[col]`` and return its dense word
    list (length ``num_bits // 64``).

    Fully distributed until the final collect: explode to bit positions,
    aggregate ``bit_or`` of the single-bit masks per word index (map-side
    partials — each task emits at most num_bits/64 rows no matter how many
    keys it saw), then collect <= num_bits/64 (word_idx, word) pairs.
    """
    pos = reference.select(
        F.explode(F.array(*_positions(F.col(col), num_bits, num_hashes))
                  ).alias("pos"))
    words = (
        pos.groupBy(F.shiftright(F.col("pos"), 6).alias("word_idx"))
        .agg(F.bit_or(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"),
                (F.col("pos") % _WORD_BITS).cast("int"))).alias("word"))
        .collect())
    dense = [0] * (num_bits // _WORD_BITS)
    for row in words:
        dense[row["word_idx"]] = row["word"]
    return dense


def bloom_maybe_contains(col: Column, words: list[int], num_bits: int,
                         num_hashes: int) -> Column:
    """Pure-expression membership test (the jvm probe path): AND over the k
    positions of ``element_at(words, pos div 64) & (1 << pos mod 64) != 0``.

    The word list rides along as a literal array — evaluated once per row
    with O(1) indexed access, inside whole-stage codegen, no shuffle, no
    Python."""
    if num_bits > _MAX_JVM_BITS:
        raise ValueError(
            f"num_bits={num_bits} too large for a literal-array probe; "
            "use bloom_maybe_arrow")
    import numpy as np

    # a numpy array becomes ONE ArrayType Literal; a Python list would
    # become CreateArray with num_bits/64 child expressions, which wrecks
    # codegen for large filters (measured ~10x slower at 16k words)
    arr = F.lit(np.asarray(words, dtype=np.int64))
    maybe = F.lit(True)
    for pos in _positions(col, num_bits, num_hashes):
        word = F.element_at(arr, (F.shiftright(pos, 6) + 1).cast("int"))
        mask = F.call_function("shiftleft", F.lit(1).cast("long"),
                               (pos % _WORD_BITS).cast("int"))
        maybe = maybe & (word.bitwiseAND(mask) != 0)
    return maybe


def bloom_maybe_arrow(df: DataFrame, col: str, words: list[int],
                      num_bits: int, num_hashes: int,
                      out_col: str = "_maybe") -> DataFrame:
    """Arrow probe path for filters too big to inline in the plan: the k
    positions are still computed JVM-side (same expressions as the build),
    and a vectorized Pandas UDF tests them against a shared numpy word
    array — one ufunc chain per Arrow batch, no per-row Python."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    word_arr = np.array(words, dtype=np.int64)

    @pandas_udf("boolean", "SCALAR")
    def _probe(pos):
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        mat = np.vstack(pos.to_numpy())          # n x k positions
        w = word_arr[mat >> 6]
        # arithmetic shift then &1 reads bit b correctly for signed words
        return pd.Series(((w >> (mat & 63)) & 1).all(axis=1))

    pos_col = F.array(*_positions(F.col(col), num_bits, num_hashes))
    return df.withColumn(out_col, _probe(pos_col))


def _sized(reference: DataFrame, col: str, num_bits: int | None,
           num_hashes: int | None, fpp: float
           ) -> tuple[list[int], int, int, DataFrame]:
    """Materialize the DISTINCT reference once and derive everything from
    it: the sizing count, the filter bits, and the frame the caller's
    exact join reads. Round-13-opt (guide §5): the reference is usually a
    DERIVED frame (a gram explode of the eval suite), and the old shape
    re-ran that derivation three times — count, bloom build, join side.
    One localCheckpoint of the distinct values (eval-suite-bounded by
    this module's contract, so the blocks are small) turns the other two
    passes into block reads. The filter bits are unchanged: building
    over distinct values sets exactly the same bits, and n was already
    the distinct count."""
    ref = reference.select(col).distinct().localCheckpoint()
    if num_bits is None or num_hashes is None:
        n = ref.count()
        num_bits = num_bits or min(optimal_num_bits(n, fpp), _MAX_JVM_BITS)
        num_hashes = num_hashes or optimal_num_hashes(num_bits, n)
    words = build_bloom(ref, col, num_bits, num_hashes)
    return words, num_bits, num_hashes, ref


def bloom_semi_filter(df: DataFrame, reference: DataFrame, col: str,
                      num_bits: int | None = None,
                      num_hashes: int | None = None,
                      fpp: float = 0.01) -> DataFrame:
    """Rows of ``df`` whose ``col`` value appears in ``reference[col]`` —
    exactly (bloom prefilter, then exact semi-join on the surviving
    fraction). Equals ``df SEMI JOIN reference`` because the filter has no
    false negatives; the big side is filtered map-side and only
    ~(matches + fpp · N) rows reach the join."""
    words, num_bits, num_hashes, ref = _sized(reference, col, num_bits,
                                              num_hashes, fpp)
    maybe = bloom_maybe_contains(F.col(col), words, num_bits, num_hashes)
    return df.filter(maybe).join(ref, col, "left_semi")


def bloom_anti_filter(df: DataFrame, reference: DataFrame, col: str,
                      num_bits: int | None = None,
                      num_hashes: int | None = None,
                      fpp: float = 0.01) -> DataFrame:
    """Rows of ``df`` whose ``col`` value does NOT appear in
    ``reference[col]`` — the decontamination direction. Definite
    non-members (the overwhelming majority at low fpp) pass map-side with
    no join at all; only bloom survivors are anti-joined exactly.

    ``df`` is traversed twice (both traversals shuffle-free); persist it
    if the scan itself is the cost, or keep the single-pass `_maybe`
    column via bloom_maybe_contains and filter downstream."""
    words, num_bits, num_hashes, ref = _sized(reference, col, num_bits,
                                              num_hashes, fpp)
    maybe = bloom_maybe_contains(F.col(col), words, num_bits, num_hashes)
    survivors = df.filter(maybe).join(ref, col, "left_anti")
    return df.filter(~maybe).unionByName(survivors)
