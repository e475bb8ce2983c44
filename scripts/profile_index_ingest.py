"""Profile the persisted-index INGEST path at sf0.1: per-artifact wall
time inside write_search_index, output file counts, and the query-side
cost — the measurement behind the round-13-opt ingest rework.

Usage: python scripts/profile_index_ingest.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def count_files(base: str) -> dict[str, int]:
    out = {}
    for art in ("postings", "stats", "dict", "positions"):
        p = os.path.join(base, art)
        n = 0
        for root, _dirs, files in os.walk(p):
            n += sum(1 for f in files if f.endswith(".parquet"))
        if n:
            out[art] = n
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from etl_mark1_spark import get_spark
    from etl_mark1_spark.operators import indexing as ix

    spark = get_spark(app_name="profile-index-ingest", driver_memory="24g")
    spark.range(1).count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # warmup: one full segment write (codegen compile)
    warm = tempfile.mkdtemp(prefix="pidx_warm_")
    ix.write_search_index(docs, warm)

    for trial in range(3):
        tdir = tempfile.mkdtemp(prefix="pidx_prof_")
        t0 = time.monotonic()
        ix.write_search_index(docs, tdir)
        print(f"trial {trial}: write_search_index {time.monotonic()-t0:.2f}s"
              f"  files {count_files(tdir)}")

    # the scored-postings computation alone (noop sink)
    for trial in range(2):
        t0 = time.monotonic()
        (ix.build_scored_postings(docs)
         .write.format("noop").mode("overwrite").save())
        print(f"scored-postings noop: {time.monotonic()-t0:.2f}s")

    # positional ingest
    for trial in range(2):
        tdir = tempfile.mkdtemp(prefix="pidx_pos_")
        t0 = time.monotonic()
        ix.write_position_index(docs, tdir)
        print(f"position ingest: {time.monotonic()-t0:.2f}s  "
              f"files {count_files(tdir)}")

    # query side for reference
    q = tempfile.mkdtemp(prefix="pidx_q_")
    ix.write_search_index(docs, q)
    for trial in range(3):
        t0 = time.monotonic()
        (ix.bm25_search_persisted(spark, q, ["hash", "join", "vector"])
         .write.format("noop").mode("overwrite").save())
        print(f"bm25 query: {time.monotonic()-t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
