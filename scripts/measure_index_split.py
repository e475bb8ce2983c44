"""Ingest-vs-query split for the persisted retrieval family (VERDICT
round-12 item 6): at each scale factor, measure SEPARATELY

* ingest — write_search_index over the documents table (tokenize + the
  three artifact writes), the cost a production deployment pays once
  per batch and amortizes over every query;
* query — bm25_search_persisted steady state (warmup + min of N), the
  per-request cost, which should stay NEAR-FLAT as the corpus grows
  because it reads only the query terms' token buckets + the stats
  rows.

The in-entry bench pair (bm25_persisted_search_docs) can't show this
split — it times write+query as one number. Results go to stdout as one
JSON line; SCALE.md records them.

Usage: python scripts/measure_index_split.py [sf_dir ...]
       (defaults: /root/testdata/sf0.1 /tmp/sf1)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TERMS = ["hash", "join", "vector"]


def measure(sf_dir: str, runs: int = 5) -> dict:
    from etl_mark1_spark import get_spark
    from etl_mark1_spark.catalog._registry import t
    from etl_mark1_spark.operators.indexing import (bm25_maxscore_search,
                                                    bm25_search_persisted,
                                                    write_search_index)

    spark = get_spark(app_name=f"index-split-{os.path.basename(sf_dir)}",
                      driver_memory="24g")
    spark.range(1).count()
    docs = t(spark, sf_dir, "documents")
    tdir = tempfile.mkdtemp(prefix="etl_mark1_split_")
    started = time.monotonic()
    write_search_index(docs, tdir)
    ingest_sec = round(time.monotonic() - started, 3)

    def timed(fn):
        fn().write.format("noop").mode("overwrite").save()  # warmup
        out = []
        for _ in range(runs):
            s = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            out.append(round(time.monotonic() - s, 3))
        return out

    q_runs = timed(lambda: bm25_search_persisted(spark, tdir, TERMS,
                                                 top_k=10))
    ms_runs = timed(lambda: bm25_maxscore_search(
        spark, tdir, ["dup", "the", "data"], top_k=10))
    spark.stop()
    return {"sf_dir": sf_dir, "ingest_sec": ingest_sec,
            "query_sec": min(q_runs), "query_runs": q_runs,
            "maxscore_sec": min(ms_runs), "maxscore_runs": ms_runs}


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1"]
    print(json.dumps({"metric": "persisted_index_ingest_query_split",
                      "terms": TERMS,
                      "results": [measure(d) for d in dirs]}))


if __name__ == "__main__":
    main()
