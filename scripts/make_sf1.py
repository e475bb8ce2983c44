"""Generate an sf1-equivalent dataset for scaling spot-checks.

/root/testdata is read-only and the driver generates only sf0.001/0.01/
0.1, so the 10x point for the BENCH_sf1 scaling check is synthesized
here as TEN DISJOINT REPLICAS of sf0.1 — the honest "10x more data,
same per-unit structure" shape:

- ``events``: event_id/user_id offset per replica -> 10x keys, identical
  per-key series (seasonal decomposition parallelizes by key);
- ``lineitem``: l_orderkey AND l_partkey offset per replica -> the
  co-order graphs of the replicas are disjoint (graph workloads get 10
  independent copies, not one 10x-denser graph whose wedge counts would
  scale superlinearly and say nothing about data scaling);
- ``documents``: doc_id offset + a per-replica Caesar cipher on the text
  (letter rotation preserves length, word shape, and within-replica
  duplicate structure while making shingles disjoint across replicas —
  plain copies would hand every doc 9 exact near-dups and multiply LSH
  bucket sizes, a different and artificially quadratic workload).

Only the tables the 5 heaviest bench entries read are produced. Output
dir defaults to /tmp/sf1 (override with argv[1]).
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
REPLICAS = 10
AL = "abcdefghijklmnopqrstuvwxyz"


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT e.event_id + r.i * 100000 AS event_id, e.ts,
                 e.user_id + r.i * 1500 AS user_id,
                 e.event_type, e.value, e.props
          FROM read_parquet('{SRC}/events.parquet') e,
               generate_series(0, {REPLICAS - 1}) r(i)
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT l.l_orderkey + r.i * 150000 AS l_orderkey,
                 l.l_partkey + r.i * 20000 AS l_partkey,
                 l.l_suppkey, l.l_linenumber, l.l_quantity,
                 l.l_extendedprice, l.l_discount, l.l_tax,
                 l.l_returnflag, l.l_linestatus, l.l_shipdate
          FROM read_parquet('{SRC}/lineitem.parquet') l,
               generate_series(0, {REPLICAS - 1}) r(i)
        ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          WITH sh AS (
            SELECT i, '{AL}{AL.upper()}' AS src,
                   substr('{AL}{AL}', i + 1, 26)
                     || substr('{AL.upper()}{AL.upper()}', i + 1, 26) AS dst
            FROM generate_series(0, {REPLICAS - 1}) g(i))
          SELECT d.doc_id + sh.i * 5000 AS doc_id,
                 translate(d.text, sh.src, sh.dst) AS text,
                 d.lang, d.source, d.n_chars
          FROM read_parquet('{SRC}/documents.parquet') d, sh
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
    """)
    for t in ("events", "lineitem", "documents"):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
