"""Generate an sf1-equivalent dataset for scaling spot-checks.

/root/testdata is read-only and the driver generates only sf0.001/0.01/
0.1, so the 10x point for the BENCH_sf1 scaling check is synthesized
here as TEN DISJOINT REPLICAS of sf0.1 — the honest "10x more data,
same per-unit structure" shape. All ten tables are produced (round 6:
the scaling check covers the full 34-entry headline, not just the 5
heaviest), with foreign keys offset CONSISTENTLY so every join in the
bench set sees ten disjoint copies of the sf0.1 join graph:

- ``customer``/``supplier``/``part``/``orders``/``lineitem``: every key
  column offset by replica * (table's sf0.1 key count), so
  customer->orders->lineitem and part/supplier joins replicate without
  cross-replica edges (graph workloads get 10 independent co-order
  graphs, not one 10x-denser graph whose wedge counts would scale
  superlinearly and say nothing about data scaling); ``c_name`` gets
  the same per-replica Caesar rotation as document text (round 9) —
  verbatim copies would hand every name 9 exact duplicates, turning the
  edit-distance join's scaling probe into the artificially quadratic
  all-copies workload rather than "10x more names, same structure";
- ``region``/``nation``: copied UNREPLICATED — they are bounded
  dimensions in any deployment; the fact side scales 10x against the
  same 25/5 dimension rows, which is exactly the 100 TB shape;
- ``events``: event_id/user_id offset per replica -> 10x keys, identical
  per-key series (seasonal decomposition parallelizes by key);
- ``documents``: doc_id offset + a per-replica Caesar cipher on the text
  (letter rotation preserves length, word shape, and within-replica
  duplicate structure while making shingles disjoint across replicas —
  plain copies would hand every doc 9 exact near-dups and multiply LSH
  bucket sizes, a different and artificially quadratic workload);
- ``embeddings``: vec_id offset, vectors copied (ANN timing is a linear
  scan + top-k; duplicate neighbors change results, not cost).

Output dir defaults to /tmp/sf1 (override with argv[1]).
"""

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
REPLICAS = 10
AL = "abcdefghijklmnopqrstuvwxyz"

#: sf0.1 key counts (the per-replica offsets)
N_CUST, N_SUPP, N_PART, N_ORD, N_EVT, N_DOC, N_VEC = \
    15000, 1000, 20000, 150000, 100000, 5000, 2000


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    rep = f"generate_series(0, {REPLICAS - 1}) r(i)"

    def copy(table: str, select: str) -> None:
        con.execute(f"COPY ({select}) TO '{DST}/{table}.parquet' "
                    "(FORMAT PARQUET)")

    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')")
    copy("customer", f"""
        WITH sh AS (
          SELECT i, '{AL}{AL.upper()}' AS src,
                 substr('{AL}{AL}', i + 1, 26)
                   || substr('{AL.upper()}{AL.upper()}', i + 1, 26) AS dst
          FROM generate_series(0, {REPLICAS - 1}) g(i))
        SELECT c.c_custkey + sh.i * {N_CUST} AS c_custkey,
               translate(c.c_name, sh.src, sh.dst) AS c_name,
               c.c_nationkey, c.c_acctbal, c.c_mktsegment
        FROM read_parquet('{SRC}/customer.parquet') c, sh""")
    copy("supplier", f"""
        SELECT s.s_suppkey + r.i * {N_SUPP} AS s_suppkey, s.s_name,
               s.s_nationkey, s.s_acctbal
        FROM read_parquet('{SRC}/supplier.parquet') s, {rep}""")
    copy("part", f"""
        SELECT p.p_partkey + r.i * {N_PART} AS p_partkey, p.p_name,
               p.p_brand, p.p_type, p.p_size, p.p_retailprice
        FROM read_parquet('{SRC}/part.parquet') p, {rep}""")
    copy("orders", f"""
        SELECT o.o_orderkey + r.i * {N_ORD} AS o_orderkey,
               o.o_custkey + r.i * {N_CUST} AS o_custkey,
               o.o_orderstatus, o.o_totalprice, o.o_orderdate,
               o.o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet') o, {rep}""")
    copy("lineitem", f"""
        SELECT l.l_orderkey + r.i * {N_ORD} AS l_orderkey,
               l.l_partkey + r.i * {N_PART} AS l_partkey,
               l.l_suppkey + r.i * {N_SUPP} AS l_suppkey,
               l.l_linenumber, l.l_quantity, l.l_extendedprice,
               l.l_discount, l.l_tax, l.l_returnflag, l.l_linestatus,
               l.l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet') l, {rep}""")
    copy("events", f"""
        SELECT e.event_id + r.i * {N_EVT} AS event_id, e.ts,
               e.user_id + r.i * 1500 AS user_id,
               e.event_type, e.value, e.props
        FROM read_parquet('{SRC}/events.parquet') e, {rep}""")
    copy("documents", f"""
        WITH sh AS (
          SELECT i, '{AL}{AL.upper()}' AS src,
                 substr('{AL}{AL}', i + 1, 26)
                   || substr('{AL.upper()}{AL.upper()}', i + 1, 26) AS dst
          FROM generate_series(0, {REPLICAS - 1}) g(i))
        SELECT d.doc_id + sh.i * {N_DOC} AS doc_id,
               translate(d.text, sh.src, sh.dst) AS text,
               d.lang, d.source, d.n_chars
        FROM read_parquet('{SRC}/documents.parquet') d, sh""")
    copy("embeddings", f"""
        SELECT e.vec_id + r.i * {N_VEC} AS vec_id, e.embedding, e.label
        FROM read_parquet('{SRC}/embeddings.parquet') e, {rep}""")

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
