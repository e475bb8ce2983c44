"""Driver-contract sanity: entry/queries/oracle_sql shapes."""

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract


def test_entry_returns_rows(spark):
    df = contract.entry(spark)
    assert df.count() > 0


def test_queries_signatures():
    q = contract.queries()
    assert len(q) >= 30
    for name, fn in q.items():
        assert len(inspect.signature(fn).parameters) == 2, name


def test_oracles_subset_of_queries():
    q, o = contract.queries(), contract.oracle_sql()
    assert set(o) <= set(q)
    assert len(o) >= 25
    for name, sql in o.items():
        assert "SELECT" in sql.upper(), name


def test_one_query_runs(spark, sf_dir):
    df = contract.queries()["dedup_distinct"](spark, sf_dir)
    assert df.count() > 0


def test_first_50_registrations_are_oracle_backed():
    """The external driver's CORRECTNESS snapshot checks only the FIRST 50
    registered catalog entries — registration order is a load-bearing
    contract. Every entry in that prefix must carry an exact SQL oracle
    (not rows-only, not error-band) so all 50 driver slots stay
    hash-checkable; ``catalog/__init__.py`` rotates DRIVER_PREFIX to the
    front. Guard so a refactor can't silently reorder them."""
    from etl_mark1_spark.catalog import DRIVER_PREFIX, ORACLE, QUERIES

    prefix = list(QUERIES)[:50]
    assert prefix == DRIVER_PREFIX
    missing = [n for n in prefix if n not in ORACLE]
    assert not missing, f"rows-only entries inside the judged prefix: {missing}"

    # Error-band / recall-band entries (sketches, ANN) can never hash-match
    # an exact oracle — they must stay out of the judged prefix.
    banded = {"approx_distinct_users", "hll_rollup_merge", "quartiles_approx",
              "quantile_digest_merge", "streaming_hll_distinct",
              "ann_lsh_topk", "ann_ivf_topk"}
    assert not banded & set(prefix)


def test_prefix_rotates_toward_unchecked_entries():
    """The round-7+ prefix policy (catalog/__init__.py): mostly entries the
    driver has NOT yet hash-confirmed (so confirmed-union coverage grows),
    plus a few previously-confirmed SENTINELS so old entries keep external
    regression coverage. Read the committed CORRECTNESS_r*.json snapshots
    and require both halves — as much fresh as the shrinking unchecked pool
    allows, and at least two sentinels.

    Only snapshots from rounds STRICTLY BEFORE the prefix's authoring
    round (DRIVER_PREFIX_ROUND) count: the prefix is staged against what
    was known when it was written, and the driver's snapshot for the
    CURRENT round lands mid-round — globbing it in made this test fail
    the moment CORRECTNESS_r08.json appeared on disk (round-8 lesson),
    despite the rotation having executed exactly as planned."""
    import glob
    import json
    import re

    from etl_mark1_spark.catalog import (DRIVER_PREFIX, DRIVER_PREFIX_ROUND,
                                         ORACLE)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snaps = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    snaps = [p for p in snaps
             if int(re.search(r"_r(\d+)", os.path.basename(p)).group(1))
             < DRIVER_PREFIX_ROUND]
    assert snaps, "committed correctness snapshots missing"
    checked: set[str] = set()
    for path in snaps:
        with open(path) as fh:
            checked |= set(json.load(fh))
    banded = {"approx_distinct_users", "hll_rollup_merge", "quartiles_approx",
              "quantile_digest_merge", "streaming_hll_distinct",
              "ann_lsh_topk", "ann_ivf_topk"}
    pool = [n for n in ORACLE if n not in banded and n not in checked]
    fresh = [n for n in DRIVER_PREFIX if n not in checked]
    sentinels = [n for n in DRIVER_PREFIX if n in checked]
    floor = min(40, len(pool))
    assert len(fresh) >= floor, \
        f"only {len(fresh)} prefix entries are unchecked (pool {len(pool)})"
    assert len(sentinels) >= 2, \
        f"prefix keeps no previously-confirmed sentinels: {sentinels}"


def test_oracle_outputs_driver_safe_types(spark, sf_dir):
    """Conformance sweep for the output-typing convention
    (catalog/__init__.py): no oracle-exact entry may emit ARRAY/MAP
    columns (the driver's pandas canonicalizer crashes on list cells) or
    DECIMAL wider than precision 18 (hashes engine-dependently despite
    equal values). This is the guard for round 6's four driver reds —
    schema-only (plan analysis, no job runs), so the sweep covers every
    entry cheaply."""
    import scripts.check_oracle as co
    from etl_mark1_spark.catalog import ORACLE, QUERIES

    banded = {"approx_distinct_users", "hll_rollup_merge", "quartiles_approx",
              "quantile_digest_merge", "streaming_hll_distinct",
              "ann_lsh_topk", "ann_ivf_topk"}
    offenders = {}
    for name in ORACLE:
        if name in banded:
            continue
        bad = co.driver_hostile_fields(QUERIES[name](spark, sf_dir).schema)
        if bad:
            offenders[name] = bad
    assert not offenders, f"driver-hostile oracle outputs: {offenders}"


def test_oracle_sql_outputs_driver_safe_types(sf_dir):
    """The ORACLE-side mirror of the sweep above (round-8 driver red:
    ``domain_capped_docs``'s ``sum(doc_id)`` returned DuckDB HUGEINT,
    which the driver's pandas canonicalizer carries as float64 while
    Spark's int64 hashes int — a value-hash mismatch on EQUAL values that
    the Spark-schema sweep and the fetchall()-based local gate are both
    structurally blind to). DESCRIBE every oracle SQL against DuckDB
    views — schema only, no rows run — and refuse HUGEINT/UHUGEINT,
    DECIMAL(>18), and container carriers."""
    import duckdb

    import scripts.check_oracle as co
    from etl_mark1_spark.catalog import ORACLE, TABLES

    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{name}.parquet')")
    banded = {"approx_distinct_users", "hll_rollup_merge", "quartiles_approx",
              "quantile_digest_merge", "streaming_hll_distinct",
              "ann_lsh_topk", "ann_ivf_topk"}
    offenders = {}
    for name, sql in ORACLE.items():
        if name in banded:
            continue
        bad = co.oracle_hostile_fields(con, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, f"driver-hostile ORACLE output types: {offenders}"
