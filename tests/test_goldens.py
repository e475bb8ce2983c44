"""Golden replay for the rows-only catalog entries + semantic recall checks.

The DuckDB oracle can't express these entries (LSH banding, SimHash bits,
fake media codec), so CORRECTNESS only row-counts them. Here each entry's
full sf0.01 output is compared against a committed snapshot
(tests/goldens/*.json, regenerated via scripts/make_goldens.py), and the
approximate-NN entries are additionally held to a recall floor against the
exact brute-force ranking — a semantic bound no snapshot can drift past.
"""

import json
import os

import pytest

from etl_mark1_spark.catalog import QUERIES

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
SF_DIR = "/root/testdata/sf0.01"

GOLDEN_ENTRIES = sorted(
    f[:-5] for f in os.listdir(GOLDEN_DIR) if f.endswith(".json"))


def _canon_rows(df):
    from scripts.make_goldens import canon_rows

    return canon_rows(df)


@pytest.fixture(scope="module", autouse=True)
def _need_sf(spark):
    if not os.path.isdir(SF_DIR):
        pytest.skip("sf0.01 testdata not present")


@pytest.mark.parametrize("name", GOLDEN_ENTRIES)
def test_matches_golden(spark, name):
    with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as fh:
        want = json.load(fh)
    got = _canon_rows(QUERIES[name](spark, SF_DIR))
    assert got["columns"] == want["columns"]
    assert len(got["rows"]) == len(want["rows"])
    # pinpoint the first diverging row for a readable failure
    for i, (g, w) in enumerate(zip(got["rows"], want["rows"])):
        assert g == w, f"{name}: row {i} diverged: {g} != {w}"


def _topk_ids(df):
    return [r.vec_id for r in df.collect()]


def test_ann_lsh_recall_vs_bruteforce(spark):
    """Banded LSH (16 tables x 4 planes) must reach a recall floor against
    the exact top-10 even on this corpus, whose nearest neighbors are only
    ~0.37 cosine (no planted near-dups — the hard case for LSH); recovered
    ids must score identically to brute force."""
    exact = QUERIES["embedding_cosine_topk"](spark, SF_DIR)
    approx = QUERIES["ann_lsh_topk"](spark, SF_DIR)
    exact_rows = {r.vec_id: r.similarity for r in exact.collect()}
    approx_rows = {r.vec_id: r.similarity for r in approx.collect()}
    hits = set(approx_rows) & set(exact_rows)
    recall = len(hits) / len(exact_rows)
    assert recall >= 0.6, f"recall@10 = {recall}"
    for vid in hits:
        assert abs(approx_rows[vid] - exact_rows[vid]) < 1e-6


def test_ann_ivf_recall_vs_bruteforce(spark):
    """IVF with nprobe=4 of 8 centroids must reach high recall@10 on the
    sf0.01 corpus; scores for recovered ids must match brute force."""
    exact = QUERIES["embedding_cosine_topk"](spark, SF_DIR)
    approx = QUERIES["ann_ivf_topk"](spark, SF_DIR)
    exact_ids = _topk_ids(exact)
    approx_ids = _topk_ids(approx)
    recall = len(set(exact_ids) & set(approx_ids)) / len(exact_ids)
    assert recall >= 0.7, f"recall@10 = {recall}"
    exact_scores = {r.vec_id: r.similarity for r in exact.collect()}
    for r in approx.collect():
        if r.vec_id in exact_scores:
            assert abs(r.similarity - exact_scores[r.vec_id]) < 1e-6
