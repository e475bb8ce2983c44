"""Product quantization / IVF-PQ (operators/similarity.py — Jégou et al.
2011): codebook assignment parity, ADC losslessness on a code-exact
corpus, persisted round trip with partition-pruned probes, and exact
refine equivalence."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_mark1_spark.operators.similarity import (cosine_topk, ivfpq_index_append,
                                                  ivfpq_index_read,
                                                  ivfpq_index_write,
                                                  ivfpq_refine, ivfpq_topk,
                                                  pq_adc_lut, pq_adc_topk,
                                                  pq_encode, pq_train)


def _vec_rows(rng, n, dim=8, offset=0):
    return [(offset + i, [rng.uniform(-1, 1) for _ in range(dim)])
            for i in range(n)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_pq_encode_matches_python_argmin(spark):
    """Nearest-code assignment (lowest id on ties) must match a
    from-first-principles python scan, per subspace."""
    rng = random.Random(5)
    rows = _vec_rows(rng, 30, dim=8)
    df = _df(spark, rows)
    books = pq_train(df, m=4, ksub=4, seed=9)
    assert len(books) == 4 and all(len(b) == 4 for b in books)
    assert all(len(c) == 2 for b in books for c in b)
    got = {r["vec_id"]: np.frombuffer(r["pq_code"], dtype=np.uint8)
           for r in pq_encode(df, books).collect()}
    for vid, vec in rows:
        for j in range(4):
            sub = np.asarray(vec[j * 2:(j + 1) * 2])
            d = [((np.asarray(c) - sub) ** 2).sum() for c in books[j]]
            assert got[vid][j] == int(np.argmin(d)), (vid, j)


def test_pq_train_deterministic(spark):
    rng = random.Random(6)
    df = _df(spark, _vec_rows(rng, 40, dim=8))
    b1 = pq_train(df, m=2, ksub=8, seed=3)
    b2 = pq_train(df, m=2, ksub=8, seed=3)
    assert b1 == b2


def test_pq_adc_exact_when_codebook_covers_corpus(spark):
    """When every subspace has at most ksub distinct sub-vectors, PQ is
    lossless: ADC distances equal exact squared L2 and the ADC top-k is
    the exact top-k."""
    rng = random.Random(8)
    # sub-vector vocabulary of 4 values per subspace, dim 4, m 2
    vocab = [[rng.uniform(-1, 1) for _ in range(2)] for _ in range(4)]
    rows = [(i, vocab[rng.randrange(4)] + vocab[rng.randrange(4)])
            for i in range(24)]
    df = _df(spark, rows)
    books = pq_train(df, m=2, ksub=4, seed=1)
    codes = pq_encode(df, books)
    q = [0.1, -0.2, 0.3, 0.4]
    got = [(r["vec_id"], r["adc_dist"])
           for r in pq_adc_topk(codes, books, q, k=5).collect()]
    exact = sorted((round(float(((np.asarray(v) - np.asarray(q)) ** 2)
                                .sum()), 6), i) for i, v in rows)[:5]
    assert got == [(i, d) for d, i in exact]


def test_ivfpq_round_trip_refine_equals_exact(spark, tmp_path):
    """Persist -> reopen -> probe ALL centroids -> ADC shortlist ->
    exact refine must equal brute-force L2 top-k, and a pruned probe
    must carry a _centroid partition filter."""
    rng = random.Random(13)
    rows = _vec_rows(rng, 60, dim=8)
    df = _df(spark, rows)
    path = str(tmp_path / "ivfpq")
    ivfpq_index_write(df, path, num_centroids=4, m=4, ksub=16, seed=2)
    codes, cents, books = ivfpq_index_read(spark, path)
    assert codes.count() == 60

    short = ivfpq_topk(codes, cents, books, [0.0] * 8, k=30,
                       nprobe=len(cents))
    got = [(r["vec_id"], r["l2_dist"]) for r in
           ivfpq_refine(short, df, [0.0] * 8, k=5).collect()]
    exact = sorted((round(float((np.asarray(v) ** 2).sum() ** 0.5), 6), i)
                   for i, v in rows)[:5]
    assert got == [(i, d) for d, i in exact]

    pruned = ivfpq_topk(codes, cents, books, [0.0] * 8, k=5, nprobe=2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [_centroid" in plan and " IN (" in plan, plan


def test_ivfpq_append_finds_new_vectors(spark, tmp_path):
    """Incremental add: appended vectors are assigned to existing
    centroids/codebooks and show up in a full probe."""
    rng = random.Random(21)
    base = _vec_rows(rng, 40, dim=8)
    df = _df(spark, base)
    path = str(tmp_path / "ivfpq_a")
    ivfpq_index_write(df, path, num_centroids=4, m=4, ksub=8, seed=7)
    new = _df(spark, _vec_rows(rng, 10, dim=8, offset=100))
    ivfpq_index_append(spark, path, new)
    codes, cents, books = ivfpq_index_read(spark, path)
    assert codes.count() == 50
    ids = {r["vec_id"] for r in
           ivfpq_topk(codes, cents, books, [0.0] * 8, k=50,
                      nprobe=len(cents)).collect()}
    assert {100 + i for i in range(10)} <= ids


def test_pq_encode_rejects_oversized_codebook(spark):
    with pytest.raises(ValueError):
        pq_encode(_df(spark, [(1, [0.0, 0.0])]),
                  [[[0.0, 0.0]] * 257])


def test_ivfpq_recall_reasonable_on_random_corpus(spark, tmp_path):
    """Recall floor on genuinely lossy settings (random corpus, m=4
    subspaces of dim 2, nprobe half the lists): ADC+refine top-10 must
    recover a healthy fraction of the exact top-10."""
    rng = random.Random(33)
    rows = _vec_rows(rng, 200, dim=8)
    df = _df(spark, rows)
    path = str(tmp_path / "ivfpq_r")
    ivfpq_index_write(df, path, num_centroids=8, m=4, ksub=16, seed=4)
    codes, cents, books = ivfpq_index_read(spark, path)
    q = rows[0][1]
    short = ivfpq_topk(codes, cents, books, q, k=50, nprobe=4)
    got = {r["vec_id"] for r in ivfpq_refine(short, df, q, k=10).collect()}
    exact = {i for _, i in sorted(
        (float(((np.asarray(v) - np.asarray(q)) ** 2).sum()), i)
        for i, v in rows)[:10]}
    assert len(got & exact) / 10 >= 0.5, got
