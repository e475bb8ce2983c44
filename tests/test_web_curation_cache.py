"""Regression tests for the synth-URL localCheckpoint memoization
(round-10 ADVICE): the cache key must collide byte-identical reads.

The plain analyzed-plan string embeds per-read expression ids
(doc_id#2L vs doc_id#4L), so keying on it NEVER hit — every catalog
invocation of the ~8 web entries pinned a fresh localCheckpoint for the
session lifetime while the module-level dict held strong references
that kept ContextCleaner from reclaiming the blocks. Keying on the
canonicalized plan makes identical (sf_dir x column set) reads share
one frame, which is the footprint bound the docstring promises.
"""
from tests.conftest import SF_DIR


def _docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "lang", "source"))


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_synth_url_cache_hits_across_identical_reads(spark):
    from etl_mark1_spark.catalog import web_curation as wc

    first = wc._with_synth_urls(_docs(spark))
    first.count()
    entries_after_first = len(wc._SYNTH_CACHE)
    rdds_after_first = _persistent_rdd_count(spark)

    # Three more byte-identical (but freshly planned) reads: the cache
    # must return the SAME checkpointed frame and pin nothing new.
    for _ in range(3):
        again = wc._with_synth_urls(_docs(spark))
        assert again is first
    assert len(wc._SYNTH_CACHE) == entries_after_first
    assert _persistent_rdd_count(spark) == rdds_after_first


def test_synth_url_cache_distinguishes_column_sets(spark):
    from etl_mark1_spark.catalog import web_curation as wc

    wide = wc._with_synth_urls(_docs(spark).withColumnRenamed(
        "source", "src"))
    narrow = wc._with_synth_urls(_docs(spark))
    assert wide is not narrow
    assert "src" in wide.columns and "source" in narrow.columns
