"""Query catalog: every implemented operator as a (spark, sf_dir) -> DataFrame
callable plus, where SQL-expressible, a DuckDB oracle SQL string.

This is the driver contract behind ``__spark_entry__.py`` (SURVEY.md §5.2) and
doubles as the repo's example gallery. The catalog was a single 5,600-line
module through round 5; it is now a package of per-family modules imported in
a fixed order below (which preserves the historical registration order), after
which ``DRIVER_PREFIX`` rotates a chosen 50 oracle-exact entries to the front.

Why the rotation: the external driver's CORRECTNESS snapshot hash-checks only
the FIRST 50 registered entries each round. Rounds 1–5 accumulated 72
driver-confirmed names; rotating the prefix toward never-checked entries each
round grows the driver-confirmed union (118 of 197 after round 6). From round
7 the prefix also keeps a few previously-confirmed SENTINEL entries so
driver-side regressions in old entries stay detectable (the rotation policy
plus this tradeoff is documented here, where the driver owner can see it).
The guard tests in ``tests/test_entry_contract.py`` pin the invariants.

OUTPUT-TYPING CONVENTION (all oracle-exact entries; conformance-swept by
``tests/test_entry_contract.py::test_oracle_outputs_driver_safe_types``):
the driver canonicalizes results with pandas (sort_values + value hash), so
final output columns must stick to scalar, engine-portable carrier types.

1. No ARRAY or MAP output columns — pandas ``sort_values`` raises
   ``TypeError: unhashable type`` on list cells. Emit the canonical scalar
   instead: sort-then-``array_join`` for set-valued results, one column per
   element for fixed-width results (quantile batteries). Operators may — and
   do — return real array columns; only the CATALOG ENTRY projection joins
   them.
2. No DECIMAL with precision > 18 in final output — Spark's Decimal vs the
   oracle engine's carrier type hash differently despite equal values
   (every round-6 driver-red decimal had precision > 18; every green one was
   ≤ 18 or DOUBLE). Keep exact decimals INTERNALLY (threshold comparisons,
   accumulations), then ``round(x, n)`` and ``CAST AS DOUBLE`` the final
   column on BOTH the Spark and oracle sides.
3. Aggregated counts are ``CAST(... AS BIGINT)`` on both sides; floats are
   rounded to a stated precision before output whenever partial-merge order
   could differ between engines.
"""

from __future__ import annotations

from etl_mark1_spark.catalog._registry import (  # noqa: F401
    ORACLE,
    QUERIES,
    TABLES,
    query,
    register_views,
    t,
)

# Family modules, imported in the original single-file order so that the
# pre-rotation registration order is exactly what rounds 1-5 shipped.
from etl_mark1_spark.catalog import (  # noqa: E402, F401
    flagship_steps,
    sql_joins,
    windows_rollup,
    events_streaming,
    profiling_pipeline,
    text_analysis,
    dedup_similarity,
    corpus_prep,
    pdf_entries,
    sql_extended,
    temporal_joins,
    sessionize_salted,
    sql_surface,
    stats_cdc,
    tpch_completion,
    sketches_rollups,
    behavior_graph,
    curation_quality,
    search_mixture,
    rows_only_approx,
    multimodal_entries,
    analytics_sampling,
    web_curation,
    html_extraction,
    encoding_entries,
    line_dedup,
    script_entries,
    sentence_entries,
    webdataset_entries,
    training_audit,
    index_lifecycle,
    retrieval_quality,
    index_maintenance,
    query_side,
)

#: Round number that authored the prefix below: the rotation meta-test in
#: tests/test_entry_contract.py only counts CORRECTNESS snapshots from
#: rounds STRICTLY BEFORE this one when classifying prefix entries as
#: fresh vs sentinel (the round-8 lesson: globbing ALL snapshots made the
#: meta-test fail the moment the current round's snapshot landed on disk).
DRIVER_PREFIX_ROUND = 14

#: Round-14 driver prefix (50 slots). CORRECTNESS_r13 landed fully green
#: (50/50), so there are no re-tests. This is an OPTIMIZATION round: no
#: new features, but three operator families were REWORKED for
#: performance and need driver re-confirmation, plus VERDICT r13 item 4
#: explicitly asked for the round-13 reworked operators (which the
#: rotation never driver-sampled) to enter the checked prefix.
#: Composition:
#:   * q1_pricing_summary — the standing regression canary (sentinel).
#:   * index_ingest_docs — the ONE fresh never-checked entry (new this
#:     round: ingest-isolation measurement, VERDICT r13 item 8).
#:   * 12 round-13-reworked operators per VERDICT item 4: minhash,
#:     triangle, pagerank, connected-components, incremental near-dup,
#:     broadcast decontam, longest-dup-span, seasonal/resample family,
#:     ngram novelty — all ALSO touched by this round's gram-builder or
#:     graph-degree rework.
#:   * 15 gram-builder (bind_once) re-confirmations: every oracle-exact
#:     entry whose lineage reaches char_shingles / word_ngrams /
#:     word_ngram_col / _positioned_grams / repetition_profile, which
#:     round 14 rewrote to evaluate their inputs once per row.
#:   * 16 postings-path re-confirmations: the build/merge/incremental
#:     dictionary entries and the whole persisted-index family, whose
#:     build_scored_postings round 14 rewrote (explode + dl-on-group-key
#:     instead of per-document RLE).
#:   * 5 r8-era refreshers from the standing queue (winsorize_prices,
#:     quality_percentile_rank, dedup_keep_best_docs, ks_drift_values,
#:     q11_important_parts).
#: Every non-fresh name here is on the cumulative driver-confirmed
#: board (290 names through r13), so the meta-test floor
#: (min(40, pool)=1 fresh) is met by index_ingest_docs and the rest act
#: as code-change re-confirmations — which is the point this round.
#: If CORRECTNESS_r14 fails to land, re-run THIS prefix in round 15 —
#: never rotate past an unsampled prefix.
#:
#: ROUND-15 PLAN: (a) any r14 reds at the head, (b) 2+ sentinels,
#: (c) new round-15 additions, (d) the remaining r8-era refreshers in
#: registration order (see the r13 note in git history for the full
#: queue), then the r9 era.
DRIVER_PREFIX = [
    "q1_pricing_summary",
    "index_ingest_docs",
    "minhash_neardup",
    "triangle_count_parts",
    "pagerank_parts",
    "connected_components_parts",
    "incremental_neardup_docs",
    "broadcast_decontam_docs",
    "longest_dup_span_docs",
    "seasonal_decompose_events",
    "resample_ffill_events",
    "resample_interpolate_events",
    "seasonal_decompose_interp_events",
    "ngram_novelty_docs",
    "ngram_jaccard_neardup",
    "duplicate_spans_docs",
    "strip_spans_keep_first_docs",
    "curation_quality_chain",
    "curation_pipeline",
    "curation_chunks",
    "repetition_profile_docs",
    "boilerplate_ngrams",
    "contamination_ngram",
    "cross_corpus_decontam",
    "broadcast_decontam_fixed_ref",
    "bigram_lm_score",
    "collocations_pmi_docs",
    "decontam_rate_by_source",
    "bloom_contaminated_docs",
    "index_build_tf_docs",
    "index_merge_parity_docs",
    "index_incremental_docs",
    "index_segment_report_docs",
    "bm25_persisted_search_docs",
    "index_delete_query_docs",
    "index_compact_query_docs",
    "bm25_maxscore_search_docs",
    "decontam_index_delete_docs",
    "prf_search_docs",
    "streaming_index_ingest_docs",
    "qlm_persisted_search_docs",
    "phrase_search_persisted_docs",
    "snippet_persisted_docs",
    "boolean_search_persisted_docs",
    "query_string_search_docs",
    "winsorize_prices",
    "quality_percentile_rank",
    "dedup_keep_best_docs",
    "ks_drift_values",
    "q11_important_parts",
]


def _rotate() -> None:
    missing = [n for n in DRIVER_PREFIX if n not in QUERIES]
    no_oracle = [n for n in DRIVER_PREFIX if n not in ORACLE]
    if missing or no_oracle:
        raise RuntimeError(
            f"DRIVER_PREFIX broken: unregistered={missing} rows-only={no_oracle}")
    head = set(DRIVER_PREFIX)
    order = list(DRIVER_PREFIX) + [n for n in QUERIES if n not in head]
    for mapping in (QUERIES, ORACLE):
        rotated = {n: mapping[n] for n in order if n in mapping}
        mapping.clear()
        mapping.update(rotated)


_rotate()

# Re-export every catalog callable at package level so historical references
# (``catalog.q1_pricing_summary`` in __spark_entry__, direct imports in
# tests/scripts) keep working unchanged after the split.
globals().update({fn.__name__: fn for fn in QUERIES.values()})
