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
DRIVER_PREFIX_ROUND = 13

#: Round-13 driver prefix (50 slots). CORRECTNESS_r12 landed fully green
#: (50/50, all hash-exact — the stale backlog emptied), so there are no
#: re-tests; composition per the staged round-13 plan:
#:   * 4 SENTINELS at the head. q1_pricing_summary is the standing
#:     regression canary (green r1-5, r8-r12); the other three are
#:     r12-confirmed entries whose IMPLEMENTATION CODE CHANGED this
#:     round and therefore need re-confirmation, not mere freshness:
#:     bm25_persisted_search_docs (write_search_index now also emits the
#:     max-impact dict segment; the query path refactored onto shared
#:     tombstone-aware helpers), retrieval_ndcg_eval (ndcg_at_k's
#:     empty-ranking coalesce fix), hybrid_rrf_search_docs (bm25_topk's
#:     engine-side query-term case fold).
#:   * 8 NEW round-13 entries (catalog/index_maintenance.py) — the
#:     persisted-index maintenance lifecycle: index_delete_query_docs
#:     (tombstone deletion; delete-then-query == build-from-survivors),
#:     index_compact_query_docs (compaction applies tombstones, queries
#:     drop the anti-join), bm25_maxscore_search_docs (rank-safe
#:     MaxScore early termination), phrase_search_persisted_docs +
#:     snippet_persisted_docs (persisted positional postings — phrase
#:     and proximity queries without re-tokenizing),
#:     qlm_persisted_search_docs (Dirichlet QLM on the tokenize-once
#:     path, |C| from the stats segments), hybrid_rrf_persisted_docs
#:     (RRF fusing BM25 + conjunctive off the same persisted index —
#:     one ingest, many rankers), and
#:     streaming_index_ingest_docs (foreachBatch ingest straight into
#:     the search index, replay-idempotent by dynamic partition
#:     overwrite).
#:   * 10 MORE new round-13 entries (catalog/query_side.py, landed in
#:     the round's second half) — the persisted index's query language:
#:     boolean_search_persisted_docs (must/should/must_not + BM25),
#:     fuzzy_search_persisted_docs (Levenshtein-1 vocabulary expansion),
#:     more_like_this_docs (document-as-query, tf·idf term selection),
#:     prf_search_docs (pseudo-relevance feedback, weighted BM25),
#:     prefix_complete_docs (dict-only autocomplete),
#:     decontam_index_delete_docs (decontamination hits → tombstone
#:     deletion → query == build-from-clean-corpus, the end-to-end
#:     curation loop), query_string_search_docs (the parsed
#:     Lucene-style surface: must + phrase + exclusion + fuzzy in one
#:     query over the positional index), faceted_search_docs
#:     (match-bounded facet counts), search_after_page2_docs (cursor
#:     pagination == OFFSET/LIMIT on the total order), and
#:     index_stats_docs (metadata-only introspection == from-scratch
#:     counts).
#:   * 2 vector-side round-13 entries: ann_ivf_delete_topk (IVF
#:     tombstone deletion — full probe over survivors == brute force,
#:     catalog/index_maintenance.py) and hybrid_text_vector_docs (the
#:     RAG shape: persisted BM25 + persisted IVF cosine fused by RRF,
#:     catalog/query_side.py).
#:   * 3 final round-13 entries: batch_search_docs (many queries, one
#:     pruned pass — per-qid window top-k) and serp_page_docs (BM25
#:     ranking joined with positional proximity snippets — the
#:     composed results page), both catalog/query_side.py; and
#:     streaming_ivf_ingest_topk (streaming ingest into the VECTOR
#:     index — idempotent (_centroid, seg) segments against fixed
#:     seeded centroids, catalog/index_maintenance.py).
#:   * The ENTIRE 19-name r6-confirmation era in oldest-first
#:     registration order (conditional_exprs ... q8_market_share) —
#:     after this round nothing on the confirmed board is older than r8.
#:   * 4 next-oldest refreshers — the r8 era's first names in
#:     registration order (window_topk_orders, streaming_dedup,
#:     bpe_roundtrip_docs + bm25_search_docs; the fifteen that made
#:     room for the query-language, vector, batch/serp, and
#:     streaming-vector entries — winsorize_prices,
#:     collocations_pmi_docs, quality_percentile_rank,
#:     dedup_keep_best_docs, ks_drift_values,
#:     multimodal_image_neardup, compact_versioned_docs,
#:     q11_important_parts, incremental_neardup_docs,
#:     temperature_mixture_sources, multi_quantiles_quantity,
#:     window_range_rolling, length_bucketed_batches_docs,
#:     collect_set_priorities, quality_lr_score_docs —
#:     rejoin the round-14 refresher queue at their registration spots;
#:     new-entry first-time confirmation outranks freshness per the
#:     standing policy, and every one of those names is already on the
#:     cumulative driver-confirmed board).
#:     bm25_search_docs stays: it doubles as the re-confirmation of
#:     bm25_topk's case-fold change.
#: If CORRECTNESS_r13 fails to land, re-run THIS prefix in round 14 —
#: never rotate past an unsampled prefix.
#:
#: ROUND-14 PLAN: (a) any r13 reds at the head, (b) 2+ sentinels,
#: (c) new round-14 additions, (d) the remaining 44 r8-era refreshers
#: in registration order (winsorize_prices, collocations_pmi_docs,
#: quality_percentile_rank, dedup_keep_best_docs, ks_drift_values,
#: multimodal_image_neardup, compact_versioned_docs,
#: q11_important_parts, incremental_neardup_docs,
#: temperature_mixture_sources, multi_quantiles_quantity,
#: window_range_rolling, length_bucketed_batches_docs,
#: collect_set_priorities, quality_lr_score_docs — the fifteen
#: displaced by the round-13 search/vector tranche — then
#: image_exif_docs, image_autorotate_docs,
#: funnel_conversion_events,
#: cohort_retention_events, weighted_sample_docs, epoch_shuffle_docs,
#: edit_distance_join_customers, nb_lang_classifier,
#: fuzzy_dedup_customers, url_normalize_docs, domain_stats_docs,
#: blocklist_filtered_docs, robots_filter_docs, html_strip_docs,
#: html_links_docs, html_main_content_docs, warc_ingest_docs,
#: html_metadata_docs, decode_bytes_docs, mojibake_repair_docs,
#: sniff_mime_docs, unicode_nfc_docs, dedup_lines_docs,
#: remove_common_lines_docs, corpus_datacard, script_profile_docs,
#: split_sentences_docs, sentence_decontam_docs, webdataset_ingest_docs),
#: then the r9 era.
DRIVER_PREFIX = [
    "q1_pricing_summary",
    "bm25_persisted_search_docs",
    "retrieval_ndcg_eval",
    "hybrid_rrf_search_docs",
    "index_delete_query_docs",
    "index_compact_query_docs",
    "bm25_maxscore_search_docs",
    "phrase_search_persisted_docs",
    "snippet_persisted_docs",
    "qlm_persisted_search_docs",
    "hybrid_rrf_persisted_docs",
    "streaming_index_ingest_docs",
    "boolean_search_persisted_docs",
    "fuzzy_search_persisted_docs",
    "more_like_this_docs",
    "prf_search_docs",
    "prefix_complete_docs",
    "decontam_index_delete_docs",
    "query_string_search_docs",
    "faceted_search_docs",
    "search_after_page2_docs",
    "index_stats_docs",
    "ann_ivf_delete_topk",
    "hybrid_text_vector_docs",
    "batch_search_docs",
    "serp_page_docs",
    "streaming_ivf_ingest_topk",
    "conditional_exprs",
    "regexp_extract_groups",
    "rolling_median_price",
    "window_rank_family",
    "boilerplate_ngrams",
    "histogram_prices",
    "column_entropy",
    "corr_stats",
    "spearman_qty_price",
    "mi_status_priority",
    "chi2_status_priority",
    "weighted_sample_quality",
    "upsert_orders",
    "pii_scan_docs",
    "pit_scd2_orders",
    "scd2_customers",
    "zorder_values",
    "q4_late_orders",
    "q8_market_share",
    "window_topk_orders",
    "streaming_dedup",
    "bpe_roundtrip_docs",
    "bm25_search_docs",
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
