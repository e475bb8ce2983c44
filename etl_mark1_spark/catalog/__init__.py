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
)

#: Round number that authored the prefix below: the rotation meta-test in
#: tests/test_entry_contract.py only counts CORRECTNESS snapshots from
#: rounds STRICTLY BEFORE this one when classifying prefix entries as
#: fresh vs sentinel (the round-8 lesson: globbing ALL snapshots made the
#: meta-test fail the moment the current round's snapshot landed on disk).
DRIVER_PREFIX_ROUND = 9

#: Round-9 driver prefix (50 slots) — the second half of the two-rotation
#: plan staged in round 8; CORRECTNESS_r08 landed and confirmed 49 of the
#: r8 prefix's 50 slots, so this prefix now covers everything that round
#: left unsampled:
#:   * 1 RE-TEST at the head — domain_capped_docs, the single r8 red:
#:     DuckDB's sum(BIGINT) -> HUGEINT canonicalizes as float64 in the
#:     driver's pandas carrier vs Spark's int64 (equal values, different
#:     hash). The oracle now CASTs to BIGINT (catalog/web_curation.py) and
#:     a DESCRIBE sweep refuses hostile oracle carriers catalog-wide; this
#:     slot is the external re-confirmation.
#:   * 1 SENTINEL — q1_pricing_summary, driver-green r1-5 and r8,
#:     untouched since; keeps old entries under external regression
#:     coverage (the policy's second previously-confirmed entry is the
#:     re-test above).
#:   * 43 HOLDOVERS — the round-7 prefix's fresh entries (that snapshot
#:     never ran): TPC-H completions q2/q12/q13/q16/q17/q19/q20/q21/q22,
#:     the sketch + drift families, the graph trio, corpus-prep and
#:     curation chains, streaming_session_window.
#:   * 5 of the 6 round-8 family-redundant DEFERRALS: audio/video
#:     near-dup, weighted_sample_per_lang, seasonal_decompose_interp,
#:     bigram_lm_score. sample_per_group_lang stays out (the one slot
#:     short): stratified sampling is covered by weighted_sample_docs
#:     (driver-green r8) + weighted_sample_per_lang (this prefix), and it
#:     is pinned locally by the strict gate + pytest.
#: After THIS snapshot confirms, every oracle-exact entry except
#: sample_per_group_lang has been externally sampled at least once. If
#: CORRECTNESS_r09 fails to land, re-run THIS prefix in round 10 —
#: never rotate past an unsampled prefix.
#:
#: GROWTH FREEZE HOLDS (round 9): the catalog stays at 228 entries until
#: this rotation's snapshot confirms; additions resume in round 10 only
#: up to rotation headroom.
#:
#: ROUND-10 PLAN (staged now for continuity): once CORRECTNESS_r09
#: lands, build the next prefix as (a) any r9 reds at the head, (b) 2+
#: previously-green sentinels, (c) sample_per_group_lang — after r9 the
#: single never-sampled oracle-exact entry — and (d) new round-10
#: additions up to the ~46-slot headroom; every new entry ships
#: oracle-exact (or checker-golden with a one-line justification) and
#: driver-safe on BOTH sides of the carrier sweeps. If CORRECTNESS_r09
#: does NOT land, re-run THIS prefix unchanged and keep the freeze.
DRIVER_PREFIX = [
    "domain_capped_docs",
    "q1_pricing_summary",
    "q12_priority_lateness",
    "q13_order_distribution",
    "q16_supplier_count",
    "q17_small_quantity",
    "q19_disjunctive_revenue",
    "q20_bulk_suppliers",
    "q21_sole_late_supplier",
    "q22_dormant_customers",
    "q2_best_price_supplier",
    "distinct_rollup_daily",
    "heavy_hitter_types",
    "incremental_agg_orders",
    "unpivot_part_metrics",
    "regr_price_quantity",
    "fuzzy_match_names",
    "continuous_aggregate_daily",
    "window_distinct_running",
    "cohort_retention",
    "token_repetition",
    "text_char_entropy",
    "pagerank_parts",
    "connected_components_parts",
    "triangle_count_parts",
    "funnel_view_click_purchase",
    "unigram_lm_score",
    "psi_drift_chars",
    "robust_outliers_orders",
    "cross_corpus_decontam",
    "bloom_contaminated_docs",
    "duplicate_spans_docs",
    "strip_dup_spans_docs",
    "vocab_top_tokens",
    "encode_tokens_docs",
    "ann_int8_topk",
    "gopher_quality_docs",
    "repetition_profile_docs",
    "dsir_importance_docs",
    "knn_join_embeddings",
    "cms_event_counts",
    "setsim_join_docs",
    "token_budget_mixture",
    "curation_quality_chain",
    "streaming_session_window",
    "multimodal_audio_neardup",
    "multimodal_video_neardup",
    "weighted_sample_per_lang",
    "seasonal_decompose_interp_events",
    "bigram_lm_score",
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
