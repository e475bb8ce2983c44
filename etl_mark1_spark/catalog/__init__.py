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

#: Round-8 driver prefix (50 slots). The round-7 snapshot NEVER RAN (no
#: CORRECTNESS_r07.json landed), so the r7 prefix's 43 fresh entries and
#: 4 re-tests are still externally unconfirmed — they move to the ROUND-9
#: prefix; this round prioritizes the other half of the never-sampled set
#: so two rotations cover everything regardless of which snapshots run:
#:   * 4 RE-TESTS — red in CORRECTNESS_r06 on output-type grounds (values
#:     verified identical row-for-row), fixed in round 7 but still never
#:     externally re-confirmed; kept at the head because they are the only
#:     entries the driver has ever marked wrong.
#:   * 3 SENTINELS — driver-green in rounds 1-5 and untouched since; kept
#:     in every prefix so old entries retain external regression coverage.
#:   * 43 FRESH — never appeared in any CORRECTNESS_r0x snapshot and NOT
#:     in the round-7 prefix (historical registration order): the 18
#:     pre-round-7 stragglers plus round 7's web/WARC/HTML/encoding/
#:     lines/sentences/script/webdataset/compaction/datacard/bpe-roundtrip/
#:     quality-lr/robots/exif additions. Six family-redundant members are
#:     deferred to round 9 to fit the 50 slots: multimodal_audio_neardup +
#:     multimodal_video_neardup (multimodal_image_neardup covers the shared
#:     banded-hamming LSH core), weighted_sample_per_lang +
#:     sample_per_group_lang (weighted_sample_docs covers the sampling
#:     family), seasonal_decompose_interp_events (the decompose core was
#:     driver-green in r6), bigram_lm_score (rides with unigram_lm_score
#:     in the r9 prefix).
#: Remaining never-sampled after THIS rotation is confirmed: the 43
#: r7-prefix holdovers (q12/q13/q16/q17/q19/q20/q21/q22/q2, the sketch
#: and drift family, the graph trio, the corpus-prep and curation-chain
#: entries, streaming_session_window — the r7-prefix names minus this
#: prefix's 7 carried re-tests/sentinels) + the 6 family-redundant
#: deferrals named above = 49 entries, which fit the round-9 prefix
#: exactly with one slot left for a sentinel (keep q1_pricing_summary).
#: If CORRECTNESS_r08 also fails to land, re-run THIS prefix in round 9
#: instead — never rotate past an unsampled prefix.
#:
#: ROUND-8 GROWTH FREEZE: the catalog holds at 228 entries this round —
#: zero additions — so the confirmation gap stops growing and the two
#: planned rotations (this prefix + the round-9 prefix above) cover every
#: oracle-exact entry ever registered. New operators resume in round 9
#: only up to that rotation's leftover headroom.
DRIVER_PREFIX = [
    # re-tests (r6 type-contract reds, fixed in r7, never re-sampled)
    "collect_set_priorities",
    "multi_quantiles_quantity",
    "window_range_rolling",
    "q11_important_parts",
    # sentinels (driver-green r1-5)
    "q1_pricing_summary",
    "window_topk_orders",
    "streaming_dedup",
    # fresh: never driver-checked, outside the r7 prefix
    "winsorize_prices",
    "ks_drift_values",
    "quality_percentile_rank",
    "cohort_retention_events",
    "funnel_conversion_events",
    "dedup_keep_best_docs",
    "fuzzy_dedup_customers",
    "edit_distance_join_customers",
    "nb_lang_classifier",
    "collocations_pmi_docs",
    "bm25_search_docs",
    "epoch_shuffle_docs",
    "length_bucketed_batches_docs",
    "temperature_mixture_sources",
    "weighted_sample_docs",
    "multimodal_image_neardup",
    "compact_versioned_docs",
    "incremental_neardup_docs",
    "url_normalize_docs",
    "domain_stats_docs",
    "domain_capped_docs",
    "blocklist_filtered_docs",
    "robots_filter_docs",
    "html_strip_docs",
    "html_links_docs",
    "html_metadata_docs",
    "html_main_content_docs",
    "decode_bytes_docs",
    "mojibake_repair_docs",
    "sniff_mime_docs",
    "unicode_nfc_docs",
    "dedup_lines_docs",
    "remove_common_lines_docs",
    "script_profile_docs",
    "split_sentences_docs",
    "sentence_decontam_docs",
    "quality_lr_score_docs",
    "bpe_roundtrip_docs",
    "warc_ingest_docs",
    "webdataset_ingest_docs",
    "image_exif_docs",
    "image_autorotate_docs",
    "corpus_datacard",
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
