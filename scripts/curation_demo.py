"""End-to-end pretraining-data curation demo — the whole engine in one run.

Chains the real operators over the driver-provided corpus exactly the way
a production run would:

  read -> quality gate (Gopher rules) -> exact keep-best dedup ->
  MinHash near-dup dedup -> Bloom-prefiltered decontamination ->
  temperature mixture flattening -> BPE segmentation -> sequence packing
  -> versioned training-shard write (+ snapshot tag) -> audit report
  (per-stage survivor counts, PII scan, drift check vs the raw corpus).

Run:  python scripts/curation_demo.py [sf_dir] [out_dir]
Prints one JSON report line; exits non-zero if any pipeline invariant
fails (a stage losing everything, PII leaking past redaction).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run(spark, sf_dir: str, out_dir: str) -> dict:
    from etl_mark1_spark.functions.text import gopher_quality_flags
    from etl_mark1_spark.operators.bloom import bloom_semi_filter
    from etl_mark1_spark.operators.bpe import bpe_segment, bpe_train
    from etl_mark1_spark.operators.corpus import (pack_sequences, redact_pii,
                                                  temperature_mixture)
    from etl_mark1_spark.operators.dedup import (dedup_keep_best,
                                                 minhash_dedup, word_ngrams)
    from etl_mark1_spark.functions.text import normalized_text
    from etl_mark1_spark.plans.quality import ks_drift, pii_scan
    from etl_mark1_spark.sources.versioned import (tag_version, write_version)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stages = {"raw": docs.count()}

    # 1. rule-based quality gate — the non-length Gopher rules plus a
    # corpus-scaled word-count floor (the synthetic docs run ~30 words,
    # under Gopher's web-scale 50-word minimum; a real corpus would gate
    # on the full battery's `keep`)
    flags = gopher_quality_flags(docs)
    passed = flags.filter(
        "ok_mean_word_len AND ok_symbol_ratio AND ok_alpha_words "
        "AND n_words >= 20").select("doc_id")
    gated = docs.join(passed, "doc_id", "left_semi")
    stages["quality_gate"] = gated.count()

    # 2. exact dedup, keeping the longest copy per normalized text
    keyed = gated.withColumn("_k", normalized_text("text"))
    exact = dedup_keep_best(keyed, key_col="_k", score_col="n_chars",
                            id_col="doc_id").drop("_k")
    stages["exact_dedup"] = exact.count()

    # 3. near-dup dedup: keep each MinHash cluster's representative
    clusters = minhash_dedup(exact, threshold=0.8)
    reps = clusters.filter(F.col("doc_id") == F.col("cluster_id")) \
        .select("doc_id")
    near = exact.join(reps, "doc_id", "left_semi")
    stages["near_dedup"] = near.count()

    # 4. decontamination vs the src0 'benchmark' slice (Bloom prescreen)
    grams = near.select(
        "doc_id", "source",
        F.explode(word_ngrams(F.col("text"), 6)).alias("gram"))
    ref = grams.filter(F.col("source") == "src0").select("gram").distinct()
    corpus_grams = grams.filter(F.col("source") != "src0")
    hits = bloom_semi_filter(corpus_grams, ref, "gram") \
        .select("doc_id").distinct()
    clean = (near.filter(F.col("source") != "src0")
             .join(hits, "doc_id", "left_anti"))
    stages["decontaminated"] = clean.count()

    # 5. PII redaction, then flatten the source mixture (alpha=0.7)
    redacted = redact_pii(clean).drop("text") \
        .withColumnRenamed("clean_text", "text")
    mixed = temperature_mixture(redacted, alpha=0.7)
    stages["mixture"] = mixed.count()

    # 6. learn a BPE vocabulary on the survivors, segment, pack
    merges = bpe_train(mixed, num_merges=30)
    segmented = bpe_segment(mixed, merges).withColumn(
        "n_tokens", F.size("bpe_tokens"))
    packed = pack_sequences(segmented, budget=512, size_col="n_tokens",
                            shard_col="lang")
    stages["packed_sequences"] = packed.select("lang", "seq_id") \
        .distinct().count()

    # 7. versioned shard write + tag
    table = os.path.join(out_dir, "train_shards")
    version = write_version(
        packed.select("doc_id", "lang", "source", "seq_id", "n_tokens",
                      "bpe_tokens"),
        table, note="curation_demo")
    tag_version(table, "demo", version)

    # 8. audits: PII must be gone; length distribution drift vs raw
    leaks = (pii_scan(mixed, columns=["text"])
             .agg(F.sum("n_hits")).first()[0]) or 0
    drift = ks_drift(docs.select(F.length("text").alias("v")),
                     mixed.select(F.length("text").alias("v")),
                     "v").first()

    report = {
        "stages": stages,
        "bpe_merges": len(merges),
        "version": version,
        "pii_hits_after_redaction": int(leaks),
        "length_ks_vs_raw": float(drift.ks_stat),
        "ok": bool(stages["packed_sequences"] > 0 and leaks == 0
                   and all(v > 0 for v in stages.values())),
    }
    return report


def main() -> int:
    import tempfile

    from etl_mark1_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curation_demo_")
    spark = get_spark(app_name="curation_demo")
    try:
        report = run(spark, sf_dir, out_dir)
    finally:
        spark.stop()
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
