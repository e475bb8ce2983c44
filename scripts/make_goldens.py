"""Regenerate committed goldens for the rows-only catalog entries.

The DuckDB oracle can't express these (LSH banding, SimHash, fake media
codec), so their sf0.01 outputs are snapshotted here and committed under
``tests/goldens/``; ``tests/test_goldens.py`` replays each entry and
compares exactly. Run this ONLY when an intentional semantic change is made,
and say why in the commit.

Usage: python scripts/make_goldens.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_ENTRIES = (
    "minhash_neardup",
    "ngram_jaccard_neardup",
    "simhash_docs",
    "simhash_neardup",
    "embedding_neardup",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "multimodal_image_features",
    "multimodal_bmp_decode",
    "multimodal_jpeg_decode",
    "multimodal_png_decode",
    "multimodal_gif_decode",
    "multimodal_video_frames",
    "bpe_train_merges",
    "bpe_segment_docs",
    "pca_embeddings",
    "multimodal_wav_decode",
    "cross_corpus_decontam",
    "text_compression_ratio",
    "audio_spectral_wav",
    "multimodal_resize_images",
)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")


def canon_rows(df) -> list[list]:
    """Rows as sorted lists of JSON-safe values (floats rounded to 6dp so
    nondeterministic summation order can't flap the golden)."""
    def c(v):
        if isinstance(v, float):
            return round(v, 6)
        if isinstance(v, (list, tuple)):
            return [c(x) for x in v]
        if isinstance(v, bytes):
            import hashlib
            return "bytes:" + hashlib.md5(v).hexdigest()
        return v

    cols = sorted(df.columns)
    rows = [[c(row[k]) for k in cols] for row in df.collect()]
    rows.sort(key=lambda r: json.dumps(r, default=str))
    return {"columns": cols, "rows": rows}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or GOLDEN_ENTRIES

    from etl_mark1_spark import get_spark
    from etl_mark1_spark.catalog import QUERIES

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    spark = get_spark(app_name="make_goldens")
    for name in names:
        data = canon_rows(QUERIES[name](spark, sf_dir))
        path = os.path.join(GOLDEN_DIR, f"{name}.json")
        with open(path, "w") as fh:
            json.dump(data, fh, separators=(",", ":"), default=str)
            fh.write("\n")
        print(f"wrote {path} ({len(data['rows'])} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
