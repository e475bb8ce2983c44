"""Multimodal plumbing + BPE + PCA (rows-only; deterministic decode).

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t

# ---------------------------------------------------------------------------
# Multimodal plumbing (extension; decode is a deterministic fake)
# ---------------------------------------------------------------------------

@query("multimodal_image_features")
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns end-to-end: synthesize payload+metadata, decode
    via mapInPandas (fake codec), emit typed features. Golden-replay check."""
    from etl_mark1_spark.operators.multimodal import attach_fake_media, decode_images

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return decode_images(attach_fake_media(docs))


@query("multimodal_wav_decode")
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: id-seeded PCM WAV sines generated
    executor-side, decoded (stdlib wave + numpy) into sample rate,
    duration, and normalized RMS. Golden-replay check."""
    from etl_mark1_spark.operators.multimodal import attach_wav_media, decode_audio

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return decode_audio(attach_wav_media(docs))


@query("multimodal_bmp_decode")
def multimodal_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: each row carries an actual 24-bit BMP
    (id-seeded gradient, generated executor-side), decoded by the built-in
    numpy parser into true dimensions, mean pixel, and a genuine 64-bit
    average-hash. No image library involved; golden-replay check."""
    from etl_mark1_spark.operators.multimodal import attach_bmp_media, decode_images

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return decode_images(attach_bmp_media(docs), codec="real")


@query("multimodal_jpeg_decode")
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode end-to-end with NO image library: each row carries
    an actual JPEG (id-seeded gradient; ids cycle 4:4:4 / 4:2:0 /
    restart-marker / progressive-SOF2 variants), decoded by the vendored
    pure-Python codec (operators/jpeg.py) into true dimensions, mean
    pixel, and a genuine 64-bit average-hash. Golden-replay check."""
    from etl_mark1_spark.operators.multimodal import (attach_jpeg_media,
                                                      decode_images)

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return decode_images(attach_jpeg_media(docs), codec="real")


@query("multimodal_png_decode")
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode end-to-end with NO image library: each row carries
    an actual PNG (id-seeded gradient; ids cycle RGB / grayscale / RGBA
    color types, rows cycle all five filters, every third id splits IDAT),
    decoded by the vendored pure-Python codec (operators/png.py, stdlib
    zlib inflate + numpy unfilter) into true dimensions, mean pixel, and a
    genuine 64-bit average-hash. Golden-replay check + lossless
    round-trip property fuzz in tests/test_property.py."""
    from etl_mark1_spark.operators.multimodal import (attach_png_media,
                                                      decode_images)

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return decode_images(attach_png_media(docs), codec="real")


@query("multimodal_gif_decode")
def multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode end-to-end with NO image library: each row carries
    an actual GIF (id-seeded palette pattern; palette sizes cycle
    4/16/97/256 so LZW code widths grow from every starting size, every
    third id is INTERLACED), decoded by the vendored pure-Python codec
    (operators/gif.py — GIF-variant LZW, dictionary resets, four-pass
    de-interlace) into true dimensions, mean pixel, and a genuine 64-bit
    average-hash. Golden-replay check + exact round-trip property fuzz in
    tests/test_property.py (GIF is lossless for palettized content)."""
    from etl_mark1_spark.operators.multimodal import (attach_gif_media,
                                                      decode_images)

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return decode_images(attach_gif_media(docs), codec="real")


@query("multimodal_video_frames")
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling with NO media library: each row carries
    an actual MJPEG AVI (id-seeded JPEG frames in the vendored RIFF
    container, operators/avi.py; frame counts and rates vary per id), and
    the frame nearest each 1000ms timestamp decodes through the vendored
    JPEG codec into true dimensions, mean pixel, and average-hash — the
    video-modality curation path (scene thumbnails, near-dup keys) made
    real end-to-end. Golden-replayed; container round-trip + sampling
    math in tests."""
    from etl_mark1_spark.operators.multimodal import (attach_avi_media,
                                                      sample_video_frames)

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return sample_video_frames(attach_avi_media(docs), every_ms=1000,
                               codec="real")


def _neardup_truth_sql(limit: int) -> str:
    """Ground-truth oracle for the planted near-dup corpora: the fixture
    assigns variants by ``doc_id % 3`` within groups of ``doc_id // 3``,
    so under PERFECT dedup the cluster-size histogram equals the group-size
    histogram of the id arithmetic — computable in plain SQL from the same
    ``documents`` slice the Spark entry reads. Any missed re-encode or
    cross-group hash collision changes the histogram and fails the hash."""
    return f"""
        SELECT n, count(*) AS clusters FROM (
            SELECT CAST(doc_id // 3 AS BIGINT) AS g,
                   count(*) AS n
            FROM (SELECT doc_id FROM documents
                  ORDER BY doc_id LIMIT {limit})
            GROUP BY g
        ) GROUP BY n ORDER BY n
    """


@query("multimodal_image_neardup", oracle=_neardup_truth_sql(300))
def multimodal_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate IMAGE dedup end-to-end: a planted corpus where
    doc_id // 3 picks the source pixels and doc_id % 3 the variant
    (original BMP / JPEG q85 re-encode / 2x upscaled BMP — real vendored
    codecs both ways), hashed with 64-bit dHash executor-side and
    clustered by the banded-hamming LSH shared with SimHash
    (operators/multimodal.py:image_neardup). Ground truth is the id
    arithmetic: the output is the cluster-size histogram and must be ONE
    row (n=3, clusters=100) — any under-grouping (missed re-encode) or
    over-merge (hash collision across sources) changes the shape. Payloads
    never shuffle; only 8-byte fingerprints enter the join."""
    from etl_mark1_spark.operators.multimodal import (
        attach_neardup_image_media, image_neardup)

    docs = t(spark, sf_dir, "documents").select("doc_id") \
        .orderBy("doc_id").limit(300)
    imgs = attach_neardup_image_media(docs)
    clusters = image_neardup(imgs, max_hamming=4)
    return (clusters.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("n").agg(F.count(F.lit(1)).alias("clusters")))


@query("multimodal_audio_neardup", oracle=_neardup_truth_sql(300))
def multimodal_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate AUDIO dedup end-to-end: a planted corpus where
    doc_id // 3 picks the tone mix and doc_id % 3 the encoding
    (PCM16 @ 16 kHz / G.711 mu-law re-encode / 2:1 decimated @ 8 kHz),
    fingerprinted with a 64-bit time-difference spectral hash (9 segments
    x 8 absolute-Hz log bands) and clustered by the same banded-hamming
    LSH as SimHash and image dHash. Output is the cluster-size histogram
    and must be ONE row (n=3, clusters=100); only 8-byte fingerprints
    enter the join."""
    from etl_mark1_spark.operators.multimodal import (
        attach_neardup_audio_media, audio_neardup)

    docs = t(spark, sf_dir, "documents").select("doc_id") \
        .orderBy("doc_id").limit(300)
    wavs = attach_neardup_audio_media(docs)
    clusters = audio_neardup(wavs, max_hamming=6)
    return (clusters.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("n").agg(F.count(F.lit(1)).alias("clusters")))


@query("multimodal_video_neardup", oracle=_neardup_truth_sql(150))
def multimodal_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate VIDEO dedup end-to-end: a planted MJPEG corpus
    where doc_id // 3 picks the frame content and doc_id % 3 the variant
    (JPEG q90 / q70 generation-loss re-encode / 2x-upscaled frames),
    fingerprinted as per-sampled-frame dHash SEQUENCES and clustered by
    the frame-aligned banded-hamming candidate join + sequence-overlap
    verify (operators/multimodal.py:video_neardup). Output is the
    cluster-size histogram and must be ONE row (n=3, clusters=50);
    only 12-byte (id, frame_idx, hash) rows shuffle, never frames."""
    from etl_mark1_spark.operators.multimodal import (
        attach_neardup_video_media, video_neardup)

    docs = t(spark, sf_dir, "documents").select("doc_id") \
        .orderBy("doc_id").limit(150)
    vids = attach_neardup_video_media(docs)
    clusters = video_neardup(vids, max_hamming=4, min_match_frac=0.8)
    return (clusters.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("n").agg(F.count(F.lit(1)).alias("clusters")))


@query("bpe_train_merges")
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARN a BPE subword vocabulary from the corpus
    (operators/bpe.py:bpe_train — the classic word-frequency algorithm
    behind GPT-2-style tokenizers): 30 ranked merges as (rank, left,
    right). Training touches the corpus once (the word-count aggregate);
    every iteration is a pair-explode + count over the unique-word table
    with a single-row top-pair collect. Deterministic (lexicographic tie
    break), so golden-replayed — and differential-tested against an
    independent pure-Python reference implementation in
    tests/test_corpus.py, which is a stronger check than any SQL
    oracle."""
    from etl_mark1_spark.operators.bpe import bpe_train, merges_df

    merges = bpe_train(t(spark, sf_dir, "documents"), num_merges=30)
    return merges_df(spark, merges)


@query("bpe_segment_docs")
def bpe_segment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment every document under the corpus-learned BPE merges
    (operators/bpe.py:bpe_segment): (doc_id, n_bpe_tokens, first_tokens).
    The merge chain applies as ranked map-side regexp passes — the same
    order as training, so segmentation is reproducible anywhere the
    merge list travels."""
    from etl_mark1_spark.operators.bpe import bpe_segment, bpe_train

    docs = t(spark, sf_dir, "documents")
    merges = bpe_train(docs, num_merges=30)
    seg = bpe_segment(docs, merges)
    return seg.select(
        "doc_id",
        F.size("bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.slice("bpe_tokens", 1, 8).alias("first_tokens"))


@query("pca_embeddings")
def pca_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA over the embedding table
    (operators/similarity.py:pca_fit/pca_project): per component, the
    covariance eigenvalue, the EMPIRICAL variance of the data projected
    onto that component (must match the eigenvalue — the defining
    property of principal axes, so the entry validates the whole
    fit+project path), and the cumulative explained-variance ratio.
    Vectors are read once as per-partition numpy Gram partials that
    tree-merge in-cluster to a single d^2-sized row; only that one row
    reaches the driver, where the d x d eigendecomposition runs. Differential-tested against numpy's full in-memory
    PCA in tests/test_dedup_similarity.py."""
    from etl_mark1_spark.operators.similarity import pca_fit, pca_project

    emb = t(spark, sf_dir, "embeddings")
    model = pca_fit(emb, k=8)
    proj = pca_project(emb, model, out_col="pca")
    emp = (proj.select(F.posexplode("pca").alias("i", "v"))
           .groupBy("i").agg((F.sum(F.col("v") * F.col("v"))
                              / F.lit(model["n"])).alias("emp_var")))
    total = sum(model["eigvals"])
    rows = spark.createDataFrame(
        [(i, float(model["eigvals"][i]),
          float(sum(model["eigvals"][:i + 1]) / total))
         for i in range(8)],
        "i int, eigval double, evr_cum double")
    return (rows.join(emp, "i")
            .select(F.col("i").cast("bigint").alias("component"),
                    F.round("eigval", 8).alias("eigval"),
                    F.round("emp_var", 8).alias("empirical_var"),
                    F.round("evr_cum", 6).alias("evr_cum")))




@query("audio_spectral_wav")
def audio_spectral_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral audio curation features end-to-end (round 6): id-seeded
    PCM WAV sines decoded into rms, zero-crossing rate, and spectral
    centroid/rolloff/bandwidth via numpy FFT in mapInPandas
    (operators/multimodal.py:audio_spectral_bytes) — the gate signals an
    audio pipeline filters on. The attach sines make the answer
    verifiable from first principles: a pure f-Hz tone's centroid is f
    and its zcr is 2f/rate (asserted in tests); this entry golden-replays
    the full distributed path. Rows-only: no SQL engine has an FFT."""
    from etl_mark1_spark.operators.multimodal import (attach_wav_media,
                                                      audio_features)

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return audio_features(attach_wav_media(docs))


@query("multimodal_resize_images")
def multimodal_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize end-to-end (round 6): JPEG payloads (4:4:4 /
    4:2:0 / restart / progressive variants) decode through the vendored
    codecs, bilinear-resample to 12x10 executor-side, re-encode as BMP,
    and flow straight back through decode_images — dims come from the
    REAL re-decoded payload, not metadata. Rows-only golden (resampling
    is not SQL-expressible)."""
    from etl_mark1_spark.operators.multimodal import (attach_jpeg_media,
                                                      decode_images,
                                                      resize_images)

    docs = t(spark, sf_dir, "documents").select("doc_id").limit(200)
    media = resize_images(attach_jpeg_media(docs), 12, 10, codec="real")
    return decode_images(media, codec="real")


@query("image_exif_docs", """
SELECT doc_id,
       CASE WHEN doc_id % 5 = 4 THEN NULL
            ELSE CAST(doc_id % 8 + 1 AS INT) END AS exif_orientation,
       CASE WHEN doc_id % 5 = 4 THEN NULL ELSE 'CamCo' END AS exif_make,
       CASE WHEN doc_id % 5 = 4 THEN NULL
            ELSE 'M' || (doc_id % 4) END AS exif_model,
       CASE WHEN doc_id % 5 = 4 THEN NULL
            ELSE '2026:01:' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2,
                                    '0') || ' 12:00:00'
       END AS exif_datetime_original,
       CASE WHEN doc_id % 5 = 4 THEN NULL
            ELSE CAST(16 + doc_id % 16 AS INT) END AS exif_pixel_x,
       CASE WHEN doc_id % 5 = 4 THEN NULL
            ELSE CAST(12 + doc_id % 12 AS INT) END AS exif_pixel_y
FROM documents
""")
def image_exif_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF extraction at corpus scale: real vendored-encoder JPEGs get a
    spec-shaped APP1 spliced in (byte order alternating little/big endian
    per doc; every 5th image carries NO EXIF and must surface NULLs),
    then the parser recovers every tag. The oracle states the planted
    values from the synthesis branches."""
    from etl_mark1_spark.operators.jpeg import insert_app1, make_exif_app1
    from etl_mark1_spark.operators.multimodal import (attach_jpeg_media,
                                                      with_image_exif)

    media = attach_jpeg_media(t(spark, sf_dir, "documents")
                              .select("doc_id"))

    def tag(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, content in zip(pdf["doc_id"], pdf["content"]):
                did = int(rid)
                if did % 5 == 4:
                    rows.append((did, bytes(content)))
                    continue
                app1 = make_exif_app1(
                    orientation=did % 8 + 1, make="CamCo",
                    model=f"M{did % 4}",
                    datetime_original=f"2026:01:{did % 28 + 1:02d} "
                                      "12:00:00",
                    pixel_x=16 + did % 16, pixel_y=12 + did % 12,
                    big_endian=bool(did % 2))
                rows.append((did, insert_app1(bytes(content), app1)))
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    tagged = media.select("doc_id", "content").mapInPandas(
        tag, "doc_id bigint, content binary")
    return with_image_exif(tagged)


@query("image_autorotate_docs", """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 8 + 1 >= 5
                 THEN 10 + doc_id % 3 ELSE 16 + doc_id % 5 END AS INT)
           AS width,
       CAST(CASE WHEN doc_id % 8 + 1 >= 5
                 THEN 16 + doc_id % 5 ELSE 10 + doc_id % 3 END AS INT)
           AS height
FROM documents
""")
def image_autorotate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF auto-rotation end to end: per-doc JPEGs of planted dimensions
    carry every orientation 1-8 in rotation; after normalization the
    output dimensions must swap exactly for the transposing orientations
    (5-8) and hold for 1-4 — stated by the oracle from the planted
    (width, height, orientation) arithmetic. Pixel-level correctness is
    pinned by tests; this entry pins the corpus-scale wiring."""
    from etl_mark1_spark.operators.multimodal import normalize_orientation

    d = t(spark, sf_dir, "documents").select("doc_id")

    def build(batches):
        import numpy as np
        import pandas as pd

        from etl_mark1_spark.operators.jpeg import (insert_app1,
                                                    make_exif_app1,
                                                    make_jpeg)

        for pdf in batches:
            rows = []
            for rid in pdf["doc_id"]:
                did = int(rid)
                w0, h0 = 16 + did % 5, 10 + did % 3
                grad = (np.add.outer(np.arange(h0), np.arange(w0)) * 9
                        % 256).astype(np.uint8)
                jp = insert_app1(
                    make_jpeg(grad.tolist()),
                    make_exif_app1(orientation=did % 8 + 1,
                                   big_endian=bool(did % 2)))
                rows.append((did, jp))
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    media = d.mapInPandas(build, "doc_id bigint, content binary")
    return normalize_orientation(media).select("doc_id", "width", "height")
