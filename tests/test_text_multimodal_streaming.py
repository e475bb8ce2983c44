"""Text functions, multimodal plumbing, streaming veneer."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_mark1_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint_md5,
    lang_id,
    punct_count,
    rolling_hash_fingerprint,
    text_quality_score,
    whitespace_token_count,
)


@pytest.fixture(scope="module")
def texts(spark):
    return spark.createDataFrame([
        Row(id=1, t="the cat and the dog sat in the house for a while"),
        Row(id=2, t="der Hund und die Katze ist nicht mit der Maus"),
        Row(id=3, t="le chat est dans la maison pour une nuit"),
        Row(id=4, t="xyzzy plugh qwerty"),
        Row(id=5, t="  spaced   out\ttabs  "),
        Row(id=6, t=""),
    ])


def stats(df, col_expr, name="v"):
    return {r.id: r[1] for r in df.select("id", col_expr.alias(name)).collect()}


def test_whitespace_token_count(texts):
    v = stats(texts, whitespace_token_count("t"))
    assert v[1] == 12
    assert v[5] == 3   # runs of whitespace collapse
    assert v[6] == 0   # empty -> 0


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([Row(id=1, t="hello, world42!")])
    # "hello" "," "world" "42" "!"
    assert stats(df, bpe_ish_token_count("t"))[1] == 5


def test_punct_count(spark):
    df = spark.createDataFrame([Row(id=1, t="a,b.c!d")])
    assert stats(df, punct_count("t"))[1] == 3


def test_lang_id(texts):
    v = stats(texts, lang_id("t"))
    assert v[1] == "en"
    assert v[2] == "de"
    assert v[3] == "fr"
    assert v[4] == "und"


def test_quality_score_bounds(texts):
    v = stats(texts, text_quality_score("t"))
    assert all(0.0 <= s <= 100.0 for s in v.values())
    assert v[1] > v[4]  # prose beats gibberish


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([
        Row(id=1, t="Hello   World"), Row(id=2, t=" hello world "),
        Row(id=3, t="different")])
    v = stats(df, fingerprint_md5("t"))
    assert v[1] == v[2] != v[3]


def test_rolling_hash_fingerprint(spark):
    long_text = ("many distinct words appear here so block hashes vary a lot "
                 "across the sliding windows of this text") * 3
    df = spark.createDataFrame([
        Row(id=1, t=long_text),
        Row(id=2, t="  " + long_text.upper() + "  "),  # normalization-equal
        Row(id=3, t="entirely different material")])
    v = stats(df, rolling_hash_fingerprint("t", window=16))
    assert v[1] == v[2]  # case/whitespace normalize away
    assert v[1] != v[3]


# -- multimodal ------------------------------------------------------------

def test_multimodal_attach_decode(spark):
    from etl_mark1_spark.operators.multimodal import (
        attach_fake_media, decode_images)

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(1, 21)])
    media = attach_fake_media(docs)
    assert dict(media.dtypes)["content"] == "binary"
    feats = decode_images(media)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(r.width >= 16 and r.phash for r in rows)
    again = {r.doc_id: r.phash for r in decode_images(media).collect()}
    assert again == {r.doc_id: r.phash for r in rows}  # deterministic


def test_multimodal_real_codec_rejects_undecodable(spark):
    """codec='real' now genuinely decodes BMP/PPM/PGM; a payload that is
    none of those (the fake md5 bytes) must fail loudly, not produce
    garbage features."""
    from etl_mark1_spark.operators.multimodal import (
        attach_fake_media, decode_images)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    docs = attach_fake_media(spark.createDataFrame([Row(doc_id=1)]))
    with pytest.raises((PythonException, Py4JJavaError)):
        decode_images(docs, codec="real").collect()


def test_multimodal_png_attach_decode_end_to_end(spark):
    """attach_png_media payloads (RGB / gray / RGBA variants, cycling
    filters, split IDAT) decode through the Spark path to their true
    dimensions and gradient statistics."""
    from etl_mark1_spark.operators.multimodal import (
        attach_png_media, decode_images)

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(1, 13)])
    feats = {r.doc_id: r for r in
             decode_images(attach_png_media(docs), codec="real").collect()}
    assert len(feats) == 12
    for i, r in feats.items():
        assert (r.width, r.height) == (16 + i % 16, 16 + (i // 2) % 16), i
        assert 0.0 < r.mean_pixel < 255.0
        assert len(r.phash) == 16


def test_png_decodes_system_pngs():
    """Interop: PNGs produced by real-world encoders (not our fixture
    encoder) must decode to their documented dimensions."""
    import os

    from etl_mark1_spark.operators.png import decode_png

    cases = [("/usr/share/gitweb/static/git-logo.png", (27, 72, 3)),
             ("/usr/share/doc/python3/_static/file.png", (16, 16, 4)),
             ("/usr/share/doc/python3/_static/minus.png", (11, 11))]
    found = [(p, shape) for p, shape in cases if os.path.exists(p)]
    if not found:
        pytest.skip("no system PNGs on this machine")
    for p, shape in found:
        img = decode_png(open(p, "rb").read())
        assert img.shape == shape, p


def test_png_palette_and_gates():
    """Palette images expand through PLTE; spec-illegal depth/color
    combinations (table 11.1) raise ValueError rather than mis-decoding;
    truncated rasters fail loudly on every depth/interlace path."""
    import struct
    import zlib

    import numpy as np

    from etl_mark1_spark.operators.png import (
        PNG_SIG, _chunk, decode_png, make_png_palette)

    idx = np.arange(12, dtype=np.uint8).reshape(3, 4) % 5
    pal = np.arange(15, dtype=np.uint8).reshape(5, 3) * 7
    assert (decode_png(make_png_palette(idx, pal)) == pal[idx]).all()

    def header_only(depth, color=0, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 4, 3, depth, color, 0, 0, interlace)
        scan = zlib.compress(bytes([0, 1, 2, 3, 4]) * 3)
        return (PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", scan)
                + _chunk(b"IEND", b""))

    for depth, color in [(16, 3), (4, 2), (2, 6), (1, 4)]:
        with pytest.raises(ValueError, match="invalid for color type"):
            decode_png(header_only(depth, color=color))
    for depth, interlace in [(16, 0), (8, 1), (4, 0), (1, 1)]:
        with pytest.raises(ValueError, match="raster"):
            decode_png(header_only(depth, interlace=interlace))


def test_png_sub_byte_depths_roundtrip():
    """1/2/4-bit grayscale round-trips through the spec's exact scale
    factors (255/15/85-style), palette indices pack sub-byte losslessly
    (incl. interlaced), and widths that leave padding bits in the last
    scanline byte decode cleanly."""
    import numpy as np

    from etl_mark1_spark.operators.png import (decode_png, make_png,
                                               make_png_palette)

    rng = np.random.default_rng(11)
    for depth in (1, 2, 4):
        scale = 255 // ((1 << depth) - 1)
        for shape in [(5, 7), (3, 9), (1, 1), (4, 8)]:  # odd widths pad
            img = rng.integers(0, 1 << depth, shape, dtype=np.uint8)
            dec = decode_png(make_png(img, depth=depth))
            assert dec.shape == img.shape and (dec == img * scale).all(), \
                (depth, shape)
        # interlaced sub-byte: per-pass strides + bit padding composed
        img = rng.integers(0, 1 << depth, (10, 13), dtype=np.uint8)
        dec = decode_png(make_png(img, depth=depth, interlace=True))
        assert (dec == img * scale).all(), depth
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    for depth in (1, 2, 4):
        idx = rng.integers(0, 1 << depth, (6, 11), dtype=np.uint8)
        assert (decode_png(make_png_palette(idx, pal, depth=depth))
                == pal[idx]).all(), depth
        assert (decode_png(make_png_palette(idx, pal, depth=depth,
                                            interlace=True))
                == pal[idx]).all(), depth
    with pytest.raises(ValueError, match="grayscale-only"):
        make_png(rng.integers(0, 2, (4, 4, 3), dtype=np.uint8), depth=2)
    with pytest.raises(ValueError, match="exceed"):
        make_png(np.full((4, 4), 9, dtype=np.uint8), depth=2)


def test_png_16bit_and_adam7_roundtrip():
    """16-bit samples survive encode->decode as uint16 (big-endian byte
    order exercised by values > 255), and Adam7 interlacing round-trips
    for every channel count at sizes that leave some passes empty."""
    import numpy as np

    from etl_mark1_spark.operators.png import decode_png, make_png

    rng = np.random.default_rng(7)
    img16 = rng.integers(0, 65536, (9, 11, 3), dtype=np.uint16)
    dec = decode_png(make_png(img16))
    assert dec.dtype == np.uint16 and (dec == img16).all()

    for shape in [(1, 1), (7, 5), (9, 3, 4), (16, 16, 2), (3, 9, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = decode_png(make_png(img, interlace=True))
        assert dec.shape == img.shape and (dec == img).all(), shape
    # interlaced 16-bit: both new paths composed
    img = rng.integers(0, 65536, (10, 13), dtype=np.uint16)
    dec = decode_png(make_png(img, interlace=True))
    assert dec.dtype == np.uint16 and (dec == img).all()


def test_multimodal_resize_and_frames(spark):
    from etl_mark1_spark.operators.multimodal import (
        attach_fake_media, resize_images, sample_video_frames)

    docs = attach_fake_media(spark.createDataFrame([Row(doc_id=7)]))
    resized = resize_images(docs, 32, 32)
    meta = resized.first().media_meta
    assert (meta.width, meta.height) == (32, 32)
    frames = sample_video_frames(docs, every_ms=10000)
    n = frames.count()
    dur = docs.first().media_meta.duration_ms
    assert n == dur // 10000 + 1


# -- streaming -------------------------------------------------------------

def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    from etl_mark1_spark.catalog import t
    from etl_mark1_spark.streaming.events import (
        hourly_event_aggregate, read_events_stream, run_available_now)

    staged = str(tmp_path / "events_us")
    (t(spark, sf_dir, "events")
     .withColumn("ts", F.col("ts").cast("timestamp"))
     .write.mode("overwrite").parquet(staged))

    stream_out = run_available_now(
        hourly_event_aggregate(read_events_stream(spark, staged)),
        table_name="t_stream_test", output_mode="complete")
    batch = (spark.read.parquet(staged)
             .groupBy(F.window("ts", "1 hour").start.alias("window_start"),
                      "event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.round(F.sum("value"), 2).alias("value_sum")))
    assert sorted(map(tuple, stream_out.collect())) == \
        sorted(map(tuple, batch.collect()))


def test_sessionize_batch_shape(spark, sf_dir, tmp_path):
    """Sessionizer runs through the streaming engine and closes sessions."""
    from etl_mark1_spark.streaming.events import (
        read_events_stream, run_available_now, sessionize)

    staged = str(tmp_path / "events_sess")
    ev = spark.createDataFrame([
        Row(event_id=1, ts="2024-01-01 00:00:00", user_id=1, event_type="a",
            value=1.0, props="{}"),
        Row(event_id=2, ts="2024-01-01 00:10:00", user_id=1, event_type="a",
            value=2.0, props="{}"),
        Row(event_id=3, ts="2024-01-01 05:00:00", user_id=1, event_type="a",
            value=3.0, props="{}"),  # new session (gap > 30 min)
        Row(event_id=4, ts="2024-01-01 00:00:00", user_id=2, event_type="b",
            value=4.0, props="{}"),
    ]).withColumn("ts", F.col("ts").cast("timestamp"))
    ev.write.mode("overwrite").parquet(staged)

    out = run_available_now(
        sessionize(read_events_stream(spark, staged), gap_minutes=30),
        table_name="t_sessions", output_mode="append")
    rows = out.collect()
    # at least the closed session for user 1 (00:00-00:10) must have emitted
    u1 = [r for r in rows if r.user_id == 1]
    assert any(r.n_events == 2 and r.value_sum == 3.0 for r in u1)


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data handling end-to-end across three incremental drains of the
    same checkpointed stream: a record older than the watermark is dropped;
    in-flight windows keep accumulating and emit once finalized."""
    from etl_mark1_spark.streaming.events import (
        hourly_event_aggregate, read_events_stream, run_available_now)

    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    import os
    os.makedirs(src)

    def drop(name, rows):
        (spark.createDataFrame(rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string")
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .coalesce(1).write.mode("overwrite")
         .parquet(str(tmp_path / name)))
        import shutil, glob
        for f in glob.glob(str(tmp_path / name / "part-*.parquet")):
            shutil.copy(f, os.path.join(src, f"{name}.parquet"))

    sink = str(tmp_path / "sink")

    def drain(n):
        # memory sinks can't recover a checkpoint; a parquet sink (the real
        # deployment shape) persists both output and watermark state
        stream = read_events_stream(spark, src)
        q = (hourly_event_aggregate(stream)
             .writeStream.format("parquet")
             .option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return spark.read.parquet(sink).collect()

    # batch 1: three events; watermark advances to 12:10 after processing,
    # finalizing the 10:00 and 11:00 windows
    drop("b1", [(1, "2024-01-01 10:15:00", 1, "view", 1.0, "{}"),
                (2, "2024-01-01 11:45:00", 1, "view", 2.0, "{}"),
                (3, "2024-01-01 13:10:00", 1, "view", 4.0, "{}")])
    out1 = {str(r.window_start): r.n_events for r in drain(1)}
    assert out1 == {"2024-01-01 10:00:00": 1, "2024-01-01 11:00:00": 1}

    # batch 2: one LATE event (10:30 < watermark) -> dropped; one in-flight
    # event extends the open 13:00 window; nothing finalizes yet
    drop("b2", [(4, "2024-01-01 10:30:00", 1, "view", 8.0, "{}"),
                (5, "2024-01-01 13:40:00", 1, "view", 16.0, "{}")])
    out2 = {str(r.window_start): r.n_events for r in drain(2)}
    assert out2 == out1  # late event dropped; open window not yet emitted

    # batch 3: a far-future event pushes the watermark past 13:00 -> the
    # 13:00 window closes with BOTH live events and WITHOUT the late one
    drop("b3", [(6, "2024-01-01 16:30:00", 1, "view", 32.0, "{}")])
    out3 = {str(r.window_start): (r.n_events, r.value_sum) for r in drain(3)}
    assert out3["2024-01-01 13:00:00"] == (2, 20.0)  # late 10:30 excluded
    assert "2024-01-01 10:00:00" in out3  # earlier emissions persisted


def test_streaming_dedup_state_survives_restart(spark, tmp_path):
    """An id seen in drain 1 must still be suppressed when it reappears in
    drain 2 (checkpointed dedup state), while genuinely new ids pass; ids
    older than the watermark age out of state."""
    from etl_mark1_spark.streaming.events import (
        dedup_stream, read_events_stream)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    import glob
    import os
    import shutil
    os.makedirs(src)

    def drop(name, rows):
        (spark.createDataFrame(rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string")
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .coalesce(1).write.mode("overwrite")
         .parquet(str(tmp_path / name)))
        for f in glob.glob(str(tmp_path / name / "part-*.parquet")):
            shutil.copy(f, os.path.join(src, f"{name}.parquet"))

    def drain():
        q = (dedup_stream(read_events_stream(spark, src), watermark="1 hour")
             .select("event_id")
             .writeStream.format("parquet")
             .option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        return sorted(r.event_id for r in spark.read.parquet(sink).collect())

    drop("b1", [(1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
                (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),  # in-batch dup
                (2, "2024-01-01 10:05:00", 1, "view", 2.0, "{}")])
    assert drain() == [1, 2]

    # id 1 reappears within the watermark horizon -> suppressed by state;
    # id 3 is new -> emitted
    drop("b2", [(1, "2024-01-01 10:20:00", 1, "view", 1.0, "{}"),
                (3, "2024-01-01 10:30:00", 1, "view", 3.0, "{}")])
    assert drain() == [1, 2, 3]


def test_bmp_roundtrip_exact_stats():
    """make_bmp -> decode_image_bytes must recover exact dimensions and
    mean over a known pixel array (including stride padding rows)."""
    import numpy as np

    from etl_mark1_spark.operators.multimodal import (
        decode_image_bytes, make_bmp)

    px = np.zeros((3, 5, 3), dtype=np.uint8)   # 5*3=15 bytes/row -> padded
    px[0, 0] = [255, 0, 0]
    px[2, 4] = [0, 0, 90]
    w, h, mean, phash = decode_image_bytes(make_bmp(px))
    assert (w, h) == (5, 3)
    assert mean == round((255 + 90) / 45, 6)
    assert len(phash) == 16 and int(phash, 16) >= 0

    # ahash distinguishes structure: gradient vs its mirror
    grad = np.broadcast_to(
        (np.arange(32) * 8).astype(np.uint8)[None, :, None], (32, 32, 3))
    assert decode_image_bytes(make_bmp(grad))[3] != \
        decode_image_bytes(make_bmp(grad[:, ::-1]))[3]


def test_ppm_decode():
    from etl_mark1_spark.operators.multimodal import decode_image_bytes

    raster = bytes([10, 20, 30, 40, 50, 60])  # 2x1 RGB
    w, h, mean, _ = decode_image_bytes(b"P6\n2 1\n255\n" + raster)
    assert (w, h) == (2, 1) and mean == round(sum(raster) / 6, 6)


def test_real_decode_distributed(spark):
    """attach_bmp_media -> decode_images(codec='real') across executors:
    decoded dimensions must match the generator's id-seeded formula."""
    from etl_mark1_spark.operators.multimodal import (
        attach_bmp_media, decode_images)

    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: r for r in
           decode_images(attach_bmp_media(docs), codec="real").collect()}
    assert len(out) == 40
    for i, r in out.items():
        assert (r.width, r.height) == (16 + i % 16, 16 + (i // 2) % 16)
        assert 0.0 <= r.mean_pixel <= 255.0

    # unknown compressed format still fails loudly without PIL
    import importlib.util
    if importlib.util.find_spec("PIL") is None:
        from etl_mark1_spark.operators.multimodal import decode_image_bytes
        # PNG/GIF are vendored now — TIFF is the representative gated format
        with pytest.raises(NotImplementedError, match="decoder|PIL"):
            decode_image_bytes(b"II*\x00....")
        # and a corrupt PNG fails loudly with the corruption, not garbage
        with pytest.raises(ValueError, match="truncated|CRC|IHDR"):
            decode_image_bytes(b"\x89PNG\r\n\x1a\n....")


def test_wav_roundtrip_exact_stats():
    """make_wav -> decode_audio_bytes: exact duration/rate; a sine's RMS is
    amplitude/sqrt(2)."""
    import numpy as np

    from etl_mark1_spark.operators.multimodal import (
        decode_audio_bytes, make_wav)

    rate, amp, freq = 8000, 0.5, 200.0
    t = np.arange(rate)  # exactly 1 s; 200 full cycles
    samples = (np.sin(2 * np.pi * freq * t / rate) * amp * 32767) \
        .astype(np.int16)
    got_rate, ch, dur, rms = decode_audio_bytes(make_wav(samples, rate))
    assert (got_rate, ch, dur) == (rate, 1, 1000)
    assert rms == pytest.approx(amp / 2 ** 0.5, rel=1e-3)

    with pytest.raises(NotImplementedError, match="audio format"):
        decode_audio_bytes(b"ID3\x04rest-of-an-mp3")


def test_wav_decode_distributed(spark):
    from etl_mark1_spark.operators.multimodal import (
        attach_wav_media, decode_audio)

    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: r for r in
           decode_audio(attach_wav_media(docs)).collect()}
    assert len(out) == 30
    for i, r in out.items():
        assert r.sample_rate == 16000
        n = 16000 // 10 + (i % 5) * 16000 // 100
        assert r.duration_ms == int(n * 1000 / 16000)
        amp = 0.1 + (i % 9) / 10.0
        assert r.rms == pytest.approx(amp / 2 ** 0.5, rel=0.02)


def test_streaming_upsert_sink_keeps_one_row_per_key(spark, tmp_path):
    """Two drains through upsert_sink: batch 2 updates a key from batch 1,
    adds a new key, and the sink always holds exactly one current row per
    key — MERGE semantics, not append."""
    import glob
    import os
    import shutil

    from etl_mark1_spark.streaming.events import (read_events_stream,
                                                  upsert_sink)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "table")
    os.makedirs(src)

    def drop(name, rows):
        (spark.createDataFrame(rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string")
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .coalesce(1).write.mode("overwrite")
         .parquet(str(tmp_path / name)))
        for f in glob.glob(str(tmp_path / name / "part-*.parquet")):
            shutil.copy(f, os.path.join(src, f"{name}.parquet"))

    drop("b1", [(1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
                (2, "2024-01-01 10:05:00", 1, "view", 2.0, "{}")])
    upsert_sink(read_events_stream(spark, src), table,
                ["event_id"], checkpoint=ckpt)
    first = {r.event_id: r.value
             for r in spark.read.parquet(table).collect()}
    assert first == {1: 1.0, 2: 2.0}

    # batch 2: update key 2 (two versions in-batch; latest ts must win),
    # insert key 3
    drop("b2", [(2, "2024-01-01 11:00:00", 1, "view", 20.0, "{}"),
                (2, "2024-01-01 11:30:00", 1, "view", 25.0, "{}"),
                (3, "2024-01-01 11:10:00", 2, "click", 3.0, "{}")])
    upsert_sink(read_events_stream(spark, src), table,
                ["event_id"], checkpoint=ckpt)
    second = {r.event_id: r.value
              for r in spark.read.parquet(table).collect()}
    assert second == {1: 1.0, 2: 25.0, 3: 3.0}


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """correlate_streams over two file streams must produce exactly the
    pairs the same interval join yields on static frames."""
    import os

    from etl_mark1_spark.streaming.events import (correlate_streams,
                                                  read_events_stream)

    rows_l = [(1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
              (2, "2024-01-01 10:20:00", 1, "click", 1.0, "{}"),
              (3, "2024-01-01 10:00:00", 2, "click", 1.0, "{}")]
    rows_r = [(101, "2024-01-01 10:05:00", 1, "buy", 5.0, "{}"),   # <- 1
              (102, "2024-01-01 10:25:00", 1, "buy", 5.0, "{}"),   # <- 2
              (103, "2024-01-01 11:00:00", 2, "buy", 5.0, "{}")]   # too late

    schema = ("event_id long, ts string, user_id long, event_type string, "
              "value double, props string")

    def stage(name, rows):
        d = str(tmp_path / name)
        os.makedirs(d)
        (spark.createDataFrame(rows, schema)
         .withColumn("ts", F.col("ts").cast("timestamp"))
         .coalesce(1).write.mode("append").parquet(d))
        return d

    ldir, rdir = stage("l", rows_l), stage("r", rows_r)
    joined = correlate_streams(read_events_stream(spark, ldir),
                               read_events_stream(spark, rdir),
                               within="10 minutes")
    sink = str(tmp_path / "out")
    (joined.writeStream.format("parquet").option("path", sink)
     .option("checkpointLocation", str(tmp_path / "ck"))
     .outputMode("append").trigger(availableNow=True)
     .start().awaitTermination())
    got = {(r.left_id, r.right_id, r.lag_s)
           for r in spark.read.parquet(sink).collect()}
    assert got == {(1, 101, 300), (2, 102, 300)}

    # batch parity: identical join on static frames
    batch = correlate_streams(spark.read.parquet(ldir),
                              spark.read.parquet(rdir), within="10 minutes")
    assert {(r.left_id, r.right_id, r.lag_s)
            for r in batch.collect()} == got


def test_jpeg_roundtrip_all_variants():
    """The vendored baseline codec must round-trip a smooth image near-
    losslessly at q100 across 4:4:4, 4:2:0, and restart-marker encodings
    (chroma subsampling is lossy by construction, so its band is wider)."""
    import numpy as np

    from etl_mark1_spark.operators.jpeg import decode_jpeg, make_jpeg

    h, w = 24, 37
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    img = np.stack([np.tile(x, (h, 1)), np.tile(y[:, None], (1, w)),
                    np.full((h, w), 90.0)], -1).astype(np.uint8)
    for kwargs, tol in [
        (dict(quality=100), 2),
        (dict(quality=100, restart_interval=2), 2),
        (dict(quality=100, subsample=True), 12),
        (dict(quality=90, subsample=True, restart_interval=3), 20),
    ]:
        dec = decode_jpeg(make_jpeg(img, **kwargs))
        assert dec.shape == img.shape, kwargs
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        assert err <= tol, (kwargs, err)

    gray = np.tile(np.linspace(0, 255, 33, dtype=np.uint8), (17, 1))
    dec = decode_jpeg(make_jpeg(gray, quality=100))
    assert dec.shape == gray.shape
    assert np.abs(dec.astype(int) - gray.astype(int)).max() <= 2

    # q100 keeps even noise within quantization-rounding distance
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    dec = decode_jpeg(make_jpeg(noise, quality=100))
    assert np.abs(dec.astype(int) - noise.astype(int)).max() <= 2


def test_jpeg_rejects_arithmetic_and_non_jpeg():
    import pytest as _pytest

    from etl_mark1_spark.operators.jpeg import decode_jpeg, make_jpeg

    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n")
    import numpy as np

    blob = bytearray(make_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    idx = bytes(blob).find(b"\xff\xc0")
    # flip SOF0 to SOF9 (arithmetic-coded sequential): must refuse loudly
    blob[idx + 1] = 0xC9
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(blob))
    # flip SOF0 to SOF2: the body is a full-band sequential scan, which is
    # ILLEGAL inside a progressive frame — must refuse, not mis-decode
    blob[idx + 1] = 0xC2
    with _pytest.raises(ValueError, match="progressive DC scan"):
        decode_jpeg(bytes(blob))


def test_jpeg_decode_via_image_bytes_dispatch():
    """decode_image_bytes must route JPEG payloads through the vendored
    codec: true dimensions and a gradient-consistent mean, no PIL."""
    import numpy as np

    from etl_mark1_spark.operators.jpeg import make_jpeg
    from etl_mark1_spark.operators.multimodal import decode_image_bytes

    img = np.tile(np.linspace(0, 255, 32, dtype=np.uint8), (20, 1))
    img = np.stack([img, img, img], axis=-1)
    w, h, mean, phash = decode_image_bytes(make_jpeg(img, quality=100))
    assert (w, h) == (32, 20)
    assert abs(mean - float(img.mean())) < 1.0
    assert len(phash) == 16


def test_jpeg_decode_distributed(spark):
    """End-to-end through mapInPandas on executors: every synthesized JPEG
    (all three encoder variants) decodes to its true dimensions."""
    from etl_mark1_spark.operators.multimodal import (attach_jpeg_media,
                                                      decode_images)

    ids = spark.range(30).select(F.col("id").alias("doc_id"))
    out = decode_images(attach_jpeg_media(ids), codec="real").collect()
    assert len(out) == 30
    for r in out:
        assert r.width == 16 + r.doc_id % 16
        assert r.height == 16 + (r.doc_id // 2) % 16
        assert 0.0 < r.mean_pixel < 255.0


def test_char_entropy_known_values(spark):
    import math

    from etl_mark1_spark.functions.text import char_entropy_stats

    rows = [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None),
            (6, "a\nb\nc")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.char_entropy
           for r in char_entropy_stats(df).collect()}
    assert got[1] == 0.0                                  # single symbol
    assert abs(got[2] - math.log(2)) < 1e-6               # two equi-likely
    assert abs(got[3] - math.log(4)) < 1e-6               # four equi-likely
    assert 4 not in got and 5 not in got   # empty/NULL: no output row
    # newlines are symbols too: a,\n,b,\n,c -> p(\n)=2/5, others 1/5
    want = -(2 / 5 * math.log(2 / 5) + 3 * (1 / 5) * math.log(1 / 5))
    assert abs(got[6] - want) < 1e-6


def test_compression_ratio_orders_repetitive_below_prose(spark):
    from etl_mark1_spark.functions.text import compression_ratio

    rows = [(1, "spam spam spam spam " * 50),
            (2, "The quick brown fox jumps over the lazy dog while the "
                "autumn wind scatters crisp leaves across the quiet road."),
            (3, ""), (4, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.ratio for r in
           df.select("doc_id",
                     compression_ratio("text").alias("ratio")).collect()}
    assert got[1] < 0.1 < got[2] <= 1.2   # boilerplate crushes, prose doesn't
    assert got[3] is None and got[4] is None
    # deterministic: same input, same ratio on a re-run
    again = {r.doc_id: r.ratio for r in
             df.select("doc_id",
                       compression_ratio("text").alias("ratio")).collect()}
    assert got == again


def test_gopher_flags_planted_rules(spark):
    """Each planted document violates exactly one named Gopher rule."""
    from etl_mark1_spark.functions.text import gopher_quality_flags

    prose = ("the cat and the dog have been to the house of a friend "
             "that we know well and that is fine with us all today "
             "because the weather is good and the road is short and "
             "the time to be there is right for all of us friends "
             "and we shall walk there again tomorrow with the cats")
    rows = [
        (1, prose),                                       # passes all
        (2, "too short to pass the word count rule"),     # word count
        (3, " ".join(["x"] * 60) + " the of"),            # mean len < 3
        (4, prose + " " + "#" * 40),                      # symbol ratio
        (5, "\n".join(f"- bullet {i} line of the doc to have with"
                      for i in range(20))
            + "\nthe of and that be to have with plain line "
            + " ".join(f"w{i}" for i in range(30))),      # bullets > 90%? no: 20/21 lines = 95%
        (6, prose + "..."),       # its single line ends with an ellipsis
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in
           gopher_quality_flags(df).collect()}

    assert got[1]["keep"] is True
    assert got[2]["ok_word_count"] is False and got[2]["keep"] is False
    assert got[3]["ok_mean_word_len"] is False
    assert got[4]["ok_symbol_ratio"] is False
    assert got[5]["ok_bullet_lines"] is False
    # doc 6 is one line; that line ends with '...' -> 100% > 30%
    assert got[6]["ok_ellipsis_lines"] is False


def test_gopher_flags_stopword_and_alpha_rules(spark):
    from etl_mark1_spark.functions.text import gopher_quality_flags

    numbers = " ".join(str(i) for i in range(60)) + " the of"
    no_stop = " ".join(f"word{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, numbers), (2, no_stop)], ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in
           gopher_quality_flags(df).collect()}
    assert got[1]["ok_alpha_words"] is False   # digits carry no letter
    assert got[2]["ok_stopwords"] is False     # zero gopher stopwords


def test_repetition_profile_planted(spark):
    from etl_mark1_spark.functions.text import repetition_profile

    rows = [
        # 3 identical lines of 10 chars + 1 unique: dup = 2*10/40 = 0.5
        (1, "same line!\nsame line!\nsame line!\nother one!"),
        # "very nice" said 5 times dominates the bigram mass
        (2, "very nice " * 5 + "and something else entirely here"),
        (3, "clean prose with no repeats at all in it today friends"),
        (4, ""),                                   # degenerate: empty doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in repetition_profile(df).collect()}

    assert got[1]["dup_line_ratio"] == 0.5
    assert got[1]["ok_dup_lines"] is False
    assert got[2]["top_bigram"] == "nice very" or \
        got[2]["top_bigram"] == "very nice"
    assert got[2]["top_bigram_ratio"] > 0.2
    assert got[2]["ok_top_bigram"] is False
    assert got[3]["dup_line_ratio"] == 0.0
    assert got[3]["ok_dup_lines"] is True and got[3]["ok_top_bigram"] is True
    assert got[4]["dup_line_ratio"] == 0.0 and got[4]["top_bigram"] == ""


def test_avi_container_roundtrip_and_frame_sampling(spark):
    """Container packs/parses frames byte-exact (odd sizes force chunk
    padding); real sampling picks the frame nearest each timestamp and
    decodes true stats; non-MJPEG streams refuse with the fourcc named."""
    import numpy as np
    import pytest as _pytest

    from etl_mark1_spark.operators.avi import decode_avi, make_avi
    from etl_mark1_spark.operators.jpeg import make_jpeg
    from etl_mark1_spark.operators.multimodal import (attach_avi_media,
                                                      sample_video_frames)

    rng = np.random.default_rng(7)
    frames = [make_jpeg(rng.integers(0, 256, (17, 23, 3), dtype=np.uint8),
                        quality=85) for _ in range(5)]
    fps, out = decode_avi(make_avi(frames, fps=3))
    assert fps == 3 and out == frames

    bad = make_avi(frames, fps=3).replace(b"vidsMJPG", b"vidsH264")
    with _pytest.raises(NotImplementedError, match="H264"):
        decode_avi(bad)

    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    got = sample_video_frames(attach_avi_media(docs), every_ms=500,
                              codec="real").collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i in range(6):
        n_frames, fps_i = 3 + i % 4, 2 + i % 3
        dur = n_frames * 1000 // fps_i
        want_ts = list(range(0, max(dur, 1), 500)) or [0]
        assert sorted(r.frame_ms for r in by_doc[i]) == want_ts
        w, h = 16 + (i % 4) * 8, 16 + ((i // 2) % 3) * 8
        assert all(r.width == w and r.height == h for r in by_doc[i])
        assert all(len(r.phash) == 16 for r in by_doc[i])


def test_g711_companded_wav_decodes():
    """mu-law and A-law WAVs (format codes 7/6) decode through the exact
    G.711 expand tables — bit-identical to the stdlib audioop reference —
    and produce sane rate/duration/rms; stdlib wave can't open these, so
    the RIFF walk is the only path."""
    import struct

    import numpy as np

    from etl_mark1_spark.operators.multimodal import (_ALAW_TABLE,
                                                      _ULAW_TABLE,
                                                      decode_audio_bytes)

    import audioop  # 3.11 stdlib reference implementation

    raw = bytes(range(256)) * 4
    assert (np.asarray(_ULAW_TABLE)[np.frombuffer(raw, np.uint8)]
            == np.frombuffer(audioop.ulaw2lin(raw, 2), np.int16)).all()
    assert (np.asarray(_ALAW_TABLE)[np.frombuffer(raw, np.uint8)]
            == np.frombuffer(audioop.alaw2lin(raw, 2), np.int16)).all()

    def companded_wav(fmt_code: int, rate: int, data: bytes) -> bytes:
        fmt = struct.pack("<HHIIHH", fmt_code, 1, rate, rate, 1, 8)
        body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    for code in (6, 7):
        rate, channels, duration_ms, rms = decode_audio_bytes(
            companded_wav(code, 8000, raw))
        assert (rate, channels) == (8000, 1)
        assert duration_ms == len(raw) * 1000 // 8000
        assert 0.0 < rms <= 1.0


def test_versioned_sink_streams_snapshots_idempotently(spark, sf_dir,
                                                       tmp_path):
    """Each drained micro-batch commits a table version; a restart drain
    over newly-arrived files appends the next version; replaying with no
    new data adds nothing; the final snapshot equals the batch union and
    the stream's history stays time-travelable."""
    import shutil

    from etl_mark1_spark.sources.versioned import history, read_table
    from etl_mark1_spark.streaming.events import (read_events_stream,
                                                  staged_time_halves,
                                                  versioned_sink)

    halves = staged_time_halves(spark, f"{sf_dir}/events.parquet")
    src = str(tmp_path / "arriving")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "events_table")
    shutil.copytree(halves[0], src)

    stream = read_events_stream(spark, src).select("event_id", "user_id")
    versioned_sink(stream, table, checkpoint=ckpt)
    v0 = read_table(spark, table, version=0).count()
    assert v0 > 0

    for f in __import__("os").listdir(halves[1]):
        shutil.copy(f"{halves[1]}/{f}", f"{src}/{f}")
    stream = read_events_stream(spark, src).select("event_id", "user_id")
    versioned_sink(stream, table, checkpoint=ckpt)
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert read_table(spark, table).count() == total

    # replay with nothing new: no extra version appears
    n_before = len(history(table))
    stream = read_events_stream(spark, src).select("event_id", "user_id")
    versioned_sink(stream, table, checkpoint=ckpt)
    assert len(history(table)) == n_before
    assert read_table(spark, table, version=0).count() == v0  # time travel


def test_versioned_sink_fresh_checkpoint_does_not_drop_batches(
        spark, sf_dir, tmp_path):
    """Two drains of the same table with INDEPENDENT (default-style,
    throwaway) checkpoints both restart epoch ids at 0; replay detection
    keyed on the epoch alone would match the first drain's epoch-0 note
    and silently drop the second drain's data. The checkpoint-tagged
    note must keep the lineages distinct so the second drain appends."""
    from etl_mark1_spark.sources.versioned import history, read_table
    from etl_mark1_spark.streaming.events import (read_events_stream,
                                                  staged_time_halves,
                                                  versioned_sink)

    halves = staged_time_halves(spark, f"{sf_dir}/events.parquet")
    table = str(tmp_path / "events_table")

    first = read_events_stream(spark, halves[0]).select("event_id")
    versioned_sink(first, table, checkpoint=str(tmp_path / "ckpt_a"))
    n_first = read_table(spark, table).count()
    assert n_first > 0

    second = read_events_stream(spark, halves[1]).select("event_id")
    versioned_sink(second, table, checkpoint=str(tmp_path / "ckpt_b"))
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert read_table(spark, table).count() == total    # nothing dropped
    # and both lineages' epoch-0 commits coexist in the history
    notes = [v.get("note") for v in history(table)]
    assert len([x for x in notes if x and x.endswith(":0")]) == 2


def test_session_window_punctuation_flushes_all_sessions(spark, sf_dir):
    """Native session windows in append mode withhold every session
    whose last event lies within one gap of the stream's maximum event
    time (the watermark never passes their ends) — the punctuation
    sentinel exists to push the final watermark past them. Assert both
    halves: without punctuation the drain is missing sessions; with it,
    the drain equals the batch gaps-and-islands answer exactly and no
    sentinel row leaks into the output."""
    from pyspark.sql import Window

    from etl_mark1_spark.streaming.events import (punctuated_events_dir,
                                                  read_events_stream,
                                                  run_available_now,
                                                  session_window_agg)

    path = f"{sf_dir}/events.parquet"
    bare = run_available_now(
        session_window_agg(read_events_stream(spark, path)),
        table_name="sess_bare", output_mode="append")
    punct = run_available_now(
        session_window_agg(
            read_events_stream(spark, punctuated_events_dir(spark, path))),
        table_name="sess_punct", output_mode="append")
    n_bare = bare.count()
    real = punct.filter(F.col("user_id") >= 0)
    assert punct.filter(F.col("user_id") < 0).count() == 0  # sentinel held
    n_all = real.count()
    assert n_bare < n_all                  # withheld tail is real and big

    # batch truth: gaps-and-islands with >= (session_window's half-open end)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = spark.read.parquet(path)
    secs = F.col("ts").cast("timestamp").cast("long")  # ntz -> epoch (UTC)
    sess = (ev.withColumn(
        "_new", F.when(F.lag(secs).over(w).isNull()
                       | (secs - F.lag(secs).over(w) >= 1800), 1)
        .otherwise(0))
        .withColumn("_seq", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    n_batch = sess.select("user_id", "_seq").distinct().count()
    assert n_all == n_batch


def test_session_window_restart_merges_straddling_sessions(spark, sf_dir,
                                                           tmp_path):
    """Checkpointed restart for NATIVE session windows through an
    exactly-once file sink: drain the first time-half, then restart from
    the same checkpoint over the second half plus the flush sentinel.
    A session emitted in drain 1 can never be continued by a
    second-half event (its end precedes the restored watermark, so any
    later event is >= one gap away and starts a new session), and a
    straddling session merges from restored state — so every batch
    session emits EXACTLY once across the two drains: counts and event
    totals must equal the batch gaps-and-islands answer."""
    import os
    import shutil

    from pyspark.sql import Window

    from etl_mark1_spark.streaming.events import (punctuated_events_dir,
                                                  read_events_stream,
                                                  session_window_agg,
                                                  staged_time_halves)

    halves = staged_time_halves(spark, f"{sf_dir}/events.parquet")
    src = str(tmp_path / "arriving")
    ckpt = str(tmp_path / "ckpt")
    outdir = str(tmp_path / "sessions_out")
    shutil.copytree(halves[0], src)

    def drain():
        q = (session_window_agg(read_events_stream(spark, src))
             .select("user_id",
                     F.col("session_window.start").alias("s_start"),
                     F.col("session_window.end").alias("s_end"),
                     "n_events")
             .writeStream.format("parquet").option("path", outdir)
             .option("checkpointLocation", ckpt).outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    n_first = spark.read.parquet(outdir).count()

    # second half arrives, plus the punctuation file from the staged
    # full-table dir (its sentinel is past the whole table's max ts)
    for f in os.listdir(halves[1]):
        shutil.copy(f"{halves[1]}/{f}", f"{src}/{f}")
    punct = punctuated_events_dir(spark, f"{sf_dir}/events.parquet")
    sent = next(n for n in os.listdir(punct) if n.startswith("zz_flush"))
    shutil.copy(f"{punct}/{sent}", f"{src}/{sent}")
    drain()

    drained = spark.read.parquet(outdir).filter(F.col("user_id") >= 0)
    assert 0 < n_first < drained.count()        # both drains contributed
    # exactly-once: no (user, start) appears twice across the drains
    assert drained.groupBy("user_id", "s_start").count() \
        .filter(F.col("count") > 1).isEmpty()

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("timestamp").cast("long")
    sess = (ev.withColumn(
        "_new", F.when(F.lag(secs).over(w).isNull()
                       | (secs - F.lag(secs).over(w) >= 1800), 1)
        .otherwise(0))
        .withColumn("_seq", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    n_batch = sess.select("user_id", "_seq").distinct().count()
    assert drained.count() == n_batch
    assert int(drained.agg(F.sum("n_events")).first()[0]) == ev.count()


def test_jpeg_progressive_roundtrip_bit_identical_to_sequential():
    """make_jpeg(progressive=True) encodes the SAME quantized coefficients
    as the sequential form through a libjpeg-shaped scan script (DC Al=1 +
    refine, per-component AC bands at Al=2 with two refinement passes), so
    decoding either blob must give IDENTICAL pixels. This pins every
    progressive decode path: spectral selection, DC/AC successive
    approximation, EOB runs, and correction-bit buffering."""
    import numpy as np

    from etl_mark1_spark.operators.jpeg import decode_jpeg, make_jpeg

    rng = np.random.default_rng(11)
    for shape, kw in [((16, 24, 3), {}), ((16, 24, 3), {"subsample": True}),
                      ((13, 9), {}), ((33, 41, 3), {"subsample": True}),
                      ((8, 8), {"quality": 50}), ((64, 48, 3), {"quality": 30}),
                      ((7, 7), {}), ((24, 17, 3), {"quality": 75,
                                                   "subsample": True})]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        seq = decode_jpeg(make_jpeg(img, **kw))
        prog_blob = make_jpeg(img, progressive=True, **kw)
        assert b"\xff\xc2" in prog_blob          # really SOF2
        assert prog_blob.count(b"\xff\xda") > 2  # really multi-scan
        prog = decode_jpeg(prog_blob)
        assert np.array_equal(seq, prog), (shape, kw)


def test_jpeg_decodes_system_progressive_jpegs():
    """Interop: progressive JPEGs produced by real-world encoders (libjpeg
    scan scripts with AC successive approximation) must decode to their
    documented dimensions with sane statistics."""
    import os

    import numpy as np

    from etl_mark1_spark.operators.jpeg import decode_jpeg

    cases = [("/usr/share/doc/nodejs/thin-white-stripe.jpg", (58, 493, 3)),
             ("/usr/share/doc/nodejs/full-white-stripe.jpg", (312, 493, 3))]
    found = [(p, s) for p, s in cases if os.path.exists(p)]
    if not found:
        pytest.skip("no system progressive JPEGs on this machine")
    for p, shape in found:
        img = decode_jpeg(open(p, "rb").read())
        assert img.shape == shape, p
        assert 150 < img.mean() < 256                # near-white artwork


def test_jpeg_progressive_matches_imageio(spark):
    """Pixel-level ground truth: decode system progressive JPEGs AND our
    own progressive fixtures with the JVM's javax.imageio (libjpeg-class
    stock decoder, reached through the Spark gateway — no Python imaging
    dependency) and require agreement within IDCT-rounding distance."""
    import os

    import numpy as np

    from etl_mark1_spark.operators.jpeg import decode_jpeg, make_jpeg

    jvm = spark._jvm

    def imageio_rgb(blob):
        stream = jvm.java.io.ByteArrayInputStream(bytearray(blob))
        img = jvm.javax.imageio.ImageIO.read(stream)
        if img is None:
            return None
        hh, ww = img.getHeight(), img.getWidth()
        arr = np.array(img.getRGB(0, 0, ww, hh, None, 0, ww),
                       dtype=np.int64).reshape(hh, ww)
        return np.stack([(arr >> 16) & 0xFF, (arr >> 8) & 0xFF,
                         arr & 0xFF], axis=-1)

    # our progressive fixture must be ACCEPTED by the stock decoder and
    # agree with our own decode (4:4:4: both sides' diffs are pure IDCT
    # rounding)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    blob = make_jpeg(img, progressive=True)
    ref = imageio_rgb(blob)
    assert ref is not None, "stock decoder refused our progressive output"
    assert np.abs(decode_jpeg(blob).astype(int) - ref).max() <= 3

    # real-world progressive files (libjpeg AC successive approximation)
    sysjpg = "/usr/share/doc/nodejs/thin-white-stripe.jpg"
    if os.path.exists(sysjpg):
        data = open(sysjpg, "rb").read()
        ref = imageio_rgb(data)
        assert np.abs(decode_jpeg(data).astype(int) - ref).max() <= 3


def test_audio_spectral_tone_physics():
    """First-principles oracle for the spectral features: a pure f-Hz
    tone has centroid ~= f, zcr = 2f/rate, rolloff ~= f and narrow
    bandwidth; white noise has high centroid/rolloff/zcr. No audio
    library involved anywhere."""
    import numpy as np

    from etl_mark1_spark.operators.multimodal import (audio_spectral_bytes,
                                                      make_wav)

    t = np.arange(16000) / 16000.0
    tone = (0.5 * np.sin(2 * np.pi * 1000 * t) * 32767).astype(np.int16)
    rate, dur, rms, zcr, cent, roll, bw = audio_spectral_bytes(
        make_wav(tone, 16000))
    assert (rate, dur) == (16000, 1000)
    assert abs(rms - 0.5 / 2 ** 0.5) < 0.01
    assert abs(zcr - 0.125) < 0.002
    assert abs(cent - 1000) < 40 and abs(roll - 1000) < 80
    assert bw < 100

    rng = np.random.default_rng(5)
    noise = (rng.uniform(-0.5, 0.5, 16000) * 32767).astype(np.int16)
    _, _, _, nzcr, ncent, nroll, nbw = audio_spectral_bytes(
        make_wav(noise, 16000))
    assert nzcr > 0.4 and ncent > 3000 and nroll > 6000 and nbw > 1500
    # sub-frame clips zero-pad instead of crashing
    assert audio_spectral_bytes(make_wav(tone[:100], 16000))[1] == 6


def test_audio_features_distributed(spark):
    """The Spark path: id-seeded sines (freq = 110*(1 + id%8)) through
    audio_features must land each doc's spectral centroid on its OWN
    attached frequency — physics as the distributed oracle."""
    from etl_mark1_spark.operators.multimodal import (attach_wav_media,
                                                      audio_features)

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(1, 17)])
    rows = {r.doc_id: r for r in
            audio_features(attach_wav_media(docs)).collect()}
    assert len(rows) == 16
    for i, r in rows.items():
        want = 110.0 * (1 + i % 8)
        assert abs(r.spectral_centroid_hz - want) < 35, (i, want, r)
        assert abs(r.zcr - 2 * want / 16000) < 0.02, i


def test_resize_images_real_codec_roundtrip(spark):
    """codec='real' resize: decode (any vendored format) -> bilinear ->
    BMP re-encode; the output re-decodes to the target dimensions and
    preserves image statistics (a constant image stays constant, a
    gradient keeps its mean within quantization distance)."""
    import numpy as np

    from etl_mark1_spark.operators.multimodal import (
        attach_jpeg_media, decode_image_pixels, decode_images,
        resize_images)

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(1, 9)])
    media = resize_images(attach_jpeg_media(docs), 12, 10, codec="real")
    out = media.collect()
    feats = {r.doc_id: r for r in
             decode_images(media, codec="real").collect()}
    assert len(feats) == 8
    for r in out:
        px = decode_image_pixels(bytes(r.content))
        assert px.shape == (10, 12, 3)
        assert r.media_meta.format == "bmp"
        assert (r.media_meta.width, r.media_meta.height) == (12, 10)
        assert r.media_meta.n_bytes == len(bytes(r.content))
    for i, r in feats.items():
        assert (r.width, r.height) == (12, 10), i
        # gradients' mean is scale-invariant modulo codec loss
        assert 60 < r.mean_pixel < 200, i


def test_resize_images_real_codec_pgm(spark):
    """codec='real' on grayscale PGM (P5): decode_image_pixels returns
    (h, w, 1) for PGM — the resize path must squeeze the singleton channel
    before the 24-bit BMP re-encode (ADVICE r6: this crashed in make_bmp).
    A constant-gray PGM resizes to a constant-gray BMP of the target
    dims."""
    import numpy as np

    from etl_mark1_spark.operators.multimodal import (
        decode_image_pixels, resize_images)

    def pgm(i: int) -> bytes:
        w, h = 9 + i, 7 + i
        return (f"P5 {w} {h} 255\n".encode()
                + bytes([40 + i] * (w * h)))

    rows = [Row(doc_id=i, content=bytearray(pgm(i)),
                media_meta=Row(modality="image", format="pgm",
                               width=9 + i, height=7 + i,
                               sample_rate=None, channels=None,
                               duration_ms=None,
                               n_bytes=len(pgm(i))))
            for i in range(1, 5)]
    schema = ("doc_id long, content binary, media_meta struct<"
              "modality string, format string, width int, height int, "
              "sample_rate int, channels int, duration_ms long, "
              "n_bytes long>")
    docs = spark.createDataFrame(rows, schema=schema)
    out = resize_images(docs, 6, 4, codec="real").collect()
    assert len(out) == 4
    for r in out:
        px = decode_image_pixels(bytes(r.content))
        assert px.shape == (4, 6, 3)
        i = int(r.doc_id)
        assert (px == 40 + i).all(), i  # constant image stays constant
        assert r.media_meta.format == "bmp"
        assert (r.media_meta.width, r.media_meta.height) == (6, 4)


def test_resize_bilinear_identity_and_shapes():
    import numpy as np

    from etl_mark1_spark.operators.multimodal import _resize_bilinear

    img = np.full((20, 30, 3), 77, dtype=np.uint8)
    out = _resize_bilinear(img, 7, 5)
    assert out.shape == (5, 7, 3) and (out == 77).all()
    grad = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (16, 1))
    out = _resize_bilinear(grad, 32, 8)
    assert out.shape == (8, 32)
    assert abs(int(out[0, 0]) - 2) <= 4 and abs(int(out[0, -1]) - 253) <= 4
    assert all(out[0, i] <= out[0, i + 1] for i in range(31))
    # identity-size resample reproduces the image exactly at pixel centers
    same = _resize_bilinear(grad, 64, 16)
    assert np.array_equal(same, grad)


# -- perceptual image hashing + near-dup image dedup --------------------------

def test_image_hashes_robust_and_separating():
    """dHash must survive JPEG re-encoding, 2x bilinear upscale, and a
    uniform brightness shift within a small hamming budget while distinct
    source images stay far apart; pHash is bit-exact under upscale and
    near-exact under brightness shift (DC-only), but JPEG quantization
    noise flips near-zero AC bits — its documented wider-threshold
    regime. All deterministic: seeded fixtures, vendored codecs."""
    import numpy as np

    from etl_mark1_spark.operators.jpeg import make_jpeg
    from etl_mark1_spark.operators.multimodal import (
        _dhash, _phash, _resize_bilinear, _smooth_image,
        decode_image_pixels, make_bmp)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    d_base, p_base = [], []
    for seed in range(12):
        px = _smooth_image(seed)
        orig = decode_image_pixels(make_bmp(px))
        jpg = decode_image_pixels(make_jpeg(px, quality=85))
        up = decode_image_pixels(make_bmp(_resize_bilinear(px, 96, 96)))
        bright = np.clip(px.astype(np.int16) + 20, 0, 255).astype(np.uint8)

        d0 = _dhash(orig)
        assert ham(d0, _dhash(jpg)) <= 4
        assert ham(d0, _dhash(up)) <= 4
        assert ham(d0, _dhash(bright)) <= 2   # differences are shift-immune
        p0 = _phash(orig)
        assert ham(p0, _phash(up)) <= 2       # same resample target
        assert ham(p0, _phash(bright)) <= 2   # only DC moves
        assert ham(p0, _phash(jpg)) <= 14     # near-zero AC bits are noisy
        d_base.append(d0)
        p_base.append(p0)

    for i in range(len(d_base)):
        for j in range(i + 1, len(d_base)):
            assert ham(d_base[i], d_base[j]) > 4, (i, j)
            assert ham(p_base[i], p_base[j]) > 14, (i, j)


def test_with_image_hash_rejects_unknown_method(spark):
    import pytest as _pytest

    from etl_mark1_spark.operators.multimodal import with_image_hash

    df = spark.range(1).select(F.lit(None).cast("binary").alias("content"))
    with _pytest.raises(ValueError, match="unknown image hash method"):
        with_image_hash(df, method="md5")


def test_image_neardup_reunites_planted_variants(spark):
    """End-to-end distributed check: 20 source images x 3 encodings
    (BMP / JPEG q85 / upscaled BMP) must come back as exactly 20
    clusters of size 3, with every member of a cluster sharing
    doc_id // 3 — no missed re-encodes, no cross-source merges."""
    from etl_mark1_spark.operators.multimodal import (
        attach_neardup_image_media, image_neardup, with_image_hash)

    docs = spark.range(60).withColumnRenamed("id", "doc_id")
    imgs = attach_neardup_image_media(docs)

    hashed = with_image_hash(imgs)   # dhash default; 8-byte key column
    assert dict(hashed.dtypes)["image_hash"] == "bigint"

    got = image_neardup(imgs, max_hamming=4).collect()
    assert len(got) == 60
    groups: dict = {}
    for r in got:
        groups.setdefault(r.cluster_id, []).append(int(r.doc_id))
    assert len(groups) == 20
    for members in groups.values():
        assert len(members) == 3
        assert len({m // 3 for m in members}) == 1, members


# -- audio fingerprinting + near-dup audio dedup ------------------------------

def test_g711_encoder_roundtrips_within_companding_error():
    """make_wav_g711 compresses to the nearest expand level of the exact
    ITU tables; decoding its output must reproduce the input within the
    level spacing (which grows with amplitude — logarithmic companding),
    and the full encode must parse through the RIFF walk with the right
    format code."""
    import numpy as np

    from etl_mark1_spark.operators.multimodal import (
        _ULAW_TABLE, _wav_fmt_code, _wav_samples, make_wav_g711)

    rng = np.random.default_rng(7)
    pcm = (rng.uniform(-1, 1, 4000) * 20000).astype(np.int16)
    for law, code in (("ulaw", 7), ("alaw", 6)):
        blob = make_wav_g711(pcm, 8000, law)
        assert _wav_fmt_code(blob) == code
        rate, ch, x = _wav_samples(blob)
        assert (rate, ch) == (8000, 1)
        err = np.abs(x * 32768.0 - pcm)
        assert err.max() < 1000            # worst-case spacing at |x|~20k
        assert np.mean(err) < 120

    with pytest.raises(ValueError, match="unknown companding law"):
        make_wav_g711(pcm, 8000, "gsm")


def test_audio_fingerprint_robust_and_separating():
    """The 64-bit spectral fingerprint must survive G.711 companding and
    2:1 decimation within a small hamming budget while distinct tone
    mixes stay far apart (deterministic seeded fixtures)."""
    import numpy as np

    from etl_mark1_spark.operators.multimodal import (
        _band_energy_fingerprint, _wav_samples, make_wav, make_wav_g711)

    def synth(seed):
        rng = np.random.default_rng(seed)
        rate, n_seg, seg_len = 16000, 9, 1600
        t = np.arange(n_seg * seg_len) / rate
        x = np.zeros(len(t))
        band_edges = np.geomspace(150.0, 3200.0, 9)
        for b in range(8):
            f = rng.uniform(band_edges[b] * 1.1, band_edges[b + 1] * 0.9)
            lvl = rng.integers(0, 3, size=n_seg)
            for s in range(1, n_seg):
                if lvl[s] == lvl[s - 1]:
                    lvl[s] = (lvl[s] + 1 + rng.integers(0, 2)) % 3
            env = np.repeat(np.array([0.25, 0.5, 1.0])[lvl], seg_len)
            x += env * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
        x /= np.abs(x).max() + 1e-9
        return (x * 20000).astype(np.int16), rate

    def fp(blob):
        rate, ch, x = _wav_samples(blob)
        return _band_energy_fingerprint(x, rate, ch or 1)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    base = []
    for seed in range(12):
        pcm, rate = synth(seed)
        f0 = fp(make_wav(pcm, rate))
        assert ham(f0, fp(make_wav_g711(pcm, rate, "ulaw"))) <= 6
        assert ham(f0, fp(make_wav(pcm[::2], rate // 2))) <= 6
        half = (pcm.astype(np.int32) // 2).astype(np.int16)
        assert ham(f0, fp(make_wav(half, rate))) <= 2   # gain-immune
        base.append(f0)
    for i in range(len(base)):
        for j in range(i + 1, len(base)):
            assert ham(base[i], base[j]) > 6, (i, j)


def test_audio_neardup_reunites_planted_variants(spark):
    """Distributed end-to-end: 20 tone mixes x 3 encodings must come back
    as exactly 20 clusters of size 3 grouped by doc_id // 3."""
    from etl_mark1_spark.operators.multimodal import (
        attach_neardup_audio_media, audio_neardup)

    docs = spark.range(60).withColumnRenamed("id", "doc_id")
    wavs = attach_neardup_audio_media(docs)
    got = audio_neardup(wavs, max_hamming=6).collect()
    assert len(got) == 60
    groups: dict = {}
    for r in got:
        groups.setdefault(r.cluster_id, []).append(int(r.doc_id))
    assert len(groups) == 20
    for members in groups.values():
        assert len(members) == 3
        assert len({m // 3 for m in members}) == 1, members


# -- video near-dup: frame-aligned hash sequences -----------------------------

def test_with_video_frame_hashes_shape(spark):
    """Each 16-frame 4fps clip sampled at 1000ms yields exactly 4 rows of
    (doc_id, frame_idx, fhash), and the same content re-encoded at lower
    quality produces near-identical aligned hashes."""
    from etl_mark1_spark.operators.multimodal import (
        attach_neardup_video_media, with_video_frame_hashes)

    docs = spark.range(6).withColumnRenamed("id", "doc_id")
    vids = attach_neardup_video_media(docs)
    got = with_video_frame_hashes(vids).collect()
    assert len(got) == 6 * 4
    by_doc = {}
    for r in got:
        by_doc.setdefault(int(r.doc_id), {})[int(r.frame_idx)] = int(r.fhash)
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_doc.values())
    for fi in range(4):     # doc 0 (q90) vs doc 1 (q70): same group 0
        d = (by_doc[0][fi] ^ by_doc[1][fi]) & ((1 << 64) - 1)
        assert bin(d).count("1") <= 4, fi


def test_video_neardup_reunites_planted_variants(spark):
    """Distributed end-to-end: 15 source clips x 3 encodings must come
    back as exactly 15 clusters of size 3 grouped by doc_id // 3."""
    from etl_mark1_spark.operators.multimodal import (
        attach_neardup_video_media, video_neardup)

    docs = spark.range(45).withColumnRenamed("id", "doc_id")
    vids = attach_neardup_video_media(docs)
    got = video_neardup(vids, max_hamming=4, min_match_frac=0.8).collect()
    assert len(got) == 45
    groups: dict = {}
    for r in got:
        groups.setdefault(r.cluster_id, []).append(int(r.doc_id))
    assert len(groups) == 15
    for members in groups.values():
        assert len(members) == 3
        assert len({m // 3 for m in members}) == 1, members


def test_video_neardup_prefix_clip_does_not_merge(spark):
    """A clip that is a strict PREFIX of a longer video matches every
    aligned frame but fails the longer side's min_match_frac — the
    greatest(na, nb) denominator is what prevents subset merges."""
    import pandas as pd_

    from etl_mark1_spark.operators.avi import make_avi
    from etl_mark1_spark.operators.jpeg import make_jpeg
    from etl_mark1_spark.operators.multimodal import (_smooth_image,
                                                      video_neardup)

    frames = [make_jpeg(_smooth_image(5000 + k), quality=90)
              for k in range(16)]
    rows = [(0, make_avi(frames, fps=4)),          # 4s -> 4 sampled
            (1, make_avi(frames[:4], fps=4))]      # 1s prefix -> 1 sampled
    df = spark.createDataFrame(
        pd_.DataFrame(rows, columns=["doc_id", "content"]))
    got = {int(r.doc_id): r.cluster_id
           for r in video_neardup(df, min_match_frac=0.8).collect()}
    assert got[0] != got[1]


# -- streaming dedup-on-ingest ------------------------------------------------

_ING_A = ("the quick brown fox jumps over the lazy dog while the band "
          "plays on and the crowd cheers loudly in the warm evening air")
_ING_B = ("completely different content about distributed query engines "
          "and shuffle partitioning strategies for large analytical jobs")
_ING_C = ("a third unrelated passage mentioning neither foxes nor query "
          "engines but rather the economics of medieval salt trading")


def _write_ingest_file(spark, src_dir, rows, mtime):
    import glob
    import os
    stage = src_dir + f"_stage{int(mtime)}"
    (spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1)
     .write.mode("overwrite").parquet(stage))
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    os.makedirs(src_dir, exist_ok=True)
    dst = os.path.join(src_dir, f"b{int(mtime)}.parquet")
    os.replace(part, dst)
    os.utime(dst, (mtime, mtime))   # deterministic oldest-first pickup


def test_dedup_ingest_sink_dedups_across_batches_and_drains(spark, tmp_path):
    """Two files -> two micro-batches in ONE drain (maxFilesPerTrigger=1):
    batch 2's near-copy of a batch-1 doc is rejected via the index rows
    appended mid-drain. A replay drain on the same checkpoint appends
    nothing; a later drain still dedups against the whole history."""
    import time

    from etl_mark1_spark.sources.versioned import history, read_table
    from etl_mark1_spark.streaming.events import dedup_ingest_sink

    src = str(tmp_path / "src")
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    now = time.time()
    _write_ingest_file(spark, src, [(0, _ING_A), (1, _ING_B)], now - 100)
    _write_ingest_file(spark, src,
                       [(10, _ING_A + " tail"), (11, _ING_C)], now - 50)

    def drain():
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        dedup_ingest_sink(stream, corpus_dir, index_dir, ckpt,
                          threshold=0.6)

    drain()
    kept = {r.doc_id for r in read_table(spark, corpus_dir).collect()}
    assert kept == {0, 1, 11}       # 10 caught by mid-drain index growth
    assert {r.doc_id for r in read_table(spark, index_dir).collect()} == kept
    n_versions = len(history(corpus_dir))

    drain()                          # replay: nothing new, nothing appended
    assert len(history(corpus_dir)) == n_versions
    assert {r.doc_id
            for r in read_table(spark, corpus_dir).collect()} == kept

    _write_ingest_file(spark, src,
                       [(20, _ING_C + " coda"), (21, "entirely novel text "
                         "about glacier dynamics and moraine formation")],
                       now - 10)
    drain()
    kept3 = {r.doc_id for r in read_table(spark, corpus_dir).collect()}
    assert kept3 == {0, 1, 11, 21}  # 20 near-dups doc 11 from drain 1
    assert {r.doc_id
            for r in read_table(spark, index_dir).collect()} == kept3


def test_dedup_ingest_sink_heals_partial_first_batch(spark, tmp_path):
    """Crash-heal regression (round-8 ADVICE): a crash after the FIRST
    batch's corpus commit but before its index commit leaves a corpus
    table with the epoch note and NO index table at all. Replay must
    bootstrap the index (each table's manifest checked independently),
    not crash on read_table(index_dir), and must not double-append the
    corpus."""
    import hashlib
    import os
    import time

    from etl_mark1_spark.sources.versioned import (history, read_table,
                                                   write_version)
    from etl_mark1_spark.streaming.events import dedup_ingest_sink

    src = str(tmp_path / "src")
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    _write_ingest_file(spark, src, [(0, _ING_A), (1, _ING_B)],
                       time.time() - 100)

    # Recreate the partial-commit state the sink itself would leave: the
    # corpus committed under this checkpoint's epoch-0 note, index absent.
    tag = hashlib.sha256(os.path.abspath(ckpt).encode()).hexdigest()[:12]
    docs = spark.createDataFrame([(0, _ING_A), (1, _ING_B)],
                                 "doc_id long, text string")
    write_version(docs, corpus_dir, mode="overwrite",
                  note=f"dedup_ingest:{tag}:0")
    assert not os.path.exists(index_dir)

    dedup_ingest_sink(
        (spark.readStream.schema("doc_id long, text string").parquet(src)),
        corpus_dir, index_dir, ckpt, threshold=0.6)

    # Healed: corpus NOT double-appended (one version, same rows), index
    # bootstrapped with exactly the batch's rows.
    assert len(history(corpus_dir)) == 1
    assert {r.doc_id for r in read_table(spark, corpus_dir).collect()} \
        == {0, 1}
    assert {r.doc_id for r in read_table(spark, index_dir).collect()} \
        == {0, 1}


# -- EXIF metadata ---------------------------------------------------------------

def test_exif_roundtrip_both_byte_orders():
    from etl_mark1_spark.operators.jpeg import (insert_app1, make_exif_app1,
                                                make_jpeg, parse_exif)

    jp = make_jpeg([[10, 20], [30, 40]])
    want = {"make": "CamCo", "model": "M3", "orientation": 6,
            "datetime_original": "2026:08:15 12:00:00",
            "pixel_x": 640, "pixel_y": 480}
    for be in (False, True):
        app1 = make_exif_app1(orientation=6, make="CamCo", model="M3",
                              datetime_original="2026:08:15 12:00:00",
                              pixel_x=640, pixel_y=480, big_endian=be)
        assert parse_exif(insert_app1(jp, app1)) == want
    # partial tags; short ASCII inline path (<= 4 bytes incl. NUL)
    assert parse_exif(insert_app1(jp, make_exif_app1(
        orientation=2, make="X"))) == {"orientation": 2, "make": "X"}


def test_exif_tolerant_on_absent_and_malformed():
    from etl_mark1_spark.operators.jpeg import (insert_app1, make_exif_app1,
                                                make_jpeg, parse_exif)

    jp = make_jpeg([[10, 20], [30, 40]])
    assert parse_exif(jp) == {}
    assert parse_exif(b"\xff\xd8\xff\xe1\x00\x08Exif\0\0") == {}
    assert parse_exif(b"not a jpeg") == {}
    # truncated APP1 bodies never raise
    app1 = make_exif_app1(orientation=6, make="CamCo", pixel_x=9)
    full = insert_app1(jp, app1)
    for cut in range(4, len(app1), 7):
        broken = jp[:2] + app1[:cut] + jp[2:]
        assert isinstance(parse_exif(broken), dict)
    assert parse_exif(full)["orientation"] == 6


def test_exif_decode_unaffected_by_app1():
    import numpy as np

    from etl_mark1_spark.operators.jpeg import (decode_jpeg, insert_app1,
                                                make_exif_app1, make_jpeg)

    jp = make_jpeg([[0, 128], [128, 255]])
    plain = decode_jpeg(jp)
    tagged = decode_jpeg(insert_app1(jp, make_exif_app1(orientation=8)))
    assert np.array_equal(plain, tagged)


def test_with_image_exif_dataframe(spark):
    from etl_mark1_spark.operators.jpeg import (insert_app1, make_exif_app1,
                                                make_jpeg)
    from etl_mark1_spark.operators.multimodal import with_image_exif

    jp = make_jpeg([[10, 20], [30, 40]])
    rows = [(1, insert_app1(jp, make_exif_app1(orientation=6,
                                               make="CamCo"))),
            (2, jp),
            (3, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    out = {r.doc_id: r for r in with_image_exif(df).collect()}
    assert out[1].exif_orientation == 6 and out[1].exif_make == "CamCo"
    assert out[2].exif_orientation is None
    assert out[3].exif_make is None


def test_apply_exif_orientation_all_eight():
    """Differential against the defining operations: each orientation is
    a composition of transpose/flips; applying the transform then its
    known inverse must restore the original."""
    import numpy as np
    import pytest as _pytest

    from etl_mark1_spark.operators.multimodal import apply_exif_orientation

    a = np.arange(24).reshape(2, 4, 3)
    assert np.array_equal(apply_exif_orientation(a, 1), a)
    assert np.array_equal(apply_exif_orientation(a, None), a)
    assert np.array_equal(apply_exif_orientation(a, 2), a[:, ::-1])
    assert np.array_equal(apply_exif_orientation(a, 3), a[::-1, ::-1])
    assert np.array_equal(apply_exif_orientation(a, 4), a[::-1, :])
    t = np.swapaxes(a, 0, 1)
    assert np.array_equal(apply_exif_orientation(a, 5), t)
    assert np.array_equal(apply_exif_orientation(a, 6), t[:, ::-1])
    assert np.array_equal(apply_exif_orientation(a, 7), t[::-1, ::-1])
    assert np.array_equal(apply_exif_orientation(a, 8), t[::-1, :])
    # rotations change dims for non-square images
    assert apply_exif_orientation(a, 6).shape == (4, 2, 3)
    # inverses: 6 (90 CW) undone by 8 (90 CCW); involutions undo selves
    for o, inv in ((2, 2), (3, 3), (4, 4), (5, 5), (6, 8), (7, 7), (8, 6)):
        assert np.array_equal(
            apply_exif_orientation(apply_exif_orientation(a, o), inv), a)
    with _pytest.raises(ValueError, match="orientation"):
        apply_exif_orientation(a, 9)


def test_normalize_orientation_dataframe(spark):
    import numpy as np

    from etl_mark1_spark.operators.jpeg import (insert_app1, make_exif_app1,
                                                make_jpeg)
    from etl_mark1_spark.operators.multimodal import (decode_image_pixels,
                                                      normalize_orientation)

    # 2x4 landscape, distinct corner values survive q95 well enough to
    # compare via the re-decoded reference pixels
    base = [[0, 60, 120, 180], [255, 200, 140, 80]]
    jp = make_jpeg(base)
    ref = decode_image_pixels(jp)          # post-codec reference pixels
    rows = [(1, insert_app1(jp, make_exif_app1(orientation=6))),
            (2, insert_app1(jp, make_exif_app1(orientation=3))),
            (3, jp)]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    out = {r.doc_id: r for r in normalize_orientation(df).collect()}
    assert (out[1].width, out[1].height) == (2, 4)   # rotated 90
    assert (out[2].width, out[2].height) == (4, 2)   # rotated 180
    assert (out[3].width, out[3].height) == (4, 2)   # untouched dims
    got1 = decode_image_pixels(bytes(out[1].content))
    want1 = np.flip(np.swapaxes(np.stack([ref] * 3, -1), 0, 1), 1)
    assert np.array_equal(got1, want1)


def test_image_neardup_exif_normalized_rotated_resave_reunites(spark):
    """A camera-rotated re-save (same photo, EXIF orientation 6 + pixels
    stored rotated) must reunite with the original ONLY when
    normalize_exif is on — and a genuinely rotated image without EXIF
    must still NOT merge (rotation is content, metadata is not)."""
    import numpy as np

    from etl_mark1_spark.operators.jpeg import (insert_app1, make_exif_app1,
                                                make_jpeg)
    from etl_mark1_spark.operators.multimodal import (
        apply_exif_orientation, decode_image_pixels, image_neardup,
        make_bmp)

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(24, 32), dtype=np.uint8)
    orig = make_jpeg(base.tolist(), quality=95)
    # the camera stored the sensor image rotated 90 CW and set
    # orientation=8 so viewers rotate it back (8 undoes 6)
    stored = apply_exif_orientation(
        decode_image_pixels(orig), 6).astype(np.uint8)
    resave = insert_app1(make_jpeg(stored.tolist(), quality=95),
                         make_exif_app1(orientation=8))
    # genuine rotation: same pixels, no EXIF — different content
    genuine = make_jpeg(stored.tolist(), quality=95)

    df = spark.createDataFrame(
        [(1, orig), (2, resave), (3, genuine)],
        "doc_id bigint, content binary")

    plain = {r.doc_id: r.cluster_id
             for r in image_neardup(df, max_hamming=6).collect()}
    assert plain[1] != plain[2]          # without EXIF handling: split
    normed = {r.doc_id: r.cluster_id
              for r in image_neardup(df, max_hamming=6,
                                     normalize_exif=True).collect()}
    assert normed[1] == normed[2]        # metadata rotation undone
    assert normed[1] != normed[3]        # content rotation still distinct
