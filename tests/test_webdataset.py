"""WebDataset tar-shard source (sources/webdataset.py)."""

from pyspark.sql import functions as F

from etl_mark1_spark.sources.webdataset import (
    iter_webdataset_samples,
    make_webdataset_tar,
    read_webdataset,
)

SAMPLES = [
    {"__key__": "000001", "txt": "first caption", "json": b'{"a": 1}',
     "jpg": b"\xff\xd8fakejpeg"},
    {"__key__": "000002", "txt": "second caption", "json": b'{"a": 2}'},
]


def test_fixture_roundtrip_and_key_rule():
    out = dict(iter_webdataset_samples(make_webdataset_tar(SAMPLES)))
    assert set(out) == {"000001", "000002"}
    assert out["000001"]["txt"] == b"first caption"
    assert out["000001"]["jpg"].startswith(b"\xff\xd8")
    assert "jpg" not in out["000002"]


def test_first_dot_key_rule_for_dotted_extensions():
    tar = make_webdataset_tar(
        [{"__key__": "x", "seg.png": b"mask", "txt": b"t"}])
    out = dict(iter_webdataset_samples(tar))
    assert out == {"x": {"seg.png": b"mask", "txt": b"t"}}


def test_deterministic_bytes():
    assert make_webdataset_tar(SAMPLES) == make_webdataset_tar(SAMPLES)


def test_read_webdataset_distributed(spark, tmp_path):
    (tmp_path / "s1.tar").write_bytes(make_webdataset_tar(SAMPLES))
    (tmp_path / "s2.tar").write_bytes(make_webdataset_tar(
        [{"__key__": "000003", "txt": "third"}]))
    out = read_webdataset(spark, str(tmp_path),
                          extensions=("txt", "json", "jpg")) \
        .orderBy("key").collect()
    assert [r.key for r in out] == ["000001", "000002", "000003"]
    assert bytes(out[0].jpg).startswith(b"\xff\xd8")
    assert out[1].jpg is None          # missing member -> NULL
    assert out[2].json is None
    assert bytes(out[2].txt) == b"third"


def test_read_webdataset_text_decode_composition(spark, tmp_path):
    (tmp_path / "s.tar").write_bytes(make_webdataset_tar(SAMPLES))
    got = (read_webdataset(spark, str(tmp_path))
           .select("key", F.decode("txt", "UTF-8").alias("caption"),
                   F.get_json_object(F.decode("json", "UTF-8"), "$.a")
                    .cast("int").alias("a"))
           .orderBy("key").collect())
    assert [(r.caption, r.a) for r in got] == [("first caption", 1),
                                               ("second caption", 2)]


def test_dotted_extension_column_naming(spark, tmp_path):
    (tmp_path / "s.tar").write_bytes(make_webdataset_tar(
        [{"__key__": "k", "seg.png": b"m"}]))
    df = read_webdataset(spark, str(tmp_path), extensions=("seg.png",))
    assert "seg_png" in df.columns
    assert bytes(df.first().seg_png) == b"m"


def test_write_webdataset_shards_roundtrip_and_determinism(spark, sf_dir,
                                                           tmp_path):
    import glob
    import json as _json

    from etl_mark1_spark.sources.webdataset import write_webdataset_shards

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text",
                    F.to_json(F.struct("lang", "source")).alias("meta")))
    out = str(tmp_path / "wds")
    m = write_webdataset_shards(
        docs, out, {"txt": "text", "json": "meta"}, num_shards=6)
    assert m["total_samples"] == docs.count()
    assert sorted(m["shard_samples"]) == [str(i) for i in range(6)]

    back = read_webdataset(spark, out + "/shard-*.tar")
    assert back.count() == docs.count()
    joined = (back.select(F.col("key").cast("bigint").alias("doc_id"),
                          F.decode("txt", "UTF-8").alias("t2"))
              .join(docs, "doc_id"))
    assert joined.filter(F.col("t2") != F.col("text")).count() == 0

    # byte-identical re-run
    out2 = str(tmp_path / "wds2")
    write_webdataset_shards(docs, out2, {"txt": "text", "json": "meta"},
                            num_shards=6)
    for f1 in sorted(glob.glob(out + "/shard-*.tar")):
        f2 = out2 + "/" + f1.rsplit("/", 1)[1]
        assert open(f1, "rb").read() == open(f2, "rb").read()

    manifest = _json.load(open(out + "/_manifest.json"))
    assert manifest["format"] == "webdataset"


def test_write_webdataset_shards_via_fs_uri(spark, tmp_path):
    """The sink resolves its destination through pyarrow.fs from the URI
    scheme (round-9: replaces the executor-side open() that required a
    shared POSIX mount): a file:// URI must produce byte-identical
    shards + manifest to the plain-path spelling, through the same
    FileSystem.from_uri code path an s3://bucket destination takes."""
    import glob
    import json as _json

    from etl_mark1_spark.sources.webdataset import write_webdataset_shards

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id bigint, text string")
    plain = str(tmp_path / "plain")
    via_uri = str(tmp_path / "uri")
    m1 = write_webdataset_shards(df, plain, {"txt": "text"}, num_shards=4)
    m2 = write_webdataset_shards(df, f"file://{via_uri}", {"txt": "text"},
                                 num_shards=4)
    assert m1 == m2
    shards = sorted(glob.glob(plain + "/shard-*.tar"))
    assert len(shards) == 4
    for f1 in shards:
        f2 = via_uri + "/" + f1.rsplit("/", 1)[1]
        assert open(f1, "rb").read() == open(f2, "rb").read()
    assert _json.load(open(via_uri + "/_manifest.json")) == m1


def test_write_webdataset_null_members_skipped(spark, tmp_path):
    from etl_mark1_spark.sources.webdataset import write_webdataset_shards

    df = spark.createDataFrame(
        [(1, "has caption", b"img"), (2, None, b"img2")],
        "doc_id bigint, text string, image binary")
    out = str(tmp_path / "w")
    write_webdataset_shards(df, out, {"txt": "text", "jpg": "image"},
                            num_shards=1)
    back = read_webdataset(spark, out + "/shard-*.tar",
                           extensions=("txt", "jpg")) \
        .orderBy("key").collect()
    assert bytes(back[0].txt) == b"has caption"
    assert back[1].txt is None and bytes(back[1].jpg) == b"img2"


def test_tar_format_autodetect_and_read_file(spark, tmp_path):
    from etl_mark1_spark.sources.readers import detect_format, read_file

    assert detect_format("shard-00001.tar") == "tar"
    p = tmp_path / "s.tar"
    p.write_bytes(make_webdataset_tar(SAMPLES))
    df = read_file(spark, str(p))
    assert df.count() == 2 and "txt" in df.columns


def test_stream_webdataset_picks_up_only_new_shards(spark, tmp_path):
    from etl_mark1_spark.sources.webdataset import stream_webdataset

    shards = tmp_path / "shards"
    shards.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (shards / "s1.tar").write_bytes(make_webdataset_tar(SAMPLES))

    seen = []

    def grab(batch, _epoch):
        seen.extend((r.key, bytes(r.txt).decode())
                    for r in batch.collect())

    def drain():
        q = (stream_webdataset(spark, str(shards))
             .writeStream.foreachBatch(grab)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    assert sorted(seen) == [("000001", "first caption"),
                            ("000002", "second caption")]
    (shards / "s2.tar").write_bytes(make_webdataset_tar(
        [{"__key__": "000003", "txt": "third"}]))
    seen.clear()
    drain()
    assert seen == [("000003", "third")]
