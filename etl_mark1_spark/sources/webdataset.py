"""WebDataset tar-shard source — the de-facto container for multimodal
training data (tar files of ``{key}.jpg`` / ``{key}.txt`` / ``{key}.json``
member groups, streamed sequentially by loaders).

Extension family: the reference ingests row-oriented files only
(backend/services/file_service.py); multimodal corpora ship as tar
shards precisely so that a sample's image/caption/metadata sit
contiguously. Reading follows the PDF/WARC shape: ``binaryFile`` assigns
whole shards to tasks (a million-shard corpus fans out across executors,
zero driver traffic) and the stdlib ``tarfile`` walk groups members into
samples per shard inside ``mapInPandas``. WebDataset semantics: a
sample's key is the member name up to the FIRST dot, so ``x.seg.png``
has key ``x`` and extension ``seg.png``; samples end when the key
changes (members of one sample are contiguous in a well-formed shard —
this reader tolerates interleaving by grouping per whole shard).

``make_webdataset_tar`` builds spec-shaped fixtures for tests and the
catalog entry.
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = ["make_webdataset_tar", "iter_webdataset_samples",
           "read_webdataset"]


def make_webdataset_tar(samples: list[dict], key_field: str = "__key__",
                        ) -> bytes:
    """Tar bytes from sample dicts: ``{"__key__": "000001", "txt": b"..",
    "json": b"..", ...}`` — one member per non-key field, named
    ``{key}.{ext}``, in dict order, samples contiguous (the layout
    loaders rely on)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for s in samples:
            key = s[key_field]
            for ext, data in s.items():
                if ext == key_field:
                    continue
                if isinstance(data, str):
                    data = data.encode("utf-8")
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                info.mtime = 0  # deterministic bytes across runs
                tar.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def iter_webdataset_samples(data: bytes) -> Iterator[tuple[str, dict]]:
    """(key, {ext: bytes}) per sample in a tar shard's bytes. Key = name
    up to the first dot (WebDataset rule); directories and PAX headers
    are skipped; samples yield in first-appearance order of their key."""
    order: list[str] = []
    groups: dict[str, dict] = {}
    with tarfile.open(fileobj=io.BytesIO(data), mode="r") as tar:
        for member in tar:
            if not member.isfile():
                continue
            name = member.name.rsplit("/", 1)[-1]
            if "." not in name:
                continue
            key, ext = name.split(".", 1)
            payload = tar.extractfile(member).read()
            if key not in groups:
                groups[key] = {}
                order.append(key)
            groups[key][ext] = payload
    for key in order:
        yield key, groups[key]


def _shard_fs(path: str):
    """(pyarrow filesystem, base path) for a shard-sink destination:
    URIs (``s3://bucket/prefix``, ``gs://``, ``hdfs://``, ``file:///``)
    resolve through ``pyarrow.fs.FileSystem.from_uri``; scheme-less
    strings are local paths. Called independently on the driver (manifest
    commit) and inside each executor task (shard writes) — pyarrow needs
    no JVM bridge, so the same code runs on both sides."""
    import os

    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), os.path.abspath(path)


def write_webdataset_shards(df: DataFrame, path: str,
                            members: dict[str, str],
                            num_shards: int = 64,
                            key_col: str = "doc_id") -> dict:
    """Export a curated corpus as WebDataset tar shards — the last-mile
    sink for multimodal training: ``members`` maps member extension to
    source column (string or binary), e.g. ``{"txt": "text", "json":
    "meta", "jpg": "image"}``.

    Same determinism contract as ``write_training_shards``
    (sources/writers.py): shard membership is md5-of-key (re-runs and
    repartitions produce byte-identical shards — tar member mtimes are
    zeroed), samples sort by key within a shard, and a ``_manifest.json``
    with per-shard sample counts commits LAST. One groupBy-shard pass:
    each shard group builds its tar EXECUTOR-side and writes
    ``shard-{K:05d}.tar``; nothing flows through the driver. Returns the
    manifest dict.

    Writes go through ``pyarrow.fs`` (:func:`_shard_fs` — the Arrow
    filesystem layer the Parquet scan path already ships), resolved from
    the path's URI scheme ON EACH EXECUTOR: ``s3://`` / ``gs://`` /
    ``abfs://`` / ``hdfs://`` (where libhdfs is present) or plain local
    paths all work, with credentials from the task environment (IAM
    role, env vars), so a multi-node cluster needs NO shared POSIX mount
    — executors stream their shard tars straight to the object store
    while the driver commits the manifest to the same location. (This
    replaces the round-7 executor-side ``open()``, which silently
    scattered shards across node-local disks without a shared mount.)
    Each shard group is still materialized in executor memory while its
    tar is built — size ``num_shards`` so ``total_bytes / num_shards``
    fits comfortably in one task."""
    import json

    from pyspark.sql import functions as F

    fs, base = _shard_fs(path)
    fs.create_dir(base, recursive=True)
    hcol = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8),
                  16, 10).cast("bigint")
    tagged = df.withColumn("_shard", (hcol % num_shards).cast("int"))
    exts = list(members)
    cols = [key_col] + [members[e] for e in exts]

    def build(pdf):
        import pandas as pd

        shard = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(key_col)
        samples = []
        for _, row in pdf.iterrows():
            s = {"__key__": f"{row[key_col]}"}
            for ext in exts:
                v = row[members[ext]]
                if v is not None:
                    s[ext] = bytes(v) if not isinstance(v, (str, bytes)) \
                        else v
            samples.append(s)
        # resolve the filesystem INSIDE the task: executors have no py4j
        # bridge, but pyarrow.fs is plain Python + C++ and ships with
        # every PySpark worker
        tfs, tbase = _shard_fs(path)
        with tfs.open_output_stream(
                f"{tbase}/shard-{shard:05d}.tar") as fh:
            fh.write(make_webdataset_tar(samples))
        return pd.DataFrame({"shard": [shard], "n": [len(samples)]})

    stats = (tagged.select("_shard", *cols)
             .groupBy("_shard")
             .applyInPandas(build, "shard int, n long")
             .collect())
    manifest = {
        "format": "webdataset",
        "num_shards": num_shards,
        "total_samples": int(sum(r.n for r in stats)),
        "shard_samples": {str(r.shard): int(r.n)
                          for r in sorted(stats, key=lambda r: r.shard)},
        "members": {e: members[e] for e in exts},
    }
    with fs.open_output_stream(f"{base}/_manifest.json") as fh:
        fh.write(json.dumps(manifest, indent=1, sort_keys=True)
                 .encode("utf-8"))
    return manifest


def _samples_from_blobs(blobs: DataFrame,
                        extensions: tuple[str, ...]) -> DataFrame:
    """Shared walk for the batch and streaming readers: (path, content)
    blobs → one row per sample."""
    cols = {ext: ext.replace(".", "_") for ext in extensions}
    schema = "path string, key string, " + ", ".join(
        f"{c} binary" for c in cols.values())

    def walk(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for key, group in iter_webdataset_samples(bytes(content)):
                    rows.append((p, key, *[group.get(ext)
                                           for ext in extensions]))
            yield pd.DataFrame(
                rows, columns=["path", "key", *cols.values()])

    return blobs.mapInPandas(walk, schema=schema)


def read_webdataset(spark: SparkSession, path: str,
                    extensions: tuple[str, ...] = ("txt", "json"),
                    ) -> DataFrame:
    """Distributed WebDataset ingest: one row per sample —
    ``(path, key, <ext> binary ...)`` with one binary column per
    requested extension (NULL when the sample lacks it; dots in
    extensions become ``_`` in column names). Decode text members with
    ``F.decode`` or operators/encoding.py; image/audio members flow
    straight into the multimodal decoders."""
    blobs = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return _samples_from_blobs(blobs, extensions)


_BINARYFILE_SCHEMA = ("path string, modificationTime timestamp, "
                      "length long, content binary")


def stream_webdataset(spark: SparkSession, path: str,
                      extensions: tuple[str, ...] = ("txt", "json"),
                      ) -> DataFrame:
    """Streaming WebDataset ingest: shards keep landing in ``path``, each
    micro-batch walks only the NEW ones (binaryFile file-source tracking
    via the query checkpoint) — the same incremental shape as
    ``sources/warc.py:stream_warc``, so tar-sharded corpora feed
    dedup-on-ingest or any foreachBatch sink without re-reading history."""
    blobs = (spark.readStream.format("binaryFile")
             .schema(_BINARYFILE_SCHEMA)
             .load(path)
             .select("path", "content"))
    return _samples_from_blobs(blobs, extensions)
