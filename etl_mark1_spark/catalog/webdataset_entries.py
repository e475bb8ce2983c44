"""WebDataset tar-shard entries (extension family;
sources/webdataset.py).

The entry is a full write-then-ingest round trip: the corpus is written
out as WebDataset tar shards FROM THE EXECUTORS (one shard per
partition, samples = ``{key}.txt`` + ``{key}.json`` member pairs), read
back through the real binaryFile + tarfile walk, and the recovered
(doc_id, text, lang) must be exactly the documents table — the oracle is
the table itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import query, t


@query("webdataset_ingest_docs", """
SELECT doc_id, text, lang FROM documents
""")
def webdataset_ingest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus -> tar shards -> ingest -> corpus, lossless. Keys are
    zero-padded doc ids (WebDataset convention), captions ride as .txt
    members, metadata as .json; the reader's sample grouping, the text
    decode, and the JSON metadata extraction are all on the hash path."""
    import hashlib
    import os
    import shutil
    import tempfile

    from etl_mark1_spark.sources.webdataset import read_webdataset

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    shard_dir = os.path.join(tempfile.gettempdir(), f"etl_mark1_wds_{h}")
    shutil.rmtree(shard_dir, ignore_errors=True)
    os.makedirs(shard_dir)

    def write_shard(rows) -> None:
        import json as _json
        import os as _os
        import uuid as _uuid

        from etl_mark1_spark.sources.webdataset import make_webdataset_tar

        samples = [{"__key__": f"{r['doc_id']:012d}",
                    "txt": r["text"],
                    "json": _json.dumps({"lang": r["lang"]})}
                   for r in rows]
        if samples:
            out = _os.path.join(shard_dir,
                                f"shard-{_uuid.uuid4().hex[:10]}.tar")
            with open(out, "wb") as fh:
                fh.write(make_webdataset_tar(samples))

    d = t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    d.repartition(8).foreachPartition(write_shard)

    wds = read_webdataset(spark, shard_dir, extensions=("txt", "json"))
    return wds.select(
        F.col("key").cast("bigint").alias("doc_id"),
        F.decode("txt", "UTF-8").alias("text"),
        F.get_json_object(F.decode("json", "UTF-8"), "$.lang")
         .alias("lang"))