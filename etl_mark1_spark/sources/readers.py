"""File readers — S1-S8 in SURVEY.md §2.1.

The reference resolves a format by extension and dispatches to a DuckDB read
function (reference: backend/services/duckdb_engine.py:248-269); remote paths
work because httpfs is loaded (:25). Here the same dispatch lands on Spark
DataFrameReader — schema inference on by default to match ``read_*_auto``
semantics, remote storage via the s3a/abfss/gs Hadoop connectors configured on
the session (no temp-file hop like the reference's MinIO download,
backend/services/file_service.py:132-142).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Formats the reference accepts at upload (backend/services/file_service.py:61),
#: plus extension formats (warc — sources/warc.py; tar WebDataset shards —
#: sources/webdataset.py).
KNOWN_FORMATS = ("csv", "json", "xlsx", "parquet", "orc", "xml", "txt",
                 "pdf", "warc", "tar")


def detect_format(file_path: str) -> str:
    """Extension-based autodetect, default csv (duckdb_engine.py:265-269).
    ``.warc.gz`` (the layout crawls actually ship) detects as warc."""
    if file_path.lower().endswith(".warc.gz"):
        return "warc"
    ext = os.path.splitext(file_path)[1].lower().lstrip(".")
    return ext if ext in KNOWN_FORMATS else "csv"


def _sniff_csv(path: str) -> tuple[str, bool]:
    """``read_csv_auto`` sniff parity (duckdb_engine.py:253), local-probe
    scope (same as the parquet footer probe — at scale pass ``sep=`` /
    ``header=`` explicitly):

    - delimiter: the candidate (comma, tab, semicolon, pipe) with the
      highest count consistently present across the first lines of the
      first local file; comma when nothing wins or the path is remote.
    - header: False when the first line itself contains a numeric field
      (a header row of data is the strong headerless signal — without
      this a headerless numeric CSV silently loses its first row to the
      column names); True otherwise. Narrower than DuckDB's full
      type-contrast heuristic by design: all-text files keep the
      header=True default this engine has always used."""
    import glob

    cand = path
    if os.path.isdir(path):
        files = sorted(f for f in glob.glob(os.path.join(path, "*"))
                       if os.path.isfile(f) and not
                       os.path.basename(f).startswith(("_", ".")))
        if not files:
            return ",", True
        cand = files[0]
    elif not os.path.isfile(path):
        return ",", True
    try:
        with open(cand, "r", errors="replace") as fh:
            lines = [ln for ln in fh.read(8192).splitlines() if ln][:5]
    except OSError:
        return ",", True
    if not lines:
        return ",", True
    best, best_n = ",", 0
    for d in (",", "\t", ";", "|"):
        n = min(line.count(d) for line in lines)
        if n > best_n:
            best, best_n = d, n

    def _numeric(f: str) -> bool:
        try:
            float(f)
            return True
        except ValueError:
            return False

    header = not any(_numeric(f.strip().strip('"'))
                     for f in lines[0].split(best) if f.strip())
    return best, header


def read_file(
    spark: SparkSession,
    path: str,
    file_format: str | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """Read ``path`` into a DataFrame with format autodetect.

    - csv/txt  -> header + inferSchema (S1; ``read_csv_auto`` parity). At
      scale, pass ``schema=`` to skip the inference pass — inference reads
      the data once before the real scan.
    - json     -> line-delimited by default; ``multiline=True`` for document
      JSON (S2; ``read_json_auto`` handles both).
    - parquet  -> self-describing (S3).
    - orc      -> self-describing columnar sibling (Spark built-in; same
      pushdown/pruning machinery as parquet).
    - xlsx/xls -> driver-side read then parallelize (S4): pandas+openpyxl
      when installed, else the built-in stdlib zip+XML codec
      (sources/excel.py). Spreadsheets are small by nature.
    - xml      -> Spark 4's native XML source (``rowTag`` defaults to
      ``row``; pass ``rowTag=`` to override). DIVERGENCE: the reference
      declares XML but actually parses it as CSV (duckdb_engine.py:260-261)
      — garbage rows for any real XML. Pass ``compat="reference"`` to get
      that bug-for-bug csv fallback.
    - pdf      -> distributed binaryFile scan + per-file text extraction
      (sources/pdf.py), one row per (path, page, text).
    """
    fmt = (file_format or detect_format(path)).lower()
    corrupt_col = options.pop("corrupt_col", None)
    if corrupt_col:
        if fmt not in ("csv", "json", "txt"):
            raise ValueError("corrupt_col applies to csv/json sources")
        return _read_with_corrupt_column(spark, path, fmt, corrupt_col,
                                         schema=schema, **options)
    if fmt == "xml" and options.pop("compat", None) != "reference":
        reader = (spark.read.format("xml")
                  .option("rowTag", options.pop("rowTag", "row"))
                  .options(**options))
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(path)
    if fmt in ("csv", "txt", "xml"):
        if "sep" not in options and "delimiter" not in options:
            sep, header = _sniff_csv(path)
            options["sep"] = sep
            options.setdefault("header", header)
        reader = (
            spark.read.option("header", options.pop("header", True))
            .option("inferSchema", schema is None)
            .options(**options)
        )
        if schema is not None:
            reader = reader.schema(schema)
        return reader.csv(path)
    if fmt == "json":
        reader = spark.read.options(**options)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(path)
    if fmt == "parquet":
        return read_parquet_compat(spark, path, **options)
    if fmt == "orc":
        return spark.read.options(**options).orc(path)
    if fmt in ("xlsx", "xls"):
        return _read_excel(spark, path, schema=schema, **options)
    if fmt == "pdf":
        from .pdf import read_pdf

        return read_pdf(spark, path)
    if fmt == "warc":
        from .warc import read_warc

        return read_warc(spark, path, **options)
    if fmt in ("tar", "webdataset"):
        from .webdataset import read_webdataset

        return read_webdataset(spark, path, **options)
    raise ValueError(f"unsupported format: {fmt}")


def _narrow_string_schema(df):
    """Narrow an all-string frame's schema by try_cast success: a column
    becomes bigint/double/timestamp iff every non-null value casts; else
    it stays string. One aggregation pass for all columns."""
    from pyspark.sql import functions as F

    kinds = ("bigint", "double", "timestamp")
    aggs = []
    for c in df.columns:
        aggs.append(F.count(F.col(c)).alias(f"_n_{c}"))
        for k in kinds:
            aggs.append(F.count(F.col(c).try_cast(k)).alias(f"_{k}_{c}"))
    row = df.agg(*aggs).first()
    fields = []
    for c in df.columns:
        chosen = "string"
        if row[f"_n_{c}"]:
            for k in kinds:
                if row[f"_{k}_{c}"] == row[f"_n_{c}"]:
                    chosen = k
                    break
        fields.append(T.StructField(c, {
            "bigint": T.LongType(), "double": T.DoubleType(),
            "timestamp": T.TimestampType(),
            "string": T.StringType()}[chosen]))
    return T.StructType(fields)


def _read_with_corrupt_column(spark: SparkSession, path: str, fmt: str,
                              corrupt_col: str, schema=None, **options):
    """Permissive read that captures unparseable rows instead of failing
    the job or silently nulling them: malformed lines land intact in
    ``corrupt_col`` (the dead-letter column), clean rows parse normally.
    A 100 TB crawl ALWAYS contains garbage lines; the pipeline decision
    — quarantine, count against a quality gate, or drop — belongs to a
    filter on this column, not to a crashed scan. Costs one extra
    inference pass when no explicit ``schema`` is given (same caveat as
    any inferSchema read)."""
    if schema is None and fmt in ("csv", "txt"):
        # built-in CSV inference types from RAW tokens, so one junk row
        # would demote every column to string: parse all-string with
        # DROPMALFORMED (wrong-arity lines vanish), then narrow each
        # column by try_cast success over the clean rows — one agg pass
        header = (spark.read.option("header", True).csv(path)).columns
        str_schema = T.StructType(
            [T.StructField(c, T.StringType()) for c in header])
        clean = (spark.read.schema(str_schema)
                 .option("header", True).option("mode", "DROPMALFORMED")
                 .options(**options).csv(path))
        schema = _narrow_string_schema(clean)
    elif schema is None:
        clean = read_file(spark, path, fmt, mode="DROPMALFORMED", **options)
        schema = clean.schema
    if corrupt_col not in schema.fieldNames():
        schema = schema.add(corrupt_col, T.StringType())
    reader = (spark.read.schema(schema)
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", corrupt_col)
              .options(**options))
    if fmt in ("csv", "txt"):
        return reader.option("header", options.get("header", True)).csv(path)
    return reader.json(path)


def _read_excel(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    """S4 — Excel on the driver: pandas+openpyxl when installed, else the
    built-in stdlib codec (sources/excel.py — .xlsx is a zip of XML).
    First row is the header, matching ``pd.read_excel`` defaults.
    Spreadsheets cap at ~1M rows so a driver read is the honest shape;
    bulk data belongs in parquet/csv that executors scan directly."""
    import importlib.util

    if importlib.util.find_spec("openpyxl") is not None:
        import pandas as pd

        pdf = pd.read_excel(path, **options)
        return spark.createDataFrame(pdf, schema=schema)

    from .excel import read_xlsx_rows

    rows = read_xlsx_rows(path, sheet=options.pop("sheet_name", 0))
    if not rows:
        raise ValueError(f"empty workbook: {path}")
    header = [str(h) for h in rows[0]]
    if schema is not None:
        return spark.createDataFrame(rows[1:], schema=schema)
    import pandas as pd

    pdf = pd.DataFrame(rows[1:], columns=header)
    # mixed None/str columns arrive as object; let pandas firm up numerics
    pdf = pdf.infer_objects()
    return spark.createDataFrame(pdf)


#: Legacy conf that maps parquet TIMESTAMP(NANOS) columns to LongType
#: (nanoseconds since epoch) instead of failing the vectorized reader with
#: PARQUET_TYPE_ILLEGAL. Runtime-settable; left on once set.
NANOS_AS_LONG_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _parquet_nanos_fields(path: str) -> list[str]:
    """Names of nanosecond-precision timestamp fields in a parquet file or
    directory of parquet files (first file's footer speaks for the dataset).
    Remote paths (no local footer to sniff) report none — a real deployment
    would check the table's catalog schema instead."""
    import glob as _glob

    import pyarrow.parquet as pq

    target = path
    if os.path.isdir(path):
        inner = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if not inner:
            return []
        target = inner[0]
    elif not os.path.isfile(path):
        return []
    # Inspect the PARQUET logical type, not the Arrow-converted schema:
    # pyarrow reports legacy INT96 timestamps (which Spark reads natively)
    # as timestamp[ns] too, and those must NOT take the long path.
    schema = pq.ParquetFile(target).schema
    out = []
    for i in range(len(schema)):
        col = schema.column(i)
        logical = str(col.logical_type)
        if (col.physical_type == "INT64" and logical.startswith("Timestamp")
                and "timeUnit=nanoseconds" in logical):
            out.append(col.name)
    return out


def nanos_long_to_ntz(name: str):
    """Expression rebuilding a TIMESTAMP_NTZ from epoch-nanos longs.

    ``timestampadd`` on an NTZ base stays NTZ under ANY session timezone —
    no LTZ round-trip, so wall times can't shift. ``div 1000`` truncates
    sub-microsecond digits exactly like DuckDB's ns->µs read."""
    from pyspark.sql import functions as F

    return F.expr(
        f"timestampadd(MICROSECOND, `{name}` div 1000, "
        f"TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )


def read_parquet_compat(spark: SparkSession, path: str, **options) -> DataFrame:
    """Parquet read that tolerates TIMESTAMP(NANOS) columns — distributed.

    Spark's vectorized reader rejects nanosecond timestamps; with
    ``spark.sql.legacy.parquet.nanosAsLong`` they arrive as epoch-nanos longs
    through the NORMAL distributed scan (pushdown + pruning intact), and a
    JVM-side ``timestampadd`` rebuilds TIMESTAMP_NTZ. No driver
    materialization at any size — the plan stays ``FileScan parquet``
    (asserted in tests/test_plans.py). Range predicates on the rebuilt
    column don't push past the cast; at 100 TB, partition-prune on a derived
    date column or rewrite such data to µs at ingest.
    """
    ns_fields = _parquet_nanos_fields(path)
    if not ns_fields:
        return spark.read.options(**options).parquet(path)
    spark.conf.set(NANOS_AS_LONG_CONF, "true")
    df = spark.read.options(**options).parquet(path)
    for name in ns_fields:
        df = df.withColumn(name, nanos_long_to_ntz(name))
    return df


def read_http(spark: SparkSession, url: str, file_format: str | None = None,
              headers: dict | None = None, **options) -> DataFrame:
    """S9 — HTTP API source: driver-side fetch, then a normal read.

    The reference downloads to a temp file and reads it
    (backend/connectors/builtin.py:61-121); same shape here. Control-plane
    fetch — not for bulk data (bulk belongs on s3a:// style storage paths that
    executors read directly).
    """
    import tempfile
    import urllib.request

    req = urllib.request.Request(url, headers=headers or {})
    fmt = file_format or detect_format(url.split("?", 1)[0])
    with urllib.request.urlopen(req) as resp:  # noqa: S310 — explicit connector
        data = resp.read()
    with tempfile.NamedTemporaryFile(suffix=f".{fmt}", delete=False) as tmp:
        tmp.write(data)
        tmp_path = tmp.name
    return read_file(spark, tmp_path, file_format=fmt, **options)


def read_jdbc(spark: SparkSession, url: str, query: str | None = None,
              table: str | None = None, **options) -> DataFrame:
    """S10 — JDBC source (reference: MySQL connector, builtin.py:156-173).

    Prefer ``query`` pushdown; for big tables pass partitionColumn/lowerBound/
    upperBound/numPartitions so the read parallelizes instead of landing on a
    single executor connection.
    """
    reader = spark.read.format("jdbc").option("url", url)
    if query is not None:
        reader = reader.option("query", query)
    elif table is not None:
        reader = reader.option("dbtable", table)
    else:
        raise ValueError("either query or table is required")
    return reader.options(**options).load()
