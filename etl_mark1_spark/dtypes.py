"""DuckDB <-> Spark type-name mapping.

The reference engine passes free-form DuckDB type names straight into
``CAST(col AS {target})`` (reference: backend/services/duckdb_engine.py:282-285)
and reports schemas as ``{"name", "type", "nullable"}`` dicts with DuckDB type
names (duckdb_engine.py:62-82). We accept the same names and map them onto
Spark SQL types, and map Spark types back to DuckDB-style names for schema
reporting parity.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# DuckDB type name (lowercased, parens stripped) -> Spark SQL type name.
_DUCKDB_TO_SPARK: dict[str, str] = {
    # character
    "varchar": "string",
    "char": "string",
    "bpchar": "string",
    "text": "string",
    "string": "string",
    # integer
    "bigint": "long",
    "int8": "long",
    "long": "long",
    "integer": "int",
    "int": "int",
    "int4": "int",
    "signed": "int",
    "smallint": "short",
    "int2": "short",
    "short": "short",
    "tinyint": "byte",
    "int1": "byte",
    "hugeint": "decimal(38,0)",
    "ubigint": "decimal(20,0)",
    "uinteger": "long",
    "usmallint": "int",
    "utinyint": "short",
    # floating point
    "double": "double",
    "float8": "double",
    "real": "float",
    "float4": "float",
    "float": "float",
    # boolean
    "boolean": "boolean",
    "bool": "boolean",
    "logical": "boolean",
    # temporal (Spark has no TIME type; surface as string)
    "date": "date",
    "timestamp": "timestamp",
    "datetime": "timestamp",
    "timestamptz": "timestamp",
    "time": "string",
    # binary / misc
    "blob": "binary",
    "bytea": "binary",
    "binary": "binary",
    "varbinary": "binary",
    "uuid": "string",
    "json": "string",
}

# Spark simpleString -> DuckDB-style name for schema reporting.
_SPARK_TO_DUCKDB: dict[str, str] = {
    "string": "VARCHAR",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "short": "SMALLINT",
    "smallint": "SMALLINT",
    "byte": "TINYINT",
    "tinyint": "TINYINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "binary": "BLOB",
}

_DECIMAL_RE = re.compile(r"^(?:decimal|numeric)\s*(\(\s*\d+\s*(?:,\s*\d+\s*)?\))?$")


def to_spark_type_name(duckdb_name: str) -> str:
    """Map a DuckDB type name (as accepted by ``cast_type``) to a Spark SQL
    type name usable in ``Column.cast``.

    Unknown names are passed through — Spark raises a clear parse error for
    genuinely invalid types, matching the reference's pass-the-string-to-CAST
    behavior.
    """
    name = duckdb_name.strip().lower()
    m = _DECIMAL_RE.match(name)
    if m:
        return f"decimal{(m.group(1) or '(18,3)').replace(' ', '')}"
    # array types: e.g. "varchar[]" or "double[]"
    if name.endswith("[]"):
        return f"array<{to_spark_type_name(name[:-2])}>"
    return _DUCKDB_TO_SPARK.get(name, name)


def to_duckdb_type_name(spark_type: T.DataType) -> str:
    """Map a Spark DataType to a DuckDB-style type name for schema reporting
    (reference surfaces {"name","type","nullable"} dicts, duckdb_engine.py:74-79).
    """
    simple = spark_type.simpleString()
    if simple.startswith("decimal"):
        return simple.upper()
    if isinstance(spark_type, T.ArrayType):
        return f"{to_duckdb_type_name(spark_type.elementType)}[]"
    if isinstance(spark_type, T.StructType):
        inner = ", ".join(
            f'"{f.name}" {to_duckdb_type_name(f.dataType)}' for f in spark_type.fields
        )
        return f"STRUCT({inner})"
    if isinstance(spark_type, T.MapType):
        return (
            f"MAP({to_duckdb_type_name(spark_type.keyType)}, "
            f"{to_duckdb_type_name(spark_type.valueType)})"
        )
    return _SPARK_TO_DUCKDB.get(simple, simple.upper())


def schema_to_dicts(schema: T.StructType) -> list[dict]:
    """Schema as the reference's list-of-dicts shape (duckdb_engine.py:74-79).

    Unlike the reference, ``nullable`` is the real per-field nullability, not
    hardcoded True (documented divergence).
    """
    return [
        {
            "name": f.name,
            "type": to_duckdb_type_name(f.dataType),
            "nullable": bool(f.nullable),
        }
        for f in schema.fields
    ]
