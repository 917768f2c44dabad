"""SQL/JDBC sink with dynamic DDL generation (reference O19-O21).

The reference builds vendor DDL from source ResultSet metadata with a
configurable varchar padding, then batch-inserts transactionally
(persistors/Persistors.kt:240-314: SqlUtils.generateDDL + varcharPadding
from jndi/JNDIType.kt SqlJNDITargetType; dupes/hashes table goldens at
Persistors.kt:343-350 and 415-420). The Spark-first analog:

  * DDL comes from df.schema (Catalyst types → vendor SQL types) with
    the same varchar-padding knob — max observed string length + pad,
    like the reference pads sizes extracted from the source;
  * batching/transactions are Spark's JDBC writer's job
    (``df.write.jdbc`` handles batchsize/isolation per partition) —
    the reference's hand-rolled addBatch/commit loop (O17/O25) is
    obsolete under Spark;
  * ``write_jdbc`` is exercised end-to-end against embedded Derby
    (tests/test_jdbc_roundtrip.py — Spark ships derby on its own
    classpath), including null preservation on the roundtrip; DDL
    generation is pure and golden-pinned in unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# vendor → (string type, long type, string-max suffix, supports pk clause)
_VENDORS = {
    "ansi": ("VARCHAR", "BIGINT", "", True),
    "sqlite": ("TEXT", "INTEGER", "", True),
    "postgresql": ("VARCHAR", "BIGINT", "", True),
    "mysql": ("VARCHAR", "BIGINT", "", True),
}

_TYPE_MAP = {
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.ShortType: "SMALLINT",
    T.DoubleType: "DOUBLE PRECISION",
    T.FloatType: "REAL",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
    T.BinaryType: "BLOB",
}


def sql_type_for(dtype: T.DataType, vendor: str = "ansi",
                 varchar_size: int | None = None) -> str:
    """Map a Catalyst type to a vendor SQL type. Strings become
    VARCHAR(size) when a size is known (observed max + padding, the
    reference's varcharPadding semantics), else an unbounded string."""
    str_t = _VENDORS.get(vendor, _VENDORS["ansi"])[0]
    if isinstance(dtype, T.StringType):
        if varchar_size and str_t == "VARCHAR":
            return f"VARCHAR({varchar_size})"
        return str_t
    if isinstance(dtype, T.DecimalType):
        return f"DECIMAL({dtype.precision},{dtype.scale})"
    for spark_t, sql_t in _TYPE_MAP.items():
        if isinstance(dtype, spark_t):
            return sql_t
    # arrays/structs/maps: serialize to JSON strings before a SQL sink
    raise ValueError(
        f"no SQL type mapping for {dtype.simpleString()}; serialize "
        f"complex columns to JSON (to_json) before a JDBC sink"
    )


def generate_ddl(
    table: str,
    df: DataFrame,
    vendor: str = "ansi",
    varchar_padding: int = 0,
    primary_key: str | None = None,
    measure_strings: bool = False,
) -> str:
    """CREATE TABLE DDL from a DataFrame schema.

    measure_strings=True sizes each VARCHAR as max observed length +
    ``varchar_padding`` in ONE aggregation pass (the reference extracts
    sizes from source metadata and pads, jndi/JNDIType.kt:39-44);
    otherwise strings are unbounded.
    """
    sizes: dict[str, int] = {}
    str_cols = [f.name for f in df.schema.fields
                if isinstance(f.dataType, T.StringType)]
    if measure_strings and str_cols:
        row = df.agg(
            *[F.max(F.length(c)).alias(c) for c in str_cols]
        ).collect()[0]
        sizes = {c: (row[c] or 1) + varchar_padding for c in str_cols}

    cols = []
    for f in df.schema.fields:
        sql_t = sql_type_for(f.dataType, vendor, sizes.get(f.name))
        null_s = "NULL" if f.nullable else "NOT NULL"
        cols.append(f"{f.name} {sql_t} {null_s}")
    pk = f", PRIMARY KEY ({primary_key})" if primary_key else ""
    return f"CREATE TABLE {table}({', '.join(cols)}{pk})"


def dupes_table_ddl(vendor: str = "ansi") -> str:
    """Golden-shape dupes DDL (Persistors.kt:343-350)."""
    s, lng, smax, _ = _VENDORS.get(vendor, _VENDORS["ansi"])
    sized = f"{s} {smax}".rstrip()
    return (
        f"CREATE TABLE dupes(hash {s} NOT NULL, row_ids {s} NOT NULL, "
        f"first_found_row_number {lng} NOT NULL, "
        f"dupe_values {sized} NOT NULL, PRIMARY KEY (hash))"
    )


def hashes_table_ddl(vendor: str = "ansi") -> str:
    """Golden-shape hashes DDL (Persistors.kt:415-420)."""
    s, _, _, _ = _VENDORS.get(vendor, _VENDORS["ansi"])
    return (
        f"CREATE TABLE hashes(hash {s} NOT NULL, json_row {s} NULL, "
        f"PRIMARY KEY (hash))"
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict | None = None,
    create_table_options: str | None = None,
) -> None:
    """df.write.jdbc behind a capability check — raises a clear error
    when the vendor driver jar is absent (this sandbox ships none).
    Spark handles per-partition batched transactional inserts; DDL is
    either Spark-generated or pre-created with generate_ddl above
    (pass via createTableColumnTypes/options on a real cluster)."""
    writer = df.write.mode(mode)
    if create_table_options:
        writer = writer.option("createTableOptions", create_table_options)
    try:
        writer.jdbc(url, table, properties=properties or {})
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            f"JDBC write to {url} failed — is the vendor driver jar on "
            f"the Spark classpath? ({type(exc).__name__}: {exc})"
        ) from exc
