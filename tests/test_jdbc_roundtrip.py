"""O1/O3 executed for real: JDBC roundtrip through EMBEDDED DERBY.

Spark ships derby-10.16 on its own classpath (metastore dependency), so
the sandbox can actually run the reference's JDBC source/sink family:
mirrors DeduperTest.kt:353-392 nullsInSource — read a chinook-tracks
shaped table over JDBC, dedupe, write the target over JDBC, and verify
count / column / null preservation on the roundtrip.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.derby.jdbc.EmbeddedDriver"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


TRACKS_SCHEMA = (
    "TrackId long, Name string, AlbumId long, MediaTypeId long, "
    "GenreId long, Composer string, Milliseconds long, Bytes long, "
    "UnitPrice double"
)


def _tracks_rows(n=40):
    # chinook-tracks shape; Composer null on every 2nd row (the
    # reference asserts sourceFirstRow[5].isNullOrBlank() for TrackId=2)
    return [
        (i, f"Track {i}", i % 7 + 1, 1, i % 5 + 1,
         None if i % 2 == 0 else f"Composer {i % 3}",
         200_000 + i, 4_000_000 + i, 0.99)
        for i in range(1, n + 1)
    ]


def test_jdbc_derby_roundtrip_with_nulls(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("derby driver not on classpath")
    from deduper_spark.operators.exact import exact_dedup
    from deduper_spark.sinks.jdbc import write_jdbc
    from deduper_spark.sources.readers import read_jdbc

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    src = spark.createDataFrame(_tracks_rows(40), TRACKS_SCHEMA)
    write_jdbc(src, url, "tracks", properties=props)

    # --- O1: JDBC table scan ------------------------------------------
    back = read_jdbc(spark, url, "tracks", properties=props)
    assert back.count() == 40
    assert [c.lower() for c in back.columns] == [
        "trackid", "name", "albumid", "mediatypeid", "genreid",
        "composer", "milliseconds", "bytes", "unitprice",
    ]
    # nulls survive the roundtrip (reference: TrackId=2 Composer null)
    r2 = back.where(F.col("TrackId") == 2).collect()[0]
    assert r2["Composer"] is None

    # --- dedupe -> JDBC target (O19/O20 family) -----------------------
    res = exact_dedup(back, ("Name", "Composer"), order_col="TrackId")
    assert res.survivors.count() == 40  # tracks are all distinct
    write_jdbc(res.survivors, url, "target_data", properties=props)
    tgt = read_jdbc(spark, url, "target_data", properties=props)
    assert tgt.count() == 40

    # --- O1 pushdown: dbtable can be a subquery -----------------------
    sub = read_jdbc(
        spark, url,
        '(SELECT "TrackId", "Composer" FROM tracks '
        'WHERE "TrackId" <= 5) t',
        properties=props,
    )
    assert sub.count() == 5 and len(sub.columns) == 2


def test_jdbc_derby_null_key_hash_parity(spark, tmp_path):
    """NULL hash-key parity over a REAL JDBC source: null columns
    stringify as the 'null' token (Kotlin joinToString parity,
    functions/keys.py) identically to the in-memory path."""
    if not _derby_available(spark):
        pytest.skip("derby driver not on classpath")
    from deduper_spark.functions.keys import md5_key_expr
    from deduper_spark.sinks.jdbc import write_jdbc
    from deduper_spark.sources.readers import read_jdbc

    url = f"jdbc:derby:{tmp_path}/derbydb2;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = spark.createDataFrame(_tracks_rows(6), TRACKS_SCHEMA)
    write_jdbc(src, url, "tracks", properties=props)
    back = read_jdbc(spark, url, "tracks", properties=props)

    jdbc_hashes = {
        r["TrackId"]: r["h"]
        for r in back.select(
            "TrackId", md5_key_expr(["Name", "Composer"]).alias("h")
        ).collect()
    }
    mem_hashes = {
        r["TrackId"]: r["h"]
        for r in src.select(
            "TrackId", md5_key_expr(["Name", "Composer"]).alias("h")
        ).collect()
    }
    assert jdbc_hashes == mem_hashes
