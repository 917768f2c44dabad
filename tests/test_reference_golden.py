"""End-to-end golden test on the reference's OWN fixture: the real
986-row Sacramento real-estate CSV, byte-for-byte (reference goldens:
DeduperTest.kt:46-83 report + dupes map, :140-171 sink shapes/first
rows, :427-428 sample hash).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from deduper_spark.functions.keys import md5_key_expr, stringify_expr
from deduper_spark.operators.exact import build_report, exact_dedup, with_ordinal
from deduper_spark.sinks.writers import write_dedup_outputs

CSV = "/root/reference/src/test/resources/data/Sacramentorealestatetransactions.csv"
KEYS = ("street", "city", "state", "zip", "price")

GOLDEN_GROUPS = {
    # hash -> (row_ids, first_found_row_number)   (DeduperTest.kt:56-79)
    "3230065898C61AE414BA58E7B7C99C0B": ([342, 984], 341),
    "0A3E9B5F1BDEDF777A313388B815C294": ([404], 403),
    "C4E3F2029871080759FC1C0F878236C3": ([601], 600),
}

FIRST_TARGET_ROW = {
    # DeduperTest.kt:148-151
    "street": "3526 HIGH ST", "city": "SACRAMENTO", "zip": "95838",
    "state": "CA", "beds": "2", "baths": "1", "sq__ft": "836",
    "type": "Residential", "sale_date": "Wed May 21 00:00:00 EDT 2008",
    "price": "59222", "latitude": "38.631913", "longitude": "-121.434879",
}


@pytest.fixture(scope="module")
def sacto(spark):
    from deduper_spark.sources.readers import read_csv_as_strings

    # single small file → coalesce(1) pins scan order for the golden
    # ordinals (the reference's ordinals are JDBC cursor positions)
    df = read_csv_as_strings(spark, CSV).coalesce(1)
    df = df.withColumn("__ord", F.monotonically_increasing_id())
    return with_ordinal(df, "__ord", "row_ordinal").drop("__ord").cache()


def test_sacramento_report_golden(sacto):
    res = exact_dedup(sacto, KEYS)
    rep = build_report(res, list(KEYS), [c for c in sacto.columns
                                         if c != "row_ordinal"])
    assert rep.record_count == 986
    assert rep.dupe_count == 4
    assert rep.distinct_dupe_count == 3
    assert rep.hash_count == 982
    assert rep.surviving_count == 982
    # full dupes map golden (hash → row_ids + first_found)
    got = {h: (json.loads(d["row_ids"]), d["first_found_row_number"])
           for h, d in rep.dupes.items()}
    assert got == GOLDEN_GROUPS
    # exemplar JSON: first duplicate row's source map (DeduperTest.kt:60-63)
    ex = json.loads(rep.dupes["3230065898C61AE414BA58E7B7C99C0B"]["dupe_values"])
    assert ex["street"] == "4734 14TH AVE" and ex["price"] == "68000"
    assert ex["sale_date"] == "Mon May 19 00:00:00 EDT 2008"


def test_sacramento_sample_hash(sacto):
    """getSampleHash golden on the REAL first row (DeduperTest.kt:427-428)."""
    row = (
        sacto.orderBy("row_ordinal")
        .select(stringify_expr(list(KEYS)).alias("s"),
                md5_key_expr(list(KEYS)).alias("h"))
        .limit(1).collect()[0]
    )
    assert row["s"] == "3526 HIGH ST, SACRAMENTO, CA, 95838, 59222"
    assert row["h"] == "B23CF69F6FC378E0A9C1AF14F2D2083C"


def test_sacramento_sinks_end_to_end(spark, sacto, tmp_path):
    """CSV → dedup → 3 sinks → fail-hard reconciliation, first-row and
    schema parity with the reference sink goldens (DeduperTest.kt:140-171)."""
    res = exact_dedup(sacto, KEYS)
    rep = build_report(res, list(KEYS), [c for c in sacto.columns
                                         if c != "row_ordinal"])
    written = write_dedup_outputs(
        spark, res, rep,
        target_path=str(tmp_path / "target"),
        dupes_path=str(tmp_path / "dupes"),
        hashes_path=str(tmp_path / "hashes"),
    )
    assert written == {"target": 982, "dupes": 3, "hashes": 982}

    target = spark.read.parquet(str(tmp_path / "target"))
    first = target.orderBy("row_ordinal").limit(1).collect()[0].asDict()
    for col, val in FIRST_TARGET_ROW.items():
        assert first[col] == val, f"target first-row mismatch on {col}"

    dupes = spark.read.parquet(str(tmp_path / "dupes"))
    assert set(dupes.columns) == {"hash", "row_ids",
                                  "first_found_row_number", "dupe_values"}
    d0 = dupes.orderBy("first_found_row_number").limit(1).collect()[0]
    assert d0["hash"] == "3230065898C61AE414BA58E7B7C99C0B"
    assert json.loads(d0["row_ids"]) == [342, 984]
    assert d0["first_found_row_number"] == 341

    hashes = spark.read.parquet(str(tmp_path / "hashes"))
    assert set(hashes.columns) == {"hash", "json_row"}
