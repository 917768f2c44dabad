"""Golden tests for exact-key dedup — mirrors the reference's golden
fixture layout (DeduperTest.kt:46-83): 986 rows, dup groups at ordinals
{341:[342,984]}, {403:[404]}, {600:[601]} → recordCount=986, dupeCount=4,
distinctDupeCount=3, hashCount=982.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from deduper_spark.functions.keys import md5_key_expr
from deduper_spark.operators.exact import build_report, exact_dedup, with_ordinal
from deduper_spark.operators.incremental import incremental_dedup

N = 986
DUP_OF = {342: 341, 984: 341, 404: 403, 601: 600}
KEYS = ("street", "city", "state", "zip", "price")
COLS = [
    "street", "city", "zip", "state", "beds", "baths", "sq__ft", "type",
    "sale_date", "price", "latitude", "longitude",
]


def sacramento_like_rows():
    rows = []
    for i in range(N):
        base = DUP_OF.get(i, i)
        rows.append(tuple(f"{c}_{base}" for c in COLS))
    return rows


@pytest.fixture(scope="module")
def fixture_df(spark):
    df = spark.createDataFrame(sacramento_like_rows(), COLS)
    df = df.withColumn("__ord", F.monotonically_increasing_id())
    # local[4] createDataFrame preserves order within this fixture; pin it
    # to a proper ordinal column the golden way (explicit stable order).
    return with_ordinal(df, "__ord", "row_ordinal").drop("__ord").cache()


def test_sample_hash_golden(spark):
    """Key-definition byte parity with the reference
    (DeduperTest.kt:427-428)."""
    df = spark.createDataFrame(
        [("3526 HIGH ST", "SACRAMENTO", "CA", "95838", "59222")],
        ["street", "city", "state", "zip", "price"],
    )
    got = df.select(md5_key_expr(["street", "city", "state", "zip", "price"]).alias("h"))
    assert got.collect()[0]["h"] == "B23CF69F6FC378E0A9C1AF14F2D2083C"


def test_report_counters(fixture_df):
    res = exact_dedup(fixture_df, KEYS)
    rep = build_report(res, list(KEYS), COLS)
    assert rep.record_count == 986
    assert rep.dupe_count == 4
    assert rep.distinct_dupe_count == 3
    assert rep.hash_count == 982
    assert rep.surviving_count == 982
    assert rep.success


def test_dupe_groups_golden(fixture_df):
    res = exact_dedup(fixture_df, KEYS)
    groups = {
        r["first_found_row_number"]: json.loads(r["row_ids"])
        for r in res.dupe_groups.collect()
    }
    assert groups == {341: [342, 984], 403: [404], 600: [601]}


def test_dupe_values_exemplar(fixture_df):
    res = exact_dedup(fixture_df, KEYS)
    row = res.dupe_groups.where(F.col("first_found_row_number") == 341).collect()[0]
    exemplar = json.loads(row["dupe_values"])
    # exemplar = first DUPLICATE row's source-column map (values equal base 341)
    assert exemplar["street"] == "street_341"
    assert "row_ordinal" not in exemplar  # reference exemplar = source row map only


def test_survivors_keep_first(fixture_df):
    res = exact_dedup(fixture_df, KEYS)
    assert res.survivors.count() == 982
    ords = {r["row_ordinal"] for r in res.survivors.select("row_ordinal").collect()}
    assert 341 in ords and 342 not in ords and 984 not in ords
    assert 403 in ords and 404 not in ords


def test_hash_ledger(fixture_df):
    res = exact_dedup(fixture_df, KEYS)
    assert res.hash_ledger.count() == 982
    assert set(res.hash_ledger.columns) == {"hash", "json_row"}
    res2 = exact_dedup(fixture_df, KEYS, include_json=False)
    assert res2.hash_ledger.columns == ["hash"]


def test_empty_hash_keys_means_all_columns(fixture_df):
    res = exact_dedup(fixture_df.drop("row_ordinal"), (), order_col="street")
    # all 12 columns distinct per base → same dup structure
    assert res.survivors.count() == 982


def test_missing_key_raises(fixture_df):
    with pytest.raises(ValueError, match="not found"):
        exact_dedup(fixture_df, ("nope",))


def test_incremental_all_seen(fixture_df):
    """Preloaded ledger containing every hash ⇒ all rows already-seen
    (DeduperTest.kt:393-413: 982 preloaded hashes ⇒ all 986 rows dupes)."""
    first = exact_dedup(fixture_df, KEYS)
    inc = incremental_dedup(fixture_df, first.hash_ledger, KEYS,
                            order_col="row_ordinal")
    assert inc.new_rows.count() == 0
    assert inc.already_seen.count() == 986
    assert inc.updated_ledger.count() == 982


def test_incremental_partial(fixture_df, spark):
    half_ledger = exact_dedup(
        fixture_df.where(F.col("row_ordinal") < 500), KEYS
    ).hash_ledger
    n_pre = half_ledger.count()
    inc = incremental_dedup(fixture_df, half_ledger, KEYS, order_col="row_ordinal")
    # rows 0..499 plus later dups of them (601? no—600>=500; 984 dup of 341 yes)
    assert inc.already_seen.count() == 500 + 1  # ordinal 984 matches hash of 341
    assert inc.new_rows.count() == 986 - 501
    assert inc.updated_ledger.count() == 982
    rep = build_report(inc.inner, list(KEYS), COLS, preloaded_hash_count=n_pre)
    assert rep.hash_count == 982
