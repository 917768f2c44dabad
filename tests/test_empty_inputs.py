"""Robustness sweep: every driver-gate query must run (not crash) on
EMPTY input tables — the first night a 100 TB pipeline meets an empty
partition or a fresh tenant, driver-side `.collect()[0]` probes and
empty-batch UDF paths are what break. (This class bit once: the
embedding dim probe, round-2 ADVICE.)"""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Empty clones (limit 0, same schema) of every driver table."""
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("sf_empty")
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            (spark.read.parquet(os.path.join(src, f)).limit(0)
             .write.mode("overwrite").parquet(str(out / f)))
    return str(out)


def _query_names():
    import __spark_entry__ as entry

    return sorted(entry.queries())


@pytest.mark.parametrize("name", _query_names())
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    import __spark_entry__ as entry

    q = entry.queries()[name]
    df = q(spark, empty_sf_dir)
    # must produce a well-formed DataFrame and execute end-to-end;
    # synth-corpus queries legitimately return rows, table queries 0
    assert df.schema.fields
    df.count()
