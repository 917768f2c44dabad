"""Deterministic corpus splits / sampling (operators/sampling.py)."""

from __future__ import annotations

import hashlib

import pytest

from deduper_spark.operators.sampling import (
    deterministic_split,
    sample_corpus,
    split_thresholds,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id")


def _labels(df):
    return {r["doc_id"]: r["split"] for r in df.collect()}


class TestDeterministicSplit:
    def test_total_disjoint_and_reproducible(self, spark, ids):
        a = _labels(deterministic_split(ids))
        b = _labels(deterministic_split(ids))
        assert a == b                       # pure function of (seed, id)
        assert len(a) == 2000               # every row exactly one label
        assert set(a.values()) == {"train", "val", "test"}

    def test_fractions_near_weights(self, spark, ids):
        a = _labels(deterministic_split(ids))
        n = len(a)
        frac = {s: sum(1 for v in a.values() if v == s) / n
                for s in ("train", "val", "test")}
        assert abs(frac["train"] - 0.8) < 0.05
        assert abs(frac["val"] - 0.1) < 0.03
        assert abs(frac["test"] - 0.1) < 0.03

    def test_matches_reference_md5_rule(self, spark, ids):
        # the assignment IS md5-hex-prefix bucketing — recompute three
        # rows by hand
        a = _labels(deterministic_split(ids))
        for i in (0, 7, 1999):
            h = hashlib.md5(f"split-v1:{i}".encode()).hexdigest()[:4]
            want = ("train" if h < "cccc" else
                    "val" if h < "e666" else "test")
            assert a[i] == want

    def test_seed_redeal(self, spark, ids):
        a = _labels(deterministic_split(ids, seed="split-v1"))
        b = _labels(deterministic_split(ids, seed="split-v2"))
        assert a != b                       # wholesale re-deal

    def test_weight_validation(self):
        with pytest.raises(ValueError):
            split_thresholds({"a": 0.0, "b": 0.0})

    def test_unnormalized_weights(self, spark, ids):
        # weights normalize: (8, 1, 1) == (0.8, 0.1, 0.1)
        a = _labels(deterministic_split(
            ids, weights={"train": 8, "val": 1, "test": 1}))
        b = _labels(deterministic_split(ids))
        assert a == b


class TestSampleCorpus:
    def test_subset_deterministic_and_rate(self, spark, ids):
        s1 = {r["doc_id"] for r in sample_corpus(ids, rate=0.2).collect()}
        s2 = {r["doc_id"] for r in sample_corpus(ids, rate=0.2).collect()}
        assert s1 == s2
        assert abs(len(s1) / 2000 - 0.2) < 0.04

    def test_nested_rates(self, spark, ids):
        # bucket < hex(r) is monotone in r: a 10% sample is a subset
        # of the 20% sample at the same seed
        s10 = {r["doc_id"] for r in sample_corpus(ids, rate=0.1).collect()}
        s20 = {r["doc_id"] for r in sample_corpus(ids, rate=0.2).collect()}
        assert s10 <= s20

    def test_edge_rates(self, spark, ids):
        assert sample_corpus(ids, rate=1.0).count() == 2000
        assert sample_corpus(ids, rate=0.0).count() == 0
        with pytest.raises(ValueError):
            sample_corpus(ids, rate=1.5)
