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


class TestThresholdEdges:
    def test_trailing_zero_weight_label_gets_nothing(self, spark, ids):
        # cum weight hits 1.0 BEFORE the last label: the middle label's
        # threshold saturates to the catch-all sentinel (not the 5-char
        # '10000' no hex bucket sorts below), so val absorbs the
        # remainder and test gets zero rows
        a = _labels(deterministic_split(
            ids, weights={"train": 0.8, "val": 0.2, "test": 0.0}))
        counts = {s: sum(1 for v in a.values() if v == s)
                  for s in ("train", "val", "test")}
        assert counts["test"] == 0
        assert abs(counts["val"] / 2000 - 0.2) < 0.04
        # and the assignment equals the two-way split row-for-row
        b = _labels(deterministic_split(
            ids, weights={"train": 0.8, "val": 0.2}))
        assert a == b

    def test_negative_weight_rejected(self):
        with pytest.raises(ValueError):
            split_thresholds({"a": 1.5, "b": -0.5})
