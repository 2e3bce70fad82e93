"""ops/sampling — deterministic hash-threshold sampling / splitting /
mixing (the training-data curation tier; no reference analog)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vat_abcd_crawler_ray.ops.sampling import (
    add_split_column,
    hash_split,
    key01,
    mix_sources,
    sample_by_hash,
)


def _docs(n=5000, start=0):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(start, start + n), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(start, start + n)]),
    }))


class TestKey01:
    def test_deterministic_and_salt_independent(self):
        k = np.arange(10000)
        a = key01(k, salt=1)
        assert (a == key01(k, salt=1)).all()
        b = key01(k, salt=2)
        assert (a != b).mean() > 0.99  # different salt, different hash

    def test_uniform(self):
        u = key01(np.arange(200000), salt=7)
        assert 0.0 <= u.min() and u.max() < 1.0
        hist, _ = np.histogram(u, bins=20, range=(0, 1))
        assert hist.min() > 0.9 * 200000 / 20  # no empty or light band

    def test_string_keys(self):
        urls = [f"https://h{i % 50}.example/p{i}" for i in range(5000)]
        u = key01(urls, salt=3)
        assert (u == key01(urls, salt=3)).all()
        assert 0.04 < (u < 0.1).mean() < 0.16

    def test_arrow_input(self):
        arr = pa.chunked_array([pa.array([1, 2, 3], pa.int64())])
        assert (key01(arr, 5) == key01(np.array([1, 2, 3]), 5)).all()


@pytest.mark.usefixtures("ray_session")
class TestSampleByHash:
    def test_fraction_and_determinism(self):
        ids1 = sorted(r["doc_id"] for r in
                      sample_by_hash(_docs(), "doc_id", 0.2, salt=4).take_all())
        ids2 = sorted(r["doc_id"] for r in
                      sample_by_hash(_docs(), "doc_id", 0.2, salt=4).take_all())
        assert ids1 == ids2
        assert 0.15 < len(ids1) / 5000 < 0.25

    def test_nested_fractions_are_prefixes(self):
        # enlarging the fraction only ADDS rows (interval property) —
        # what makes 1%-sample dev runs subsets of 10%-sample runs
        small = {r["doc_id"] for r in
                 sample_by_hash(_docs(), "doc_id", 0.05, salt=4).take_all()}
        big = {r["doc_id"] for r in
               sample_by_hash(_docs(), "doc_id", 0.2, salt=4).take_all()}
        assert small <= big

    def test_alignment_across_tables(self):
        # same key + salt over a different table → same selected keys
        other = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(5000), pa.int64()),
            "embedding": pa.array([[float(i)] for i in range(5000)]),
        }))
        a = {r["doc_id"] for r in
             sample_by_hash(_docs(), "doc_id", 0.1, salt=9).take_all()}
        b = {r["doc_id"] for r in
             sample_by_hash(other, "doc_id", 0.1, salt=9).take_all()}
        assert a == b

    def test_bad_fraction(self):
        with pytest.raises(ValueError):
            sample_by_hash(_docs(100), "doc_id", 1.5)


@pytest.mark.usefixtures("ray_session")
class TestSplits:
    FR = {"train": 0.8, "val": 0.1, "test": 0.1}

    def test_split_column_partitions_everything(self):
        out = add_split_column(_docs(), "doc_id", self.FR, salt=11).take_all()
        counts = {}
        for r in out:
            counts[r["split"]] = counts.get(r["split"], 0) + 1
        assert set(counts) == {"train", "val", "test"}
        assert abs(counts["train"] / 5000 - 0.8) < 0.03
        assert abs(counts["val"] / 5000 - 0.1) < 0.02

    def test_hash_split_matches_split_column(self):
        col = add_split_column(_docs(), "doc_id", self.FR, salt=11).take_all()
        want = {name: sorted(r["doc_id"] for r in col if r["split"] == name)
                for name in self.FR}
        parts = hash_split(_docs(), "doc_id", self.FR, salt=11)
        got = {name: sorted(r["doc_id"] for r in ds.take_all())
               for name, ds in parts.items()}
        assert got == want

    def test_splits_disjoint_and_exhaustive(self):
        parts = hash_split(_docs(1000), "doc_id", self.FR, salt=2)
        seen: list = []
        for ds in parts.values():
            seen.extend(r["doc_id"] for r in ds.take_all())
        assert len(seen) == len(set(seen)) == 1000

    def test_remainder_unlabeled(self):
        out = add_split_column(
            _docs(2000), "doc_id", {"gold": 0.1}, salt=3
        ).take_all()
        frac = sum(1 for r in out if r["split"] == "") / 2000
        assert 0.85 < frac < 0.95

    def test_oversubscribed_rejected(self):
        with pytest.raises(ValueError, match="sum"):
            hash_split(_docs(10), "doc_id", {"a": 0.8, "b": 0.3})


@pytest.mark.usefixtures("ray_session")
class TestMixSources:
    def test_rates_applied_per_source(self):
        hi = _docs(4000)               # quality source: keep all
        lo = _docs(4000, start=10_000)  # bulk source: keep ~25%
        out = mix_sources([(hi, 1.0), (lo, 0.25)], "doc_id", salt=6)
        ids = [r["doc_id"] for r in out.take_all()]
        n_hi = sum(1 for i in ids if i < 10_000)
        n_lo = len(ids) - n_hi
        assert n_hi == 4000
        assert 0.2 < n_lo / 4000 < 0.3

    def test_same_key_uncorrelated_across_sources(self):
        # identical key ranges, but per-source salts decorrelate them
        a = _docs(4000)
        b = _docs(4000)
        out = mix_sources([(a, 0.5), (b, 0.5)], "doc_id", salt=1)
        ids = [r["doc_id"] for r in out.take_all()]
        from collections import Counter

        c = Counter(ids)
        both = sum(1 for v in c.values() if v == 2)
        # independent halves: ~25% of keys survive in both sources
        assert 0.18 < both / 4000 < 0.32

    def test_bad_rate_rejected(self):
        with pytest.raises(ValueError, match="rate"):
            mix_sources([(_docs(10), 2.0)], "doc_id")


@pytest.mark.usefixtures("ray_session")
class TestStratifiedSample:
    def _docs(self, n=6000):
        langs = ["en", "de", "fr"]
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array([langs[i % 3] for i in range(n)]),
        }))

    def test_per_stratum_rates(self):
        from vat_abcd_crawler_ray.ops.sampling import stratified_sample

        out = stratified_sample(
            self._docs(), "doc_id", "lang",
            {"en": 0.1, "de": 1.0}, default=0.0, salt=5,
        ).to_pandas()
        by = out["lang"].value_counts()
        assert by.get("de", 0) == 2000          # keep-all stratum
        assert 120 < by.get("en", 0) < 280      # ~10% of 2000
        assert "fr" not in by                   # default drops

    def test_nested_fraction_growth_only_adds(self):
        from vat_abcd_crawler_ray.ops.sampling import stratified_sample

        small = {r["doc_id"] for r in stratified_sample(
            self._docs(), "doc_id", "lang", {"en": 0.05}, salt=5
        ).take_all()}
        big = {r["doc_id"] for r in stratified_sample(
            self._docs(), "doc_id", "lang", {"en": 0.2}, salt=5
        ).take_all()}
        assert small <= big

    def test_agrees_with_flat_sample_on_single_stratum(self):
        from vat_abcd_crawler_ray.ops.sampling import (
            sample_by_hash,
            stratified_sample,
        )

        docs = self._docs(1500)
        a = {r["doc_id"] for r in stratified_sample(
            docs, "doc_id", "lang",
            {"en": 0.3, "de": 0.3, "fr": 0.3}, salt=2
        ).take_all()}
        b = {r["doc_id"] for r in
             sample_by_hash(docs, "doc_id", 0.3, salt=2).take_all()}
        assert a == b

    def test_bad_fraction(self):
        from vat_abcd_crawler_ray.ops.sampling import stratified_sample

        with pytest.raises(ValueError):
            stratified_sample(self._docs(10), "doc_id", "lang", {"en": 2.0})
