"""pipelines/substring_dedup — winnowed-fingerprint substring-level
duplication (Schleimer et al. 2003 winnowing; Lee et al. 2021
motivation). The detection guarantee is the test spine: any shared
substring of length >= k + w - 1 must be detected; clean docs must
stay near zero."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vat_abcd_crawler_ray.pipelines.substring_dedup import (
    fingerprints_batch,
    substring_dup_stats,
    winnow,
)


def _rand_text(rng, n):
    return "".join(rng.choice(list("abcdefghijklmnop rstuvw"), n))


class TestWinnow:
    def test_deterministic_and_sorted_unique(self):
        rng = np.random.default_rng(0)
        t = _rand_text(rng, 500)
        a, b = winnow(t), winnow(t)
        assert (a == b).all()
        assert (np.diff(a) > 0).all()

    def test_density(self):
        # winnowing selects ~2/(w+1) of positions; unique-ing dedupes
        rng = np.random.default_rng(1)
        t = _rand_text(rng, 4000)
        fp = winnow(t, k=20, w=16)
        assert 0.02 < len(fp) / len(t) < 0.2

    def test_guarantee_shared_span_detected(self):
        # ANY shared substring of length >= k + w - 1 must share a
        # fingerprint, wherever it lands in either document
        rng = np.random.default_rng(2)
        k, w = 10, 8
        span = _rand_text(rng, k + w - 1)
        for trial in range(20):
            a = _rand_text(rng, 200) + span + _rand_text(rng, 200)
            cut = int(rng.integers(0, 300))
            b = _rand_text(rng, cut) + span + _rand_text(rng, 300 - cut)
            shared = np.intersect1d(winnow(a, k, w), winnow(b, k, w))
            assert len(shared) > 0, trial

    def test_short_doc(self):
        assert len(winnow("tiny", k=20, w=16)) == 1


@pytest.mark.usefixtures("ray_session")
class TestSubstringDupStats:
    K, W = 10, 8

    def _corpus(self, rng, n_clean=40, n_boiler=20):
        boiler = _rand_text(rng, 120)  # far above the guarantee length
        rows = []
        for i in range(n_clean):
            rows.append({"doc_id": i, "text": _rand_text(rng, 400)})
        for i in range(n_boiler):
            body = _rand_text(rng, 300)
            rows.append({"doc_id": 1000 + i, "text": body + boiler})
        return rows

    def test_boilerplate_docs_flagged_clean_docs_not(self):
        rng = np.random.default_rng(3)
        ds = rd.from_items(self._corpus(rng))
        out = substring_dup_stats(ds, k=self.K, w=self.W).to_pandas()
        out = out.set_index("doc_id").sort_index()
        clean = out[out.index < 1000]
        boiler = out[out.index >= 1000]
        # every boilerplate doc shares the 120-char block
        assert (boiler["n_dup_fp"] > 0).all()
        assert boiler["dup_fp_frac"].mean() > 0.1
        # random 23-char alphabet text: accidental shared 10-grams are
        # possible but rare
        assert clean["dup_fp_frac"].mean() < 0.05

    def test_above_gate_path_matches_broadcast(self):
        rng = np.random.default_rng(4)
        ds = rd.from_items(self._corpus(rng, 20, 10)).repartition(4)
        a = substring_dup_stats(
            ds, k=self.K, w=self.W
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = substring_dup_stats(
            ds, k=self.K, w=self.W, broadcast_limit=0
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert (a["doc_id"] == b["doc_id"]).all()
        assert (a["n_fp"] == b["n_fp"]).all()
        assert (a["n_dup_fp"] == b["n_dup_fp"]).all()

    def test_every_doc_gets_exactly_one_row(self):
        rng = np.random.default_rng(5)
        ds = rd.from_items(self._corpus(rng, 15, 5)).repartition(3)
        out = substring_dup_stats(ds, k=self.K, w=self.W).to_pandas()
        assert len(out) == 20 and out["doc_id"].is_unique

    def test_min_docs_threshold(self):
        # a span shared by exactly 2 docs disappears at min_docs=3
        rng = np.random.default_rng(6)
        span = _rand_text(rng, 60)
        rows = [
            {"doc_id": 0, "text": _rand_text(rng, 200) + span},
            {"doc_id": 1, "text": span + _rand_text(rng, 200)},
            {"doc_id": 2, "text": _rand_text(rng, 260)},
        ]
        ds = rd.from_items(rows)
        two = substring_dup_stats(ds, k=self.K, w=self.W).to_pandas()
        three = substring_dup_stats(
            ds, k=self.K, w=self.W, min_docs=3
        ).to_pandas()
        assert two.set_index("doc_id")["n_dup_fp"][0] > 0
        assert (three["n_dup_fp"] == 0).all()


class TestFingerprintsBatch:
    def test_contiguous_rows_per_doc(self):
        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "doc_id": [5, 3, 9],
            "text": [_rand_text(rng, 300) for _ in range(3)],
        })
        out = fingerprints_batch(df, k=10, w=8)
        # rows grouped by doc in input order (the broadcast-regime
        # per-doc aggregation relies on contiguity)
        change = out["doc_id"].ne(out["doc_id"].shift()).sum()
        assert change == 3
