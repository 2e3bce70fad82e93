"""Dedup family tests over synthetic near-duplicate corpora."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from vat_abcd_crawler_ray.pipelines.dedup import (
    char_shingles,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_dedup,
    minhash_signature,
    ngram_jaccard,
    _perm_params,
    simhash64,
    simhash_dedup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees"
)


def _docs():
    rows = []
    for i in range(20):
        filler = " ".join(f"w{i}x{j}" for j in range(40))
        rows.append({"doc_id": i, "text": f"{BASE} variant {i} {filler}"})
    # exact duplicates of doc 0
    rows.append({"doc_id": 100, "text": rows[0]["text"]})
    rows.append({"doc_id": 101, "text": rows[0]["text"]})
    # near duplicate of doc 1 (one word changed)
    rows.append({"doc_id": 102, "text": rows[1]["text"].replace("garden", "forest")})
    return rows


@pytest.mark.usefixtures("ray_session")
class TestExactDedup:
    def test_first_wins(self):
        out = exact_dedup(rd.from_items(_docs())).to_pandas()
        assert 100 not in out["doc_id"].values
        assert 101 not in out["doc_id"].values
        assert 0 in out["doc_id"].values
        assert 102 in out["doc_id"].values  # near-dup kept by exact
        assert len(out) == 21

    def test_prefix_key(self):
        rows = [
            {"doc_id": 3, "text": "abcdefXX tail one"},
            {"doc_id": 1, "text": "abcdefYY tail two"},
            {"doc_id": 2, "text": "zzzzzzzz other"},
        ]
        out = exact_dedup(rd.from_items(rows), key_len=6).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2]  # min doc_id wins per prefix


class TestMinhashMath:
    def test_jaccard_estimate(self):
        a, b = _perm_params(128)
        s1 = char_shingles(BASE)
        s2 = char_shingles(BASE.replace("dog", "cat"))
        est = (minhash_signature(s1, a, b) == minhash_signature(s2, a, b)).mean()
        import numpy as np
        inter = np.intersect1d(s1, s2).size
        true_j = inter / (s1.size + s2.size - inter)
        assert abs(est - true_j) < 0.15

    def test_batch_kernels_bit_identical_to_scalar(self):
        # the vectorized batch kernels must reproduce the scalar path
        # bit-for-bit (the SQL oracle re-derives the scalar math)
        from vat_abcd_crawler_ray.pipelines.dedup import (
            band_buckets,
            band_buckets_batch,
            minhash_signatures_batch,
        )

        a, b = _perm_params(32)
        texts = [
            BASE,
            BASE.replace("dog", "cat"),
            "",  # empty
            "ab",  # shorter than k=5 → whole-text fold
            "abcd",  # exactly k-1
            "abcde",  # exactly k → one shingle
            "aaaaaaaaaa",  # all-identical shingles → unique collapses to 1
            "naïve café — ünïcode ✓ text with ✨ emoji",  # multi-byte
            BASE * 3,  # long
        ]
        sigs = minhash_signatures_batch(texts, a, b, k=5)
        assert sigs.shape == (len(texts), 32)
        for i, t in enumerate(texts):
            expected = minhash_signature(char_shingles(t, 5), a, b)
            np.testing.assert_array_equal(sigs[i], expected, err_msg=t[:30])
        buckets = band_buckets_batch(sigs, bands=8)
        assert buckets.shape == (len(texts), 8)
        for i in range(len(texts)):
            np.testing.assert_array_equal(buckets[i], band_buckets(sigs[i], 8))

    def test_ngram_jaccard(self):
        assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
        assert ngram_jaccard("a b c d e", "x y z w v") == 0.0
        assert 0.0 < ngram_jaccard(BASE, BASE.replace("dog", "cat")) < 1.0

    def test_simhash_near_for_near_texts(self):
        h1 = simhash64(BASE)
        h2 = simhash64(BASE.replace("garden", "forest"))
        h3 = simhash64("completely different words entirely here now")
        d12 = bin((h1 ^ h2) & (1 << 64) - 1).count("1")
        d13 = bin((h1 ^ h3) & (1 << 64) - 1).count("1")
        assert d12 < d13
        assert d12 <= 6


@pytest.mark.usefixtures("ray_session")
class TestGateBranches:
    """The size-gated scale paths must agree with the default paths."""

    def test_hot_reps_distributed_equals_driver(self):
        from vat_abcd_crawler_ray.pipelines.dedup import (
            _hot_reps,
            _perm_params,
            minhash_signatures_batch,
        )

        a, b = _perm_params(64)
        rows = _docs()
        sigs = minhash_signatures_batch([r["text"] for r in rows], a, b, 5)
        sigs_ds = rd.from_items(
            [
                {"id": r["doc_id"], "sig": s.tobytes()}
                for r, s in zip(rows, sigs)
            ]
        )
        drv = _hot_reps(sigs_ds, bands=16, driver_limit=10_000_000)
        dist = _hot_reps(sigs_ds, bands=16, driver_limit=0)
        np.testing.assert_array_equal(drv[0], dist[0])
        np.testing.assert_array_equal(drv[1], dist[1])

    def test_minhash_grouped_fallback_equals_broadcast(self, monkeypatch):
        import vat_abcd_crawler_ray.pipelines.dedup as dd

        kept_default = sorted(
            dd.minhash_lsh_dedup(rd.from_items(_docs()), threshold=0.8)
            .to_pandas()["doc_id"]
            .tolist()
        )
        # force the above-gate band-table grouped star verify
        monkeypatch.setattr(dd, "_REP_BROADCAST_LIMIT", -1)
        kept_grouped = sorted(
            dd.minhash_lsh_dedup(rd.from_items(_docs()), threshold=0.8)
            .to_pandas()["doc_id"]
            .tolist()
        )
        assert kept_default == kept_grouped


@pytest.mark.usefixtures("ray_session")
class TestNearDedup:
    def test_minhash_lsh_removes_exact_and_near(self):
        out, edges = minhash_lsh_dedup(
            rd.from_items(_docs()), threshold=0.8, return_edges=True
        )
        kept = out.to_pandas()["doc_id"].tolist()
        assert 100 not in kept and 101 not in kept
        assert 102 not in kept  # near-dup of 1 caught
        assert 0 in kept and 1 in kept
        assert edges.count() >= 3

    def test_simhash_dedup(self):
        out = simhash_dedup(rd.from_items(_docs()), hamming_max=3).to_pandas()
        kept = out["doc_id"].tolist()
        assert 100 not in kept and 101 not in kept
        assert 0 in kept

    def test_embedding_neardup(self):
        rng = np.random.RandomState(0)
        rows = []
        for i in range(30):
            v = rng.normal(size=16)
            rows.append({"vec_id": i, "embedding": v.tolist(), "label": i % 3})
        # vec 100 ≈ vec 0 (same label block)
        v = np.asarray(rows[0]["embedding"]) + rng.normal(scale=1e-3, size=16)
        rows.append({"vec_id": 100, "embedding": v.tolist(), "label": 0})
        pairs = embedding_neardup_pairs(
            rd.from_items(rows), threshold=0.99
        ).to_pandas()
        assert {(0, 100)} == set(zip(pairs["id_a"], pairs["id_b"]))
