"""Seen-set semantics: cuckoo filter, first-wins dedup, shard actors.

Reference oracle: surrogate_key.rs:47-66 — dense keys from 1, first
sight New(k), later Existing(k)."""

from __future__ import annotations

import numpy as np
import pytest

import ray.data as rd

from vat_abcd_crawler_ray.state.cuckoo import CuckooFilter
from vat_abcd_crawler_ray.state.seen_set import ShardedSeenSet, first_wins_dataset


class TestCuckoo:
    def test_no_false_negatives(self):
        rng = np.random.RandomState(42)
        keys = rng.randint(-(2**62), 2**62, size=5000).astype(np.int64)
        keys = np.unique(keys)
        f = CuckooFilter(capacity=8192)
        f.add(keys)
        assert f.contains(keys).all()

    def test_low_false_positive_rate(self):
        rng = np.random.RandomState(7)
        keys = np.unique(rng.randint(-(2**62), 2**62, size=4000).astype(np.int64))
        other = np.unique(rng.randint(-(2**62), 2**62, size=20000).astype(np.int64))
        other = np.setdiff1d(other, keys)
        f = CuckooFilter(capacity=8192)
        f.add(keys)
        fpr = f.contains(other).mean()
        assert fpr < 0.01, fpr

    def test_snapshot_roundtrip(self):
        keys = np.arange(100, dtype=np.int64) * 7919
        f = CuckooFilter(capacity=512)
        f.add(keys)
        g = CuckooFilter.from_state(f.state())
        assert g.contains(keys).all()
        assert g.count == f.count

    def test_deterministic(self):
        keys = np.arange(1000, dtype=np.int64) * 104729
        f1, f2 = CuckooFilter(2048), CuckooFilter(2048)
        f1.add(keys)
        f2.add(keys)
        assert (f1.table == f2.table).all()


@pytest.mark.usefixtures("ray_session")
class TestFirstWins:
    def test_dataset_first_wins(self):
        # keys seen at seqs; first sight wins, dense keys in first-seen order
        rows = [
            {"key": 100, "seq": 0},
            {"key": 200, "seq": 1},
            {"key": 100, "seq": 2},
            {"key": 300, "seq": 3},
            {"key": 200, "seq": 4},
        ]
        out = (
            first_wins_dataset(rd.from_items(rows).repartition(3), "key", "seq")
            .to_pandas()
            .sort_values("surrogate")
        )
        assert out["key"].tolist() == [100, 200, 300]
        assert out["surrogate"].tolist() == [1, 2, 3]
        assert out["first_seq"].tolist() == [0, 1, 3]


@pytest.mark.usefixtures("ray_session")
class TestShardedSeenSet:
    def test_round_commit_matches_sequential(self):
        ss = ShardedSeenSet(num_shards=4, capacity_per_shard=4096)
        # round 1: keys with dup offers, out-of-order seqs
        keys = np.array([11, 22, 11, 33, 22, 44], dtype=np.int64)
        seqs = np.array([5, 1, 0, 3, 9, 2], dtype=np.int64)
        fresh = ss.offer_batch(keys, seqs)
        assert fresh.all()  # nothing committed yet
        t = ss.commit_round()
        got = list(zip(t["key"].to_pylist(), t["surrogate"].to_pylist(), t["first_seq"].to_pylist()))
        # first_seq: 11→0, 22→1, 44→2, 33→3 → surrogates in that order
        assert got == [(11, 1, 0), (22, 2, 1), (44, 3, 2), (33, 4, 3)]

        # round 2: repeats are filtered, new key gets next dense surrogate
        keys2 = np.array([11, 55, 22], dtype=np.int64)
        fresh2 = ss.offer_batch(keys2, np.array([10, 11, 12], dtype=np.int64))
        assert fresh2.tolist() == [False, True, False]
        t2 = ss.commit_round()
        assert t2["key"].to_pylist() == [55]
        assert t2["surrogate"].to_pylist() == [5]

        # lookup
        assert ss.lookup(np.array([22, 55, 999])).tolist() == [2, 5, -1]

    def test_snapshot_restore(self, tmp_path):
        ss = ShardedSeenSet(num_shards=2, capacity_per_shard=1024)
        ss.offer_batch(np.array([1, 2, 3]), np.array([0, 1, 2]))
        ss.commit_round()
        snap = str(tmp_path / "seen")
        ss.snapshot(snap)

        ss2 = ShardedSeenSet(num_shards=2, capacity_per_shard=1024)
        ss2.restore(snap)
        assert ss2.lookup(np.array([1, 2, 3])).tolist() == [1, 2, 3]
        assert ss2.next_surrogate == 4
        # restored set keeps filtering
        fresh = ss2.offer_batch(np.array([2, 9]), np.array([5, 6]))
        assert fresh.tolist() == [False, True]

    def test_commit_round_distributed_matches_driver(self):
        """The Dataset-sort + zip_with_index commit must leave the
        shards in the SAME state as the driver argsort commit, for the
        same offered (key, seq) stream — including across rounds."""
        rng = np.random.RandomState(13)
        r1_keys = rng.randint(0, 500, size=400).astype(np.int64)
        r1_seqs = np.arange(400, dtype=np.int64)
        rng.shuffle(r1_seqs)
        r2_keys = rng.randint(0, 800, size=300).astype(np.int64)
        r2_seqs = 1000 + np.arange(300, dtype=np.int64)

        a = ShardedSeenSet(num_shards=4, capacity_per_shard=4096)
        b = ShardedSeenSet(num_shards=4, capacity_per_shard=4096)
        a.offer_batch(r1_keys, r1_seqs)
        b.offer_batch(r1_keys, r1_seqs)
        ta = a.commit_round(mode="driver")
        db = b.commit_round(mode="distributed")
        pa_ = ta.to_pandas().sort_values("key").reset_index(drop=True)
        pb = (
            db.to_pandas()[["key", "first_seq", "surrogate"]]
            .sort_values("key")
            .reset_index(drop=True)
        )
        assert pa_.equals(pb)
        # second round on top of the committed state
        a.offer_batch(r2_keys, r2_seqs)
        b.offer_batch(r2_keys, r2_seqs)
        a.commit_round(mode="driver")
        b.commit_round(mode="distributed")
        ta2 = a.to_table().to_pandas()
        tb2 = b.to_table().to_pandas()
        assert ta2.equals(tb2)
        assert a.next_surrogate == b.next_surrogate

    def test_filter_unseen_dataset(self):
        import pandas as pd

        ss = ShardedSeenSet(num_shards=3, capacity_per_shard=1024)
        ss.offer_batch(np.array([10, 20, 30]), np.array([0, 1, 2]))
        ss.commit_round()
        cand = rd.from_pandas(
            pd.DataFrame({"key": np.array([10, 15, 20, 25], dtype=np.int64),
                          "x": [1, 2, 3, 4]})
        ).repartition(2)
        out = ss.filter_unseen_dataset(cand.materialize()).to_pandas()
        assert sorted(out["key"].tolist()) == [15, 25]

    def test_filter_unseen_dataset_randomized(self):
        """Randomized parity vs a plain Python set, at a key volume
        where the cuckoo prefilter sees real load (and occasional
        false positives must fall through to the exact dict)."""
        import pandas as pd

        rng = np.random.RandomState(1234)
        seen_keys = np.unique(
            rng.randint(0, 1 << 40, size=20_000).astype(np.int64)
        )
        ss = ShardedSeenSet(num_shards=4, capacity_per_shard=1 << 15)
        ss.offer_batch(seen_keys, np.arange(len(seen_keys), dtype=np.int64))
        ss.commit_round()
        # candidates: half committed keys, half fresh (some duplicated)
        fresh = np.unique(
            rng.randint(1 << 40, 1 << 41, size=10_000).astype(np.int64)
        )
        cand_keys = np.concatenate(
            [rng.choice(seen_keys, 8_000), fresh, fresh[:500]]
        )
        rng.shuffle(cand_keys)
        cand = rd.from_pandas(
            pd.DataFrame({"key": cand_keys, "x": np.arange(len(cand_keys))})
        ).repartition(5)
        out = ss.filter_unseen_dataset(cand.materialize()).to_pandas()
        seen = set(seen_keys.tolist())
        expect = sorted(int(k) for k in cand_keys if int(k) not in seen)
        assert sorted(out["key"].tolist()) == expect

    def test_delta_snapshot_chain_restore(self, tmp_path):
        """full@r0 + delta@r1 + delta@r2 must restore to exactly the
        state a full snapshot would give — same table, same
        next_surrogate, same filtering behavior."""
        ss = ShardedSeenSet(num_shards=3, capacity_per_shard=2048)
        dirs = []
        rng = np.random.RandomState(7)
        seq = 0
        for rnd in range(3):
            keys = rng.randint(0, 400, size=60).astype(np.int64)
            seqs = np.arange(seq, seq + 60, dtype=np.int64)
            seq += 60
            ss.offer_batch(keys, seqs)
            ss.commit_round()
            d = str(tmp_path / f"seen_{rnd}")
            ss.snapshot(d, mode="full" if rnd == 0 else "delta")
            dirs.append(d)

        restored = ShardedSeenSet(num_shards=3, capacity_per_shard=2048)
        restored.restore_chain(dirs)
        pd_orig = ss.to_table().to_pandas()
        pd_rest = restored.to_table().to_pandas()
        import pandas as pd

        pd.testing.assert_frame_equal(pd_orig, pd_rest)
        assert restored.next_surrogate == ss.next_surrogate
        # the rebuilt cuckoo filter keeps filtering correctly
        probe = rng.randint(0, 800, size=200).astype(np.int64)
        np.testing.assert_array_equal(
            restored.lookup(probe), ss.lookup(probe)
        )

    def test_to_table(self):
        ss = ShardedSeenSet(num_shards=3)
        ss.offer_batch(np.array([7, 8, 9]), np.array([2, 0, 1]))
        ss.commit_round()
        t = ss.to_table()
        assert t["surrogate"].to_pylist() == [1, 2, 3]
        assert t["key"].to_pylist() == [8, 9, 7]


@pytest.mark.usefixtures("ray_session")
class TestSpillTier:
    """The 10^10-key seam: a tiny ram_cap forces the tail → RAM-run →
    disk-run path on every commit, and every seen-set contract must
    hold unchanged (VERDICT r4 #3)."""

    def _spilled(self, tmp_path, num_shards=4, ram_cap=64):
        return ShardedSeenSet(
            num_shards=num_shards,
            capacity_per_shard=1 << 15,
            ram_cap_per_shard=ram_cap,
            spill_dir=str(tmp_path / "spill"),
        )

    def test_commit_lookup_filter_with_spill(self, tmp_path):
        import os

        import pandas as pd

        rng = np.random.RandomState(99)
        ss = self._spilled(tmp_path)
        ref = ShardedSeenSet(num_shards=4, capacity_per_shard=1 << 15)
        seq = 0
        all_keys = []
        for _ in range(4):
            keys = np.unique(
                rng.randint(0, 1 << 40, size=3000).astype(np.int64)
            )
            seqs = np.arange(seq, seq + len(keys), dtype=np.int64)
            seq += len(keys)
            for s in (ss, ref):
                s.offer_batch(keys, seqs)
                s.commit_round()
            all_keys.append(keys)
        # disk runs actually exist (the cap is far below the volume)
        spill_files = os.listdir(tmp_path / "spill")
        assert any(f.endswith("_keys.npy") for f in spill_files), spill_files
        # lookups agree with the un-capped reference across all tiers
        probe = np.concatenate(
            [np.concatenate(all_keys)[::7],
             rng.randint(1 << 41, 1 << 42, size=500).astype(np.int64)]
        )
        np.testing.assert_array_equal(ss.lookup(probe), ref.lookup(probe))
        # the distributed anti-filter resolves via the run probes
        cand_keys = np.concatenate(
            [all_keys[0][:1000],
             rng.randint(1 << 41, 1 << 42, size=1000).astype(np.int64)]
        )
        cand = rd.from_pandas(
            pd.DataFrame({"key": cand_keys, "x": np.arange(len(cand_keys))})
        ).repartition(3)
        got = sorted(
            ss.filter_unseen_dataset(cand.materialize()).to_pandas()["key"]
        )
        want = sorted(
            ref.filter_unseen_dataset(cand.materialize()).to_pandas()["key"]
        )
        assert got == want
        # full dump equality (to_table sorts by surrogate)
        pd.testing.assert_frame_equal(
            ss.to_table().to_pandas(), ref.to_table().to_pandas()
        )

    def test_snapshot_restore_with_spill(self, tmp_path):
        ss = self._spilled(tmp_path, num_shards=2, ram_cap=32)
        rng = np.random.RandomState(3)
        keys = np.unique(rng.randint(0, 1 << 30, size=500).astype(np.int64))
        ss.offer_batch(keys, np.arange(len(keys), dtype=np.int64))
        ss.commit_round()
        snap = str(tmp_path / "snap")
        ss.snapshot(snap)
        # restore into ANOTHER capped set: state comes back as runs and
        # immediately re-spills past the cap
        ss2 = self._spilled(tmp_path / "r2", num_shards=2, ram_cap=32)
        ss2.restore(snap)
        np.testing.assert_array_equal(ss2.lookup(keys), ss.lookup(keys))
        assert ss2.next_surrogate == ss.next_surrogate
        fresh = ss2.offer_batch(
            np.array([int(keys[0]), 1 << 60]), np.array([9000, 9001])
        )
        assert fresh.tolist() == [False, True]

    def test_delta_chain_with_spill(self, tmp_path):
        ss = self._spilled(tmp_path, num_shards=3, ram_cap=48)
        ref = ShardedSeenSet(num_shards=3, capacity_per_shard=2048)
        dirs = []
        rng = np.random.RandomState(11)
        seq = 0
        for rnd in range(3):
            keys = rng.randint(0, 2000, size=200).astype(np.int64)
            seqs = np.arange(seq, seq + 200, dtype=np.int64)
            seq += 200
            for s in (ss, ref):
                s.offer_batch(keys, seqs)
                s.commit_round()
            d = str(tmp_path / f"seen_{rnd}")
            ss.snapshot(d, mode="full" if rnd == 0 else "delta")
            dirs.append(d)
        restored = self._spilled(tmp_path / "rest", num_shards=3, ram_cap=48)
        restored.restore_chain(dirs)
        import pandas as pd

        pd.testing.assert_frame_equal(
            restored.to_table().to_pandas(), ref.to_table().to_pandas()
        )
        assert restored.next_surrogate == ref.next_surrogate
