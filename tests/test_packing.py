"""ops/packing — block-local first-fit-decreasing sequence packing
(LLM-training-data surface; no reference analog)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vat_abcd_crawler_ray.ops.packing import (
    pack_rows,
    pack_sequences,
    pack_stats,
)


class TestPackRows:
    def test_budget_never_exceeded(self):
        rng = np.random.default_rng(1)
        lens = rng.integers(1, 900, 500)
        bins, offs = pack_rows(lens, 2048)
        fill = np.zeros(bins.max() + 1, np.int64)
        np.add.at(fill, bins, lens)
        assert (fill <= 2048).all()

    def test_offsets_are_a_valid_layout(self):
        # within a bin, [offset, offset+len) ranges must not overlap
        rng = np.random.default_rng(2)
        lens = rng.integers(1, 700, 300)
        bins, offs = pack_rows(lens, 2048)
        for b in range(bins.max() + 1):
            rows = np.flatnonzero(bins == b)
            spans = sorted((offs[i], offs[i] + lens[i]) for i in rows)
            for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
                assert a1 <= b0
            assert spans[-1][1] <= 2048

    def test_ffd_fill_rate(self):
        rng = np.random.default_rng(3)
        lens = rng.integers(50, 1000, 2000)
        bins, _ = pack_rows(lens, 2048)
        fill = lens.sum() / ((bins.max() + 1) * 2048)
        assert fill > 0.9  # FFD on a uniform mix packs tightly

    def test_oversize_gets_own_bin(self):
        lens = np.array([5000, 10, 10])
        bins, offs = pack_rows(lens, 100)
        assert bins[0] != bins[1] and (bins[1] == bins[2])
        assert offs[0] == 0

    def test_deterministic(self):
        lens = np.array([5, 9, 3, 9, 7, 1])
        a = pack_rows(lens, 10)
        b = pack_rows(lens, 10)
        assert (a[0] == b[0]).all() and (a[1] == b[1]).all()

    def test_empty(self):
        bins, offs = pack_rows(np.array([], np.int64), 10)
        assert len(bins) == 0 and len(offs) == 0


@pytest.mark.usefixtures("ray_session")
class TestPackSequences:
    def _ds(self, n=3000, seed=5):
        rng = np.random.default_rng(seed)
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "n_tokens": pa.array(rng.integers(10, 1500, n), pa.int64()),
        }))

    def test_every_doc_packed_once(self):
        out = pack_sequences(self._ds(), "n_tokens", 2048).to_pandas()
        assert len(out) == 3000
        assert out["doc_id"].is_unique

    def test_pack_ids_globally_unique_across_blocks(self):
        # pack_id = min member doc_id: distinct packs (even from
        # different blocks) can never collide
        ds = self._ds().repartition(8)
        out = pack_sequences(ds, "n_tokens", 2048).to_pandas()
        mins = out.groupby("pack_id")["doc_id"].min()
        assert (mins.index == mins.values).all()

    def test_budget_respected_per_pack(self):
        out = pack_sequences(self._ds(), "n_tokens", 2048).to_pandas()
        fills = out[~out.oversize].groupby("pack_id")["n_tokens"].sum()
        assert (fills <= 2048).all()

    def test_oversize_flagged_not_failed(self):
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "n_tokens": pa.array([50, 9000, 60], pa.int64()),
        }))
        out = pack_sequences(ds, "n_tokens", 100).to_pandas()
        assert out[out.doc_id == 2].oversize.all()
        assert not out[out.doc_id != 2].oversize.any()
        # the oversize doc sits alone in its pack
        assert (out[out.doc_id == 2].pack_id == 2).all()

    def test_stats(self):
        out = pack_sequences(self._ds(), "n_tokens", 2048).to_pandas()
        st = pack_stats(out, "n_tokens", 2048)
        assert st["n_oversize"] == 0
        assert st["fill_rate"] > 0.85
        assert st["docs_per_pack_mean"] > 1.5

    def test_bad_budget(self):
        with pytest.raises(ValueError):
            pack_sequences(self._ds(10), "n_tokens", 0)

    def test_negative_length_rejected(self):
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "n_tokens": pa.array([-5], pa.int64()),
        }))
        with pytest.raises(Exception):
            pack_sequences(ds, "n_tokens", 100).to_pandas()
