"""Distributed operator tests: zip_with_index, joins, top-k."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from vat_abcd_crawler_ray.ops.joins import (
    broadcast_join,
    broadcast_semi_join,
    bucket_hash_join,
)
from vat_abcd_crawler_ray.ops.topk import topk_per_key
from vat_abcd_crawler_ray.ops.zip_with_index import zip_with_index


@pytest.mark.usefixtures("ray_session")
class TestOps:
    def test_zip_with_index(self):
        ds = rd.from_items([{"v": i} for i in [5, 3, 9, 1, 7]]).repartition(3)
        out = zip_with_index(ds.sort("v"), "idx", start=1).to_pandas()
        assert out.sort_values("idx")["v"].tolist() == [1, 3, 5, 7, 9]
        assert sorted(out["idx"]) == [1, 2, 3, 4, 5]

    def test_broadcast_join(self):
        big = rd.from_items([{"k": i % 3, "v": i} for i in range(30)])
        small = pd.DataFrame({"k": [0, 1, 2], "name": ["a", "b", "c"]})
        out = broadcast_join(big, small, on="k").to_pandas()
        assert len(out) == 30
        assert set(out[out["k"] == 1]["name"]) == {"b"}

    def test_broadcast_semi_and_anti_join(self):
        big = rd.from_items([{"k": i} for i in range(20)])
        keep = broadcast_semi_join(big, [1, 5, 7], on="k").to_pandas()
        assert sorted(keep["k"]) == [1, 5, 7]
        drop = broadcast_semi_join(big, list(range(15)), on="k", anti=True).to_pandas()
        assert sorted(drop["k"]) == [15, 16, 17, 18, 19]

    def test_bucket_hash_join_inner(self):
        left = rd.from_items([{"k": i, "l": i * 10} for i in range(50)])
        right = rd.from_items([{"k": i, "r": i * 100} for i in range(25, 75)])
        out = bucket_hash_join(left, right, on="k", num_buckets=4).to_pandas()
        assert sorted(out["k"]) == list(range(25, 50))
        row = out[out["k"] == 30].iloc[0]
        assert row["l"] == 300 and row["r"] == 3000

    def test_bucket_hash_join_left(self):
        left = rd.from_items([{"k": i, "l": i} for i in range(10)])
        right = rd.from_items([{"k": i, "r": i} for i in range(5)])
        out = bucket_hash_join(left, right, on="k", num_buckets=2, how="left").to_pandas()
        assert len(out) == 10
        assert out[out["k"] >= 5]["r"].isna().all()

    def test_bucket_hash_join_string_key(self):
        left = rd.from_items([{"k": f"h{i}", "l": i} for i in range(20)])
        right = rd.from_items([{"k": f"h{i}", "r": -i} for i in range(10, 30)])
        out = bucket_hash_join(left, right, on="k", num_buckets=3).to_pandas()
        assert len(out) == 10

    def test_topk_per_key(self):
        rows = [
            {"host": f"h{i % 4}", "priority": (i * 7) % 13, "seq": i}
            for i in range(100)
        ]
        out = topk_per_key(
            rd.from_items(rows).repartition(5),
            key="host",
            k=3,
            sort_cols=["priority", "seq"],
            ascending=[False, True],
        ).to_pandas()
        assert len(out) == 12
        expect = (
            pd.DataFrame(rows)
            .sort_values(["priority", "seq"], ascending=[False, True], kind="mergesort")
            .groupby("host", sort=False)
            .head(3)
        )
        got = out.sort_values(["host", "priority", "seq"]).reset_index(drop=True)
        want = expect.sort_values(["host", "priority", "seq"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["host", "priority", "seq"]], want[["host", "priority", "seq"]])
