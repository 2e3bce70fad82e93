"""Page store: range-shard routing, lookups, miss behavior."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vat_abcd_crawler_ray.state.page_store import PageStore


@pytest.fixture(scope="module")
def store_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages") / "pages.parquet"
    os.makedirs(d)
    urls = [f"https://h{i:04d}.org/p" for i in range(100)]
    urls.sort()
    for fi in range(5):
        part = urls[fi * 20 : (fi + 1) * 20]
        t = pa.table(
            {
                "url": pa.array(part),
                "html": pa.array([u.encode() for u in part], pa.binary()),
                "lang": pa.array(["en"] * len(part)),
                "warc_ts": pa.array([0] * len(part), pa.timestamp("us")),
            }
        )
        pq.write_table(t, os.path.join(d, f"part-{fi}.parquet"))
    return str(d), urls


@pytest.mark.usefixtures("ray_session")
class TestPageStore:
    def test_lookup_all_and_boundaries(self, store_dir):
        path, urls = store_dir
        store = PageStore(path, num_shards=3)
        # every url resolves, including exact file-boundary urls
        import ray

        shard_ids = store.shard_of(urls)
        got = []
        for sid in np.unique(shard_ids):
            sel = np.flatnonzero(shard_ids == sid)
            t = ray.get(store.shards[int(sid)].get.remote([urls[i] for i in sel]))
            got.extend(t["url"].to_pylist())
        assert sorted(got) == urls
        # html round-trips
        t0 = ray.get(store.shards[int(shard_ids[0])].get.remote([urls[0]]))
        assert t0["html"][0].as_py() == urls[0].encode()

    def test_misses_absent(self, store_dir):
        path, urls = store_dir
        store = PageStore(path, num_shards=2)
        import ray

        miss = ["https://zzz.example/none", urls[3]]
        sid = store.shard_of(miss)
        rows = []
        for s in np.unique(sid):
            sel = np.flatnonzero(sid == s)
            rows.extend(
                ray.get(store.shards[int(s)].get.remote([miss[i] for i in sel]))[
                    "url"
                ].to_pylist()
            )
        assert rows == [urls[3]]

    def test_shards_capped_by_files(self, store_dir):
        path, _ = store_dir
        store = PageStore(path, num_shards=64)
        assert store.num_shards == 5  # ≤ number of files
