"""Sharded page store — the simulated network (S3 fetch analog).

The reference fetches each dataset over HTTP (O(1) per url,
``/root/reference/src/file_downloader.rs:8-29``). In this sandbox the
"network" is the pages Parquet table; a naive per-round
``read_parquet(filter=url.isin(...))`` re-scans the whole corpus every
round — O(corpus × rounds). This store loads the corpus ONCE into N
actors and answers each round's fetch list with O(K) indexed lookups,
like a real fetch tier.

Sharding is by URL RANGE, not hash: the corpus files are globally
url-sorted, so shard i owns files ``i, i+N, …`` and the router finds a
url's file with a binary search over the file-start boundaries (read
once from the parquet footers). Each shard therefore decodes only its
1/N of the corpus at init (hash sharding made every shard decode
everything), and lookups need no hashing at all.

Memory: |corpus|/N rows of Arrow data per shard, zero-copy ``take`` on
get. At true 100 TB scale the same interface fronts an HTTP fetcher or
a bucketed page archive; the batched ``get(urls)`` contract stays.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


@ray.remote(num_cpus=0)
class PageStoreShard:
    def __init__(self, files: list[str], columns: list[str]):
        t = pa.concat_tables(pq.read_table(f, columns=columns) for f in files)
        self.table = t.combine_chunks()
        self.index = {u: i for i, u in enumerate(self.table["url"].to_pylist())}

    def get(self, urls: list[str]) -> pa.Table:
        """Rows for the urls present in this shard (misses are simply
        absent — the caller diffs against its request list)."""
        idxs = [self.index[u] for u in urls if u in self.index]
        if not idxs:
            return self.table.slice(0, 0)
        return self.table.take(pa.array(idxs, type=pa.int64()))

    def get_with_meta(self, urls: list[str], meta: pa.Table) -> pa.Table:
        """Rows for the present urls, with the caller's positionally
        aligned ``meta`` columns appended in-actor (Arrow take + column
        append — no driver-side or task-side join). One result block
        per call; the caller chunks its url list to set block sizes."""
        index = self.index
        pos: list[int] = []
        idxs: list[int] = []
        for i, u in enumerate(urls):
            j = index.get(u)
            if j is not None:
                pos.append(i)
                idxs.append(j)
        t = self.table.take(pa.array(idxs, type=pa.int64()))
        mt = meta.take(pa.array(pos, type=pa.int64()))
        for name in meta.column_names:
            if name != "url":
                t = t.append_column(name, mt[name])
        return t

    def size(self) -> int:
        return len(self.index)


_STORE_CACHE: dict[tuple[str, int], "PageStore"] = {}


def get_page_store(pages_path: str, num_shards: int = 0) -> "PageStore":
    """Session-scoped cache: one shard pool per (corpus, shard count) —
    repeated crawls over the same corpus (tests, benches, resumes) reuse
    the loaded actors instead of re-decoding the parquet.

    ``num_shards=0`` scales the shard pool with the cluster (one shard
    per CPU, floor 16 — the floor keeps small clusters on the historic
    fixed-16 layout so lifting the cap never slows the comparison
    level): the store models the fetch network, whose aggregate
    bandwidth grows with cluster size — a fixed count would cap fetch
    parallelism at the larger cluster and understate scaling.
    """
    if num_shards <= 0:
        num_shards = max(16, int(ray.cluster_resources().get("CPU", 8)))
    key = (pages_path, num_shards)
    store = _STORE_CACHE.get(key)
    if store is None or not store.alive():
        store = PageStore(pages_path, num_shards)
        _STORE_CACHE[key] = store
    return store


class PageStore:
    """Driver-side handle; builds the shard pool once per corpus."""

    COLUMNS = ["url", "html", "lang", "warc_ts"]

    def __init__(self, pages_path: str, num_shards: int = 8):
        if os.path.isdir(pages_path):
            files = sorted(
                os.path.join(pages_path, f)
                for f in os.listdir(pages_path)
                if f.endswith(".parquet")
            )
        else:
            files = [pages_path]
        num_shards = min(num_shards, len(files))
        self.num_shards = num_shards
        # File-start boundaries from the FIRST ROW of each file (one
        # tiny batch per file), not footer statistics — parquet writers
        # may truncate string min/max stats, which would silently
        # misroute lookups. Routing also requires a globally url-sorted
        # corpus; validate the invariant here and fail loudly instead of
        # turning present pages into FetchMiss dead-letter rows.
        starts: list[str] = []
        for f in files:
            batch = next(pq.ParquetFile(f).iter_batches(batch_size=1, columns=["url"]))
            starts.append(batch["url"][0].as_py())
        for prev, cur, f in zip(starts, starts[1:], files[1:]):
            if not prev < cur:
                raise ValueError(
                    f"page store requires globally url-sorted files: "
                    f"{f!r} starts at {cur!r} <= previous file start {prev!r}"
                )
        self._starts = np.array(starts[1:], dtype=object)  # boundaries after file 0
        self._file_shard = np.array(
            [i % num_shards for i in range(len(files))], dtype=np.int64
        )
        self.shards = [
            PageStoreShard.remote(
                [f for j, f in enumerate(files) if j % num_shards == i],
                self.COLUMNS,
            )
            for i in range(num_shards)
        ]
        # do NOT block here: shard decode overlaps the caller's seed
        # bootstrap; the first fetch (or alive()) synchronizes.
        self._ready = [s.size.remote() for s in self.shards]

    def alive(self) -> bool:
        try:
            ray.get(self.shards[0].size.remote(), timeout=30)
            return True
        except Exception:
            return False

    def shard_of(self, urls: list[str]) -> np.ndarray:
        file_idx = np.searchsorted(self._starts, np.array(urls, dtype=object),
                                   side="right")
        return self._file_shard[file_idx]

    # NOTE: a former ``fetch_fn`` map_batches body lived here — it
    # called ``ray.get`` on shard actors from INSIDE map tasks (blocked
    # workers → replacement-process storms) and did a per-batch pandas
    # merge. The in-actor ``get_with_meta`` path above replaced it;
    # never reintroduce the in-task ``ray.get`` pattern.
