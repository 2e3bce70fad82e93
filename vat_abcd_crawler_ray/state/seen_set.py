"""URL-seen set — first-wins surrogate-key assignment (T1, SURVEY §2.3).

Reference semantics (``/root/reference/src/storage/surrogate_key.rs:16-41``):
a dense counter starting at 1; the FIRST sight of an id allocates the
next key, later sights reuse it. The reference is single-threaded so
"first" is trivially arrival order; under parallelism we make it
**min(seq)** per canonical key — seq is an explicit, deterministic
sequence number carried in the rows (never wall-clock), so the result
is independent of task scheduling.

Two implementations, same semantics:

- :func:`first_wins_dataset` — pure Dataset ops
  (``groupby(key).min(seq)`` → sort → dense index). The
  oracle-checkable path, used for batch dedup.
- :class:`ShardedSeenSet` — the streaming path for the crawl frontier:
  N shard actors (shard = ``key % num_shards``), each holding a cuckoo
  prefilter (state/cuckoo.py) + an exact ``key → (surrogate,
  first_seq)`` map. Links discovered mid-round are filtered through
  ``offer`` (batched actor calls from ``map_batches`` tasks); at the
  round barrier ``commit_round`` resolves min-seq winners and assigns
  dense surrogates in (round, first_seq) order — reproducing the
  sequential crawl's first-seen ordering. Shards snapshot per round for
  kill/resume (the reference rebuilds from scratch,
  ``database_sink.rs:91-101``; at 10^10 we must not).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min

from ..ops.zip_with_index import zip_with_index
from .cuckoo import CuckooFilter


def _as_arrow_block(block) -> pa.Table:
    """Dataset blocks may be Arrow tables OR pandas frames depending on
    the producing operator; the shard block methods accept both."""
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block, preserve_index=False)


def first_wins_dataset(
    ds: "ray.data.Dataset",
    key_col: str,
    seq_col: str,
    surrogate_col: str = "surrogate",
    start: int = 1,
) -> "ray.data.Dataset":
    """Dense first-seen surrogate per key: one row per distinct key with
    ``first_seq = min(seq)`` and surrogates ``start..`` in first_seq
    order. Deterministic given unique seqs."""
    firsts = ds.groupby(key_col).aggregate(Min(seq_col, alias_name="first_seq"))
    return zip_with_index(firsts.sort("first_seq"), surrogate_col, start=start)


# num_cpus=0: shard actors are memory-bound state holders that must not
# reserve data-plane CPUs (a pool of them would otherwise starve the
# map_batches stages on small clusters — observed deadlock at num_cpus=4).
@ray.remote(num_cpus=0)
class SeenSetShard:
    """One shard of the seen set. All methods take/return numpy or Arrow
    (zero pickling of Python row objects)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 20):
        self.shard_id = shard_id
        self.exact: dict[int, tuple[int, int]] = {}  # key -> (surrogate, first_seq)
        self.filter = CuckooFilter(capacity)
        self.pending: dict[int, int] = {}  # this round: key -> min seq
        # (key, surrogate, first_seq) stored since the last snapshot —
        # the payload of a DELTA snapshot (O(round), not O(total))
        self._delta: list[tuple[int, int, int]] = []

    def offer(self, keys: np.ndarray, seqs: np.ndarray) -> np.ndarray:
        """Mark candidate (key, seq) pairs; returns a bool mask of keys
        NOT yet committed-seen (i.e. candidates for the next round).
        Within-round duplicates all return True — the round barrier
        (commit_round) resolves the min-seq winner."""
        keys = np.asarray(keys, dtype=np.int64)
        seqs = np.asarray(seqs, dtype=np.int64)
        maybe_seen = self.filter.contains(keys)
        fresh = np.ones(len(keys), dtype=bool)
        for i in np.flatnonzero(maybe_seen):
            if int(keys[i]) in self.exact:  # true positive
                fresh[i] = False
        idx = np.flatnonzero(fresh)
        if len(idx):
            # within-call min-seq per key VECTORIZED (lexsort + first
            # occurrence), then one bulk dict update; the per-key
            # prev-min comparison only runs when pending already holds
            # entries (a second offer within the same round)
            k, s = keys[idx], seqs[idx]
            order = np.lexsort((s, k))
            k, s = k[order], s[order]
            first = np.concatenate([[True], k[1:] != k[:-1]])
            k, s = k[first], s[first]
            pend = self.pending
            if pend:
                for kk, ss in zip(k.tolist(), s.tolist()):
                    prev = pend.get(kk)
                    if prev is None or ss < prev:
                        pend[kk] = ss
            else:
                pend.update(zip(k.tolist(), s.tolist()))
        return fresh

    def pending_count(self) -> int:
        return len(self.pending)

    def commit_round(self) -> pa.Table:
        """Round barrier step 1: return this shard's NEW (key, first_seq)
        pairs (keys never committed before), clearing the pending set."""
        n = len(self.pending)
        keys = np.fromiter(self.pending.keys(), np.int64, n)
        seqs = np.fromiter(self.pending.values(), np.int64, n)
        self.pending = {}
        exact = self.exact
        if exact and n:
            mask = np.fromiter(
                (k not in exact for k in keys.tolist()), bool, n
            )
            keys, seqs = keys[mask], seqs[mask]
        order = np.argsort(seqs, kind="stable")
        return pa.table(
            {"key": pa.array(keys[order]), "first_seq": pa.array(seqs[order])}
        )

    def assign(self, keys: np.ndarray, surrogates: np.ndarray, first_seqs: np.ndarray) -> int:
        """Round barrier step 2: store driver-assigned dense surrogates."""
        keys = np.asarray(keys, dtype=np.int64)
        if len(keys):
            self.filter.add(keys)
            kl = keys.tolist()
            gl = np.asarray(surrogates).tolist()
            sl = np.asarray(first_seqs).tolist()
            self.exact.update(zip(kl, zip(gl, sl)))  # C-level bulk store
            self._delta.extend(zip(kl, gl, sl))
        return len(self.exact)

    def assign_block(self, table: pa.Table, num_shards: int,
                     seq_col: str = "seq") -> int:
        """Bulk-load pre-assigned rows from a shared Dataset block: keep
        only this shard's keys (``key % num_shards == shard_id``) and
        store them. Used by the distributed bootstrap / admission /
        commit — the block lives once in the object store and every
        shard filters its own slice, so no per-shard routing ever
        touches the driver."""
        table = _as_arrow_block(table)
        if table.num_rows == 0 or "key" not in table.column_names:
            return len(self.exact)  # sort/shuffle ops emit schemaless empties
        keys = table["key"].to_numpy()
        mask = (keys % num_shards) == self.shard_id
        sel = np.flatnonzero(mask)
        if len(sel):
            self.filter.add(keys[sel])
            kl = keys[sel].tolist()
            gl = table["surrogate"].to_numpy()[sel].tolist()
            sl = table[seq_col].to_numpy()[sel].tolist()
            self.exact.update(zip(kl, zip(gl, sl)))
            self._delta.extend(zip(kl, gl, sl))
        return len(self.exact)

    def lookup(self, keys: np.ndarray) -> np.ndarray:
        """surrogate per key, -1 if unseen."""
        return np.fromiter(
            (self.exact.get(int(k), (-1, -1))[0] for k in np.asarray(keys)),
            dtype=np.int64,
            count=len(keys),
        )

    def filter_unseen_block(self, table: pa.Table, num_shards: int) -> pa.Table:
        """Shard-parallel anti-filter for the distributed link
        admission: from a shared candidate block (one object-store copy,
        every shard reads it), return THIS shard's rows (``key %
        num_shards == shard_id``) whose key is not committed-seen.
        Driver traffic is O(num_blocks) refs; the concatenation of all
        shards' outputs over all blocks is exactly the unseen candidate
        set."""
        table = _as_arrow_block(table)
        if table.num_rows == 0 or "key" not in table.column_names:
            return table  # schemaless empty block: nothing to filter
        keys = table["key"].to_numpy()
        mine = np.flatnonzero((keys % num_shards) == self.shard_id)
        if len(mine) == 0:
            return table.take(pa.array(mine, pa.int64()))
        # cuckoo prefilter (no false negatives, same pattern as
        # ``offer``): only filter-POSITIVE rows pay the per-key dict
        # probe — novel-heavy rounds stay fully vectorized
        maybe = self.filter.contains(keys[mine])
        unseen_mask = ~maybe
        exact = self.exact
        for j in np.flatnonzero(maybe):
            if int(keys[mine[j]]) not in exact:  # false positive
                unseen_mask[j] = True
        unseen = mine[unseen_mask]
        return table.take(pa.array(unseen, pa.int64()))

    def snapshot(self, path: str, mode: str = "full") -> None:
        """``full`` writes the whole shard state (O(total keys));
        ``delta`` writes only the entries stored since the LAST snapshot
        of either kind (O(round's novelty)) — the per-round scale path
        at 10^10 keys. Both clear the delta buffer."""
        tmp = path + ".tmp"
        if mode == "delta":
            d = np.array(self._delta, dtype=np.int64).reshape(-1, 3)
            np.savez(
                tmp,
                delta_keys=d[:, 0],
                delta_surrogates=d[:, 1],
                delta_first_seqs=d[:, 2],
            )
            os.replace(tmp + ".npz", path)
            self._delta = []
            return
        keys = np.fromiter(self.exact.keys(), dtype=np.int64, count=len(self.exact))
        vals = np.array(list(self.exact.values()), dtype=np.int64).reshape(-1, 2)
        # uncompressed: snapshots happen EVERY round; compression cost
        # grows with the seen set while the write stays page-cache fast
        np.savez(
            tmp,
            keys=keys,
            surrogates=vals[:, 0] if len(vals) else np.zeros(0, np.int64),
            first_seqs=vals[:, 1] if len(vals) else np.zeros(0, np.int64),
            filter_table=self.filter.table,
            filter_count=self.filter.count,
            filter_slots=self.filter.slots,
        )
        os.replace(tmp + ".npz", path)
        self._delta = []

    def restore(self, path: str) -> int:
        st = np.load(path)
        self.exact = {
            int(k): (int(g), int(s))
            for k, g, s in zip(st["keys"], st["surrogates"], st["first_seqs"])
        }
        self.filter = CuckooFilter.from_state(
            {
                "table": st["filter_table"],
                "count": int(st["filter_count"]),
                "slots": int(st["filter_slots"]),
            }
        )
        self.pending = {}
        self._delta = []
        return len(self.exact)

    def apply_delta(self, path: str) -> int:
        """Replay one delta snapshot on top of the current state (chain
        restore: full base + deltas in round order). The cuckoo filter
        is rebuilt incrementally by re-adding the delta keys."""
        st = np.load(path)
        keys = st["delta_keys"]
        if len(keys):
            self.filter.add(keys.astype(np.int64))
            for k, g, s in zip(
                keys.tolist(),
                st["delta_surrogates"].tolist(),
                st["delta_first_seqs"].tolist(),
            ):
                self.exact[int(k)] = (int(g), int(s))
        return len(self.exact)

    def size(self) -> int:
        return len(self.exact)

    def dump(self) -> pa.Table:
        """(key, surrogate, first_seq) for this shard."""
        keys = np.fromiter(self.exact.keys(), dtype=np.int64, count=len(self.exact))
        vals = np.array(list(self.exact.values()), dtype=np.int64).reshape(-1, 2)
        return pa.table(
            {
                "key": pa.array(keys),
                "surrogate": pa.array(vals[:, 0] if len(vals) else np.zeros(0, np.int64)),
                "first_seq": pa.array(vals[:, 1] if len(vals) else np.zeros(0, np.int64)),
            }
        )


class ShardedSeenSet:
    """Driver-side handle over the shard actor pool."""

    def __init__(self, num_shards: int = 8, capacity_per_shard: int = 1 << 20):
        self.num_shards = num_shards
        self.shards = [
            SeenSetShard.remote(i, capacity_per_shard) for i in range(num_shards)
        ]
        self.next_surrogate = 1

    def shard_of(self, keys: np.ndarray) -> np.ndarray:
        return (np.asarray(keys, dtype=np.int64) % self.num_shards).astype(np.int64)

    def offer_batch(self, keys: np.ndarray, seqs: np.ndarray) -> np.ndarray:
        """Route one batch through the shards; bool mask of fresh keys.
        Called from inside map_batches tasks (actor handles serialize)."""
        keys = np.asarray(keys, dtype=np.int64)
        seqs = np.asarray(seqs, dtype=np.int64)
        shard_ids = keys % self.num_shards
        mask = np.zeros(len(keys), dtype=bool)
        futures, idxs = [], []
        for sid in np.unique(shard_ids):
            sel = np.flatnonzero(shard_ids == sid)
            futures.append(self.shards[int(sid)].offer.remote(keys[sel], seqs[sel]))
            idxs.append(sel)
        for sel, res in zip(idxs, ray.get(futures)):
            mask[sel] = res
        return mask

    def commit_round(
        self,
        mode: str = "auto",
        distributed_threshold: int = 5_000_000,
    ) -> pa.Table:
        """Resolve the round: gather new keys from all shards, assign
        dense surrogates in first_seq order, push assignments back.
        Returns (key, first_seq, surrogate) for the round's new keys.

        Two equivalent implementations (tested identical): **driver** —
        gather + numpy argsort, right while the round's novelty set is
        driver-sized; **distributed** — the shard pending tables stay
        remote, surrogate assignment is a Dataset ``sort(first_seq)`` +
        ``zip_with_index``, and shards ingest shared result blocks
        (``commit_round_distributed``). ``auto`` switches on the total
        pending count (one int per shard to decide), so a 10^8-novel-
        key round never materializes on the driver. NOTE: above the
        gate the return value is a **Dataset**, not a pa.Table — every
        driver-sized caller sits under its own smaller admission gate.
        """
        if mode == "auto":
            counts = ray.get([s.pending_count.remote() for s in self.shards])
            mode = "distributed" if sum(counts) > distributed_threshold else "driver"
        if mode == "distributed":
            return self.commit_round_distributed()
        tables = ray.get([s.commit_round.remote() for s in self.shards])
        allt = pa.concat_tables(tables)
        if allt.num_rows == 0:
            return allt.append_column("surrogate", pa.array([], pa.int64()))
        keys = allt["key"].to_numpy()
        seqs = allt["first_seq"].to_numpy()
        order = np.argsort(seqs, kind="stable")
        keys, seqs = keys[order], seqs[order]
        surrogates = np.arange(
            self.next_surrogate, self.next_surrogate + len(keys), dtype=np.int64
        )
        self.next_surrogate += len(keys)
        shard_ids = keys % self.num_shards
        futs = []
        for sid in range(self.num_shards):
            sel = np.flatnonzero(shard_ids == sid)
            futs.append(
                self.shards[sid].assign.remote(keys[sel], surrogates[sel], seqs[sel])
            )
        ray.get(futs)
        return pa.table(
            {
                "key": pa.array(keys),
                "first_seq": pa.array(seqs),
                "surrogate": pa.array(surrogates),
            }
        )

    def commit_round_distributed(self) -> "ray.data.Dataset":
        """Scale-path round commit (reference dense numbering,
        ``surrogate_key.rs:16-41``, at 10^8+ novel keys/round): the
        shard pending tables become a Dataset WITHOUT touching the
        driver, a global ``sort(first_seq)`` + ``zip_with_index``
        assigns dense surrogates in first-seq order, and every shard
        ingests the shared result blocks. Returns the materialized
        (key, first_seq, surrogate) Dataset."""
        refs = [s.commit_round.remote() for s in self.shards]
        pending = ray.data.from_arrow_refs(refs)
        assigned = zip_with_index(
            pending.sort("first_seq"), "surrogate", start=self.next_surrogate
        ).materialize()
        self.load_assigned_blocks(assigned, seq_col="first_seq")
        self.next_surrogate += assigned.count()
        return assigned

    def lookup(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        shard_ids = keys % self.num_shards
        out = np.full(len(keys), -1, dtype=np.int64)
        futures, idxs = [], []
        for sid in np.unique(shard_ids):
            sel = np.flatnonzero(shard_ids == sid)
            futures.append(self.shards[int(sid)].lookup.remote(keys[sel]))
            idxs.append(sel)
        for sel, res in zip(idxs, ray.get(futures)):
            out[sel] = res
        return out

    def filter_unseen_dataset(self, mat_ds: "ray.data.Dataset") -> "ray.data.Dataset":
        """Distributed anti-filter: each block of the MATERIALIZED input
        is shipped once to the object store; every shard actor extracts
        its own unseen rows (``filter_unseen_block``). Returns the
        Dataset of not-yet-committed rows — no driver materialization,
        O(blocks × shards) small tasks."""
        refs = []
        for bundle in mat_ds.iter_internal_ref_bundles():
            for block_ref in bundle.block_refs:
                for shard in self.shards:
                    refs.append(
                        shard.filter_unseen_block.remote(block_ref, self.num_shards)
                    )
        return ray.data.from_arrow_refs(refs)

    def load_assigned_blocks(
        self, mat_ds: "ray.data.Dataset", seq_col: str = "seq"
    ) -> None:
        """Bulk-commit pre-assigned (key, surrogate, seq) rows from a
        materialized Dataset: every shard filters each shared block for
        its own keys (``assign_block``). Used by the distributed
        bootstrap, link admission and round commit."""
        futs = []
        for bundle in mat_ds.iter_internal_ref_bundles():
            for block_ref in bundle.block_refs:
                for shard in self.shards:
                    futs.append(
                        shard.assign_block.remote(
                            block_ref, self.num_shards, seq_col
                        )
                    )
        ray.get(futs)

    def snapshot_async(self, dir_path: str, mode: str = "full") -> list:
        """Submit the per-shard snapshot writes and return their
        futures WITHOUT blocking. Per-actor message ordering makes the
        snapshot a consistent post-round cut even while the next
        round's ``offer`` calls queue behind it; the caller must
        ``ray.get`` the futures before treating the round as durable
        (a half-written snapshot can only belong to an uncommitted
        round, which is never restored).

        ``mode="delta"`` writes only each shard's additions since its
        previous snapshot — O(round) IO instead of O(total seen);
        restore then needs the chain back to the last full snapshot
        (``restore_chain``). The crawl takes a full snapshot every
        ``snapshot_full_every`` rounds and deltas between."""
        os.makedirs(dir_path, exist_ok=True)
        futs = [
            s.snapshot.remote(os.path.join(dir_path, f"shard_{i}.npz"), mode)
            for i, s in enumerate(self.shards)
        ]
        tmp = os.path.join(dir_path, "_meta.tmp")
        with open(tmp, "w") as fh:
            fh.write(f"{self.next_surrogate}\n{mode}")
        os.replace(tmp, os.path.join(dir_path, "_meta"))
        return futs

    def snapshot(self, dir_path: str, mode: str = "full") -> None:
        ray.get(self.snapshot_async(dir_path, mode))

    def _read_meta(self, dir_path: str) -> int:
        with open(os.path.join(dir_path, "_meta")) as fh:
            return int(fh.read().split()[0])

    def restore(self, dir_path: str) -> None:
        ray.get(
            [
                s.restore.remote(os.path.join(dir_path, f"shard_{i}.npz"))
                for i, s in enumerate(self.shards)
            ]
        )
        self.next_surrogate = self._read_meta(dir_path)

    def restore_chain(self, dirs: list[str]) -> None:
        """Restore from a FULL snapshot followed by its delta snapshots
        in round order; ``next_surrogate`` comes from the last link."""
        self.restore(dirs[0])
        for d in dirs[1:]:
            ray.get(
                [
                    s.apply_delta.remote(os.path.join(d, f"shard_{i}.npz"))
                    for i, s in enumerate(self.shards)
                ]
            )
        self.next_surrogate = self._read_meta(dirs[-1])

    def to_table(self) -> pa.Table:
        """Full (key, surrogate, first_seq) table, sorted by surrogate.
        Test/summary scale only (materializes every shard)."""
        t = pa.concat_tables(ray.get([s.dump.remote() for s in self.shards]))
        return t.sort_by("surrogate")
