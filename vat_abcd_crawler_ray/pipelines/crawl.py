"""The flagship crawl pipeline (SURVEY §3.4): rounds of
frontier → politeness selection → fetch → extract → link discovery →
seen-set commit → staged Parquet + lineage manifest.

Maps the reference's sequential harvest loop
(``/root/reference/src/main.rs:141-275``) onto Ray Data rounds:

| reference                          | here                                |
|------------------------------------|-------------------------------------|
| catalog scroll → Vec<Entry>        | seed parquet → frontier round 0     |
| surrogate-key dedup (T1)           | sharded seen-set actors, min-seq    |
| sequential per-dataset loop        | per-host budgeted rounds            |
| FileDownloader + cache recovery    | fetch = url lookup in the pages     |
|                                    | table; misses → dead-letter rows    |
| AbcdParser per XML                 | ExtractStage actor pool             |
| COPY into temp schema              | staged parquet per round            |
| schema swap                        | MANIFEST.json atomic rename         |

Determinism: every ordering decision keys on explicit ``(priority desc,
seq)`` — seq is carried in rows and assigned densely at admission
(never wall-clock), so two runs over the same seed list + politeness
budget produce identical fetch order, seen-set and surrogates
(north_rule).

Selection has two equivalent implementations (tested identical):

- **driver** — vectorized pandas over the round's frontier; fastest
  below ~2M rows/round (no shuffle). Rounds are PIPELINED: the next
  round's backlog read + per-host ordering runs as a remote
  pre-selection task during this round's extract/project
  (``_preselect_backlog`` — exact by the winner-superset lemma), and
  the admitted links stay in memory, so the per-round serial path
  sorts only (politeness-bounded candidates ∪ new links) instead of
  re-reading and re-sorting the whole accumulated frontier.
- **distributed** — the scale path: per-``(host, salt)`` budget-cap
  inside ``groupby.map_groups`` (salt = ``key % salt_buckets`` splits
  mega-host groups), ONE streaming write partitioned by outcome, then a
  per-``host`` reduce over the ≤ ``salt_buckets × budget`` survivors.
  Deferred rows are renamed (not rewritten) into the next round's
  frontier directory.

Resume: every round commit records outputs + a seen-set snapshot; a
restarted run replays from the first uncommitted round.

Driver-memory bound: the per-round WINNER set (and the fetch meta
built from it) is POLITENESS-BOUNDED — at most Σ(per-host budget) rows
per round regardless of frontier or corpus size (a 10^10-URL frontier
with 10^5 hosts × budget 100 still selects ≤ 10^7 winners/round) — so
holding it as a driver frame is a config-bounded cost, not a
data-scaled one. The unbounded collections (frontier, links, extracted
rows, seen set) never materialize on the driver: frontier stays on
disk / in Datasets, links arrive pre-deduplicated per projection task
and above the admission auto-gate never leave the object store
(``_admit_distributed``), extracted blocks are written and projected
remotely, and the seen set lives in shard actors. Every gated stage
(bootstrap, selection, admission, seen-set round commit) has a driver
fast path for sandbox-sized rounds and a distributed scale path
proved identical by tests — including all four forced distributed at
once against the sequential oracle.
"""

from __future__ import annotations

import os
import shutil
import sys
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import Settings
from ..functions.urlkeys import canonicalize_batch, hosts_batch, url_keys_batch
from ..stages.extract import ExtractStage, RECORD_ERROR
from ..state.manifest import RunManifest
from ..state.seen_set import ShardedSeenSet

from time import perf_counter as _now

FRONTIER_COLS = [
    "url",
    "canonical_url",
    "key",
    "host",
    "priority",
    "seq",
    "surrogate",
]

# typed empty frontier block — the fused admission/bootstrap finalize
# emits it for schemaless empty inputs (sort/shuffle ops produce
# them), so every output block carries the same schema and Ray never
# logs a block-schema-mismatch warning
_EMPTY_FRONTIER = pa.table(
    {
        "url": pa.array([], pa.string()),
        "canonical_url": pa.array([], pa.string()),
        "key": pa.array([], pa.int64()),
        "host": pa.array([], pa.string()),
        "priority": pa.array([], pa.float64()),
        "seq": pa.array([], pa.int64()),
        "surrogate": pa.array([], pa.int64()),
    }
)


def keyed_frontier_batch(batch: pa.Table) -> pa.Table:
    """url → (canonical_url, key, host)."""
    urls = batch["url"].to_pylist()
    canon = canonicalize_batch(urls)
    return (
        batch.append_column("canonical_url", pa.array(canon, pa.string()))
        .append_column("key", pa.array(url_keys_batch(canon)))
        .append_column("host", pa.array(hosts_batch(canon), pa.string()))
    )


_key_frontier_chunk = ray.remote(num_cpus=1)(keyed_frontier_batch)


def _count_parquet_rows(path: str) -> int:
    """Row count of a parquet file or every parquet file under a
    directory — footer metadata only, no data pages read."""
    if os.path.isfile(path):
        return pq.ParquetFile(path).metadata.num_rows
    return sum(
        pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def _read_parquet_dir(d: str, columns: list[str] | None = None) -> pd.DataFrame:
    parts = []
    for root, _dirs, files in os.walk(d):
        for f in sorted(files):
            if f.endswith(".parquet"):
                parts.append(pq.read_table(os.path.join(root, f), columns=columns))
    if not parts:
        return pd.DataFrame(columns=columns or [])
    return pa.concat_tables(parts, promote_options="default").to_pandas()


def _robots_denied(df: pd.DataFrame, robots: dict) -> np.ndarray:
    """True = denied: the host's disallow prefix is a prefix of the
    canonical path (robots gate, S1 admission level). Vectorized by
    DISTINCT prefix — rows without a robots rule (the vast majority)
    never enter a Python loop, and the loop that remains is over the
    handful of distinct disallow prefixes, not over rows."""
    denied = np.zeros(len(df), dtype=bool)
    if not robots or not len(df):
        return denied
    prefix = df["host"].map(robots).fillna("")
    nz = prefix.to_numpy() != ""
    if not nz.any():
        return denied
    paths = df["canonical_url"].str.replace(
        r"^[a-z][a-z0-9+.-]*://[^/]*", "", regex=True
    )
    sub_paths = paths[nz]
    sub_pre = prefix[nz]
    sub_denied = np.zeros(len(sub_paths), dtype=bool)
    for p, pos in sub_pre.groupby(sub_pre, sort=False).indices.items():
        sub_denied[pos] = sub_paths.iloc[pos].str.startswith(p).to_numpy()
    denied[nz] = sub_denied
    return denied


# ordv = parent_seq * SCALE + link_idx packs the (seq, link_idx)
# discovery order into ONE int64 (link_idx < link_cap_per_page ≤ 2^20
# by config, validated at CrawlRun construction) — a single sort key
# for first-wins dedup in both admission modes
LINK_ORD_SCALE = 1 << 20


def _project_tables(prio_lookup, *tables: pa.Table):
    """Round projection core over extracted tables: returns
    (fetched-url table, deduped link table, raw link count, kept link
    count). Shared by the remote block projection
    (:func:`_project_round_blocks`, scan/http fetch modes) and the
    fused fetch→extract→project chunk task
    (:func:`_extract_project_chunk`, store mode).

    The link table carries its admission sort key ``ordv`` and the
    child ``priority`` (0.5 × parent priority, resolved here from the
    politeness-bounded winner map ``prio_lookup`` = (sorted parent
    seqs, parent priorities), shipped once per round via ``ray.put``)
    — so neither admission mode needs a later pass to attach them.
    """
    wseqs, wprio = prio_lookup
    gots, links = [], []
    for t in tables:
        got_mask = pc.is_in(
            t["record_type"], value_set=pa.array(["dataset", RECORD_ERROR])
        )
        gots.append(t.filter(got_mask).select(["url"]))
        lt = t.filter(pc.equal(t["record_type"], "link"))
        seqs = lt["seq"].to_numpy(zero_copy_only=False)
        idxs = lt["link_idx"].to_numpy(zero_copy_only=False)
        ordv = seqs * LINK_ORD_SCALE + idxs
        if len(wseqs):
            pos = np.minimum(
                np.searchsorted(wseqs, seqs), len(wseqs) - 1
            )
            prio = np.where(wseqs[pos] == seqs, wprio[pos], 0.0) * 0.5
        else:
            prio = np.zeros(len(seqs), dtype=np.float64)
        links.append(
            pa.table(
                {
                    "link_url": lt["link_url"],
                    "canonical_url": lt["link_canonical"],
                    "key": lt["link_key"],
                    "host": lt["link_host"],
                    "ordv": pa.array(ordv),
                    "priority": pa.array(prio),
                }
            )
        )
    got_t = pa.concat_tables(gots)
    link_t = pa.concat_tables(links)
    n_raw = link_t.num_rows  # pre-dedup discovery count (the metric)
    # partial key-dedup REMOTELY (min ordv per key — min of per-task
    # mins is the global min, so the driver's final dedup sees only
    # each task's survivors instead of every duplicate discovery)
    if link_t.num_rows:
        order = np.argsort(
            link_t["ordv"].to_numpy(zero_copy_only=False), kind="stable"
        )
        keys = link_t["key"].to_numpy(zero_copy_only=False)[order]
        first = ~pd.Series(keys).duplicated().to_numpy()
        link_t = link_t.take(pa.array(order[first], pa.int64()))
    return got_t, link_t, n_raw, link_t.num_rows


@ray.remote(num_cpus=0.5, num_returns=4)
def _project_round_blocks(prio_lookup, *tables: pa.Table):
    """Remote wrapper over :func:`_project_tables` for a GROUP of
    pinned extracted blocks (scan/http fetch modes): the driver always
    pulls the small url table and the two counts, but the link table
    ref is only pulled in driver admission mode; distributed admission
    feeds the refs straight into ``ray.data.from_arrow_refs`` so the
    link volume never crosses the driver. Blocks are grouped
    several-per-task so the per-round task count (and its scheduling
    latency) stays small."""
    return _project_tables(prio_lookup, *tables)


@ray.remote(num_cpus=1, num_returns=5)
def _extract_project_chunk(stage, prio_lookup, batch_size: int, pages: pa.Table):
    """FUSED fetch-chunk worker (store mode): one plain task takes a
    page-store chunk (its ref resolves as the task arg, so extraction
    starts the moment the shard's fetch lands — no Dataset execution,
    no block accounting, no separate projection wave), parses it in
    ``batch_size`` slices (the wide-binary-row bound the map_batches
    path used), and projects the result in-place. Returns (extracted
    table, fetched-url table, link table, raw link count, kept link
    count) as FIVE refs — the extracted ref feeds only the write
    tasks; the driver pulls urls + counts; link refs follow the
    admission mode exactly like the block-projection path.

    This is VERDICT r4 #2: the per-round serial path previously paid a
    full Dataset execution (extract) plus a blocking projection wave —
    two chained fixed costs a short round cannot amortize."""
    parts = [
        stage(pages.slice(off, batch_size))
        for off in range(0, pages.num_rows, batch_size)
    ]
    if not parts:
        parts = [stage(pages)]  # empty chunk: typed empty table
    ext = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
    got_t, link_t, n_raw, n_kept = _project_tables(prio_lookup, ext)
    return ext, got_t, link_t, n_raw, n_kept


@ray.remote(num_cpus=1)
def _write_round_blocks(out_dir: str, task_idx: int, *tables: pa.Table) -> int:
    """Write a group of extracted blocks as hive-partitioned parquet
    (``record_type=X/part-{task_idx}.parquet``, partition column
    dropped from the files — the same layout ``write_parquet(
    partition_cols=...)`` produces). Submitted as plain tasks so the
    round's write IO runs CONCURRENTLY with link admission and the
    next round's selection; the deferred manifest commit joins the
    futures before the round becomes durable.

    ``num_cpus=1``, not fractional: zstd compression burns a full
    core, and declaring 0.5 let the scheduler co-locate 2× writers
    per slot — invisible oversubscription that stole real cores from
    the NEXT round's extract/projection tasks they overlap with
    (measured as multi-second nondeterministic inflation of those
    phases at 32 CPUs)."""
    t = pa.concat_tables(tables)
    written = 0
    for rt in pc.unique(t["record_type"]).to_pylist():
        sub = t.filter(pc.equal(t["record_type"], rt)).drop_columns(
            ["record_type"]
        )
        d = os.path.join(out_dir, f"record_type={rt}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            sub, os.path.join(d, f"part-{task_idx:05d}.parquet"),
            compression="zstd",
        )
        written += sub.num_rows
    return written


@ray.remote(num_cpus=1, num_returns=2)
def _preselect_backlog(
    rest_files: list[str],
    losers: pa.Table,
    budgets: dict,
    default_budget: int,
    out_dir: str,
):
    """NEXT-round frontier pre-selection, run remotely DURING the
    current round's extract/project (the round-pipelining that removes
    the per-round frontier read + sort from the driver's serial path).

    backlog = on-disk ``rest`` files (prior pre-selections' remainders)
    ∪ ``losers`` (the current round's selection losers). Split it per
    host by the same (priority desc, seq) ordering the selection uses:

    - ``cand``  = per-host top-budget — returned to the driver.
      Exactness lemma: winners(backlog ∪ links) = winners(cand ∪
      links), because any backlog row OUTSIDE its host's top-budget
      already has ≥ budget same-host backlog rows ranked ahead of it,
      so it cannot win the next round whatever links are added.
      cand is politeness-bounded (≤ Σ per-host budgets), so shipping
      it to the driver is a config-bounded cost.
    - ``rest``  = the remainder, written to ``out_dir``.

    Both halves are ALSO written into the next round's frontier dir,
    so the on-disk frontier stays the complete, authoritative replay /
    resume source — the pre-selection is a cached computation, never
    the only copy. Robots rules are NOT re-applied: every backlog row
    already passed the selection robots gate in the round that
    deferred it (links are checked before they can become losers), so
    the backlog is robots-clean by invariant.
    """
    parts = [pq.read_table(f, columns=FRONTIER_COLS) for f in rest_files]
    if losers.num_rows:
        parts.append(losers.select(FRONTIER_COLS))
    backlog = pa.concat_tables(parts, promote_options="default").to_pandas()
    ordered = backlog.sort_values(
        ["priority", "seq"], ascending=[False, True], kind="mergesort"
    )
    rank = ordered.groupby("host", sort=False).cumcount()
    budget = ordered["host"].map(budgets).fillna(default_budget).astype(np.int64)
    mask = (rank < budget).to_numpy()
    cand = ordered[mask]
    rest = ordered[~mask]
    os.makedirs(out_dir, exist_ok=True)
    cand_t = pa.Table.from_pandas(cand[FRONTIER_COLS], preserve_index=False)
    pq.write_table(cand_t, os.path.join(out_dir, "cand.parquet"))
    if len(rest):
        pq.write_table(
            pa.Table.from_pandas(rest[FRONTIER_COLS], preserve_index=False),
            os.path.join(out_dir, "rest.parquet"),
        )
    return cand_t, len(rest)


@dataclass
class CrawlMetrics:
    rounds: int = 0
    fetched: int = 0
    fetch_misses: int = 0
    datasets: int = 0
    units: int = 0
    links_discovered: int = 0
    links_admitted: int = 0
    errors: int = 0
    robots_denied: int = 0
    per_round: list = field(default_factory=list)

    def as_dict(self) -> dict:
        return dict(self.__dict__)


class CrawlRun:
    """One resumable crawl over (pages, seeds, politeness) parquet."""

    def __init__(
        self,
        pages_path: str,
        seeds_path: str,
        politeness_path: str,
        run_dir: str,
        settings: Settings | None = None,
        select_mode: str = "auto",  # auto | driver | distributed
        fetch_mode: str = "store",  # store | scan | http
        bootstrap_mode: str = "auto",  # auto | driver | distributed
        admission_mode: str = "auto",  # auto | driver | distributed
        http_opener=None,  # fetch_mode="http": opener(url)->(status, bytes)
    ):
        self.pages_path = pages_path
        self.seeds_path = seeds_path
        self.settings = settings or Settings()
        self.run_dir = run_dir
        self.select_mode = select_mode
        self.fetch_mode = fetch_mode
        self.bootstrap_mode = bootstrap_mode
        self.admission_mode = admission_mode
        self.http_opener = http_opener
        self._page_store = None
        self.manifest = RunManifest(run_dir)
        cc = self.settings.crawl
        self.seen = ShardedSeenSet(
            cc.num_seen_shards,
            cc.seen_capacity_per_shard,
            ram_cap_per_shard=cc.seen_ram_cap_per_shard or None,
            spill_dir=(
                os.path.join(run_dir, "seen_spill")
                if cc.seen_ram_cap_per_shard
                else None
            ),
        )
        self.metrics = CrawlMetrics()
        self.next_seq = 0

        pol = pq.read_table(politeness_path).to_pydict()
        self.budgets = dict(zip(pol["host"], pol["max_fetches_per_round"]))
        self.robots = dict(zip(pol["host"], pol["robots_disallow_prefix"]))
        self.default_budget = cc.default_host_budget
        self._stage: ExtractStage | None = None
        self._stage_put = None  # ray.put(ExtractStage), once per run
        self._pending_commit: tuple | None = None
        self.phase_times: list[dict] = []
        # round-pipelining state: the in-flight backlog pre-selection
        # ([cand_ref, rest_count_ref], submitted before extract so it
        # overlaps it), the previous round's admitted links kept in
        # memory, and the force-full-read flag set when a distributed
        # stage wrote next-frontier rows the driver never saw
        self._preselect: list | None = None
        self._next_links = None  # pa.Table | pd.DataFrame | None
        self._full_read_next = False

    def _extract_stage(self) -> ExtractStage:
        if self._stage is None:
            self._stage = ExtractStage(self.settings)
        return self._stage

    def _stage_ref(self):
        """The extract stage in the object store, put ONCE per run —
        every fused chunk task reads the same copy (no per-task
        registry pickle)."""
        if self._stage_put is None:
            self._stage_put = ray.put(self._extract_stage())
        return self._stage_put

    # ---------------- paths ----------------
    def _p(self, *parts: str) -> str:
        return os.path.join(self.manifest.staging, *parts)

    def frontier_dir(self, rnd: int) -> str:
        return self._p("frontier", f"round={rnd}")

    def extracted_dir(self, rnd: int) -> str:
        return self._p("extracted", f"round={rnd}")

    def seen_dir(self, rnd: int) -> str:
        return self._p("seen", f"round={rnd}")

    # ---------------- bootstrap ----------------
    def _bootstrap(self) -> None:
        """Seeds → canonical keys → seen-set round-0 admission → frontier 0.

        Admission order = seed ``seq`` (catalog order in the reference,
        ``search_result.rs:88-111``; dense numbering
        ``surrogate_key.rs:16-41``).

        Two equivalent implementations (tested identical, like
        selection): **driver** (vectorized pandas; fastest for seed
        lists that fit one machine) and **distributed** (the 10^10-URL
        scale path: groupby-min + hash join + global sort as Dataset
        ops; no full-seed driver DataFrame anywhere). ``auto`` switches
        on the seed row count; the C1 debug window is driver-only by
        definition (it is a bounded debug knob)."""
        mode = self.bootstrap_mode
        if mode == "auto":
            mode = (
                "distributed"
                if _count_parquet_rows(self.seeds_path) > 2_000_000
                else "driver"
            )
        if self.settings.debug:
            mode = "driver"
        if mode == "distributed":
            self._bootstrap_distributed()
            return
        # plain keying tasks over slices of the seed table (driver
        # mode: the seed list fits here by the gate above) — the
        # canonicalize+murmur3 Python work still fans across the
        # cluster, but without a Dataset execution's fixed startup on
        # the run's serial path (VERDICT r4 #2: every chained
        # execution was a measured per-run tax)
        _dbg = os.environ.get("VAT_CRAWL_TIMERS")
        _td = _now()
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        seed_t = pq.read_table(self.seeds_path)  # file or directory
        nchunks = max(1, min(2 * ncpu, seed_t.num_rows // 2048 or 1))
        size = -(-seed_t.num_rows // nchunks)
        refs = [
            _key_frontier_chunk.remote(seed_t.slice(off, size))
            for off in range(0, seed_t.num_rows, size)
        ]
        sdf = pa.concat_tables(ray.get(refs)).to_pandas()
        if _dbg:
            print(f"[boot] key_seeds {_now()-_td:.2f}s ({len(sdf)} seeds, "
                  f"{nchunks} chunks)", file=sys.stderr)
            _td = _now()
        # C1 debug window: skip(dataset_start).take(dataset_limit), only
        # when debug is on (/root/reference/src/main.rs:154-169)
        if self.settings.debug:
            sdf = sdf.sort_values("seq", kind="mergesort")
            start = self.settings.dataset_start
            limit = self.settings.dataset_limit
            sdf = sdf.iloc[start : start + limit if limit else None]
        self.seen.offer_batch(sdf["key"].to_numpy(), sdf["seq"].to_numpy())
        if _dbg:
            print(f"[boot] offer {_now()-_td:.2f}s", file=sys.stderr)
            _td = _now()
        admitted = self.seen.commit_round().to_pandas()
        if _dbg:
            print(f"[boot] commit {_now()-_td:.2f}s", file=sys.stderr)
            _td = _now()
        # next_seq counts ALL seeds (pre-dedup max), matching the
        # sequential reference's `max(s['seq'] for s in seeds) + 1` even
        # when the highest-seq seed is a non-canonical duplicate form
        self.next_seq = int(sdf["seq"].max()) + 1 if len(sdf) else 0
        sdf = sdf.sort_values("seq", kind="mergesort").drop_duplicates("key")
        frontier = sdf.merge(admitted[["key", "surrogate"]], on="key", how="inner")
        self._write_frontier(frontier[FRONTIER_COLS], 0, "seeds")
        if _dbg:
            print(f"[boot] merge+write {_now()-_td:.2f}s "
                  f"({len(frontier)} rows)", file=sys.stderr)
        # hand round 0 its frontier in memory (the disk copy above
        # stays the replay source) — the round-pipelined selection
        # then never re-reads the directory the driver just wrote;
        # robots are checked at selection, as for any link frontier
        self._next_links = frontier[FRONTIER_COLS]

    def _bootstrap_distributed(self) -> None:
        """Streaming round-0 admission, no driver materialization of
        the seed rows — two Dataset executions total (round 3 used
        five: materialize + max + groupby shuffle + semi probe +
        sort/zip):

        1. read + canonicalize + key, materialized ONCE (exec 1);
        2. first-wins per canonical key via
           :func:`ops.firstwins.winner_vals_gated` over the seed
           blocks — per-block partial (key, min/max seq) tasks next to
           the data (``next_seq`` falls out of the partial maxes with
           no separate Dataset ``max()``), then below the driver gate
           a small combine whose sorted winning-seq array is broadcast
           once; seqs are globally unique, so a winner's dense rank in
           that array IS its position after a global ``sort(seq)``,
           and surrogate = 1 + rank — identical numbering to the
           sequential reference (``surrogate_key.rs:16-41``);
        3. filter + rank + surrogate fuse into one ``map_batches``
           pass over the seed blocks (exec 2). Above the gate, the
           round-3 spine (distributed groupby over the PARTIALS →
           semi join → sort + zip_with_index) takes over;
        4. Dataset ``write_parquet`` into the round-0 frontier dir;
        5. seen-set load: each frontier BLOCK is shipped once to the
           object store and every shard actor filters its own keys
           (``assign_block``) — driver traffic is O(num_blocks) refs.
        """
        from ..ops.firstwins import rank_in, winner_vals_gated

        seeds = (
            ray.data.read_parquet(self.seeds_path)
            .map_batches(keyed_frontier_batch, batch_format="pyarrow")
            .materialize()  # consumed twice: partial-min tasks, finalize
        )
        seed_refs = [
            block_ref
            for bundle in seeds.iter_internal_ref_bundles()
            for block_ref in bundle.block_refs
        ]
        win, stats, partial_refs = winner_vals_gated(
            seed_refs, key="key", val="seq"
        )
        if stats["raw_rows"] == 0:
            return
        self.next_seq = stats["vmax"] + 1
        if win is not None:
            win_ref = ray.put(win)

            def finalize(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "seq" not in t.column_names:
                    return _EMPTY_FRONTIER
                keep, rank = rank_in(
                    ray.get(win_ref),
                    t["seq"].to_numpy(zero_copy_only=False),
                )
                t = t.take(pa.array(keep, pa.int64()))
                return t.append_column(
                    "surrogate", pa.array(1 + rank)
                ).select(FRONTIER_COLS)

            frontier = (
                ray.data.from_arrow_refs(seed_refs)
                .map_batches(finalize, batch_format="pyarrow", batch_size=None)
                .materialize()
            )
        else:
            from ray.data.aggregate import Min

            from ..ops.joins import semi_join_keys
            from ..ops.zip_with_index import zip_with_index

            firsts = (
                ray.data.from_arrow_refs(partial_refs)
                .groupby("key")
                .aggregate(Min("seq", alias_name="first_seq"))
            )
            # winner rows = rows whose seq is its key's min; seqs are
            # globally UNIQUE, so a semi join on the winning-seq set
            # is exactly the (key, min_seq) join — auto-gated
            # broadcast↔bucketed, never Dataset.join (whose blocking
            # actor pool measured 45 s on 160k seeds)
            reps = semi_join_keys(
                seeds,
                firsts.map_batches(
                    lambda t: t.select(["first_seq"]).rename_columns(["seq"]),
                    batch_format="pyarrow",
                ),
                on="seq",
            )
            frontier = (
                zip_with_index(reps.sort("seq"), "surrogate", start=1)
                .select_columns(FRONTIER_COLS)
                .materialize()
            )
        os.makedirs(self.frontier_dir(0), exist_ok=True)
        frontier.write_parquet(self.frontier_dir(0))
        self.seen.load_assigned_blocks(frontier)
        self.seen.next_surrogate = 1 + frontier.count()

    def _write_frontier(self, frame, rnd: int, tag: str) -> None:
        """``frame`` is a pandas DataFrame or an Arrow table; columns
        are projected to FRONTIER_COLS order either way."""
        if len(frame) == 0:
            return
        if isinstance(frame, pa.Table):
            t = frame.select(FRONTIER_COLS)
        else:
            t = pa.Table.from_pandas(frame[FRONTIER_COLS], preserve_index=False)
        os.makedirs(self.frontier_dir(rnd), exist_ok=True)
        pq.write_table(t, os.path.join(self.frontier_dir(rnd), f"{tag}.parquet"))

    # ---------------- selection ----------------
    def _budget_of(self, hosts: pd.Series) -> pd.Series:
        return hosts.map(self.budgets).fillna(self.default_budget).astype(np.int64)

    def _robots_mask(self, df: pd.DataFrame) -> np.ndarray:
        """True = denied. Prefix match of the canonical path against the
        host's disallow prefix (robots gate; frontier admission level)."""
        return _robots_denied(df, self.robots)

    def _select_driver(self, frontier: pd.DataFrame):
        """Vectorized single-machine selection (identical semantics to
        the distributed path — see tests/test_crawl.py)."""
        denied = self._robots_mask(frontier)
        n_denied = int(denied.sum())
        frontier = frontier[~denied]
        if frontier.empty:
            return frontier, frontier, n_denied
        ordered = frontier.sort_values(
            ["priority", "seq"], ascending=[False, True], kind="mergesort"
        )
        rank = ordered.groupby("host", sort=False).cumcount()
        budget = self._budget_of(ordered["host"])
        winners_mask = (rank < budget).to_numpy()
        return ordered[winners_mask], ordered[~winners_mask], n_denied

    def _select_distributed(self, rnd: int, n_front: int):
        """Scale path: salted two-stage per-host top-k over the frontier
        as a Dataset; the full frontier is read and written exactly once.

        Stage 1 caps each ``(host, salt)`` group at the host budget — a
        correct superset of the per-host top-budget — and streams ALL
        rows out partitioned by outcome (``cand=true|false``); deferred
        files are later renamed into the next round's frontier. Stage 2
        reduces the ≤ salt_buckets × budget candidates per host.
        """
        cc = self.settings.crawl
        salt_buckets = cc.salt_buckets

        frontier_ds = ray.data.read_parquet(self.frontier_dir(rnd))

        robots = self.robots

        def robots_and_salt(batch: pd.DataFrame) -> pd.DataFrame:
            """Drop robots-denied rows, add the skew salt — vectorized,
            one pass, no per-row filter."""
            batch = batch[~_robots_denied(batch, robots)]
            return batch.assign(
                __salt=(batch["key"].to_numpy() % salt_buckets).astype(np.int32)
            )

        budgets, default_budget = self.budgets, self.default_budget

        def stage1(group: pd.DataFrame) -> pd.DataFrame:
            b = int(budgets.get(group["host"].iloc[0], default_budget))
            g = group.sort_values(
                ["priority", "seq"], ascending=[False, True], kind="mergesort"
            )
            cand = np.zeros(len(g), dtype=bool)
            cand[:b] = True
            return g.assign(cand=cand)

        marked = (
            frontier_ds.map_batches(robots_and_salt, batch_format="pandas")
            .groupby(["host", "__salt"])
            .map_groups(stage1, batch_format="pandas")
        )
        sel_dir = self._p("select", f"round={rnd}")
        marked.drop_columns(["__salt"]).write_parquet(
            sel_dir, partition_cols=["cand"]
        )
        # robots-denied rows are exactly the frontier rows that
        # robots_and_salt dropped: frontier size minus what was written
        # (both counts are footer metadata — no extra pass, and the two
        # selection modes now report identical metrics)
        n_denied = n_front - _count_parquet_rows(sel_dir)

        cand_df = _read_parquet_dir(os.path.join(sel_dir, "cand=true"))
        if cand_df.empty:
            return cand_df, os.path.join(sel_dir, "cand=false"), n_denied

        # stage 2: exact per-host top-budget over the candidate superset
        ordered = cand_df.sort_values(
            ["priority", "seq"], ascending=[False, True], kind="mergesort"
        )
        rank = ordered.groupby("host", sort=False).cumcount()
        budget = self._budget_of(ordered["host"])
        mask = (rank < budget).to_numpy()
        winners = ordered[mask]
        demoted = ordered[~mask]
        # demoted candidates join the deferred partition on disk
        if len(demoted):
            dd = os.path.join(sel_dir, "cand=false")
            os.makedirs(dd, exist_ok=True)
            pq.write_table(
                pa.Table.from_pandas(
                    demoted.drop(columns=["cand"], errors="ignore"),
                    preserve_index=False,
                ),
                os.path.join(dd, "demoted.parquet"),
            )
        return winners, os.path.join(sel_dir, "cand=false"), n_denied

    # ---------------- fetch ----------------
    @staticmethod
    def _fetch_meta(winners: pd.DataFrame, rnd: int) -> pd.DataFrame:
        meta = winners[["canonical_url", "surrogate", "seq", "priority"]].rename(
            columns={"canonical_url": "url"}
        )
        return meta.assign(round=np.int64(rnd))

    def _fetch(self, winners: pd.DataFrame, rnd: int) -> "ray.data.Dataset":
        """Simulated network fetch (S3,
        ``/root/reference/src/file_downloader.rs:8-29``): O(K) lookups
        against the sharded in-memory page store (state/page_store.py),
        loaded ONCE per crawl — never a per-round corpus scan. Fallback
        ``fetch_mode="scan"`` keeps the one-shot ``isin``-pushdown read
        for store-less runs."""
        meta = self._fetch_meta(winners, rnd)

        if self.fetch_mode == "http":
            # the real-network tier (stages/fetch.py): task-pool fetch
            # with retry/backoff/status classes; failed fetches flow to
            # the extract stage as NULL bodies → dead-letter rows.
            # Politeness holds because the selection already capped
            # each host's rows this round.
            from ..stages.fetch import HttpFetchStage, urllib_opener_factory

            if self.http_opener is None:
                # production wiring: a stdlib urllib opener built from
                # the crawl config (tests inject an in-memory opener;
                # this sandbox has no network, so the default is only
                # exercised in real deployments)
                self.http_opener = urllib_opener_factory(
                    timeout_s=self.settings.crawl.http_timeout_s,
                    user_agent=self.settings.crawl.http_user_agent,
                )
            ds = ray.data.from_arrow(pa.Table.from_pandas(meta, preserve_index=False))
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            nblocks = max(1, min(4 * ncpu, len(meta) // 64))
            if nblocks > 1:
                ds = ds.repartition(nblocks)  # meta rows are tiny
            cc = self.settings.crawl
            return ds.map_batches(
                HttpFetchStage(
                    self.http_opener,
                    max_concurrency=cc.http_fetch_concurrency,
                    per_host_delay_s=cc.http_per_host_delay_s,
                ),
                batch_format="pyarrow",
                batch_size=64,
            )

        if self.fetch_mode == "scan":
            pages = ray.data.read_parquet(
                self.pages_path,
                columns=["url", "html", "lang", "warc_ts"],
                filter=pc.field("url").isin(meta["url"].tolist()),
            )
            meta_ref = ray.put(meta)

            def attach(batch: pd.DataFrame) -> pd.DataFrame:
                return batch.merge(ray.get(meta_ref), on="url", how="inner")

            return pages.map_batches(attach, batch_format="pandas")

        return ray.data.from_arrow_refs(self._fetch_store_refs(meta))

    def _fetch_store_refs(self, meta: pd.DataFrame) -> list:
        """Store-mode fetch as a list of chunk REFS (one per shard
        chunk) — the fused round path feeds each straight into an
        :func:`_extract_project_chunk` task without a Dataset."""
        if self._page_store is None:
            from ..state.page_store import get_page_store

            self._page_store = get_page_store(
                self.pages_path, self.settings.crawl.num_page_shards
            )
        # Driver-side shard routing, k url-chunks per shard per round:
        # each chunk call returns pages WITH the fetch meta columns
        # joined in-actor (Arrow take + append — the earlier
        # repartition + per-batch pandas merge moved the whole round's
        # pages twice and halved big-round throughput). The chunk count
        # targets ~2 blocks per CPU so the downstream extract uses the
        # whole cluster; the shard results become dataset blocks
        # directly (from_arrow_refs, no extra copies). Never call
        # ray.get on the store from inside map tasks — blocked workers
        # made Ray spawn replacement processes (observed 56 workers on
        # an 8-CPU cluster: hidden oversubscription).
        store = self._page_store
        urls = meta["url"].to_numpy()
        shard_ids = store.shard_of(list(urls))
        meta_t = pa.Table.from_pandas(meta, preserve_index=False)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        # chunk count per shard PROPORTIONAL to its url share (the
        # range-sharded store concentrates mega-host urls in a few
        # shards; equal per-shard chunking left straggler blocks) —
        # target ≈ 2 equal blocks per CPU overall
        total = len(urls)
        refs = []
        for sid in np.unique(shard_ids):
            sel = np.flatnonzero(shard_ids == sid)
            nchunks = max(1, round(2 * ncpu * len(sel) / max(1, total)))
            for chunk in np.array_split(sel, min(nchunks, len(sel))):
                if not len(chunk):
                    continue
                refs.append(
                    store.shards[int(sid)].get_with_meta.remote(
                        [urls[i] for i in chunk],
                        meta_t.take(pa.array(chunk, pa.int64())),
                    )
                )
        return refs

    # ---------------- one round ----------------
    def _round(self, rnd: int) -> bool:
        cc = self.settings.crawl
        fdir = self.frontier_dir(rnd)
        # round-pipelining hand-off from the previous round: the
        # overlapped backlog pre-selection (its cand/rest files are
        # durable once the get returns) and the in-memory link frontier
        pre = self._preselect
        links_mem = self._next_links
        full_read = self._full_read_next
        self._preselect = None
        self._next_links = None
        self._full_read_next = False
        phase_t: dict[str, float] = {}
        t0 = _now()
        pre_cand: pa.Table | None = None
        rest_cnt = 0
        if pre is not None:
            pre_cand = ray.get(pre[0])  # usually instant: ran during
            rest_cnt = int(ray.get(pre[1]))  # the prior round's extract
        have_mem = (pre is not None or links_mem is not None) and not full_read
        if not have_mem and not os.path.isdir(fdir):
            return False

        # a replayed (crashed, uncommitted) round must not APPEND to its
        # half-written outputs — the round commit is all-or-nothing (C3)
        shutil.rmtree(self.extracted_dir(rnd), ignore_errors=True)
        shutil.rmtree(self._p("select", f"round={rnd}"), ignore_errors=True)
        shutil.rmtree(self.frontier_dir(rnd + 1), ignore_errors=True)

        if have_mem:
            # counts known without touching the frontier dir (the dir
            # holds exactly cand + rest + links — the same rows)
            n_front = (
                (pre_cand.num_rows if pre_cand is not None else 0)
                + rest_cnt
                + (len(links_mem) if links_mem is not None else 0)
            )
            if n_front == 0:
                return False
        else:
            n_front = _count_parquet_rows(fdir)
        mode = self.select_mode
        if mode == "auto":
            mode = "distributed" if n_front > 2_000_000 else "driver"

        deferred_path = None
        used_mem = False
        if mode == "driver":
            if have_mem:
                parts = []
                if pre_cand is not None and pre_cand.num_rows:
                    parts.append(pre_cand.to_pandas())
                if links_mem is not None and len(links_mem):
                    ldf = (
                        links_mem.to_pandas()
                        if isinstance(links_mem, pa.Table)
                        else links_mem
                    )
                    parts.append(ldf[FRONTIER_COLS])
                if parts:
                    frontier = pd.concat(parts, ignore_index=True)
                    used_mem = True
                else:
                    # degenerate: non-empty backlog but empty cand
                    # (zero-budget hosts) — fall back to the full read
                    # so the spin-until-max_rounds semantics match the
                    # non-pipelined path exactly
                    frontier = _read_parquet_dir(fdir)
            else:
                frontier = _read_parquet_dir(fdir)
            if frontier.empty:
                return False
            winners, deferred, n_denied = self._select_driver(frontier)
            self.metrics.robots_denied += n_denied
        else:
            winners, deferred_path, n_denied = self._select_distributed(rnd, n_front)
            deferred = None
            self.metrics.robots_denied += n_denied
            if winners.empty and not os.path.isdir(deferred_path):
                return False

        # submit the NEXT round's backlog pre-selection NOW, before
        # fetch/extract start, so its frontier read + per-host sort
        # runs concurrently with them (driver mode only — the
        # distributed path defers via file renames instead)
        if mode == "driver":
            rest_files = []
            if used_mem and pre is not None:
                rf = os.path.join(fdir, "rest.parquet")
                if os.path.isfile(rf):
                    rest_files.append(rf)
            backlog_rows = len(deferred) + (rest_cnt if used_mem else 0)
            if backlog_rows:
                losers_t = pa.Table.from_pandas(
                    deferred[FRONTIER_COLS], preserve_index=False
                )
                self._preselect = _preselect_backlog.remote(
                    rest_files,
                    losers_t,
                    self.budgets,
                    self.default_budget,
                    self.frontier_dir(rnd + 1),
                )
                deferred = None  # written by the preselect task

        out_dir = self.extracted_dir(rnd)
        n_fetched = n_miss = 0
        # links is an Arrow table once winners produce one, else None —
        # the admission guard below tests `.num_rows`, so the empty
        # sentinel must be None, never an empty pandas frame
        links = None
        link_refs: list = []
        n_links_raw = n_links_kept = 0
        write_futs: list = []
        # selection (driver parquet read + sort, or the distributed
        # Dataset path) was untimed through round 2 — it is the largest
        # per-round serial term at big round sizes, so it gets its own
        # budget line
        phase_t["select"] = _now() - t0
        t0 = _now()
        if not winners.empty:
            # winner (seq → priority) lookup for child-link priorities,
            # sorted for the projections' searchsorted; put ONCE per
            # round (top-level ObjectRef args auto-deref in the task)
            worder = np.argsort(winners["seq"].to_numpy(), kind="stable")
            prio_ref = ray.put(
                (
                    winners["seq"].to_numpy()[worder],
                    winners["priority"].to_numpy()[worder],
                )
            )
            if self.fetch_mode == "store":
                # FUSED path (VERDICT r4 #2): each page-store chunk ref
                # feeds one plain _extract_project_chunk task — fetch →
                # extract → project pipeline per chunk with NO Dataset
                # execution and no separate projection wave; the two
                # chained fixed costs of the old path (execution
                # startup + blocking projection round trip) are gone.
                fetch_refs = self._fetch_store_refs(
                    self._fetch_meta(winners, rnd)
                )
                futs = [
                    _extract_project_chunk.remote(
                        self._stage_ref(), prio_ref, cc.batch_size, ref
                    )
                    for ref in fetch_refs
                ]
                blocks = [f[0] for f in futs]
                # EAGER write submission: each writer becomes runnable
                # the moment its 8 chunks land, so zstd IO overlaps the
                # extraction tail instead of starting after the full
                # count pull — measured commit_wait 7.6 → 3.5 s on a
                # contended disk, extract time unchanged (the extract
                # tasks were submitted first and stay ahead in queue)
                os.makedirs(out_dir, exist_ok=True)
                write_futs = [
                    _write_round_blocks.remote(out_dir, wi, *blocks[i : i + 8])
                    for wi, i in enumerate(range(0, len(blocks), 8))
                ]
                got_tbls = [
                    g for g in ray.get([f[1] for f in futs]) if g.num_rows
                ]
                link_refs = [f[2] for f in futs]
                n_links_raw = sum(ray.get([f[3] for f in futs]))
                n_links_kept = sum(ray.get([f[4] for f in futs]))
                phase_t["extract"] = _now() - t0  # fused fetch+extract
                t0 = _now()
                phase_t["project"] = 0.0  # fused into extract above
            else:
                fetched = self._fetch(winners, rnd)
                # ONE parse execution per round, pinned via
                # materialize(); the parquet write and the links /
                # fetched-url projections below re-read the pinned
                # blocks — no reparse, and no driver read-back of
                # hundreds of small part files (which measurably
                # anti-scaled with cluster size).
                extracted = fetched.map_batches(
                    self._extract_stage(),
                    batch_format="pyarrow",
                    batch_size=cc.batch_size,
                ).materialize()
                phase_t["extract"] = _now() - t0
                t0 = _now()

                # Remote grouped projections straight off the pinned
                # blocks: plain Ray tasks (no second Dataset execution —
                # each execution's flat startup cost was a measured
                # per-round tax), and the driver receives ONLY the small
                # (url, link) projections, never the full extracted
                # blocks. The driver BLOCKS on the counts, so the
                # projections own the whole cluster — the CPU-heavy
                # zstd write tasks are submitted only after they
                # resolve.
                blocks = []
                for bundle in extracted.iter_internal_ref_bundles():
                    for block_ref in bundle.block_refs:
                        blocks.append(block_ref)
                futs = [
                    _project_round_blocks.remote(prio_ref, *blocks[i : i + 8])
                    for i in range(0, len(blocks), 8)
                ]
                got_tbls = [
                    g for g in ray.get([f[0] for f in futs]) if g.num_rows
                ]
                link_refs = [f[1] for f in futs]
                n_links_raw = sum(ray.get([f[2] for f in futs]))
                n_links_kept = sum(ray.get([f[3] for f in futs]))
                phase_t["project"] = _now() - t0
                t0 = _now()
            # Writes leave the critical path entirely: grouped write
            # tasks (8 blocks each — a handful of concurrent zstd
            # writers; 64 snappy writers measurably thrashed the ONE
            # shared sandbox disk) run through admission and the next
            # round's selection/extract; the deferred commit joins them
            # (a full round of slack) before the round is durable
            # (uncommitted rounds replay on resume, so a crash
            # mid-write is safe). Submitted AFTER the projection
            # ray.get: the projections are the round's critical path,
            # and interleaving long zstd tasks into the same 2·CPU task
            # slots measurably stretched the project phase.
            if not write_futs:  # non-store path: submit after projections
                os.makedirs(out_dir, exist_ok=True)
                write_futs = [
                    _write_round_blocks.remote(out_dir, wi, *blocks[i : i + 8])
                    for wi, i in enumerate(range(0, len(blocks), 8))
                ]
            phase_t["write_submit"] = _now() - t0
            t0 = _now()

            # miss = winners whose url produced no dataset/error record.
            # Arrow is_in over the fetched-url table — the old Python
            # ``set(to_pylist())`` + pandas .isin built ~rounds×10^5
            # PyObjects on the driver's serial path
            if got_tbls:
                hit = pc.is_in(
                    pa.array(winners["canonical_url"], pa.string()),
                    value_set=pa.concat_tables(got_tbls)["url"].combine_chunks(),
                )
                miss_mask = pc.invert(hit).to_numpy(zero_copy_only=False)
            else:
                miss_mask = np.ones(len(winners), dtype=bool)
            miss = winners[miss_mask]
            n_miss = len(miss)
            n_fetched = len(winners) - n_miss
            if n_miss:
                miss_t = pa.table(
                    {
                        "record_type": pa.array([RECORD_ERROR] * n_miss),
                        "url": pa.array(miss["canonical_url"].tolist()),
                        "surrogate": pa.array(miss["surrogate"].to_numpy()),
                        "seq": pa.array(miss["seq"].to_numpy()),
                        "round": pa.array(np.full(n_miss, rnd, dtype=np.int64)),
                        "error_kind": pa.array(["FetchMiss"] * n_miss),
                        "error_message": pa.array(["url not in page store"] * n_miss),
                    }
                )
                miss_dir = os.path.join(out_dir, "record_type=error")
                os.makedirs(miss_dir, exist_ok=True)
                pq.write_table(miss_t, os.path.join(miss_dir, "misses.parquet"))

        # ---- link admission (deterministic child seqs, then seen-filter)
        # Two equivalent implementations (tested identical, like
        # selection/bootstrap): **driver** — numpy/Arrow over the
        # pre-deduplicated link survivors (bounded by winners ×
        # link_cap_per_page); **distributed** — the scale path: the
        # link refs become a Dataset, first-wins is a groupby-min +
        # join, the seen anti-filter runs shard-parallel over shared
        # blocks, child seq/surrogate assignment is a sort +
        # zip_with_index, and the next frontier is Dataset-written.
        # ``auto`` switches on the surviving link count, so no
        # data-proportional ray.get remains once rounds grow.
        admitted_rows = 0
        new_frontier = pd.DataFrame(columns=FRONTIER_COLS)
        links_written = False
        amode = self.admission_mode
        if amode == "auto":
            amode = "distributed" if n_links_kept > 2_000_000 else "driver"
        if n_links_kept and amode == "distributed":
            self.metrics.links_discovered += n_links_raw
            admitted_rows = self._admit_distributed(link_refs, rnd)
            links_written = admitted_rows > 0
            self.seen.commit_round()  # parity: clears (empty) pending state
        elif n_links_kept:
            _dbg = os.environ.get("VAT_CRAWL_TIMERS")
            _td = _now()
            links = pa.concat_tables(
                [l for l in ray.get(link_refs) if l.num_rows]
            )
            if _dbg:
                print(f"[adm r{rnd}] get_links {_now()-_td:.2f}s "
                      f"({links.num_rows} rows)", file=sys.stderr)
                _td = _now()
            self.metrics.links_discovered += n_links_raw
            key_a = links["key"].to_numpy(zero_copy_only=False)
            # ordv packs (seq, link_idx), globally unique — ONE sort key
            order = np.argsort(
                links["ordv"].to_numpy(zero_copy_only=False), kind="stable"
            )
            first = ~pd.Series(key_a[order]).duplicated().to_numpy()
            cand_idx = order[first]
            ck = key_a[cand_idx]
            if _dbg:
                print(f"[adm r{rnd}] dedup {_now()-_td:.2f}s", file=sys.stderr)
                _td = _now()
            # a sequential crawler only numbers NOVEL urls — filter
            # against the committed seen set BEFORE consuming seqs, so
            # the seq/surrogate sequence is identical to the
            # single-threaded reference (tests/test_crawl_vs_sequential)
            known = self.seen.lookup(ck) >= 0
            cand_idx, ck = cand_idx[~known], ck[~known]
            if _dbg:
                print(f"[adm r{rnd}] seen_lookup {_now()-_td:.2f}s "
                      f"({len(ck)} novel)", file=sys.stderr)
                _td = _now()
            child_seq = np.arange(
                self.next_seq, self.next_seq + len(ck), dtype=np.int64
            )
            self.next_seq += len(ck)
            base_surr = self.seen.next_surrogate
            fresh = self.seen.offer_batch(ck, child_seq)
            cand_idx, ck, child_seq = cand_idx[fresh], ck[fresh], child_seq[fresh]
            admitted_t = self.seen.commit_round()
            admitted_rows = admitted_t.num_rows
            if _dbg:
                print(f"[adm r{rnd}] offer+commit {_now()-_td:.2f}s "
                      f"({admitted_rows} admitted)", file=sys.stderr)
                _td = _now()
            if admitted_rows:
                # child priority was resolved inside the projection
                # tasks (0.5 x parent) — no winner-map pass here
                cand_t = links.select(
                    ["link_url", "canonical_url", "host", "priority"]
                ).take(pa.array(cand_idx, pa.int64()))
                prio = cand_t["priority"]
                if admitted_rows == len(ck):
                    # the (provably always) common case: every offered
                    # key was admitted, and commit assigns surrogates
                    # densely in first_seq (= child_seq) order, so
                    # surrogate_i = base_surr + i — the old 6-column
                    # pandas merge was an identity mapping; build the
                    # frontier Arrow-native, no pandas round trip
                    new_frontier = pa.table(
                        {
                            "url": cand_t["link_url"],
                            "canonical_url": cand_t["canonical_url"],
                            "key": pa.array(ck),
                            "host": cand_t["host"],
                            "priority": prio,
                            "seq": pa.array(child_seq),
                            "surrogate": pa.array(
                                base_surr
                                + np.arange(len(ck), dtype=np.int64)
                            ),
                        }
                    )
                else:  # defensive fallback: join on (key, child_seq)
                    admitted = admitted_t.to_pandas()
                    cand = pd.DataFrame(
                        {
                            "url": cand_t["link_url"].to_pandas(),
                            "canonical_url": cand_t["canonical_url"].to_pandas(),
                            "key": ck,
                            "host": cand_t["host"].to_pandas(),
                            "child_seq": child_seq,
                            "priority": prio.to_numpy(zero_copy_only=False),
                        }
                    )
                    nf = cand.merge(
                        admitted.rename(columns={"first_seq": "child_seq"}),
                        on=["key", "child_seq"],
                        how="inner",
                    )
                    new_frontier = pd.DataFrame(
                        {
                            "url": nf["url"],
                            "canonical_url": nf["canonical_url"],
                            "key": nf["key"],
                            "host": nf["host"],
                            "priority": nf["priority"],
                            "seq": nf["child_seq"],
                            "surrogate": nf["surrogate"],
                        }
                    )
        else:
            self.seen.commit_round()  # clears shard pending state

        # ---- build next frontier
        has_next = False
        if deferred is not None and len(deferred):
            self._write_frontier(deferred[FRONTIER_COLS], rnd + 1, "deferred")
            has_next = True
        if deferred_path and os.path.isdir(deferred_path):
            # rename, don't rewrite, the deferred partition files
            os.makedirs(self.frontier_dir(rnd + 1), exist_ok=True)
            moved = 0
            for f in sorted(os.listdir(deferred_path)):
                if f.endswith(".parquet"):
                    os.rename(
                        os.path.join(deferred_path, f),
                        os.path.join(self.frontier_dir(rnd + 1), f"def-{f}"),
                    )
                    moved += 1
            has_next = has_next or moved > 0
        if len(new_frontier):
            _tf = _now()
            self._write_frontier(new_frontier, rnd + 1, "links")
            if os.environ.get("VAT_CRAWL_TIMERS"):
                print(f"[adm r{rnd}] frontier_write {_now()-_tf:.2f}s "
                      f"({len(new_frontier)} rows)", file=sys.stderr)
            has_next = True
            if mode == "driver":
                # keep the admitted links in memory for the next
                # round's pipelined selection (the disk copy above
                # stays the replay/resume source of truth); under
                # distributed SELECT the deferred rename above put
                # rows on disk the driver never saw, so memory-mode
                # selection must not engage next round
                self._next_links = new_frontier
        has_next = has_next or links_written  # distributed admission wrote
        if links_written:
            # distributed admission wrote next-frontier links straight
            # from Datasets — the next round must read the dir in full
            self._full_read_next = True
        has_next = has_next or self._preselect is not None

        phase_t["admission"] = _now() - t0
        # round N's shard snapshots run in the background through all of
        # round N+1 (actor message order makes them a consistent cut);
        # the manifest commit waits for them at the NEXT round's commit
        # point, so the per-round serial path carries neither the
        # snapshot IO nor the commit fsync.
        self._flush_pending_commit()  # its wait is recorded as the
        # PREVIOUS round's commit_wait (inside the flush) — timing it
        # here too would double-count it under "snapshot"
        t0 = _now()
        snap_mode = "full" if rnd % cc.snapshot_full_every == 0 else "delta"
        snap_futs = (
            self.seen.snapshot_async(self.seen_dir(rnd), snap_mode) + write_futs
        )
        if self._preselect is not None:
            # this round's commit must not land before the pipelined
            # pre-selection's cand/rest frontier files are durable —
            # a committed round implies its successor's frontier dir
            # is complete (the resume contract)
            snap_futs = snap_futs + list(self._preselect)
        phase_t["snapshot"] = _now() - t0
        self.metrics.rounds = rnd + 1
        self.metrics.fetched += n_fetched
        self.metrics.fetch_misses += n_miss
        self.metrics.links_admitted += admitted_rows
        self.metrics.per_round.append(
            {
                "round": rnd,
                "frontier": int(n_front),
                "selected": int(len(winners)),
                "fetched": int(n_fetched),
                "misses": int(n_miss),
                "links_admitted": int(admitted_rows),
            }
        )
        # wall times live OUTSIDE metrics (metrics must be bit-equal
        # across identical runs — the determinism contract)
        self.phase_times.append(
            {"round": rnd, **{k: round(v, 3) for k, v in phase_t.items()}}
        )
        self._pending_commit = (
            snap_futs,
            rnd,
            {
                "frontier_dir": fdir,
                "extracted_dir": out_dir,
                "seen_snapshot": self.seen_dir(rnd),
                "seen_snapshot_mode": snap_mode,
                "next_seq": self.next_seq,
                "next_surrogate": self.seen.next_surrogate,
                "stats": self.metrics.per_round[-1],
                "phase_sec": self.phase_times[-1],
            },
        )
        return has_next

    # ---------------- distributed link admission ----------------
    _LINK_ORD_SCALE = LINK_ORD_SCALE  # ordv = parent_seq * SCALE + link_idx

    def _admit_distributed(self, link_refs: list, rnd: int) -> int:
        """Scale-path link admission — the distributed mirror of the
        driver branch, built from the same pieces as the bootstrap.
        The projection tasks already attached ``ordv`` (packed
        (parent_seq, link_idx) discovery order) and the child
        ``priority``, so the whole stage is FUSED to one Dataset
        execution plus one wave of partial-min tasks (round 3 used
        three chained executions — groupby shuffle, semi-join probe,
        sort + zip_with_index — each execution's flat startup cost a
        measured per-round tax at sandbox sizes):

        1. seen anti-filter FIRST, as plain shard-parallel tasks over
           the projection refs (every shard extracts its own unseen
           rows from each shared block — no Dataset execution at all);
           filtering before first-wins is equivalent because seen-ness
           is a per-key property, and it shrinks every later stage to
           the NOVEL links only (in a steady-state crawl most
           discoveries are already-seen);
        2. first-wins per canonical key via
           :func:`ops.firstwins.winner_vals_gated`: per-block partial
           mins next to the data, then — below the driver gate — a
           small (key, ordv) combine whose SORTED winning-ordv array
           is broadcast once; ordv is globally unique, so a winner's
           dense rank in that array IS its position after the old
           path's global sort, and
        3. filter + rank + child seq/surrogate assignment fuse into a
           single ``map_batches`` pass over the novel blocks (the ONE
           Dataset execution) — identical numbering to the driver
           path, no shuffle, no sort, no zip_with_index;
        4. the next frontier is Dataset-written (a read-only pass over
           the pinned blocks); the seen shards ingest the same blocks
           via ``load_assigned_blocks``. Above the gate, the round-3
           spine (distributed groupby → semi join → sort + zip) takes
           over, fed the PARTIAL refs so even its shuffle moves only
           per-block-deduped (key, ordv) pairs.

        Returns the number of admitted links."""
        from ..ops.firstwins import rank_in, winner_vals_gated

        _dbg = os.environ.get("VAT_CRAWL_TIMERS")
        _td = _now()
        novel_refs = [
            shard.filter_unseen_block.remote(ref, self.seen.num_shards)
            for ref in link_refs
            for shard in self.seen.shards
        ]
        win, stats, partial_refs = winner_vals_gated(
            novel_refs, key="key", val="ordv"
        )
        if _dbg:
            print(
                f"[dadm r{rnd}] unseen+partials {_now()-_td:.2f}s "
                f"({stats['raw_rows']} novel, {stats['partial_rows']} partial)",
                file=sys.stderr,
            )
            _td = _now()
        base_seq, base_surr = self.next_seq, self.seen.next_surrogate
        if win is not None:
            win_ref = ray.put(win)

            def finalize(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "ordv" not in t.column_names:
                    return _EMPTY_FRONTIER
                keep, rank = rank_in(
                    ray.get(win_ref),
                    t["ordv"].to_numpy(zero_copy_only=False),
                )
                t = t.take(pa.array(keep, pa.int64()))
                return pa.table(
                    {
                        "url": t["link_url"],
                        "canonical_url": t["canonical_url"],
                        "key": t["key"],
                        "host": t["host"],
                        "priority": t["priority"],
                        "seq": pa.array(base_seq + rank),
                        "surrogate": pa.array(base_surr + rank),
                    }
                )

            frontier = (
                ray.data.from_arrow_refs(novel_refs)
                .map_batches(finalize, batch_format="pyarrow", batch_size=None)
                .materialize()
            )
        else:
            frontier = self._first_wins_fallback(
                novel_refs, partial_refs, "ordv", base_seq, base_surr
            )
        if _dbg:
            print(f"[dadm r{rnd}] finalize {_now()-_td:.2f}s", file=sys.stderr)
            _td = _now()
        n = frontier.count()
        if n:
            os.makedirs(self.frontier_dir(rnd + 1), exist_ok=True)
            frontier.write_parquet(self.frontier_dir(rnd + 1))
            self.seen.load_assigned_blocks(frontier)
            self.next_seq = base_seq + n
            self.seen.next_surrogate = base_surr + n
        if _dbg:
            print(f"[dadm r{rnd}] write+load {_now()-_td:.2f}s ({n} rows)",
                  file=sys.stderr)
        return n

    def _first_wins_fallback(
        self, novel_refs: list, partial_refs: list, val: str,
        base_seq: int, base_surr: int,
    ) -> "ray.data.Dataset":
        """Above-gate admission first-wins — the round-3 distributed
        spine (groupby-min → gated semi join on the winning-val set →
        global sort + zip_with_index → finalize), now fed the PARTIAL
        (key, val) refs so its shuffle moves per-block-deduped pairs
        instead of one row per raw discovery. Taken only when the
        round's unique-key partial volume exceeds the driver gate
        (10^7+ novel keys per round)."""
        from ray.data.aggregate import Min

        from ..ops.joins import semi_join_keys
        from ..ops.zip_with_index import zip_with_index

        firsts = (
            ray.data.from_arrow_refs(partial_refs)
            .groupby("key")
            .aggregate(Min(val, alias_name="first_val"))
        )
        unseen = semi_join_keys(
            ray.data.from_arrow_refs(novel_refs),
            firsts.map_batches(
                lambda t: t.select(["first_val"]).rename_columns([val]),
                batch_format="pyarrow",
            ),
            on=val,
        )

        def finalize(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "rank" not in t.column_names:
                return _EMPTY_FRONTIER
            rank = t["rank"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "url": t["link_url"],
                    "canonical_url": t["canonical_url"],
                    "key": t["key"],
                    "host": t["host"],
                    "priority": t["priority"],
                    "seq": pa.array(base_seq + rank),
                    "surrogate": pa.array(base_surr + rank),
                }
            )

        return (
            zip_with_index(unseen.sort(val), "rank", start=0)
            .map_batches(finalize, batch_format="pyarrow")
            .materialize()
        )

    def _flush_pending_commit(self) -> None:
        if self._pending_commit is None:
            return
        futs, rnd, info = self._pending_commit
        self._pending_commit = None
        t0 = _now()
        ray.get(futs)  # snapshot + writes durable before the commit
        # the real write/snapshot wall time, recorded where the futures
        # are actually joined (phase "write_submit" is submission only)
        info["phase_sec"]["commit_wait"] = round(_now() - t0, 3)
        self.manifest.commit_round(rnd, info)

    # ---------------- top-level ----------------
    def run(self, resume: bool = False) -> CrawlMetrics:
        # "setup" and "final" phase records bracket the per-round ones
        # so wall ≈ Σ phases (the per-round table alone left page-store
        # decode, seed bootstrap and the final commit untracked — ~30%
        # of a 3-round sandbox run's wall)
        t_setup = _now()
        if self.fetch_mode == "store" and self._page_store is None:
            # kick off shard decode now — it overlaps seed bootstrap
            # (PageStore construction no longer blocks on shard init)
            from ..state.page_store import get_page_store

            self._page_store = get_page_store(
                self.pages_path, self.settings.crawl.num_page_shards
            )
        start_round = 0
        setup_kind = "bootstrap"
        if resume and self.manifest.last_complete_round() >= 0:
            setup_kind = "restore"  # manifest walk + seen-snapshot
            # reload — a different cost than seed bootstrap; keep the
            # phase telemetry BASELINE.md analyzes honest about which
            # one a run paid
            last = self.manifest.last_complete_round()
            info = self.manifest.round_info(last)
            # seen-set restore chain: walk back to the newest FULL
            # snapshot, then replay the deltas committed after it
            # (old manifests without the mode field are all-full)
            base = last
            while base > 0 and (
                self.manifest.round_info(base).get("seen_snapshot_mode", "full")
                != "full"
            ):
                base -= 1
            chain = [
                self.manifest.round_info(r)["seen_snapshot"]
                for r in range(base, last + 1)
            ]
            self.seen.restore_chain(chain)
            self.next_seq = info["next_seq"]
            start_round = last + 1
        else:
            self._bootstrap()
        self.phase_times.append(
            {"round": "setup", setup_kind: round(_now() - t_setup, 3)}
        )

        for rnd in range(start_round, self.settings.crawl.max_rounds):
            if not self._round(rnd):
                break
        self._flush_pending_commit()  # wait lands in the last round's
        # commit_wait (recorded inside the flush), keeping Σ additive
        t_final = _now()

        self._count_outputs()
        self.manifest.finalize(
            tables={
                "extracted": self._p("extracted"),
                "frontier": self._p("frontier"),
            },
            metrics=self.metrics.as_dict(),
        )
        self.phase_times.append(
            {"round": "final", "final_commit": round(_now() - t_final, 3)}
        )
        return self.metrics

    def _count_outputs(self) -> None:
        base = self._p("extracted")
        if not os.path.isdir(base):
            return
        counts: dict[str, int] = {}
        for rnd_dir in os.listdir(base):
            for part in os.listdir(os.path.join(base, rnd_dir)):
                if not part.startswith("record_type="):
                    continue
                kind = part.split("=", 1)[1]
                d = os.path.join(base, rnd_dir, part)
                n = sum(
                    pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                )
                counts[kind] = counts.get(kind, 0) + n
        self.metrics.datasets = counts.get("dataset", 0)
        self.metrics.units = counts.get("unit", 0)
        self.metrics.errors = counts.get("error", 0)


def extracted_dataset(run_dir: str, record_type: str) -> "ray.data.Dataset":
    """Read one logical output table of a (published) run."""
    base = os.path.join(run_dir, "staging", "extracted")
    dirs = [
        os.path.join(base, rnd, f"record_type={record_type}")
        for rnd in sorted(os.listdir(base))
    ]
    files = [
        os.path.join(d, f)
        for d in dirs
        if os.path.isdir(d)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not files:
        raise FileNotFoundError(f"no {record_type} output under {base}")
    return ray.data.read_parquet(files)
