"""North-rule oracle: the distributed crawl must reproduce the crawl
ordering, URL-seen set and surrogate assignment of a straight-line
SEQUENTIAL crawler given the same seed list + politeness budget.

The simulator below is deliberately independent code: plain dicts and
lists, no Ray, no shared helpers beyond the pure scalar functions
(canonicalize / murmur3 / parse) — so a distributed-coordination bug
(ordering, dedup races, budget slips) cannot cancel out.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from vat_abcd_crawler_ray.config import Settings
from vat_abcd_crawler_ray.functions.extract import parse_abcd
from vat_abcd_crawler_ray.functions.fields import FieldRegistry
from vat_abcd_crawler_ray.functions.urlkeys import (
    canonicalize_url,
    host_of,
    murmur3_64,
)
from vat_abcd_crawler_ray.pipelines.crawl import CrawlRun, _read_parquet_dir
from vat_abcd_crawler_ray.sources.synthetic import corpus_dir

LINK_FIELD = "/DataSets/DataSet/Units/Unit/RecordURI"


def sequential_crawl(corpus: str, max_rounds: int = 64):
    """Single-threaded reference crawl. Returns (fetch_log, seen)."""
    pages = {
        r["url"]: r["html"]
        for r in pq.read_table(
            os.path.join(corpus, "pages.parquet"), columns=["url", "html"]
        ).to_pylist()
    }
    pol = pq.read_table(os.path.join(corpus, "politeness.parquet")).to_pylist()
    budgets = {r["host"]: r["max_fetches_per_round"] for r in pol}
    robots = {r["host"]: r["robots_disallow_prefix"] for r in pol}
    seeds = pq.read_table(os.path.join(corpus, "seeds.parquet")).to_pylist()
    reg = FieldRegistry()

    seen: dict[int, tuple[int, int]] = {}  # key -> (surrogate, first_seq)
    next_surrogate = 1
    next_seq = max(s["seq"] for s in seeds) + 1

    # round-0 admission: min-seq per canonical key, dense by first_seq
    by_key: dict[int, dict] = {}
    for s in sorted(seeds, key=lambda r: r["seq"]):
        canon = canonicalize_url(s["url"])
        key = murmur3_64(canon)
        if key not in by_key:
            by_key[key] = {
                "canonical_url": canon,
                "key": key,
                "host": host_of(canon),
                "priority": s["priority"],
                "seq": s["seq"],
            }
    for e in sorted(by_key.values(), key=lambda r: r["seq"]):
        seen[e["key"]] = (next_surrogate, e["seq"])
        e["surrogate"] = next_surrogate
        next_surrogate += 1
    frontier = list(by_key.values())

    fetch_log = []  # (round, url, surrogate, seq)
    for rnd in range(max_rounds):
        if not frontier:
            break
        # robots gate
        alive = []
        for e in frontier:
            pre = robots.get(e["host"], "")
            path = e["canonical_url"].split("://", 1)[1]
            path = path[path.find("/"):] if "/" in path else ""
            if pre and path.startswith(pre):
                continue
            alive.append(e)
        # per-host budget selection: (priority desc, seq asc)
        alive.sort(key=lambda e: (-e["priority"], e["seq"]))
        taken: dict[str, int] = {}
        winners, deferred = [], []
        for e in alive:
            b = budgets.get(e["host"], 8)
            if taken.get(e["host"], 0) < b:
                taken[e["host"]] = taken.get(e["host"], 0) + 1
                winners.append(e)
            else:
                deferred.append(e)
        if not winners:
            break
        # fetch + extract + discover, in seq order within the round
        discovered = []
        for e in sorted(winners, key=lambda w: w["seq"]):
            html = pages.get(e["canonical_url"])
            if html is None:
                continue  # miss (dead-letter)
            fetch_log.append((rnd, e["canonical_url"], e["surrogate"], e["seq"]))
            try:
                res = parse_abcd(html, reg)
            except ValueError:
                continue
            li = 0
            for unit in res.units:
                link = unit.get(LINK_FIELD)
                if isinstance(link, str):
                    discovered.append((e["seq"], li, link, e["priority"] * 0.5))
                    li += 1
        # admission: child seqs dense in (parent_seq, link_idx) order
        discovered.sort(key=lambda t: (t[0], t[1]))
        new_frontier = []
        roundkeys = set()
        for pseq, li, link, prio in discovered:
            canon = canonicalize_url(link)
            key = murmur3_64(canon)
            if key in seen or key in roundkeys:
                continue
            roundkeys.add(key)
            new_frontier.append(
                {
                    "canonical_url": canon,
                    "key": key,
                    "host": host_of(canon),
                    "priority": prio,
                    "seq": next_seq,
                }
            )
            next_seq += 1
        for e in sorted(new_frontier, key=lambda r: r["seq"]):
            seen[e["key"]] = (next_surrogate, e["seq"])
            e["surrogate"] = next_surrogate
            next_surrogate += 1
        frontier = deferred + new_frontier
    return fetch_log, seen


@pytest.mark.usefixtures("ray_session")
def test_distributed_crawl_matches_sequential_reference(tmp_path):
    corpus = corpus_dir("/root/testdata/sf0.001")
    seq_log, seq_seen = sequential_crawl(corpus)

    run = CrawlRun(
        f"{corpus}/pages.parquet",
        f"{corpus}/seeds.parquet",
        f"{corpus}/politeness.parquet",
        str(tmp_path / "run"),
    )
    run.run()

    # seen set: identical keys, surrogates, first_seqs
    dist_seen = run.seen.to_table().to_pandas()
    seq_df = (
        pd.DataFrame(
            [(k, v[0], v[1]) for k, v in seq_seen.items()],
            columns=["key", "surrogate", "first_seq"],
        )
        .sort_values("surrogate")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        dist_seen[["key", "surrogate", "first_seq"]], seq_df
    )

    # fetch log: same (round, url, surrogate, seq) set and order
    base = os.path.join(str(tmp_path / "run"), "staging", "extracted")
    frames = []
    for rnd in sorted(os.listdir(base)):
        # fetched = dataset rows + parse-error rows (both were fetched);
        # fetch-miss errors were never fetched
        for kind in ("dataset", "error"):
            d = os.path.join(base, rnd, f"record_type={kind}")
            if os.path.isdir(d):
                df = _read_parquet_dir(
                    d, columns=["url", "surrogate", "seq", "round", "error_kind"]
                )
                if kind == "error" and "error_kind" in df.columns:
                    df = df[df["error_kind"] != "FetchMiss"]
                frames.append(df[["url", "surrogate", "seq", "round"]])
    dist_log = (
        pd.concat(frames, ignore_index=True)
        .sort_values(["round", "seq"])
        .reset_index(drop=True)
    )
    seq_log_df = pd.DataFrame(
        seq_log, columns=["round", "url", "surrogate", "seq"]
    ).sort_values(["round", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        dist_log[["round", "url", "surrogate", "seq"]].astype(
            {"round": "int64", "surrogate": "int64", "seq": "int64"}
        ),
        seq_log_df.astype({"round": "int64", "surrogate": "int64", "seq": "int64"}),
    )
