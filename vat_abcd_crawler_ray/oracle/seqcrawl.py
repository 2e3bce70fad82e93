"""Sequential crawl ORACLE — the independent single-threaded reference
implementation the distributed crawl is graded against.

This is deliberately straight-line code: plain dicts and lists, no Ray,
no shared logic with ``pipelines/crawl.py`` beyond the pure scalar
functions (canonicalize / murmur3 / parse) — so a distributed
coordination bug (ordering, dedup races, budget slips, round-commit
errors) cannot cancel out. It models the reference's synchronous
harvest loop (``/root/reference/src/main.rs:141-275``) extended with
the frontier semantics (per-host budgets, robots gate, link
admission with dense child seqs).

:func:`write_expected_tables` runs the simulator over a corpus and
writes the three final crawl tables (datasets / listing / errors) as
parquet; ``__ray_entry__.oracle_sql`` points DuckDB at those files, so
the driver's correctness gate can diff the distributed crawl against
this oracle (the crawl trio was rows-only in round 1).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import Settings
from ..functions.extract import (
    AbcdNoDatasetMetadata,
    AbcdParseError,
    format_vat_value,
    parse_abcd,
    propose_landing_page,
)
from ..functions.fields import LATITUDE_PATH, LONGITUDE_PATH, FieldRegistry
from ..functions.urlkeys import canonicalize_url, host_of, murmur3_64

import re

# identical to pipelines/crawl.py's robots path strip (the regex is a
# shared CONSTANT of the url grammar, not shared engine logic)
_ROBOTS_PATH_RE = re.compile(r"^[a-z][a-z0-9+.-]*://[^/]*")

LINK_FIELD = "/DataSets/DataSet/Units/Unit/RecordURI"
TITLE_PATH = "/DataSets/DataSet/Metadata/Description/Representation/Title"
UNIT_ID_PATH = "/DataSets/DataSet/Units/Unit/UnitID"
SPECIES_PATH = (
    "/DataSets/DataSet/Units/Unit/Identifications/Identification/Result"
    "/TaxonIdentified/ScientificName/FullScientificNameString"
)


def sequential_crawl(corpus: str, max_rounds: int = 64):
    """Single-threaded reference crawl.

    Returns ``(fetch_log, seen, datasets, listing, errors, units)``
    where fetch_log is ``[(round, url, surrogate, seq), …]``, seen is
    ``{key: (surrogate, first_seq)}`` and the rest are row-dict lists
    shaped exactly like the engine's final output tables.
    """
    settings = Settings()
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
    link_cap = settings.crawl.link_cap_per_page
    default_budget = settings.crawl.default_host_budget

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
    datasets: list[dict] = []
    listing: list[dict] = []
    errors: list[dict] = []
    units: list[dict] = []
    for rnd in range(max_rounds):
        if not frontier:
            break
        # robots gate — path derivation mirrors the engine EXACTLY
        # (strip `scheme://` plus everything up to the first '/', keep
        # the remainder; a query-only URL like 'https://h?x=1' yields
        # '' in both, never a divergent '?x=1')
        alive = []
        for e in frontier:
            pre = robots.get(e["host"], "")
            path = _ROBOTS_PATH_RE.sub("", e["canonical_url"])
            if pre and path.startswith(pre):
                continue
            alive.append(e)
        # per-host budget selection: (priority desc, seq asc)
        alive.sort(key=lambda e: (-e["priority"], e["seq"]))
        taken: dict[str, int] = {}
        winners, deferred = [], []
        for e in alive:
            b = budgets.get(e["host"], default_budget)
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
            url = e["canonical_url"]
            html = pages.get(url)
            if html is None:
                errors.append(
                    {
                        "url": url,
                        "surrogate": e["surrogate"],
                        "seq": e["seq"],
                        "round": rnd,
                        "error_kind": "FetchMiss",
                        "error_message": "url not in page store",
                    }
                )
                continue
            fetch_log.append((rnd, url, e["surrogate"], e["seq"]))
            try:
                res = parse_abcd(
                    html,
                    reg,
                    dataset_id=url,
                    dataset_path=url.split("://", 1)[-1].split("/", 1)[-1]
                    if "/" in url.split("://", 1)[-1]
                    else "",
                    landing_page_proposal=propose_landing_page(
                        settings.abcd.landingpage_url, url
                    ),
                    provider_name=host_of(url),
                    landing_page_field=settings.abcd.landing_page_field,
                )
            except (AbcdParseError, AbcdNoDatasetMetadata) as exc:
                errors.append(
                    {
                        "url": url,
                        "surrogate": e["surrogate"],
                        "seq": e["seq"],
                        "round": rnd,
                        "error_kind": type(exc).__name__,
                        "error_message": str(exc),
                    }
                )
                continue
            datasets.append(
                {
                    "surrogate": e["surrogate"],
                    "dataset_id": res.dataset_id,
                    "dataset_landing_page": res.landing_page,
                    "dataset_provider": res.provider_name,
                }
            )
            geo = any(
                u.get(LONGITUDE_PATH) is not None and u.get(LATITUDE_PATH) is not None
                for u in res.units
            )
            listing.append(
                {
                    "link": res.landing_page,
                    "dataset": res.dataset.get(TITLE_PATH),
                    "id": res.dataset_id,
                    "provider": res.provider_name,
                    "available": True,
                    "isGeoReferenced": geo,
                }
            )
            li = 0
            for unit in res.units:
                lon = unit.get(LONGITUDE_PATH)
                lat = unit.get(LATITUDE_PATH)
                geom = (
                    f"POINT({format_vat_value(lon)} {format_vat_value(lat)})"
                    if lon is not None and lat is not None
                    else None
                )
                units.append(
                    {
                        "surrogate": e["surrogate"],
                        "unit_id": unit.get(UNIT_ID_PATH),
                        "species": unit.get(SPECIES_PATH),
                        "lon": lon,
                        "lat": lat,
                        "geom_wkt": geom,
                    }
                )
                link = unit.get(LINK_FIELD)
                if isinstance(link, str) and li < link_cap:
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
    return fetch_log, seen, datasets, listing, errors, units


_DATASETS_SCHEMA = pa.schema(
    [
        ("surrogate", pa.int64()),
        ("dataset_id", pa.string()),
        ("dataset_landing_page", pa.string()),
        ("dataset_provider", pa.string()),
    ]
)
_LISTING_SCHEMA = pa.schema(
    [
        ("link", pa.string()),
        ("dataset", pa.string()),
        ("id", pa.string()),
        ("provider", pa.string()),
        ("available", pa.bool_()),
        ("isGeoReferenced", pa.bool_()),
    ]
)
_UNITS_SCHEMA = pa.schema(
    [
        ("surrogate", pa.int64()),
        ("unit_id", pa.string()),
        ("species", pa.string()),
        ("lon", pa.float64()),
        ("lat", pa.float64()),
        ("geom_wkt", pa.string()),
    ]
)
_ERRORS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("surrogate", pa.int64()),
        ("seq", pa.int64()),
        ("round", pa.int64()),
        ("error_kind", pa.string()),
        ("error_message", pa.string()),
    ]
)


def write_expected_tables(corpus: str, out_dir: str) -> None:
    """Run the sequential oracle over ``corpus`` and write
    datasets/listing/errors parquet under ``out_dir``."""
    _log, _seen, datasets, listing, errors, units = sequential_crawl(corpus)
    os.makedirs(out_dir, exist_ok=True)
    for name, rows, schema in [
        ("datasets", datasets, _DATASETS_SCHEMA),
        ("listing", listing, _LISTING_SCHEMA),
        ("errors", errors, _ERRORS_SCHEMA),
        ("units", units, _UNITS_SCHEMA),
    ]:
        t = pa.Table.from_pylist(rows, schema=schema)
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))


def expected_tables_dir(sf_dir: str) -> str:
    """Generate-once cache of the oracle tables for ``sf_dir``'s corpus
    (atomic rename, same pattern as sources/synthetic.corpus_dir)."""
    from ..sources.synthetic import corpus_dir

    corpus = corpus_dir(sf_dir)
    out = corpus.rstrip("/") + "_expected_v2"  # v2: + units table
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    tmp = out + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    write_expected_tables(corpus, tmp)
    with open(os.path.join(tmp, "_COMPLETE"), "w") as fh:
        fh.write("ok")
    if os.path.exists(out) and not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
    try:
        os.rename(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost an identical race
    return out
