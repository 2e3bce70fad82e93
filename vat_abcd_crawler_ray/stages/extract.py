"""Extract stage — actor-pool ``map_batches`` over fetched pages.

The T2 analog (``/root/reference/src/main.rs:152``: one parser instance
reused across files): the :class:`ExtractStage` callable class is an
actor pool — the field registry and settings load ONCE per actor in
``__init__``; ``__call__`` parses one Arrow batch of pages.

One input page row → (1 dataset row + N unit rows + L link rows) or
1 error row (soft, C2: ``src/main.rs:226-249`` warn-and-continue). The
stage emits a single tagged stream (``record_type`` ∈ dataset | unit |
link | error) with a sparse union schema; the sink partitions by
``record_type`` so one streaming pass feeds all four tables — no
mid-pipeline materialization, no second parse.

Units carry their page's ``surrogate`` (J1 parent/child propagation:
produced together, no shuffle — ``database_sink.rs:642-657``), plus a
``geom_wkt`` column built like the reference's ``POINT(lon lat)``
(M7, ``database_sink.rs:659-679``: only when both coords present).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import Settings
from ..functions.extract import (
    AbcdNoDatasetMetadata,
    AbcdParseError,
    format_vat_value,
    parse_abcd,
    propose_landing_page,
)
from ..functions.fields import (
    LATITUDE_PATH,
    LONGITUDE_PATH,
    FieldRegistry,
    FieldSpec,
)
from ..functions.urlkeys import host_of

RECORD_DATASET = "dataset"
RECORD_UNIT = "unit"
RECORD_LINK = "link"
RECORD_ERROR = "error"

LINK_FIELD = "/DataSets/DataSet/Units/Unit/RecordURI"

META_COLS: list[tuple[str, pa.DataType]] = [
    ("record_type", pa.string()),
    ("url", pa.string()),
    ("surrogate", pa.int64()),
    ("seq", pa.int64()),
    ("round", pa.int64()),
    ("dataset_id", pa.string()),
    ("dataset_path", pa.string()),
    ("dataset_landing_page", pa.string()),
    ("dataset_provider", pa.string()),
    ("abcd_version", pa.string()),
    ("geom_wkt", pa.string()),
    ("link_url", pa.string()),
    ("link_idx", pa.int64()),
    # link keying computed AT EMISSION inside the parallel parse task
    # (canonicalize + murmur3 + host) so no later stage or the driver
    # pays a serial keying pass over 10^5 links per round
    ("link_canonical", pa.string()),
    ("link_key", pa.int64()),
    ("link_host", pa.string()),
    ("error_kind", pa.string()),
    ("error_message", pa.string()),
]


def output_schema(registry: FieldRegistry) -> pa.Schema:
    cols = list(META_COLS) + [
        (f.name, pa.float64() if f.numeric else pa.string()) for f in registry
    ]
    return pa.schema(cols)


class ExtractStage:
    """map_batches(ExtractStage, batch_format="pyarrow", concurrency=N,
    batch_size=B) — B small (wide binary html rows)."""

    def __init__(
        self,
        settings: Settings | None = None,
        registry: FieldRegistry | None = None,
        result_hook=None,
    ):
        """``result_hook`` is the user-extension seam (SURVEY §2.8):
        a picklable ``AbcdResult -> AbcdResult`` callable applied to each
        successful parse before row emission (e.g. enrichment, redaction,
        custom landing-page policy)."""
        self.settings = settings or Settings()
        self.result_hook = result_hook
        ab = self.settings.abcd
        self.registry = registry or (
            FieldRegistry.from_json_file(ab.fields_file)
            if ab.fields_file
            else FieldRegistry()
        )
        self.landing_page_field = ab.landing_page_field
        self.landingpage_url = ab.landingpage_url
        self.link_cap = self.settings.crawl.link_cap_per_page
        self.schema = output_schema(self.registry)
        self._names = self.schema.names
        self._index = {n: i for i, n in enumerate(self._names)}

    def _blank_row(self) -> list:
        return [None] * len(self._names)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[list] = []
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        surrogates = (
            batch["surrogate"].to_pylist()
            if "surrogate" in batch.column_names
            else [None] * len(urls)
        )
        seqs = (
            batch["seq"].to_pylist()
            if "seq" in batch.column_names
            else [None] * len(urls)
        )
        rounds = (
            batch["round"].to_pylist()
            if "round" in batch.column_names
            else [None] * len(urls)
        )
        fetch_kinds = (
            batch["fetch_error_kind"].to_pylist()
            if "fetch_error_kind" in batch.column_names
            else [None] * len(urls)
        )
        fetch_msgs = (
            batch["fetch_error_message"].to_pylist()
            if "fetch_error_message" in batch.column_names
            else [None] * len(urls)
        )
        ix = self._index
        for url, html, surrogate, seq, rnd, fkind, fmsg in zip(
            urls, htmls, surrogates, seqs, rounds, fetch_kinds, fetch_msgs
        ):
            if html is None:
                # the fetch tier (stages/fetch.py) emits NULL bodies for
                # failed fetches — classify as dead-letter rows here
                # (C2: errors are data), carrying the HTTP error class
                row = self._blank_row()
                row[ix["record_type"]] = RECORD_ERROR
                row[ix["url"]] = url
                row[ix["surrogate"]] = surrogate
                row[ix["seq"]] = seq
                row[ix["round"]] = rnd
                row[ix["error_kind"]] = fkind or "FetchMiss"
                row[ix["error_message"]] = fmsg or "no page body"
                rows.append(row)
                continue
            try:
                res = parse_abcd(
                    html,
                    self.registry,
                    dataset_id=url,
                    dataset_path=url.split("://", 1)[-1].split("/", 1)[-1] if "/" in url.split("://", 1)[-1] else "",
                    landing_page_proposal=propose_landing_page(self.landingpage_url, url),
                    provider_name=host_of(url),
                    landing_page_field=self.landing_page_field,
                )
                if self.result_hook is not None:
                    res = self.result_hook(res)
            except (AbcdParseError, AbcdNoDatasetMetadata) as e:
                row = self._blank_row()
                row[ix["record_type"]] = RECORD_ERROR
                row[ix["url"]] = url
                row[ix["surrogate"]] = surrogate
                row[ix["seq"]] = seq
                row[ix["round"]] = rnd
                row[ix["error_kind"]] = type(e).__name__
                row[ix["error_message"]] = str(e)
                rows.append(row)
                continue

            drow = self._blank_row()
            drow[ix["record_type"]] = RECORD_DATASET
            drow[ix["url"]] = url
            drow[ix["surrogate"]] = surrogate
            drow[ix["seq"]] = seq
            drow[ix["round"]] = rnd
            drow[ix["dataset_id"]] = res.dataset_id
            drow[ix["dataset_path"]] = res.dataset_path
            drow[ix["dataset_landing_page"]] = res.landing_page
            drow[ix["dataset_provider"]] = res.provider_name
            drow[ix["abcd_version"]] = res.version
            for path, value in res.dataset.items():
                j = ix.get(path)
                if j is not None:
                    drow[j] = value
            rows.append(drow)

            link_idx = 0
            for unit in res.units:
                urow = self._blank_row()
                urow[ix["record_type"]] = RECORD_UNIT
                urow[ix["url"]] = url
                urow[ix["surrogate"]] = surrogate
                urow[ix["seq"]] = seq
                urow[ix["round"]] = rnd
                for path, value in unit.items():
                    j = ix.get(path)
                    if j is not None:
                        urow[j] = value
                lon = unit.get(LONGITUDE_PATH)
                lat = unit.get(LATITUDE_PATH)
                if lon is not None and lat is not None:
                    urow[ix["geom_wkt"]] = (
                        f"POINT({format_vat_value(lon)} {format_vat_value(lat)})"
                    )
                rows.append(urow)

                link = unit.get(LINK_FIELD)
                if isinstance(link, str) and link_idx < self.link_cap:
                    lrow = self._blank_row()
                    lrow[ix["record_type"]] = RECORD_LINK
                    lrow[ix["url"]] = url
                    lrow[ix["surrogate"]] = surrogate
                    lrow[ix["seq"]] = seq
                    lrow[ix["round"]] = rnd
                    lrow[ix["link_url"]] = link
                    lrow[ix["link_idx"]] = link_idx
                    rows.append(lrow)
                    link_idx += 1

        if not rows:
            return self.schema.empty_table()
        # vectorized link keying over this batch's link rows
        link_rows = [
            i for i, r in enumerate(rows) if r[ix["record_type"]] == RECORD_LINK
        ]
        if link_rows:
            from ..functions.urlkeys import canonicalize_batch, url_keys_batch

            canon = canonicalize_batch([rows[i][ix["link_url"]] for i in link_rows])
            keys = url_keys_batch(canon)
            hosts = [host_of(c) for c in canon]
            jc, jk, jh = ix["link_canonical"], ix["link_key"], ix["link_host"]
            for i, c, k, h in zip(link_rows, canon, keys, hosts):
                rows[i][jc] = c
                rows[i][jk] = int(k)
                rows[i][jh] = h
        cols = list(zip(*rows))
        return pa.table(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, self.schema)],
            schema=self.schema,
        )
