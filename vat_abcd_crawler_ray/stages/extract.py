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
        # per-stream column layouts: each record type touches only a
        # subset of the union schema, so rows are assembled at their
        # OWN width and the untouched union columns become pa.nulls
        # (C-side, zero Python objects) at table-build time
        self._meta5 = ["record_type", "url", "surrogate", "seq", "round"]
        self._ds_cols = self._meta5 + [
            "dataset_id", "dataset_path", "dataset_landing_page",
            "dataset_provider", "abcd_version",
        ] + [f.name for f in self.registry.global_fields()]
        self._unit_cols = self._meta5 + ["geom_wkt"] + [
            f.name for f in self.registry.unit_fields()
        ]
        self._link_cols = self._meta5 + ["link_url", "link_idx"]
        self._err_cols = self._meta5 + ["error_kind", "error_message"]
        self._ds_index = {n: i for i, n in enumerate(self._ds_cols)}
        self._unit_index = {n: i for i, n in enumerate(self._unit_cols)}

    def _stream_table(self, rows: list[list], cols: list[str]) -> pa.Table:
        """rows (aligned with ``cols``) → a table in the FULL union
        schema, absent columns as C-side null arrays."""
        n = len(rows)
        vals = dict(zip(cols, zip(*rows)))
        arrays = [
            pa.array(list(vals[name]), type=f.type)
            if name in vals
            else pa.nulls(n, f.type)
            for name, f in zip(self._names, self.schema)
        ]
        return pa.table(arrays, schema=self.schema)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ds_rows: list[list] = []
        unit_rows: list[list] = []
        link_rows: list[list] = []
        err_rows: list[list] = []
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
        dsx = self._ds_index
        unx = self._unit_index
        n_ds_cols = len(self._ds_cols)
        n_unit_cols = len(self._unit_cols)
        for url, html, surrogate, seq, rnd, fkind, fmsg in zip(
            urls, htmls, surrogates, seqs, rounds, fetch_kinds, fetch_msgs
        ):
            if html is None:
                # the fetch tier (stages/fetch.py) emits NULL bodies for
                # failed fetches — classify as dead-letter rows here
                # (C2: errors are data), carrying the HTTP error class
                err_rows.append(
                    [RECORD_ERROR, url, surrogate, seq, rnd,
                     fkind or "FetchMiss", fmsg or "no page body"]
                )
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
                err_rows.append(
                    [RECORD_ERROR, url, surrogate, seq, rnd,
                     type(e).__name__, str(e)]
                )
                continue

            drow = [None] * n_ds_cols
            drow[0] = RECORD_DATASET
            drow[1] = url
            drow[2] = surrogate
            drow[3] = seq
            drow[4] = rnd
            drow[dsx["dataset_id"]] = res.dataset_id
            drow[dsx["dataset_path"]] = res.dataset_path
            drow[dsx["dataset_landing_page"]] = res.landing_page
            drow[dsx["dataset_provider"]] = res.provider_name
            drow[dsx["abcd_version"]] = res.version
            for path, value in res.dataset.items():
                j = dsx.get(path)
                if j is not None:
                    drow[j] = value
            ds_rows.append(drow)

            link_idx = 0
            for unit in res.units:
                urow = [None] * n_unit_cols
                urow[0] = RECORD_UNIT
                urow[1] = url
                urow[2] = surrogate
                urow[3] = seq
                urow[4] = rnd
                for path, value in unit.items():
                    j = unx.get(path)
                    if j is not None:
                        urow[j] = value
                lon = unit.get(LONGITUDE_PATH)
                lat = unit.get(LATITUDE_PATH)
                if lon is not None and lat is not None:
                    urow[5] = (  # geom_wkt
                        f"POINT({format_vat_value(lon)} {format_vat_value(lat)})"
                    )
                unit_rows.append(urow)

                link = unit.get(LINK_FIELD)
                if isinstance(link, str) and link_idx < self.link_cap:
                    link_rows.append(
                        [RECORD_LINK, url, surrogate, seq, rnd, link, link_idx]
                    )
                    link_idx += 1

        parts = []
        if err_rows:
            parts.append(self._stream_table(err_rows, self._err_cols))
        if ds_rows:
            parts.append(self._stream_table(ds_rows, self._ds_cols))
        if unit_rows:
            parts.append(self._stream_table(unit_rows, self._unit_cols))
        if link_rows:
            # vectorized link keying over this batch's link rows
            from ..functions.urlkeys import canonicalize_batch, url_keys_batch

            canon = canonicalize_batch([r[5] for r in link_rows])
            keys = url_keys_batch(canon)
            cols = dict(zip(self._link_cols, zip(*link_rows)))
            n = len(link_rows)
            extra = {
                "link_canonical": pa.array(canon, pa.string()),
                "link_key": pa.array(keys),
                "link_host": pa.array([host_of(c) for c in canon], pa.string()),
            }
            arrays = []
            for name, f in zip(self._names, self.schema):
                if name in cols:
                    arrays.append(pa.array(list(cols[name]), type=f.type))
                elif name in extra:
                    arrays.append(extra[name])
                else:
                    arrays.append(pa.nulls(n, f.type))
            parts.append(pa.table(arrays, schema=self.schema))
        if not parts:
            return self.schema.empty_table()
        return pa.concat_tables(parts)
