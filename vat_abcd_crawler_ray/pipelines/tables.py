"""Final output tables (W1-W7, SURVEY §2.6) over a finished crawl run.

The reference lands three tables + a view in Postgres; here each is a
Parquet table derived from the run's extracted stream:

- ``datasets``  — one row per harvested page (surrogate PK +
  provenance + the 13 global fields), ``database_sink.rs:172-225``;
- ``units``     — N rows with the parent surrogate FK, the 23 unit
  fields and ``geom_wkt`` (``database_sink.rs:128-169``);
- ``translation`` — field-path ↔ sha1 alias map
  (``database_sink.rs:104-125``);
- ``listing``   — the per-dataset summary view incl. the
  ``isGeoReferenced`` grouped-EXISTS (J2/A2,
  ``database_sink.rs:492-558``) computed as filter → groupby-count →
  broadcast semi-join (no big-side shuffle).

Plus the W7 single-file CSV mode: ZIP of ABCD XML → units CSV in spec
order with shortest-float formatting (``src/main.rs:63-111``).
"""

from __future__ import annotations

import csv
import io
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import Settings
from ..functions.extract import format_vat_value, parse_abcd
from ..functions.fields import LATITUDE_PATH, LONGITUDE_PATH, FieldRegistry
from ..sources.archive import iter_archive_bytes
from .crawl import extracted_dataset

PROVENANCE_COLS = [
    "surrogate",
    "dataset_id",
    "dataset_path",
    "dataset_landing_page",
    "dataset_provider",
]


def datasets_table(run_dir: str, registry: FieldRegistry | None = None) -> "ray.data.Dataset":
    reg = registry or FieldRegistry()
    cols = PROVENANCE_COLS + [f.name for f in reg.global_fields()]
    return extracted_dataset(run_dir, "dataset").select_columns(cols)


def units_table(run_dir: str, registry: FieldRegistry | None = None) -> "ray.data.Dataset":
    reg = registry or FieldRegistry()
    cols = ["surrogate"] + [f.name for f in reg.unit_fields()] + ["geom_wkt"]
    return extracted_dataset(run_dir, "unit").select_columns(cols)


def errors_table(run_dir: str) -> "ray.data.Dataset":
    """Dead-letter rows (C2: per-item soft errors are DATA, not task
    failures — parse failures + fetch misses with url/seq provenance)."""
    return extracted_dataset(run_dir, "error").select_columns(
        ["url", "surrogate", "seq", "round", "error_kind", "error_message"]
    )


def fk_orphan_units(run_dir: str) -> "ray.data.Dataset":
    """W4 FK validation (``database_sink.rs:408-420``: the post-load
    ``FOREIGN KEY`` constraint): unit rows whose ``surrogate`` has no
    parent dataset row. A correct crawl returns ZERO rows — exposed as
    a CORRECTNESS-gated query (``q_crawl_fk_orphans``).

    Plan: routed through the auto-gated ``anti_join_keys`` — below its
    key gate the parent-key set (one int64 per dataset) broadcasts and
    units stream through a vectorized anti-filter (no units-side
    shuffle); above it a bucketed left join takes over, so driver
    memory never scales with the dataset count (the former
    ``unique()`` pulled the full key list to the driver ungated)."""
    from ..ops.joins import anti_join_keys

    keys = extracted_dataset(run_dir, "dataset").select_columns(["surrogate"])
    units = extracted_dataset(run_dir, "unit")
    return anti_join_keys(units, keys, on="surrogate")


def translation_table(registry: FieldRegistry | None = None) -> pa.Table:
    reg = registry or FieldRegistry()
    rows = reg.translation_rows()
    return pa.table(
        {
            "name": pa.array([r["name"] for r in rows]),
            "hash": pa.array([r["hash"] for r in rows]),
        }
    )


TITLE_PATH = "/DataSets/DataSet/Metadata/Description/Representation/Title"


def listing_table(run_dir: str, registry: FieldRegistry | None = None) -> "ray.data.Dataset":
    """Per-dataset listing with the grouped-EXISTS georeference flag.

    ``isGeoReferenced`` = ∃ unit of this dataset with BOTH coordinates
    (``database_sink.rs:533-538``). Plan: filter units on coord validity
    (vectorized), groupby(surrogate).count() — a shuffle over the tiny
    filtered key set — then flag datasets via ``membership_flag_join``
    (broadcast below its key gate, bucketed left join above — never an
    unbounded driver ``set``)."""
    from ..ops.joins import membership_flag_join

    units = extracted_dataset(run_dir, "unit").select_columns(
        ["surrogate", LONGITUDE_PATH, LATITUDE_PATH]
    )

    def valid_coords(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_valid(t[LONGITUDE_PATH]), pc.is_valid(t[LATITUDE_PATH])
        )
        return t.filter(mask).select(["surrogate"])

    geo_keys = (
        units.map_batches(valid_coords, batch_format="pyarrow")
        .groupby("surrogate")
        .count()
    )

    ds = extracted_dataset(run_dir, "dataset").select_columns(
        ["surrogate", "dataset_landing_page", TITLE_PATH, "dataset_id", "dataset_provider"]
    )
    flagged = membership_flag_join(ds, geo_keys, on="surrogate", flag_col="__geo")

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "link": batch["dataset_landing_page"],
                "dataset": batch[TITLE_PATH],
                "id": batch["dataset_id"],
                "provider": batch["dataset_provider"],
                "available": True,
                "isGeoReferenced": batch["__geo"],
            }
        )

    return flagged.map_batches(project, batch_format="pandas")


def write_all_tables(run_dir: str, out_dir: str, registry: FieldRegistry | None = None) -> dict:
    """Materialize the four tables under ``out_dir`` (resumable layout:
    one directory per table)."""
    reg = registry or FieldRegistry()
    paths = {}
    for name, ds in [
        ("datasets", datasets_table(run_dir, reg)),
        ("units", units_table(run_dir, reg)),
        ("listing", listing_table(run_dir, reg)),
        ("errors", errors_table(run_dir)),
    ]:
        p = os.path.join(out_dir, name)
        ds.write_parquet(p)
        paths[name] = p
    import pyarrow.parquet as pq

    tpath = os.path.join(out_dir, "translation")
    os.makedirs(tpath, exist_ok=True)
    pq.write_table(translation_table(reg), os.path.join(tpath, "part-0.parquet"))
    paths["translation"] = tpath
    return paths


# ---------------- W7: single-file CSV mode ----------------


def archive_to_csv(
    zip_path: str,
    registry: FieldRegistry | None = None,
    settings: Settings | None = None,
) -> str:
    """ZIP of ABCD XML files → CSV string: header = field names in spec
    order, one line per unit, missing → empty, floats in shortest
    round-trip repr (``src/main.rs:63-111``, ``vat_type.rs:35-42``).
    Single-archive debug path — intentionally driver-local, like the
    reference's ``--file-to-csv``."""
    reg = registry or FieldRegistry()
    settings = settings or Settings()
    buf = io.StringIO()
    writer = csv.writer(buf, lineterminator="\n")
    names = [f.name for f in reg]
    writer.writerow(names)
    for _name, xml in iter_archive_bytes(zip_path):
        try:
            result = parse_abcd(
                xml,
                reg,
                dataset_path=zip_path,
                landing_page_field=settings.abcd.landing_page_field,
            )
        except ValueError:
            continue  # warn-and-continue (C2, main.rs:75-90)
        # unit rows only — dataset-scope fields print empty, exactly like
        # the reference's per-unit projection (main.rs:94-109)
        for unit in result.units:
            writer.writerow([format_vat_value(unit.get(n)) for n in names])
    return buf.getvalue()
