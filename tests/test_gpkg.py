"""W8: GeoPackage export (``csv-to-gpkg.sh`` analog, stdlib sqlite3)."""

from __future__ import annotations

import sqlite3

import pandas as pd
import pytest

from vat_abcd_crawler_ray.pipelines.crawl import CrawlRun
from vat_abcd_crawler_ray.pipelines.gpkg import (
    _DATE_PATH,
    _SPECIES_PATH,
    point_blob,
    read_point_blob,
    units_gpkg,
)
from vat_abcd_crawler_ray.functions.fields import LATITUDE_PATH, LONGITUDE_PATH
from vat_abcd_crawler_ray.pipelines.tables import units_table
from vat_abcd_crawler_ray.sources.synthetic import corpus_dir


@pytest.fixture(scope="module")
def run_dir(ray_session, tmp_path_factory):
    corpus = corpus_dir("/root/testdata/sf0.001")
    d = tmp_path_factory.mktemp("gpkg_run")
    run = CrawlRun(
        f"{corpus}/pages.parquet",
        f"{corpus}/seeds.parquet",
        f"{corpus}/politeness.parquet",
        str(d),
    )
    run.run()
    return str(d)


def test_point_blob_roundtrip():
    assert read_point_blob(point_blob(42.0, -10.5)) == (42.0, -10.5)


def test_units_gpkg(run_dir, tmp_path):
    out = str(tmp_path / "units.gpkg")
    stats = units_gpkg(run_dir, out)

    units = units_table(run_dir).to_pandas()
    has_geom = units[LONGITUDE_PATH].notna() & units[LATITUDE_PATH].notna()
    assert stats["features"] == len(units) > 0
    assert stats["with_geometry"] == int(has_geom.sum()) > 0

    con = sqlite3.connect(out)
    try:
        # container identity (the bytes ogr/QGIS sniff)
        assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
        assert con.execute("PRAGMA user_version").fetchone()[0] == 10300
        assert con.execute(
            "SELECT data_type, srs_id FROM gpkg_contents"
        ).fetchall() == [("features", 4326)]
        assert con.execute(
            "SELECT geometry_type_name FROM gpkg_geometry_columns"
        ).fetchone() == ("POINT",)

        rows = con.execute(
            'SELECT geom, "Date", "Species" FROM "out" ORDER BY fid'
        ).fetchall()
    finally:
        con.close()
    assert len(rows) == len(units)

    # KEEP_GEOM_COLUMNS=NO: only fid/geom/Date/Species in the layer —
    # and the attribute/geometry VALUES match the units table as a
    # multiset (block order across separate Dataset executions is not
    # deterministic, like ogr2ogr makes no row-order promise)
    def blob_xy(b):
        return read_point_blob(b) if b is not None else (None, None)

    def key(t):
        return tuple((v is None, v) for v in t)

    got = sorted(((d, s, *blob_xy(g)) for g, d, s in rows), key=key)
    exp = sorted(
        (
            (
                None if pd.isna(d) else str(d),
                None if pd.isna(s) else str(s),
                float(x) if geo else None,
                float(y) if geo else None,
            )
            for d, s, x, y, geo in zip(
                units[_DATE_PATH],
                units[_SPECIES_PATH],
                units[LONGITUDE_PATH],
                units[LATITUDE_PATH],
                has_geom,
            )
        ),
        key=key,
    )
    assert got == exp

    # contents bbox covers exactly the georeferenced extent
    con = sqlite3.connect(out)
    try:
        min_x, min_y, max_x, max_y = con.execute(
            "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents"
        ).fetchone()
    finally:
        con.close()
    assert min_x == units.loc[has_geom, LONGITUDE_PATH].min()
    assert max_y == units.loc[has_geom, LATITUDE_PATH].max()
