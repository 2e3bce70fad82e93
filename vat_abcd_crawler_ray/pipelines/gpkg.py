"""W8: GeoPackage export of the units table (``csv-to-gpkg.sh:3-13``).

The reference shells out to ``ogr2ogr`` to turn the units CSV into a
GeoPackage: a POINT layer in EPSG:4326 built from the Longitude/
LatitudeDecimal columns (``X_POSSIBLE_NAMES``/``Y_POSSIBLE_NAMES``),
projected to two attributes — ``Date`` (Gathering ISODateTimeBegin)
and ``Species`` (FullScientificNameString) — with the raw coordinate
columns dropped (``KEEP_GEOM_COLUMNS=NO``). A GeoPackage is just a
SQLite database laid out per the OGC 1.3 spec, and ``sqlite3`` ships
in the stdlib, so this re-creation writes the container directly — no
GDAL dependency.

Plan shape: the (Date, Species, lon, lat) projection runs distributed
(``map_batches`` over the extracted unit blocks, column-pruned read);
the SQLite container is written by streaming ``iter_batches`` on the
driver — a single ``.gpkg`` file is inherently one writer (ogr2ogr is
too), and the stream holds one batch in memory at a time, never the
table. For sharded output at scale, call once per partition with
distinct ``out_path``s. The file is staged and published with an
atomic rename, matching the manifest protocol (W5).
"""

from __future__ import annotations

import os
import sqlite3
import struct

import pandas as pd

from ..functions.fields import LATITUDE_PATH, LONGITUDE_PATH, FieldRegistry

_DATE_PATH = (
    "/DataSets/DataSet/Units/Unit/Gathering/DateTime/ISODateTimeBegin"
)
_SPECIES_PATH = (
    "/DataSets/DataSet/Units/Unit/Identifications/Identification/Result"
    "/TaxonIdentified/ScientificName/FullScientificNameString"
)

_WGS84_WKT = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],UNIT["degree",'
    '0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4326"]]'
)

# GeoPackage binary header: magic 'GP', version 0, flags 0b0000_0001
# (little-endian header, no envelope) + srs_id; then standard WKB
# (little-endian, type 1 = Point).
_GP_HEADER = struct.pack("<2sBBi", b"GP", 0, 0b1, 4326)
_WKB_POINT = struct.pack("<BI", 1, 1)


def point_blob(lon: float, lat: float) -> bytes:
    """GPKG binary geometry for one EPSG:4326 POINT."""
    return _GP_HEADER + _WKB_POINT + struct.pack("<dd", lon, lat)


def read_point_blob(blob: bytes) -> tuple[float, float]:
    """Inverse of :func:`point_blob` (header-flag aware enough for the
    blobs this module writes; used by tests and round-trip checks)."""
    magic, _ver, flags, _srs = struct.unpack_from("<2sBBi", blob, 0)
    if magic != b"GP":
        raise ValueError("not a GPKG geometry blob")
    env = (flags >> 1) & 0b111
    off = 8 + (0, 32, 48, 48, 64)[env]
    return struct.unpack_from("<dd", blob, off + 5)


def _create_container(con: sqlite3.Connection, layer: str) -> None:
    cur = con.cursor()
    cur.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
    cur.execute("PRAGMA user_version = 10300")  # spec 1.3.0
    cur.execute(
        """CREATE TABLE gpkg_spatial_ref_sys (
            srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
            organization TEXT NOT NULL,
            organization_coordsys_id INTEGER NOT NULL,
            definition TEXT NOT NULL, description TEXT)"""
    )
    cur.executemany(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        [
            ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
            ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
            ("WGS 84 geodetic", 4326, "EPSG", 4326, _WGS84_WKT, None),
        ],
    )
    cur.execute(
        """CREATE TABLE gpkg_contents (
            table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
            identifier TEXT UNIQUE, description TEXT DEFAULT '',
            last_change DATETIME NOT NULL DEFAULT
              (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
            min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
            srs_id INTEGER,
            CONSTRAINT fk_gc_r_srs_id FOREIGN KEY (srs_id)
              REFERENCES gpkg_spatial_ref_sys(srs_id))"""
    )
    cur.execute(
        """CREATE TABLE gpkg_geometry_columns (
            table_name TEXT NOT NULL, column_name TEXT NOT NULL,
            geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
            z TINYINT NOT NULL, m TINYINT NOT NULL,
            CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"""
    )
    cur.execute(
        f'''CREATE TABLE "{layer}" (
            fid INTEGER PRIMARY KEY AUTOINCREMENT,
            geom POINT, "Date" TEXT, "Species" TEXT)'''
    )
    cur.execute(
        "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,?,?)",
        (layer, "geom", "POINT", 4326, 0, 0),
    )


def units_gpkg(
    run_dir: str,
    out_path: str,
    layer: str = "out",
    registry: FieldRegistry | None = None,
) -> dict:
    """Export the crawl run's units to ``out_path`` (.gpkg). Returns
    ``{"features": n, "with_geometry": m}``.

    Semantics mirror the reference invocation: attributes Date and
    Species (missing → NULL, ogr2ogr's AUTODETECT empty handling), a
    POINT geometry when BOTH coordinates parsed (M3's silent numeric
    drop upstream means a bad coordinate string arrives here as NULL →
    NULL geometry, exactly ogr2ogr's behavior for blank X/Y), raw
    coordinate columns not kept."""
    from .crawl import extracted_dataset

    cols = [_DATE_PATH, _SPECIES_PATH, LONGITUDE_PATH, LATITUDE_PATH]

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "date": df[_DATE_PATH],
                "species": df[_SPECIES_PATH],
                "lon": df[LONGITUDE_PATH],
                "lat": df[LATITUDE_PATH],
            }
        )

    proj = (
        extracted_dataset(run_dir, "unit")
        .select_columns(cols)
        .map_batches(project, batch_format="pandas")
    )

    tmp = out_path + f".tmp.{os.getpid()}"
    if os.path.exists(tmp):
        os.remove(tmp)
    con = sqlite3.connect(tmp)
    n = n_geom = 0
    bbox = [None, None, None, None]  # min_x, min_y, max_x, max_y
    try:
        _create_container(con, layer)
        ins = f'INSERT INTO "{layer}" (geom, "Date", "Species") VALUES (?,?,?)'
        for df in proj.iter_batches(batch_format="pandas", batch_size=8192):
            lon = df["lon"].to_numpy(dtype=float)
            lat = df["lat"].to_numpy(dtype=float)
            has = pd.notna(df["lon"]).to_numpy() & pd.notna(df["lat"]).to_numpy()
            if has.any():
                glon, glat = lon[has], lat[has]
                lo_x, hi_x = float(glon.min()), float(glon.max())
                lo_y, hi_y = float(glat.min()), float(glat.max())
                bbox[0] = lo_x if bbox[0] is None else min(bbox[0], lo_x)
                bbox[1] = lo_y if bbox[1] is None else min(bbox[1], lo_y)
                bbox[2] = hi_x if bbox[2] is None else max(bbox[2], hi_x)
                bbox[3] = hi_y if bbox[3] is None else max(bbox[3], hi_y)
            rows = [
                (
                    point_blob(lon[i], lat[i]) if has[i] else None,
                    None if pd.isna(d) else str(d),
                    None if pd.isna(s) else str(s),
                )
                for i, (d, s) in enumerate(zip(df["date"], df["species"]))
            ]
            con.executemany(ins, rows)
            n += len(rows)
            n_geom += int(has.sum())
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
            " min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (layer, "features", layer, *bbox, 4326),
        )
        con.commit()
    finally:
        con.close()
    os.replace(tmp, out_path)  # atomic publish (W5 protocol)
    return {"features": n, "with_geometry": n_geom}
