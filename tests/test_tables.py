"""Output tables + CSV single-file mode (W1-W7 analogs)."""

from __future__ import annotations

import io
import os
import zipfile

import pandas as pd
import pytest

from vat_abcd_crawler_ray.functions.fields import FieldRegistry
from vat_abcd_crawler_ray.pipelines.crawl import CrawlRun
from vat_abcd_crawler_ray.pipelines.tables import (
    archive_to_csv,
    datasets_table,
    listing_table,
    translation_table,
    units_table,
    write_all_tables,
)
from vat_abcd_crawler_ray.sources.archive import archive_len, iter_archive_bytes
from vat_abcd_crawler_ray.sources.synthetic import corpus_dir


@pytest.fixture(scope="module")
def run_dir(ray_session, tmp_path_factory):
    corpus = corpus_dir("/root/testdata/sf0.001")
    d = tmp_path_factory.mktemp("tbl_run")
    run = CrawlRun(
        f"{corpus}/pages.parquet",
        f"{corpus}/seeds.parquet",
        f"{corpus}/politeness.parquet",
        str(d),
    )
    run.run()
    return str(d)


ABCD_XML = b"""<?xml version="1.0"?>
<abcd:DataSets xmlns:abcd="http://www.tdwg.org/schemas/abcd/2.06">
<abcd:DataSet>
<abcd:Metadata><abcd:Description><abcd:Representation>
<abcd:Title>Z</abcd:Title></abcd:Representation></abcd:Description></abcd:Metadata>
<abcd:Units>
<abcd:Unit><abcd:UnitID>a&amp;1</abcd:UnitID>
<abcd:Gathering><abcd:SiteCoordinateSets><abcd:SiteCoordinates><abcd:CoordinatesLatLong>
<abcd:LongitudeDecimal>42</abcd:LongitudeDecimal>
<abcd:LatitudeDecimal>10.5</abcd:LatitudeDecimal>
</abcd:CoordinatesLatLong></abcd:SiteCoordinates></abcd:SiteCoordinateSets></abcd:Gathering>
</abcd:Unit>
<abcd:Unit><abcd:UnitID>b</abcd:UnitID></abcd:Unit>
</abcd:Units>
</abcd:DataSet>
</abcd:DataSets>"""


@pytest.fixture()
def zip_file(tmp_path):
    p = tmp_path / "arch.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("doc1.xml", ABCD_XML)
        zf.writestr("bad.xml", b"<oops")
    return str(p)


@pytest.mark.usefixtures("ray_session")
class TestTables:
    def test_datasets_and_units(self, run_dir):
        d = datasets_table(run_dir).to_pandas()
        u = units_table(run_dir).to_pandas()
        assert len(d) > 0 and len(u) > 0
        # FK integrity: every unit surrogate exists in datasets (J1)
        assert set(u["surrogate"]).issubset(set(d["surrogate"]))
        # surrogates unique per dataset row
        assert d["surrogate"].is_unique
        # geom iff both coords (M7)
        lon = "/DataSets/DataSet/Units/Unit/Gathering/SiteCoordinateSets/SiteCoordinates/CoordinatesLatLong/LongitudeDecimal"
        lat = lon.replace("Longitude", "Latitude")
        both = u[lon].notna() & u[lat].notna()
        assert (u.loc[both, "geom_wkt"].notna()).all()
        assert (u.loc[~both, "geom_wkt"].isna()).all()

    def test_listing(self, run_dir):
        d = datasets_table(run_dir).to_pandas()
        listing = listing_table(run_dir).to_pandas()
        assert len(listing) == len(d)
        assert set(listing.columns) == {
            "link", "dataset", "id", "provider", "available", "isGeoReferenced",
        }
        u = units_table(run_dir).to_pandas()
        lon = "/DataSets/DataSet/Units/Unit/Gathering/SiteCoordinateSets/SiteCoordinates/CoordinatesLatLong/LongitudeDecimal"
        lat = lon.replace("Longitude", "Latitude")
        geo_surr = set(u[(u[lon].notna()) & (u[lat].notna())]["surrogate"])
        merged = listing.merge(d[["surrogate", "dataset_id"]],
                               left_on="id", right_on="dataset_id")
        expect = merged["surrogate"].isin(geo_surr)
        assert (merged["isGeoReferenced"] == expect).all()
        assert listing["isGeoReferenced"].any()
        assert not listing["isGeoReferenced"].all()

    def test_translation(self):
        t = translation_table().to_pandas()
        assert len(t) == 36
        assert t["hash"].str.len().eq(40).all()

    def test_write_all_tables(self, run_dir, tmp_path):
        paths = write_all_tables(run_dir, str(tmp_path / "tables"))
        import pyarrow.parquet as pq
        for name, p in paths.items():
            assert os.path.isdir(p), name


class TestArchiveCsv:
    def test_archive_reader(self, zip_file):
        items = list(iter_archive_bytes(zip_file))
        assert [n for n, _ in items] == ["doc1.xml", "bad.xml"]
        assert archive_len(zip_file) == 2

    def test_csv_output_golden(self, zip_file):
        out = archive_to_csv(zip_file)
        lines = out.splitlines()
        reg = FieldRegistry()
        header = lines[0].split(",")
        assert header == [f.name for f in reg]
        # 2 units from doc1; bad.xml skipped
        assert len(lines) == 3
        df = pd.read_csv(io.StringIO(out), keep_default_na=False, dtype=str)
        uid = "/DataSets/DataSet/Units/Unit/UnitID"
        lon = "/DataSets/DataSet/Units/Unit/Gathering/SiteCoordinateSets/SiteCoordinates/CoordinatesLatLong/LongitudeDecimal"
        lat = lon.replace("Longitude", "Latitude")
        assert df[uid].tolist() == ["a&amp;1", "b"]
        # shortest-float repr: 42 not 42.0 (vat_type.rs:35-42)
        assert df[lon].tolist() == ["42", ""]
        assert df[lat].tolist() == ["10.5", ""]
        # dataset-scope columns are EMPTY in unit rows (main.rs:94-109)
        title = "/DataSets/DataSet/Metadata/Description/Representation/Title"
        assert df[title].tolist() == ["", ""]


@pytest.mark.usefixtures("ray_session")
def test_extract_stage_result_hook():
    """User-extension seam (SURVEY §2.8): a picklable hook transforms
    each AbcdResult before emission."""
    import ray.data as rd
    import pyarrow as pa
    from vat_abcd_crawler_ray.stages.extract import ExtractStage

    xml = (
        b'<abcd:DataSets xmlns:abcd="http://www.tdwg.org/schemas/abcd/2.06">'
        b"<abcd:DataSet><abcd:Metadata><abcd:Description><abcd:Representation>"
        b"<abcd:Title>low</abcd:Title></abcd:Representation></abcd:Description>"
        b"</abcd:Metadata><abcd:Units><abcd:Unit><abcd:UnitID>u</abcd:UnitID>"
        b"</abcd:Unit></abcd:Units></abcd:DataSet></abcd:DataSets>"
    )
    title = "/DataSets/DataSet/Metadata/Description/Representation/Title"

    # nested fn → cloudpickle serializes by value (a module-level fn in
    # the tests dir would not be importable inside workers)
    def upper_title(res):
        if title in res.dataset:
            res.dataset[title] = res.dataset[title].upper()
        return res

    ds = rd.from_items([{"url": "http://h/x", "html": xml}])
    out = ds.map_batches(
        ExtractStage(result_hook=upper_title), batch_format="pyarrow"
    ).to_pandas()
    drow = out[out["record_type"] == "dataset"].iloc[0]
    assert drow[title] == "LOW"
