"""Extraction field registry.

The whole extraction schema is *data*, not code: a list of field specs,
each naming a full XML tag path plus typing/placement flags. This mirrors
the reference's external JSON spec (``/root/reference/src/abcd/abcd_fields.rs:11-20``,
loaded at ``:29-46``) and its 36-entry default schema
(``/root/reference/abcd-fields.json``). Only paths present in the spec are
extracted; the ``numeric`` flag picks one of exactly two scalar types
(text | float64, ``/root/reference/src/vat_type.rs:5-9``); ``global_field``
routes a field to the dataset table vs the unit table
(``/root/reference/src/storage/database_sink.rs:73-88``).

The registry can be built from the reference-format JSON file (user
extension surface, SURVEY §2.8) or from :data:`DEFAULT_FIELDS` below.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass


@dataclass(frozen=True)
class FieldSpec:
    """One extractable field. ``name`` is the full XML tag path."""

    name: str
    numeric: bool = False
    vat_mandatory: bool = False
    gfbio_mandatory: bool = False
    global_field: bool = False
    unit: str = ""

    @property
    def hash(self) -> str:
        """Stable 40-char sha1-hex column alias.

        The reference hashes paths to fit Postgres's 63-byte identifier
        limit (``/root/reference/src/storage/field.rs:10-31``). Arrow has no
        such limit so our tables keep full paths as column names, but the
        alias is preserved for the translation table / oracle parity.
        """
        return hashlib.sha1(self.name.encode("utf-8")).hexdigest()


_DS = "/DataSets/DataSet"
_UNIT = _DS + "/Units/Unit"
_COORD = _UNIT + "/Gathering/SiteCoordinateSets/SiteCoordinates/CoordinatesLatLong"
_MMO = _UNIT + "/MultiMediaObjects/MultiMediaObject"

# (path, numeric, vat_mandatory, gfbio_mandatory, global_field, unit)
# Facts of the ABCD 2.06 standard as selected by the reference's default
# schema file (abcd-fields.json; flag semantics abcd_fields.rs:11-20).
_DEFAULT_ROWS: list[tuple[str, bool, bool, bool, bool, str]] = [
    (_DS + "/DatasetGUID", False, False, False, True, ""),
    (_DS + "/TechnicalContacts/TechnicalContact/Name", False, False, True, True, ""),
    (_DS + "/TechnicalContacts/TechnicalContact/Email", False, False, True, True, ""),
    (_DS + "/ContentContacts/ContentContact/Name", False, False, True, True, ""),
    (_DS + "/ContentContacts/ContentContact/Email", False, False, True, True, ""),
    (_DS + "/Metadata/Description/Representation/Title", False, False, True, True, ""),
    (_DS + "/Metadata/Description/Representation/Details", False, False, True, True, ""),
    (_DS + "/Metadata/Description/Representation/URI", False, False, True, True, ""),
    (_DS + "/Metadata/RevisionData/DateModified", False, False, True, True, ""),
    (_DS + "/Metadata/IPRStatements/Licenses/License/Text", False, False, True, True, ""),
    (_DS + "/Metadata/IPRStatements/Citations/Citation/Text", False, False, False, True, ""),
    (_DS + "/Metadata/IPRStatements/Licenses/License/Details", False, False, False, True, ""),
    (_DS + "/Metadata/IPRStatements/Licenses/License/URI", False, False, False, True, ""),
    (_UNIT + "/SourceInstitutionID", False, False, True, False, ""),
    (_UNIT + "/SourceID", False, False, True, False, ""),
    (_UNIT + "/UnitID", False, False, True, False, ""),
    (_UNIT + "/DateLastEdited", False, False, False, False, ""),
    (
        _UNIT
        + "/Identifications/Identification/Result/TaxonIdentified/HigherTaxa/HigherTaxon/HigherTaxonName",
        False, False, True, False, "",
    ),
    (
        _UNIT
        + "/Identifications/Identification/Result/TaxonIdentified/HigherTaxa/HigherTaxon/HigherTaxonRank",
        False, False, True, False, "",
    ),
    (
        _UNIT
        + "/Identifications/Identification/Result/TaxonIdentified/ScientificName/FullScientificNameString",
        False, False, True, False, "",
    ),
    (_UNIT + "/RecordBasis", False, False, True, False, ""),
    (_MMO + "/FileURI", False, False, False, False, ""),
    (_MMO + "/Format", False, False, False, False, ""),
    (_MMO + "/IPR/Licenses/License/Text", False, False, False, False, ""),
    (_MMO + "/IPR/Licenses/License/Details", False, False, False, False, ""),
    (_MMO + "/IPR/Licenses/License/URI", False, False, False, False, ""),
    (_MMO + "/Creator", False, False, False, False, ""),
    (_UNIT + "/Gathering/DateTime/ISODateTimeBegin", False, False, True, False, ""),
    (_UNIT + "/Gathering/Agents/GatheringAgent/AgentText", False, False, False, False, ""),
    (_UNIT + "/Gathering/LocalityText", False, False, False, False, ""),
    (_UNIT + "/Gathering/Country/Name", False, False, True, False, ""),
    (_UNIT + "/Gathering/Country/ISO3166Code", False, False, False, False, ""),
    (_COORD + "/LongitudeDecimal", True, True, True, False, "°"),
    (_COORD + "/LatitudeDecimal", True, True, True, False, "°"),
    (_COORD + "/SpatialDatum", False, False, True, False, ""),
    (_UNIT + "/RecordURI", False, False, True, False, ""),
]

DEFAULT_FIELDS: list[FieldSpec] = [FieldSpec(*row) for row in _DEFAULT_ROWS]

LONGITUDE_PATH = _COORD + "/LongitudeDecimal"
LATITUDE_PATH = _COORD + "/LatitudeDecimal"
DEFAULT_LANDING_PAGE_FIELD = _DS + "/Metadata/Description/Representation/URI"


class FieldRegistry:
    """Spec lookup by path (J3/S6 in SURVEY §2): ``value_of`` analog of
    ``abcd_fields.rs:48-50``; iteration preserves spec order (drives
    output column order, ``/root/reference/src/main.rs:68-73``)."""

    def __init__(self, fields: list[FieldSpec] | None = None):
        self.fields: list[FieldSpec] = list(fields if fields is not None else DEFAULT_FIELDS)
        self.by_path: dict[str, FieldSpec] = {f.name: f for f in self.fields}
        # bytes-keyed view for the hot parser loop (tag paths are bytes)
        self.by_path_bytes: dict[bytes, FieldSpec] = {
            f.name.encode("utf-8"): f for f in self.fields
        }

    def __len__(self) -> int:
        return len(self.fields)

    def __iter__(self):
        return iter(self.fields)

    def value_of(self, path: str) -> FieldSpec | None:
        return self.by_path.get(path)

    def global_fields(self) -> list[FieldSpec]:
        return [f for f in self.fields if f.global_field]

    def unit_fields(self) -> list[FieldSpec]:
        return [f for f in self.fields if not f.global_field]

    # -- user extension surface: reference-format JSON round trip ---------
    @classmethod
    def from_json_file(cls, path: str) -> "FieldRegistry":
        """Load a reference-format spec file (``abcd_fields.rs:29-46``)."""
        with open(path, "r", encoding="utf-8") as fh:
            raw = json.load(fh)
        return cls(
            [
                FieldSpec(
                    name=e["name"],
                    numeric=bool(e["numeric"]),
                    vat_mandatory=bool(e.get("vatMandatory", False)),
                    gfbio_mandatory=bool(e.get("gfbioMandatory", False)),
                    global_field=bool(e.get("globalField", False)),
                    unit=e.get("unit", "") or "",
                )
                for e in raw
            ]
        )

    def to_json(self) -> str:
        return json.dumps(
            [
                {
                    "name": f.name,
                    "numeric": f.numeric,
                    "vatMandatory": f.vat_mandatory,
                    "gfbioMandatory": f.gfbio_mandatory,
                    "globalField": f.global_field,
                    "unit": f.unit,
                }
                for f in self.fields
            ],
            indent=2,
            ensure_ascii=False,
        )

    def translation_rows(self) -> list[dict[str, str]]:
        """name ↔ sha1 translation table rows (J4;
        ``database_sink.rs:104-125``)."""
        return [{"name": f.name, "hash": f.hash} for f in self.fields]
