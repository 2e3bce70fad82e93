"""ABCD XML extraction — the core per-record transform (M1-M4, SURVEY §2.2).

A pure function of ``(xml bytes, field registry)`` → one dataset row +
N unit rows, re-expressing the reference's SAX event loop
(``/root/reference/src/abcd/abcd_parser.rs:39-157``) byte-for-byte:

- tag-path stack with namespace stripping (``abcd:Name`` → ``Name``,
  ``abcd_parser.rs:55-58, :90-98, :173-179``);
- ABCD version sniffed from the ``DataSets`` root attributes but never
  branched on (``abcd_parser.rs:62-78``);
- the dataset value-map is flushed when the ``<Units>`` start tag is
  reached (``abcd_parser.rs:79-86``); one unit value-map per ``</Unit>``
  end tag (``:100-106``);
- only spec'd paths are extracted (``:109``); duplicate occurrences of a
  path within one scope overwrite — last wins (``:113-119``);
- text values are the **raw escaped bytes** (entities NOT unescaped),
  whitespace-trimmed (``trim_text(true)``), decoded UTF-8-lossy
  (``:47-48, :108-120``) — this is the byte-identical-text invariant;
- numeric fields parse as f64, a failed parse silently drops the value
  (``:110-114``);
- landing page: prefer the dataset's own landing-page field value, else
  the caller's proposal (``:137-153``);
- a document that never reaches ``<Units>`` has no dataset metadata →
  error (``:154-156``).

This module is deliberately dependency-free (no Ray): it is the unit the
reference's parser tests re-express against (pytest oracles, SURVEY §5),
and the body that ``stages/extract.py`` vectorizes over Arrow batches.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .fields import DEFAULT_LANDING_PAGE_FIELD, FieldRegistry

ABCD_VERSION_UNKNOWN = ""
ABCD_VERSION_206 = "2.06"
ABCD_VERSION_210 = "2.1"

_NS_206 = b"http://www.tdwg.org/schemas/abcd/2.06"
_NS_210 = b"http://www.tdwg.org/schemas/abcd/2.1"

_WS = b" \t\r\n"

# One pass over the document: markup alternatives first (CDATA, comment,
# doctype, processing instruction / xml decl, end tag, start-or-empty
# tag), then a run of character data up to the next '<'. Mirrors the
# event stream quick-xml produces for the reference: CDATA / comments /
# decls / PIs / Empty tags are distinct events the reference ignores
# (`abcd_parser.rs:129` catch-all), so matching-and-skipping them here
# reproduces the semantics exactly.
_TOKEN = re.compile(
    rb"<!\[CDATA\[.*?\]\]>"
    rb"|<!--.*?-->"
    rb"|<![^>]*>"
    rb"|<\?[^>]*\?>"
    rb"|</([^>]*)>"
    rb"|<([^>]*)>"
    rb"|([^<]+)"
    rb"|(<)",  # bare '<' forming no token: malformed-markup sentinel
    re.DOTALL,
)

_ATTR_VALUE = re.compile(rb'=\s*(?:"([^"]*)"|\'([^\']*)\')')


class AbcdParseError(ValueError):
    """Malformed XML (soft error — C2: warn + continue per record)."""


class AbcdNoDatasetMetadata(ValueError):
    """Document never reached ``<Units>`` (``abcd_parser.rs:154-156``)."""


@dataclass
class AbcdResult:
    """Parse result (``abcd_parser.rs:183-190``): one dataset row + N units."""

    dataset_id: str
    dataset_path: str
    landing_page: str
    provider_name: str
    dataset: dict[str, object]
    units: list[dict[str, object]]
    version: str = ABCD_VERSION_UNKNOWN


def _strip_tag(tag: bytes) -> bytes:
    """Drop the namespace prefix: ``abcd:Name`` → ``Name`` (``:173-179``)."""
    i = tag.find(b":")
    return tag[i + 1 :] if i >= 0 else tag


# raw tag bytes → namespace-stripped name. Distinct tags per corpus are
# bounded (~tens), so a capped memo turns the per-event split+find+slice
# into one dict hit — measured ~12% of parse time (profiled).
_TAG_NAME_CACHE: dict[bytes, bytes] = {}
_TAG_CACHE_MAX = 8192


def _tag_name(raw: bytes) -> bytes:
    v = _TAG_NAME_CACHE.get(raw)
    if v is None:
        v = _strip_tag(raw.split(None, 1)[0])
        if len(_TAG_NAME_CACHE) < _TAG_CACHE_MAX:
            _TAG_NAME_CACHE[raw] = v
    return v


def _parse_f64(s: str) -> float | None:
    """Rust ``str::parse::<f64>`` semantics: no underscores, no padding
    (input is pre-trimmed), ASCII only; inf/nan accepted (``:110-114``)."""
    if not s or "_" in s or not s.isascii():
        return None
    try:
        return float(s)
    except ValueError:
        return None


def parse_abcd(
    xml_bytes: bytes,
    registry: FieldRegistry,
    *,
    dataset_id: str = "",
    dataset_path: str = "",
    landing_page_proposal: str = "",
    provider_name: str = "",
    landing_page_field: str = DEFAULT_LANDING_PAGE_FIELD,
) -> AbcdResult:
    """Parse one ABCD XML document. Raises :class:`AbcdParseError` /
    :class:`AbcdNoDatasetMetadata`; callers in pipelines catch both and
    emit dead-letter rows (C2, ``/root/reference/src/main.rs:226-249``)."""
    fields_by_path = registry.by_path_bytes
    path = bytearray()
    values: dict[str, object] = {}
    dataset_data: dict[str, object] | None = None
    units: list[dict[str, object]] = []
    version = ABCD_VERSION_UNKNOWN

    # Every byte matches SOME alternative (text eats non-'<' runs, the
    # markup branches eat well-formed constructs, and the final bare-'<'
    # branch catches what nothing else can), so the token stream has no
    # gaps by construction — malformed markup surfaces as group 4
    # instead of a per-token position check (which cost two C calls per
    # event on the hot path).
    for m in _TOKEN.finditer(xml_bytes):
        gi = m.lastindex  # 1=end tag, 2=start tag, 3=text, None=ignored
        if gi is None:
            continue  # CDATA / comment / decl / PI — ignored events
        if gi == 4:
            raise AbcdParseError(f"unparsable markup at byte {m.start()}")
        if gi == 3:
            t = m.group(3).strip(_WS)  # trim_text(true)
            if not t:
                continue
            f = fields_by_path.get(bytes(path))
            if f is None:
                continue
            if f.numeric:
                num = _parse_f64(t.decode("utf-8", "replace"))
                if num is not None:
                    values[f.name] = num  # failed parse: silent drop
            else:
                # raw escaped bytes, UTF-8-lossy — byte-identical invariant
                values[f.name] = t.decode("utf-8", "replace")
        elif gi == 2:
            start_tag = m.group(2)
            if start_tag.endswith(b"/"):
                continue  # Empty element event — ignored (no path change)
            name = _tag_name(start_tag)
            path += b"/"
            path += name
            if path == b"/DataSets":
                raw = start_tag.split(None, 1)
                attrs = raw[1] if len(raw) > 1 else b""
                for g1, g2 in _ATTR_VALUE.findall(attrs):
                    val = g1 or g2
                    if val == _NS_206:
                        version = ABCD_VERSION_206
                        break
                    if val == _NS_210:
                        version = ABCD_VERSION_210
                        break
            elif path == b"/DataSets/DataSet/Units":
                dataset_data = values
                values = {}
        else:
            name = _tag_name(m.group(1))
            cut = len(path) - len(name) - 1
            if cut < 0:
                raise AbcdParseError("unbalanced end tag")
            del path[cut:]
            if name == b"Unit" and path == b"/DataSets/DataSet/Units":
                units.append(values)
                values = {}

    if dataset_data is None:
        raise AbcdNoDatasetMetadata("ABCD file contains no dataset metadata.")

    lp = dataset_data.get(landing_page_field)
    landing_page = lp if isinstance(lp, str) else landing_page_proposal

    return AbcdResult(
        dataset_id=dataset_id,
        dataset_path=dataset_path,
        landing_page=landing_page,
        provider_name=provider_name,
        dataset=dataset_data,
        units=units,
        version=version,
    )


def propose_landing_page(landingpage_url: str, dataset_url: str) -> str:
    """``"{landingpage_url}?archive={dataset_url}"`` — the fallback landing
    page (M4, ``/root/reference/src/main.rs:355-364``)."""
    return f"{landingpage_url}?archive={dataset_url}"


def format_vat_value(value: object) -> str:
    """Shortest-round-trip scalar formatting (M8, ``src/vat_type.rs:35-42``):
    Rust ``{}`` on f64 prints ``42`` for 42.0 and never uses exponent
    notation. Needed for byte-identical CSV output (W7)."""
    if value is None:
        return ""
    if isinstance(value, float):
        if value != value:  # NaN
            return "NaN"
        if value in (float("inf"), float("-inf")):
            return "inf" if value > 0 else "-inf"
        if value == int(value) and abs(value) < 1e16:
            return str(int(value))
        r = repr(value)
        if "e" in r or "E" in r:
            # expand exponent notation to plain decimal like Rust Display
            from decimal import Decimal

            r = format(Decimal(r), "f")
        return r
    return str(value)
