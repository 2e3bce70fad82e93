"""HTML → text/title/links extraction — the bridge between WARC
ingest (``sources/warc.py``) and the text curation tier, library-free.

Boilerplate-aware extraction engines (trafilatura/justext) rank
content blocks; this is the regex tier below them — script/style/
comment removal, tag stripping, entity decoding, whitespace collapse —
which is what the C4 pipeline itself used before line-level rules
(``clean_lines``) do the boilerplate work. Everything vectorizes as
pandas ``str`` chains over the batch; entity decoding maps the
C-implemented ``html.unescape`` per doc (a stdlib call per row, not a
Python parse loop).
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pandas as pd

# DOTALL blocks whose CONTENT must vanish, not just the tags
_HEAD = re.compile(r"(?is)<head\b.*?</head\s*>")
_SCRIPT = re.compile(r"(?is)<script\b.*?</script\s*>")
_STYLE = re.compile(r"(?is)<style\b.*?</style\s*>")
_COMMENT = re.compile(r"(?s)<!--.*?-->")
# block-level closers/openers become line breaks so clean_lines sees
# the document's visual line structure
_BLOCK = re.compile(
    r"(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|"
    r"header|footer|blockquote)\b[^>]*>"
)
_TAG = re.compile(r"(?s)<[^>]+>")
_TITLE = re.compile(r"(?is)<title\b[^>]*>(.*?)</title\s*>")
_HREF = re.compile(r"""(?i)<a\b[^>]*?href\s*=\s*["']([^"'#>][^"'>]*)["']""")
_WS = re.compile(r"[ \t\r\f\v]+")
_NL_RUN = re.compile(r"\n\s*\n+")


def html_to_text(htmls: pd.Series) -> pd.Series:
    """HTML strings → visible text: drop script/style/comment content,
    turn block boundaries into newlines, strip remaining tags, decode
    entities, collapse whitespace (newline structure preserved for the
    line-level cleaner)."""
    s = htmls.fillna("")
    s = s.str.replace(_HEAD, " ", regex=True)  # title/meta are not body
    s = s.str.replace(_TITLE, " ", regex=True)  # sloppy head-less pages
    s = s.str.replace(_SCRIPT, " ", regex=True)
    s = s.str.replace(_STYLE, " ", regex=True)
    s = s.str.replace(_COMMENT, " ", regex=True)
    s = s.str.replace(_BLOCK, "\n", regex=True)
    s = s.str.replace(_TAG, " ", regex=True)
    s = s.map(_html.unescape)
    s = s.str.replace(_WS, " ", regex=True)
    s = s.str.replace(_NL_RUN, "\n", regex=True)
    return s.str.strip()


def html_title(htmls: pd.Series) -> pd.Series:
    """First <title> content per doc (entity-decoded, collapsed), ""
    when absent."""
    t = htmls.fillna("").str.extract(_TITLE, expand=False).fillna("")
    return (
        t.map(_html.unescape).str.replace(_WS, " ", regex=True).str.strip()
    )


def html_links(htmls: pd.Series) -> pd.Series:
    """Per-doc list of href targets from anchor tags (fragment-only
    links excluded by the pattern) — the crawl-frontier feed."""
    return htmls.fillna("").str.findall(_HREF)


def decode_html_bytes(blobs: pd.Series, errors: str = "replace") -> pd.Series:
    """binary html → str via a cheap charset sniff: BOM, then a
    meta-charset scan of the head, else utf-8 with ``errors`` policy
    (the crawled-corpus reality: headers lie, utf-8-with-replacement
    is the robust default)."""
    meta = re.compile(
        rb"""(?i)<meta[^>]+charset\s*=\s*["']?([\w-]{2,20})"""
    )

    def one(b) -> str:
        if not b:
            return ""
        if b[:3] == b"\xef\xbb\xbf":
            return b[3:].decode("utf-8", errors)
        if b[:2] in (b"\xff\xfe", b"\xfe\xff"):
            return b.decode("utf-16", errors)
        m = meta.search(b[:4096])
        if m:
            try:
                return b.decode(m.group(1).decode("ascii"), errors)
            except (LookupError, UnicodeDecodeError):
                pass
        return b.decode("utf-8", errors)

    return blobs.map(one)


def page_records(df: pd.DataFrame, html_col: str = "html") -> pd.DataFrame:
    """WARC response rows → curation-ready page rows: decoded text,
    title, outgoing link count. One vectorized pass — the standard
    glue between ``read_warc`` and the documents schema."""
    text_html = decode_html_bytes(df[html_col])
    out = df.drop(columns=[html_col]).reset_index(drop=True)
    out["title"] = html_title(text_html).reset_index(drop=True)
    out["text"] = html_to_text(text_html).reset_index(drop=True)
    links = html_links(text_html)
    out["n_links"] = np.asarray([len(x) for x in links], dtype=np.int64)
    return out
