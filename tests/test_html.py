"""functions/html — library-free HTML → text/title/links extraction
(the WARC → curation bridge)."""

import pandas as pd
import pytest

from vat_abcd_crawler_ray.functions.html import (
    decode_html_bytes,
    html_links,
    html_title,
    html_to_text,
    page_records,
)

PAGE = """<!DOCTYPE html><html><head>
<title>The &amp; Title</title>
<style>body { color: red; }</style>
<script>var x = "<p>not text</p>";</script>
</head><body>
<!-- a comment with words -->
<h1>Heading here</h1>
<p>First paragraph with <b>bold</b> text.</p>
<p>Second &quot;paragraph&quot; &#8212; with entities.</p>
<ul><li>item one</li><li>item two</li></ul>
<a href="https://a.example/next">next</a>
<a href="/relative/path">rel</a>
<a href="#fragment">frag</a>
</body></html>"""


class TestHtmlToText:
    def test_strips_script_style_comments(self):
        t = html_to_text(pd.Series([PAGE]))[0]
        assert "not text" not in t
        assert "color" not in t
        assert "comment with words" not in t

    def test_keeps_visible_text_and_entities(self):
        t = html_to_text(pd.Series([PAGE]))[0]
        assert "First paragraph with bold text." in t
        assert '"paragraph" — with entities' in t

    def test_block_tags_become_lines(self):
        t = html_to_text(pd.Series([PAGE]))[0]
        lines = t.split("\n")
        assert any(ln.strip() == "Heading here" for ln in lines)
        assert any("item one" in ln and "item two" not in ln
                   for ln in lines)

    def test_null_and_plain(self):
        out = html_to_text(pd.Series([None, "no tags at all"]))
        assert out[0] == "" and out[1] == "no tags at all"


class TestTitleAndLinks:
    def test_title(self):
        assert html_title(pd.Series([PAGE]))[0] == "The & Title"
        assert html_title(pd.Series(["<p>no title</p>"]))[0] == ""

    def test_links_excluding_fragments(self):
        links = html_links(pd.Series([PAGE]))[0]
        assert links == ["https://a.example/next", "/relative/path"]


class TestDecodeBytes:
    def test_utf8_and_bom(self):
        s = decode_html_bytes(pd.Series([
            "héllo".encode(), b"\xef\xbb\xbf" + "héllo".encode(), None,
        ]))
        assert list(s) == ["héllo", "héllo", ""]

    def test_meta_charset(self):
        blob = ('<meta charset="iso-8859-1"><p>caf\xe9</p>'
                .encode("latin-1"))
        assert "café" in decode_html_bytes(pd.Series([blob]))[0]

    def test_bad_bytes_replaced_not_raised(self):
        out = decode_html_bytes(pd.Series([b"ok \xff\xfe\xff broken"]))
        assert "ok" in out[0]


class TestPageRecords:
    def test_warc_to_curation_glue(self):
        df = pd.DataFrame({
            "url": ["https://a.example/", "https://b.example/"],
            "html": [PAGE.encode(), b"<html><body>tiny</body></html>"],
        })
        out = page_records(df)
        assert list(out.columns) == ["url", "title", "text", "n_links"]
        assert out["title"][0] == "The & Title"
        assert out["n_links"][0] == 2 and out["n_links"][1] == 0
        assert "Heading here" in out["text"][0]


@pytest.mark.usefixtures("ray_session")
def test_warc_to_text_pipeline(tmp_path):
    """The full ingest chain: .warc.gz → response rows → decoded text
    → token counts, all through the Dataset."""
    from vat_abcd_crawler_ray.functions.textstats import token_count
    from vat_abcd_crawler_ray.sources.warc import read_warc, write_warc

    recs = [{
        "url": f"https://h.example/p{i}",
        "status": 200,
        "content_type": "text/html",
        "body": f"<html><title>t{i}</title><body><p>{'word ' * 30}"
                f"</p></body></html>".encode(),
    } for i in range(20)]
    p = tmp_path / "x.warc.gz"
    p.write_bytes(write_warc(recs, gz=True))

    def glue(df: pd.DataFrame) -> pd.DataFrame:
        out = page_records(df[["url", "html"]])
        out["n_tokens"] = token_count(out["text"])
        return out

    got = read_warc(str(p)).map_batches(
        glue, batch_format="pandas"
    ).to_pandas()
    assert len(got) == 20
    assert (got["n_tokens"] == 30).all()
    assert got["title"].str.startswith("t").all()
