"""Text analysis function tests + DuckDB-parity spot checks."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from vat_abcd_crawler_ray.functions.textstats import (
    bpeish_token_count,
    fingerprint,
    langid,
    quality_features,
    token_count,
)


def test_token_count_matches_duckdb():
    texts = pd.Series(["a b  c", "", "  ", "one", "x\ty\nz w"])
    got = token_count(texts)
    con = duckdb.connect()
    want = con.execute(
        "SELECT length(regexp_extract_all(t, '\\S+')) FROM (SELECT unnest(?) t)",
        [texts.tolist()],
    ).fetchall()
    assert got.tolist() == [w[0] for w in want] == [3, 0, 0, 1, 4]


def test_bpeish_token_count():
    assert bpeish_token_count(pd.Series(["hello, world 42!"])).tolist() == [5]
    # hello / , / world / 42 / !


def test_quality_features():
    f = quality_features(pd.Series([
        "the cat and the dog sat on a mat in the sun",
        "!!! ??? ### $$$ %%%",
        "short",
    ]))
    assert f["n_tokens"].tolist() == [12, 5, 1]
    assert f["quality_score"][0] > 0.5
    assert f["quality_score"][1] == 0.0  # all punctuation
    assert f["quality_score"][2] == 0.0  # too short


def test_langid():
    texts = pd.Series([
        "the quick fox and the dog run to the house",
        "der hund und die katze ist nicht im haus",
        "le chat et le chien est dans la maison",
        "zzz qqq www",  # no stopwords → tie → 'en' precedence
    ])
    assert langid(texts) == ["en", "de", "fr", "en"]


def test_fingerprint_deterministic_and_order_sensitive():
    a = fingerprint(pd.Series(["one two three"]))
    b = fingerprint(pd.Series(["one  two\tthree"]))  # whitespace-normalized
    c = fingerprint(pd.Series(["three two one"]))
    assert a[0] == b[0]
    assert a[0] != c[0]
    # stable across calls/processes (no Python hash randomization)
    assert fingerprint(pd.Series(["one two three"]))[0] == a[0]


class TestScrubPII:
    """C4/RefinedWeb-style PII redaction with stable tokens."""

    def _scrub(self, *texts):
        import pandas as pd

        from vat_abcd_crawler_ray.functions.textstats import scrub_pii

        return scrub_pii(pd.Series(list(texts)))

    def test_email(self):
        df = self._scrub("mail bob.smith+tag@sub.example.co.uk now")
        assert df["text"][0] == "mail <EMAIL> now"
        assert df["n_email"][0] == 1

    def test_phone_formats(self):
        for t in ("+1 (415) 555-0134", "0049 89 123456", "415-555-0134"):
            df = self._scrub(f"call {t} today")
            assert df["text"][0] == "call <PHONE> today", t

    def test_ipv4_bounds(self):
        df = self._scrub("at 192.168.1.254 not 999.999.1.1 or 1.2.3")
        assert "<IP>" in df["text"][0]
        assert "999.999.1.1" in df["text"][0]  # not a valid octet run
        assert df["n_ip"][0] == 1

    def test_card_like(self):
        df = self._scrub("pay 4111 1111 1111 1111 or 4111-1111-1111-1111")
        assert df["text"][0].count("<CARD>") == 2

    def test_plain_numbers_survive(self):
        df = self._scrub("42 words, 3.14159, port 8080, year 2024")
        assert df["text"][0] == "42 words, 3.14159, port 8080, year 2024"
        assert (df.drop(columns="text").iloc[0] == 0).all()

    def test_stable_tokens_keep_dedup_equality(self):
        # two docs equal up to their PII scrub to identical strings
        a = self._scrub("reach me: alice@a.com / +1 415 555 0134 ok")
        b = self._scrub("reach me: bob@b.org / +44 20 7946 0958 ok")
        assert a["text"][0] == b["text"][0]

    def test_counts_feed_quality_filters(self):
        df = self._scrub(
            "a@b.co c@d.co e@f.co", "one a@b.co in prose about things"
        )
        assert df["n_email"][0] == 3 and df["n_email"][1] == 1

    def test_null_safe(self):
        import pandas as pd

        from vat_abcd_crawler_ray.functions.textstats import scrub_pii

        df = scrub_pii(pd.Series(["x a@b.co", None]))
        assert df["text"][0] == "x <EMAIL>"
        assert pd.isna(df["text"][1]) and df["n_email"][1] == 0


class TestCleanLines:
    """C4-style line filtering (Raffel et al. 2020 heuristics)."""

    def _clean(self, *texts, **kw):
        import pandas as pd

        from vat_abcd_crawler_ray.functions.textstats import clean_lines

        return clean_lines(pd.Series(list(texts)), **kw)

    def test_keeps_real_sentences(self):
        df = self._clean("This is a proper sentence that survives.")
        assert df["text"][0] == "This is a proper sentence that survives."
        assert df["n_kept"][0] == df["n_lines"][0] == 1

    def test_drops_nav_and_banners(self):
        df = self._clean(
            "Good opening sentence stays right here.\n"
            "Home | About | Contact\n"
            "Enable javascript to continue please sir.\n"
            "We use cookie consent tracking everywhere okay.\n"
            "Closing sentence also stays intact."
        )
        assert df["n_lines"][0] == 5 and df["n_kept"][0] == 2
        assert "javascript" not in df["text"][0]
        assert "|" not in df["text"][0]

    def test_min_words(self):
        df = self._clean("Too short.\nThis sentence has enough words.")
        assert df["text"][0] == "This sentence has enough words."
        df2 = self._clean("Too short.", min_words=2)
        assert df2["text"][0] == "Too short."

    def test_terminal_punctuation_optional(self):
        t = "a heading without any final punctuation at all"
        assert self._clean(t)["n_kept"][0] == 0
        assert self._clean(t, require_terminal=False)["n_kept"][0] == 1

    def test_code_fragments_dropped(self):
        df = self._clean('function f() { return "this is not prose"; }')
        assert df["n_kept"][0] == 0

    def test_empty_and_null_safe(self):
        import pandas as pd

        from vat_abcd_crawler_ray.functions.textstats import clean_lines

        df = clean_lines(pd.Series(["", None, "A fine sentence endures."]))
        assert list(df["n_kept"]) == [0, 0, 1]
        assert df["text"][2] == "A fine sentence endures."

    def test_counts_support_page_filters(self):
        # C4 drops pages with too few surviving sentences — the counts
        # are the page-level signal
        df = self._clean("x\ny\nz", "One good line ends properly here.")
        assert df["n_kept"][0] == 0 and df["n_kept"][1] == 1


class TestRepetitionFeatures:
    """Gopher repetition rules (Rae et al. 2021)."""

    def _rep(self, *texts):
        import pandas as pd

        from vat_abcd_crawler_ray.functions.textstats import (
            repetition_features,
        )

        return repetition_features(pd.Series(list(texts)))

    def test_duplicate_lines_flagged(self):
        df = self._rep("buy now\nbuy now\nbuy now\nunique line here")
        assert df["dup_line_frac"][0] == 0.5  # 2 repeats of 4 lines
        assert 0 < df["dup_line_char_frac"][0] < 1

    def test_clean_prose_low(self):
        df = self._rep(
            "a normal paragraph with no repetition at all in it today"
        )
        assert df["dup_line_frac"][0] == 0.0
        assert df["top_bigram_char_frac"][0] < 0.25  # Gopher keep-bar

    def test_spam_bigram_saturates(self):
        df = self._rep("spam spam spam spam spam spam spam spam")
        assert df["top_bigram_char_frac"][0] == 1.0

    def test_gopher_thresholds_separate_spam_from_prose(self):
        df = self._rep(
            "click here\nclick here\nclick here\nclick here",
            "The weather turned colder as autumn settled in. Birds flew "
            "south while leaves drifted across the quiet street.",
        )
        spam = (df["dup_line_frac"] > 0.3) | (
            df["top_bigram_char_frac"] > 0.2
        )
        assert list(spam) == [True, False]

    def test_empty_and_null(self):
        import pandas as pd

        from vat_abcd_crawler_ray.functions.textstats import (
            repetition_features,
        )

        df = repetition_features(pd.Series(["", None, "one fine line."]))
        assert (df.iloc[:2] == 0.0).all().all()
        assert df["dup_line_frac"][2] == 0.0

    def test_index_alignment(self):
        import pandas as pd

        from vat_abcd_crawler_ray.functions.textstats import (
            repetition_features,
        )

        s = pd.Series(
            ["x x x x x", "many different words avoid repeated pairs here"],
            index=[10, 20],
        )
        df = repetition_features(s)
        assert list(df.index) == [10, 20]
        assert df["top_bigram_char_frac"][10] > df["top_bigram_char_frac"][20]
