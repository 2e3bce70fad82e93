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
