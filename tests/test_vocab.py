"""pipelines/vocab — corpus term/document frequencies via the
hash-partitioned combine; reference = a single-process pandas count."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vat_abcd_crawler_ray.pipelines.vocab import vocab_stats


def _corpus(rng, n=200):
    vocab = [f"w{i}" for i in range(60)]
    probs = np.arange(60, 0, -1, dtype=float)
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(vocab, rng.integers(5, 60), p=probs))
        for _ in range(n)
    ]
    return pd.DataFrame({"doc_id": range(n), "text": texts})


def _reference(df):
    words = df["text"].str.lower().str.findall(r"[a-z0-9]+")
    ex = words.explode().dropna()
    # NOTE: _WORD is [a-z]+ — digits split terms; mirror it exactly
    ex = df["text"].str.lower().str.findall(r"[a-z]+").explode().dropna()
    tf = ex.groupby(ex).size()
    docterm = ex.groupby([ex.index, ex]).size()
    dfreq = docterm.groupby(level=1).size()
    return tf, dfreq


@pytest.mark.usefixtures("ray_session")
class TestVocabStats:
    def test_matches_pandas_reference(self):
        rng = np.random.default_rng(0)
        df = _corpus(rng)
        ds = rd.from_pandas(df).repartition(5)
        top, stats = vocab_stats(ds, top_n=30)
        tf_ref, df_ref = _reference(df)
        assert stats["total_tokens"] == int(tf_ref.sum())
        assert stats["distinct_terms"] == len(tf_ref)
        want = (
            tf_ref.sort_values(ascending=False)
            .head(30)
        )
        got = top.set_index("term")
        # exact counts for every reported term
        for term in got.index:
            assert got.loc[term, "tf"] == tf_ref[term]
            assert got.loc[term, "df"] == df_ref[term]
        # the top-1 term is the true argmax
        assert got["tf"].iloc[0] == want.iloc[0]

    def test_min_count_filters(self):
        ds = rd.from_items([
            {"doc_id": 0, "text": "aa aa aa bb"},
            {"doc_id": 1, "text": "aa cc"},
        ])
        top, stats = vocab_stats(ds, top_n=10, min_count=2)
        assert list(top["term"]) == ["aa"]
        assert stats["distinct_terms"] == 1
        assert top["df"].iloc[0] == 2

    def test_deterministic_tie_break(self):
        ds = rd.from_items([{"doc_id": 0, "text": "b a c"}])
        top, _ = vocab_stats(ds, top_n=3)
        assert list(top["term"]) == ["a", "b", "c"]  # tf ties → lexicographic

    def test_empty_corpus(self):
        ds = rd.from_items([{"doc_id": 0, "text": ""}])
        top, stats = vocab_stats(ds)
        assert len(top) == 0 and stats["total_tokens"] == 0
