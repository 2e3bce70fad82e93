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


@pytest.mark.usefixtures("ray_session")
class TestTfidfVectors:
    def test_values_match_manual_computation(self):
        from vat_abcd_crawler_ray.pipelines.vocab import tfidf_vectors

        docs = [
            {"doc_id": 0, "text": "apple apple banana"},
            {"doc_id": 1, "text": "banana cherry"},
            {"doc_id": 2, "text": "cherry cherry cherry"},
        ]
        ds = rd.from_items(docs)
        top, stats = vocab_stats(ds, top_n=10)
        out = (
            tfidf_vectors(ds, top, n_docs=3)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        terms = list(top["term"])
        dfreq = dict(zip(top["term"], top["df"]))
        for d in docs:
            counts = pd.Series(d["text"].split()).value_counts()
            vec = np.array([
                counts.get(t, 0) * np.log(3 / dfreq[t]) for t in terms
            ])
            nrm = np.linalg.norm(vec)
            vec = vec / nrm if nrm > 0 else vec
            got = np.asarray(out.loc[d["doc_id"], "embedding"])
            np.testing.assert_allclose(got, vec, atol=1e-6)

    def test_feeds_knn(self):
        from vat_abcd_crawler_ray.pipelines.similarity import knn_bruteforce
        from vat_abcd_crawler_ray.pipelines.vocab import tfidf_vectors

        rng = np.random.default_rng(1)
        rows = []
        for i in range(30):
            topic = "xx yy zz" if i % 2 else "aa bb cc"
            noise = " ".join(rng.choice(list("defghijk"), 5))
            rows.append({"doc_id": i, "text": f"{topic} {noise}"})
        ds = rd.from_items(rows)
        top, _ = vocab_stats(ds, top_n=20)
        emb = tfidf_vectors(ds, top, n_docs=30).map_batches(
            lambda df: df.rename(columns={"doc_id": "vec_id"}),
            batch_format="pandas",
        )
        q = pd.DataFrame({
            "query_id": [0],
            "vector": [np.asarray(
                emb.to_pandas().set_index("vec_id").loc[0, "embedding"]
            )],
        })
        nn = knn_bruteforce(emb, q, k=5).to_pandas()
        # doc 0's topic is the odd-doc topic — neighbors share parity
        assert all(n % 2 == 0 for n in nn["neighbor_id"])
