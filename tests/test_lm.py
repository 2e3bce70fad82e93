"""functions/lm — byte-bigram perplexity (the CCNet-style LM quality
filter, library-free tier)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from vat_abcd_crawler_ray.functions.lm import (
    bigram_logprob,
    count_byte_bigrams,
    perplexity,
    train_byte_lm,
)

PROSE = [
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "She walked to the market in the morning and bought fresh bread.",
    "A long sentence about ordinary things that people write every day.",
    "Reading and writing are the oldest technologies we still use.",
] * 25


class TestCounts:
    def test_counts_match_naive(self):
        texts = pd.Series(["abcab", "xy"])
        c = count_byte_bigrams(texts)
        naive = np.zeros((256, 256), np.int64)
        for t in texts:
            prev = 0
            for ch in t.encode():
                naive[prev, ch] += 1
                prev = ch
        assert (c == naive).all()

    def test_no_cross_doc_pairs(self):
        # the last byte of doc A must not pair with doc B's BOS
        a = count_byte_bigrams(pd.Series(["ab", "cd"]))
        b = count_byte_bigrams(pd.Series(["ab"])) + count_byte_bigrams(
            pd.Series(["cd"])
        )
        assert (a == b).all()

    def test_logprob_normalized(self):
        c = count_byte_bigrams(pd.Series(["hello world"]))
        lp = bigram_logprob(c)
        rows = 2.0 ** lp
        np.testing.assert_allclose(rows.sum(axis=1), 1.0, rtol=1e-9)


@pytest.mark.usefixtures("ray_session")
class TestPerplexityFilter:
    def test_prose_beats_garbage(self):
        lp = train_byte_lm(rd.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(PROSE)]
        ))
        rng = np.random.default_rng(0)
        garbage = "".join(chr(rng.integers(33, 127)) for _ in range(200))
        base64ish = "QWxhZGRpbjpvcGVuIHNlc2FtZQ==" * 8
        scores = perplexity(pd.Series([
            "People write simple sentences about things they see.",
            garbage,
            base64ish,
        ]), lp)
        assert scores[0] < scores[1]
        assert scores[0] < scores[2]

    def test_training_distributed_matches_local(self):
        ds = rd.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(PROSE)]
        ).repartition(7)
        lp_dist = train_byte_lm(ds)
        lp_local = bigram_logprob(count_byte_bigrams(pd.Series(PROSE)))
        np.testing.assert_allclose(lp_dist, lp_local)

    def test_scoring_stage_over_dataset(self):
        import ray

        from vat_abcd_crawler_ray.functions.lm import perplexity_batch

        lp = train_byte_lm(rd.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(PROSE)]
        ))
        ref = ray.put(lp)
        docs = rd.from_items([
            {"doc_id": 0, "text": "An ordinary readable sentence."},
            {"doc_id": 1, "text": "zq9@#kkkk$%^&*xxxxxxx"},
            {"doc_id": 2, "text": ""},
        ])
        out = docs.map_batches(
            perplexity_batch(ref), batch_format="pandas"
        ).to_pandas().set_index("doc_id")
        assert out.loc[0, "ppl"] < out.loc[1, "ppl"]
        assert np.isnan(out.loc[2, "ppl"])

    def test_deterministic(self):
        texts = pd.Series(PROSE[:10])
        lp = bigram_logprob(count_byte_bigrams(texts))
        a, b = perplexity(texts, lp), perplexity(texts, lp)
        np.testing.assert_array_equal(a, b)
