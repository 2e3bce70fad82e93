"""Similarity search: exact brute-force vs LSH recall; multimodal stages."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from vat_abcd_crawler_ray.pipelines.similarity import (
    kmeans_fit,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
)
from vat_abcd_crawler_ray.stages.multimodal import (
    DecodeImageStage,
    FrameSampleStage,
    ImageFeatureStage,
)


def _corpus(n=200, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    return [
        {"vec_id": i, "embedding": rng.normal(size=dim).tolist()} for i in range(n)
    ]


def _exact_topk(rows, queries, k):
    m = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = np.array([r["vec_id"] for r in rows])
    out = {}
    for _, q in queries.iterrows():
        qv = np.asarray(q["vector"], dtype=np.float64)
        qv = qv / np.linalg.norm(qv)
        sim = m @ qv
        keep = ids != q["query_id"]
        order = np.lexsort((ids[keep], -sim[keep]))[:k]
        out[q["query_id"]] = ids[keep][order].tolist()
    return out


@pytest.mark.usefixtures("ray_session")
class TestKnn:
    def test_bruteforce_matches_numpy_oracle(self):
        rows = _corpus()
        queries = pd.DataFrame(
            {
                "query_id": [0, 1, 2],
                "vector": [rows[0]["embedding"], rows[1]["embedding"], rows[2]["embedding"]],
            }
        )
        got = (
            knn_bruteforce(rd.from_items(rows).repartition(4), queries, k=5)
            .to_pandas()
            .sort_values(["query_id", "cos"], ascending=[True, False])
        )
        want = _exact_topk(rows, queries, 5)
        for qid, grp in got.groupby("query_id"):
            assert grp["neighbor_id"].tolist() == want[qid]

    def test_lsh_recall_reasonable(self):
        rows = _corpus(n=400)
        queries = pd.DataFrame(
            {
                "query_id": list(range(10)),
                "vector": [rows[i]["embedding"] for i in range(10)],
            }
        )
        approx = knn_lsh(
            rd.from_items(rows).repartition(4), queries, k=5, n_bits=2
        ).to_pandas()
        exact = _exact_topk(rows, queries, 5)
        hits = total = 0
        for qid in range(10):
            got = set(approx[approx["query_id"] == qid]["neighbor_id"])
            want = set(exact[qid])
            hits += len(got & want)
            total += len(want)
        assert hits / total > 0.3  # 2-bit LSH: ~1/4 of space probed

    def test_kmeans_deterministic_and_unit_norm(self):
        rows = _corpus(n=300)
        c1 = kmeans_fit(rd.from_items(rows).repartition(4), k=8, iters=4)
        c2 = kmeans_fit(rd.from_items(rows).repartition(4), k=8, iters=4)
        assert np.allclose(c1, c2)
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)

    def test_ivf_recall_and_exactness_at_full_probe(self):
        # clustered data: IVF cells align with true clusters
        rng = np.random.RandomState(11)
        centers = rng.normal(size=(6, 16)) * 4
        rows = [
            {"vec_id": i, "embedding": (centers[i % 6] + rng.normal(size=16)).tolist()}
            for i in range(360)
        ]
        queries = pd.DataFrame(
            {
                "query_id": list(range(8)),
                "vector": [rows[i]["embedding"] for i in range(8)],
            }
        )
        exact = _exact_topk(rows, queries, 5)
        approx = knn_ivf(
            rd.from_items(rows).repartition(4), queries, k=5,
            n_cells=6, n_probe=2, iters=4,
        ).to_pandas()
        hits = total = 0
        for qid in range(8):
            got = set(approx[approx["query_id"] == qid]["neighbor_id"])
            hits += len(got & set(exact[qid]))
            total += 5
        assert hits / total > 0.8  # probing 2/6 cells on clustered data

        # n_probe = n_cells ⇒ every cell probed ⇒ exact top-k
        full = knn_ivf(
            rd.from_items(rows).repartition(4), queries, k=5,
            n_cells=6, n_probe=6, iters=4,
        ).to_pandas()
        for qid in range(8):
            got = full[full["query_id"] == qid].sort_values(
                ["cos", "neighbor_id"], ascending=[False, True]
            )["neighbor_id"].tolist()
            assert got == exact[qid]


@pytest.mark.usefixtures("ray_session")
class TestMultimodal:
    def test_decode_and_features(self):
        rows = [{"media_id": i, "media": bytes([i]) * 100} for i in range(10)]
        ds = rd.from_items(rows).map_batches(
            DecodeImageStage,
            fn_constructor_kwargs={"out_hw": (8, 8)},
            batch_format="pyarrow",
            batch_size=4,
            concurrency=2,
        )
        feats = ds.map_batches(
            ImageFeatureStage, batch_format="pyarrow", batch_size=4, concurrency=2
        ).to_pandas()
        assert len(feats) == 10
        assert len(feats["features"].iloc[0]) == 3 + 8
        # deterministic: same bytes → same pixels/features
        f2 = (
            rd.from_items(rows)
            .map_batches(
                DecodeImageStage,
                fn_constructor_kwargs={"out_hw": (8, 8)},
                batch_format="pyarrow",
                batch_size=4,
                concurrency=2,
            )
            .map_batches(
                ImageFeatureStage, batch_format="pyarrow", batch_size=4, concurrency=2
            )
            .to_pandas()
        )
        a = np.stack(feats.sort_values("media_id")["features"].to_numpy())
        b = np.stack(f2.sort_values("media_id")["features"].to_numpy())
        assert np.allclose(a, b)

    def test_real_decoder_is_explicit_stub(self):
        with pytest.raises(NotImplementedError):
            DecodeImageStage(decoder="real")

    def test_frame_sample_explode(self):
        rows = [{"media_id": 1, "media": b"x" * 1000}]
        out = (
            rd.from_items(rows)
            .map_batches(
                FrameSampleStage,
                fn_constructor_kwargs={"frame_bytes": 256, "every_n": 2},
                batch_format="pyarrow",
                concurrency=1,
            )
            .to_pandas()
        )
        assert len(out) == 2  # ceil(1000/256)=4 chunks, every 2nd → 2
        assert out["frame_idx"].tolist() == [0, 1]
