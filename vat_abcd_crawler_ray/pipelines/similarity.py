"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is
  broadcast (``ray.put`` once), each batch does ONE numpy matmul and
  emits only its per-query partial top-k (combiner), the tiny final
  merge runs per query. Scales as a single pass over the corpus with
  k·Q rows through the reduce.
- :func:`knn_lsh` — the scale path: random-hyperplane LSH bucketing
  (sign bits → bucket id); each query probes only its bucket (and
  optionally neighboring buckets), turning the scan into a partition-
  pruned lookup. Recall < 1 by construction — measured in tests, not
  hidden.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def knn_bruteforce(
    ds: "ray.data.Dataset",
    queries: pd.DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """Exact top-k by cosine. ``queries``: DataFrame[query_id, vector].

    Output: (query_id, neighbor_id, cos) — per query the k highest
    cosines, ties broken by lower neighbor id (deterministic)."""
    qm = _normalize(_as_matrix(queries["vector"]))
    qids = queries[query_id_col].to_numpy()
    q_ref = ray.put((qids, qm))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids_, qm_ = ray.get(q_ref)
        ids = batch[id_col].to_numpy()
        m = _normalize(_as_matrix(batch[vec_col]))
        sim = qm_ @ m.T  # (Q, B)
        out_q, out_n, out_c = [], [], []
        for qi in range(len(qids_)):
            s = sim[qi]
            nb_ids = ids
            if exclude_self:
                keep = nb_ids != qids_[qi]
                s, nb_ids = s[keep], nb_ids[keep]
            if len(s) == 0:
                continue
            top = min(k, len(s))
            # deterministic partial top-k: sort by (-cos, id)
            order = np.lexsort((nb_ids, -s))[:top]
            out_q.extend([qids_[qi]] * top)
            out_n.extend(nb_ids[order])
            out_c.extend(s[order])
        return pd.DataFrame(
            {query_id_col: out_q, "neighbor_id": out_n, "cos": out_c}
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cos", "neighbor_id"], ascending=[False, True], kind="mergesort"
        )
        return g.head(k)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(query_id_col)
        .map_groups(merge, batch_format="pandas")
    )


def _hyperplanes(
    dim: int, n_bits: int, seed: int = 42, projection: str = "random"
) -> np.ndarray:
    """``random``: Gaussian hyperplanes (the classic sign-LSH).
    ``axis``: hyperplane j = coordinate axis e_j — deterministic and
    exactly reproducible in SQL (sign of ``embedding[j]``), used by the
    oracle-gated configuration; equivalent to random projections when
    the embedding basis is itself unstructured."""
    if projection == "axis":
        if n_bits > dim:
            raise ValueError(f"axis projection needs n_bits <= dim ({n_bits} > {dim})")
        return np.eye(n_bits, dim)
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_bits, dim))


def lsh_bucket_ids(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit bucket id per row."""
    bits = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
    return bits @ weights


def knn_lsh(
    ds: "ray.data.Dataset",
    queries: pd.DataFrame,
    k: int = 5,
    n_bits: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    seed: int = 42,
    exclude_self: bool = True,
    projection: str = "random",
) -> "ray.data.Dataset":
    """Approximate top-k: corpus rows hash to 2^n_bits sign-LSH buckets;
    each query is answered from its own bucket only. One groupby
    shuffle on the bucket id; within-bucket exact cosine."""
    dim = len(queries["vector"].iloc[0])
    planes = _hyperplanes(dim, n_bits, seed, projection)
    qm = _normalize(_as_matrix(queries["vector"]))
    qids = queries[query_id_col].to_numpy()
    q_buckets = lsh_bucket_ids(qm, planes)
    q_ref = ray.put((qids, qm, q_buckets))
    planes_ref = ray.put(planes)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_as_matrix(batch[vec_col]))
        return batch.assign(__bucket=lsh_bucket_ids(m, ray.get(planes_ref)))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        qids_, qm_, qb_ = ray.get(q_ref)
        b = group["__bucket"].iloc[0]
        sel = np.flatnonzero(qb_ == b)
        if len(sel) == 0:
            return pd.DataFrame(
                {
                    query_id_col: pd.Series(dtype=np.int64),
                    "neighbor_id": pd.Series(dtype=np.int64),
                    "cos": pd.Series(dtype=np.float64),
                }
            )
        ids = group[id_col].to_numpy()
        m = _normalize(_as_matrix(group[vec_col]))
        sim = qm_[sel] @ m.T
        out_q, out_n, out_c = [], [], []
        for row, qi in enumerate(sel):
            s, nb = sim[row], ids
            if exclude_self:
                keep = nb != qids_[qi]
                s, nb = s[keep], nb[keep]
            top = min(k, len(s))
            order = np.lexsort((nb, -s))[:top]
            out_q.extend([qids_[qi]] * top)
            out_n.extend(nb[order])
            out_c.extend(s[order])
        return pd.DataFrame(
            {query_id_col: out_q, "neighbor_id": out_n, "cos": out_c}
        )

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
