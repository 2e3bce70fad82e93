"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is
  broadcast (``ray.put`` once), each batch does ONE numpy matmul and
  emits only its per-query partial top-k (combiner), the tiny final
  merge runs per query. Scales as a single pass over the corpus with
  k·Q rows through the reduce.
- :func:`knn_lsh` — scale path 1: random-hyperplane LSH bucketing
  (sign bits → bucket id); each query probes only its bucket (and
  optionally neighboring buckets), turning the scan into a partition-
  pruned lookup. Recall < 1 by construction — measured in tests, not
  hidden.
- :func:`kmeans_fit` + :func:`knn_ivf` — scale path 2 (IVF): a few
  distributed Lloyd iterations (broadcast centroids in, KB-sized
  per-batch (sum, count) partials out — one pass per iteration), then
  rows partition by nearest centroid and each query probes its
  ``n_probe`` nearest cells. Deterministic: centroid init = the k
  smallest-id vectors, no randomness anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _matrix_from_arrow(arr, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from an Arrow list/fixed_size_list column —
    one flat buffer copy, no per-row Python (``_as_matrix`` measured
    seconds per 100k rows; this is milliseconds). With
    ``dtype=np.float32`` over a ``list<float>`` column the flat buffer
    is used zero-copy — half the bytes through the memory controller,
    which is what the scan's throughput is bound by."""
    import pyarrow as pa

    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if not len(a):
        return np.zeros((0, 1), dtype)
    flat = a.flatten().to_numpy(zero_copy_only=False).astype(dtype, copy=False)
    return flat.reshape(len(a), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def _scan_matrices(vec_arrow) -> tuple[np.ndarray, np.ndarray]:
    """(raw_rank, raw32) for the mixed-precision scan, chosen from the
    Arrow value type: for ``list<float>`` raw32 is the zero-copy
    float32 buffer and raw_rank IS raw32 (f32→f64 is exact, so the
    re-rank reproduces the all-float64 path bit for bit); for
    ``list<double>`` the native float64 matrix is KEPT as raw_rank and
    raw32 is a prefilter-only copy — unconditionally casting to f32
    made the 'float64 re-rank' start from lossy values and could flip
    near-tie orderings for float64-stored corpora."""
    import pyarrow as pa

    a = (
        vec_arrow.combine_chunks()
        if isinstance(vec_arrow, pa.ChunkedArray)
        else vec_arrow
    )
    if len(a) and pa.types.is_float64(a.type.value_type):
        raw64 = _matrix_from_arrow(a, np.float64)
        return raw64, raw64.astype(np.float32)
    raw32 = _matrix_from_arrow(a, np.float32)
    return raw32, raw32


def _block_topk_mixed(
    qids_sel: np.ndarray,
    qm64_sel: np.ndarray,
    qm32_sel: np.ndarray,
    ids: np.ndarray,
    vec_arrow,
    k: int,
    exclude_self: bool,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mixed-precision block top-k: the corpus-side scan runs in
    float32 (zero-copy from the ``list<float>`` buffer, half the
    memory traffic, double the SIMD width), then ONLY the selected
    candidates are recomputed in float64 from the column's native
    precision (:func:`_scan_matrices`) — bit-identical to the old
    all-float64 path's scores — so the final ranking keeps float64
    semantics. The float32 prefilter keeps a widened slack window
    (k+16 per query inside :func:`_vectorized_topk`); a true top-k
    member is lost only if >16 candidates score within the ~1e-6
    float32 error of the k-th — far past the exact-tie hazard the old
    path already had with its k+8 window."""
    raw_rank, raw32 = _scan_matrices(vec_arrow)
    return _topk_mixed_rows(
        qids_sel, qm64_sel, qm32_sel, ids, raw_rank, _normalize(raw32), k,
        exclude_self,
    )


def _topk_mixed_rows(
    qids_sel: np.ndarray,
    qm64_sel: np.ndarray,
    qm32_sel: np.ndarray,
    ids: np.ndarray,
    raw_rank: np.ndarray,
    m32: np.ndarray,
    k: int,
    exclude_self: bool,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Core of :func:`_block_topk_mixed` over precomputed row slices
    (the LSH path calls it once per contiguous bucket slice).
    ``raw_rank`` carries the column's NATIVE precision for the re-rank
    (float32 for list<float>, float64 for list<double>)."""
    qv, nv, _cv32, qrows, rows = _vectorized_topk(
        qids_sel,
        qm32_sel @ m32.T,
        ids,
        k,
        exclude_self=exclude_self,
        extras=True,
        slack=16,
    )
    if not len(rows):
        return qv, nv, np.zeros(0, np.float64)
    # float64 re-rank of the selected pairs only, from the NATIVE
    # precision (f32→f64 is exact for list<float> storage; list<double>
    # storage arrives here uncast), so these are the very values the
    # old all-float64 path produced: flat buffer → f64 → normalize → dot
    cand64 = _normalize(raw_rank[rows].astype(np.float64, copy=False))
    cs64 = np.einsum("ij,ij->i", qm64_sel[qrows], cand64)
    # truncate the widened window back to top-k per query under the
    # FLOAT64 order, so partial volume matches the old path exactly
    order = np.lexsort((nv, -cs64, qrows))
    qv, nv, cs64, qrows = qv[order], nv[order], cs64[order], qrows[order]
    grp_start = np.r_[True, qrows[1:] != qrows[:-1]]
    idx0 = np.flatnonzero(grp_start)
    rank = np.arange(len(qrows)) - idx0[np.cumsum(grp_start) - 1]
    keep = rank < k
    return qv[keep], nv[keep], cs64[keep]


def _vectorized_topk(
    qids_sel: np.ndarray,
    sim: np.ndarray,
    ids: np.ndarray,
    k: int,
    exclude_self: bool = True,
    extras: bool = False,
    slack: int = 8,
) -> tuple:
    """Per-query top-k of ``sim`` (Q_sel, B) in (-cos, neighbor_id)
    order, across ALL queries at once: argpartition with a small tie
    slack + ONE lexsort — the knn_bruteforce partial pattern, shared so
    the LSH/IVF group functions never loop per query (the old
    ``for row, qi in enumerate(sel)`` loops were bounded by Q but
    dominated group time once Q reached 10^3).

    Returns (query_ids, neighbor_ids, cos) aligned arrays; self-matches
    are masked to -inf and dropped when ``exclude_self``. ``sim`` is
    mutated in place by the self mask (callers pass a fresh matmul
    result). With ``extras=True`` two more aligned arrays are returned:
    the query-row index into ``qids_sel`` and the corpus ROW index of
    each neighbor (for mixed-precision re-ranking); ``slack`` widens
    the per-query candidate window beyond ``k`` — and with extras the
    whole k+slack window is returned (the caller re-ranks and
    truncates), otherwise only the top k survive."""
    B = sim.shape[1]
    if exclude_self:
        sim[qids_sel[:, None] == ids[None, :]] = -np.inf
    kk = min(k + slack, B)
    idx = (
        np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
        if kk < B
        else np.broadcast_to(np.arange(B), sim.shape).copy()
    )
    cand = np.take_along_axis(sim, idx, axis=1)  # (Q_sel, kk)
    nb = ids[idx]
    qrow = np.repeat(np.arange(sim.shape[0]), kk)
    order = np.lexsort((nb.ravel(), -cand.ravel(), qrow))
    qs = qrow[order]
    ns = nb.ravel()[order]
    cs = cand.ravel()[order]
    keep = np.isfinite(cs)
    if not extras:
        keep &= np.arange(len(qs)) % kk < k
        return qids_sel[qs[keep]], ns[keep], cs[keep]
    rows = idx.ravel()[order]
    return (
        qids_sel[qs[keep]],
        ns[keep],
        cs[keep],
        qs[keep],
        rows[keep],
    )


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
    q_ref = ray.put((qids, qm, qm.astype(np.float32)))

    def partial(t):
        import pyarrow as pa

        qids_, qm_, qm32_ = ray.get(q_ref)
        empty = pa.table(
            {
                query_id_col: pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        )
        if not t.num_rows:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False)
        # mixed-precision scan: float32 matmul over the zero-copy
        # list<float> buffer, float64 re-rank of the k+16 window —
        # shared with the LSH/IVF paths
        qv, nv, cv = _block_topk_mixed(
            qids_, qm_, qm32_, ids, t[vec_col], k, exclude_self
        )
        return pa.table(
            {
                query_id_col: pa.array(qv),
                "neighbor_id": pa.array(nv),
                "cos": pa.array(cv),
            }
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cos", "neighbor_id"], ascending=[False, True], kind="mergesort"
        )
        return g.head(k)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(_merge_block_count(len(qids), k))
        .groupby(query_id_col)
        .map_groups(merge, batch_format="pandas")
    )


def _merge_block_count(n_queries: int, k: int) -> int:
    """Block count for the per-query top-k merge: the partials total
    ~ Q×k×input_blocks rows, so coalesce to ~64k rows per merge block
    but never beyond the CPU count. Both failure modes were measured:
    50 queries on 32 CPUs un-coalesced scheduled 64 map+reduce tasks
    over ~32k rows (per-task overhead anti-scaled), and 2000 queries
    coalesced to ONE block serialized the whole merge into a single
    task (5.4 s for ~20 ms of parallel compute)."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    est_partial_rows = n_queries * k * (ncpu * 2)
    return max(1, min(ncpu, (est_partial_rows + 65535) // 65536))


def kmeans_fit(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    iters: int = 5,
) -> np.ndarray:
    """Spherical k-means (cosine) by distributed Lloyd iterations.

    Each iteration: centroids broadcast once (``ray.put``); every batch
    assigns its rows by max dot product and emits per-cell (sum, count)
    partials — k·dim floats per batch regardless of batch size; the
    driver combines partials and renormalizes. Empty cells keep their
    previous centroid. Returns (k, dim) unit-norm centroids.

    Init = the k smallest-id vectors, found by a per-batch partial
    min-k (each batch emits ≤ k rows) + a tiny driver combine — no
    global sort shuffle for k rows."""

    def partial_min_k(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, id_col)[[id_col, vec_col]]

    init = (
        ds.select_columns([id_col, vec_col])
        .map_batches(partial_min_k, batch_format="pandas")
        .to_pandas()
        .nsmallest(k, id_col)
    )
    cents = _normalize(_as_matrix(init[vec_col]))

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(t) -> pd.DataFrame:
            c = ray.get(ref)
            m = _normalize(_matrix_from_arrow(t[vec_col]))
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            cnts = np.bincount(assign, minlength=len(c))
            return pd.DataFrame(
                {
                    "cell": np.arange(len(c)),
                    "vsum": list(sums),
                    "cnt": cnts,
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(cents)
        cnts = np.zeros(len(cents), dtype=np.int64)
        for cell, vsum, cnt in zip(parts["cell"], parts["vsum"], parts["cnt"]):
            sums[cell] += np.asarray(vsum)
            cnts[cell] += cnt
        nonempty = cnts > 0
        cents = cents.copy()
        cents[nonempty] = _normalize(sums[nonempty])
    return cents


def knn_ivf(
    ds: "ray.data.Dataset",
    queries: pd.DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> "ray.data.Dataset":
    """IVF approximate top-k: corpus rows partition by nearest
    centroid (ONE cell-id shuffle); each query is answered from its
    ``n_probe`` nearest cells, then a tiny per-query merge picks the
    global top-k. Recall grows with n_probe (n_probe = n_cells ⇒
    exact)."""
    cents = kmeans_fit(ds, vec_col, id_col, n_cells, iters)
    qm = _normalize(_as_matrix(queries["vector"]))
    qids = queries[query_id_col].to_numpy()
    # each query's probe cells: top-n_probe centroid dots
    order = np.argsort(-(qm @ cents.T), axis=1, kind="stable")
    probes = order[:, :n_probe]  # (Q, n_probe)
    q_ref = ray.put((qids, qm, qm.astype(np.float32), probes))
    cents_ref = ray.put(cents)

    import pyarrow as pa

    _EMPTY = pa.table(
        {
            query_id_col: pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
        }
    )

    def bucketize(t: "pa.Table") -> "pa.Table":
        c = ray.get(cents_ref)
        m = _normalize(_matrix_from_arrow(t[vec_col]))
        return t.append_column(
            "__cell", pa.array(np.argmax(m @ c.T, axis=1).astype(np.int64))
        )

    def per_cell(t: "pa.Table") -> "pa.Table":
        qids_, qm_, qm32_, probes_ = ray.get(q_ref)
        cell = t["__cell"][0].as_py()
        sel = np.flatnonzero((probes_ == cell).any(axis=1))
        if len(sel) == 0:
            return _EMPTY
        ids = t[id_col].to_numpy(zero_copy_only=False)
        qv, nv, cv = _block_topk_mixed(
            qids_[sel], qm_[sel], qm32_[sel], ids, t[vec_col], k, exclude_self
        )
        return pa.table(
            {
                query_id_col: pa.array(qv),
                "neighbor_id": pa.array(nv),
                "cos": pa.array(cv),
            }
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cos", "neighbor_id"], ascending=[False, True], kind="mergesort"
        )
        return g.head(k)

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__cell")
        .map_groups(per_cell, batch_format="pyarrow")
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
    each query is answered from its own bucket only.

    SHUFFLE-FREE: the embeddings never move. Each block hashes its own
    rows, runs one blocked matmul per (bucket with queries) — flops =
    brute force ÷ 2^n_bits — and emits per-query partial top-k rows;
    a tiny per-query merge (≤ k rows × blocks per query) reduces them,
    exactly the brute-force combiner. The previous formulation
    (groupby(__bucket) + exact within bucket) moved the full embedding
    table through an all-to-all — measured 3× SLOWER at 32 CPUs than
    at 8 on 400k×64d with Q=2000 (the shuffle, not the math, was the
    cost); this one scales like the extract stage, and at 100 TB the
    vectors stay where they were read."""
    dim = len(queries["vector"].iloc[0])
    planes = _hyperplanes(dim, n_bits, seed, projection)
    qm = _normalize(_as_matrix(queries["vector"]))
    qids = queries[query_id_col].to_numpy()
    q_buckets = lsh_bucket_ids(qm, planes)
    # pre-group the queries by bucket ONCE on the driver: each block
    # task then slices its per-bucket query matrix contiguously
    qorder = np.argsort(q_buckets, kind="stable")
    n_buckets = 1 << n_bits
    qbounds = np.searchsorted(q_buckets[qorder], np.arange(n_buckets + 1))
    qm_o = qm[qorder]
    q_ref = ray.put((qids[qorder], qm_o, qm_o.astype(np.float32), qbounds))
    planes_ref = ray.put(planes)

    import pyarrow as pa

    _EMPTY = pa.table(
        {
            query_id_col: pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
        }
    )

    def partial(t: "pa.Table") -> "pa.Table":
        if not t.num_rows:
            return _EMPTY
        qids_s, qm_s, qm32_s, qbounds_ = ray.get(q_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        raw_rank, raw32 = _scan_matrices(t[vec_col])
        m32 = _normalize(raw32)
        # bucket ids from the float32-normalized matrix: f64→f32 cast
        # and division by a positive norm both preserve sign, so
        # projection SIGNS match the float64 path exactly for the
        # axis-projection config the oracle models; random-plane
        # recall is tolerance-tested
        rb = lsh_bucket_ids(m32, ray.get(planes_ref))
        # sort the block's rows by bucket once: every per-bucket
        # matmul below is then a CONTIGUOUS slice of both operands
        # (per-bucket flatnonzero gathers measured ~3× this)
        rorder = np.argsort(rb, kind="stable")
        raw_rank_s = raw_rank[rorder]
        m32_s = m32[rorder]
        ids_s = ids[rorder]
        rbounds = np.searchsorted(rb[rorder], np.arange(len(qbounds_)))
        out_q, out_n, out_c = [], [], []
        # loop over the ≤ 2^n_bits buckets with BOTH rows and queries
        # — bounded by config, fully vectorized within each bucket,
        # flops = brute force ÷ 2^n_bits
        for b in range(len(qbounds_) - 1):
            q0, q1 = qbounds_[b], qbounds_[b + 1]
            r0, r1 = rbounds[b], rbounds[b + 1]
            if q0 == q1 or r0 == r1:
                continue
            qv, nv, cv = _topk_mixed_rows(
                qids_s[q0:q1],
                qm_s[q0:q1],
                qm32_s[q0:q1],
                ids_s[r0:r1],
                raw_rank_s[r0:r1],
                m32_s[r0:r1],
                k,
                exclude_self,
            )
            out_q.append(qv)
            out_n.append(nv)
            out_c.append(cv)
        if not out_q:
            return _EMPTY
        return pa.table(
            {
                query_id_col: pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "cos": pa.array(np.concatenate(out_c)),
            }
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cos", "neighbor_id"], ascending=[False, True], kind="mergesort"
        )
        return g.head(k)

    # same data-volume-sized coalesce as knn_bruteforce: the merge
    # shuffle moves k·Q·blocks tiny rows, never embeddings
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(_merge_block_count(len(qids), k))
        .groupby(query_id_col)
        .map_groups(merge, batch_format="pandas")
    )
