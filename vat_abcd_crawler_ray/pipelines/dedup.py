"""Deduplication family over a document Dataset — the training-data
core ops: exact (hash-partitioned first-wins), MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Design (all Ray-Data-first):

- **exact**: content key per batch (vectorized) → ``groupby(key)`` →
  per-group first-wins by min id — the T1 surrogate-dedup semantics
  (``/root/reference/src/storage/surrogate_key.rs:16-41``) applied to
  content instead of URLs. Only (key64, row) shuffles; within-group
  exact-text check guards hash collisions.
- **minhash-LSH**: per batch shingle → k-permutation MinHash (numpy) →
  explode to ``(band_id, band_hash, id, signature)`` rows — the fixed
  512-byte signature travels through the shuffle, the text does NOT —
  → groupby band bucket → candidate pairs verified by
  signature-estimated Jaccard → connected components via min-label
  propagation → keep min id per cluster.
- **ngram-jaccard**: exact word-n-gram Jaccard verification for a
  given candidate pair set (the precise second pass).
- **simhash**: 64-bit token simhash; near-dup = Hamming ≤ r with
  4×16-bit band blocking (pigeonhole: distance ≤ 3 ⇒ one band equal).
- **embedding near-dup**: block-wise cosine pairs via per-group numpy
  matmul (block = label here; kmeans/LSH cell at scale).

Deterministic: permutation parameters derive from a fixed seed; all
tiebreaks by min id; no wall-clock anywhere.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

from ..functions.urlkeys import murmur3_64

_TOKEN = re.compile(r"\S+")

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    key_len: int | None = None,
) -> "ray.data.Dataset":
    """Keep the min-``id`` row per distinct text (optionally per text
    prefix of ``key_len`` chars)."""

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        keys = batch[text_col].str[:key_len] if key_len else batch[text_col]
        return batch.assign(
            __k=np.fromiter(
                (murmur3_64(t) for t in keys), dtype=np.int64, count=len(keys)
            ),
            __ckey=keys,
        )

    def first_wins(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.sort_values(id_col, kind="mergesort")
            .drop_duplicates("__ckey", keep="first")
            .drop(columns=["__k", "__ckey"])
        )

    return (
        ds.map_batches(add_key, batch_format="pandas")
        .groupby("__k")
        .map_groups(first_wins, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# shingles + MinHash
# ---------------------------------------------------------------------------


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 61, size=num_perm).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, 1 << 61, size=num_perm).astype(np.uint64)
    return a, b


_ROLL_P = np.uint64(1099511628211)  # FNV prime as the polynomial base


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of the k-byte shingle set — fully vectorized
    polynomial rolling hash over the UTF-8 bytes (no per-shingle Python
    loop), finalized with an fmix64-style avalanche."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = len(data)
    if n < k:
        return np.array([murmur3_64(text) & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    h = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):  # k (=5) vectorized passes, not n passes
        h = h * _ROLL_P + data[j : n - k + 1 + j].astype(np.uint64)
    # avalanche (murmur3 fmix64 constants) then dedupe
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return np.unique(h)


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of the affine family a*x+b in uint64 (wraparound
    multiply — the standard fast variant; uniformity is preserved and
    determinism is exact)."""
    v = a[:, None] * shingles[None, :] + b[:, None]
    return v.min(axis=1)


def word_ngrams(text: str, n: int = 3) -> set[tuple[str, ...]]:
    toks = _TOKEN.findall(text)
    if len(toks) < n:
        return {tuple(toks)}
    return {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard — the precise verifier."""
    sa, sb = word_ngrams(text_a, n), word_ngrams(text_b, n)
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0


def _components_min_label(edges: pd.DataFrame) -> dict:
    """Connected components by iterated min-label propagation. Driver
    loop over the VERIFIED edge set (sparse); at 10^10 docs the same
    relaxation runs as groupby rounds over an edge Dataset."""
    label: dict = {}
    if not len(edges):
        return label
    ids = pd.unique(pd.concat([edges["src"], edges["dst"]]))
    label = {i: i for i in ids}
    changed = True
    while changed:
        changed = False
        for s, d in edges.itertuples(index=False):
            m = min(label[s], label[d])
            if label[s] != m or label[d] != m:
                label[s] = label[d] = m
                changed = True
    return label


def minhash_lsh_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    seed: int = 42,
    return_edges: bool = False,
):
    """Near-duplicate removal via MinHash + LSH banding; returns the
    kept rows (min id per duplicate cluster)."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    a, b = _perm_params(num_perm, seed)

    def sign(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"id": [], "band": [], "band_hash": [], "sig": []}
        for did, text in zip(batch[id_col], batch[text_col]):
            sig = minhash_signature(char_shingles(text, shingle_k), a, b)
            sig_bytes = sig.tobytes()
            bh = sig.reshape(bands, rows_per_band)
            for bi in range(bands):
                out["id"].append(did)
                out["band"].append(bi)
                out["band_hash"].append(int(murmur3_64(bh[bi].tobytes())))
                out["sig"].append(sig_bytes)
        return pd.DataFrame(out)

    signed = ds.select_columns([id_col, text_col]).map_batches(
        sign, batch_format="pandas"
    )

    signed = signed.materialize()  # consumed twice below; bands are small

    # Find buckets with ≥2 members via per-batch PARTIAL counts combined
    # on the driver (the partials are ≤ one row per distinct bucket per
    # batch). Both a per-group map_groups (~0.1 ms Python per group ×
    # 80k buckets) and Ray's sort-based multi-key groupby (measured 37 s
    # on 80k rows) are pathological at this shape; at 10^11-bucket scale
    # the combine moves to a single-key hash groupby over
    # murmur3(band, band_hash) partials.
    partials = signed.map_batches(
        lambda df: df.groupby(["band", "band_hash"], sort=False)
        .size()
        .reset_index(name="n"),
        batch_format="pandas",
    ).to_pandas()
    totals = partials.groupby(["band", "band_hash"], sort=False)["n"].sum()
    hot = totals[totals >= 2]
    hot_keys = set(hot.index)

    def in_hot(df: pd.DataFrame) -> pd.DataFrame:
        mask = [
            (b, h) in hot_keys for b, h in zip(df["band"], df["band_hash"])
        ]
        return df[np.asarray(mask, dtype=bool)]

    cand = signed.map_batches(in_hot, batch_format="pandas").to_pandas()

    # STAR verification: inside a bucket, estimate Jaccard only against
    # the min-id representative — O(|bucket|), not O(|bucket|²). Heavy
    # duplication makes buckets huge (measured 500-member buckets on the
    # test corpus); pairwise there is quadratic for no extra recall —
    # transitive members meet the same representative through other
    # bands. Min-label propagation still merges across buckets.
    src_l, dst_l = [], []
    for _, group in cand.groupby(["band", "band_hash"], sort=False):
        g = group.drop_duplicates("id").sort_values("id")
        if len(g) < 2:
            continue
        ids = g["id"].to_numpy()
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])
        est = (sigs[1:] == sigs[0]).mean(axis=1)
        for j in np.flatnonzero(est >= threshold):
            src_l.append(ids[0])
            dst_l.append(ids[1 + j])
    edges = pd.DataFrame({"src": src_l, "dst": dst_l}).drop_duplicates()
    label = _components_min_label(edges)
    dup_ids = {i for i, root in label.items() if root != i}

    out = ds.map_batches(
        lambda batch: batch[~batch[id_col].isin(dup_ids)], batch_format="pandas"
    )
    return (out, edges) if return_edges else out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit simhash over whitespace tokens (unit weights)."""
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in _TOKEN.findall(text):
        h = np.uint64(murmur3_64(tok) & 0xFFFFFFFFFFFFFFFF)
        bits = ((h >> shifts) & np.uint64(1)).astype(bool)
        acc += np.where(bits, 1, -1)
    v = 0
    for bit in np.flatnonzero(acc > 0):
        v |= 1 << int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def simhash_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    hamming_max: int = 3,
) -> "ray.data.Dataset":
    """Near-dup removal by simhash Hamming ≤ r with 16-bit band blocking."""

    def sign(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, text in zip(batch[id_col], batch[text_col]):
            h = simhash64(text)
            u = int(h) & 0xFFFFFFFFFFFFFFFF
            for bi in range(4):
                rows.append((did, int(h), bi, (u >> (16 * bi)) & 0xFFFF))
        return pd.DataFrame(rows, columns=["id", "simhash", "band", "band_val"])

    signed = ds.select_columns([id_col, text_col]).map_batches(
        sign, batch_format="pandas"
    )

    signed = signed.materialize()

    # same hot-bucket pattern as minhash: partial counts + driver combine
    partials = signed.map_batches(
        lambda df: df.groupby(["band", "band_val"], sort=False)
        .size()
        .reset_index(name="n"),
        batch_format="pandas",
    ).to_pandas()
    totals = partials.groupby(["band", "band_val"], sort=False)["n"].sum()
    hot = totals[totals >= 2]
    hot_keys = set(hot.index)

    def in_hot(df: pd.DataFrame) -> pd.DataFrame:
        mask = [(b, h) in hot_keys for b, h in zip(df["band"], df["band_val"])]
        return df[np.asarray(mask, dtype=bool)]

    cand = signed.map_batches(in_hot, batch_format="pandas").to_pandas()

    src_l, dst_l = [], []
    for _, group in cand.groupby(["band", "band_val"], sort=False):
        g = group.drop_duplicates("id").sort_values("id")
        if len(g) < 2:
            continue
        ids = g["id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        for i in range(len(ids)):
            x = hs[i] ^ hs[i + 1 :]
            d = np.array([bin(int(v)).count("1") for v in x])
            for j in np.flatnonzero(d <= hamming_max):
                src_l.append(int(ids[i]))
                dst_l.append(int(ids[i + 1 + j]))
    edges = pd.DataFrame({"src": src_l, "dst": dst_l}).drop_duplicates()
    label = _components_min_label(edges)
    dup_ids = {i for i, root in label.items() if root != i}

    return ds.map_batches(
        lambda batch: batch[~batch[id_col].isin(dup_ids)], batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
    threshold: float = 0.95,
) -> "ray.data.Dataset":
    """(id_a, id_b) pairs with cosine ≥ threshold within each block —
    per-block numpy matmul inside ``map_groups``."""

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64)})
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sim = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sim[iu] >= threshold
        return pd.DataFrame(
            {"id_a": ids[iu[0][mask]], "id_b": ids[iu[1][mask]]}
        )

    return ds.groupby(block_col).map_groups(pairs, batch_format="pandas")
