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


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of the k-char shingle set."""
    n = len(text)
    if n < k:
        return np.array([murmur3_64(text) & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    seen = {murmur3_64(text[i : i + k]) & 0xFFFFFFFFFFFFFFFF for i in range(n - k + 1)}
    return np.fromiter(seen, dtype=np.uint64, count=len(seen))


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

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("id").sort_values("id")
        if len(g) < 2:
            return pd.DataFrame({"src": [], "dst": []})
        ids = g["id"].tolist()
        sigs = np.stack(
            [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        )
        src, dst = [], []
        for i in range(len(ids)):
            est = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            for j in np.flatnonzero(est >= threshold):
                src.append(ids[i])
                dst.append(ids[i + 1 + j])
        return pd.DataFrame({"src": src, "dst": dst})

    edges = (
        signed.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
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

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("id").sort_values("id")
        if len(g) < 2:
            return pd.DataFrame({"src": [], "dst": []})
        ids = g["id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        src, dst = [], []
        for i in range(len(ids)):
            x = hs[i] ^ hs[i + 1 :]
            d = np.array([bin(int(v)).count("1") for v in x]) if len(x) else []
            for j in np.flatnonzero(np.asarray(d) <= hamming_max):
                src.append(int(ids[i]))
                dst.append(int(ids[i + 1 + j]))
        return pd.DataFrame({"src": src, "dst": dst})

    edges = (
        signed.groupby(["band", "band_val"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
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
