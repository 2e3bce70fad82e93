"""Corpus vocabulary statistics — term and document frequencies over
the whole corpus, the classic corpus-analysis pass (vocabulary
coverage, stopword discovery, tokenizer-training input, IDF tables).

Scale shape: tokenize + count WITHIN each block (vectorized pandas
explode/value_counts), combine the (term, tf, df) partials through
the hash-partitioned task combine (``ops/hashagg.sum_combine_dataset``
— string keys partition via vectorized siphash), then take the top-N
by a per-partition truncate + bounded driver merge (≤ top_n rows per
partition cross the driver, never the vocabulary). df is summable
because each document lives in exactly one block."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.textstats import _WORD
from ..ops.hashagg import sum_combine_dataset


def _block_counts(df: pd.DataFrame, text_col: str) -> pd.DataFrame:
    words = df[text_col].fillna("").str.lower().str.findall(_WORD)
    ex = words.explode().dropna()
    if not len(ex):
        return pd.DataFrame({
            "term": pd.Series([], dtype=str),
            "tf": pd.Series([], dtype=np.int64),
            "df": pd.Series([], dtype=np.int64),
        })
    tf = ex.groupby(ex).size()
    # document frequency: distinct (doc, term) pairs within the block
    docterm = ex.groupby([ex.index, ex]).size()
    dfreq = docterm.groupby(level=1).size()
    return pd.DataFrame({
        "term": tf.index.to_numpy(dtype=object),
        "tf": tf.to_numpy(dtype=np.int64),
        "df": dfreq.reindex(tf.index).to_numpy(dtype=np.int64),
    })


def vocab_stats(
    docs,
    *,
    text_col: str = "text",
    top_n: int = 1000,
    min_count: int = 1,
):
    """→ (top_terms DataFrame, corpus stats dict).

    ``top_terms``: the ``top_n`` terms by corpus term frequency with
    ``(term, tf, df)`` columns, tf-descending (term-ascending ties —
    deterministic). ``stats``: ``{total_tokens, distinct_terms}``
    (terms at ``min_count``+) computed from per-partition scalars —
    the vocabulary itself never collects."""
    partials = docs.map_batches(
        lambda df: _block_counts(df, text_col), batch_format="pandas"
    )
    combined = sum_combine_dataset(
        partials, key="term", sum_cols=["tf", "df"]
    ).materialize()  # consumed twice (top-N + totals); combine once

    def top_per_partition(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False)
        keep = tf >= min_count
        tt = t.filter(pa.array(keep))
        tf = tf[keep]
        n = min(top_n, len(tf))
        if not n:
            return tt.slice(0, 0)
        return tt.take(pa.array(np.argpartition(-tf, n - 1)[:n]))

    merged = combined.map_batches(
        top_per_partition, batch_format="pyarrow"
    ).to_pandas()
    if not len(merged):  # empty corpus: to_pandas drops the schema
        merged = pd.DataFrame({
            "term": pd.Series([], dtype=str),
            "tf": pd.Series([], dtype=np.int64),
            "df": pd.Series([], dtype=np.int64),
        })
    top = (
        merged.sort_values(
            ["tf", "term"], ascending=[False, True], kind="mergesort"
        )
        .head(top_n)
        .reset_index(drop=True)
    )

    totals = combined.map_batches(
        lambda t: pa.table({
            "total": pa.array(
                [int(t["tf"].to_numpy(zero_copy_only=False).sum())],
                pa.int64(),
            ),
            "distinct": pa.array(
                [int((t["tf"].to_numpy(zero_copy_only=False)
                      >= min_count).sum())],
                pa.int64(),
            ),
        }),
        batch_format="pyarrow",
    ).to_pandas()
    return top, {
        "total_tokens": int(totals["total"].sum()) if len(totals) else 0,
        "distinct_terms": (
            int(totals["distinct"].sum()) if len(totals) else 0
        ),
    }


def tfidf_vectors(
    docs,
    top_terms: pd.DataFrame,
    n_docs: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
):
    """Dense L2-normalized TF-IDF vectors over the ``top_terms``
    vocabulary (from :func:`vocab_stats`) — the classical sparse
    retrieval embedding, emitted as a ``list<float>`` column so it
    feeds ``pipelines/similarity.knn_bruteforce`` / ``knn_lsh``
    directly. idf = ln(n_docs / df); tf raw counts; one shuffle-free
    ``map_batches`` with the vocab broadcast in the closure.

    Vectorized per block: explode words → map to vocab indices →
    one offset bincount builds ALL docs' count matrices at once."""
    import ray

    vocab = {t: i for i, t in enumerate(top_terms["term"])}
    idf = np.log(
        n_docs / np.maximum(1, top_terms["df"].to_numpy(dtype=np.float64))
    )
    dim = len(vocab)
    vocab_ref = ray.put((vocab, idf))

    def vectorize(df: pd.DataFrame) -> pd.DataFrame:
        vmap, idfv = ray.get(vocab_ref)
        words = df[text_col].fillna("").str.lower().str.findall(_WORD)
        n = len(df)
        ex = words.explode().dropna()
        mat = np.zeros((n, dim), dtype=np.float64)
        if len(ex):
            row_pos = pd.Series(np.arange(n), index=df.index)
            rows = row_pos.loc[ex.index].to_numpy()
            term_idx = ex.map(vmap).to_numpy()
            keep = ~pd.isna(term_idx)
            rows = rows[keep]
            cols = term_idx[keep].astype(np.int64)
            counts = np.bincount(rows * dim + cols, minlength=n * dim)
            mat = counts.reshape(n, dim).astype(np.float64)
        mat *= idfv[None, :]
        norm = np.linalg.norm(mat, axis=1)
        mat /= np.maximum(norm, 1e-12)[:, None]
        # plain lists -> Arrow list<double> (numpy cells would become
        # Ray's tensor extension type, which the kNN scan rejects)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            out_col: [row.tolist() for row in mat],
        })

    return docs.map_batches(vectorize, batch_format="pandas")
