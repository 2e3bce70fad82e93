"""Sequence packing: assign documents to fixed token-budget bins — the
step that turns a filtered corpus into dense training examples.

Scale shape: bin packing is NP-hard and inherently serial, so the
operator packs WITHIN each Arrow block (first-fit-decreasing, the
standard 11/9-OPT heuristic) and never shuffles: at 100 TB each block
packs independently in its own task, and pack ids stay globally
unique because a pack is named by its smallest member id. The
block-local approximation costs a sliver of fill rate versus global
packing (measured in tests at > 95% fill for realistic length mixes)
and buys embarrassing parallelism — the trade every production
pretraining pipeline makes.

Reference parity: none — this is the engine's LLM-training-data
surface (SURVEY has no packing analog).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_rows(
    lens: np.ndarray, budget: int
) -> tuple[np.ndarray, np.ndarray]:
    """First-fit-decreasing over one block: ``lens[i]`` tokens per row
    → (bin_index per row, offset-in-bin per row). Rows longer than
    ``budget`` get singleton bins (flagged by the caller). Pure numpy
    + one Python pass over rows — the pass is the packing itself, not
    a per-row transform (bin state is inherently sequential)."""
    n = len(lens)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.argsort(-lens, kind="stable")  # FFD: largest first
    bin_of = np.empty(n, dtype=np.int64)
    offset = np.empty(n, dtype=np.int64)
    # leftmost-fit via a max segment tree over per-bin free space:
    # O(log n) per row instead of a linear scan over bins (the naive
    # first-fit is O(n·bins) — hopeless at 64k-row blocks)
    cap = 1
    while cap < n:
        cap *= 2
    tree = np.full(2 * cap, -1, dtype=np.int64)  # -1 = bin not open yet
    n_bins = 0

    def _open_bin() -> int:
        nonlocal n_bins
        b = n_bins
        n_bins += 1
        return b

    def _update(leaf: int, val: int) -> None:
        i = cap + leaf
        tree[i] = val
        i //= 2
        while i:
            tree[i] = max(tree[2 * i], tree[2 * i + 1])
            i //= 2

    for i in order:
        ln = int(lens[i])
        if tree[1] >= ln:  # some open bin fits: descend leftmost
            node = 1
            while node < cap:
                node = 2 * node if tree[2 * node] >= ln else 2 * node + 1
            b = node - cap
            free = int(tree[node])
            offset[i] = budget - free
            bin_of[i] = b
            _update(b, free - ln)
        else:
            b = _open_bin()
            bin_of[i] = b
            offset[i] = 0
            _update(b, max(budget - ln, 0))
    return bin_of, offset


def pack_sequences(
    ds,
    len_col: str,
    budget: int,
    id_col: str = "doc_id",
):
    """Dataset → one row per doc with its pack assignment:
    ``(…, pack_id, pack_offset, oversize)``.

    ``pack_id`` is the smallest ``id_col`` value in the pack — unique
    across blocks without any coordination, stable across retries.
    ``oversize`` marks docs longer than the budget (singleton packs —
    the downstream tokenizer decides whether to truncate or drop;
    flagging instead of failing is the C2 errors-are-data model)."""
    if budget <= 0:
        raise ValueError("budget must be positive")

    def f(t: pa.Table) -> pa.Table:
        lens = t[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if (lens < 0).any():
            raise ValueError(f"negative length in {len_col!r}")
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if np.issubdtype(ids.dtype, np.integer):
            ids = ids.astype(np.int64)
        bin_of, offset = pack_rows(lens, budget)
        # pack id = min member id per bin — works for ANY orderable id
        # (int doc_ids or url strings): lexsort by (bin, id), the first
        # row of each bin run is its minimum
        nb = int(bin_of.max()) + 1 if len(bin_of) else 0
        if nb:
            order = np.lexsort((ids, bin_of))
            _, first = np.unique(bin_of[order], return_index=True)
            pack_min = ids[order][first]  # indexed by bin number
            pack_ids = pack_min[bin_of]
        else:
            pack_ids = ids
        return (
            t.append_column("pack_id", pa.array(pack_ids))
            .append_column("pack_offset", pa.array(offset, pa.int64()))
            .append_column(
                "oversize", pa.array(lens > budget, pa.bool_())
            )
        )

    return ds.map_batches(f, batch_format="pyarrow")


def pack_stats(packed_df, len_col: str, budget: int) -> dict:
    """Fill-rate summary over a packed result (a pandas DataFrame from
    ``pack_sequences`` output, original length column still present).
    Oversize singleton packs are excluded from the fill rate — their
    fill is a tokenizer-truncation question, not a packing one."""
    ok = packed_df[~packed_df["oversize"]]
    per_pack = ok.groupby("pack_id")[len_col].sum()
    return {
        "n_packs": int(packed_df["pack_id"].nunique()),
        "n_oversize": int(packed_df["oversize"].sum()),
        "docs_per_pack_mean": float(
            packed_df.groupby("pack_id").size().mean()
        ),
        "fill_rate": float(per_pack.mean() / budget) if len(per_pack) else 0.0,
        "budget": budget,
    }
