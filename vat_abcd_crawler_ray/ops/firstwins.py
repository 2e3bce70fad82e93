"""Gated first-wins winner selection (min-val-per-key) over Arrow
block refs.

First-wins semantics (reference
``/root/reference/src/storage/surrogate_key.rs:16-41``: the FIRST
occurrence of a key claims it): among rows sharing a canonical
``key``, the winner is the row with the smallest globally-unique
``val`` — seed ``seq`` at bootstrap, packed discovery order ``ordv``
at link admission. Because vals are unique, the winner SET is exactly
identified by its val values, and each winner's dense rank in
ascending-val order equals its position after a global
``sort(val)`` — so downstream seq/surrogate assignment needs no
Dataset sort and no zip_with_index, only a broadcast
``np.searchsorted`` against the sorted winner vals.

This replaces the previous 3-execution spine
(``groupby(key).min(val)`` shuffle → semi join probe → global sort +
zip_with_index) with:

1. one per-block partial-min TASK next to each block (output ≤
   unique-keys-per-block rows of (key, val) — the raw rows never
   move);
2. a gate on the summed partial row count:
   - **below** ``driver_gate``: a single pyarrow combine of the
     partials (at 10^7 round-novel keys ≈ 160 MB of (key, val)
     pairs — driver-feasible; the caller then broadcasts the sorted
     winner vals and fuses filter + rank + finalize into ONE
     ``map_batches`` pass);
   - **above** it: the caller falls back to the distributed
     ``groupby`` path, fed the PARTIAL refs instead of the raw
     blocks, so even the fallback's shuffle moves only the
     per-block-deduped (key, val) pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _as_arrow(block) -> pa.Table:
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block, preserve_index=False)


@ray.remote(num_cpus=0.5, num_returns=2)
def _partial_min(block, key: str, val: str):
    """(meta, partial) for one block: meta = (partial_rows, raw_rows,
    vmax) — all driver-cheap scalars; partial = per-key min-val table
    with columns (key, val). Empty/schemaless blocks (sort and shuffle
    ops emit them) yield a typed empty partial."""
    import pyarrow.compute as pc

    t = _as_arrow(block)
    if t.num_rows == 0 or key not in t.column_names:
        empty = pa.table(
            {key: pa.array([], pa.int64()), val: pa.array([], pa.int64())}
        )
        return (0, 0, -1), empty
    part = (
        t.select([key, val])
        .group_by(key)
        .aggregate([(val, "min"), (val, "max")])
    )
    vmax = int(pc.max(part[f"{val}_max"]).as_py())
    part = part.select([key, f"{val}_min"]).rename_columns([key, val])
    return (part.num_rows, t.num_rows, vmax), part


def winner_vals_gated(
    block_refs: list,
    key: str = "key",
    val: str = "ordv",
    driver_gate: int | None = None,
) -> tuple[np.ndarray | None, dict, list]:
    """→ ``(win_sorted, stats, partial_refs)``.

    ``win_sorted`` is the ascending np.int64 array of winning vals when
    the summed partial row count is ≤ ``driver_gate``, else ``None``
    (take the distributed fallback over ``partial_refs``).
    ``stats`` = ``{"raw_rows", "partial_rows", "vmax"}`` (vmax = max
    val over ALL rows, −1 when empty — bootstrap derives ``next_seq``
    from it without a separate Dataset ``max()`` execution).

    ``driver_gate`` defaults to 5M partial rows, overridable via
    ``VAT_FIRSTWINS_GATE`` (tests force the distributed fallback with
    gate 0).
    """
    if driver_gate is None:
        import os

        driver_gate = int(os.environ.get("VAT_FIRSTWINS_GATE", 5_000_000))
    metas, partial_refs = [], []
    for ref in block_refs:
        m, p = _partial_min.remote(ref, key, val)
        metas.append(m)
        partial_refs.append(p)
    metas = ray.get(metas)
    stats = {
        "partial_rows": sum(m[0] for m in metas),
        "raw_rows": sum(m[1] for m in metas),
        "vmax": max((m[2] for m in metas), default=-1),
    }
    if stats["partial_rows"] > driver_gate:
        return None, stats, partial_refs
    if stats["partial_rows"] == 0:
        return np.empty(0, dtype=np.int64), stats, partial_refs
    combined = (
        pa.concat_tables(ray.get(partial_refs))
        .group_by(key)
        .aggregate([(val, "min")])
    )
    win = combined[f"{val}_min"].to_numpy(zero_copy_only=False)
    return np.sort(win.astype(np.int64, copy=False)), stats, partial_refs


def rank_in(win_sorted: np.ndarray, vals: np.ndarray):
    """(keep_idx, rank) — positions of ``vals`` present in the sorted
    winner array and their dense ranks. The broadcast-side half of the
    fused filter + rank + finalize pass."""
    if len(win_sorted) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    pos = np.searchsorted(win_sorted, vals)
    posc = np.minimum(pos, len(win_sorted) - 1)
    keep = np.flatnonzero(win_sorted[posc] == vals)
    return keep, pos[keep]
