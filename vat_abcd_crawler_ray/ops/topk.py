"""Per-key top-k with partial (combiner-style) pre-truncation.

The frontier's per-host candidate selection (north_rule: per-host
priority queue) is a per-key top-k: keep the ``budget`` best URLs per
host per round. A naive ``groupby(host).map_groups(head)`` ships every
candidate row through the shuffle; this operator first truncates to the
top-k **within each batch** (vectorized pandas), so the all-to-all only
moves ≤ k rows per key per batch — the standard combiner trick that
also bounds mega-host (skew) groups.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def topk_per_key(
    ds: "ray.data.Dataset",
    key: str,
    k: int,
    sort_cols: list[str],
    ascending: list[bool],
) -> "ray.data.Dataset":
    """Top-``k`` rows per ``key`` ordered by ``sort_cols``/``ascending``.

    Deterministic iff ``sort_cols`` is a total order within each key
    (callers append a unique ``seq`` tiebreaker).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return batch
        return (
            batch.sort_values(sort_cols, ascending=ascending, kind="mergesort")
            .groupby(key, sort=False)
            .head(k)
        )

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            sort_cols, ascending=ascending, kind="mergesort"
        ).head(k)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key)
        .map_groups(final, batch_format="pandas")
    )
