"""Connected components by iterated min-label propagation.

The dedup pipelines cluster verified duplicate-pair edges and keep the
min id per cluster. Two equivalent implementations (tested identical):

- :func:`components_driver` — tight loop over an in-memory edge list;
  right when the VERIFIED edge set is small (near-dup edges are sparse
  relative to the corpus).
- :func:`components_dataset` — the scale path: labels and edges stay
  Datasets; each iteration joins neighbor labels (hash join on the
  node key) and folds with ``groupby(node).min(label)``. Near-dup
  clusters are star/clique shaped, so 1-2 iterations in practice;
  from iteration 3 on a POINTER-DOUBLING pass (label ← label of
  label, one extra self-join) kicks in, so chain/path components
  converge in O(log diameter) instead of O(diameter) iterations —
  the common case pays nothing. Convergence is detected by the
  monotonically decreasing global label sum — one scalar per
  iteration, no label-table diff.

:func:`min_label_components` auto-selects by edge count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min

DRIVER_EDGE_LIMIT = 1_000_000


def components_driver(edges: pd.DataFrame, src: str = "src", dst: str = "dst") -> dict:
    """{node: component_min_label} over an in-memory edge list.

    Union-find with path compression (one pass over the edges, near-
    linear), then a vectorized per-root min fold so the label is the
    component's MIN node id — same contract as the old iterated
    propagation loop, O(E·α) instead of O(E·iterations)."""
    if not len(edges):
        return {}
    s = edges[src].to_numpy(dtype=np.int64)
    d = edges[dst].to_numpy(dtype=np.int64)
    ids = pd.unique(np.concatenate([s, d]))
    pos = pd.Series(np.arange(len(ids), dtype=np.int64), index=ids)
    si = pos[s].to_numpy()
    di = pos[d].to_numpy()
    parent = np.arange(len(ids), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(si.tolist(), di.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.fromiter((find(i) for i in range(len(ids))), np.int64, len(ids))
    comp_min = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(comp_min, roots, ids)
    labels = comp_min[roots]
    return dict(zip(ids.tolist(), labels.tolist()))


def components_dataset(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 64,
) -> "ray.data.Dataset":
    """(node, label) per node of ``edges``, label = component min id."""

    def sym(t: pa.Table) -> pa.Table:
        a = pa.concat_arrays(
            [t[src].combine_chunks().cast(pa.int64()),
             t[dst].combine_chunks().cast(pa.int64())]
        )
        b = pa.concat_arrays(
            [t[dst].combine_chunks().cast(pa.int64()),
             t[src].combine_chunks().cast(pa.int64())]
        )
        return pa.table({"node": a, "nbr": b})

    und = edges.map_batches(sym, batch_format="pyarrow").materialize()

    # labels_0(x) = min(x, min neighbor id)
    def with_self(t: pa.Table) -> pa.Table:
        node = t["node"].combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([node, node]),
                "lab": pa.concat_arrays([t["nbr"].combine_chunks(), node]),
            }
        )

    labels = (
        und.map_batches(with_self, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("lab", alias_name="label"))
        .materialize()
    )
    prev_sum = labels.sum("label")
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    converged = False
    for it in range(max_iters):
        lab_r = labels.map_batches(
            lambda t: t.rename_columns(["lnode", "llabel"]), batch_format="pyarrow"
        )
        msgs = und.join(
            lab_r,
            join_type="inner",
            num_partitions=max(2, ncpu),
            on=("nbr",),
            right_on=("lnode",),
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "lab": t["llabel"]}),
            batch_format="pyarrow",
        )
        own = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "lab": t["label"]}),
            batch_format="pyarrow",
        )
        combined = msgs.union(own)
        if it >= 2:
            # still not converged after the star/clique-shaped cases
            # are done ⇒ a high-diameter component exists: add a
            # pointer-doubling message (label ← label-of-label) so
            # chains collapse in O(log d) further iterations
            short = labels.join(
                lab_r,
                join_type="inner",
                num_partitions=max(2, ncpu),
                on=("label",),
                right_on=("lnode",),
            ).map_batches(
                lambda t: pa.table({"node": t["node"], "lab": t["llabel"]}),
                batch_format="pyarrow",
            )
            combined = combined.union(short)
        labels = (
            combined.groupby("node")
            .aggregate(Min("lab", alias_name="label"))
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # a component with propagation diameter > max_iters would exit
        # here with SPLIT labels (silent under-deduplication downstream)
        import warnings

        warnings.warn(
            f"components_dataset: label propagation did not converge in "
            f"{max_iters} iterations — returned labels may split "
            f"components with diameter > {max_iters}",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def min_label_components(
    edges: "ray.data.Dataset", src: str = "src", dst: str = "dst"
) -> "ray.data.Dataset":
    """(node, label) Dataset for the edge Dataset — driver loop below
    :data:`DRIVER_EDGE_LIMIT` edges (verified near-dup edge sets are
    sparse), iterated Dataset label propagation above it."""
    n = edges.count()
    if n > DRIVER_EDGE_LIMIT:
        return components_dataset(edges, src, dst)
    if n == 0:
        lab: dict = {}
    else:
        lab = components_driver(edges.to_pandas(), src, dst)
    return ray.data.from_pandas(
        pd.DataFrame(
            {"node": np.fromiter(lab.keys(), np.int64, len(lab)),
             "label": np.fromiter(lab.values(), np.int64, len(lab))}
        )
    )
