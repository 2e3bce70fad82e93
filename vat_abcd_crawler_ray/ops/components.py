"""Connected components by iterated min-label propagation.

The dedup pipelines cluster verified duplicate-pair edges and keep the
min id per cluster. Two equivalent implementations (tested identical):

- :func:`components_driver` — tight loop over an in-memory edge list;
  right when the VERIFIED edge set is small (near-dup edges are sparse
  relative to the corpus).
- :func:`components_dataset` — the scale path: labels and edges stay
  Datasets; each iteration joins neighbor labels (broadcast lookup
  below a label-count gate, ``bucket_hash_join`` above it) and folds
  with ``groupby(node).min(label)``. Near-dup
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


@ray.remote(num_cpus=0.25)
def _coalesce_blocks(*tables: pa.Table) -> pa.Table:
    ts = [t for t in tables if t.num_rows]
    return pa.concat_tables(ts) if ts else tables[0]


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
    broadcast_limit: int = 5_000_000,
) -> "ray.data.Dataset":
    """(node, label) per node of ``edges``, label = component min id.

    The per-iteration neighbor-label join is auto-gated like every
    other join in this repo: at or below ``broadcast_limit`` labels the
    label map is broadcast once (``ray.put`` of a sorted key/value
    array pair) and each block does a vectorized ``searchsorted``
    lookup — ONE Dataset execution per iteration, no shuffle; above it
    the join runs through ``ops.joins.bucket_hash_join`` (never Ray's
    experimental ``Dataset.join``, whose blocking actor pool the crawl
    spine measured pathological and evicted)."""

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

    # labels_0(x) = min(x, min neighbor id)
    def with_self(t: pa.Table) -> pa.Table:
        node = t["node"].combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([node, node]),
                "lab": pa.concat_arrays([t["nbr"].combine_chunks(), node]),
            }
        )

    ncpu = int(ray.cluster_resources().get("CPU", 8))

    def _detach(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        """Materialize, sever the logical plan, and CAP the block
        count. Two iterative-loop pathologies this kills (both found
        the hard way):

        - a MaterializedDataset further transformed (union /
          map_batches) in a loop re-plans its whole retained lineage
          (~2.5× slower per iteration, exponential over the loop);
          rebuilding from block refs (``from_arrow_refs``, zero data
          movement) gives the next iteration a plan of depth 1;
        - the union triples the label table's block count every
          iteration, so the groupby's shuffle task grid (maps ×
          reduces) grows quadratically in blocks and the DRIVER spins
          serializing thousands of shuffle task args; coalescing to
          ≤ ~2·CPU blocks keeps the grid constant."""
        mat = ds.materialize()
        refs = [
            r
            for bundle in mat.iter_internal_ref_bundles()
            for r in bundle.block_refs
        ]
        target = max(2, 2 * ncpu)
        if len(refs) > target:
            chunks = np.array_split(np.arange(len(refs)), target)
            refs = [
                _coalesce_blocks.remote(*[refs[i] for i in c])
                for c in chunks
                if len(c)
            ]
        if not refs:
            return mat
        return ray.data.from_arrow_refs(refs)

    # und is consumed EVERY iteration — detach it too, or each
    # iteration re-runs the sym map over the raw edges
    und = _detach(edges.map_batches(sym, batch_format="pyarrow"))

    labels = _detach(
        und.map_batches(with_self, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("lab", alias_name="label"))
    )
    prev_sum = labels.sum("label")
    nbuckets = max(2, ncpu)
    converged = False
    from .joins import bucket_hash_join

    for it in range(max_iters):
        own = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "lab": t["label"]}),
            batch_format="pyarrow",
        )
        if labels.count() <= broadcast_limit:
            blks = [
                b
                for b in ray.get(
                    [
                        r
                        for bundle in labels.iter_internal_ref_bundles()
                        for r in bundle.block_refs
                    ]
                )
                if b.num_rows  # empty blocks may carry a void schema
            ]
            lab_t = pa.concat_tables(blks)
            nodes_arr = lab_t["node"].to_numpy(zero_copy_only=False)
            labs_arr = lab_t["label"].to_numpy(zero_copy_only=False)
            order = np.argsort(nodes_arr, kind="stable")
            lab_ref = ray.put((nodes_arr[order], labs_arr[order]))

            def _lookup(col_in: str):
                def fn(t: pa.Table) -> pa.Table:
                    nodes_s, labs_s = ray.get(lab_ref)
                    keys = t[col_in].to_numpy(zero_copy_only=False)
                    pos = np.searchsorted(nodes_s, keys)
                    # every nbr IS a labeled node and every label IS a
                    # node id, so misses are impossible; fail loudly if
                    # that invariant ever breaks rather than mislabel
                    if not np.array_equal(nodes_s[pos], keys):
                        raise RuntimeError("label lookup miss")
                    return pa.table(
                        {"node": t["node"], "lab": pa.array(labs_s[pos])}
                    )

                return fn

            combined = und.map_batches(
                _lookup("nbr"), batch_format="pyarrow"
            ).union(own)
            if it >= 2:
                # still not converged after the star/clique-shaped
                # cases are done ⇒ a high-diameter component exists:
                # add a pointer-doubling message (label ← label of
                # label) so chains collapse in O(log d) iterations
                combined = combined.union(
                    labels.map_batches(_lookup("label"), batch_format="pyarrow")
                )
        else:
            lab_nbr = labels.map_batches(
                lambda t: t.rename_columns(["nbr", "llabel"]),
                batch_format="pyarrow",
            )
            msgs = bucket_hash_join(
                und, lab_nbr, on="nbr", num_buckets=nbuckets, how="inner"
            ).map_batches(
                lambda t: pa.table({"node": t["node"], "lab": t["llabel"]}),
                batch_format="pyarrow",
            )
            combined = msgs.union(own)
            if it >= 2:
                lab_lab = labels.map_batches(
                    lambda t: t.rename_columns(["label", "llabel"]),
                    batch_format="pyarrow",
                )
                short = bucket_hash_join(
                    labels, lab_lab, on="label", num_buckets=nbuckets, how="inner"
                ).map_batches(
                    lambda t: pa.table({"node": t["node"], "lab": t["llabel"]}),
                    batch_format="pyarrow",
                )
                combined = combined.union(short)
        labels = _detach(
            combined.groupby("node").aggregate(Min("lab", alias_name="label"))
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
