"""Connected components by iterated min-label propagation.

The dedup pipelines cluster verified duplicate-pair edges and keep the
min id per cluster. Two equivalent implementations (tested identical):

- :func:`components_driver` — tight loop over an in-memory edge list;
  right when the VERIFIED edge set is small (near-dup edges are sparse
  relative to the corpus).
- :func:`components_dataset` — the scale path, gated on NODE count.
  Below the gate the labels are a dense driver array: each iteration
  is ONE shuffle-free Dataset execution over the detached undirected
  edge blocks (broadcast label lookup, per-block-deduped improvement
  rows only) folded on the driver with ``np.minimum.at`` plus
  vectorized pointer compression, so chains converge in O(log
  diameter) outer passes and the final pass moves zero rows. Above
  the gate labels stay a Dataset: per-iteration neighbor-label
  ``bucket_hash_join`` + ``groupby(node).min`` with a pointer-doubling
  self-join from iteration 3, convergence by the monotone global
  label sum. Near-dup clusters are star/clique shaped, so 1-2
  iterations in practice either way.

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

    Auto-gated like every other wide op in this repo, on the NODE
    count (invariant across iterations — one label row per node):

    - **node count ≤ broadcast_limit** — the labels live as a dense
      driver array. Each iteration is ONE Dataset execution: an edge
      pass over the detached undirected blocks that looks neighbor
      labels up in the broadcast array and emits only per-block-deduped
      IMPROVEMENTS (node, better_label); the driver folds them with
      ``np.minimum.at`` and then runs vectorized pointer compression
      (label ← label[label] to fixpoint) for free, so chains collapse
      in O(log diameter) OUTER passes with no shuffle anywhere. The
      iteration traffic shrinks with convergence (zero rows on the
      final pass).
    - **above the gate** — labels stay a Dataset and each iteration
      joins neighbor labels through ``ops.joins.bucket_hash_join``
      (never Ray's experimental ``Dataset.join``, whose blocking actor
      pool the crawl spine measured pathological and evicted) and folds
      with ``groupby(node).min``, with a pointer-doubling self-join
      from iteration 3 on.

    Both paths start from the same per-block partial mins (node →
    min(self, neighbors)), so the above-gate init shuffles per-block-
    deduped partials, not 2|E| raw message rows."""

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

    def _block_min_self(t: pa.Table) -> pa.Table:
        """Per-block (node, min(self, min nbr)) — deduped within the
        block, so downstream sees per-block-unique rows only."""
        node = t["node"].to_numpy(zero_copy_only=False)
        nbr = t["nbr"].to_numpy(zero_copy_only=False)
        vals = np.minimum(node, nbr)
        order = np.argsort(node, kind="stable")
        ns, vs = node[order], vals[order]
        starts = np.flatnonzero(np.r_[True, ns[1:] != ns[:-1]])
        return pa.table(
            {"node": ns[starts], "lab": np.minimum.reduceat(vs, starts)}
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

    # both paths start from per-block partial mins; their total row
    # count bounds the node count from above, so it also decides the
    # gate without a separate distinct-count pass
    partials = _detach(und.map_batches(_block_min_self, batch_format="pyarrow"))
    n_partial = partials.count()

    if n_partial <= 3 * broadcast_limit:
        part_blocks = [
            b
            for b in ray.get(
                [
                    r
                    for bundle in partials.iter_internal_ref_bundles()
                    for r in bundle.block_refs
                ]
            )
            if b.num_rows
        ]
        part_t = (
            pa.concat_tables(part_blocks)
            if part_blocks
            else pa.table(
                {"node": pa.array([], pa.int64()),
                 "lab": pa.array([], pa.int64())}
            )
        )
        pn = part_t["node"].to_numpy(zero_copy_only=False)
        pl = part_t["lab"].to_numpy(zero_copy_only=False)
        nodes_sorted, inv = np.unique(pn, return_inverse=True)
        if len(nodes_sorted) <= broadcast_limit:
            labels_arr = np.full(
                len(nodes_sorted), np.iinfo(np.int64).max, dtype=np.int64
            )
            np.minimum.at(labels_arr, inv, pl)

            def _compress(labels_arr: np.ndarray) -> np.ndarray:
                """Vectorized pointer compression on the driver:
                label ← min(label, label-of-label) to fixpoint. Label
                values are node ids, so the indirection is a
                searchsorted into the node universe."""
                while True:
                    pos = np.searchsorted(nodes_sorted, labels_arr)
                    nl = np.minimum(labels_arr, labels_arr[pos])
                    if np.array_equal(nl, labels_arr):
                        return labels_arr
                    labels_arr = nl

            labels_arr = _compress(labels_arr)
            converged = False
            for _ in range(max_iters):
                lab_ref = ray.put((nodes_sorted, labels_arr))

                def _improve(t: pa.Table) -> pa.Table:
                    nodes_s, labs_s = ray.get(lab_ref)
                    node = t["node"].to_numpy(zero_copy_only=False)
                    nbr = t["nbr"].to_numpy(zero_copy_only=False)
                    posn = np.searchsorted(nodes_s, node)
                    posb = np.searchsorted(nodes_s, nbr)
                    # every node/nbr IS in the universe; fail loudly
                    # rather than mislabel if that ever breaks
                    if not np.array_equal(nodes_s[posn], node) or not (
                        np.array_equal(nodes_s[posb], nbr)
                    ):
                        raise RuntimeError("label lookup miss")
                    cand = labs_s[posb]
                    m = cand < labs_s[posn]
                    if not m.any():
                        return pa.table(
                            {"node": pa.array([], pa.int64()),
                             "lab": pa.array([], pa.int64())}
                        )
                    nm, cm = node[m], cand[m]
                    order = np.argsort(nm, kind="stable")
                    ns, cs = nm[order], cm[order]
                    starts = np.flatnonzero(np.r_[True, ns[1:] != ns[:-1]])
                    return pa.table(
                        {"node": ns[starts],
                         "lab": np.minimum.reduceat(cs, starts)}
                    )

                imp = und.map_batches(
                    _improve, batch_format="pyarrow"
                ).materialize()
                imp_blocks = [
                    b
                    for b in ray.get(
                        [
                            r
                            for bundle in imp.iter_internal_ref_bundles()
                            for r in bundle.block_refs
                        ]
                    )
                    if b.num_rows
                ]
                if not imp_blocks:
                    # no edge improves any label ⇒ labels constant
                    # across every edge ⇒ exact component minima
                    converged = True
                    break
                imp_t = pa.concat_tables(imp_blocks)
                np.minimum.at(
                    labels_arr,
                    np.searchsorted(
                        nodes_sorted,
                        imp_t["node"].to_numpy(zero_copy_only=False),
                    ),
                    imp_t["lab"].to_numpy(zero_copy_only=False),
                )
                labels_arr = _compress(labels_arr)
            if not converged:
                import warnings

                warnings.warn(
                    f"components_dataset: label propagation did not "
                    f"converge in {max_iters} iterations — returned "
                    f"labels may split components",
                    RuntimeWarning,
                    stacklevel=2,
                )
            out = pa.table(
                {"node": pa.array(nodes_sorted),
                 "label": pa.array(labels_arr)}
            )
            return ray.data.from_arrow(out)

    # ---- above the gate: labels stay a Dataset, bucketed joins
    labels = _detach(
        partials.groupby("node").aggregate(Min("lab", alias_name="label"))
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
