"""zip_with_index — dense global row numbering for a Dataset.

Ray Data has no row-number operator; the reference needs one to assign
dense first-seen surrogate keys starting at 1
(``/root/reference/src/storage/surrogate_key.rs:16-41``). The classic
distributed pattern: materialize the (small, post-aggregation) dataset,
read per-block row counts from block metadata, cumsum the offsets on
the driver, and attach ``offset + local_index`` per block in parallel
Ray tasks. Block order after ``ds.sort`` is the global sort order
(range partitioning), so numbering is deterministic.

Scale note: this is applied AFTER a groupby/min reduction (keys table,
~16 B/row), never to the raw page stream; at 10^10 keys the key table
itself is sharded by the seen-set actors instead (state/seen_set.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote
def _attach_index(block: pa.Table, col: str, offset: int) -> pa.Table:
    idx = pa.array(np.arange(offset, offset + block.num_rows, dtype=np.int64))
    return block.append_column(col, idx)


def zip_with_index(
    ds: "ray.data.Dataset", col: str = "row_index", start: int = 0
) -> "ray.data.Dataset":
    """Append a dense int64 index column in the dataset's current order."""
    m = ds.materialize()
    refs: list = []
    counts: list[int] = []
    for bundle in m.iter_internal_ref_bundles():
        for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
            refs.append(block_ref)
            counts.append(meta.num_rows)
    offsets = np.concatenate([[0], np.cumsum(counts)]) + start
    new_refs = [
        _attach_index.remote(ref, col, int(off)) for ref, off in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(new_refs)
