"""Distinct-count sketches — the scale path beyond exact
``groupby(key).count()`` (which shuffles every distinct key).

HyperLogLog (Flajolet et al. 2007, standard bias-corrected variant):
each batch folds its keys into a 2^p-register sketch (numpy
``maximum.at``), partial sketches merge by elementwise max — a few KB
per partial regardless of cardinality, so the combine is driver-safe
at any scale. Deterministic: keys hash with murmur3 (no process
randomness), so the estimate is bit-stable across runs and cluster
shapes.
"""

from __future__ import annotations

import numpy as np
import ray.data

from ..functions.urlkeys import murmur3_64_batch


def hll_register_batch(values, p: int = 12) -> np.ndarray:
    """One HLL partial: uint8[2^p] registers for a batch of values."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    items = [v if isinstance(v, (str, bytes)) else str(v) for v in values]
    h = murmur3_64_batch(items).view(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left aligned
    # rank = position of first 1-bit in the remaining stream, 1-based;
    # all-zero rest → max rank (64 - p + 1)
    rank = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    nz = rest != 0
    # count leading zeros via float64 exponent trick is lossy; use
    # bit_length through log2 on uint64 — exact for nonzero values
    # because we only need the top bit position
    top = np.zeros(len(h), dtype=np.int64)
    r = rest[nz]
    # highest set bit index (63..0) without Python loops
    hb = np.zeros(len(r), dtype=np.int64)
    v = r.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        ge = v >= (np.uint64(1) << np.uint64(shift))
        hb[ge] += shift
        v[ge] >>= np.uint64(shift)
    top[nz] = hb
    rank[nz] = (63 - top[nz] + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected harmonic-mean estimate with small-range
    (linear counting) and large-range corrections."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    two64 = 2.0**64
    if est > two64 / 30.0:
        return -two64 * np.log1p(-est / two64)
    return float(est)


def hll_count_distinct(
    ds: "ray.data.Dataset", col: str, p: int = 12
) -> float:
    """Approximate COUNT(DISTINCT col): per-batch register partials →
    elementwise-max merge on the driver (2^p bytes per partial).
    Typical error ≈ 1.04/√(2^p) ≈ 1.6% at p=12."""
    partials = ds.select_columns([col]).map_batches(
        lambda df: {"regs": [hll_register_batch(df[col].to_numpy(), p)]},
        batch_format="pandas",
    ).to_pandas()
    regs = np.zeros(1 << p, dtype=np.uint8)
    for r in partials["regs"]:
        np.maximum(regs, np.asarray(r, dtype=np.uint8), out=regs)
    return hll_estimate(regs)
