"""Deterministic sampling, splitting and source mixing — the
training-data-curation operators a 100-TB corpus pipeline needs.

Everything here is HASH-THRESHOLD based: a row's fate is a pure
function of ``(key, salt)`` — no RNG state, no shuffle, no driver
round-trip. That buys the three properties curation pipelines rely on:

- **reproducible**: the same sample comes out at any cluster size,
  block layout or retry history;
- **resumable**: a re-run over a partially-processed input selects the
  identical rows, so partitioned outputs can be skipped;
- **consistent across tables**: sampling two tables by the same key
  keeps them aligned (a doc and its embedding land in the same split).

Integer keys go through a Carter–Wegman ``(a·k + b) mod P`` hash with
the same Mersenne-prime modulus the dedup family uses
(``pipelines/dedup.py:93`` — exact int64 arithmetic, SQL-expressible
for oracle checks). String keys hash through the vectorized murmur3
batch kernel (``functions/urlkeys.py``).

Reference parity: none — the reference crawler has no sampling tier;
this family is part of the engine's LLM-training-data surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_P = 2147483647  # 2^31 - 1, the dedup family's modulus


def _salt_params(salt: int) -> tuple[int, int]:
    """Carter–Wegman (a, b) for a salt, matching the dedup family's
    derivation style (fixed seed → embeddable in an oracle)."""
    rng = np.random.RandomState(salt & 0x7FFFFFFF)
    return int(rng.randint(1, _P)), int(rng.randint(0, _P))


def key01(keys, salt: int = 0) -> np.ndarray:
    """Vectorized ``(key, salt) -> float64 in [0, 1)``.

    Integer keys: exact mod-P Carter–Wegman. Strings/bytes: murmur3-64
    batch kernel folded into the same range. The result is uniform
    enough for fraction thresholds (tested) and perfectly stable."""
    a, b = _salt_params(salt)
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        if pa.types.is_integer(keys.type):
            keys = keys.to_numpy(zero_copy_only=False)
        else:
            keys = keys.to_pylist()
    arr = np.asarray(keys)
    if np.issubdtype(arr.dtype, np.integer):
        k = arr.astype(np.int64) % _P  # numpy %: result in [0, P)
    else:
        from ..functions.urlkeys import murmur3_64_batch

        k = (murmur3_64_batch(list(keys)).astype(np.int64) & 0x7FFFFFFFFFFFFFFF) % _P
    return ((a * k + b) % _P) / _P


def sample_by_hash(ds, key_col: str, fraction: float, salt: int = 0):
    """Keep rows with ``key01(key, salt) < fraction`` — a deterministic
    Bernoulli(fraction) sample, one shuffle-free ``map_batches``.

    Distinct salts give independent samples; the same salt over any
    table sampled by the same key selects ALIGNED rows."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(key01(t[key_col], salt) < fraction))

    return ds.map_batches(f, batch_format="pyarrow")


def _thresholds(fractions: dict[str, float]) -> list[tuple[str, float, float]]:
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    out, lo = [], 0.0
    for name, frac in fractions.items():
        if frac < 0:
            raise ValueError(f"negative fraction for {name!r}")
        out.append((name, lo, lo + frac))
        lo += frac
    return out


def add_split_column(
    ds, key_col: str, fractions: dict[str, float], salt: int = 0,
    out_col: str = "split",
):
    """ONE pass adding a split label ('train'/'val'/... or '' for the
    remainder when fractions sum below 1) — the scale-shaped form for
    writing all splits at once (hive-partition the output by it).
    Splits are disjoint hash intervals, so train/val/test can never
    overlap, and enlarging one fraction later keeps smaller splits'
    membership stable (interval prefixes are preserved)."""
    bands = _thresholds(fractions)

    def f(t: pa.Table) -> pa.Table:
        u = key01(t[key_col], salt)
        lab = np.full(len(u), "", dtype=object)
        for name, lo, hi in bands:
            lab[(u >= lo) & (u < hi)] = name
        return t.append_column(out_col, pa.array(lab, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def hash_split(
    ds, key_col: str, fractions: dict[str, float], salt: int = 0
) -> dict:
    """Disjoint lazy splits as separate Datasets (each a shuffle-free
    filter over the input — one scan per split CONSUMED; use
    :func:`add_split_column` when materializing all of them)."""
    bands = _thresholds(fractions)
    out = {}
    for name, lo, hi in bands:

        def f(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
            u = key01(t[key_col], salt)
            return t.filter(pa.array((u >= lo) & (u < hi)))

        out[name] = ds.map_batches(f, batch_format="pyarrow")
    return out


def mix_sources(
    sources: list[tuple], key_col: str, salt: int = 0
):
    """Weighted corpus mixing: ``[(dataset, rate), ...]`` keeps each
    source's rows at its rate (deterministic per-key Bernoulli), then
    unions the survivors — the standard down-sampling mix step when
    assembling a training corpus from sources of different quality.
    Rates must be in [0, 1]; to UP-weight a source, union several
    ``sample_by_hash`` passes of it with distinct salts instead (each
    pass is an independent sample)."""
    kept = []
    for i, (ds, rate) in enumerate(sources):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate {rate} out of [0, 1] for source {i}")
        # distinct per-source salt: identical keys in different
        # sources must not be correlated
        kept.append(
            ds if rate >= 1.0
            else sample_by_hash(ds, key_col, rate, salt=salt * 1000003 + i)
        )
    if not kept:
        raise ValueError("mix_sources needs at least one source")
    out = kept[0]
    for ds in kept[1:]:
        out = out.union(ds)
    return out


def stratified_sample(
    ds,
    key_col: str,
    strata_col: str,
    fractions: dict,
    default: float = 0.0,
    salt: int = 0,
):
    """Per-stratum deterministic sampling: keep a row iff
    ``key01(key, salt) < fractions.get(row[strata_col], default)`` —
    the per-language / per-source rate knob (e.g. keep 100% of rare
    languages, 5% of English). Same interval semantics as
    ``sample_by_hash``, so raising one stratum's fraction only ADDS
    rows and strata stay aligned across tables sharing the key.
    Shuffle-free: the fraction lookup is a vectorized map over the
    strata column inside each block."""
    import pandas as pd

    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction {frac} for stratum {name!r}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default fraction {default}")

    def f(t: pa.Table) -> pa.Table:
        u = key01(t[key_col], salt)
        strata = pd.Series(t[strata_col].to_pylist())
        thr = strata.map(fractions).fillna(default).to_numpy(dtype=float)
        return t.filter(pa.array(u < thr))

    return ds.map_batches(f, batch_format="pyarrow")
