"""Mergeable cardinality sketch (HyperLogLog) — the approximate scale
path next to exact distinct counting.

Shape: per-batch partial sketches (one fixed-width uint8 register array
per group) -> shuffle moves sketches, never raw keys -> register-wise
max merge -> estimate. At 10^12 rows the exchange for an approximate
distinct is O(groups * 2^p) bytes, independent of row count.

Standard HLL with the bias-corrected estimator (Flajolet et al. 2007);
hashing is a seed-fixed 64-bit mix so results are deterministic across
workers and runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_P = 12                 # 2^12 = 4096 registers, ~1.6% relative error
_M = 1 << _P
_ALPHA = 0.7213 / (1 + 1.079 / _M)


def _hash64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic 64-bit mix of int keys."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_partial(keys: np.ndarray) -> np.ndarray:
    """One batch of int keys -> a (2^p,) uint8 register array."""
    h = _hash64(np.asarray(keys))
    idx = (h >> np.uint64(64 - _P)).astype(np.int64)
    rest = h << np.uint64(_P)  # top p bits consumed
    # rank = leading zeros of the remaining 64-p bits + 1
    lz = np.full(len(h), 64 - _P, dtype=np.uint8)
    nonzero = rest != 0
    if nonzero.any():
        r = rest[nonzero]
        # bit_length via log2 on floats is unsafe at 64 bits; do it in halves
        hi = (r >> np.uint64(32)).astype(np.uint32)
        lo = (r & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        bl_hi = np.where(hi != 0,
                         np.floor(np.log2(hi.astype(np.float64) + 0.0) + 1e-12)
                         .astype(np.int64) + 1, 0)
        bl_lo = np.where(lo != 0,
                         np.floor(np.log2(lo.astype(np.float64) + 1e-12))
                         .astype(np.int64) + 1, 0)
        bl = np.where(hi != 0, bl_hi + 32, bl_lo)
        lz[nonzero] = (64 - bl).astype(np.uint8)
    rank = (lz[: len(h)].astype(np.uint8) + 1).clip(1, 64 - _P + 1)
    regs = np.zeros(_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(sketches) -> np.ndarray:
    out = np.zeros(_M, dtype=np.uint8)
    for s in sketches:
        np.maximum(out, np.asarray(s, dtype=np.uint8), out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    regs = np.asarray(regs, dtype=np.float64)
    est = _ALPHA * _M * _M / np.sum(np.power(2.0, -regs))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * _M and zeros:
        est = _M * np.log(_M / zeros)  # small-range correction
    return float(est)


def approx_distinct(ds, key_col: str, group_col: str | None = None):
    """Dataset -> (group?, approx_n) via mergeable per-batch sketches.

    Without group_col: one global estimate (pa.Table with one row).
    With group_col: one estimate per group (groups must be modest in
    number — each carries a 4 KiB sketch)."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_numpy(zero_copy_only=False)
        if group_col is None:
            return pa.table({
                "g": pa.array([0], pa.int64()),
                "sketch": pa.array([hll_partial(keys).tobytes()],
                                   pa.binary())})
        groups = b.column(group_col).to_numpy(zero_copy_only=False)
        # one sort-based segmentation instead of a full boolean scan of
        # the batch per distinct group (O(n log n) vs O(groups * n))
        order = np.argsort(groups, kind="stable")
        sg = groups[order]
        sk = keys[order]
        uniq, starts = np.unique(sg, return_index=True)
        bounds = np.append(starts, len(sg))
        return pa.table({
            "g": pa.array(uniq),
            "sketch": pa.array(
                [hll_partial(sk[bounds[i]:bounds[i + 1]]).tobytes()
                 for i in range(len(uniq))],
                pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    by_group: dict = {}
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        for g, s in zip(t.column("g").to_pylist(),
                        t.column("sketch").to_pylist()):
            regs = np.frombuffer(s, dtype=np.uint8)
            cur = by_group.get(g)
            by_group[g] = regs if cur is None else np.maximum(cur, regs)
    gs = sorted(by_group)
    out_col = "grp" if group_col is None else group_col
    return pa.table({
        out_col: pa.array(gs),
        "approx_n": pa.array([round(hll_estimate(by_group[g]))
                              for g in gs], pa.int64())})
