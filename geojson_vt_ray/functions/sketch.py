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


# ------------------------------------------------- approx percentiles
# Bottom-k hash sample: keep the k rows whose mixed 64-bit row hash is
# smallest. The hash order is a uniform random permutation of rows, so
# the survivors are a uniform k-sample without replacement; two partials
# merge by union + dedup + re-truncate (fully mergeable, fixed
# 16 B * k size). Quantile estimates from a k-sample have rank error
# ~1.2/sqrt(k) (normal approx) — k=4096 gives ~2%.
#
# Duplicate decorrelation: row identity inside a partial is (value,
# ordinal among equal values), and every row hash is additionally mixed
# with a per-partial CONTENT SALT (a fold of the partial's raw row
# hashes). Without the salt, the same value appearing once in each of N
# blocks yields N entries with an identical hash, making their
# inclusion all-or-nothing correlated and inflating rank error far past
# the ~1.2/sqrt(k) bound on duplicate-heavy distributions; with it, any
# two blocks that differ anywhere hash the shared duplicates
# independently (tests pin <=6% rank error at 90% duplicates).
# Consequences, both deliberate: (a) estimates depend on how rows were
# batched into blocks (identical input multiset, different splits ->
# different-but-equally-valid samples; passing an explicit ``salt`` to
# all builds restores batching-invariance ONLY when each group's
# values are distinct — a duplicated value's ordinal-within-partial
# still depends on how its copies split across blocks, so
# duplicate-heavy data stays split-dependent even with a shared salt);
# (b) merge dedups identical (hash, value)
# entries so re-merging the same partial is a no-op. Merge itself stays
# associative and commutative over any fixed set of partials. For
# duplicate-exact answers prefer the histogram-selection operator
# (functions/percentile.py), whose two-pass counts are exact.

_BK_K = 4096


def bottomk_partial(values: np.ndarray, k: int = _BK_K,
                    salt=None) -> np.ndarray:
    """int64 values -> (2, m) uint64 array [hash; value] of the m<=k
    bottom-hash rows. Row identity = (value, ordinal among equal values
    in this partial) so duplicated values keep distinct hashes, mixed
    with ``salt`` (default: content-derived, see module comment)."""
    v = values.astype(np.int64, copy=False)
    order = np.argsort(v, kind="stable")
    sv = v[order]
    # ordinal of each row among equal values (vectorized run-length)
    is_new = np.empty(len(sv), bool)
    if len(sv):
        is_new[0] = True
        is_new[1:] = sv[1:] != sv[:-1]
    starts = np.flatnonzero(is_new)
    run_id = np.cumsum(is_new) - 1
    ordinal = np.arange(len(sv), dtype=np.uint64) - \
        starts[run_id].astype(np.uint64)
    hv = _hash64(sv.view(np.uint64) * np.uint64(0x9DDFEA08EB382D69) ^
                 ordinal)
    if salt is None:
        salt = (np.bitwise_xor.reduce(hv) +
                np.uint64(len(hv))) if len(hv) else np.uint64(0)
    h = _hash64(hv ^ np.uint64(salt))
    if len(h) > k:
        sel = np.argpartition(h, k)[:k]
        h, sv = h[sel], sv[sel]
    return np.stack([h, sv.view(np.uint64)])


def bottomk_merge(parts, k: int = _BK_K) -> np.ndarray:
    """Union + dedup + re-truncate; associative, commutative, and
    idempotent over a fixed set of partials."""
    cat = np.concatenate([p for p in parts], axis=1)
    if cat.shape[1]:
        order = np.lexsort((cat[1], cat[0]))
        cat = cat[:, order]
        keep = np.empty(cat.shape[1], bool)
        keep[0] = True
        keep[1:] = ((cat[0, 1:] != cat[0, :-1]) |
                    (cat[1, 1:] != cat[1, :-1]))
        cat = cat[:, keep]
    if cat.shape[1] > k:
        sel = np.argpartition(cat[0], k)[:k]
        cat = cat[:, sel]
    return cat


def bottomk_quantiles(sketch: np.ndarray,
                      ps: tuple[float, ...]) -> list[int]:
    """percentile_disc-style estimates (rank = ceil(p*m)) from the
    sample's sorted values."""
    vals = np.sort(sketch[1].view(np.int64))
    m = len(vals)
    out = []
    for p in ps:
        r = max(1, int(np.ceil(p * m)))
        out.append(int(vals[r - 1]))
    return out


def approx_group_percentiles(ds, group_col: str, value_col: str,
                             ps: tuple[float, ...] = (0.5, 0.9, 0.99),
                             k: int = _BK_K, salt=None) -> "pa.Table":
    """Mergeable approximate per-group percentiles: the sketch twin of
    functions/percentile.group_percentiles (exact). One pass; the
    shuffle-free driver merge handles O(blocks x groups) fixed-size
    sketches — the at-scale alternative when a 3-pass exact answer is
    too expensive or the value domain is unbounded.

    ``value_col`` must be int64. Output columns match the exact
    operator: group_col + p{P} int64 per requested percentile.

    ``salt=None`` (default) lets each partial derive a content salt,
    decorrelating cross-block duplicates (best accuracy on
    duplicate-heavy data) at the cost of estimates that depend on how
    rows were batched into blocks. Passing an explicit integer
    ``salt`` makes estimates batching-invariant and run-reproducible
    WHEN each group's values are distinct (the
    whole-array-equals-merged-partials property); duplicated values
    keep per-split ordinals, so duplicate-heavy groups remain
    split-dependent regardless of salt — there the choice is between
    the content salt's accuracy and the shared salt's correlation, not
    between invariance and not."""
    import ray

    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(value_col).to_numpy(zero_copy_only=False)
        groups = b.column(group_col).to_numpy(zero_copy_only=False)
        order = np.argsort(groups, kind="stable")
        sg, sv = groups[order], vals[order]
        uniq, starts = np.unique(sg, return_index=True)
        bounds = np.append(starts, len(sg))
        return pa.table({
            "g": pa.array(uniq),
            "sketch": pa.array(
                [bottomk_partial(sv[bounds[i]:bounds[i + 1]],
                                 k, salt=salt).tobytes()
                 for i in range(len(uniq))], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    by_group: dict = {}
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        for g, s in zip(t.column("g").to_pylist(),
                        t.column("sketch").to_pylist()):
            sk = np.frombuffer(s, np.uint64).reshape(2, -1)
            cur = by_group.get(g)
            by_group[g] = sk if cur is None else bottomk_merge(
                [cur, sk], k)
    gs = sorted(by_group)
    cols: dict = {group_col: pa.array(gs)}
    ests = [bottomk_quantiles(by_group[g], ps) for g in gs]
    for i, p in enumerate(ps):
        cols[f"p{int(round(p * 100))}"] = pa.array(
            [e[i] for e in ests], pa.int64())
    return pa.table(cols)
