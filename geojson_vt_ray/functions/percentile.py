"""Exact per-group percentiles (order statistics) WITHOUT a global sort.

Two-pass histogram selection, the distributed-selection classic:

1. one vectorized pass builds per-(group, bucket) counts over a fixed
   integer value domain (per-batch ``np.bincount``-style partials,
   merged with the repo's coarse-key groupby pattern — the shuffle
   carries at most groups x n_buckets count rows, never data rows);
2. the tiny merged histogram (an aggregate RESULT, driver-safe by
   construction) pins, for each group and percentile p, the bucket
   containing order statistic ``ceil(p * N)`` and the rank within it;
3. a second pass extracts only the rows landing in target buckets
   (~N/n_buckets of the data) and resolves the exact value per target
   inside a grouped vectorized sort.

Matches DuckDB ``percentile_disc(p) WITHIN GROUP (ORDER BY v)`` exactly
(rank = ceil(p*N), 1-indexed) on int64 values — the threshold test and
outputs are integer-only, so the oracle compare is bit-exact.

At 100 TB: a single refinement level bounds pass-2 volume at N/n_buckets
rows per group; if a group's bucket still exceeds a task's memory, run
the same two passes recursively on the target bucket (n_buckets scales
the reduction per level — 2^20 buckets cuts 1e12 rows to 1e6).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .shuffle import coarse_mask as _coarse_mask_fn


def _crc_keys(strs: list[str]) -> np.ndarray:
    import zlib

    return np.fromiter((zlib.crc32(s.encode("utf-8")) for s in strs),
                       dtype=np.uint64, count=len(strs))


def group_percentiles(ds, group_col: str, value_col: str,
                      ps: tuple[float, ...] = (0.5, 0.9, 0.99),
                      n_buckets: int = 1024) -> pa.Table:
    """Dataset -> one row per group with exact percentile_disc values.

    ``value_col`` must be int64. Output columns: ``group_col`` plus
    ``p{int(p*100)}`` int64 per requested percentile, sorted by group.
    """
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = agg[f"min({value_col})"], agg[f"max({value_col})"]
    if lo is None:
        cols = {group_col: pa.array([], pa.string())}
        for p in ps:
            cols[f"p{int(round(p * 100))}"] = pa.array([], pa.int64())
        return pa.table(cols)
    width = max(1, -(-(hi - lo + 1) // n_buckets))
    cmask = _coarse_mask_fn()

    def hist_partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_pylist()
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        bk = (v - lo) // width
        df = pd.DataFrame({"grp": g, "bucket": bk})
        cnt = (df.groupby(["grp", "bucket"], sort=False).size()
               .reset_index(name="cnt"))
        ck = (_crc_keys(list(cnt["grp"])) * np.uint64(n_buckets)
              + cnt["bucket"].to_numpy().astype(np.uint64)) & np.uint64(cmask)
        return pa.table({"grp": pa.array(cnt["grp"], pa.string()),
                         "bucket": pa.array(cnt["bucket"], pa.int64()),
                         "cnt": pa.array(cnt["cnt"], pa.int64()),
                         "ckey": pa.array(ck.astype(np.int32))})

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["grp", "bucket"], sort=False)["cnt"].sum()
               .reset_index())
        return out[["grp", "bucket", "cnt"]]

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("ckey").map_groups(merge_counts,
                                        batch_format="pandas")
            .to_pandas())

    # per-group CDF walk -> (group, bucket) -> [(p, within_rank)]: one
    # sorted groupby over the tiny histogram, not a per-group rescan
    targets: dict[tuple[str, int], list[tuple[float, int]]] = {}
    hist = hist.sort_values(["grp", "bucket"], ignore_index=True)
    groups = []
    for grp, sub in hist.groupby("grp", sort=True):
        groups.append(grp)
        counts = sub["cnt"].to_numpy()
        buckets = sub["bucket"].to_numpy()
        cum = np.cumsum(counts)
        n = int(cum[-1])
        for p in ps:
            rank = max(1, math.ceil(p * n))  # 1-indexed order statistic
            i = int(np.searchsorted(cum, rank))
            within = rank - (int(cum[i - 1]) if i else 0)
            targets.setdefault((grp, int(buckets[i])), []).append(
                (p, within))

    # composite (crc(grp), bucket) keys of the G x |ps| target buckets:
    # one np.isin membership test per batch. A crc collision only adds a
    # false-positive row — resolve() discards non-target (grp, bucket)s.
    target_ukeys = np.unique(np.asarray(
        [int(_crc_keys([grp])[0]) * n_buckets + bucket
         for grp, bucket in targets], dtype=np.uint64))

    def extract(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_pylist()
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        bk = (v - lo) // width
        uk = _crc_keys(g) * np.uint64(n_buckets) + bk.astype(np.uint64)
        keep = np.isin(uk, target_ukeys)
        ck = uk[keep] & np.uint64(cmask)
        return pa.table({
            "grp": pa.array(np.asarray(g, dtype=object)[keep], pa.string()),
            "bucket": pa.array(bk[keep], pa.int64()),
            "val": pa.array(v[keep], pa.int64()),
            "ckey": pa.array(ck.astype(np.int32))})

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        o_grp, o_p, o_v = [], [], []
        for (grp, bucket), sub in g.groupby(["grp", "bucket"], sort=False):
            want = targets.get((grp, int(bucket)))
            if not want:
                continue
            vals = np.sort(sub["val"].to_numpy())
            for p, within in want:
                o_grp.append(grp)
                o_p.append(p)
                o_v.append(int(vals[within - 1]))
        return pd.DataFrame({"grp": o_grp, "p": o_p, "val": o_v})

    picked = (ds.map_batches(extract, batch_format="pyarrow")
              .groupby("ckey").map_groups(resolve, batch_format="pandas")
              .to_pandas())

    cols: dict = {group_col: pa.array(groups, pa.string())}
    for p in ps:
        m = {r.grp: int(r.val) for r in
             picked[picked["p"] == p].itertuples()}
        cols[f"p{int(round(p * 100))}"] = pa.array(
            [m[grp] for grp in groups], pa.int64())
    return pa.table(cols)
