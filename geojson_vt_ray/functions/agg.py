"""Skew-safe aggregation helpers (north rule: partitioning / shuffle /
skew handled explicitly).

Two complementary patterns, both used across the engine:

1. **Partial-aggregate-then-combine** (``partial_sum_groupby``): combine
   inside map_batches first so the shuffle moves one row per (batch,
   key) instead of one per input row. A hot key's rows collapse before
   they ever hit the exchange — this is the default defense and what
   q_cell_count / the pyramid stopping aggregate use.

2. **Salted groupby** (``salted_sum``): when even the partial rows for a
   hot key would overload a single reducer (one key owning a large share
   of ALL batches), a salt column spreads that key over ``n_salt``
   reducers; a second tiny combine merges the salted partials. The
   second stage sees at most ``n_salt`` rows per key.

Both return one row per key with identical results to a plain groupby —
asserted by tests/test_functions.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _batch_partial(key_col: str, val_col: str):
    def partial(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_numpy(zero_copy_only=False)
        vals = b.column(val_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, vals.astype(np.float64))
        cnt = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(cnt, inv, 1)
        return pa.table({key_col: pa.array(uniq),
                         val_col: pa.array(sums),
                         "n": pa.array(cnt)})
    return partial


def partial_sum_groupby(ds, key_col: str, val_col: str):
    """sum(val) + count per key; shuffle carries per-batch partials."""
    from ray.data.aggregate import Sum
    return (ds.map_batches(_batch_partial(key_col, val_col),
                           batch_format="pyarrow")
            .groupby(key_col)
            .aggregate(Sum(val_col, alias_name=val_col),
                       Sum("n", alias_name="n")))


def salted_sum(ds, key_col: str, val_col: str, n_salt: int = 8):
    """Same result as partial_sum_groupby, but each key's partials are
    spread over ``n_salt`` reducers first (hot-key defense), then the
    <=n_salt salted rows per key are merged."""
    from ray.data.aggregate import Sum

    partial = _batch_partial(key_col, val_col)

    def add_salt(b: pa.Table) -> pa.Table:
        # deterministic per-batch salt spread: row position modulo salt
        salt = (np.arange(b.num_rows) % n_salt).astype(np.int32)
        return b.append_column("salt", pa.array(salt))

    salted = (ds.map_batches(partial, batch_format="pyarrow")
              .map_batches(add_salt, batch_format="pyarrow")
              .groupby([key_col, "salt"])
              .aggregate(Sum(val_col, alias_name=val_col),
                         Sum("n", alias_name="n")))

    def drop_salt(b: pa.Table) -> pa.Table:
        return b.drop_columns(["salt"])

    return (salted.map_batches(drop_salt, batch_format="pyarrow")
            .groupby(key_col)
            .aggregate(Sum(val_col, alias_name=val_col),
                       Sum("n", alias_name="n")))
