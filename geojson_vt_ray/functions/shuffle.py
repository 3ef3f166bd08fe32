"""Cluster-scaled shuffle sizing.

Two knobs every wide operator here shares:

- ``num_join_partitions()``: fan-out for Ray hash joins — ~1 partition
  per core, clamped, instead of a hard-coded constant.
- ``coarse_mask()``: bucket mask for the coarse-key groupby pattern
  (shuffle by ``key & mask``, then do the real per-key work vectorized
  inside map_groups). Ray's per-group overhead is ruinous at 1e5+ tiny
  groups, so no operator groups by its natural key directly; the bucket
  count scales with cluster size (~8 per core, min 256) rather than
  staying pinned at 256 on a 1000-core cluster.
"""

from __future__ import annotations


def _cpus(default: int = 32) -> int:
    try:
        import ray
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def num_join_partitions() -> int:
    """Hash-join fan-out. Each partition is a HashShuffleAggregator
    ACTOR: on a single node, actor spin-up + context switching dominate
    below ~1M rows/partition (measured: a 150k-row left_anti join costs
    3.7s at 8 partitions but 38s at 32 as idle join workers accumulate),
    so partitions are ~cores/4 capped at 64. On a multi-node cluster the
    aggregators spread out and the cap (not the /4) binds — at 256 nodes
    this yields 64 partitions, raise the cap if partitions exceed a
    worker's heap (partition_size_hint is the per-call override)."""
    return max(2, min(64, _cpus(8) // 4))


def coarse_mask() -> int:
    n = max(256, 8 * _cpus())
    return (1 << (n - 1).bit_length()) - 1
