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


def join_aggregator_args(nparts: int | None = None) -> dict:
    """``aggregator_ray_remote_args`` for every ``Dataset.join`` here.

    Ray's default gives each HashShuffleAggregator actor a FULL CPU
    (the cluster-config-aware fraction only applies when a cluster
    config exists, which local mode lacks). On a small CPU budget
    that deadlocks: a plan with two concurrent 2-partition joins
    requests 4 aggregator CPUs — the whole of a 4-CPU test session —
    and the upstream read/map tasks starve forever (observed: the
    oracle suite hung in q_multiway_join at num_cpus=4). Budget ~25%
    of the cluster's CPUs per join instead, floor 0.25/aggregator:
    at 4 CPUs a 2-partition join costs 1 CPU total; at 32 CPUs and 8
    partitions this returns the same 1 CPU/actor as Ray's default."""
    if nparts is None:
        nparts = num_join_partitions()
    return {"num_cpus": min(1.0, max(0.25, (_cpus(8) / 4) / nparts))}


def coarse_mask() -> int:
    n = max(256, 8 * _cpus())
    return (1 << (n - 1).bit_length()) - 1
