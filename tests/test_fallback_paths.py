"""The documented distributed fallbacks must produce exactly the same
rows as their broadcast defaults (the pattern of
test_minhash_verify_join_equals_collect): each operator claims in its
docstring a shuffle/join path for when the small side outgrows a
broadcast — these tests keep those paths from rotting."""

import numpy as np
import pandas as pd
import pytest

import geojson_vt_ray.pipelines.queries as Q

SF = "/root/testdata/sf0.001"


def _df(res):
    try:
        return res.to_pandas()
    except AttributeError:
        return res


@pytest.mark.parametrize("name,kw_base,kw_fb,sort_cols", [
    ("pip_anti", {"mode": "broadcast"}, {"mode": "cell_join"},
     ["event_id"]),
    ("percent_rank", {"mode": "broadcast"}, {"mode": "hash_join"},
     ["event_id"]),
    ("triangle_count", {"edge_mode": "broadcast"},
     {"edge_mode": "shuffle"}, ["part"]),
    ("graph_bfs", {"mode": "broadcast"}, {"mode": "shuffle"},
     ["node"]),
])
def test_fallback_equals_broadcast(ray_session, name, kw_base, kw_fb,
                                   sort_cols):
    fn = getattr(Q, f"q_{name}")
    base = (_df(fn(SF, **kw_base))
            .sort_values(sort_cols, ignore_index=True))
    fb = (_df(fn(SF, **kw_fb))
          .sort_values(sort_cols, ignore_index=True))
    assert len(base) > 0, f"{name}: empty baseline result"
    assert list(base.columns) == list(fb.columns)
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True), fb.reset_index(drop=True),
        check_dtype=False)
