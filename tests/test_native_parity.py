"""Bit-exact parity: C kernels (kernels/_native.c) vs the pure-Python
paths they replace.

The golden conformance suite already pins the native path against the
reference fixtures; this file fuzzes the two implementations against
each other directly, covering regimes the fixtures may miss (degenerate
slabs, metrics tracking, long runs that hit the vectorized Python path,
rings whose winding must flip).  Equality is BIT equality on the float64
payload (``tobytes()``), not approx.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

from geojson_vt_ray.kernels import native
from geojson_vt_ray.kernels.clip import _clip_line_py
from geojson_vt_ray.kernels.geom import Line
from geojson_vt_ray.kernels.tile import Tile, _rewind

pytestmark = pytest.mark.skipif(
    native.LIB is None, reason="native kernel unavailable (no gcc?)")


def _rand_line(rng: np.random.Generator, n: int, closed: bool) -> Line:
    v = np.empty((n, 3), dtype=np.float64)
    # random walk keeps segments short so slabs cut through many of them
    v[:, 0] = np.cumsum(rng.normal(0, 0.08, n)) + 0.5
    v[:, 1] = np.cumsum(rng.normal(0, 0.08, n)) + 0.5
    v[:, 2] = rng.random(n) * 4e-8  # sqdist magnitudes like real tiles
    if closed and n >= 2:
        v[-1] = v[0]
    seg = np.sqrt(np.sum(np.diff(v[:, :2], axis=0) ** 2, axis=1))
    size = float(np.sum(seg))
    return Line(v, size, 0.0, size)


def _assert_slices_equal(a: list[Line], b: list[Line], ctx: str) -> None:
    assert len(a) == len(b), ctx
    for i, (sa, sb) in enumerate(zip(a, b)):
        assert sa.v.tobytes() == sb.v.tobytes(), f"{ctx} slice {i} verts"
        assert (sa.size, sa.start, sa.end) == (sb.size, sb.start, sb.end), \
            f"{ctx} slice {i} meta"


# (is_polygon=True, track_metrics=True) is deliberately absent: metrics
# are a LineString-only concept (clip_feature always passes False for
# rings, as does the reference JS), and the vectorized Python path
# doesn't model slice-start bookkeeping for the unreachable combo.
@pytest.mark.parametrize("is_polygon,track_metrics",
                         [(False, False), (False, True), (True, False)])
def test_clip_line_fuzz(is_polygon: bool, track_metrics: bool) -> None:
    rng = np.random.default_rng(20260817 + is_polygon * 2 + track_metrics)
    # n spans both the scalar (<=48) and vectorized Python regimes
    sizes = [1, 2, 3, 7, 20, 47, 48, 49, 120, 500]
    for trial in range(40):
        n = sizes[trial % len(sizes)]
        line = _rand_line(rng, n, closed=is_polygon)
        lo = float(rng.uniform(-0.2, 1.0))
        hi = lo + float(rng.uniform(0.0, 0.9))
        for axis in (0, 1):
            py = _clip_line_py(line, lo, hi, axis, is_polygon, track_metrics)
            nat = native.clip_line_native(line, lo, hi, axis, is_polygon,
                                          track_metrics)
            _assert_slices_equal(
                py, nat,
                f"n={n} axis={axis} slab=({lo},{hi}) poly={is_polygon} "
                f"metrics={track_metrics} trial={trial}")


def test_clip_line_edge_slabs() -> None:
    rng = np.random.default_rng(7)
    line = _rand_line(rng, 64, closed=False)
    on_vertex = sorted((float(line.v[3, 0]), float(line.v[9, 0])))
    for (lo, hi) in [(-10.0, 10.0),          # fully inside
                     (10.0, 20.0),           # fully outside
                     (0.5, 0.5),             # zero-width slab
                     tuple(on_vertex)]:      # slab edges on vertices
        for is_polygon in (False, True):
            py = _clip_line_py(line, lo, hi, 0, is_polygon, False)
            nat = native.clip_line_native(line, lo, hi, 0, is_polygon, False)
            _assert_slices_equal(py, nat, f"slab=({lo},{hi})")


def _thin_py(ln: Line, keep_all: bool, sq_tolerance: float,
             is_polygon: bool, is_outer: bool) -> np.ndarray:
    if keep_all:
        keep = ln.v[:, 0:2].copy()
    else:
        keep = ln.v[ln.v[:, 2] > sq_tolerance, 0:2]
    if is_polygon:
        _rewind(keep, is_outer)
    return keep


@pytest.mark.parametrize("is_polygon,is_outer",
                         [(False, False), (True, True), (True, False)])
def test_thin_rewind_fuzz(is_polygon: bool, is_outer: bool) -> None:
    rng = np.random.default_rng(99 + is_polygon + is_outer)
    for trial in range(60):
        n = int(rng.integers(1, 200))
        ln = _rand_line(rng, n, closed=is_polygon)
        for keep_all, sq_tol in [(True, 0.0), (False, 2e-8), (False, 1.0),
                                 (False, 0.0)]:
            py = _thin_py(ln, keep_all, sq_tol, is_polygon, is_outer)
            nat = native.thin_rewind_native(ln, keep_all, sq_tol,
                                            is_polygon, is_outer)
            assert py.shape == nat.shape
            assert py.tobytes() == nat.tobytes(), (
                f"n={n} keep_all={keep_all} sq_tol={sq_tol} "
                f"poly={is_polygon} outer={is_outer}")


def test_simplify_mark_fuzz() -> None:
    """C DP-marking vs the Python fallback, bit-exact — including the
    degenerate collinear/duplicate inputs that exercise the reference's
    stale-minpos tie-break (simplify.js issue #104 workaround)."""
    from geojson_vt_ray.kernels.simplify import simplify_mark

    rng = np.random.default_rng(3)
    for trial in range(150):
        n = int(rng.integers(3, 500))
        v = np.zeros((n, 3))
        v[:, 0] = np.cumsum(rng.normal(0, 0.05, n))
        v[:, 1] = np.cumsum(rng.normal(0, 0.05, n))
        if trial % 5 == 0:  # collinear + duplicated point
            v[:, 1] = 0.0
            v[rng.integers(0, n)] = v[0]
        if trial % 7 == 0:  # heavy exact duplicates
            v[:, 0] = np.round(v[:, 0], 1)
            v[:, 1] = np.round(v[:, 1], 1)
        tol = float(rng.choice([0.0, 1e-8, 1e-4, 1e-2]))
        a = v.copy()
        b = v.copy()
        simplify_mark(a, tol)  # native (LIB is non-None per skipif)
        real = native.LIB
        try:
            native.LIB = None
            simplify_mark(b, tol)
        finally:
            native.LIB = real
        assert a.tobytes() == b.tobytes(), f"trial={trial} n={n} tol={tol}"


def test_thin_line_stats_parity() -> None:
    """tile.num_points / num_simplified bookkeeping must not depend on
    which kernel ran (the manifest/stats oracle reads these)."""
    from geojson_vt_ray.kernels.tile import _thin_line

    rng = np.random.default_rng(5)
    for tol in (0.0, 3e-4):
        ln = _rand_line(rng, 150, closed=True)
        t_nat = Tile(0, 0, 0)
        r_nat = _thin_line(ln, tol, tol * tol, True, True, t_nat)

        real_lib = native.LIB
        try:
            native.LIB = None
            t_py = Tile(0, 0, 0)
            r_py = _thin_line(ln, tol, tol * tol, True, True, t_py)
        finally:
            native.LIB = real_lib

        assert (t_nat.num_points, t_nat.num_simplified) == \
            (t_py.num_points, t_py.num_simplified)
        if r_py is None:
            assert r_nat is None
        else:
            assert r_nat.tobytes() == r_py.tobytes()


def test_fallback_suite_without_native() -> None:
    """The pure-Python kernels must stay golden on a gcc-less node:
    rerun the kernel + local-conformance suites with GVT_NO_NATIVE=1
    (these are the non-Ray suites, a few seconds total)."""
    env = {**os.environ, "GVT_NO_NATIVE": "1"}
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
         "tests/test_kernels.py", "tests/test_conformance_local.py"],
        env=env, capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, (r.stdout or "")[-2000:] + (r.stderr or "")[-500:]


def test_pyext_vs_ctypes_parity() -> None:
    """The fastcall extension and the ctypes binding wrap the same C
    functions; their wrapper-level outputs must be bit-identical (the
    main fuzz suites above exercise whichever path is preferred, so this
    pins the OTHER one by disabling EXT in-process)."""
    if native.EXT is None:
        pytest.skip("pyext unavailable")
    from geojson_vt_ray.kernels.geom import _bbox_lines

    rng = np.random.default_rng(42)
    real_ext = native.EXT
    for trial in range(30):
        n = int(rng.integers(1, 300))
        closed = bool(trial % 2)
        ln = _rand_line(rng, n, closed=closed)
        lo = float(rng.uniform(-0.2, 1.0))
        hi = lo + float(rng.uniform(0.0, 0.9))
        args = [(ln, lo, hi, trial % 2, closed, (not closed) and trial % 3 == 0)]
        for a in args:
            ext_clip = native.clip_line_native(*a)
            ext_thin = native.thin_rewind_native(ln, trial % 4 == 0, 2e-8,
                                                 closed, True)
            ext_bb = _bbox_lines([ln])
            vx = ln.v.copy()
            native.simplify_mark_native(vx, 1e-9)
            try:
                native.EXT = None
                ct_clip = native.clip_line_native(*a)
                ct_thin = native.thin_rewind_native(ln, trial % 4 == 0, 2e-8,
                                                    closed, True)
                ct_bb = _bbox_lines([ln])
                vy = ln.v.copy()
                native.simplify_mark_native(vy, 1e-9)
            finally:
                native.EXT = real_ext
            _assert_slices_equal(ext_clip, ct_clip, f"trial={trial} clip")
            assert ext_thin.tobytes() == ct_thin.tobytes(), f"trial={trial}"
            assert ext_bb == ct_bb, f"trial={trial}"
            assert vx.tobytes() == vy.tobytes(), f"trial={trial} simplify"


def test_pyext_rejects_swapped_dtype() -> None:
    """A byte-swapped float64 array must fall back (TypeError inside the
    ext), not be reinterpreted as native-endian garbage."""
    if native.EXT is None:
        pytest.skip("pyext unavailable")
    from geojson_vt_ray.kernels.geom import _bbox_lines

    rng = np.random.default_rng(3)
    ln = _rand_line(rng, 20, closed=False)
    swapped = Line(ln.v.astype(">f8"), ln.size, ln.start, ln.end)

    ref_clip = native.clip_line_native(ln, 0.3, 0.7, 0, False, True)
    sw_clip = native.clip_line_native(swapped, 0.3, 0.7, 0, False, True)
    _assert_slices_equal(ref_clip, sw_clip, "swapped clip")

    ref_thin = native.thin_rewind_native(ln, False, 1e-8, False, True)
    sw_thin = native.thin_rewind_native(swapped, False, 1e-8, False, True)
    assert ref_thin.tobytes() == sw_thin.tobytes()

    assert _bbox_lines([ln]) == _bbox_lines([swapped])


def test_bbox_lines_accepts_generator() -> None:
    """_bbox_lines must not silently fold nothing when handed a generator
    whose first array forces the ext to fall back mid-iteration."""
    from geojson_vt_ray.kernels.geom import _bbox_lines

    rng = np.random.default_rng(4)
    lines = [_rand_line(rng, 10, closed=False) for _ in range(3)]
    lines[0] = Line(lines[0].v.astype(">f8"), 0.0, 0.0, 0.0)
    expect = _bbox_lines(list(lines))
    got = _bbox_lines(iter(lines))
    assert got == expect and np.isfinite(expect[0])
