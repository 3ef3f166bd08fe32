"""Loader + wrappers for the C hot-loop kernels (_native.c).

The slicer's per-core cost is dominated by two tiny scalar loops that
run hundreds of thousands of times per batch: the stripe clip
(clip.py:_clip_line_scalar) and the sqdist thinning + ring rewind
(tile.py:_thin_line/_rewind).  They are bit-exact ports of the
reference JS, so they cannot be expressed as numpy kernels without
paying dispatch overhead per 10-50 point ring.  This module compiles
the equivalent C (same float64 operation order — see _native.c header)
once per node with the system gcc and binds it via ctypes.

Cluster story: the .c source ships with the package; every node
compiles lazily on first import into a content-addressed path under
$TMPDIR, guarded by an exclusive-create + atomic rename so concurrent
Ray workers race safely.  Any failure (no gcc, sandboxed tmp, odd
platform) degrades to ``LIB = None`` and callers keep the pure-Python
path; ``GVT_NO_NATIVE=1`` forces that off for parity testing.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
import threading

import numpy as np

from .geom import Line

_KDIR = os.path.dirname(os.path.abspath(__file__))
_C_SRC = os.path.join(_KDIR, "_native.c")
_PYEXT_SRC = os.path.join(_KDIR, "_pyext.c")

_CFLAGS = ["-O2", "-fPIC", "-shared", "-ffp-contract=off", "-fno-fast-math"]


def _cache_dir() -> str | None:
    # per-uid 0700 cache dir: the path under a shared tmpdir is
    # predictable, so never dlopen a library another user could have
    # planted — own the directory or refuse
    d = os.path.join(tempfile.gettempdir(), f"gvt_native_uid{os.getuid()}")
    try:
        os.makedirs(d, mode=0o700, exist_ok=True)
        st = os.stat(d)
        if st.st_uid != os.getuid() or (st.st_mode & 0o077):
            return None
    except OSError:
        return None
    return d


def _compile(main_src: str, include_deps: list[str], extra_flags: list[str],
             stem: str) -> str | None:
    """Compile main_src into the per-uid cache (content-addressed, atomic
    rename so concurrent Ray workers race safely); returns the .so path
    or None on any failure.  include_deps are files main_src #includes —
    they participate in the cache tag only, gcc never sees them directly
    (passing them too would duplicate every symbol)."""
    try:
        blob = b"".join(open(p, "rb").read()
                        for p in [main_src, *include_deps])
    except OSError:
        return None
    tag = hashlib.sha256(
        blob + " ".join(_CFLAGS + extra_flags).encode()).hexdigest()[:16]
    cache_dir = _cache_dir()
    if cache_dir is None:
        return None
    so_path = os.path.join(
        cache_dir,
        f"{stem}_{tag}_py{sys.version_info[0]}{sys.version_info[1]}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".build.{os.getpid()}"
        try:
            subprocess.run(
                ["gcc", *_CFLAGS, *extra_flags, "-o", tmp, main_src],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)  # atomic; losers overwrite identically
        except Exception:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    return so_path


def _build() -> ctypes.CDLL | None:
    if os.environ.get("GVT_NO_NATIVE"):
        return None
    so_path = _compile(_C_SRC, [], [], "gvt_native")
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    vp = ctypes.c_void_p  # raw addresses: ~2x cheaper per call than data_as
    lib.gvt_clip_line.restype = ctypes.c_int64
    lib.gvt_clip_line.argtypes = [
        vp, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_double, ctypes.c_double, vp, vp, vp, vp]
    lib.gvt_thin.restype = ctypes.c_int64
    lib.gvt_thin.argtypes = [
        vp, ctypes.c_int64, ctypes.c_double, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, vp]
    lib.gvt_simplify.restype = None
    lib.gvt_simplify.argtypes = [vp, ctypes.c_int64, ctypes.c_double, vp]
    lib.gvt_bbox.restype = None
    lib.gvt_bbox.argtypes = [vp, ctypes.c_int64, vp]
    return lib


LIB = _build()


def _build_ext():
    """Build + load the CPython fastcall extension (_pyext.c).

    It wraps the very same compute functions as the ctypes path (the
    extension ``#include``s _native.c, so bit-exactness carries over)
    but does argument passing and slice assembly in C: the ctypes
    marshalling (~2.6us/call) rivals the kernel itself on a 10-50 point
    ring.  Loaded via an explicit ExtensionFileLoader because the cached
    filename is content-tagged while the init symbol is fixed.
    ``GVT_NO_PYEXT=1`` keeps the ctypes path (parity testing)."""
    if LIB is None or os.environ.get("GVT_NO_PYEXT"):
        return None
    try:
        import sysconfig
        inc = ["-I" + sysconfig.get_paths()["include"],
               "-I" + np.get_include(), "-pthread"]
    except Exception:
        return None
    so_path = _compile(_PYEXT_SRC, [_C_SRC], inc, "gvt_native_ext")
    if so_path is None:
        return None
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "gvt_native_ext", so_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


EXT = _build_ext()

# per-thread scratch buffers, grown geometrically (slices are copied out,
# so reuse across calls is safe)
_scratch = threading.local()


def _buffers(n: int):
    cap_pts = 2 * n + 2
    cap_sl = n + 2
    s = _scratch
    if getattr(s, "cap_pts", 0) < cap_pts or getattr(s, "cap_sl", 0) < cap_sl:
        s.cap_pts = max(cap_pts, 4096)
        s.cap_sl = max(cap_sl, 1024)
        s.out = np.empty((s.cap_pts, 3), dtype=np.float64)
        s.bounds = np.empty(s.cap_sl, dtype=np.int64)
        s.starts = np.empty(s.cap_sl, dtype=np.float64)
        s.ends = np.empty(s.cap_sl, dtype=np.float64)
        s.out_p = s.out.ctypes.data
        s.bounds_p = s.bounds.ctypes.data
        s.starts_p = s.starts.ctypes.data
        s.ends_p = s.ends.ctypes.data
    return s


def clip_line_native(line: Line, k1: float, k2: float, axis: int,
                     is_polygon: bool, track_metrics: bool) -> list[Line]:
    """C path of kernels.clip.clip_line — identical output, bit-exact."""
    n = len(line.v)
    if n == 0:
        return []
    if EXT is not None:
        try:
            parts = EXT.clip_line(line.v, k1, k2, axis, is_polygon,
                                  track_metrics, line.start, line.end)
        except TypeError:  # non-contiguous/odd dtype: ctypes path copies
            parts = None
        if parts is not None:
            size = line.size
            return [Line(arr, size, s, e) for arr, s, e in parts]
    vp = line.data_ptr()
    if vp == 0:
        v = np.ascontiguousarray(line.v, dtype=np.float64)
        vp = v.ctypes.data
    s = _buffers(n)
    nsl = LIB.gvt_clip_line(
        vp, n, k1, k2, axis,
        1 if is_polygon else 0, 1 if track_metrics else 0,
        line.start, line.end,
        s.out_p, s.bounds_p, s.starts_p, s.ends_p)
    if nsl == 0:
        return []
    out = s.out
    bounds = s.bounds
    slices: list[Line] = []
    lo = 0
    for i in range(nsl):
        hi = int(bounds[i])
        sl = Line(out[lo:hi].copy(), line.size, line.start, line.end)
        if track_metrics:
            sl.start = float(s.starts[i])
            sl.end = float(s.ends[i])
        slices.append(sl)
        lo = hi
    return slices


def simplify_mark_native(v: np.ndarray, sq_tolerance: float) -> None:
    """C path of kernels.simplify.simplify_mark — marks v[:, 2] in place.

    v MUST be the feature's own C-contiguous float64 (n, 3) array (the
    convert stage builds it that way); the marks land directly in it.
    """
    n = len(v)
    if n < 3:
        return
    if EXT is not None:
        try:
            return EXT.simplify(v, sq_tolerance)
        except TypeError:
            pass
    cap = 2 * n + 8
    s = _scratch
    if getattr(s, "cap_stk", 0) < cap:
        s.cap_stk = max(cap, 4096)
        s.stk = np.empty(s.cap_stk, dtype=np.int64)
        s.stk_p = s.stk.ctypes.data
    LIB.gvt_simplify(v.ctypes.data, n, sq_tolerance, s.stk_p)


def thin_rewind_native(ln: Line, keep_all: bool, sq_tolerance: float,
                       is_polygon: bool, is_outer: bool):
    """C path of kernels.tile._thin_line's keep+rewind core.

    Returns the kept (k, 2) float64 array (possibly empty); the caller
    handles the tiny-ring drop test and tile stats.
    """
    n = len(ln.v)
    if EXT is not None:
        try:
            return EXT.thin(ln.v, keep_all, sq_tolerance, is_polygon,
                            is_outer)
        except TypeError:
            pass
    vp = ln.data_ptr()
    if vp == 0:
        v = np.ascontiguousarray(ln.v, dtype=np.float64)
        vp = v.ctypes.data
    out = np.empty((n, 2), dtype=np.float64)
    k = LIB.gvt_thin(
        vp, n, sq_tolerance,
        1 if keep_all else 0, 1 if is_polygon else 0,
        1 if is_outer else 0, out.ctypes.data)
    if k == n:
        return out
    return out[:k].copy()


def bbox_lines_ext(lines) -> tuple[float, float, float, float] | None:
    """One extension call folding the bbox over every Line's verts.

    Returns (minx, miny, maxx, maxy) or None when any array can't take
    the C path (caller keeps its per-line ctypes/numpy fold).  Empty
    input folds to (+inf, +inf, -inf, -inf), same as the numpy path.
    """
    try:
        return EXT.bbox([ln.v for ln in lines])
    except TypeError:
        return None
