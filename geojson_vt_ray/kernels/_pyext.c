/* CPython fastcall bindings for the _native.c kernels.
 *
 * The ctypes path (native.py) costs ~2.6us of argument marshalling per
 * call plus ~3.5us of Python-side slice assembly — more than the C
 * kernel itself on a typical 10-50 point ring.  This extension calls
 * the same compute functions (included below, unchanged — all
 * bit-exactness guarantees carry over) behind METH_FASTCALL wrappers
 * that also do the slice assembly in C.  native.py builds and loads it
 * lazily per node exactly like the ctypes .so and falls back to ctypes
 * (then pure Python) if the build or import fails.
 *
 * Contracts (enforced here, not trusted):
 *   - every ndarray argument must be float64, C-contiguous, and
 *     2-D (n, 3); simplify additionally requires writeable.
 *   - violations raise TypeError so the Python wrapper can fall back.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>
#include <pthread.h>
#include <stddef.h>

#include "_native.c"

static int
check_v3(PyObject *o, PyArrayObject **out, int need_writeable)
{
    if (!PyArray_Check(o)) {
        PyErr_SetString(PyExc_TypeError, "expected ndarray");
        return -1;
    }
    PyArrayObject *a = (PyArrayObject *)o;
    /* byte-swapped or unaligned data would silently compute garbage */
    if (PyArray_TYPE(a) != NPY_FLOAT64 || !PyArray_IS_C_CONTIGUOUS(a) ||
        !PyArray_ISNOTSWAPPED(a) || !PyArray_ISALIGNED(a) ||
        PyArray_NDIM(a) != 2 || PyArray_DIM(a, 1) != 3 ||
        (need_writeable && !PyArray_ISWRITEABLE(a))) {
        PyErr_SetString(PyExc_TypeError,
                        "expected C-contiguous native float64 (n, 3) array");
        return -1;
    }
    *out = a;
    return 0;
}

/* Grow-only per-thread scratch, handed out via a steal/deposit protocol:
 * building the output ndarrays can trigger GC, which can run arbitrary
 * finalizers that re-enter these wrappers on the SAME thread — so a
 * wrapper must never read a shared buffer across a Python allocation.
 * acquire() steals the cached buffers (leaving the cache empty, so a
 * reentrant call simply allocates fresh ones) and release() deposits
 * them back, or frees them if a reentrant call got there first.  A
 * pthread key destructor frees whatever is cached when a thread dies
 * (plain _Thread_local pointers would leak on thread exit). */
typedef struct {
    double *out;        /* cap_pts * 3 doubles */
    int64_t *bounds;    /* cap_sl */
    double *starts;     /* cap_sl */
    double *ends;       /* cap_sl */
    int64_t *stack;     /* cap_stk (simplify recursion stack) */
    int64_t cap_pts, cap_sl, cap_stk;
} scratch_t;

static _Thread_local scratch_t t_cache;
static _Thread_local int t_registered;
static pthread_key_t scratch_key;
static pthread_once_t scratch_key_once = PTHREAD_ONCE_INIT;

static void
scratch_clear(scratch_t *s)
{
    free(s->out);
    free(s->bounds);
    free(s->starts);
    free(s->ends);
    free(s->stack);
    memset(s, 0, sizeof(*s));
}

static void
scratch_key_dtor(void *p)
{
    scratch_clear((scratch_t *)p);
}

static void
scratch_make_key(void)
{
    (void)pthread_key_create(&scratch_key, scratch_key_dtor);
}

static int
scratch_acquire(int64_t need_pts, int64_t need_sl, int64_t need_stk,
                scratch_t *s)
{
    if (!t_registered) {
        pthread_once(&scratch_key_once, scratch_make_key);
        (void)pthread_setspecific(scratch_key, &t_cache);
        t_registered = 1;
    }
    *s = t_cache;
    memset(&t_cache, 0, sizeof(t_cache));
    if (need_pts > s->cap_pts) {
        int64_t cap = need_pts < 4096 ? 4096 : need_pts;
        double *p = realloc(s->out, (size_t)cap * 3 * sizeof(double));
        if (!p)
            goto oom;
        s->out = p;
        s->cap_pts = cap;
    }
    if (need_sl > s->cap_sl) {
        int64_t cap = need_sl < 1024 ? 1024 : need_sl;
        int64_t *b = realloc(s->bounds, (size_t)cap * sizeof(int64_t));
        if (b)
            s->bounds = b;
        double *st = realloc(s->starts, (size_t)cap * sizeof(double));
        if (st)
            s->starts = st;
        double *en = realloc(s->ends, (size_t)cap * sizeof(double));
        if (en)
            s->ends = en;
        if (!b || !st || !en)
            goto oom;
        s->cap_sl = cap;
    }
    if (need_stk > s->cap_stk) {
        int64_t cap = need_stk < 1024 ? 1024 : need_stk;
        int64_t *k = realloc(s->stack, (size_t)cap * sizeof(int64_t));
        if (!k)
            goto oom;
        s->stack = k;
        s->cap_stk = cap;
    }
    return 0;
oom:
    scratch_clear(s);
    PyErr_NoMemory();
    return -1;
}

static void
scratch_release(scratch_t *s)
{
    if (t_cache.out == NULL && t_cache.bounds == NULL &&
        t_cache.stack == NULL && t_cache.cap_pts == 0 &&
        t_cache.cap_sl == 0 && t_cache.cap_stk == 0)
        t_cache = *s;       /* deposit back for the next call */
    else
        scratch_clear(s);   /* a reentrant call re-populated the cache */
    memset(s, 0, sizeof(*s));
}

/* clip_line(v, k1, k2, axis, is_polygon, track_metrics, start, end)
 *   -> list of (verts_(m,3)_ndarray, slice_start, slice_end) */
static PyObject *
ext_clip_line(PyObject *self, PyObject *const *args, Py_ssize_t nargs)
{
    if (nargs != 8) {
        PyErr_SetString(PyExc_TypeError, "clip_line expects 8 args");
        return NULL;
    }
    PyArrayObject *v;
    if (check_v3(args[0], &v, 0) < 0)
        return NULL;
    double k1 = PyFloat_AsDouble(args[1]);
    double k2 = PyFloat_AsDouble(args[2]);
    long axis = PyLong_AsLong(args[3]);
    long is_poly = PyObject_IsTrue(args[4]);
    long track = PyObject_IsTrue(args[5]);
    double start = PyFloat_AsDouble(args[6]);
    double end = PyFloat_AsDouble(args[7]);
    if (PyErr_Occurred())
        return NULL;

    int64_t n = (int64_t)PyArray_DIM(v, 0);
    if (n == 0)
        return PyList_New(0);
    scratch_t s;
    if (scratch_acquire(2 * n + 2, n + 2, 0, &s) < 0)
        return NULL;

    int64_t nsl = gvt_clip_line(
        (const double *)PyArray_DATA(v), n, k1, k2,
        (int32_t)axis, (int32_t)is_poly, (int32_t)track,
        start, end, s.out, s.bounds, s.starts, s.ends);

    PyObject *list = PyList_New(nsl);
    if (!list)
        goto fail;
    int64_t lo = 0;
    for (int64_t i = 0; i < nsl; i++) {
        int64_t hi = s.bounds[i];
        npy_intp dims[2] = {(npy_intp)(hi - lo), 3};
        PyObject *arr = PyArray_SimpleNew(2, dims, NPY_FLOAT64);
        if (!arr)
            goto fail;
        memcpy(PyArray_DATA((PyArrayObject *)arr), s.out + 3 * lo,
               (size_t)(hi - lo) * 3 * sizeof(double));
        /* manual tuple build: Py_BuildValue's "N" double-frees the
         * array if a later element's allocation fails */
        PyObject *tup = PyTuple_New(3);
        if (!tup) {
            Py_DECREF(arr);
            goto fail;
        }
        PyTuple_SET_ITEM(tup, 0, arr);
        PyObject *f1 = PyFloat_FromDouble(track ? s.starts[i] : start);
        PyObject *f2 = PyFloat_FromDouble(track ? s.ends[i] : end);
        if (!f1 || !f2) {
            Py_XDECREF(f1);
            Py_XDECREF(f2);
            Py_DECREF(tup);
            goto fail;
        }
        PyTuple_SET_ITEM(tup, 1, f1);
        PyTuple_SET_ITEM(tup, 2, f2);
        PyList_SET_ITEM(list, i, tup);
        lo = hi;
    }
    scratch_release(&s);
    return list;
fail:
    scratch_release(&s);
    Py_XDECREF(list);
    return NULL;
}

/* thin(v, keep_all, sq_tolerance, is_polygon, clockwise)
 *   -> (k, 2) float64 ndarray of kept [x, y] */
static PyObject *
ext_thin(PyObject *self, PyObject *const *args, Py_ssize_t nargs)
{
    if (nargs != 5) {
        PyErr_SetString(PyExc_TypeError, "thin expects 5 args");
        return NULL;
    }
    PyArrayObject *v;
    if (check_v3(args[0], &v, 0) < 0)
        return NULL;
    long keep_all = PyObject_IsTrue(args[1]);
    double sq_tol = PyFloat_AsDouble(args[2]);
    long is_poly = PyObject_IsTrue(args[3]);
    long clockwise = PyObject_IsTrue(args[4]);
    if (PyErr_Occurred())
        return NULL;

    int64_t n = (int64_t)PyArray_DIM(v, 0);
    scratch_t s;  /* out capacity (2n+2)*3 doubles >= (n+1)*2 pairs */
    if (scratch_acquire(2 * n + 2, 0, 0, &s) < 0)
        return NULL;
    int64_t k = gvt_thin((const double *)PyArray_DATA(v), n, sq_tol,
                         (int32_t)keep_all, (int32_t)is_poly,
                         (int32_t)clockwise, s.out);
    npy_intp dims[2] = {(npy_intp)k, 2};
    PyObject *arr = PyArray_SimpleNew(2, dims, NPY_FLOAT64);
    if (arr)
        memcpy(PyArray_DATA((PyArrayObject *)arr), s.out,
               (size_t)k * 2 * sizeof(double));
    scratch_release(&s);
    return arr;
}

/* simplify(v, sq_tolerance) -> None; marks v[:, 2] in place */
static PyObject *
ext_simplify(PyObject *self, PyObject *const *args, Py_ssize_t nargs)
{
    if (nargs != 2) {
        PyErr_SetString(PyExc_TypeError, "simplify expects 2 args");
        return NULL;
    }
    PyArrayObject *v;
    if (check_v3(args[0], &v, 1) < 0)
        return NULL;
    double sq_tol = PyFloat_AsDouble(args[1]);
    if (PyErr_Occurred())
        return NULL;
    int64_t n = (int64_t)PyArray_DIM(v, 0);
    if (n >= 3) {
        scratch_t s;
        if (scratch_acquire(0, 0, 2 * n + 8, &s) < 0)
            return NULL;
        gvt_simplify((double *)PyArray_DATA(v), n, sq_tol, s.stack);
        scratch_release(&s);
    }
    Py_RETURN_NONE;
}

/* bbox(sequence_of_v) -> (minx, miny, maxx, maxy) over all runs */
static PyObject *
ext_bbox(PyObject *self, PyObject *const *args, Py_ssize_t nargs)
{
    if (nargs != 1) {
        PyErr_SetString(PyExc_TypeError, "bbox expects 1 arg");
        return NULL;
    }
    PyObject *seq = PySequence_Fast(args[0], "bbox expects a sequence");
    if (!seq)
        return NULL;
    double bb[4] = {HUGE_VAL, HUGE_VAL, -HUGE_VAL, -HUGE_VAL};
    Py_ssize_t m = PySequence_Fast_GET_SIZE(seq);
    for (Py_ssize_t i = 0; i < m; i++) {
        PyArrayObject *v;
        if (check_v3(PySequence_Fast_GET_ITEM(seq, i), &v, 0) < 0) {
            Py_DECREF(seq);
            return NULL;
        }
        gvt_bbox((const double *)PyArray_DATA(v),
                 (int64_t)PyArray_DIM(v, 0), bb);
    }
    Py_DECREF(seq);
    return Py_BuildValue("(dddd)", bb[0], bb[1], bb[2], bb[3]);
}

/* ================= full-split quadtree BFS (split_batch) =================
 *
 * C port of stages/fullsplit.FullSplitBuild.__call__'s per-feature BFS
 * (itself the Ray-side reshaping of reference src/index.js:110-155 with a
 * vacuous stopping rule) + stages/build.TileRowAccum.add's tile build
 * (reference src/tile.js:25-83) + the leaf-source emission.  Exact
 * float64 op order everywhere (slab constants, clip, thin/rewind via the
 * kernels above, quantize floor(extent*(v*z2-t)+0.5)); the Python path
 * stays as the bit-exact fallback and parity baseline
 * (tests/test_fullsplit_native.py).  line_metrics is NOT handled here —
 * the Python wrapper routes such batches to the fallback. */

/* geometry type codes — mirror kernels/geom.py */
enum { SGT_POINT = 1, SGT_MULTIPOINT = 2, SGT_LINESTRING = 3,
       SGT_MULTILINESTRING = 4, SGT_POLYGON = 5, SGT_MULTIPOLYGON = 6 };

typedef struct { char *p; size_t len, cap; } gbuf_t; /* bytes */

static int
gb_reserve(gbuf_t *g, size_t add)
{
    if (g->len + add <= g->cap)
        return 0;
    size_t cap = g->cap ? g->cap : 4096;
    while (cap < g->len + add)
        cap *= 2;
    char *p = realloc(g->p, cap);
    if (!p)
        return -1;
    g->p = p;
    g->cap = cap;
    return 0;
}

static int
gb_push(gbuf_t *g, const void *src, size_t nbytes)
{
    if (gb_reserve(g, nbytes) < 0)
        return -1;
    memcpy(g->p + g->len, src, nbytes);
    g->len += nbytes;
    return 0;
}

#define GB_COUNT(g, type) ((g).len / sizeof(type))
#define GB_AT(g, type, i) (((type *)(g).p)[i])

static int gb_push_i32(gbuf_t *g, int32_t v) { return gb_push(g, &v, 4); }
static int gb_push_i64(gbuf_t *g, int64_t v) { return gb_push(g, &v, 8); }
static int gb_push_u8(gbuf_t *g, uint8_t v) { return gb_push(g, &v, 1); }
static int gb_push_f64(gbuf_t *g, double v) { return gb_push(g, &v, 8); }

typedef struct {
    int64_t off;            /* pts arena offset, in triples */
    int32_t len;            /* vertices */
    int32_t poly;           /* dense polygon index within the piece */
    double size, start, end;
} sring_t;

typedef struct {
    int32_t gtype;
    int32_t ring0, nrings;  /* ring arena slice */
    double bb[4];           /* minx, miny, maxx, maxy */
} spiece_t;

typedef struct { int32_t piece, z, x, y; } sq_item_t;

typedef struct {
    /* tile-row outputs */
    gbuf_t trow_src, trow_z, trow_x, trow_y, trow_type, trow_nr, trow_np,
           tring_len, txy;
    /* leaf-source outputs */
    gbuf_t lrow_src, lrow_z, lrow_x, lrow_y, lrow_gt, lrow_nr, lrow_np,
           lrow_bb, lring_len, lring_poly, lring_size, lring_start,
           lring_end, lxyz;
    /* per-feature arenas (len reset per feature, capacity kept) */
    gbuf_t pts, rings, pieces, queue;
    /* clip/thin scratch */
    double *cl_out; int64_t cl_cap;       /* triples */
    int64_t *cl_bounds; double *cl_starts, *cl_ends; int64_t cl_cap_sl;
    double *th_out; int64_t th_cap;       /* pairs */
} sctx_t;

static void
sctx_clear(sctx_t *c)
{
    gbuf_t *bufs = (gbuf_t *)c;
    size_t nbuf = offsetof(sctx_t, cl_out) / sizeof(gbuf_t);
    for (size_t i = 0; i < nbuf; i++)
        free(bufs[i].p);
    free(c->cl_out);
    free(c->cl_bounds);
    free(c->cl_starts);
    free(c->cl_ends);
    free(c->th_out);
    memset(c, 0, sizeof(*c));
}

/* thread-local steal/deposit cache (page-warm reuse across batches,
 * same protocol and rationale as scratch_t above) */
static _Thread_local sctx_t t_sctx;
static _Thread_local int t_sctx_registered;
static pthread_key_t sctx_key;
static pthread_once_t sctx_key_once = PTHREAD_ONCE_INIT;

static void sctx_key_dtor(void *p) { sctx_clear((sctx_t *)p); }
static void sctx_make_key(void) {
    (void)pthread_key_create(&sctx_key, sctx_key_dtor);
}

static void
sctx_acquire(sctx_t *c)
{
    if (!t_sctx_registered) {
        pthread_once(&sctx_key_once, sctx_make_key);
        (void)pthread_setspecific(sctx_key, &t_sctx);
        t_sctx_registered = 1;
    }
    *c = t_sctx;
    memset(&t_sctx, 0, sizeof(t_sctx));
    /* outputs must start empty; arenas are reset per feature anyway */
    gbuf_t *bufs = (gbuf_t *)c;
    size_t nbuf = offsetof(sctx_t, cl_out) / sizeof(gbuf_t);
    for (size_t i = 0; i < nbuf; i++)
        bufs[i].len = 0;
}

static void
sctx_release(sctx_t *c)
{
    if (t_sctx.pts.p == NULL && t_sctx.pieces.p == NULL &&
        t_sctx.cl_out == NULL && t_sctx.trow_src.p == NULL)
        t_sctx = *c;
    else
        sctx_clear(c);
    memset(c, 0, sizeof(*c));
}

static int
sctx_clip_scratch(sctx_t *c, int64_t n)
{
    if (2 * n + 2 > c->cl_cap) {
        int64_t cap = 2 * n + 2 < 4096 ? 4096 : 2 * n + 2;
        double *p = realloc(c->cl_out, (size_t)cap * 3 * sizeof(double));
        if (!p)
            return -1;
        c->cl_out = p;
        c->cl_cap = cap;
    }
    if (n + 2 > c->cl_cap_sl) {
        int64_t cap = n + 2 < 1024 ? 1024 : n + 2;
        int64_t *b = realloc(c->cl_bounds, (size_t)cap * sizeof(int64_t));
        if (b) c->cl_bounds = b;
        double *s = realloc(c->cl_starts, (size_t)cap * sizeof(double));
        if (s) c->cl_starts = s;
        double *e = realloc(c->cl_ends, (size_t)cap * sizeof(double));
        if (e) c->cl_ends = e;
        if (!b || !s || !e)
            return -1;
        c->cl_cap_sl = cap;
    }
    return 0;
}

static int
sctx_thin_scratch(sctx_t *c, int64_t n)
{
    if (n > c->th_cap) {
        int64_t cap = n < 4096 ? 4096 : n;
        double *p = realloc(c->th_out, (size_t)cap * 2 * sizeof(double));
        if (!p)
            return -1;
        c->th_out = p;
        c->th_cap = cap;
    }
    return 0;
}

/* append a new ring to the arena; returns ring index or -1 on OOM.
 * src points at n (x, y, sqdist) triples (may be the pts arena itself:
 * the source block is copied through the clip/thin scratch or input
 * buffers, never aliased across a realloc). */
static int64_t
sp_add_ring(sctx_t *c, const double *src, int64_t n, int32_t poly,
            double size, double start, double end)
{
    sring_t r;
    r.off = (int64_t)(c->pts.len / (3 * sizeof(double)));
    r.len = (int32_t)n;
    r.poly = poly;
    r.size = size;
    r.start = start;
    r.end = end;
    if (gb_push(&c->pts, src, (size_t)n * 3 * sizeof(double)) < 0)
        return -1;
    if (gb_push(&c->rings, &r, sizeof(r)) < 0)
        return -1;
    return (int64_t)(GB_COUNT(c->rings, sring_t) - 1);
}

/* bbox fold over rings [r0, r0+nr) of the arena, outer-only per gtype
 * (geom.create_feature: polygons use ring 0 / first ring of each poly) */
static void
sp_piece_bbox(sctx_t *c, spiece_t *p)
{
    double minx = HUGE_VAL, miny = HUGE_VAL;
    double maxx = -HUGE_VAL, maxy = -HUGE_VAL;
    const sring_t *rings = (const sring_t *)c->rings.p;
    const double *pts = (const double *)c->pts.p;
    int32_t last_poly = -1;
    for (int32_t j = 0; j < p->nrings; j++) {
        const sring_t *r = &rings[p->ring0 + j];
        int outer = 1;
        if (p->gtype == SGT_POLYGON)
            outer = (j == 0);
        else if (p->gtype == SGT_MULTIPOLYGON) {
            outer = (r->poly != last_poly);
            last_poly = r->poly;
        }
        if (!outer)
            continue;
        const double *v = pts + 3 * r->off;
        for (int32_t i = 0; i < r->len; i++) {
            double x = v[3 * i], y = v[3 * i + 1];
            if (x < minx) minx = x;
            if (x > maxx) maxx = x;
            if (y < miny) miny = y;
            if (y > maxy) maxy = y;
        }
    }
    p->bb[0] = minx; p->bb[1] = miny; p->bb[2] = maxx; p->bb[3] = maxy;
}

/* Clip piece pi to slab k1 <= coord[axis] < k2 (same contract as
 * kernels/clip.clip_feature: bbox trivial accept returns pi itself,
 * reject/empty returns -1, OOM returns -2). */
static int64_t
sp_clip(sctx_t *c, int64_t pi, double k1, double k2, int axis)
{
    spiece_t p = GB_AT(c->pieces, spiece_t, pi);  /* by value */
    double fmin = axis == 0 ? p.bb[0] : p.bb[1];
    double fmax = axis == 0 ? p.bb[2] : p.bb[3];
    if (fmin >= k1 && fmax < k2)
        return pi;                       /* trivial accept */
    if (fmax < k1 || fmin >= k2)
        return -1;                       /* trivial reject */

    spiece_t q;
    q.ring0 = (int32_t)GB_COUNT(c->rings, sring_t);
    q.nrings = 0;

    if (p.gtype == SGT_POINT || p.gtype == SGT_MULTIPOINT) {
        sring_t r = GB_AT(c->rings, sring_t, p.ring0);
        if (sctx_clip_scratch(c, r.len) < 0)
            return -2;
        const double *v = (const double *)c->pts.p + 3 * r.off;
        int64_t k = 0;
        for (int32_t i = 0; i < r.len; i++) {
            double a = axis == 0 ? v[3 * i] : v[3 * i + 1];
            if (a >= k1 && a <= k2) {
                c->cl_out[3 * k] = v[3 * i];
                c->cl_out[3 * k + 1] = v[3 * i + 1];
                c->cl_out[3 * k + 2] = v[3 * i + 2];
                k++;
            }
        }
        if (k == 0)
            return -1;
        if (sp_add_ring(c, c->cl_out, k, 0, r.size, r.start, r.end) < 0)
            return -2;
        q.nrings = 1;
        q.gtype = (k == 1) ? SGT_POINT : SGT_MULTIPOINT;
    } else if (p.gtype == SGT_LINESTRING || p.gtype == SGT_MULTILINESTRING) {
        int64_t total = 0;
        for (int32_t j = 0; j < p.nrings; j++) {
            sring_t r = GB_AT(c->rings, sring_t, p.ring0 + j);
            if (r.len == 0)
                continue;
            if (sctx_clip_scratch(c, r.len) < 0)
                return -2;
            const double *v = (const double *)c->pts.p + 3 * r.off;
            int64_t nsl = gvt_clip_line(v, r.len, k1, k2, axis, 0, 0,
                                        r.start, r.end, c->cl_out,
                                        c->cl_bounds, c->cl_starts,
                                        c->cl_ends);
            int64_t lo = 0;
            for (int64_t s = 0; s < nsl; s++) {
                int64_t hi = c->cl_bounds[s];
                if (sp_add_ring(c, c->cl_out + 3 * lo, hi - lo, 0,
                                r.size, r.start, r.end) < 0)
                    return -2;
                lo = hi;
                total++;
            }
        }
        if (total == 0)
            return -1;
        q.nrings = (int32_t)total;
        q.gtype = (total == 1) ? SGT_LINESTRING : SGT_MULTILINESTRING;
    } else { /* polygon / multipolygon */
        int32_t next_poly = -1, last_in = -2;
        for (int32_t j = 0; j < p.nrings; j++) {
            sring_t r = GB_AT(c->rings, sring_t, p.ring0 + j);
            if (r.poly != last_in) {   /* new input polygon group */
                last_in = r.poly;
                next_poly++;           /* tentative dense id */
            }
            if (r.len == 0)
                continue;
            if (sctx_clip_scratch(c, r.len) < 0)
                return -2;
            const double *v = (const double *)c->pts.p + 3 * r.off;
            int64_t nsl = gvt_clip_line(v, r.len, k1, k2, axis, 1, 0,
                                        r.start, r.end, c->cl_out,
                                        c->cl_bounds, c->cl_starts,
                                        c->cl_ends);
            if (nsl > 0 && c->cl_bounds[0] > 0) {
                if (sp_add_ring(c, c->cl_out, c->cl_bounds[0], next_poly,
                                r.size, r.start, r.end) < 0)
                    return -2;
                q.nrings++;
            }
        }
        if (q.nrings == 0)
            return -1;
        q.gtype = p.gtype;
        if (p.gtype == SGT_MULTIPOLYGON) {
            /* re-densify poly ids over the KEPT rings (clip.py drops
             * empty polygons: kept polys are renumbered 0..n-1) */
            sring_t *rings = (sring_t *)c->rings.p;
            int32_t dense = -1, seen = -2;
            for (int32_t j = 0; j < q.nrings; j++) {
                sring_t *r = &rings[q.ring0 + j];
                if (r->poly != seen) {
                    seen = r->poly;
                    dense++;
                }
                r->poly = dense;
            }
        }
    }
    sp_piece_bbox(c, &q);
    if (gb_push(&c->pieces, &q, sizeof(q)) < 0)
        return -2;
    return (int64_t)(GB_COUNT(c->pieces, spiece_t) - 1);
}

/* Tile-row emission: stages/build.TileRowAccum.add without stats, with
 * the quantize (kernels/transform.quantize float64 op order) fused in.
 * Returns 0 ok / -1 OOM. */
static int
sp_emit_tile(sctx_t *c, int64_t src, int64_t pi, int32_t z, int32_t x,
             int32_t y, double opt_tolerance, int32_t extent,
             int32_t max_zoom)
{
    spiece_t p = GB_AT(c->pieces, spiece_t, pi);
    double tol = (z == max_zoom) ? 0.0
        : opt_tolerance / (double)(((int64_t)1 << z) * (int64_t)extent);
    double sq = tol * tol;
    double e = (double)extent;
    double z2 = (double)((int64_t)1 << z);
    double tx = (double)x, ty = (double)y;

    size_t mark_ring = c->tring_len.len, mark_xy = c->txy.len;
    int32_t nr = 0;
    int64_t np_row = 0;
    uint8_t type_code;

    if (p.gtype == SGT_POINT || p.gtype == SGT_MULTIPOINT) {
        type_code = 1;
        sring_t r = GB_AT(c->rings, sring_t, p.ring0);
        if (r.len == 0)
            return 0;  /* simplified empty -> no row */
        const double *v = (const double *)c->pts.p + 3 * r.off;
        if (gb_reserve(&c->txy, (size_t)r.len * 2 * 4) < 0)
            return -1;
        int32_t *o = (int32_t *)(c->txy.p + c->txy.len);
        for (int32_t i = 0; i < r.len; i++) {
            o[2 * i] = (int32_t)floor(e * (v[3 * i] * z2 - tx) + 0.5);
            o[2 * i + 1] = (int32_t)floor(e * (v[3 * i + 1] * z2 - ty) + 0.5);
        }
        c->txy.len += (size_t)r.len * 2 * 4;
        if (gb_push_i32(&c->tring_len, r.len) < 0)
            return -1;
        nr = 1;
        np_row = r.len;
    } else {
        type_code = (p.gtype == SGT_POLYGON || p.gtype == SGT_MULTIPOLYGON)
            ? 3 : 2;
        int is_poly = type_code == 3;
        int32_t last_poly = -1;
        for (int32_t j = 0; j < p.nrings; j++) {
            sring_t r = GB_AT(c->rings, sring_t, p.ring0 + j);
            int is_outer = 0;
            if (p.gtype == SGT_POLYGON)
                is_outer = (j == 0);
            else if (p.gtype == SGT_MULTIPOLYGON) {
                is_outer = (r.poly != last_poly);
                last_poly = r.poly;
            }
            /* tiny-feature filter (tile.js:87-90) */
            if (tol > 0.0 && r.size < (is_poly ? sq : tol))
                continue;
            if (sctx_thin_scratch(c, r.len) < 0)
                return -1;
            const double *v = (const double *)c->pts.p + 3 * r.off;
            int64_t k = gvt_thin(v, r.len, sq, tol == 0.0, is_poly,
                                 is_outer, c->th_out);
            if (gb_reserve(&c->txy, (size_t)k * 2 * 4) < 0)
                return -1;
            int32_t *o = (int32_t *)(c->txy.p + c->txy.len);
            for (int64_t i = 0; i < k; i++) {
                o[2 * i] = (int32_t)floor(
                    e * (c->th_out[2 * i] * z2 - tx) + 0.5);
                o[2 * i + 1] = (int32_t)floor(
                    e * (c->th_out[2 * i + 1] * z2 - ty) + 0.5);
            }
            c->txy.len += (size_t)k * 2 * 4;
            if (gb_push_i32(&c->tring_len, (int32_t)k) < 0)
                return -1;
            nr++;
            np_row += k;
        }
        if (nr == 0) {
            c->tring_len.len = mark_ring;
            c->txy.len = mark_xy;
            return 0;   /* everything filtered -> no row */
        }
    }
    if (gb_push_i64(&c->trow_src, src) < 0 ||
        gb_push_i32(&c->trow_z, z) < 0 ||
        gb_push_i32(&c->trow_x, x) < 0 ||
        gb_push_i32(&c->trow_y, y) < 0 ||
        gb_push_u8(&c->trow_type, type_code) < 0 ||
        gb_push_i32(&c->trow_nr, nr) < 0 ||
        gb_push_i32(&c->trow_np, (int32_t)np_row) < 0)
        return -1;
    return 0;
}

/* Leaf-source emission: arrowio.FeatureRowBuilder.add equivalent. */
static int
sp_emit_leaf(sctx_t *c, int64_t src, int64_t pi, int32_t z, int32_t x,
             int32_t y)
{
    spiece_t p = GB_AT(c->pieces, spiece_t, pi);
    int64_t np_row = 0;
    for (int32_t j = 0; j < p.nrings; j++) {
        sring_t r = GB_AT(c->rings, sring_t, p.ring0 + j);
        const double *v = (const double *)c->pts.p + 3 * r.off;
        if (gb_push(&c->lxyz, v, (size_t)r.len * 3 * sizeof(double)) < 0 ||
            gb_push_i32(&c->lring_len, r.len) < 0 ||
            gb_push_i32(&c->lring_poly, r.poly) < 0 ||
            gb_push_f64(&c->lring_size, r.size) < 0 ||
            gb_push_f64(&c->lring_start, r.start) < 0 ||
            gb_push_f64(&c->lring_end, r.end) < 0)
            return -1;
        np_row += r.len;
    }
    if (gb_push_i64(&c->lrow_src, src) < 0 ||
        gb_push_i32(&c->lrow_z, z) < 0 ||
        gb_push_i32(&c->lrow_x, x) < 0 ||
        gb_push_i32(&c->lrow_y, y) < 0 ||
        gb_push_u8(&c->lrow_gt, (uint8_t)p.gtype) < 0 ||
        gb_push_i32(&c->lrow_nr, p.nrings) < 0 ||
        gb_push_i32(&c->lrow_np, (int32_t)np_row) < 0 ||
        gb_push(&c->lrow_bb, p.bb, 4 * sizeof(double)) < 0)
        return -1;
    return 0;
}

/* BFS for one input feature row.  Returns 0 ok / -1 OOM. */
static int
sp_run_feature(sctx_t *c, int64_t src, const uint8_t gtype,
               const int32_t *ring_lens, const int32_t *ring_polys,
               const double *sizes, const double *starts,
               const double *ends, int32_t nrings, const double *xyz,
               double minx, double miny, double maxx, double maxy,
               int32_t z_in, int32_t x_in, int32_t y_in,
               int32_t imz, int32_t max_zoom, double tolerance,
               int32_t extent, double k1f, int keep_sources)
{
    /* reset per-feature arenas */
    c->pts.len = c->rings.len = c->pieces.len = c->queue.len = 0;

    spiece_t root;
    root.gtype = gtype;
    root.ring0 = 0;
    root.nrings = nrings;
    root.bb[0] = minx; root.bb[1] = miny;
    root.bb[2] = maxx; root.bb[3] = maxy;
    int64_t off = 0;
    for (int32_t j = 0; j < nrings; j++) {
        if (sp_add_ring(c, xyz + 3 * off, ring_lens[j], ring_polys[j],
                        sizes[j], starts[j], ends[j]) < 0)
            return -1;
        off += ring_lens[j];
    }
    if (gb_push(&c->pieces, &root, sizeof(root)) < 0)
        return -1;

    sq_item_t it = {0, z_in, x_in, y_in};
    if (gb_push(&c->queue, &it, sizeof(it)) < 0)
        return -1;

    double k2f = 0.5 - k1f, k3f = 0.5 + k1f, k4f = 1 + k1f;
    size_t head = 0;
    while (head < GB_COUNT(c->queue, sq_item_t)) {
        sq_item_t cur = GB_AT(c->queue, sq_item_t, head);
        head++;
        if (sp_emit_tile(c, src, cur.piece, cur.z, cur.x, cur.y,
                         tolerance, extent, max_zoom) < 0)
            return -1;
        if (cur.z >= imz) {
            if (keep_sources &&
                sp_emit_leaf(c, src, cur.piece, cur.z, cur.x, cur.y) < 0)
                return -1;
            continue;
        }
        double z2 = (double)((int64_t)1 << cur.z);
        double lo_l = ((double)cur.x - k1f) / z2;
        double hi_l = ((double)cur.x + k3f) / z2;
        double lo_r = ((double)cur.x + k2f) / z2;
        double hi_r = ((double)cur.x + k4f) / z2;
        double lo_t = ((double)cur.y - k1f) / z2;
        double hi_t = ((double)cur.y + k3f) / z2;
        double lo_b = ((double)cur.y + k2f) / z2;
        double hi_b = ((double)cur.y + k4f) / z2;

        int64_t halves[2];
        halves[0] = sp_clip(c, cur.piece, lo_l, hi_l, 0);
        if (halves[0] == -2)
            return -1;
        halves[1] = sp_clip(c, cur.piece, lo_r, hi_r, 0);
        if (halves[1] == -2)
            return -1;
        for (int dx = 0; dx < 2; dx++) {
            if (halves[dx] < 0)
                continue;
            for (int dyi = 0; dyi < 2; dyi++) {
                int dy = dyi;
                double lo = dyi == 0 ? lo_t : lo_b;
                double hi = dyi == 0 ? hi_t : hi_b;
                int64_t out = sp_clip(c, halves[dx], lo, hi, 1);
                if (out == -2)
                    return -1;
                if (out < 0)
                    continue;
                sq_item_t child = {(int32_t)out, cur.z + 1,
                                   cur.x * 2 + dx, cur.y * 2 + dy};
                if (gb_push(&c->queue, &child, sizeof(child)) < 0)
                    return -1;
            }
        }
    }
    return 0;
}

static int
check_np(PyObject *o, PyArrayObject **out, int typenum, const char *what)
{
    if (!PyArray_Check(o))
        goto bad;
    PyArrayObject *a = (PyArrayObject *)o;
    if (PyArray_TYPE(a) != typenum || !PyArray_IS_C_CONTIGUOUS(a) ||
        !PyArray_ISNOTSWAPPED(a) || !PyArray_ISALIGNED(a) ||
        PyArray_NDIM(a) != 1)
        goto bad;
    *out = a;
    return 0;
bad:
    PyErr_Format(PyExc_TypeError,
                 "split_batch: %s must be a 1-D C-contiguous native array",
                 what);
    return -1;
}

/* one (name, gbuf, numpy type) output descriptor */
static PyObject *
gb_to_ndarray(const gbuf_t *g, int typenum, npy_intp itemsize)
{
    npy_intp n = (npy_intp)(g->len / itemsize);
    npy_intp dims[1] = {n};
    PyObject *arr = PyArray_SimpleNew(1, dims, typenum);
    if (arr && n)
        memcpy(PyArray_DATA((PyArrayObject *)arr), g->p, g->len);
    return arr;
}

/* split_batch(gtype_u8, pl_off_i32, pl_vals_i32, pi_vals_i32,
 *             sizes_f64, starts_f64, ends_f64, xz_off_i32, xz_vals_f64,
 *             minx, miny, maxx, maxy (f64), z_i32, x_i32, y_i32,
 *             imz, max_zoom, tolerance, extent, buffer, keep_sources)
 *   -> 23-tuple of flat output ndarrays (see the Python wrapper) */
static PyObject *
ext_split_batch(PyObject *self, PyObject *const *args, Py_ssize_t nargs)
{
    if (nargs != 22) {
        PyErr_SetString(PyExc_TypeError, "split_batch expects 22 args");
        return NULL;
    }
    PyArrayObject *gt, *pl_off, *pl_vals, *pi_vals, *sz, *st, *en;
    PyArrayObject *xz_off, *xz_vals, *mnx, *mny, *mxx, *mxy, *zc, *xc, *yc;
    if (check_np(args[0], &gt, NPY_UINT8, "gtype") < 0 ||
        check_np(args[1], &pl_off, NPY_INT32, "pl_off") < 0 ||
        check_np(args[2], &pl_vals, NPY_INT32, "pl_vals") < 0 ||
        check_np(args[3], &pi_vals, NPY_INT32, "pi_vals") < 0 ||
        check_np(args[4], &sz, NPY_FLOAT64, "sizes") < 0 ||
        check_np(args[5], &st, NPY_FLOAT64, "starts") < 0 ||
        check_np(args[6], &en, NPY_FLOAT64, "ends") < 0 ||
        check_np(args[7], &xz_off, NPY_INT32, "xz_off") < 0 ||
        check_np(args[8], &xz_vals, NPY_FLOAT64, "xz_vals") < 0 ||
        check_np(args[9], &mnx, NPY_FLOAT64, "minx") < 0 ||
        check_np(args[10], &mny, NPY_FLOAT64, "miny") < 0 ||
        check_np(args[11], &mxx, NPY_FLOAT64, "maxx") < 0 ||
        check_np(args[12], &mxy, NPY_FLOAT64, "maxy") < 0 ||
        check_np(args[13], &zc, NPY_INT32, "z") < 0 ||
        check_np(args[14], &xc, NPY_INT32, "x") < 0 ||
        check_np(args[15], &yc, NPY_INT32, "y") < 0)
        return NULL;
    long imz = PyLong_AsLong(args[16]);
    long max_zoom = PyLong_AsLong(args[17]);
    double tolerance = PyFloat_AsDouble(args[18]);
    long extent = PyLong_AsLong(args[19]);
    long buf = PyLong_AsLong(args[20]);
    long keep_sources = PyObject_IsTrue(args[21]);
    if (PyErr_Occurred())
        return NULL;

    int64_t n = (int64_t)PyArray_DIM(gt, 0);
    const uint8_t *gtv = (const uint8_t *)PyArray_DATA(gt);
    const int32_t *plo = (const int32_t *)PyArray_DATA(pl_off);
    const int32_t *plv = (const int32_t *)PyArray_DATA(pl_vals);
    const int32_t *piv = (const int32_t *)PyArray_DATA(pi_vals);
    const double *szv = (const double *)PyArray_DATA(sz);
    const double *stv = (const double *)PyArray_DATA(st);
    const double *env = (const double *)PyArray_DATA(en);
    const int32_t *xzo = (const int32_t *)PyArray_DATA(xz_off);
    const double *xzv = (const double *)PyArray_DATA(xz_vals);
    const double *mnxv = (const double *)PyArray_DATA(mnx);
    const double *mnyv = (const double *)PyArray_DATA(mny);
    const double *mxxv = (const double *)PyArray_DATA(mxx);
    const double *mxyv = (const double *)PyArray_DATA(mxy);
    const int32_t *zv = (const int32_t *)PyArray_DATA(zc);
    const int32_t *xv = (const int32_t *)PyArray_DATA(xc);
    const int32_t *yv = (const int32_t *)PyArray_DATA(yc);

    if ((int64_t)PyArray_DIM(pl_off, 0) != n + 1 ||
        (int64_t)PyArray_DIM(xz_off, 0) != n + 1) {
        PyErr_SetString(PyExc_TypeError,
                        "split_batch: offset arrays must have n+1 entries");
        return NULL;
    }

    /* fullsplit slab constant: 0.5 * buffer / extent (same op order) */
    double k1f = 0.5 * (double)buf / (double)extent;

    sctx_t c;
    sctx_acquire(&c);
    int err = 0;
    Py_BEGIN_ALLOW_THREADS
    for (int64_t i = 0; i < n && !err; i++) {
        int32_t r0 = plo[i], r1 = plo[i + 1];
        if (sp_run_feature(&c, i, gtv[i], plv + r0, piv + r0, szv + r0,
                           stv + r0, env + r0, r1 - r0, xzv + xzo[i],
                           mnxv[i], mnyv[i], mxxv[i], mxyv[i],
                           zv[i], xv[i], yv[i],
                           (int32_t)imz, (int32_t)max_zoom, tolerance,
                           (int32_t)extent, k1f, (int)keep_sources) < 0)
            err = 1;
    }
    Py_END_ALLOW_THREADS
    if (err) {
        sctx_release(&c);
        return PyErr_NoMemory();
    }

    struct { const gbuf_t *g; int typenum; npy_intp item; } outs[23] = {
        {&c.trow_src, NPY_INT64, 8}, {&c.trow_z, NPY_INT32, 4},
        {&c.trow_x, NPY_INT32, 4}, {&c.trow_y, NPY_INT32, 4},
        {&c.trow_type, NPY_UINT8, 1}, {&c.trow_nr, NPY_INT32, 4},
        {&c.trow_np, NPY_INT32, 4}, {&c.tring_len, NPY_INT32, 4},
        {&c.txy, NPY_INT32, 4},
        {&c.lrow_src, NPY_INT64, 8}, {&c.lrow_z, NPY_INT32, 4},
        {&c.lrow_x, NPY_INT32, 4}, {&c.lrow_y, NPY_INT32, 4},
        {&c.lrow_gt, NPY_UINT8, 1}, {&c.lrow_nr, NPY_INT32, 4},
        {&c.lrow_np, NPY_INT32, 4}, {&c.lrow_bb, NPY_FLOAT64, 8},
        {&c.lring_len, NPY_INT32, 4}, {&c.lring_poly, NPY_INT32, 4},
        {&c.lring_size, NPY_FLOAT64, 8}, {&c.lring_start, NPY_FLOAT64, 8},
        {&c.lring_end, NPY_FLOAT64, 8}, {&c.lxyz, NPY_FLOAT64, 8},
    };
    PyObject *tup = PyTuple_New(23);
    if (!tup) {
        sctx_release(&c);
        return NULL;
    }
    for (int i = 0; i < 23; i++) {
        PyObject *arr = gb_to_ndarray(outs[i].g, outs[i].typenum,
                                      outs[i].item);
        if (!arr) {
            Py_DECREF(tup);
            sctx_release(&c);
            return NULL;
        }
        PyTuple_SET_ITEM(tup, i, arr);
    }
    sctx_release(&c);
    return tup;
}

static PyMethodDef Methods[] = {
    {"clip_line", (PyCFunction)ext_clip_line, METH_FASTCALL, NULL},
    {"thin", (PyCFunction)ext_thin, METH_FASTCALL, NULL},
    {"simplify", (PyCFunction)ext_simplify, METH_FASTCALL, NULL},
    {"bbox", (PyCFunction)ext_bbox, METH_FASTCALL, NULL},
    {"split_batch", (PyCFunction)ext_split_batch, METH_FASTCALL, NULL},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "gvt_native_ext", NULL, -1, Methods,
};

PyMODINIT_FUNC
PyInit_gvt_native_ext(void)
{
    import_array();
    return PyModule_Create(&moduledef);
}
