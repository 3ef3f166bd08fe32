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

static PyMethodDef Methods[] = {
    {"clip_line", (PyCFunction)ext_clip_line, METH_FASTCALL, NULL},
    {"thin", (PyCFunction)ext_thin, METH_FASTCALL, NULL},
    {"simplify", (PyCFunction)ext_simplify, METH_FASTCALL, NULL},
    {"bbox", (PyCFunction)ext_bbox, METH_FASTCALL, NULL},
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
