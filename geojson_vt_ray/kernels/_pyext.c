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

#include "_native.c"

static int
check_v3(PyObject *o, PyArrayObject **out, int need_writeable)
{
    if (!PyArray_Check(o)) {
        PyErr_SetString(PyExc_TypeError, "expected ndarray");
        return -1;
    }
    PyArrayObject *a = (PyArrayObject *)o;
    if (PyArray_TYPE(a) != NPY_FLOAT64 || !PyArray_IS_C_CONTIGUOUS(a) ||
        PyArray_NDIM(a) != 2 || PyArray_DIM(a, 1) != 3 ||
        (need_writeable && !PyArray_ISWRITEABLE(a))) {
        PyErr_SetString(PyExc_TypeError,
                        "expected C-contiguous float64 (n, 3) array");
        return -1;
    }
    *out = a;
    return 0;
}

/* grow-only per-thread scratch for clip outputs */
static _Thread_local double *t_out = NULL;
static _Thread_local int64_t *t_bounds = NULL;
static _Thread_local double *t_starts = NULL;
static _Thread_local double *t_ends = NULL;
static _Thread_local int64_t t_cap_pts = 0;
static _Thread_local int64_t t_cap_sl = 0;

static int
ensure_scratch(int64_t n)
{
    int64_t need_pts = 2 * n + 2;
    int64_t need_sl = n + 2;
    if (need_pts > t_cap_pts) {
        int64_t cap = need_pts < 4096 ? 4096 : need_pts;
        double *p = realloc(t_out, (size_t)cap * 3 * sizeof(double));
        if (!p) { PyErr_NoMemory(); return -1; }
        t_out = p;
        t_cap_pts = cap;
    }
    if (need_sl > t_cap_sl) {
        int64_t cap = need_sl < 1024 ? 1024 : need_sl;
        int64_t *b = realloc(t_bounds, (size_t)cap * sizeof(int64_t));
        double *s = realloc(t_starts, (size_t)cap * sizeof(double));
        double *e = realloc(t_ends, (size_t)cap * sizeof(double));
        if (!b || !s || !e) {
            /* keep whichever grew; sizes re-checked next call */
            if (b) t_bounds = b;
            if (s) t_starts = s;
            if (e) t_ends = e;
            PyErr_NoMemory();
            return -1;
        }
        t_bounds = b;
        t_starts = s;
        t_ends = e;
        t_cap_sl = cap;
    }
    return 0;
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
    if (ensure_scratch(n) < 0)
        return NULL;

    int64_t nsl = gvt_clip_line(
        (const double *)PyArray_DATA(v), n, k1, k2,
        (int32_t)axis, (int32_t)is_poly, (int32_t)track,
        start, end, t_out, t_bounds, t_starts, t_ends);

    PyObject *list = PyList_New(nsl);
    if (!list)
        return NULL;
    int64_t lo = 0;
    for (int64_t i = 0; i < nsl; i++) {
        int64_t hi = t_bounds[i];
        npy_intp dims[2] = {(npy_intp)(hi - lo), 3};
        PyObject *arr = PyArray_SimpleNew(2, dims, NPY_FLOAT64);
        if (!arr) {
            Py_DECREF(list);
            return NULL;
        }
        memcpy(PyArray_DATA((PyArrayObject *)arr), t_out + 3 * lo,
               (size_t)(hi - lo) * 3 * sizeof(double));
        PyObject *tup = Py_BuildValue("(Ndd)", arr,
                                      track ? t_starts[i] : start,
                                      track ? t_ends[i] : end);
        if (!tup) {
            Py_DECREF(arr);
            Py_DECREF(list);
            return NULL;
        }
        PyList_SET_ITEM(list, i, tup);
        lo = hi;
    }
    return list;
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
    if (ensure_scratch(n) < 0)  /* reuse t_out: capacity >= 2n >= n pairs */
        return NULL;
    int64_t k = gvt_thin((const double *)PyArray_DATA(v), n, sq_tol,
                         (int32_t)keep_all, (int32_t)is_poly,
                         (int32_t)clockwise, t_out);
    npy_intp dims[2] = {(npy_intp)k, 2};
    PyObject *arr = PyArray_SimpleNew(2, dims, NPY_FLOAT64);
    if (!arr)
        return NULL;
    memcpy(PyArray_DATA((PyArrayObject *)arr), t_out,
           (size_t)k * 2 * sizeof(double));
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
        if (ensure_scratch(n) < 0)
            return NULL;
        /* stack scratch: 2n+8 int64 <= bounds capacity? bounds is n+2.
         * use a dedicated local allocation to keep capacities honest */
        int64_t *stack = malloc((size_t)(2 * n + 8) * sizeof(int64_t));
        if (!stack) {
            PyErr_NoMemory();
            return NULL;
        }
        gvt_simplify((double *)PyArray_DATA(v), n, sq_tol, stack);
        free(stack);
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
