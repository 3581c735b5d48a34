// Native host-side runtime kernels for mfv2d_tpu.
//
// The TPU owns the batched compute path (assembly, solves); this extension
// owns the host-side setup paths that the reference implements in C
// (src/polynomials/*.c, src/geometry/manifold2d.c): GLL quadrature by Newton
// iteration, Lagrange basis table evaluation, and the primal->dual topology
// computation.  All functions are pure array-in/array-out (no Python objects
// in loops), bound through the raw CPython C API.
//
// Falls back transparently to the NumPy implementations when the extension
// is not built (see mfv2d_tpu/ops/quadrature.py and mesh/manifold.py).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Gauss-Lobatto-Legendre quadrature
// ---------------------------------------------------------------------------

// Evaluate P_n(x) and P_n'(x) with the Bonnet recurrence.
static void legendre_pair(int n, double x, double *p_out, double *dp_out) {
    double p_prev = 1.0;
    if (n == 0) {
        *p_out = 1.0;
        *dp_out = 0.0;
        return;
    }
    double p = x;
    for (int k = 1; k < n; ++k) {
        const double p_next = ((2 * k + 1) * x * p - k * p_prev) / (k + 1);
        p_prev = p;
        p = p_next;
    }
    *p_out = p;
    const double denom = 1.0 - x * x;
    if (std::fabs(denom) < 1e-14) {
        const double sgn = (x > 0) ? 1.0 : ((n % 2 == 0) ? -1.0 : 1.0);
        *dp_out = sgn * n * (n + 1) / 2.0;
    } else {
        *dp_out = n * (p_prev - x * p) / denom;
    }
}

static PyObject *gll_nodes_weights(PyObject *, PyObject *args) {
    int n;
    double tol = 1e-15;
    int max_iter = 20;
    if (!PyArg_ParseTuple(args, "i|di", &n, &tol, &max_iter)) return nullptr;
    if (n < 2) {
        PyErr_SetString(PyExc_ValueError, "GLL rule requires at least 2 points.");
        return nullptr;
    }
    npy_intp dims[1] = {n};
    PyObject *nodes_arr = PyArray_SimpleNew(1, dims, NPY_DOUBLE);
    PyObject *weights_arr = PyArray_SimpleNew(1, dims, NPY_DOUBLE);
    if (!nodes_arr || !weights_arr) {
        Py_XDECREF(nodes_arr);
        Py_XDECREF(weights_arr);
        return nullptr;
    }
    double *x = (double *)PyArray_DATA((PyArrayObject *)nodes_arr);
    double *w = (double *)PyArray_DATA((PyArrayObject *)weights_arr);

    x[0] = -1.0;
    x[n - 1] = 1.0;
    const int m = n - 1;  // Legendre degree
    for (int i = 1; i < n - 1; ++i) {
        // Chebyshev-Gauss-Lobatto initial guess, Newton on P'_{n-1}.
        double xi = -std::cos(M_PI * i / m);
        for (int it = 0; it < max_iter; ++it) {
            double p, dp;
            legendre_pair(m, xi, &p, &dp);
            const double ddp = (2.0 * xi * dp - n * m * p) / (1.0 - xi * xi);
            const double dx = dp / ddp;
            xi -= dx;
            if (std::fabs(dx) < tol) break;
        }
        x[i] = xi;
    }
    for (int i = 0; i < n; ++i) {
        double p, dp;
        legendre_pair(m, x[i], &p, &dp);
        w[i] = 2.0 / (n * m * p * p);
    }
    return Py_BuildValue("(NN)", nodes_arr, weights_arr);
}

// ---------------------------------------------------------------------------
// Lagrange basis tables
// ---------------------------------------------------------------------------

// values[i, j] = L_j(x_i) for the Lagrange basis on the given roots.
static PyObject *lagrange_values(PyObject *, PyObject *args) {
    PyObject *roots_obj, *x_obj;
    int derivative = 0;
    if (!PyArg_ParseTuple(args, "OO|i", &roots_obj, &x_obj, &derivative))
        return nullptr;
    PyArrayObject *roots = (PyArrayObject *)PyArray_FROM_OTF(
        roots_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject *xs = (PyArrayObject *)PyArray_FROM_OTF(
        x_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    if (!roots || !xs) {
        Py_XDECREF(roots);
        Py_XDECREF(xs);
        return nullptr;
    }
    const npy_intp nr = PyArray_SIZE(roots);
    const npy_intp nx = PyArray_SIZE(xs);
    const double *r = (const double *)PyArray_DATA(roots);
    const double *xv = (const double *)PyArray_DATA(xs);

    npy_intp dims[2] = {nx, nr};
    PyObject *out_arr = PyArray_SimpleNew(2, dims, NPY_DOUBLE);
    if (!out_arr) {
        Py_DECREF(roots);
        Py_DECREF(xs);
        return nullptr;
    }
    double *out = (double *)PyArray_DATA((PyArrayObject *)out_arr);

    // Precompute barycentric-style denominators.
    std::vector<double> denom(nr, 1.0);
    for (npy_intp j = 0; j < nr; ++j)
        for (npy_intp k = 0; k < nr; ++k)
            if (k != j) denom[j] *= r[j] - r[k];

    Py_BEGIN_ALLOW_THREADS;
    if (!derivative) {
        for (npy_intp i = 0; i < nx; ++i) {
            for (npy_intp j = 0; j < nr; ++j) {
                double prod = 1.0;
                for (npy_intp k = 0; k < nr; ++k)
                    if (k != j) prod *= xv[i] - r[k];
                out[i * nr + j] = prod / denom[j];
            }
        }
    } else {
        for (npy_intp i = 0; i < nx; ++i) {
            for (npy_intp j = 0; j < nr; ++j) {
                // d/dx prod_{k!=j}(x - r_k) = sum_m prod_{k!=j,k!=m}(x - r_k)
                double total = 0.0;
                for (npy_intp m2 = 0; m2 < nr; ++m2) {
                    if (m2 == j) continue;
                    double prod = 1.0;
                    for (npy_intp k = 0; k < nr; ++k)
                        if (k != j && k != m2) prod *= xv[i] - r[k];
                    total += prod;
                }
                out[i * nr + j] = total / denom[j];
            }
        }
    }
    Py_END_ALLOW_THREADS;

    // Reshape to x.shape + (nr,)
    const int x_nd = PyArray_NDIM(xs);
    std::vector<npy_intp> shape(x_nd + 1);
    for (int d = 0; d < x_nd; ++d) shape[d] = PyArray_DIM(xs, d);
    shape[x_nd] = nr;
    PyArray_Dims newshape = {shape.data(), x_nd + 1};
    PyObject *reshaped =
        PyArray_Newshape((PyArrayObject *)out_arr, &newshape, NPY_CORDER);
    Py_DECREF(out_arr);
    Py_DECREF(roots);
    Py_DECREF(xs);
    return reshaped;
}

// ---------------------------------------------------------------------------
// Dual topology
// ---------------------------------------------------------------------------

// Inputs (all 1-based signed ids, 0 = invalid, negative = reversed):
//   n_points, n_surfaces
//   lines:        int64 [n_lines, 2]   signed point ids (begin, end)
//   surf_lines:   int64 [total]        signed line ids per surface
//   surf_offsets: int64 [n_surf + 1]
// Outputs:
//   dual_lines:        int64 [n_lines, 2]  signed surface ids (begin, end)
//   dual_surf_lines:   int64 [sum deg]     signed line ids per point
//   dual_surf_offsets: int64 [n_points+1]
static PyObject *dual_from_primal(PyObject *, PyObject *args) {
    long long n_points;
    PyObject *lines_obj, *surf_lines_obj, *surf_offsets_obj;
    if (!PyArg_ParseTuple(args, "LOOO", &n_points, &lines_obj, &surf_lines_obj,
                          &surf_offsets_obj))
        return nullptr;
    PyArrayObject *lines = (PyArrayObject *)PyArray_FROM_OTF(
        lines_obj, NPY_INT64, NPY_ARRAY_IN_ARRAY);
    PyArrayObject *surf_lines = (PyArrayObject *)PyArray_FROM_OTF(
        surf_lines_obj, NPY_INT64, NPY_ARRAY_IN_ARRAY);
    PyArrayObject *surf_offsets = (PyArrayObject *)PyArray_FROM_OTF(
        surf_offsets_obj, NPY_INT64, NPY_ARRAY_IN_ARRAY);
    if (!lines || !surf_lines || !surf_offsets) {
        Py_XDECREF(lines);
        Py_XDECREF(surf_lines);
        Py_XDECREF(surf_offsets);
        return nullptr;
    }
    const npy_intp n_lines = PyArray_DIM(lines, 0);
    const npy_intp n_surf = PyArray_SIZE(surf_offsets) - 1;
    const int64_t *ln = (const int64_t *)PyArray_DATA(lines);
    const int64_t *sl = (const int64_t *)PyArray_DATA(surf_lines);
    const int64_t *so = (const int64_t *)PyArray_DATA(surf_offsets);

    npy_intp dl_dims[2] = {n_lines, 2};
    PyObject *dual_lines_arr = PyArray_ZEROS(2, dl_dims, NPY_INT64, 0);
    if (!dual_lines_arr) {
        Py_DECREF(lines);
        Py_DECREF(surf_lines);
        Py_DECREF(surf_offsets);
        return nullptr;
    }
    int64_t *dl = (int64_t *)PyArray_DATA((PyArrayObject *)dual_lines_arr);

    // Dual line of primal line i: end = surface with +i, begin = surface
    // with -i (manifold2d.c:280-340).
    bool bad = false;
    npy_intp bad_line = -1;
    Py_BEGIN_ALLOW_THREADS;
    for (npy_intp s = 0; s < n_surf && !bad; ++s) {
        for (int64_t k = so[s]; k < so[s + 1]; ++k) {
            const int64_t id = sl[k];
            const int64_t idx = (id > 0 ? id : -id) - 1;
            if (idx < 0 || idx >= n_lines) {
                bad = true;
                bad_line = idx;
                break;
            }
            int64_t *slot = &dl[idx * 2 + (id > 0 ? 1 : 0)];
            if (*slot != 0) {
                bad = true;
                bad_line = idx;
                break;
            }
            *slot = s + 1;
        }
    }
    Py_END_ALLOW_THREADS;
    if (bad) {
        PyErr_Format(PyExc_ValueError,
                     "Line %ld appears twice with the same orientation;"
                     " manifold is invalid.",
                     (long)bad_line);
        Py_DECREF(dual_lines_arr);
        Py_DECREF(lines);
        Py_DECREF(surf_lines);
        Py_DECREF(surf_offsets);
        return nullptr;
    }

    // Dual surface of point p: primal lines touching p in line-index order,
    // positive when the line begins at p (manifold2d.c:350-390).
    std::vector<int64_t> deg(n_points + 1, 0);
    for (npy_intp i = 0; i < n_lines; ++i) {
        const int64_t b = ln[i * 2 + 0];
        const int64_t e = ln[i * 2 + 1];
        const int64_t bi = (b > 0 ? b : -b) - 1;
        const int64_t ei = (e > 0 ? e : -e) - 1;
        if (bi >= 0 && bi < n_points) deg[bi + 1]++;
        if (ei >= 0 && ei < n_points) deg[ei + 1]++;
    }
    for (long long p = 0; p < n_points; ++p) deg[p + 1] += deg[p];

    npy_intp ds_dims[1] = {deg[n_points]};
    npy_intp off_dims[1] = {(npy_intp)n_points + 1};
    PyObject *dual_surf_arr = PyArray_SimpleNew(1, ds_dims, NPY_INT64);
    PyObject *dual_off_arr = PyArray_SimpleNew(1, off_dims, NPY_INT64);
    if (!dual_surf_arr || !dual_off_arr) {
        Py_XDECREF(dual_surf_arr);
        Py_XDECREF(dual_off_arr);
        Py_DECREF(dual_lines_arr);
        Py_DECREF(lines);
        Py_DECREF(surf_lines);
        Py_DECREF(surf_offsets);
        return nullptr;
    }
    int64_t *ds = (int64_t *)PyArray_DATA((PyArrayObject *)dual_surf_arr);
    int64_t *doff = (int64_t *)PyArray_DATA((PyArrayObject *)dual_off_arr);
    Py_BEGIN_ALLOW_THREADS;
    for (long long p = 0; p <= n_points; ++p) doff[p] = deg[p];
    std::vector<int64_t> cursor(deg.begin(), deg.end() - 1);
    for (npy_intp i = 0; i < n_lines; ++i) {
        const int64_t b = ln[i * 2 + 0];
        const int64_t e = ln[i * 2 + 1];
        const int64_t bi = (b > 0 ? b : -b) - 1;
        const int64_t ei = (e > 0 ? e : -e) - 1;
        if (bi >= 0 && bi < n_points) ds[cursor[bi]++] = +(i + 1);
        if (ei >= 0 && ei < n_points) ds[cursor[ei]++] = -(i + 1);
    }
    Py_END_ALLOW_THREADS;

    Py_DECREF(lines);
    Py_DECREF(surf_lines);
    Py_DECREF(surf_offsets);
    return Py_BuildValue("(NNN)", dual_lines_arr, dual_surf_arr, dual_off_arr);
}

// ---------------------------------------------------------------------------

PyMethodDef methods[] = {
    {"gll_nodes_weights", gll_nodes_weights, METH_VARARGS,
     "GLL nodes and weights for n points: (n, tol=1e-15, max_iter=20)."},
    {"lagrange_values", lagrange_values, METH_VARARGS,
     "Lagrange basis values (derivative=1 for first derivatives) at points."},
    {"dual_from_primal", dual_from_primal, METH_VARARGS,
     "Dual topology arrays from primal lines and surface connectivity."},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef module_def = {
    PyModuleDef_HEAD_INIT, "_core",
    "Native host-side runtime kernels for mfv2d_tpu.", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__core(void) {
    import_array();
    return PyModule_Create(&module_def);
}
