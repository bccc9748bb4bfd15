#define PY_SSIZE_T_CLEAN
/* Native compact-polynomial tape evaluation (the TPU-native framework's
 * counterpart of the reference's baseobjs/opcalc/fastopcalc.pyx).
 *
 * Tape format: vtape = [n_terms, (n_vars, v0..), ...] per polynomial;
 * ctape holds the coefficients in term order.  Functions take 1D
 * buffer-protocol arrays (int64 vtape, double/complex ctape & paramvec)
 * and return a new 1D array of per-polynomial values.
 */
#include <Python.h>
#include <complex>
#include <cstdint>
#include <vector>

namespace {

struct Buf {
    Py_buffer view{};
    bool ok = false;
    Buf(PyObject* obj, const char* expected_fmt) {
        if (PyObject_GetBuffer(obj, &view, PyBUF_CONTIG_RO | PyBUF_FORMAT) != 0)
            return;
        /* validate dtype so a wrong-typed array raises instead of being
         * silently reinterpreted */
        Py_ssize_t want = 8;                      /* "q" int64 / "d" double */
        if (expected_fmt[0] == 'Z') want = 16;    /* "Zd" complex128 */
        if (view.itemsize != want ||
            (view.format && expected_fmt[0] != view.format[0] &&
             !(expected_fmt[0] == 'q' && (view.format[0] == 'l' || view.format[0] == 'q')))) {
            PyErr_Format(PyExc_ValueError,
                         "buffer has format '%s' (itemsize %zd), expected '%s'",
                         view.format ? view.format : "?", view.itemsize,
                         expected_fmt);
            PyBuffer_Release(&view);
            return;
        }
        ok = true;
    }
    ~Buf() { if (ok) PyBuffer_Release(&view); }
    Py_ssize_t n_items() const { return view.len / view.itemsize; }
    const void* data() const { return view.buf; }
};

template <typename T>
PyObject* eval_impl(const int64_t* vt, Py_ssize_t vlen, const T* ct,
                    Py_ssize_t clen, const T* pv, Py_ssize_t plen,
                    const char* typecode) {
    std::vector<T> out;
    out.reserve(64);
    Py_ssize_t i = 0, c = 0;
    while (i < vlen) {
        int64_t n_terms = vt[i++];
        T val = T(0);
        for (int64_t m = 0; m < n_terms; ++m) {
            if (i >= vlen || c >= clen) {
                PyErr_SetString(PyExc_ValueError, "malformed polynomial tape");
                return nullptr;
            }
            int64_t n_vars = vt[i++];
            if (n_vars < 0 || i + n_vars > vlen) {
                PyErr_SetString(PyExc_ValueError, "malformed polynomial tape");
                return nullptr;
            }
            T a = ct[c++];
            for (int64_t k = 0; k < n_vars; ++k) {
                int64_t vi = vt[i++];
                if (vi < 0 || vi >= plen) {
                    PyErr_SetString(PyExc_ValueError, "variable index out of range");
                    return nullptr;
                }
                a *= pv[vi];
            }
            val += a;
        }
        out.push_back(val);
    }
    if (c != clen) {
        PyErr_SetString(PyExc_ValueError, "coefficient tape length mismatch");
        return nullptr;
    }
    /* build a python bytes-backed memoryview-free result: return a list is
     * slow for large outputs; build an array.array-compatible bytes object
     * wrapped via numpy on the python side.  Simplest robust option:
     * return a bytes object + count, reconstructed by the caller. */
    PyObject* bytes = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out.data()),
        static_cast<Py_ssize_t>(out.size() * sizeof(T)));
    if (!bytes) return nullptr;
    PyObject* res = Py_BuildValue("(Ons)", bytes,
                                  static_cast<Py_ssize_t>(out.size()), typecode);
    Py_DECREF(bytes);
    return res;
}

PyObject* bulk_eval_real_raw(PyObject*, PyObject* args) {
    PyObject *vo, *co, *po;
    if (!PyArg_ParseTuple(args, "OOO", &vo, &co, &po)) return nullptr;
    Buf vb(vo, "q"), cb(co, "d"), pb(po, "d");
    if (!vb.ok || !cb.ok || !pb.ok) return nullptr;
    return eval_impl<double>(
        static_cast<const int64_t*>(vb.data()), vb.n_items(),
        static_cast<const double*>(cb.data()), cb.n_items(),
        static_cast<const double*>(pb.data()), pb.n_items(), "d");
}

PyObject* bulk_eval_complex_raw(PyObject*, PyObject* args) {
    PyObject *vo, *co, *po;
    if (!PyArg_ParseTuple(args, "OOO", &vo, &co, &po)) return nullptr;
    Buf vb(vo, "q"), cb(co, "Zd"), pb(po, "Zd");
    if (!vb.ok || !cb.ok || !pb.ok) return nullptr;
    return eval_impl<std::complex<double>>(
        static_cast<const int64_t*>(vb.data()), vb.n_items(),
        static_cast<const std::complex<double>*>(cb.data()), cb.n_items(),
        static_cast<const std::complex<double>*>(pb.data()), pb.n_items(),
        "D");
}

/* abs-sum shortcut used by the term simulator's path-magnitude tests */
PyObject* abs_sum_bulk_eval_complex(PyObject*, PyObject* args) {
    PyObject *vo, *co, *po;
    if (!PyArg_ParseTuple(args, "OOO", &vo, &co, &po)) return nullptr;
    Buf vb(vo, "q"), cb(co, "Zd"), pb(po, "Zd");
    if (!vb.ok || !cb.ok || !pb.ok) return nullptr;
    const int64_t* vt = static_cast<const int64_t*>(vb.data());
    const std::complex<double>* ct =
        static_cast<const std::complex<double>*>(cb.data());
    const std::complex<double>* pv =
        static_cast<const std::complex<double>*>(pb.data());
    Py_ssize_t vlen = vb.n_items(), clen = cb.n_items(), plen = pb.n_items();
    double total = 0.0;
    Py_ssize_t i = 0, c = 0;
    while (i < vlen) {
        int64_t n_terms = vt[i++];
        std::complex<double> val(0.0, 0.0);
        for (int64_t m = 0; m < n_terms; ++m) {
            if (i >= vlen || c >= clen) {
                PyErr_SetString(PyExc_ValueError, "malformed polynomial tape");
                return nullptr;
            }
            int64_t n_vars = vt[i++];
            if (n_vars < 0 || i + n_vars > vlen) {
                PyErr_SetString(PyExc_ValueError, "malformed polynomial tape");
                return nullptr;
            }
            std::complex<double> a = ct[c++];
            for (int64_t k = 0; k < n_vars; ++k) {
                int64_t vi = vt[i++];
                if (vi < 0 || vi >= plen) {
                    PyErr_SetString(PyExc_ValueError, "variable index OOR");
                    return nullptr;
                }
                a *= pv[vi];
            }
            val += a;
        }
        total += std::abs(val);
    }
    return PyFloat_FromDouble(total);
}

PyMethodDef methods[] = {
    {"bulk_eval_real_raw", bulk_eval_real_raw, METH_VARARGS,
     "(vtape,i64 ctape,f64 params,f64) -> (bytes, count, 'd')"},
    {"bulk_eval_complex_raw", bulk_eval_complex_raw, METH_VARARGS,
     "(vtape,i64 ctape,c128 params,c128) -> (bytes, count, 'D')"},
    {"abs_sum_bulk_eval_complex", abs_sum_bulk_eval_complex, METH_VARARGS,
     "sum(|poly_i(params)|)"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_fastopcalc",
                         "native compact-polynomial evaluation", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__fastopcalc(void) { return PyModule_Create(&moduledef); }
