#define PY_SSIZE_T_CLEAN
/* Fast circuit-string parser (native).
 *
 * Native counterpart of pygsti_tpu/circuits/circuitparser.py, mirroring the
 * role of the reference's Cython parser
 * (pygsti/circuits/circuitparser/fastcircuitparser.pyx): turn pyGSTi
 * circuit strings like
 *
 *     Gxpi2:0(Gxpi2:0Gypi2:0)^2[Gxpi2:0Gypi2:1][]@(0,1)
 *
 * into per-layer label tuples, expanding repetitions, plus the line-label
 * list.  Exposed as the CPython module `_fastcircuitparser` with
 *
 *     parse(s: str) -> (layers, line_labels_or_None)
 *
 * where `layers` is a list whose elements are either (name, sslbl, ...)
 * tuples (simple labels; sslbls are ints when numeric) or tuples of such
 * tuples (multi-gate layers; empty tuple = global idle "[]").
 *
 * Python wrapper + fallback: pygsti_tpu/circuits/circuitparser.py.
 */

#include <Python.h>

#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

struct SimpleLabel {
    std::string name;
    std::vector<std::string> sslbls;  // kept as strings; ints detected later
};

// A layer is either one simple label or a (possibly empty) group of them.
struct Layer {
    std::vector<SimpleLabel> comps;
    bool grouped;  // true if written with [...] (affects empty-layer identity)
};

class Parser {
public:
    explicit Parser(const char* s, Py_ssize_t n) : s_(s), n_(n), i_(0) {}

    void parse(std::vector<Layer>& layers, std::vector<std::string>& line_labels,
               bool& has_line_labels) {
        has_line_labels = false;
        if (n_ >= 2 && s_[0] == '{' && s_[1] == '}') {
            i_ = 2;
        } else {
            parse_seq(layers, 0);
        }
        if (i_ < n_ && s_[i_] == '@') {
            has_line_labels = true;
            parse_line_labels(line_labels);
        }
        if (i_ != n_) throw std::runtime_error("trailing characters at " + std::to_string(i_));
    }

private:
    char peek() const { return i_ < n_ ? s_[i_] : '\0'; }

    bool is_name_start(char c) const {
        return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_';
    }
    bool is_name_char(char c) const {
        return is_name_start(c) || (c >= '0' && c <= '9');
    }
    bool is_digit(char c) const { return c >= '0' && c <= '9'; }

    long parse_int() {
        if (!is_digit(peek())) throw std::runtime_error("expected integer at " + std::to_string(i_));
        long v = 0;
        while (is_digit(peek())) { v = v * 10 + (s_[i_] - '0'); ++i_; }
        return v;
    }

    static bool is_lower_name_char(char c) {
        return (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_';
    }

    std::string parse_name() {
        if (!is_name_start(peek())) throw std::runtime_error("expected name at " + std::to_string(i_));
        Py_ssize_t start = i_;
        char c0 = peek();
        /* reference grammar: gate 'G[a-z0-9_]+', povm 'M[a-z0-9_]*',
         * instrument 'I[a-z0-9_]*', prep 'rho[a-z0-9_]*' -- an upper-case
         * letter starts a NEW label, so 'GxGx' is two Gx gates */
        if (c0 == 'G' || c0 == 'M' || c0 == 'I') {
            ++i_;
            while (is_lower_name_char(peek())) ++i_;
            return std::string(s_ + start, i_ - start);
        }
        if (c0 == 'r' && i_ + 2 < n_ && s_[i_+1] == 'h' && s_[i_+2] == 'o') {
            i_ += 3;
            while (is_lower_name_char(peek())) ++i_;
            return std::string(s_ + start, i_ - start);
        }
        while (is_name_char(peek())) ++i_;
        return std::string(s_ + start, i_ - start);
    }

    std::string parse_sslbl() {
        Py_ssize_t start = i_;
        if (is_digit(peek())) {
            while (is_digit(peek())) ++i_;
        } else if (is_name_start(peek())) {
            while (is_name_char(peek())) ++i_;
        } else {
            throw std::runtime_error("expected state-space label at " + std::to_string(i_));
        }
        return std::string(s_ + start, i_ - start);
    }

    SimpleLabel parse_simple() {
        SimpleLabel out;
        out.name = parse_name();
        if (peek() == ';')  // args unsupported in the fast path
            throw std::runtime_error("label args: fall back");
        while (peek() == ':') {
            ++i_;
            out.sslbls.push_back(parse_sslbl());
        }
        if (peek() == '!')  // time tags unsupported in the fast path
            throw std::runtime_error("time tag: fall back");
        return out;
    }

    long parse_reps() {
        if (peek() == '^') {
            ++i_;
            return parse_int();
        }
        return 1;
    }

    void parse_seq(std::vector<Layer>& layers, char stop) {
        while (true) {
            char c = peek();
            if (c == '\0' || c == '@' || (stop && c == stop)) break;
            if (c == '(') {
                ++i_;
                std::vector<Layer> inner;
                parse_seq(inner, ')');
                if (peek() != ')') throw std::runtime_error("expected ')'");
                ++i_;
                long reps = parse_reps();
                for (long r = 0; r < reps; ++r)
                    layers.insert(layers.end(), inner.begin(), inner.end());
            } else if (c == '[') {
                ++i_;
                Layer layer;
                layer.grouped = true;
                while (peek() != ']' && peek() != '\0')
                    layer.comps.push_back(parse_simple());
                if (peek() != ']') throw std::runtime_error("expected ']'");
                ++i_;
                long reps = parse_reps();
                for (long r = 0; r < reps; ++r) layers.push_back(layer);
            } else {
                Layer layer;
                layer.grouped = false;
                layer.comps.push_back(parse_simple());
                long reps = parse_reps();
                for (long r = 0; r < reps; ++r) layers.push_back(layer);
            }
        }
    }

    void parse_line_labels(std::vector<std::string>& lls) {
        ++i_;  // consume '@'
        if (peek() == '*') { ++i_; lls.push_back("*"); return; }
        if (peek() != '(') throw std::runtime_error("expected '(' after '@'");
        ++i_;
        while (peek() != ')') {
            lls.push_back(parse_sslbl());
            if (peek() == ',') ++i_;
        }
        ++i_;
    }

    const char* s_;
    Py_ssize_t n_;
    Py_ssize_t i_;
};

PyObject* sslbl_to_py(const std::string& s) {
    // numeric labels become ints (matching the Python parser)
    bool numeric = !s.empty();
    for (char c : s) if (c < '0' || c > '9') { numeric = false; break; }
    if (numeric) return PyLong_FromString(s.c_str(), nullptr, 10);
    return PyUnicode_FromStringAndSize(s.data(), (Py_ssize_t)s.size());
}

PyObject* simple_to_py(const SimpleLabel& l) {
    PyObject* tup = PyTuple_New((Py_ssize_t)(1 + l.sslbls.size()));
    if (!tup) return nullptr;
    PyTuple_SET_ITEM(tup, 0, PyUnicode_FromStringAndSize(l.name.data(),
                                                         (Py_ssize_t)l.name.size()));
    for (size_t k = 0; k < l.sslbls.size(); ++k)
        PyTuple_SET_ITEM(tup, (Py_ssize_t)(k + 1), sslbl_to_py(l.sslbls[k]));
    return tup;
}

PyObject* fastparse_parse(PyObject*, PyObject* args) {
    const char* s;
    Py_ssize_t n;
    if (!PyArg_ParseTuple(args, "s#", &s, &n)) return nullptr;

    std::vector<Layer> layers;
    std::vector<std::string> lls;
    bool has_lls = false;
    try {
        Parser p(s, n);
        p.parse(layers, lls, has_lls);
    } catch (const std::exception& e) {
        PyErr_SetString(PyExc_ValueError, e.what());
        return nullptr;
    }

    PyObject* pylayers = PyList_New((Py_ssize_t)layers.size());
    if (!pylayers) return nullptr;
    for (size_t i = 0; i < layers.size(); ++i) {
        const Layer& lay = layers[i];
        PyObject* item;
        if (!lay.grouped && lay.comps.size() == 1) {
            item = simple_to_py(lay.comps[0]);
        } else if (lay.grouped && lay.comps.size() == 1) {
            item = simple_to_py(lay.comps[0]);
        } else {
            item = PyTuple_New((Py_ssize_t)lay.comps.size());
            for (size_t k = 0; k < lay.comps.size(); ++k)
                PyTuple_SET_ITEM(item, (Py_ssize_t)k, simple_to_py(lay.comps[k]));
        }
        PyList_SET_ITEM(pylayers, (Py_ssize_t)i, item);
    }

    PyObject* pylls;
    if (has_lls) {
        pylls = PyTuple_New((Py_ssize_t)lls.size());
        for (size_t k = 0; k < lls.size(); ++k)
            PyTuple_SET_ITEM(pylls, (Py_ssize_t)k,
                             lls[k] == "*" ? PyUnicode_FromString("*")
                                           : sslbl_to_py(lls[k]));
    } else {
        pylls = Py_None;
        Py_INCREF(Py_None);
    }

    PyObject* out = PyTuple_Pack(2, pylayers, pylls);
    Py_DECREF(pylayers);
    Py_DECREF(pylls);
    return out;
}

PyMethodDef methods[] = {
    {"parse", fastparse_parse, METH_VARARGS,
     "parse(circuit_str) -> (layers, line_labels_or_None)"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastcircuitparser",
    "Native pyGSTi-syntax circuit-string parser", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__fastcircuitparser(void) {
    return PyModule_Create(&moduledef);
}
