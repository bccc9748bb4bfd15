"""Compact-polynomial tape evaluation (reference: pygsti/baseobjs/opcalc/ —
fastopcalc.pyx with slowopcalc.py fallback).

The native C++ kernel (pygsti_tpu/ops/fastopcalc.cpp) is used when built;
otherwise the pure-Python implementations below are used.  Semantics follow
the reference tape format: vtape = [n_terms, (n_vars, v...), ...] per
polynomial, ctape = coefficients in term order.
"""

from __future__ import annotations

import numpy as np


def _py_bulk_eval(vtape, ctape, paramvec, dest_shape, dtype):
    result = np.empty(int(np.prod(dest_shape)) if dest_shape else 1,
                      complex if dtype == 'complex' else float)
    c = i = r = 0
    n = vtape.size
    while i < n:
        n_terms = vtape[i]; i += 1
        val = 0
        for _ in range(n_terms):
            n_vars = vtape[i]; i += 1
            a = ctape[c]; c += 1
            for _ in range(n_vars):
                a = a * paramvec[vtape[i]]; i += 1
            val += a
        result[r] = val if dtype == 'complex' else np.real(val)
        r += 1
    assert c == ctape.size and r == result.size
    return result.reshape(dest_shape)


def _native():
    try:
        from pygsti_tpu.ops import load_fastopcalc
        return load_fastopcalc()
    except Exception:
        return None


def bulk_eval_compact_polynomials_complex(vtape, ctape, paramvec, dest_shape):
    nat = _native()
    if nat is not None:
        flat = nat.bulk_eval_complex(
            np.ascontiguousarray(vtape, np.int64),
            np.ascontiguousarray(ctape, complex),
            np.ascontiguousarray(paramvec, complex))
        return np.asarray(flat).reshape(dest_shape)
    return _py_bulk_eval(vtape, ctape, paramvec, dest_shape, 'complex')


def bulk_eval_compact_polynomials_real(vtape, ctape, paramvec, dest_shape):
    nat = _native()
    if nat is not None:
        flat = nat.bulk_eval_real(
            np.ascontiguousarray(vtape, np.int64),
            np.ascontiguousarray(np.real(ctape), float),
            np.ascontiguousarray(np.real(paramvec), float))
        return np.asarray(flat).reshape(dest_shape)
    return _py_bulk_eval(vtape, np.real(ctape), paramvec, dest_shape, 'real')


def bulk_eval_compact_polynomials(vtape, ctape, paramvec, dest_shape):
    if np.iscomplexobj(ctape):
        return bulk_eval_compact_polynomials_complex(vtape, ctape, paramvec,
                                                     dest_shape)
    return bulk_eval_compact_polynomials_real(vtape, ctape, paramvec,
                                              dest_shape)


def abs_sum_bulk_eval_compact_polynomials_complex(vtape, ctape, paramvec,
                                                 dest_size):
    return float(np.sum(np.abs(bulk_eval_compact_polynomials_complex(
        vtape, ctape, paramvec, (dest_size,)))))


def compact_deriv(vtape, ctape, wrt_params):
    """Derivative tapes: for each input polynomial, d/dx_w for each w in
    `wrt_params` (sorted), concatenated poly-major (reference:
    opcalc compact_deriv / slowopcalc.py:167)."""
    from pygsti_tpu.baseobjs.polynomial import (bulk_load_compact_polynomials,
                                                compact_polynomial_list)
    polys = bulk_load_compact_polynomials(np.asarray(vtape), np.asarray(ctape))
    dpolys = []
    for p in polys:
        for w in wrt_params:
            dpolys.append(p.deriv(int(w)))
    return compact_polynomial_list(dpolys)


def bulk_eval_compact_polynomials_derivs_complex(vtape, ctape, wrt_params,
                                                 paramvec, dest_shape):
    """Evaluated derivative matrix [n_polys, len(wrt_params)]."""
    dv, dc = compact_deriv(vtape, ctape, np.sort(np.asarray(wrt_params)))
    flat = bulk_eval_compact_polynomials_complex(
        dv, dc, paramvec, (dest_shape[0] * dest_shape[1],))
    return flat.reshape(dest_shape)


def bulk_eval_compact_polynomials_derivs_real(vtape, ctape, wrt_params,
                                              paramvec, dest_shape):
    return np.real(bulk_eval_compact_polynomials_derivs_complex(
        vtape, np.asarray(ctape, complex), wrt_params, paramvec, dest_shape))
