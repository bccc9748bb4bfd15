"""Reportable quantities: model/estimate metrics with optional error bars
(reference: pygsti/report/reportables.py, ~90 metrics)."""

from __future__ import annotations

import collections

import numpy as np

from pygsti_tpu.tools import optools as _ot
from pygsti_tpu.tools.basistools import change_basis


def evaluate(fn_of_model, model, crf_view=None):
    """Evaluate a scalar model function, optionally with an error bar from a
    confidence-region view (reference: modelfunction evaluation)."""
    val = fn_of_model(model)
    if crf_view is not None:
        eb = crf_view.compute_uncertainty(fn_of_model, model)
        return val, eb
    return val


# -- per-gate metrics --------------------------------------------------------

def entanglement_fidelity(a, b, mx_basis='pp'):
    return _ot.entanglement_fidelity(a, b, mx_basis)


def entanglement_infidelity(a, b, mx_basis='pp'):
    return 1.0 - _ot.entanglement_fidelity(a, b, mx_basis)


def avg_gate_infidelity(a, b, mx_basis='pp'):
    return _ot.average_gate_infidelity(a, b, mx_basis)


def process_fidelity(a, b, mx_basis='pp'):
    return _ot.process_fidelity(a, b, mx_basis)


def frobenius_diff(a, b, mx_basis='pp'):
    return _ot.frobeniusdist(a, b)


def jtrace_diff(a, b, mx_basis='pp'):
    return _ot.jtracedist(a, b, mx_basis)


def half_diamond_norm(a, b, mx_basis='pp'):
    return 0.5 * _ot.diamonddist(a, b, mx_basis)


def unitarity(a, mx_basis='pp'):
    return _ot.unitarity(a, mx_basis)


def eigenvalues(g, mx_basis='pp'):
    return np.linalg.eigvals(np.asarray(g))


def nonunitary_entanglement_infidelity(a, b, mx_basis='pp'):
    """EI after removing the closest-unitary part (decoherence-only infidelity)."""
    u = _ot.unitarity(a, mx_basis)
    d2 = np.asarray(a).shape[0]
    return float((d2 - 1) * (1 - np.sqrt(max(u, 0))) / d2)


def error_generator(gate, target, mx_basis='pp', typ='logGTi'):
    return _ot.error_generator(gate, target, mx_basis, typ)


def gate_rotation_angle(g, mx_basis='pp'):
    info = _ot.decompose_gate_matrix(np.asarray(g))
    return info.get('pi rotations', np.nan) * np.pi


# -- SPAM metrics ------------------------------------------------------------

def vec_fidelity(rho_vec_a, rho_vec_b, mx_basis='pp'):
    from pygsti_tpu.tools.basistools import vec_to_stdmx
    a = vec_to_stdmx(np.asarray(rho_vec_a), mx_basis)
    b = vec_to_stdmx(np.asarray(rho_vec_b), mx_basis)
    return _ot.fidelity(a, b)


def vec_trace_diff(rho_vec_a, rho_vec_b, mx_basis='pp'):
    from pygsti_tpu.tools.basistools import vec_to_stdmx
    a = vec_to_stdmx(np.asarray(rho_vec_a), mx_basis)
    b = vec_to_stdmx(np.asarray(rho_vec_b), mx_basis)
    return _ot.tracedist(a, b)


# -- model-level tables ------------------------------------------------------

def gate_metrics_table(model, target, metrics=('entanglement_infidelity',
                                               'avg_gate_infidelity',
                                               'jtrace_diff', 'frobenius_diff',
                                               'unitarity'),
                       crf_view=None):
    """Per-gate metric dict: {gate_label: {metric: value_or_(value, errbar)}}."""
    fns = {
        'entanglement_infidelity': entanglement_infidelity,
        'avg_gate_infidelity': avg_gate_infidelity,
        'process_fidelity': process_fidelity,
        'jtrace_diff': jtrace_diff,
        'frobenius_diff': frobenius_diff,
        'half_diamond_norm': half_diamond_norm,
        'unitarity': lambda a, b, basis: unitarity(a, basis),
    }
    out = collections.OrderedDict()
    basis = model.basis
    for lbl in model.operations:
        if lbl not in target.operations:
            continue
        t_dense = target.operations[lbl].to_dense()
        row = collections.OrderedDict()
        for m in metrics:
            if crf_view is not None and m != 'unitarity':
                def fn_of_model(mdl, _lbl=lbl, _m=m):
                    return fns[_m](mdl.operations[_lbl].to_dense(), t_dense, basis)
                row[m] = evaluate(fn_of_model, model, crf_view)
            else:
                row[m] = fns[m](model.operations[lbl].to_dense(), t_dense, basis)
        out[lbl] = row
    return out


def spam_metrics_table(model, target):
    out = collections.OrderedDict()
    basis = model.basis
    for lbl in model.preps:
        if lbl in target.preps:
            out[('prep', lbl)] = {
                'fidelity': vec_fidelity(model.preps[lbl].to_dense(),
                                         target.preps[lbl].to_dense(), basis),
                'trace_dist': vec_trace_diff(model.preps[lbl].to_dense(),
                                             target.preps[lbl].to_dense(), basis),
            }
    for lbl in model.povms:
        if lbl in target.povms:
            diff = np.linalg.norm(model.povms[lbl].to_dense()
                                  - target.povms[lbl].to_dense())
            out[('povm', lbl)] = {'frobenius_diff': float(diff)}
    return out


def model_violation_table(results, estimate_key=None):
    """2*DeltaLogL vs k per iteration for a GST result."""
    keys = list(results.estimates.keys())
    estimate_key = estimate_key or keys[0]
    est = results.estimates[estimate_key]
    p = est.parameters
    out = {'final_2dlogl': p.get('final_objfn_value'),
           'final_dof': p.get('final_dof'),
           'n_sigma': est.misfit_sigma()}
    return out
