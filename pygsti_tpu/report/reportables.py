"""Reportable quantities: model/estimate metrics with optional error bars
(reference: pygsti/report/reportables.py, ~94 metric functions).

Gate functions take dense superoperator matrices ``(a, b, mx_basis)`` with
``a`` the estimate and ``b`` the target; circuit functions take
``(model_a, model_b, circuit)``; SPAM functions take basis vectors.  The
``evaluate`` helper propagates confidence-region error bars through any of
them; ``evaluate_opfn_by_name`` / ``info_of_opfn_by_name`` provide the
string-keyed dispatch the report factory uses (reference:
reportables.py:2547,2645).
"""

from __future__ import annotations

import collections
import warnings

import numpy as np
import scipy.linalg as _spl

from pygsti_tpu.tools import optools as _ot
from pygsti_tpu.tools import jamiolkowski as _jam
from pygsti_tpu.tools.basistools import change_basis, vec_to_stdmx
from pygsti_tpu.tools import matrixtools as _mt
from pygsti_tpu.report.modelfunction import ModelFunction as _ModelFunction


def evaluate(fn_of_model, model, crf_view=None):
    """Evaluate a scalar model function, optionally with an error bar from a
    confidence-region view (reference: modelfunction evaluation)."""
    val = fn_of_model(model)
    if crf_view is not None:
        eb = crf_view.compute_uncertainty(fn_of_model, model)
        return val, eb
    return val


def minweight_match(a, b, metricfn=None, return_pairs=True):
    """Minimum-weight matching between two eigenvalue lists (reference:
    tools/listtools.minweight_match): returns matched distances (and pairs)."""
    from scipy.optimize import linear_sum_assignment
    a = np.asarray(a)
    b = np.asarray(b)
    metricfn = metricfn or (lambda x, y: abs(x - y))
    D = np.array([[metricfn(x, y) for y in b] for x in a], dtype=float)
    ri, ci = linear_sum_assignment(D)
    dists = D[ri, ci]
    if return_pairs:
        return dists, list(zip(ri.tolist(), ci.tolist()))
    return dists


# =============================================================================
# per-gate metrics  (a = estimate superop, b = target superop)
# =============================================================================

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


def std_unitarity(a, b, mx_basis='pp'):
    """Unitarity of the error channel a b^-1 (reference: reportables.py:1384)."""
    try:
        Lambda = np.dot(a, np.linalg.inv(b))
        return _ot.unitarity(Lambda, mx_basis)
    except np.linalg.LinAlgError as e:
        warnings.warn(str(e))
        return np.nan


def eigenvalue_unitarity(a, b):
    """Gauge-invariant unitarity from the eigenvalues of a b^-1
    (reference: reportables.py:1411)."""
    try:
        Lambda = np.dot(a, np.linalg.inv(b))
        d2 = Lambda.shape[0]
        lmb = np.linalg.eigvals(Lambda)
        return float(np.real(np.linalg.norm(lmb) ** 2) - 1.0) / (d2 - 1.0)
    except np.linalg.LinAlgError as e:
        warnings.warn(str(e))
        return np.nan


def nonunitary_entanglement_infidelity(a, b, mx_basis='pp'):
    """(d2-1)/d2 * (1 - sqrt(U)) with U = std_unitarity
    (reference: reportables.py:1437)."""
    d2 = np.asarray(a).shape[0]
    U = std_unitarity(a, b, mx_basis)
    return (d2 - 1.0) / d2 * (1.0 - np.sqrt(max(U, 0.0)))


def nonunitary_avg_gate_infidelity(a, b, mx_basis='pp'):
    d2 = np.asarray(a).shape[0]
    d = int(round(np.sqrt(d2)))
    U = std_unitarity(a, b, mx_basis)
    return (d - 1.0) / d * (1.0 - np.sqrt(max(U, 0.0)))


def eigenvalue_nonunitary_entanglement_infidelity(a, b, mx_basis='pp'):
    d2 = np.asarray(a).shape[0]
    U = eigenvalue_unitarity(a, b)
    return (d2 - 1.0) / d2 * (1.0 - np.sqrt(max(U, 0.0)))


def eigenvalue_nonunitary_avg_gate_infidelity(a, b, mx_basis='pp'):
    d2 = np.asarray(a).shape[0]
    d = int(round(np.sqrt(d2)))
    U = eigenvalue_unitarity(a, b)
    return (d - 1.0) / d * (1.0 - np.sqrt(max(U, 0.0)))


def eigenvalue_entanglement_infidelity(a, b, mx_basis='pp'):
    """Infidelity from min-weight-matched superoperator eigenvalues
    (valid when b is unitary and both are TP: F = |sum evB*.evA|/d2;
    reference: reportables.py:1550)."""
    d2 = np.asarray(a).shape[0]
    evA = np.linalg.eigvals(a)
    evB = np.linalg.eigvals(b)
    _, pairs = minweight_match(evA, evB, lambda x, y: abs(x - y))
    fid = abs(np.sum([np.conjugate(evB[j]) * evA[i] for i, j in pairs])) / d2
    return 1.0 - fid


def eigenvalue_avg_gate_infidelity(a, b, mx_basis='pp'):
    """AGI from eigenvalue entanglement fidelity via
    F_g = (d F_p + 1)/(d + 1) (reference: reportables.py:1628)."""
    d = round(np.asarray(a).size ** 0.25)
    F_p = 1.0 - eigenvalue_entanglement_infidelity(a, b, mx_basis)
    return 1.0 - (d * F_p + 1) / (1 + d)


def eigenvalue_diamondnorm(a, b, mx_basis='pp'):
    """(d2-1)/d2 * max matched-eigenvalue distance (reference: :1667)."""
    d2 = np.asarray(a).shape[0]
    evA = np.linalg.eigvals(a)
    evB = np.linalg.eigvals(b)
    dists = minweight_match(evA, evB, lambda x, y: abs(x - y),
                            return_pairs=False)
    return (d2 - 1.0) / d2 * float(np.max(dists))


def eigenvalue_nonunitary_diamondnorm(a, b, mx_basis='pp'):
    d2 = np.asarray(a).shape[0]
    evA = np.linalg.eigvals(a)
    evB = np.linalg.eigvals(b)
    dists = minweight_match(evA, evB, lambda x, y: abs(abs(x) - abs(y)),
                            return_pairs=False)
    return (d2 - 1.0) / d2 * float(np.max(dists))


def generator_infidelity(a, b, mx_basis='pp'):
    """sum_k H_k^2 + sum_k S_k of the error-generator projections
    (reference: reportables.py:1753, optools.generator_infidelity)."""
    try:
        errgen = _ot.error_generator(a, b, mx_basis, 'logGTi')
    except Exception:
        return np.nan
    projs = errorgen_and_projections(errgen, mx_basis)
    H = projs['hamiltonian projections']
    S = projs['stochastic projections']
    return float(np.sum(np.asarray(H) ** 2) + np.sum(np.asarray(S)))


def eigenvalues(g, mx_basis='pp'):
    return np.linalg.eigvals(np.asarray(g))


def rel_eigenvalues(a, b, mx_basis='pp'):
    """Eigenvalues of b^-1 a (reference: reportables.py:1828)."""
    try:
        return np.linalg.eigvals(np.linalg.inv(b) @ a).astype(complex)
    except np.linalg.LinAlgError as e:
        warnings.warn(str(e))
        return np.nan * np.ones(np.asarray(a).shape[0], complex)


def rel_log_tig_eigenvalues(a, b, mx_basis='pp'):
    return np.linalg.eigvals(
        _ot.error_generator(a, b, mx_basis, 'logTiG')).astype(complex)


def rel_log_gti_eigenvalues(a, b, mx_basis='pp'):
    return np.linalg.eigvals(
        _ot.error_generator(a, b, mx_basis, 'logGTi')).astype(complex)


def rel_log_diff_eigenvalues(a, b, mx_basis='pp'):
    return np.linalg.eigvals(
        _ot.error_generator(a, b, mx_basis, 'logG-logT')).astype(complex)


rel_gate_eigenvalues = rel_eigenvalues


def rel_circuit_eigenvalues(model_a, model_b, circuit):
    """Eigenvalues of B(circuit)^-1 A(circuit) (reference: :355)."""
    A = model_a.sim.product(circuit) if hasattr(model_a.sim, 'product') \
        else _circuit_product(model_a, circuit)
    B = _circuit_product(model_b, circuit)
    return np.linalg.eigvals(np.linalg.inv(B) @ A).astype(complex)


# -- Choi matrix quantities ---------------------------------------------------

def choi_matrix(gate, mx_basis='pp'):
    return _jam.jamiolkowski_iso(gate, mx_basis, mx_basis)


def choi_eigenvalues(gate, mx_basis='pp'):
    choi = _jam.fast_jamiolkowski_iso_std(gate, mx_basis)
    return np.array(sorted(np.linalg.eigvalsh(choi)))


def choi_trace(gate, mx_basis='pp'):
    choi = _jam.fast_jamiolkowski_iso_std(gate, mx_basis)
    return float(np.real(np.trace(choi)))


def upper_bound_fidelity(gate, mx_basis='pp'):
    """Upper bound on process fidelity with any unitary: the largest Choi
    eigenvalue (reference: reportables.py:934, tools.fidelity_upper_bound)."""
    choi = _jam.fast_jamiolkowski_iso_std(gate, mx_basis)
    return float(np.max(np.linalg.eigvalsh(choi)))


def closest_ujmx(gate, mx_basis='pp'):
    """Jamiolkowski state of the closest unitary: rank-1 projector onto the
    dominant Choi eigenvector (reference: reportables.py:960)."""
    choi = _jam.fast_jamiolkowski_iso_std(gate, mx_basis)
    evals, evecs = np.linalg.eigh(choi)
    v = evecs[:, -1]
    return np.outer(v, v.conj())


def maximum_fidelity(gate, mx_basis='pp'):
    """Fidelity between the gate's Choi state and the closest unitary's
    (reference: reportables.py:984)."""
    closest = closest_ujmx(gate, mx_basis)
    choi = _jam.fast_jamiolkowski_iso_std(gate, mx_basis)
    return _ot.fidelity(choi, closest)


def maximum_trace_dist(gate, mx_basis='pp'):
    """J-trace distance to the closest unitary (reference: :1010)."""
    closest = closest_ujmx(gate, mx_basis)
    choi = _jam.fast_jamiolkowski_iso_std(gate, mx_basis)
    return _ot.tracedist(choi, closest)


def closest_unitary_fidelity(a, b, mx_basis='pp'):
    """Fidelity between b and the closest unitary to a (reference: :1187)."""
    decomp = _ot.decompose_gate_matrix(np.asarray(a))
    if decomp.get('isUnitary', False):
        return _ot.entanglement_fidelity(a, b, mx_basis)
    closest_a_jmx = closest_ujmx(a, mx_basis)
    choi_b = _jam.fast_jamiolkowski_iso_std(b, mx_basis)
    return _ot.fidelity(closest_a_jmx, choi_b)


# -- decompositions & rotation axes -------------------------------------------

def decomposition(gate):
    """Rotation decomposition of a 1-qubit gate: axis, angle, decays
    (reference: reportables.py:908)."""
    decomp = _ot.decompose_gate_matrix(np.asarray(gate))
    return decomp


def gate_rotation_angle(g, mx_basis='pp'):
    info = _ot.decompose_gate_matrix(np.asarray(g))
    return info.get('pi rotations', np.nan) * np.pi


def angles_btwn_rotn_axes(model):
    """[n_ops, n_ops] matrix of angles between gates' rotation axes
    (reference: reportables.py:1103)."""
    op_labels = list(model.operations.keys())
    n = len(op_labels)
    angles = np.nan * np.ones((n, n))
    decomps = {}
    for lbl in op_labels:
        decomps[lbl] = _ot.decompose_gate_matrix(
            model.operations[lbl].to_dense())
    for i, li in enumerate(op_labels):
        for j, lj in enumerate(op_labels):
            if i == j:
                continue
            di, dj = decomps[li], decomps[lj]
            ai = di.get('axis of rotation')
            aj = dj.get('axis of rotation')
            ri = di.get('pi rotations', 0)
            rj = dj.get('pi rotations', 0)
            if ai is None or aj is None or not np.isfinite(ri) \
                    or not np.isfinite(rj) or abs(ri) < 1e-4 or abs(rj) < 1e-4:
                continue
            dot = np.clip(np.real(np.dot(ai, aj)), -1.0, 1.0)
            angles[i, j] = np.arccos(abs(dot)) / np.pi
    return angles


def model_model_angles_btwn_axes(a, b, mx_basis='pp'):
    """Angle between the rotation axes of a and b (reference: :1784)."""
    decomp = _ot.decompose_gate_matrix(np.asarray(a))
    decomp2 = _ot.decompose_gate_matrix(np.asarray(b))
    axis1 = decomp.get('axis of rotation')
    axis2 = decomp2.get('axis of rotation')
    ang1 = decomp.get('pi rotations', np.nan)
    ang2 = decomp2.get('pi rotations', np.nan)
    if axis1 is None or axis2 is None or not np.isfinite(ang1) \
            or not np.isfinite(ang2) or abs(ang1) < 1e-4 or abs(ang2) < 1e-4:
        return np.nan
    real_dot = np.clip(np.real(np.dot(axis1, axis2)), -1.0, 1.0)
    return np.arccos(abs(real_dot)) / np.pi


def general_decomposition(model_a, model_b):
    """Hamiltonian-projection decomposition of each gate: axis (normalized
    H-projections), angle (2|H|/pi), hamiltonian eigenvalues, pairwise axis
    angles -- any Hilbert dimension (reference: reportables.py:2258)."""
    from pygsti_tpu.baseobjs.basis import Basis
    decomp = {}
    op_labels = list(model_a.operations.keys())
    mx_basis = model_b.basis
    basis_name = mx_basis if isinstance(mx_basis, str) else mx_basis.name
    dim = model_a.dim

    b = Basis.cast('pp', dim)
    basis_mxs = np.asarray(b.elements)

    for gl in op_labels:
        gate = model_a.operations[gl].to_dense()
        target_op = model_b.operations[gl].to_dense()
        gls = str(gl)
        target_evals = np.linalg.eigvals(target_op)
        failed = False
        try:
            if np.any(np.isclose(target_evals, -1.0)):
                target_logG = _mt.unitary_superoperator_matrix_log(
                    target_op, basis_name)
                logG = _mt.approximate_matrix_log(gate, target_logG)
            else:
                logG = _mt.real_matrix_log(gate, "warn")
                if np.linalg.norm(np.imag(logG)) > 1e-6:
                    warnings.warn("Truncating imaginary logarithm!")
                logG = np.real(logG)
        except (np.linalg.LinAlgError, AssertionError, ValueError) as e:
            warnings.warn(str(e))
            logG = np.nan * np.ones(gate.shape)
            failed = True

        if failed:
            decomp[gls + ' log inexactness'] = np.nan
            decomp[gls + ' axis'] = np.nan * np.ones(dim - 1)
            decomp[gls + ' angle'] = np.nan
            decomp[gls + ' hamiltonian eigenvalues'] = \
                np.nan * np.ones(basis_mxs[0].shape[0])
            continue

        decomp[gls + ' log inexactness'] = float(
            np.linalg.norm(_spl.expm(logG) - gate))

        # hamiltonian projections of logG onto the (traceless) pp elements
        ham_projs = _hamiltonian_projections(logG, basis_mxs, basis_name, dim)
        norm = np.linalg.norm(ham_projs)
        decomp[gls + ' axis'] = ham_projs / norm if norm > 1e-15 else ham_projs
        decomp[gls + ' angle'] = norm * 2.0 / np.pi
        hamMx = sum(c * bmx for c, bmx in zip(ham_projs, basis_mxs[1:]))
        decomp[gls + ' hamiltonian eigenvalues'] = np.linalg.eigvals(hamMx)

    for gl in op_labels:
        for gl_other in op_labels:
            rotn = decomp[str(gl) + ' angle']
            rotn_o = decomp[str(gl_other) + ' angle']
            key = str(gl) + "," + str(gl_other) + " axis angle"
            if not (np.isfinite(rotn) and np.isfinite(rotn_o)):
                decomp[key] = np.nan
                continue
            if gl == gl_other or abs(rotn) < 1e-4 or abs(rotn_o) < 1e-4:
                decomp[key] = 10000.0  # sentinel for irrelevant angle
                continue
            real_dot = np.clip(np.real(
                np.dot(decomp[str(gl) + ' axis'],
                       decomp[str(gl_other) + ' axis'])), -1.0, 1.0)
            decomp[key] = np.arccos(real_dot) / np.pi
    return decomp


def _hamiltonian_projections(errgen, basis_mxs, mx_basis, dim):
    """Project an error generator onto Hamiltonian-type elementary
    generators for each traceless basis element."""
    from pygsti_tpu.tools.lindbladtools import create_elementary_errorgen
    errgen_std = change_basis(errgen, mx_basis, 'std')
    projs = []
    udim = int(round(np.sqrt(dim)))
    for bmx in basis_mxs[1:]:  # skip identity
        gen = create_elementary_errorgen('H', bmx)
        nrm2 = np.real(np.vdot(gen, gen))
        projs.append(np.real(np.vdot(gen, errgen_std)) / nrm2
                     if nrm2 > 1e-15 else 0.0)
    return np.asarray(projs)


# -- error generators & projections -------------------------------------------

def error_generator(gate, target, mx_basis='pp', typ='logGTi'):
    return _ot.error_generator(gate, target, mx_basis, typ)


def errorgen_and_projections(errgen, mx_basis='pp'):
    """Project an error generator onto hamiltonian/stochastic/affine
    elementary generators (reference: reportables.py:1948)."""
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.tools.lindbladtools import create_elementary_errorgen
    errgen = np.asarray(errgen)
    dim = errgen.shape[0]
    errgen_std = change_basis(errgen, mx_basis, 'std')
    b = Basis.cast('pp', dim)
    basis_mxs = np.asarray(b.elements)[1:]  # traceless

    ret = {'error generator': errgen}
    for typ, key in (('H', 'hamiltonian projections'),
                     ('S', 'stochastic projections'),
                     ('A', 'affine projections')):
        projs = []
        for bmx in basis_mxs:
            if typ == 'A':
                # affine = non-unital translation along bmx
                gen = _affine_errorgen(bmx, dim)
            else:
                gen = create_elementary_errorgen(typ, bmx)
            nrm2 = np.real(np.vdot(gen, gen))
            projs.append(np.real(np.vdot(gen, errgen_std)) / nrm2
                         if nrm2 > 1e-15 else 0.0)
        ret[key] = np.asarray(projs)
    return ret


def _affine_errorgen(bmx, dim):
    """Affine-type elementary generator: rho -> tr(rho) * bmx (std basis)."""
    udim = int(round(np.sqrt(dim)))
    gen = np.zeros((dim, dim), complex)
    ident = np.eye(udim) / udim
    gen[:, :] = np.outer(bmx.reshape(-1), ident.conj().reshape(-1))
    return gen


def log_tig_and_projections(a, b, mx_basis='pp'):
    """log(T^-1 G) error generator + projections (reference: :2015)."""
    return errorgen_and_projections(
        _ot.error_generator(a, b, mx_basis, 'logTiG'), mx_basis)


def log_gti_and_projections(a, b, mx_basis='pp'):
    return errorgen_and_projections(
        _ot.error_generator(a, b, mx_basis, 'logGTi'), mx_basis)


def log_diff_and_projections(a, b, mx_basis='pp'):
    return errorgen_and_projections(
        _ot.error_generator(a, b, mx_basis, 'logG-logT'), mx_basis)


# =============================================================================
# circuit-level metrics (products of gates along a circuit)
# =============================================================================

def _circuit_product(model, circuit):
    G = np.eye(model.dim)
    for lbl in circuit.layertup:
        G = model.operations[lbl].to_dense() @ G
    return G


def _circuit_pair(model_a, model_b, circuit):
    return (_circuit_product(model_a, circuit),
            _circuit_product(model_b, circuit))


def circuit_frobenius_diff(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return _ot.frobeniusdist(A, B)


def circuit_entanglement_infidelity(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return 1.0 - _ot.entanglement_fidelity(A, B, model_b.basis)


def circuit_avg_gate_infidelity(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return _ot.average_gate_infidelity(A, B, model_b.basis)


def circuit_jtrace_diff(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return _ot.jtracedist(A, B, model_b.basis)


def circuit_half_diamond_norm(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return 0.5 * _ot.diamonddist(A, B, model_b.basis)


def circuit_generator_infidelity(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return generator_infidelity(A, B, model_b.basis)


def circuit_nonunitary_entanglement_infidelity(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return nonunitary_entanglement_infidelity(A, B, model_b.basis)


def circuit_nonunitary_avg_gate_infidelity(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return nonunitary_avg_gate_infidelity(A, B, model_b.basis)


def circuit_eigenvalue_entanglement_infidelity(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return eigenvalue_entanglement_infidelity(A, B, model_b.basis)


def circuit_eigenvalue_avg_gate_infidelity(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return eigenvalue_avg_gate_infidelity(A, B, model_b.basis)


def circuit_eigenvalue_nonunitary_entanglement_infidelity(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return eigenvalue_nonunitary_entanglement_infidelity(A, B, model_b.basis)


def circuit_eigenvalue_nonunitary_avg_gate_infidelity(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return eigenvalue_nonunitary_avg_gate_infidelity(A, B, model_b.basis)


def circuit_eigenvalue_diamondnorm(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return eigenvalue_diamondnorm(A, B, model_b.basis)


def circuit_eigenvalue_nonunitary_diamondnorm(model_a, model_b, circuit):
    A, B = _circuit_pair(model_a, model_b, circuit)
    return eigenvalue_nonunitary_diamondnorm(A, B, model_b.basis)


# =============================================================================
# SPAM metrics
# =============================================================================

def vec_fidelity(rho_vec_a, rho_vec_b, mx_basis='pp'):
    a = vec_to_stdmx(np.asarray(rho_vec_a), mx_basis)
    b = vec_to_stdmx(np.asarray(rho_vec_b), mx_basis)
    return _ot.fidelity(a, b)


def vec_infidelity(rho_vec_a, rho_vec_b, mx_basis='pp'):
    return 1.0 - vec_fidelity(rho_vec_a, rho_vec_b, mx_basis)


def vec_trace_diff(rho_vec_a, rho_vec_b, mx_basis='pp'):
    a = vec_to_stdmx(np.asarray(rho_vec_a), mx_basis)
    b = vec_to_stdmx(np.asarray(rho_vec_b), mx_basis)
    return _ot.tracedist(a, b)


def vec_as_stdmx(vec, mx_basis='pp'):
    return vec_to_stdmx(np.asarray(vec), mx_basis)


def vec_as_stdmx_eigenvalues(vec, mx_basis='pp'):
    return np.linalg.eigvalsh(vec_to_stdmx(np.asarray(vec), mx_basis))


def spam_dotprods(rho_vecs, povms):
    """<E|rho> table: [n_effects_total, n_preps] (reference: :115)."""
    n_eff = sum(len(povm) for povm in povms)
    ret = np.empty((n_eff, len(rho_vecs)))
    for i, rho in enumerate(rho_vecs):
        rho_dense = np.asarray(rho.to_dense() if hasattr(rho, 'to_dense')
                               else rho).reshape(-1)
        j = 0
        for povm in povms:
            for elbl in povm:
                e = povm[elbl]
                e_dense = np.asarray(e.to_dense() if hasattr(e, 'to_dense')
                                     else e).reshape(-1)
                ret[j, i] = float(np.real(np.vdot(e_dense, rho_dense)))
                j += 1
    return ret


def povm_entanglement_infidelity(model_a, model_b, povmlbl):
    """EI between POVM maps (each POVM viewed as a channel into the
    classical outcome register; reference: reportables.py:817)."""
    A = _povm_map(model_a, povmlbl)
    B = _povm_map(model_b, povmlbl)
    return 1.0 - _ot.entanglement_fidelity(A, B, 'std')


def povm_jtrace_diff(model_a, model_b, povmlbl):
    A = _povm_map(model_a, povmlbl)
    B = _povm_map(model_b, povmlbl)
    return _ot.jtracedist(A, B, 'std')


def povm_half_diamond_norm(model_a, model_b, povmlbl):
    A = _povm_map(model_a, povmlbl)
    B = _povm_map(model_b, povmlbl)
    return 0.5 * _ot.diamonddist(A, B, 'std')


def _povm_map(model, povmlbl):
    """The POVM's measurement map rho -> sum_k tr(E_k rho)|k><k| as a square
    superoperator in the std basis (reference: tools/optools povm_map --
    comparing two POVMs' maps gives gauge-consistent POVM metrics)."""
    povm = model.povms[povmlbl]
    basis = model.basis
    dim = model.dim
    dense = np.asarray(povm.to_dense())       # [n_out, dim] superkets
    effects = [vec_to_stdmx(dense[i], basis) for i in range(dense.shape[0])]
    n_out = len(effects)
    udim = int(round(np.sqrt(dim)))
    if n_out > udim:
        raise ValueError(
            "POVM map is only defined for <= %d outcomes (Hilbert dim) but "
            "POVM '%s' has %d; the classical register does not embed in the "
            "diagonal (reference optools.compute_povm_map:1072 has the same "
            "restriction)." % (udim, str(povmlbl), n_out))
    # superop on vec(rho) (std flat): out = sum_k tr(E_k rho) |k><k|
    M = np.zeros((dim, dim), complex)
    for k, E in enumerate(effects):
        row = E.conj().reshape(-1)             # tr(E rho) on vec(rho)
        proj = np.zeros((udim, udim), complex)
        proj[k, k] = 1.0
        M += np.outer(proj.reshape(-1), row)
    return M


# =============================================================================
# instrument metrics (reference: reportables.py:2751,2779)
# =============================================================================

def instrument_infidelity(model_a, model_b, inst_lbl):
    """1 - (sum_k sqrt(F_e(A_k, B_k)))^2 (reference: reportables.py:2770-2772).

    Identical instruments give exactly 0 since sum_k sqrt(F_e)=1 when each
    member pair has F_e equal to its trace-probability share."""
    inst_a = model_a.instruments[inst_lbl]
    inst_b = model_b.instruments[inst_lbl]
    sqrt_fids = [
        np.sqrt(max(0.0, _ot.entanglement_fidelity(
            inst_a[lbl].to_dense(), inst_b[lbl].to_dense(), model_b.basis)))
        for lbl in inst_a.member_labels]
    return 1.0 - float(sum(sqrt_fids)) ** 2


def instrument_half_diamond_norm(model_a, model_b, inst_lbl):
    """Half diamond distance of the joint quantum-to-(classical x quantum)
    instrument map (reference: reportables.py:2798-2811) -- delegates to
    optools.instrument_diamonddist (the single joint-map implementation)."""
    return 0.5 * _ot.instrument_diamonddist(
        model_a.instruments[inst_lbl], model_b.instruments[inst_lbl],
        model_b.basis)
# =============================================================================
# model-level quantities
# =============================================================================

def average_gateset_infidelity(model_a, model_b):
    """Mean per-gate entanglement infidelity (reference: :2366)."""
    vals = []
    for lbl in model_a.operations:
        if lbl in model_b.operations:
            vals.append(1.0 - _ot.entanglement_fidelity(
                model_a.operations[lbl].to_dense(),
                model_b.operations[lbl].to_dense(), model_b.basis))
    return float(np.mean(vals)) if vals else np.nan


def predicted_rb_number(model_a, model_b):
    """First-order RB number prediction r = (d-1)/d * (1 - p) with p the
    average depolarization of the error channels (reference: :2392,
    extras.rb theory)."""
    d2 = model_a.dim
    d = int(round(np.sqrt(d2)))
    ps = []
    for lbl in model_a.operations:
        if lbl not in model_b.operations:
            continue
        try:
            L = model_a.operations[lbl].to_dense() @ \
                np.linalg.inv(model_b.operations[lbl].to_dense())
        except np.linalg.LinAlgError:
            continue
        # depolarization parameter: mean of the unital-block diagonal
        ps.append(float(np.real(np.trace(L[1:, 1:])) / (d2 - 1)))
    if not ps:
        return np.nan
    p = float(np.mean(ps))
    return (d - 1.0) / d * (1.0 - p)


# =============================================================================
# name-keyed dispatch used by report tables (reference: :2547,2645)
# =============================================================================

_OPFN_INFO = {
    'inf': (entanglement_infidelity, "Entanglement Infidelity"),
    'agi': (avg_gate_infidelity, "Avg. Gate Infidelity"),
    'trace': (jtrace_diff, "1/2 Trace Distance"),
    'diamond': (half_diamond_norm, "1/2 Diamond-Dist"),
    'nuinf': (nonunitary_entanglement_infidelity, "Non-unitary Ent. Infidelity"),
    'nuagi': (nonunitary_avg_gate_infidelity, "Non-unitary Avg. Gate Infidelity"),
    'evinf': (eigenvalue_entanglement_infidelity, "Eigenvalue Ent. Infidelity"),
    'evagi': (eigenvalue_avg_gate_infidelity, "Eigenvalue Avg. Gate Infidelity"),
    'evnuinf': (eigenvalue_nonunitary_entanglement_infidelity,
                "Eigenvalue Non-unitary Ent. Infidelity"),
    'evnuagi': (eigenvalue_nonunitary_avg_gate_infidelity,
                "Eigenvalue Non-unitary Avg. Gate Infidelity"),
    'evdiamond': (eigenvalue_diamondnorm, "Eigenvalue 1/2 Diamond-Dist"),
    'evnudiamond': (eigenvalue_nonunitary_diamondnorm,
                    "Eigenvalue Non-unitary 1/2 Diamond-Dist"),
    'geninf': (generator_infidelity, "Generator Infidelity"),
    'frob': (frobenius_diff, "Frobenius Distance"),
    'unmodeled': (None, "Un-modeled Error"),
    'wildcard': (None, "Un-modeled Error"),
}


def info_of_opfn_by_name(name):
    """(fn, niceName) for a gate-metric short name (reference: :2547)."""
    if name not in _OPFN_INFO:
        raise ValueError("Invalid gate-metric name: %r" % name)
    return _OPFN_INFO[name]


def evaluate_opfn_by_name(name, model, target_model, op_label_or_string,
                          confidence_region_info=None):
    """Evaluate a gate metric by short name on a gate label or circuit
    (reference: reportables.py:2645)."""
    fn, _ = info_of_opfn_by_name(name)
    if fn is None:
        raise ValueError("Metric %r is not model-evaluable" % name)
    basis = model.basis
    from pygsti_tpu.circuits.circuit import Circuit
    key = op_label_or_string
    if isinstance(key, Circuit) or isinstance(key, (tuple, list)):
        circuit = key if isinstance(key, Circuit) else Circuit(key)

        def fn_of_model(mdl):
            A = _circuit_product(mdl, circuit)
            B = _circuit_product(target_model, circuit)
            return fn(A, B, basis)
    else:
        def fn_of_model(mdl):
            return fn(mdl.operations[key].to_dense(),
                      target_model.operations[key].to_dense(), basis)
    return evaluate(fn_of_model, model, confidence_region_info)


# =============================================================================
# model-level tables (used by the HTML report factory)
# =============================================================================

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
        'eigenvalue_entanglement_infidelity': eigenvalue_entanglement_infidelity,
        'eigenvalue_avg_gate_infidelity': eigenvalue_avg_gate_infidelity,
        'nonunitary_entanglement_infidelity': nonunitary_entanglement_infidelity,
        'generator_infidelity': generator_infidelity,
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


def spam_metrics_table(model, target, crf_view=None):
    out = collections.OrderedDict()
    basis = model.basis
    for lbl in model.preps:
        if lbl in target.preps:
            t_dense = target.preps[lbl].to_dense()
            row = {}
            for m, fn in (('fidelity', vec_fidelity),
                          ('trace_dist', vec_trace_diff)):
                if crf_view is not None:
                    def fn_of_model(mdl, _lbl=lbl, _fn=fn):
                        return _fn(mdl.preps[_lbl].to_dense(), t_dense, basis)
                    row[m] = evaluate(fn_of_model, model, crf_view)
                else:
                    row[m] = fn(model.preps[lbl].to_dense(), t_dense, basis)
            out[('prep', lbl)] = row
    for lbl in model.povms:
        if lbl in target.povms:
            diff = np.linalg.norm(model.povms[lbl].to_dense()
                                  - target.povms[lbl].to_dense())
            out[('povm', lbl)] = {
                'frobenius_diff': float(diff),
                'entanglement_infidelity':
                    povm_entanglement_infidelity(model, target, lbl),
            }
    return out


def errorgen_projections_table(model, target, typ='logGTi'):
    """Per-gate H/S/A error-generator projections
    {gate: {'hamiltonian projections': ..., ...}}."""
    out = collections.OrderedDict()
    basis = model.basis
    for lbl in model.operations:
        if lbl not in target.operations:
            continue
        try:
            eg = _ot.error_generator(model.operations[lbl].to_dense(),
                                     target.operations[lbl].to_dense(),
                                     basis, typ)
            out[lbl] = errorgen_and_projections(eg, basis)
        except Exception as e:
            warnings.warn("errorgen projections failed for %s: %s" % (lbl, e))
    return out


def gate_decomposition_table(model, target):
    """Per-gate rotation decompositions + closest-unitary metrics."""
    out = collections.OrderedDict()
    basis = model.basis
    for lbl in model.operations:
        g = model.operations[lbl].to_dense()
        row = collections.OrderedDict()
        d = _ot.decompose_gate_matrix(np.asarray(g))
        row['decomposition'] = d
        row['choi_eigenvalues'] = choi_eigenvalues(g, basis)
        row['choi_trace'] = choi_trace(g, basis)
        row['upper_bound_fidelity'] = upper_bound_fidelity(g, basis)
        row['maximum_fidelity'] = maximum_fidelity(g, basis)
        row['maximum_trace_dist'] = maximum_trace_dist(g, basis)
        out[lbl] = row
    return out


def germ_amplified_metrics_table(model, target, germs, max_power=8):
    """Germ-amplified eigenvalue metrics: for each germ, metrics of the germ
    product (amplified along the germ's repeated action -- the quantities GST
    amplifies; reference: germ-based model violation reportables)."""
    out = collections.OrderedDict()
    for germ in germs:
        try:
            A, B = _circuit_pair(model, target, germ)
            out[germ] = {
                'eigenvalue_entanglement_infidelity':
                    eigenvalue_entanglement_infidelity(A, B, model.basis),
                'eigenvalue_diamondnorm':
                    eigenvalue_diamondnorm(A, B, model.basis),
                'rel_eigenvalues': rel_eigenvalues(A, B, model.basis),
            }
        except Exception as e:
            warnings.warn("germ metric failed for %s: %s" % (germ, e))
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


# =============================================================================
# Leakage reportables + eigenvalue/diamond-norm model functions (reference:
# reportables.py:218-1290, 1035-1181).
# =============================================================================

def leaky_entanglement_infidelity(a, b, mx_basis):
    """1 - computational-subspace entanglement fidelity (reference:
    reportables.leaky_entanglement_infidelity:1181)."""
    from pygsti_tpu.leakage import metrics as _lm
    return 1 - _lm.subspace_entanglement_fidelity(a, b, mx_basis)


def leaky_maximum_trace_dist(gate, mx_basis):
    """Subspace Jamiolkowski trace distance from `gate` to its closest
    unitary (reference: reportables.leaky_maximum_trace_dist:1035)."""
    from pygsti_tpu.leakage import metrics as _lm
    from pygsti_tpu.algorithms.core import find_closest_unitary_opmx
    closest = find_closest_unitary_opmx(gate, mx_basis)
    return _lm.subspace_jtracedist(gate, closest, mx_basis)


def _leakage_profile(op, mx_basis, direction='leak'):
    """Per-computational-state leakage (or seepage) rates of `op`: the
    probability each computational basis state leaks into (or a leakage
    state seeps back from) the leakage levels."""
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.tools.basistools import change_basis, stdmx_to_vec
    op = np.asarray(op)
    dim = op.shape[0]
    b = Basis.cast(mx_basis, dim) if isinstance(mx_basis, str) else mx_basis
    if not getattr(b, 'implies_leakage_modeling', lambda: False)():
        return []
    udim = int(round(np.sqrt(dim)))
    comp = list(range(udim - 1))   # leakage convention: last level leaks
    leak = [udim - 1]
    op_std = change_basis(op, b, 'std')
    rates = []
    src_levels, dst_levels = (comp, leak) if direction == 'leak' \
        else (leak, comp)
    for i in src_levels:
        rho = np.zeros((udim, udim), complex)
        rho[i, i] = 1.0
        out = (op_std @ rho.reshape(-1)).reshape(udim, udim)
        rates.append(float(np.real(sum(out[j, j] for j in dst_levels))))
    return rates


def pergate_leakrate_reduction(op, ignore, mx_basis, reduction):
    """max/min per-state leakage rate of an op (reference:
    reportables.pergate_leakrate_reduction:1074); NaN when the basis does
    not imply leakage modeling."""
    rates = _leakage_profile(op, mx_basis, 'leak')
    if len(rates) == 0:
        return np.nan
    return reduction(rates)


def pergate_leakrate_max(op, ignore, mx_basis):
    return pergate_leakrate_reduction(op, ignore, mx_basis, max)


def pergate_leakrate_min(op, ignore, mx_basis):
    return pergate_leakrate_reduction(op, ignore, mx_basis, min)


def pergate_seeprate(op, ignore, mx_basis):
    """Maximum per-state seepage rate (reference:
    reportables.pergate_seeprate:1091)."""
    rates = _leakage_profile(op, mx_basis, 'seep')
    if len(rates) == 0:
        return np.nan
    return max(rates)


def diamonddist_to_leakfree_cptp(op, ignore, mx_basis):
    """Diamond distance from `op` to the nearest leak-free CPTP map
    (reference: reportables.diamonddist_to_leakfree_cptp:1042).  The
    reference solves this as an SDP via cvxpy, which the TPU build does not
    ship; raises ImportError when cvxpy is unavailable, mirroring the
    reference's optional-dependency behavior."""
    try:
        import cvxpy  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "cvxpy is required for SDP leak-free projections") from e
    raise NotImplementedError(
        "SDP leak-free projection requires the cvxpy solver path")


def subspace_diamonddist_to_leakfree_cptp(op, ignore, mx_basis):
    """Subspace variant of diamonddist_to_leakfree_cptp (reference:
    reportables.subspace_diamonddist_to_leakfree_cptp:1057); cvxpy-gated."""
    return diamonddist_to_leakfree_cptp(op, ignore, mx_basis)


def POVM_half_diamond_norm(model_a, model_b, povmlbl):  # noqa: N802
    """Half diamond distance of two models' POVM maps (reference:
    reportables.POVM_half_diamond_norm)."""
    return povm_half_diamond_norm(model_a, model_b, povmlbl)


class GateEigenvalues(_ModelFunction):
    """Eigenvalues of a gate, matched to the target gate's for stable
    error-bar propagation (reference: reportables.GateEigenvalues:218)."""

    def __init__(self, model, oplabel):
        self.oplabel = oplabel
        super().__init__(model, [("gate", oplabel)])

    def evaluate(self, model):
        evals = np.linalg.eigvals(
            np.asarray(model.operations[self.oplabel].to_dense()))
        return np.array(sorted(evals, key=lambda x: (-abs(x), -x.real)))


class CircuitEigenvalues(_ModelFunction):
    """Eigenvalues of a circuit's product map (reference:
    reportables.CircuitEigenvalues:286)."""

    def __init__(self, model, circuit):
        self.circuit = circuit
        super().__init__(model, ["all"])

    def evaluate(self, model):
        mx = np.eye(model.dim)
        for layer in self.circuit.layertup:
            mx = np.asarray(model.operations[layer].to_dense()) @ mx
        evals = np.linalg.eigvals(mx)
        return np.array(sorted(evals, key=lambda x: (-abs(x), -x.real)))


class HalfDiamondNorm(_ModelFunction):
    """0.5 * diamond distance between a model gate and its target
    (reference: reportables.HalfDiamondNorm:1286)."""

    def __init__(self, model_a, model_b, oplabel):
        self.oplabel = oplabel
        self.model_b = model_b
        super().__init__(model_a, [("gate", oplabel)])

    def evaluate(self, model):
        from pygsti_tpu.tools.optools import diamonddist
        return 0.5 * diamonddist(
            np.asarray(model.operations[self.oplabel].to_dense()),
            np.asarray(self.model_b.operations[self.oplabel].to_dense()),
            model.basis)


class CircuitHalfDiamondNorm(_ModelFunction):
    """0.5 * diamond distance between a circuit's product map under two
    models (reference: reportables.CircuitHalfDiamondNorm:524)."""

    def __init__(self, model_a, model_b, circuit):
        self.circuit = circuit
        self.model_b = model_b
        super().__init__(model_a, ["all"])

    def evaluate(self, model):
        from pygsti_tpu.tools.optools import diamonddist

        def prod(m):
            mx = np.eye(m.dim)
            for layer in self.circuit.layertup:
                mx = np.asarray(m.operations[layer].to_dense()) @ mx
            return mx
        return 0.5 * diamonddist(prod(model), prod(self.model_b),
                                 model.basis)


def evaluate_instrumentfn_by_name(name, model, target_model, inst_label,
                                  confidence_region_info=None):
    """Evaluate a named instrument metric ('infidelity' or
    'half diamond norm') (reference:
    reportables.evaluate_instrumentfn_by_name:2818)."""
    if name in ('infidelity', 'instrument infidelity'):
        return instrument_infidelity(model, target_model, inst_label)
    if name in ('half diamond norm', 'instrument half diamond norm'):
        return instrument_half_diamond_norm(model, target_model, inst_label)
    raise ValueError("Unknown instrument function name: %s" % name)


def robust_log_gti_and_projections(model_a, model_b, synthetic_idle_circuits):
    """Gauge-robust error-generator projections from synthetic idles
    (reference: reportables.robust_log_gti_and_projections:2105).

    For each synthetic-idle circuit s (a circuit whose `model_b` product is
    the identity), the error generator log(A(s) B(s)^-1) is, to first order,
    a known linear combination of the per-gate elementary error generators.
    Accumulating these linear systems over all the circuits and solving by
    SVD yields gauge-robust linear combinations of per-gate H/S/C/A rates.
    Returns {combo_description: rate}.
    """
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.baseobjs.errorgenlabel import LocalElementaryErrorgenLabel
    mx_basis = model_b.basis
    dim = model_a.dim
    Id = np.identity(dim, 'd')
    op_labels = [gl for gl, gate in model_b.operations.items()
                 if not np.allclose(gate.to_dense(), Id)]
    eeg_basis = Basis.cast(
        'PP' if model_a.state_space.is_entirely_qubits else mx_basis, dim)
    nonI = eeg_basis.labels[1:]

    error_superops, error_labels = [], []
    for ptype in ("H", "S", "C", "A"):
        duals = _ot.elementary_errorgens_dual(dim, ptype, eeg_basis)
        if ptype in ("H", "S"):
            keys = [(bel,) for bel in nonI]
        else:
            keys = [(b1, b2) for i, b1 in enumerate(nonI)
                    for b2 in nonI[i + 1:]]
        for k in keys:
            error_superops.append(change_basis(
                duals[LocalElementaryErrorgenLabel(ptype, k)], "std",
                mx_basis))
            error_labels.append("%s(%s)" % (ptype, ",".join(k)))
    n_superops = len(error_superops)

    def _projection_vec(errgen):
        proj = []
        for ptype in ("H", "S", "C", "A"):
            projections = _ot.project_errorgen(errgen, ptype, eeg_basis,
                                               mx_basis)
            if ptype in ("H", "S"):
                proj.extend(projections[LocalElementaryErrorgenLabel(
                    ptype, (bel,))] for bel in nonI)
            else:
                proj.extend(projections[LocalElementaryErrorgenLabel(
                    ptype, (b1, b2))] for i, b1 in enumerate(nonI)
                    for b2 in nonI[i + 1:])
        return np.array(proj)

    def _first_order_noise(layers, err_sup_op, gl_with_err):
        noise = np.zeros((dim, dim), complex)
        for n, gl in enumerate(layers):
            if gl == gl_with_err:
                post = _product_of_labels(model_b, layers[n + 1:])
                pre = _product_of_labels(model_b, layers[:n + 1])
                noise += post @ err_sup_op @ pre
        return noise

    def _product_of_labels(model, labels):
        G = np.eye(dim)
        for lbl in labels:
            G = model.operations[lbl].to_dense() @ G
        return G

    def _errgen_jacobian(layers):
        jac = np.empty((n_superops, n_superops * len(op_labels)), complex)
        for i, gl in enumerate(op_labels):
            for k, err_on_gate in enumerate(error_superops):
                noise = _first_order_noise(layers, err_on_gate, gl)
                jac[:, i * n_superops + k] = [np.vdot(e, noise)
                                              for e in error_superops]
        assert np.linalg.norm(jac.imag) < 1e-6, \
            "error generator jacobian should be real!"
        return jac.real

    running_jac = running_y = None
    for s in synthetic_idle_circuits:
        layers = tuple(s.layertup)
        Sa = _circuit_product(model_a, s)
        Sb = _circuit_product(model_b, s)
        assert np.linalg.norm(Sb - Id) < 1e-6, \
            "Synthetic idle %s is not an idle!!" % str(s)
        si_errgen = _ot.error_generator(Sa, Sb, mx_basis, "logGTi")
        si_proj = _projection_vec(si_errgen)
        jac_si = _errgen_jacobian(layers)
        if running_jac is None:
            running_jac, running_y = jac_si, si_proj
        else:
            running_jac = np.concatenate((running_jac, jac_si), axis=0)
            running_y = np.concatenate((running_y, si_proj), axis=0)

    RANK_TOL, COEFF_TOL = 1e-8, 1e-1
    U, sv, Vt = np.linalg.svd(running_jac)
    rank = int(np.count_nonzero(sv > RANK_TOL))
    vals = np.diag(1.0 / sv[:rank]) @ (U[:, :rank].conj().T @ running_y)
    op_error_labels = ["%s.%s" % (gl, el) for gl in op_labels
                       for el in error_labels]
    ret = {}
    for combo, val in zip(Vt[:rank, :], vals):
        combo_str = " + ".join("%.1f*%s" % (c, el)
                               for c, el in zip(combo, op_error_labels)
                               if abs(c) > COEFF_TOL)
        ret[combo_str] = val
    return ret


from pygsti_tpu.report.modelfunction import modelfn_factory as _modelfn_factory
Robust_LogGTi_and_projections = _modelfn_factory(robust_log_gti_and_projections)
