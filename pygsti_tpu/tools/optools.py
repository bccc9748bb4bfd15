"""Superoperator conversions and gate/state metrics.

Mirrors the reference's pygsti/tools/optools.py API surface: unitary <->
superoperator conversions, fidelities, trace/Frobenius distances, Kraus /
Choi decompositions (via tools/jamiolkowski.py), eigenvalue metrics.

Vectorization convention: row-major ("std" basis = matrix units ordered
row-major), so vec(A rho B) = (A kron B^T) vec(rho) and the std-basis
superoperator of rho -> U rho U^dag is kron(U, U.conj()).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as spl

from pygsti_tpu.baseobjs.basis import Basis
from pygsti_tpu.tools.basistools import change_basis, stdmx_to_vec, vec_to_stdmx


# ---------------------------------------------------------------------------
# Conversions
# ---------------------------------------------------------------------------

def unitary_to_std_process_mx(u):
    """Unitary (d x d) -> superoperator in the std basis (d**2 x d**2)."""
    u = np.asarray(u, dtype=complex)
    return np.kron(u, u.conj())


def unitary_to_superop(u, mx_basis='pp'):
    """Unitary -> superoperator matrix in `mx_basis`."""
    return change_basis(unitary_to_std_process_mx(u), 'std', mx_basis)


def unitary_to_pauligate(u):
    """Unitary -> Pauli-transfer-matrix (pp-basis superoperator)."""
    return unitary_to_superop(u, 'pp')


def superop_to_unitary(superop, mx_basis='pp', check=True):
    """Invert unitary_to_superop (superop must correspond to a unitary map)."""
    std = change_basis(np.asarray(superop), mx_basis, 'std')
    d2 = std.shape[0]
    d = int(round(np.sqrt(d2)))
    # Choi matrix of the map; for a unitary map it is rank-1: |u>><<u|
    choi = std.reshape(d, d, d, d).transpose(0, 2, 1, 3).reshape(d2, d2) / d
    evals, evecs = np.linalg.eigh((choi + choi.conj().T) / 2)
    if check and not np.isclose(evals[-1], 1.0, atol=1e-6):
        raise ValueError("Superoperator is not unitary (top Choi eigenvalue %g != 1)" % evals[-1])
    u = evecs[:, -1].reshape(d, d) * np.sqrt(d)
    # fix phase
    idx = np.unravel_index(np.argmax(np.abs(u)), u.shape)
    u = u / (u[idx] / abs(u[idx]))
    return u


def state_to_dmvec(psi):
    """Pure state |psi> -> vectorized density matrix (std basis, row-major)."""
    psi = np.asarray(psi).reshape(-1, 1)
    return (psi @ psi.conj().T).flatten()


def dmvec_to_state(dmvec, tol=1e-6):
    """Vectorized (std) density matrix of a pure state -> |psi>."""
    dmvec = np.asarray(dmvec)
    d = int(round(np.sqrt(len(dmvec))))
    dm = dmvec.reshape(d, d)
    evals, evecs = np.linalg.eigh((dm + dm.conj().T) / 2)
    if abs(evals[-1] - 1.0) > tol:
        raise ValueError("Density matrix is not a pure state")
    return evecs[:, -1]


def operation_from_unitary(u, mx_basis='pp'):
    return unitary_to_superop(u, mx_basis)


def spam_from_state(psi, basis='pp'):
    """Pure state -> (prep vector, effect vector) in `basis`."""
    rho = np.outer(np.asarray(psi), np.asarray(psi).conj())
    v = stdmx_to_vec(rho, basis)
    return v, v.copy()


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def fidelity(a, b):
    """State fidelity F = (Tr sqrt( sqrt(a) b sqrt(a) ))^2 between density
    matrices (reference: optools.fidelity:159, incl. rank-1 shortcuts)."""
    a = np.asarray(a, dtype=complex)
    b = np.asarray(b, dtype=complex)
    evals_a = np.linalg.eigvalsh((a + a.conj().T) / 2)
    evals_b = np.linalg.eigvalsh((b + b.conj().T) / 2)
    if np.isclose(np.max(evals_a), 1.0, atol=1e-6) and np.isclose(np.sum(evals_a), 1.0, atol=1e-6):
        # a is rank-1: F = <psi|b|psi>
        _, evecs = np.linalg.eigh((a + a.conj().T) / 2)
        psi = evecs[:, -1]
        return float(np.real(psi.conj() @ b @ psi))
    if np.isclose(np.max(evals_b), 1.0, atol=1e-6) and np.isclose(np.sum(evals_b), 1.0, atol=1e-6):
        _, evecs = np.linalg.eigh((b + b.conj().T) / 2)
        psi = evecs[:, -1]
        return float(np.real(psi.conj() @ a @ psi))
    sqrt_a = spl.sqrtm(a)
    inner = sqrt_a @ b @ sqrt_a
    evals = np.linalg.eigvals(inner)
    tr = np.sum(np.sqrt(np.clip(np.real(evals), 0, None)))
    return float(np.real(tr ** 2))


def frobeniusdist(a, b):
    return float(np.linalg.norm(np.asarray(a) - np.asarray(b)))


def frobeniusdist_squared(a, b):
    return frobeniusdist(a, b) ** 2


def tracenorm(m):
    """Trace norm = sum of singular values."""
    return float(np.sum(np.linalg.svd(np.asarray(m), compute_uv=False)))


def tracedist(a, b):
    """Trace distance 0.5 * ||a - b||_1 between density matrices."""
    return 0.5 * tracenorm(np.asarray(a) - np.asarray(b))


def jtracedist(a, b, mx_basis='pp'):
    """Jamiolkowski trace distance between superoperators (reference:
    optools.jtracedist): trace distance between Choi matrices."""
    from pygsti_tpu.tools.jamiolkowski import jamiolkowski_iso
    ja = jamiolkowski_iso(a, mx_basis)
    jb = jamiolkowski_iso(b, mx_basis)
    return tracedist(ja, jb)


def entanglement_fidelity(a, b, mx_basis='pp'):
    """Entanglement (process) fidelity between superoperators a, b
    (reference: optools.entanglement_fidelity:509).  For b unitary this is
    Tr(b^dag a)/d^2 in a trace-orthonormal basis."""
    from pygsti_tpu.tools.jamiolkowski import jamiolkowski_iso
    ja = jamiolkowski_iso(a, mx_basis)
    jb = jamiolkowski_iso(b, mx_basis)
    return fidelity(ja, jb)


def process_fidelity(a, b, mx_basis='pp'):
    return entanglement_fidelity(a, b, mx_basis)


def average_gate_fidelity(a, b, mx_basis='pp'):
    """AGF = (d F_e + 1) / (d + 1)."""
    d2 = np.asarray(a).shape[0]
    d = int(round(np.sqrt(d2)))
    fe = entanglement_fidelity(a, b, mx_basis)
    return float((d * fe + 1) / (d + 1))


def average_gate_infidelity(a, b, mx_basis='pp'):
    return 1.0 - average_gate_fidelity(a, b, mx_basis)


def entanglement_infidelity(a, b, mx_basis='pp'):
    return 1.0 - entanglement_fidelity(a, b, mx_basis)


def unitarity(a, mx_basis='pp'):
    """Unitarity u(E) = Tr(E_u^dag E_u) / (d^2 - 1) of the unital block
    (reference: optools.unitarity)."""
    b = change_basis(np.asarray(a), mx_basis, 'gm')
    unital = b[1:, 1:]
    d2 = b.shape[0]
    return float(np.real(np.trace(unital.conj().T @ unital)) / (d2 - 1))


def diamonddist(a, b, mx_basis='pp', return_x=False):
    """Diamond-norm distance.  The reference uses a CVXPY SDP
    (optools.diamonddist:387); here we solve the same SDP with scipy when
    available, else fall back to the Choi trace-norm lower bound x2 upper
    heuristic.  Currently implements the lower bound 2*jtracedist <= dd and
    reports the SDP value via a dedicated solver in tools/sdptools."""
    from pygsti_tpu.tools import sdptools
    return sdptools.diamond_norm_distance(a, b, mx_basis)


def decompose_gate_matrix(op_mx):
    """Decompose a 1-qubit gate matrix into rotation axis/angle + decay params
    (subset of reference optools.decompose_gate_matrix:1286)."""
    m = np.asarray(op_mx)
    d2 = m.shape[0]
    out = {'isValid': False, 'isUnitary': False}
    evals = np.linalg.eigvals(m)
    out['eigenvalues'] = evals
    mags = np.abs(evals)
    out['isUnitary'] = bool(np.allclose(mags, 1.0, atol=1e-6))
    # rotation angle: largest |angle| among eigenvalue phases
    angles = np.angle(evals)
    out['pi rotations'] = float(np.max(np.abs(angles)) / np.pi)
    out['decay of diagonal rotation terms'] = float(1.0 - np.mean(mags))
    if d2 == 4:
        # rotation axis: +1-eigenvector of the unital 3x3 block, as the
        # 4-vector [0, nx, ny, nz] (reference decomposition's convention)
        R = np.real(m[1:, 1:])
        evals_r, evecs_r = np.linalg.eig(R)
        i = int(np.argmin(np.abs(evals_r - 1.0)))
        axis = np.real(evecs_r[:, i])
        nrm = np.linalg.norm(axis)
        if nrm > 1e-12:
            axis = axis / nrm
        out['axis of rotation'] = np.concatenate([[0.0], axis])
    out['isValid'] = True
    return out


def eigenvalue_entanglement_infidelity(a, b, mx_basis='pp'):
    """Infidelity computed from eigenvalue comparison (best matching)."""
    ev_a = np.sort_complex(np.linalg.eigvals(np.asarray(a)))
    ev_b = np.sort_complex(np.linalg.eigvals(np.asarray(b)))
    d2 = len(ev_a)
    return float(np.real(1.0 - np.abs(np.sum(ev_a * ev_b.conj())) / d2))


def kraus_decomposition(superop, mx_basis='pp', tol=1e-9):
    """Kraus operators of a CP map from its Choi eigendecomposition
    (reference: optools Kraus decomposition:658)."""
    from pygsti_tpu.tools.jamiolkowski import fast_jamiolkowski_iso_std
    # std-pairing Choi: J = vec(K) vec(K)^dag / d summed over Kraus ops,
    # so each eigenvector unvecs (row-major) directly to a Kraus operator.
    choi = fast_jamiolkowski_iso_std(superop, mx_basis)
    d2 = choi.shape[0]
    d = int(round(np.sqrt(d2)))
    evals, evecs = np.linalg.eigh((choi + choi.conj().T) / 2)
    kraus = []
    for i in range(d2 - 1, -1, -1):
        if evals[i] > tol:
            k = evecs[:, i].reshape(d, d) * np.sqrt(d * evals[i])
            kraus.append(k)
    return kraus


def is_cptp(superop, mx_basis='pp', tol=1e-7):
    """Check complete positivity (Choi PSD) and trace preservation."""
    from pygsti_tpu.tools.jamiolkowski import jamiolkowski_iso
    choi = jamiolkowski_iso(superop, mx_basis)
    cp = bool(np.all(np.linalg.eigvalsh((choi + choi.conj().T) / 2) > -tol))
    std = change_basis(np.asarray(superop), mx_basis, 'std')
    d2 = std.shape[0]
    d = int(round(np.sqrt(d2)))
    # TP: identity left-eigenvector: vec(I)^T S = vec(I)^T
    vec_id = np.identity(d).flatten()
    tp = bool(np.allclose(vec_id @ std, vec_id, atol=tol))
    return cp and tp


def error_generator(gate, target_op, mx_basis='pp', typ='logGTi'):
    """Error generator L with gate = target_op * exp(L) ('logGTi' type,
    the reference default; optools.error_generator)."""
    gate = np.asarray(gate)
    target = np.asarray(target_op)
    if typ == 'logGTi':
        rel = np.linalg.inv(target) @ gate
        L = spl.logm(rel)
        if np.linalg.norm(L.imag) > 1e-8:
            import warnings
            warnings.warn("Error generator has imaginary part; taking real part")
        return L.real
    elif typ == 'logTiG':
        rel = gate @ np.linalg.inv(target)
        return spl.logm(rel).real
    elif typ == 'logG-logT':
        return (spl.logm(gate) - spl.logm(target)).real
    raise ValueError("Unknown error generator type %r" % typ)


def operation_from_error_generator(error_gen, target_op, typ='logGTi'):
    """Inverse of error_generator."""
    if typ == 'logGTi':
        return np.asarray(target_op) @ spl.expm(np.asarray(error_gen))
    elif typ == 'logTiG':
        return spl.expm(np.asarray(error_gen)) @ np.asarray(target_op)
    raise ValueError("Unknown error generator type %r" % typ)


def rotation_gate_mx(r, mx_basis='pp'):
    """Superoperator for exp(-i sum_k (r_k/2) P_k) where P_k ranges over the
    non-identity STANDARD (unnormalized) Pauli products, so r=[pi/2, 0, 0]
    gives Gxpi2 (reference: optools.rotation_gate_mx:2410)."""
    import itertools
    n_params = len(r)
    d2 = n_params + 1
    nq = int(round(np.log2(d2) / 2))
    assert 4 ** nq == d2, "r must have length 4^n - 1"
    sigma = [np.eye(2), np.array([[0, 1], [1, 0]], complex),
             np.array([[0, -1j], [1j, 0]]), np.diag([1, -1.0])]
    paulis = []
    for combo in itertools.product(range(4), repeat=nq):
        m = np.array([[1.0]], complex)
        for i in combo:
            m = np.kron(m, sigma[i])
        paulis.append(m)
    gen = sum(float(rk) * 0.5 * paulis[k + 1] for k, rk in enumerate(r))
    u = spl.expm(-1j * gen)
    return unitary_to_superop(u, mx_basis)


def fidelity_upper_bound(operation_mx):
    """Upper bound on process fidelity to ANY unitary: the largest-magnitude
    eigenvalue of the Choi matrix divided by d (reference:
    optools.fidelity_upper_bound)."""
    from pygsti_tpu.tools.jamiolkowski import jamiolkowski_iso
    choi = jamiolkowski_iso(np.asarray(operation_mx))
    evals = np.linalg.eigvalsh((choi + choi.conj().T) / 2)
    return float(np.max(evals))


def unitary_to_process_mx(u):
    """Alias of unitary_to_std_process_mx (reference keeps both names)."""
    return unitary_to_std_process_mx(u)


def std_process_mx_to_unitary(superop):
    """Unitary from a std-basis process matrix (assumes the superop IS a
    unitary channel; reference: optools.std_process_mx_to_unitary)."""
    return superop_to_unitary(superop, 'std')


def process_mx_to_unitary(superop, mx_basis='pp'):
    """Alias of superop_to_unitary."""
    return superop_to_unitary(superop, mx_basis)


def project_model(model, target_model, projectiontypes=('H', 'S', 'H+S', 'LND'),
                  gen_type='logG-logT', logG_weight=None):
    """Project each gate's error generator onto Hamiltonian / stochastic /
    full-Lindblad subspaces and rebuild models (reference:
    optools.project_model:2456).  Returns (models, n_params) lists ordered
    by `projectiontypes` ('H', 'S', 'H+S', 'LND', 'LNDF' supported)."""
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.tools import lindbladtools as _lt
    from pygsti_tpu.tools.basistools import change_basis
    from pygsti_tpu.modelmembers.operations import FullArbitraryOp

    d2 = model.dim
    basis = Basis.cast('pp', d2)
    els = basis.elements
    n = els.shape[0] - 1

    ham_gens = np.stack([
        np.real(change_basis(_lt.create_elementary_errorgen('H', els[i]),
                             'std', basis)) for i in range(1, n + 1)])
    pair_gens = np.empty((n, n, d2, d2), complex)
    for a in range(n):
        for b in range(n):
            pair_gens[a, b] = change_basis(
                _lt.create_lindbladian_term_errorgen('O', els[a + 1], els[b + 1]),
                'std', basis)

    # least-squares projector onto span{ham_gens, pair_gens}
    A = np.concatenate([ham_gens.reshape(n, -1),
                        pair_gens.reshape(n * n, -1)], axis=0).T  # [d4, K]
    A_pinv = np.linalg.pinv(A, rcond=1e-12)

    out_models = {p: model.copy() for p in projectiontypes}
    n_params = {p: 0 for p in projectiontypes}

    for gl in model.operations.keys():
        G = np.asarray(model.operations[gl].to_dense())
        T = np.asarray(target_model.operations[gl].to_dense())
        errgen = error_generator(G, T, basis, gen_type)
        coeffs = A_pinv @ errgen.reshape(-1)
        h = np.real(coeffs[:n])
        M = coeffs[n:].reshape(n, n)
        M = (M + M.conj().T) / 2  # hermitize

        ham_eg = np.tensordot(h, ham_gens, (0, 0))
        sto_eg = np.real(np.tensordot(np.real(np.diag(M)),
                                      np.stack([pair_gens[i, i].real
                                                for i in range(n)]), (0, 0)))
        lnd_eg = ham_eg + np.real(np.tensordot(M, pair_gens, ((0, 1), (0, 1))))
        evals, U = np.linalg.eigh(M)
        Mcp = (U * evals.clip(0, None)[None, :]) @ U.conj().T
        lnd_cp_eg = ham_eg + np.real(np.tensordot(Mcp, pair_gens,
                                                  ((0, 1), (0, 1))))

        pieces = {'H': (ham_eg, n), 'S': (sto_eg, n),
                  'H+S': (ham_eg + sto_eg, 2 * n),
                  'LND': (lnd_cp_eg, n + n * n), 'LNDF': (lnd_eg, n + n * n)}
        for p in projectiontypes:
            eg, npar = pieces[p]
            typ = 'logGTi' if gen_type in ('logGTi',) else 'logTiG' \
                if gen_type == 'logTiG' else 'logGTi'
            if gen_type == 'logG-logT':
                newG = spl.expm(spl.logm(T).real + eg)
            else:
                newG = operation_from_error_generator(eg, T, gen_type)
            out_models[p].operations[gl] = FullArbitraryOp(np.real(newG))
            n_params[p] += npar

    for p in projectiontypes:
        out_models[p]._mark_for_rebuild()
    return ([out_models[p] for p in projectiontypes],
            [n_params[p] for p in projectiontypes])


def spam_error_generator(spamvec, target_spamvec, mx_basis='pp', typ="logGTi"):
    """Error generator for a SPAM vector: L with spamvec = exp(L) target
    (assuming the error map acts diagonally-ish; reference:
    optools.spam_error_generator:1648 uses the same 'spam error along the
    target direction' construction)."""
    assert typ == "logGTi", "Only logGTi spam error generators are supported"
    v = np.asarray(spamvec).ravel()
    t = np.asarray(target_spamvec).ravel()
    d2 = len(v)
    # error map E with v = E t: choose E = I + (v-t) t^T / |t|^2 and take log
    E = np.eye(d2) + np.outer(v - t, t) / float(np.dot(t, t))
    return spl.logm(E).real


def gateset_infidelity(model, target_model, itype='EI', weights=None,
                       mx_basis=None, is_tp=None, is_unitary=None):
    """Weighted average over gates of the entanglement ('EI') or average-gate
    ('AGI') infidelity to the target (reference:
    optools.gateset_infidelity:886)."""
    assert itype in ('EI', 'AGI')
    if mx_basis is None:
        mx_basis = getattr(model, 'basis', 'pp')
    total = 0.0
    wtotal = 0.0
    for lbl in target_model.operations.keys():
        w = 1.0 if weights is None else float(weights.get(lbl, 1.0))
        a = np.asarray(model.operations[lbl].to_dense())
        b = np.asarray(target_model.operations[lbl].to_dense())
        inf = entanglement_infidelity(a, b, mx_basis) if itype == 'EI' \
            else average_gate_infidelity(a, b, mx_basis)
        total += w * float(np.real(inf))
        wtotal += w
    return total / max(wtotal, 1e-300)
