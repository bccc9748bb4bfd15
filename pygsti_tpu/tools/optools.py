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


# =============================================================================
# Reference-surface parity: POVM / instrument maps + metrics, eigenvalue
# fidelities, elementary-errorgen projection API, and label helpers
# (reference: pygsti/tools/optools.py:235-2940).
# =============================================================================

def compute_povm_map(model, povmlbl):
    """The POVM's measurement map rho -> sum_k tr(E_k rho)|k><k| as a
    superoperator in `model.basis` (reference: optools.compute_povm_map:1072)."""
    from pygsti_tpu.report.reportables import _povm_map
    from pygsti_tpu.tools.basistools import change_basis
    return change_basis(_povm_map(model, povmlbl), 'std', model.basis)


def povm_fidelity(model, target_model, povmlbl):
    """Entanglement fidelity of two models' POVM maps (reference:
    optools.povm_fidelity:1120)."""
    from pygsti_tpu.report.reportables import _povm_map
    return float(np.real(entanglement_fidelity(
        _povm_map(model, povmlbl), _povm_map(target_model, povmlbl), 'std')))


def povm_jtracedist(model, target_model, povmlbl):
    """Jamiolkowski trace distance of two models' POVM maps (reference:
    optools.povm_jtracedist:1149)."""
    from pygsti_tpu.report.reportables import _povm_map
    return float(jtracedist(_povm_map(model, povmlbl),
                            _povm_map(target_model, povmlbl), 'std'))


def povm_diamonddist(model, target_model, povmlbl):
    """Diamond distance of two models' POVM maps (reference:
    optools.povm_diamonddist:1178)."""
    from pygsti_tpu.report.reportables import _povm_map
    return float(diamonddist(_povm_map(model, povmlbl),
                             _povm_map(target_model, povmlbl), 'std'))


def instrument_infidelity(a, b, mx_basis):
    """1 - (sum_k sqrt(F_e(A_k, B_k)))^2 for two Instruments (reference:
    optools.instrument_infidelity:1215)."""
    sqrt_fids = [np.sqrt(max(0.0, float(np.real(entanglement_fidelity(
        np.asarray(a[lbl].to_dense()), np.asarray(b[lbl].to_dense()),
        mx_basis)))))
        for lbl in a.member_labels]
    return 1.0 - float(sum(sqrt_fids)) ** 2


def instrument_diamonddist(a, b, mx_basis):
    """Diamond distance of the joint quantum->(classical x quantum)
    instrument maps (reference: optools.instrument_diamonddist:1239).
    Builds the direct-sum composite map (one d-dim block per member) and
    takes a single diamond norm."""
    from pygsti_tpu.tools.basistools import change_basis
    labels = list(a.member_labels)
    nc = len(labels)
    mem0 = change_basis(np.asarray(a[labels[0]].to_dense()), mx_basis, 'std')
    d2 = mem0.shape[0]
    d = int(round(np.sqrt(d2)))
    D = nc * d
    A_big = np.zeros((D * D, D * D), complex)
    B_big = np.zeros((D * D, D * D), complex)
    for k, lbl in enumerate(labels):
        mem_a = change_basis(np.asarray(a[lbl].to_dense()), mx_basis, 'std')
        mem_b = change_basis(np.asarray(b[lbl].to_dense()), mx_basis, 'std')
        # vec(std) index (i, j) of the big space; member k writes the
        # d x d block at rows/cols [k*d, (k+1)*d)
        for i in range(d):
            for j in range(d):
                row_big = (k * d + i) * D + (k * d + j)
                for i2 in range(d):
                    for j2 in range(d):
                        col_big = i2 * D + j2
                        A_big[row_big, col_big] = mem_a[i * d + j, i2 * d + j2]
                        B_big[row_big, col_big] = mem_b[i * d + j, i2 * d + j2]
    return float(diamonddist(A_big, B_big, 'std'))


def eigenvalue_fidelity(x, y, gauge_invariant=True):
    """Fidelity computed from (matched) eigenvalues of PSD matrices x, y:
    <sqrt v(x), sqrt v(y)>^2, an upper bound on F(x, y) (reference:
    optools.eigenvalue_fidelity:235)."""
    import scipy.linalg as _spl
    x = np.asarray(x)
    y = np.asarray(y)
    if gauge_invariant:
        vx = np.sort(_spl.eigvalsh(x))
        vy = np.sort(_spl.eigvalsh(y))
    else:
        # match eigenvalues by eigenvector similarity (min-weight matching)
        from scipy.optimize import linear_sum_assignment
        valsX, vecsX = _spl.eigh(x)
        valsY, vecsY = _spl.eigh(y)
        # NOTE: the reference's dissimilarity is |1 - |conj(x).conj(y)||
        # (plain dot of conjugated eigenvector rows, NOT the Hermitian
        # inner product) -- reproduce it exactly
        cost = np.abs(1 - np.abs(vecsX.T @ vecsY))
        ri, ci = linear_sum_assignment(cost)
        vx, vy = valsX[ri], valsY[ci]
    vx = np.maximum(vx, 0)
    vy = np.maximum(vy, 0)
    return float((np.sqrt(vx) @ np.sqrt(vy)) ** 2)


def eigenvalue_infidelity(a, b, gauge_invariant=True):
    """1 - eigenvalue_fidelity (reference: optools.eigenvalue_infidelity:291)."""
    return 1.0 - eigenvalue_fidelity(a, b, gauge_invariant)


def is_trace_preserving(a, mx_basis='pp', tol=1e-8):
    """Whether superoperator `a` is trace preserving (reference:
    optools.is_trace_preserving:480)."""
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.tools.basistools import stdmx_to_vec
    a = np.asarray(a)
    dim = a.shape[0]
    basis = Basis.cast(mx_basis, dim) if isinstance(mx_basis, str) else mx_basis
    if getattr(basis, 'first_element_is_identity', True):
        return bool(np.isclose(a[0, 0], 1.0, atol=tol)
                    and np.allclose(a[0, 1:], 0.0, atol=tol))
    udim = int(round(np.sqrt(dim)))
    i_vec = np.asarray(stdmx_to_vec(np.eye(udim).astype(complex),
                                    basis)).ravel()
    expect = (a.T.conj() if np.iscomplexobj(a) else a.T) @ i_vec
    return bool(np.linalg.norm(i_vec - expect) <= tol * udim)


def superket_trace(superket, basis):
    """Trace of the density matrix a superket represents (reference:
    optools.superket_trace:500)."""
    from pygsti_tpu.tools.basistools import vec_to_stdmx
    if getattr(basis, 'first_element_is_identity', False):
        udim = int(round(np.sqrt(len(np.ravel(superket)))))
        # identity-first orthonormal basis: trace = sqrt(udim) * component 0
        return float(np.real(np.ravel(superket)[0]) * np.sqrt(udim))
    return float(np.real(np.trace(vec_to_stdmx(np.asarray(superket), basis))))


def superop_is_unitary(superop_mx, mx_basis='pp', rank_tol=1e-6):
    """Whether a superoperator performs a unitary action: its Choi matrix is
    rank 1 (reference: optools.superop_is_unitary:1575)."""
    from pygsti_tpu.tools.jamiolkowski import jamiolkowski_iso
    J = np.asarray(jamiolkowski_iso(np.asarray(superop_mx), mx_basis, 'std'))
    return bool(np.linalg.matrix_rank(J, rank_tol) == 1)


def is_valid_lindblad_paramtype(typ):
    """Whether `typ` names a recognized Lindblad parameterization (reference:
    optools.is_valid_lindblad_paramtype:2839)."""
    if typ in ('GLND', 'CPTP', 'CPTPLND'):
        return True
    # evolution-type suffixes ('terms', 'clifford terms') and affine ('A')
    # blocks were dropped in the reference's v0.10 LindbladParameterization;
    # duplicates like 'H+H' are accepted there (the blocks simply repeat)
    parts = typ.split('+')
    allowed = {'H', 'S', 's', 'D', 'd'}
    return bool(parts) and all(p in allowed for p in parts)


def effect_label_to_outcome(povm_and_effect_lbl):
    """Extract the outcome (effect) label from a simplified 'POVM_effect'
    label (reference: optools.effect_label_to_outcome:2874)."""
    if povm_and_effect_lbl is None:
        return "NONE"
    name = getattr(povm_and_effect_lbl, 'name', povm_and_effect_lbl)
    return name[name.rindex('_') + 1:]


def effect_label_to_povm(povm_and_effect_lbl):
    """Extract the POVM name from a simplified 'POVM_effect' label
    (reference: optools.effect_label_to_povm:2906)."""
    if povm_and_effect_lbl is None:
        return "NONE"
    name = getattr(povm_and_effect_lbl, 'name', povm_and_effect_lbl)
    return name[:name.rindex('_')]


def fast_density_rank(rho, tol=1e-9):
    """Rank of a (Hermitian) density matrix, counting eigenvalues above
    `tol` (reference: optools.fast_density_rank)."""
    evals = np.linalg.eigvalsh(np.asarray(rho))
    return int(np.sum(evals > tol))


def elementary_errorgens(dim, typ, basis):
    """Dict of {LocalElementaryErrorgenLabel: dense generator (std basis)}
    for all elementary generators of `typ` built from non-identity `basis`
    elements (reference: optools.elementary_errorgens:1859)."""
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.baseobjs.errorgenlabel import LocalElementaryErrorgenLabel
    from pygsti_tpu.tools import lindbladtools as _lt
    assert typ in ('H', 'S', 'C', 'A')
    b = Basis.cast(basis, dim) if isinstance(basis, str) else basis
    lbls = list(b.labels[1:])
    mxs = [np.asarray(e) for e in b.elements[1:]]
    out = {}
    if typ in 'HS':
        for lbl, mx in zip(lbls, mxs):
            out[LocalElementaryErrorgenLabel(typ, (str(lbl),))] = \
                _lt.create_elementary_errorgen(typ, mx)
    else:
        for i, (la, ma) in enumerate(zip(lbls, mxs)):
            for lb, mb in zip(lbls[i + 1:], mxs[i + 1:]):
                out[LocalElementaryErrorgenLabel(typ, (str(la), str(lb)))] = \
                    _lt.create_elementary_errorgen(typ, ma, mb)
    return out


def elementary_errorgens_dual(dim, typ, basis):
    """Duals of elementary_errorgens, normalized so
    <dual_i, errgen_j> = delta_ij (reference:
    optools.elementary_errorgens_dual:1914)."""
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.baseobjs.errorgenlabel import LocalElementaryErrorgenLabel
    from pygsti_tpu.tools import lindbladtools as _lt
    assert typ in ('H', 'S', 'C', 'A')
    b = Basis.cast(basis, dim) if isinstance(basis, str) else basis
    lbls = list(b.labels[1:])
    mxs = [np.asarray(e) for e in b.elements[1:]]
    out = {}
    if typ in 'HS':
        for lbl, mx in zip(lbls, mxs):
            out[LocalElementaryErrorgenLabel(typ, (str(lbl),))] = \
                _lt.create_pairing_normalized_errorgen_dual(typ, mx)
    else:
        for i, (la, ma) in enumerate(zip(lbls, mxs)):
            for lb, mb in zip(lbls[i + 1:], mxs[i + 1:]):
                out[LocalElementaryErrorgenLabel(typ, (str(la), str(lb)))] = \
                    _lt.create_pairing_normalized_errorgen_dual(typ, ma, mb)
    return out


def project_errorgen(errorgen, elementary_errorgen_type,
                     elementary_errorgen_basis, errorgen_basis='pp',
                     return_dual_elementary_errorgens=False,
                     return_projected_errorgen=False):
    """Project a dense error generator onto the elementary generators of one
    type: rate_i = <dual_i, errorgen> (reference:
    optools.project_errorgen:2055).  Returns {label: rate} plus optionally
    the dual generators and/or the projected (reconstructed) generator, all
    in `errorgen_basis`."""
    from pygsti_tpu.tools.basistools import change_basis
    eg_std = change_basis(np.asarray(errorgen), errorgen_basis, 'std')
    dim = eg_std.shape[0]
    duals = elementary_errorgens_dual(dim, elementary_errorgen_type,
                                      elementary_errorgen_basis)
    projections = {lbl: float(np.real(np.vdot(dual, eg_std)))
                   for lbl, dual in duals.items()}
    ret = [projections]
    if return_dual_elementary_errorgens:
        ret.append(duals)
    if return_projected_errorgen:
        prims = elementary_errorgens(dim, elementary_errorgen_type,
                                     elementary_errorgen_basis)
        proj_std = sum(projections[lbl] * prims[lbl] for lbl in prims)
        ret.append(change_basis(proj_std, 'std', errorgen_basis))
    return ret[0] if len(ret) == 1 else tuple(ret)


def extract_elementary_errorgen_coefficients(errorgen,
                                             elementary_errorgen_labels,
                                             elementary_errorgen_basis='PP',
                                             errorgen_basis='pp',
                                             return_projected_errorgen=False):
    """Rates of the specified elementary-errorgen labels within a dense
    error generator (reference:
    optools.extract_elementary_errorgen_coefficients:1972)."""
    from pygsti_tpu.tools.basistools import change_basis
    from pygsti_tpu.baseobjs.errorgenlabel import LocalElementaryErrorgenLabel
    eg_std = change_basis(np.asarray(errorgen), errorgen_basis, 'std')
    dim = eg_std.shape[0]
    basis_for_duals = 'pp' if str(elementary_errorgen_basis).upper() == 'PP' \
        else elementary_errorgen_basis
    by_type = {}
    out = {}
    proj_std = np.zeros_like(eg_std)
    for lbl in elementary_errorgen_labels:
        if not isinstance(lbl, LocalElementaryErrorgenLabel):
            lbl = LocalElementaryErrorgenLabel(
                lbl[0], tuple(str(b) for b in lbl[1:])) \
                if not hasattr(lbl, 'errorgen_type') else lbl
        typ = lbl.errorgen_type
        if typ not in by_type:
            by_type[typ] = (
                elementary_errorgens_dual(dim, typ, basis_for_duals),
                elementary_errorgens(dim, typ, basis_for_duals))
        duals, prims = by_type[typ]
        rate = float(np.real(np.vdot(duals[lbl], eg_std)))
        out[lbl] = rate
        if return_projected_errorgen:
            proj_std = proj_std + rate * prims[lbl]
    if return_projected_errorgen:
        return out, change_basis(proj_std, 'std', errorgen_basis)
    return out


def generator_infidelity(a, b, mx_basis='pp'):
    """Sum of squared Hamiltonian rates plus stochastic rates of the error
    generator between `a` and its target `b` (reference:
    optools.generator_infidelity:835)."""
    try:
        errgen = error_generator(np.asarray(a), np.asarray(b), mx_basis,
                                 'logGTi')
    except Exception:
        return np.nan
    h = project_errorgen(errgen, 'H', 'pp', mx_basis)
    s = project_errorgen(errgen, 'S', 'pp', mx_basis)
    return float(sum(v ** 2 for v in h.values()) + sum(s.values()))


def create_elementary_errorgen_nqudit(typ, basis_element_labels, basis_1q,
                                      normalize=False, sparse=False,
                                      tensorprod_basis=False):
    """An n-qudit elementary error generator (std basis, dense) built from
    per-qudit basis-label strings, e.g. ('XY',) for a 2-qubit H generator
    (reference: optools.create_elementary_errorgen_nqudit:2193)."""
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.tools import lindbladtools as _lt
    b1 = basis_1q if isinstance(basis_1q, Basis) else Basis.cast(basis_1q, 4)
    lbl_to_el = {str(l): np.asarray(e)
                 for l, e in zip(b1.labels, b1.elements)}

    def kron_label(label_str):
        m = np.ones((1, 1), complex)
        for ch in label_str:
            m = np.kron(m, lbl_to_el[ch])
        return m

    mats = [kron_label(s) for s in basis_element_labels]
    if typ in ('H', 'S'):
        assert len(mats) == 1
        out = _lt.create_elementary_errorgen(typ, mats[0])
    else:
        assert len(mats) == 2
        out = _lt.create_elementary_errorgen(typ, mats[0], mats[1])
    if normalize:
        nrm = np.linalg.norm(out)
        if nrm > 1e-300:
            out = out / nrm
    if sparse:
        import scipy.sparse as _sps
        return _sps.csr_matrix(out)
    return out


def create_elementary_errorgen_nqudit_dual(typ, basis_element_labels,
                                           basis_1q, normalize=False,
                                           sparse=False,
                                           tensorprod_basis=False):
    """Dual of create_elementary_errorgen_nqudit (reference:
    optools.create_elementary_errorgen_nqudit_dual)."""
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.tools import lindbladtools as _lt
    b1 = basis_1q if isinstance(basis_1q, Basis) else Basis.cast(basis_1q, 4)
    lbl_to_el = {str(l): np.asarray(e)
                 for l, e in zip(b1.labels, b1.elements)}

    def kron_label(label_str):
        m = np.ones((1, 1), complex)
        for ch in label_str:
            m = np.kron(m, lbl_to_el[ch])
        return m

    mats = [kron_label(s) for s in basis_element_labels]
    if typ in ('H', 'S'):
        out = _lt.create_pairing_normalized_errorgen_dual(typ, mats[0])
    else:
        out = _lt.create_pairing_normalized_errorgen_dual(typ, mats[0],
                                                          mats[1])
    if normalize:
        nrm = np.linalg.norm(out)
        if nrm > 1e-300:
            out = out / nrm
    if sparse:
        import scipy.sparse as _sps
        return _sps.csr_matrix(out)
    return out


def bulk_create_elementary_errorgen_nqudit(typ, basis_element_labels,
                                           basis_1q, normalize=False,
                                           sparse=False,
                                           tensorprod_basis=False):
    """List of n-qudit elementary error generators, one per (typ, labels)
    pair (reference: optools.bulk_create_elementary_errorgen_nqudit:2276)."""
    typs = [typ] * len(basis_element_labels) if isinstance(typ, str) else typ
    return [create_elementary_errorgen_nqudit(t, lbls, basis_1q, normalize,
                                              sparse, tensorprod_basis)
            for t, lbls in zip(typs, basis_element_labels)]


def bulk_create_elementary_errorgen_nqudit_dual(typ, basis_element_labels,
                                                basis_1q, normalize=False,
                                                sparse=False,
                                                tensorprod_basis=False):
    """Duals of bulk_create_elementary_errorgen_nqudit (reference:
    optools.bulk_create_elementary_errorgen_nqudit_dual)."""
    typs = [typ] * len(basis_element_labels) if isinstance(typ, str) else typ
    return [create_elementary_errorgen_nqudit_dual(t, lbls, basis_1q,
                                                   normalize, sparse,
                                                   tensorprod_basis)
            for t, lbls in zip(typs, basis_element_labels)]


def minimal_kraus_decomposition(superop, mx_basis='pp', tol=1e-9):
    """Kraus decomposition keeping only operators with weight above `tol`
    (reference: optools.minimal_kraus_decomposition)."""
    return kraus_decomposition(superop, mx_basis, tol)


def tensorized_with_eye(op, op_basis, ten_basis=None, std_basis=None,
                        ten_std_basis=None):
    """kron(op, I) as a superoperator: `op` tensored with an identity factor
    of the same dimension, returned in `ten_basis` (default: pp of the
    doubled space) (reference: optools.tensorized_with_eye:595)."""
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.tools.basistools import change_basis
    op = np.asarray(op)
    d2 = op.shape[0]
    d = int(round(np.sqrt(d2)))
    op_std = change_basis(op, op_basis, 'std').reshape(d, d, d, d)
    eye = np.eye(d)
    # big[(r1 r2)(c1 c2), (r1' r2')(c1' c2')] =
    #   op_std[r1 c1, r1' c1'] * delta(r2, r2') * delta(c2, c2')
    big_std = np.einsum('acef,bg,dh->abcdegfh', op_std, eye, eye)
    big_std = big_std.reshape(d2 * d2, d2 * d2)
    tb = ten_basis if ten_basis is not None else Basis.cast('pp', d2 * d2)
    return change_basis(big_std, 'std', tb)


def rootconj_superop(kraus_op, mx_basis='pp'):
    """The superoperator rho -> K rho K^dag for a single Kraus operator
    (reference: optools.rootconj_superop)."""
    from pygsti_tpu.tools.basistools import change_basis
    K = np.asarray(kraus_op)
    sup_std = np.kron(K, K.conj())
    return change_basis(sup_std, 'std', mx_basis)


def project_to_target_eigenspace(model, target_model, eps=1e-6):
    """Project each model gate onto its target gate's eigenspaces: replace
    G with sum_i P_i G P_i where P_i are the target's eigenprojectors
    (removes off-eigenspace 'coherent' errors; reference:
    optools.project_to_target_eigenspace)."""
    ret = target_model.copy()
    for gl, target_op in target_model.operations.items():
        tmx = np.asarray(target_op.to_dense())
        gmx = np.asarray(model.operations[gl].to_dense())
        evals, V = np.linalg.eig(tmx)
        Vinv = np.linalg.inv(V)
        g_in_eig = Vinv @ gmx @ V
        # zero entries coupling different target eigenvalues
        mask = np.abs(evals[:, None] - evals[None, :]) < eps
        proj = np.real_if_close(V @ (g_in_eig * mask) @ Vinv)
        from pygsti_tpu.modelmembers.operations import FullArbitraryOp
        ret.operations[gl] = FullArbitraryOp(np.real(proj))
    if hasattr(ret, '_mark_for_rebuild'):
        ret._mark_for_rebuild()
    return ret


def compute_best_case_gauge_transform(gate_mx, target_gate_mx,
                                      return_all=False):
    """The unitary gauge transform aligning `gate_mx`'s eigenvectors with
    the target's (Kaiser-style best-case alignment; reference:
    optools.compute_best_case_gauge_transform).  Returns the superoperator
    U_gauge with U_gauge^-1 gate U_gauge ~ target as closely as a pure
    eigenbasis rotation allows."""
    from scipy.optimize import linear_sum_assignment
    G = np.asarray(gate_mx)
    T = np.asarray(target_gate_mx)
    evG, VG = np.linalg.eig(G)
    evT, VT = np.linalg.eig(T)
    # match eigenvalues
    cost = np.abs(evG[:, None] - evT[None, :])
    ri, ci = linear_sum_assignment(cost)
    VG_m = VG[:, ri]
    VT_m = VT[:, ci]
    U = VG_m @ np.linalg.inv(VT_m)
    if return_all:
        return U, (evG[ri], evT[ci])
    return U


def relaxed_scalar_tolerance(a, b, rtol=1e-8, atol=1e-10):
    """A forgiving scalar comparison tolerance helper (reference:
    optools.relaxed_scalar_tolerance)."""
    return max(atol, rtol * max(abs(a), abs(b)))
