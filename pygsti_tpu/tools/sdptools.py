"""Diamond-norm computation.

The reference solves the Watrous SDP with CVXPY (pygsti/tools/sdptools.py).
CVXPY is not a dependency here; we compute the diamond norm of the difference
channel by direct maximization over pure input states on the doubled space:

    ||Lambda||_diamond = max_{|psi> in C^d tensor C^d} || (Lambda tensor I)(|psi><psi|) ||_1

which for small d (the GST regime, d <= 16) converges reliably with a few
random restarts of L-BFGS.  Verified against known analytic cases in tests.
"""

from __future__ import annotations

import numpy as np
import scipy.optimize as spo

from pygsti_tpu.tools.basistools import change_basis


def _apply_channel_ext(std_superop, psi, d):
    """(Lambda tensor I)(|psi><psi|) for |psi> in C^(d*d)."""
    rho = np.outer(psi, psi.conj())  # (d*d, d*d)
    # reshape to (d, d, d, d): indices (a, a', b, b') with Lambda acting on (a, b)
    rho4 = rho.reshape(d, d, d, d)
    # vec convention: Lambda acts on first factor's density-matrix indices (a, b)
    S = std_superop.reshape(d, d, d, d)  # S[k,l, a,b]: out[k,l] = sum_ab S[k,l,a,b] in[a,b]
    out = np.einsum('klab,axby->kxly', S, rho4)
    return out.reshape(d * d, d * d)


def diamond_norm(superop, mx_basis='pp', num_restarts=6, seed=0):
    """Diamond norm of a superoperator (typically a difference of channels)."""
    std = change_basis(np.asarray(superop), mx_basis, 'std')
    d2 = std.shape[0]
    d = int(round(np.sqrt(d2)))
    D = d * d
    rng = np.random.default_rng(seed)

    def objective(x):
        psi = x[:D] + 1j * x[D:]
        nrm = np.linalg.norm(psi)
        if nrm < 1e-12:
            return 0.0
        psi = psi / nrm
        m = _apply_channel_ext(std, psi, d)
        sv = np.linalg.svd(m, compute_uv=False)
        return -float(np.sum(sv))

    best = 0.0
    for _ in range(num_restarts):
        x0 = rng.normal(size=2 * D)
        res = spo.minimize(objective, x0, method='L-BFGS-B',
                           options={'maxiter': 300, 'ftol': 1e-12})
        best = max(best, -res.fun)
    return best


def diamond_norm_distance(a, b, mx_basis='pp', num_restarts=6, seed=0):
    """Diamond-norm distance between two channels (no 1/2 factor, matching
    the reference's diamonddist which returns ||A-B||_diamond)."""
    diff = np.asarray(a) - np.asarray(b)
    return diamond_norm(diff, mx_basis, num_restarts, seed)


# ---------------------------------------------------------------------------
# CVXPY SDP model builders (reference: tools/sdptools.py).  CVXPY is an
# optional dependency: these build exact SDP models (Watrous diamond-norm
# primal, CPTP projection, root-fidelity hypograph) when cvxpy is
# installed, and raise ImportError otherwise.  The default diamond_norm
# above needs no SDP solver.
# ---------------------------------------------------------------------------

import importlib.util as _importlib_util
import warnings as _warnings

CVXPY_ENABLED = _importlib_util.find_spec("cvxpy") is not None
SDP_SOLVER_PRIORITY = ['MOSEK', 'CLARABEL', 'CVXOPT']
_CVXPY = None


class CVXPYFailure(UserWarning):
    pass


def _get_cvxpy():
    global _CVXPY
    if _CVXPY is None:
        import cvxpy as cp
        _CVXPY = cp
    return _CVXPY


def solve_sdp(prob, **kwargs):
    """Solve a CVXPY problem, trying MOSEK, CLARABEL, then CVXOPT; returns
    (objective_value, {var_name: value}) with NaN on total failure
    (reference: sdptools.solve_sdp:48)."""
    cp = _get_cvxpy()
    objective_val = float('nan')
    varvals = {}
    for i, solver in enumerate(SDP_SOLVER_PRIORITY):
        try:
            with _warnings.catch_warnings():
                _warnings.filterwarnings(
                    'ignore', '.*Solution may be inaccurate.*', UserWarning)
                prob.solve(solver=solver, **kwargs)
            objective_val = prob.value
            varvals.update({k: v.value for k, v in prob.var_dict.items()})
            break
        except (AssertionError, cp.SolverError) as e:
            if i + 1 == len(SDP_SOLVER_PRIORITY):
                msg = "solve_sdp: out of solvers (%s). Returning NaN." % e
            else:
                msg = "solve_sdp: solver %s failed (%s); trying %s." \
                    % (solver, e, SDP_SOLVER_PRIORITY[i + 1])
            _warnings.warn(msg, CVXPYFailure)
    return objective_val, varvals


def _choi_map_matrix(d_mixed, basis, normalized=False):
    """The constant matrix C with vec(J(X)) = C @ vec(X): the Jamiolkowski
    isomorphism is linear in the superoperator, so it lifts to CVXPY
    expressions via one matmul."""
    from pygsti_tpu.tools.jamiolkowski import jamiolkowski_iso
    cols = []
    E = np.zeros((d_mixed, d_mixed))
    for j in range(d_mixed):
        for i in range(d_mixed):  # column-major (vec) ordering
            E[i, j] = 1.0
            J = np.asarray(jamiolkowski_iso(E, basis, 'std'))
            if not normalized:
                J = J * (d_mixed ** 0.5)  # undo the 1/d Choi normalization
            cols.append(J.flatten(order='F'))
            E[i, j] = 0.0
    return np.stack(cols, axis=1)


def _cvxpy_jamiolkowski(X, basis, d_mixed, normalized=True):
    """Jamiolkowski/Choi matrix of a CVXPY superoperator expression."""
    cp = _get_cvxpy()
    C = _choi_map_matrix(d_mixed, basis, normalized)
    vecJ = C @ cp.vec(X, order='F')
    return cp.reshape(vecJ, (d_mixed, d_mixed), order='F')


def diamond_norm_model_jamiolkowski(J):
    """CVXPY problem maximizing Re<J, X> subject to the Watrous primal
    SDP block constraint -- its optimum is half the diamond norm of the
    map with (unnormalized) Choi matrix J (arXiv:1207.5726v2, Sec 3.2;
    reference: sdptools.diamond_norm_model_jamiolkowski:74).  Returns
    (problem, [X, rho0, rho1])."""
    cp = _get_cvxpy()
    dim = J.shape[0]
    small = int(np.sqrt(dim))
    assert dim == small ** 2
    rho0 = cp.Variable((small, small), name='rho0', hermitian=True)
    rho1 = cp.Variable((small, small), name='rho1', hermitian=True)
    X = cp.Variable((dim, dim), name='X', complex=True)
    Y, Z = cp.real(X), cp.imag(X)
    K, L = np.real(J), np.imag(J)
    objective = cp.Maximize(
        cp.sum(cp.multiply(K, Y)) + cp.sum(cp.multiply(L, Z)))
    ident = np.identity(small, 'd')
    block_11 = cp.bmat([[cp.kron(ident, cp.real(rho0)), Y],
                        [Y.T, cp.kron(ident, cp.real(rho1))]])
    block_21 = cp.bmat([[cp.kron(ident, cp.imag(rho0)), Z],
                        [-Z.T, cp.kron(ident, cp.imag(rho1))]])
    mat_joint = cp.bmat([[block_11, block_21.T],
                         [block_21, block_11]])
    constraints = [mat_joint >> 0, rho0 >> 0, rho1 >> 0,
                   cp.trace(rho0) == 1.0, cp.trace(rho1) == 1.0]
    return cp.Problem(objective, constraints), [X, rho0, rho1]


def diamond_norm_canon(arg, basis):
    """Epigraph representation of ||arg||_diamond for a CVXPY superoperator
    expression: returns (epigraph_expr, constraints) via the dual SDP
    (Watrous' semidefinite characterization; reference:
    sdptools.diamond_norm_canon:142)."""
    cp = _get_cvxpy()
    d = arg.shape[0]
    small = int(np.sqrt(d))
    assert d == small ** 2 and arg.shape == (d, d)
    Jarg = _cvxpy_jamiolkowski(arg, basis, d, normalized=False)
    Y0 = cp.Variable(shape=(d, d), hermitian=True)
    Y1 = cp.Variable(shape=(d, d), hermitian=True)
    bmat = cp.bmat([[Y0, -Jarg],
                    [-Jarg.T.conj(), Y1]])
    constraints = [(bmat + bmat.T.conj()) / 2 >> 0]
    tr0 = cp.partial_trace(Y0, [small, small], 0)
    tr1 = cp.partial_trace(Y1, [small, small], 0)
    return (cp.lambda_max(tr0) + cp.lambda_max(tr1)) / 2, constraints


def cptp_superop_variable(purestate_dim, basis):
    """A CVXPY variable constrained to be a CPTP superoperator in `basis`:
    TP via the first process-matrix row (identity-first bases) or a linear
    constraint, CP via PSD Choi matrix (reference:
    sdptools.cptp_superop_variable:172).  Returns (X, constraints)."""
    cp = _get_cvxpy()
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.tools.basistools import stdmx_to_vec
    d = purestate_dim ** 2
    basis = Basis.cast(basis, d) if isinstance(basis, str) else basis
    constraints = []
    if getattr(basis, 'first_element_is_identity', False):
        toprow = np.zeros((1, d))
        toprow[0, 0] = 1.0
        X_free = cp.Variable((d - 1, d))
        X = cp.vstack([toprow, X_free])
    else:
        X = cp.Variable((d, d))
        vecI = np.asarray(stdmx_to_vec(np.eye(purestate_dim),
                                       basis)).reshape(-1)
        constraints.append(X.T @ vecI == vecI)
    J = _cvxpy_jamiolkowski(X, basis, d, normalized=True)
    constraints.append((J + J.T.conj()) / 2 >> 0)
    return X, constraints


def diamond_distance_projection_model(superop, basis, leakfree=False,
                                      seepfree=False, cptp=True,
                                      subspace_diamond=False):
    """CVXPY model projecting `superop` onto the nearest CPTP (optionally
    leak-free / seep-free) channel in diamond distance (reference:
    sdptools.diamond_distance_projection_model:200).  Returns
    (problem, projection_variable, viable_solvers)."""
    assert CVXPY_ENABLED, "cvxpy is required for SDP projection models"
    cp = _get_cvxpy()
    dim_mixed = superop.shape[0]
    dim_pure = int(np.sqrt(dim_mixed))
    assert dim_pure ** 2 == dim_mixed
    constraints = []
    if cptp:
        proj_superop, cons = cptp_superop_variable(dim_pure, basis)
        constraints.extend(cons)
    else:
        proj_superop = cp.Variable((dim_mixed, dim_mixed))
    arg = superop - proj_superop
    if leakfree or seepfree or subspace_diamond:
        assert basis.implies_leakage_modeling()
        from pygsti_tpu.leakage.core import computational_superkets
        U = computational_superkets(basis)
        P = U @ U.T.conj()
        I = np.eye(dim_mixed)
        if leakfree:
            constraints.append((I - P) @ proj_superop @ U == 0)
        if seepfree:
            constraints.append(U.T @ proj_superop @ (I - P) == 0)
        if subspace_diamond:
            arg = arg @ P
    expr, cons = diamond_norm_canon(arg, basis)
    constraints.extend(cons)
    problem = cp.Problem(cp.Minimize(expr / 2), constraints)
    viable = [s for s in SDP_SOLVER_PRIORITY
              if s in cp.installed_solvers()]
    return problem, proj_superop, viable


def root_fidelity_canon(sigma, rho):
    """Hypograph representation of the root fidelity
    sqrt(F)(sigma, rho) = max Re tr(X) s.t. [[sigma, X], [X^H, rho]] >> 0
    (Killoran thesis Sec 7.1.3; reference:
    sdptools.root_fidelity_canon:235).  Returns (t, constraints)."""
    cp = _get_cvxpy()
    d = sigma.shape[0]
    t = cp.Variable()
    X = cp.Variable(shape=(d, d), complex=True)
    bmat = cp.bmat([[sigma, X], [X.T.conj(), rho]])
    constraints = [(bmat + bmat.T.conj()) / 2 >> 0,
                   cp.trace(cp.real(X)) >= t]
    return t, constraints
