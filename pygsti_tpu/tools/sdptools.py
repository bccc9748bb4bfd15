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
