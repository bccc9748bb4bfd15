"""Dense matrix helpers (reference: pygsti/tools/matrixtools.py)."""

from __future__ import annotations

import numpy as np
import scipy.linalg as spl


def is_hermitian(mx, tol=1e-9):
    m = np.asarray(mx)
    return m.shape[0] == m.shape[1] and np.allclose(m, m.conj().T, atol=tol)


def is_pos_def(mx, tol=1e-9):
    evals = np.linalg.eigvalsh(np.asarray(mx))
    return bool(np.all(evals > -tol))


def is_valid_density_mx(mx, tol=1e-9):
    m = np.asarray(mx)
    return is_hermitian(m, tol) and is_pos_def(m, tol) and abs(np.trace(m) - 1.0) < tol


def mx_to_string(m, width=9, prec=4):
    m = np.asarray(m)
    if np.iscomplexobj(m) and np.allclose(m.imag, 0, atol=1e-12):
        m = m.real
    return np.array2string(m, precision=prec, suppress_small=True)


def unitary_superoperator_matrix_log(m, mx_basis):
    """Log of a superoperator matrix that corresponds to a unitary map."""
    from pygsti_tpu.tools.basistools import change_basis
    m_std = change_basis(np.asarray(m), mx_basis, 'std')
    ev, U = np.linalg.eig(m_std)
    log_ev = np.log(ev.astype(complex))
    # unitary superop evals lie on unit circle: log is purely imaginary
    log_m_std = U @ np.diag(log_ev) @ np.linalg.inv(U)
    return change_basis(log_m_std, 'std', mx_basis)


def real_matrix_log(m, action_if_imaginary="raise", tol=1e-8):
    """Real log of a real matrix, if it exists (reference: matrixtools.real_matrix_log)."""
    log_m = spl.logm(np.asarray(m))
    if np.linalg.norm(log_m.imag) > tol:
        if action_if_imaginary == "raise":
            raise ValueError("Matrix log has imaginary part")
        elif action_if_imaginary == "warn":
            import warnings
            warnings.warn("Matrix log has imaginary part; taking real part")
    return log_m.real


def approximate_matrix_log(m, target_logm, target_weight=10.0, tol=1e-6):
    """Real approximate log near a target (simplified version of the
    reference's iterative routine): project logm(m) onto real matrices."""
    log_m = spl.logm(np.asarray(m))
    return log_m.real


def nice_nullspace(m, tol=1e-7, orthogonalize=False):
    """Nullspace basis with rows 'nicely' scaled (reference: matrixtools.nice_nullspace)."""
    m = np.asarray(m)
    _, s, vh = np.linalg.svd(m)
    rank = int(np.sum(s > tol * (s[0] if len(s) else 1.0)))
    ns = vh[rank:].T.conj()
    if orthogonalize and ns.size:
        ns, _ = np.linalg.qr(ns)
    return ns


def nullspace(m, tol=1e-7):
    return nice_nullspace(m, tol)


def column_basis_vector(i, dim):
    v = np.zeros((dim, 1))
    v[i] = 1.0
    return v


def safe_onenorm(m):
    return np.linalg.norm(np.asarray(m), 1)


def mx_rank(m, tol=1e-7):
    s = np.linalg.svd(np.asarray(m), compute_uv=False)
    return int(np.sum(s > tol))


def print_mx(m, width=9, prec=4):
    print(mx_to_string(m, width, prec))


def safe_expm(m):
    return spl.expm(np.asarray(m))


def random_hermitian(dim, seed=None):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    return (a + a.conj().T) / 2


def project_onto_antikite(m, kite):
    """Zero out the block-diagonal ('kite') part, keeping off-kite elements."""
    m = np.array(m)
    off = 0
    for blk in kite:
        m[off:off + blk, off:off + blk] = 0
        off += blk
    return m


def project_onto_kite(m, kite):
    """Keep only the block-diagonal ('kite') part."""
    m = np.asarray(m)
    out = np.zeros_like(m)
    off = 0
    for blk in kite:
        out[off:off + blk, off:off + blk] = m[off:off + blk, off:off + blk]
        off += blk
    return out
