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


def gram_matrix(m, adjoint=False):
    """M^dag M (or M M^dag when adjoint) (reference:
    matrixtools.gram_matrix)."""
    m = np.asarray(m)
    return m @ m.conj().T if adjoint else m.conj().T @ m


def is_projector(m, tol=1e-9):
    """Is m a projector (m @ m == m)? (reference: matrixtools.is_projector)."""
    m = np.asarray(m)
    return bool(np.linalg.norm(m @ m - m) < tol)


def normalize_columns(m, return_norms=False, ord=None):
    """Column-normalized copy (reference: matrixtools.normalize_columns)."""
    m = np.array(m, dtype=float if not np.iscomplexobj(m) else complex)
    norms = np.linalg.norm(m, axis=0, ord=ord)
    safe = np.where(norms > 1e-300, norms, 1.0)
    out = m / safe[None, :]
    return (out, norms) if return_norms else out


def column_norms(m, ord=None):
    return np.linalg.norm(np.asarray(m), axis=0, ord=ord)


def columns_are_orthogonal(m, tol=1e-7):
    m = np.asarray(m)
    g = np.abs(m.conj().T @ m)
    np.fill_diagonal(g, 0)
    return bool(np.all(g < tol))


def columns_are_orthonormal(m, tol=1e-7):
    m = np.asarray(m)
    g = m.conj().T @ m
    return bool(np.allclose(g, np.eye(m.shape[1]), atol=tol))


def independent_columns(m, initial_independent_cols=None, tol=1e-7):
    """Indices of a maximal linearly independent column subset (reference:
    matrixtools.independent_columns)."""
    m = np.asarray(m)
    keep = []
    basis = [] if initial_independent_cols is None \
        else [np.asarray(c, dtype=complex) for c in
              np.asarray(initial_independent_cols).T]
    for j in range(m.shape[1]):
        v = m[:, j].astype(complex)
        for b in basis:
            v = v - (b.conj() @ v) / (b.conj() @ b) * b
        if np.linalg.norm(v) > tol * max(np.linalg.norm(m[:, j]), 1e-300):
            keep.append(j)
            basis.append(v)
    return keep


def matrix_sign(m):
    """Matrix sign function via Schur/eigendecomposition (reference:
    matrixtools.matrix_sign)."""
    import scipy.linalg as spl
    m = np.asarray(m, dtype=complex)
    evals, V = np.linalg.eig(m)
    return np.real_if_close(V @ np.diag(np.sign(np.real(evals))) @
                            np.linalg.inv(V))


def eigenvalues(m):
    return np.linalg.eigvals(np.asarray(m))


def eigendecomposition(m):
    """(V, evals, V^-1) (reference: matrixtools.eigendecomposition returns
    (U, evals, invU))."""
    evals, V = np.linalg.eig(np.asarray(m))
    return V, evals, np.linalg.inv(V)


def vec(matrix_in):
    """Column-stacked vectorization (reference: matrixtools.vec)."""
    return np.asarray(matrix_in).flatten(order='F')[:, None]


def unvec(vector_in):
    d = int(round(np.sqrt(np.asarray(vector_in).size)))
    return np.asarray(vector_in).reshape(d, d, order='F')


def norm1(m):
    """Trace (Schatten-1) norm."""
    return float(np.sum(np.linalg.svd(np.asarray(m), compute_uv=False)))


def norm1to1(operator, num_samples=8, mx_basis="gm", return_list=False):
    """1-to-1 norm of a superoperator, estimated by sampling random
    Hermitian inputs (reference: matrixtools.norm1to1)."""
    from pygsti_tpu.tools.basistools import change_basis, vec_to_stdmx, stdmx_to_vec
    op = np.asarray(operator)
    d2 = op.shape[0]
    d = int(round(np.sqrt(d2)))
    vals = []
    for k in range(num_samples):
        h = random_hermitian(d, seed=k)
        h = h / norm1(h)
        rho_out = vec_to_stdmx(op @ stdmx_to_vec(h, mx_basis), mx_basis)
        vals.append(norm1(rho_out))
    return vals if return_list else float(max(vals))


def to_unitary(scaled_unitary):
    """(scale, unitary) with scaled_unitary = scale * unitary (reference:
    matrixtools.to_unitary)."""
    m = np.asarray(scaled_unitary, dtype=complex)
    scale = np.sqrt(np.abs(np.trace(m.conj().T @ m)) / m.shape[0])
    u = m / scale
    return scale, u


def sorted_eig(m):
    """Eigenvalues/vectors sorted by (real, imag) (reference:
    matrixtools.sorted_eig)."""
    evals, V = np.linalg.eig(np.asarray(m))
    order = np.lexsort((evals.imag, evals.real))
    return evals[order], V[:, order]


def intersection_space(space1, space2, tol=1e-7, use_nice_nullspace=False):
    """Intersection of two column spaces (reference:
    matrixtools.intersection_space)."""
    VW = np.concatenate([np.asarray(space1), -np.asarray(space2)], axis=1)
    ns = nullspace(VW, tol)
    return np.asarray(space1) @ ns[:np.asarray(space1).shape[1], :]


def union_space(space1, space2, tol=1e-7):
    """Span of the union of two column spaces (reference:
    matrixtools.union_space)."""
    stacked = np.concatenate([np.asarray(space1), np.asarray(space2)], axis=1)
    u, s, _ = np.linalg.svd(stacked, full_matrices=False)
    rank = int(np.sum(s > tol * max(s[0] if len(s) else 1.0, 1e-30)))
    return u[:, :rank]


def zvals_to_dense(zvals, superket=True):
    """Computational-basis state |z0 z1 ...> as a dense (super)ket
    (reference: matrixtools.zvals_to_dense)."""
    n = len(zvals)
    idx = 0
    for z in zvals:
        idx = (idx << 1) | int(z)
    psi = np.zeros(2 ** n, dtype=complex)
    psi[idx] = 1.0
    if not superket:
        return psi
    from pygsti_tpu.tools.basistools import stdmx_to_vec
    return np.real(stdmx_to_vec(np.outer(psi, psi.conj()), 'pp'))
