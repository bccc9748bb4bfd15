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


def nullspace(m, tol=1e-7):
    """SVD nullspace: columns span ker(m) (reference: matrixtools.nullspace,
    absolute singular-value tolerance)."""
    m = np.asarray(m)
    _, s, vh = np.linalg.svd(m)
    rank = int((s > tol).sum())
    return vh[rank:].T.conj()


def nice_nullspace(m, tol=1e-7, orthogonalize=False):
    """Nullspace with a 'nice' basis: project unit columns (chosen by pivoted
    QR) onto the nullspace, then scale each column so its largest-magnitude
    element is +1.0 (reference: matrixtools.nice_nullspace — conventions
    matter for FOGI direction reproducibility)."""
    nullsp = nullspace(m, tol)
    dim_ker = nullsp.shape[1]
    if dim_ker == 0:
        return nullsp
    _, _, p = spl.qr(nullsp.T.conj(), mode='raw', pivoting=True)
    ret = nullsp @ (nullsp.T[:, p[:dim_ker]]).conj()
    if orthogonalize:
        ret, _ = spl.qr(ret, mode='economic')
    for j in range(ret.shape[1]):  # normalize so largest element is +1.0
        imax = np.argmax(np.abs(ret[:, j]))
        if abs(ret[imax, j]) > 1e-6:
            ret[:, j] /= ret[imax, j]
    return ret


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
    """Column-normalized copy; `ord` may be an array of per-column norm
    orders.  Zero columns report norm 1.0 (reference:
    matrixtools.normalize_columns)."""
    norms = column_norms(m, ord)
    norms[norms == 0.0] = 1.0
    normalized_m = scale_columns(m, 1 / norms)
    return (normalized_m, norms) if return_norms else normalized_m


def column_norms(m, ord=None):
    """Per-column norms; `ord` may be a per-column array (reference:
    matrixtools.column_norms)."""
    m = np.asarray(m)
    if isinstance(ord, (list, np.ndarray)):
        assert len(ord) == m.shape[1]
        return np.array([np.linalg.norm(m[:, j], ord=o)
                         for j, o in enumerate(ord)])
    return np.linalg.norm(m, axis=0, ord=ord)


def scale_columns(m, scale_values):
    """Scale each column by the given value (reference:
    matrixtools.scale_columns)."""
    return np.asarray(m) * np.asarray(scale_values)[None, :]


def sign_fix_qr(q, r, tol=1e-6):
    """Flip signs of Q columns / R rows so each Q column's (first) largest-
    magnitude element is positive — removes QR sign ambiguity (reference:
    matrixtools.sign_fix_qr)."""
    qq = q.copy()
    rr = r.copy()
    for i in range(q.shape[1]):
        max_abs = max(np.abs(q[:, i]))
        k = np.argmax(np.abs(q[:, i]) > (max_abs - tol))
        if q[k, i] < 0.0:
            qq[:, i] = -q[:, i]
            rr[i, :] = -r[i, :]
    return qq, rr


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
    """Indices of a maximal linearly independent column subset, optionally
    relative to a base of known-independent columns (reference:
    matrixtools.independent_columns: project out the base with QR, then
    rank + pivoted QR pick the columns)."""
    m = np.asarray(m)
    if initial_independent_cols is None or np.asarray(initial_independent_cols).shape[1] == 0:
        proj_m = m.copy()
    else:
        base = np.asarray(initial_independent_cols)
        assert base.shape[0] == m.shape[0]
        q = spl.qr(base, mode='economic')[0]
        proj_m = m - q @ (q.T.conj() @ m)
    if proj_m.shape[1] == 0:
        return []
    rank = np.linalg.matrix_rank(proj_m, tol=tol)
    pivots = spl.qr(proj_m, overwrite_a=True, mode='raw', pivoting=True)[2]
    return pivots[:rank].tolist()


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
    ns = nice_nullspace(VW, tol) if use_nice_nullspace else nullspace(VW, tol)
    return np.asarray(space1) @ ns[:np.asarray(space1).shape[1], :]


def union_space(space1, space2, tol=1e-7):
    """Span of the union of two column spaces: the independent columns of
    their concatenation (reference: matrixtools.union_space)."""
    VW = np.concatenate([np.asarray(space1), np.asarray(space2)], axis=1)
    indep_cols = independent_columns(VW, None, tol)
    return VW[:, indep_cols]


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


# =============================================================================
# Reference-surface parity additions (reference: pygsti/tools/matrixtools.py).
# =============================================================================

def assert_hermitian(mat, tol):
    """Raise ValueError when `mat` is not Hermitian to tolerance `tol`
    (reference: matrixtools.assert_hermitian:94)."""
    err = np.abs(mat - mat.T.conj())
    if np.any(err > tol):
        raise ValueError("Input matrix is not Hermitian up to tolerance %g "
                         "(max |mat - mat^H| = %g)" % (tol, err.max()))


def assert_projector(mx, tol=1e-12):
    """Raise ValueError when `mx` is not an orthogonal projector
    (reference: matrixtools.assert_projector:134)."""
    if not is_projector(mx, tol):
        raise ValueError("Matrix is not an orthogonal projector to "
                         "tolerance %g" % tol)


def nullspace_qr(m, tol=1e-7):
    """Nullspace of `m` via the QR decomposition of m^T (columns of Q beyond
    rank(m) span null(m)); faster but less accurate than the SVD nullspace
    (reference: matrixtools.nullspace_qr:312)."""
    M, N = m.shape
    q, r = np.linalg.qr(np.asarray(m).T, mode='complete')  # q: [N, N]
    rank = int(np.sum(np.abs(np.diag(r)[:min(M, N)]) > tol))
    return q[:, rank:]


def prime_factors(n):
    """Prime factorization of `n` as a list with multiplicity (reference:
    matrixtools.prime_factors:1288)."""
    factors = []
    d = 2
    n = int(n)
    while d * d <= n:
        while n % d == 0:
            factors.append(d)
            n //= d
        d += 1
    if n > 1:
        factors.append(n)
    return factors


def safe_norm(a, part=None):
    """Frobenius norm of a dense array or scipy sparse matrix, optionally of
    its real/imag part only (reference: matrixtools.safe_norm:1666)."""
    import scipy.sparse as _sps
    if _sps.issparse(a):
        a = a.tocsr().data
    a = np.asarray(a)
    if part == 'real':
        a = a.real
    elif part == 'imag':
        a = a.imag
    return float(np.linalg.norm(a))


def sparse_equal(a, b, atol=1e-8):
    """Whether two scipy sparse matrices are (almost) equal (reference:
    matrixtools.sparse_equal:2122)."""
    import scipy.sparse as _sps
    if np.array_equal(a.shape, b.shape) is False:
        return False
    diff = (a - b).tocoo() if _sps.issparse(a) else np.asarray(a - b)
    if _sps.issparse(a):
        return bool(len(diff.data) == 0 or np.all(np.abs(diff.data) <= atol))
    return bool(np.all(np.abs(diff) <= atol))


def sparse_onenorm(a):
    """Induced 1-norm (max column abs sum) of a sparse or dense matrix
    (reference: matrixtools.sparse_onenorm:2150)."""
    import scipy.sparse as _sps
    if _sps.issparse(a):
        return float(np.max(np.abs(a).sum(axis=0)))
    return float(np.linalg.norm(np.asarray(a), 1))


def int64_parity(x):
    """Bit parity of an int64 (reference: matrixtools.int64_parity)."""
    x = int(x)
    return bin(x & 0xFFFFFFFFFFFFFFFF).count('1') % 2


def mx_to_string_complex(m, real_width=9, im_width=9, prec=4):
    """Pretty-format string for a complex matrix (reference:
    matrixtools.mx_to_string_complex:760)."""
    m = np.asarray(m)
    if m.ndim == 1:
        m = m[None, :]
    lines = []
    for row in m:
        lines.append(" ".join(
            "%*.*f%+*.*fj" % (real_width, prec, el.real, im_width, prec,
                              el.imag) for el in row))
    return "\n".join(lines) + "\n"


def near_identity_matrix_log(m, tol=1e-8):
    """Logarithm of a superoperator matrix near the identity; real when `m`
    is real (reference: matrixtools.near_identity_matrix_log:837).  Uses the
    principal matrix log, which lands on the branch nearest zero for
    near-identity inputs."""
    import scipy.linalg as _spl
    log_m = _spl.logm(np.asarray(m))
    if np.isrealobj(m):
        assert np.linalg.norm(log_m.imag) < tol, \
            "Near-identity matrix log has significant imaginary part!"
        return log_m.real
    return log_m


def minweight_match(a, b, metricfn=None, return_pairs=True,
                    pass_indices_to_metricfn=False):
    """Min-weight bipartite matching of the elements of `a` to `b`
    (linear-sum assignment; reference: matrixtools.minweight_match:1310).
    Returns the matched weights and (optionally) the index pairs."""
    from scipy.optimize import linear_sum_assignment
    assert len(a) == len(b)
    D = len(a)
    if metricfn is None:
        def metricfn(x, y):
            return abs(x - y)
    weight = np.empty((D, D), 'd')
    for i in range(D):
        for j in range(D):
            weight[i, j] = metricfn(i, j) if pass_indices_to_metricfn \
                else metricfn(a[i], b[j])
    rows, cols = linear_sum_assignment(weight)
    pairs = list(zip(rows, cols))
    if return_pairs:
        return weight[rows, cols], pairs
    return weight[rows, cols]


def minweight_match_realmxeigs(a, b, metricfn=None,
                               pass_indices_to_metricfn=False, eps=1e-9):
    """Match the eigenvalues of two real matrices so that conjugate pairs
    stay conjugate pairs (reference:
    matrixtools.minweight_match_realmxeigs:1378).  Returns (eigs_a, eigs_b)
    reordered so matched values align."""
    ev_a = np.linalg.eigvals(np.asarray(a))
    ev_b = np.linalg.eigvals(np.asarray(b))
    _, pairs = minweight_match(ev_a, ev_b, metricfn, True,
                               pass_indices_to_metricfn)
    # repair conjugacy: greedily enforce that if (i, j) matched then
    # (conj(i), conj(j)) are matched too
    pairs = dict(pairs)
    used_b = set(pairs.values())

    def conj_index(evals, i):
        if abs(evals[i].imag) < eps:
            return None
        target = np.conj(evals[i])
        cands = [k for k in range(len(evals))
                 if k != i and abs(evals[k] - target) < eps]
        return cands[0] if cands else None

    for i in list(pairs.keys()):
        ci = conj_index(ev_a, i)
        if ci is None or ci not in pairs:
            continue
        cj = conj_index(ev_b, pairs[i])
        if cj is not None and pairs[ci] != cj and cj in used_b:
            # swap to restore conjugate pairing
            other = next(k for k, v in pairs.items() if v == cj)
            pairs[other], pairs[ci] = pairs[ci], cj
    idx_a = sorted(pairs.keys())
    return ev_a[idx_a], ev_b[[pairs[i] for i in idx_a]]


def compute_kite(eigenvalues):
    """Block ("kite") structure of a sorted eigenvalue list: sizes of the
    degenerate blocks (reference: matrixtools.compute_kite)."""
    kite = []
    blk = 1
    for i in range(1, len(eigenvalues)):
        if np.isclose(eigenvalues[i], eigenvalues[i - 1]):
            blk += 1
        else:
            kite.append(blk)
            blk = 1
    kite.append(blk)
    return kite
