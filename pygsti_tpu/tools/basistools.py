"""Basis-change utilities (reference: pygsti/tools/basistools.py).

Conventions (see baseobjs/basis.py): a state vector in basis B has components
x_i = Tr(B_i^dag rho); the 'std' basis vectorization is the row-major
flattening of rho; superoperators transform as S_to = M S_from M^{-1}.
"""

from __future__ import annotations

import numpy as np

from pygsti_tpu.baseobjs.basis import Basis


def _cast_pair(from_basis, to_basis, dim):
    return Basis.cast(from_basis, dim), Basis.cast(to_basis, dim)


def create_basis_pair(mx_or_dim, from_basis, to_basis):
    dim = mx_or_dim if isinstance(mx_or_dim, int) else np.asarray(mx_or_dim).shape[0]
    return _cast_pair(from_basis, to_basis, dim)


def change_basis(mx, from_basis, to_basis):
    """Convert a vector (len d**2) or superoperator matrix (d**2 x d**2)
    between operator bases."""
    mx = np.asarray(mx)
    dim = mx.shape[0]
    fb, tb = _cast_pair(from_basis, to_basis, dim)
    M = fb.create_transform_matrix(tb)  # x_to = M x_from
    if mx.ndim == 1:
        out = M @ mx
    else:
        out = M @ mx @ np.linalg.inv(M)
    if tb.real and np.allclose(out.imag, 0, atol=1e-10):
        out = out.real.copy()
    return out


def basis_matrices(name_or_basis, dim):
    """The element matrices of a basis (ndarray [size, d, d])."""
    return Basis.cast(name_or_basis, dim).elements


def basis_longname(basis):
    names = {'std': 'Matrix-unit', 'pp': 'Pauli-Product', 'PP': 'Pauli-Product (unnormalized)',
             'gm': 'Gell-Mann', 'qt': 'Qutrit'}
    name = basis if isinstance(basis, str) else basis.name
    return names.get(name, name)


def stdmx_to_vec(m, basis):
    """Density matrix (d x d) -> vector of components in `basis` (len d**2)."""
    m = np.asarray(m)
    d = m.shape[0]
    b = Basis.cast(basis, d * d)
    els = b.elements
    v = np.einsum('aij,ij->a', els.conj(), m)
    if b.real and np.allclose(v.imag, 0, atol=1e-10):
        v = v.real.copy()
    return v


def vec_to_stdmx(v, basis, keep_complex=False):
    """Vector of basis components -> density matrix (d x d)."""
    v = np.asarray(v)
    b = Basis.cast(basis, v.shape[0])
    m = np.einsum('a,aij->ij', v.astype(complex), b.elements)
    if not keep_complex and np.allclose(m.imag, 0, atol=1e-10):
        return m  # keep complex dtype like the reference (callers expect complex)
    return m


# Named convenience wrappers matching the reference's API
def stdmx_to_ppvec(m):
    return stdmx_to_vec(m, 'pp')


def stdmx_to_gmvec(m):
    return stdmx_to_vec(m, 'gm')


def stdmx_to_stdvec(m):
    return stdmx_to_vec(m, 'std')


def ppvec_to_stdmx(v):
    return vec_to_stdmx(v, 'pp')


def gmvec_to_stdmx(v):
    return vec_to_stdmx(v, 'gm')


def stdvec_to_stdmx(v):
    return vec_to_stdmx(v, 'std')


def basis_element_labels(basis, dim):
    """Labels of the elements of `basis` (reference:
    basistools.basis_element_labels)."""
    from pygsti_tpu.baseobjs.basis import Basis
    return tuple(Basis.cast(basis, dim).labels)


def create_basis_for_matrix(mx, basis):
    """A Basis object of `basis`'s type sized for the given matrix
    (reference: basistools.create_basis_for_matrix)."""
    from pygsti_tpu.baseobjs.basis import Basis
    d2 = np.asarray(mx).shape[0]
    return Basis.cast(basis, d2) if isinstance(basis, str) else basis


def state_to_stdmx(state_vec):
    """Pure state -> density matrix (std basis; reference:
    basistools.state_to_stdmx)."""
    v = np.asarray(state_vec).reshape(-1, 1)
    return v @ v.conj().T


def state_to_pauli_density_vec(state_vec):
    """Pure state -> pp-basis density vector (reference:
    basistools.state_to_pauli_density_vec)."""
    return stdmx_to_vec(state_to_stdmx(state_vec), 'pp')


def resize_std_mx(mx, resize, std_basis_1, std_basis_2):
    """Embed or contract a std-basis matrix between direct-sum structures
    (reference: basistools.resize_std_mx).  Only the simple
    equal-dimension case and zero-padded expand/contract are supported."""
    mx = np.asarray(mx)
    d1, d2 = std_basis_1.dim, std_basis_2.dim
    if d1 == d2:
        return mx.copy()
    if resize == 'expand':
        assert d2 > d1
        out = np.zeros((d2, d2), dtype=mx.dtype)
        out[:d1, :d1] = mx
        return out
    if resize == 'contract':
        assert d2 < d1
        return mx[:d2, :d2].copy()
    raise ValueError("resize must be 'expand' or 'contract'")


def flexible_change_basis(mx, start_basis, end_basis):
    """change_basis that tolerates differing dimensions by zero-padded
    embedding (reference: basistools.flexible_change_basis)."""
    from pygsti_tpu.baseobjs.basis import Basis
    mx = np.asarray(mx)
    d = mx.shape[0]
    sb = Basis.cast(start_basis, d) if isinstance(start_basis, str) else start_basis
    eb = Basis.cast(end_basis, d) if isinstance(end_basis, str) else end_basis
    if sb.dim == eb.dim:
        return change_basis(mx, sb, eb)
    mx2 = resize_std_mx(change_basis(mx, sb, 'std'),
                        'expand' if eb.dim > sb.dim else 'contract', sb, eb)
    return change_basis(mx2, 'std', eb)


def is_sparse_basis(name_or_basis):
    """Whether a basis (or basis name) uses sparse matrices (reference:
    basistools.is_sparse_basis).  All builtin bases here are dense."""
    return bool(getattr(name_or_basis, 'sparse', False))


def is_cvxpy_expression(obj):
    """Whether `obj` is a cvxpy expression (reference:
    basistools.is_cvxpy_expression).  cvxpy is an optional dependency the
    TPU build does not ship, so this is True only when cvxpy is importable
    AND `obj` is one of its Expression types."""
    try:
        import cvxpy
    except ImportError:
        return False
    return isinstance(obj, cvxpy.expressions.expression.Expression)


def resize_mx(mx, dim_or_block_dims=None, resize=None):
    """Expand a direct-sum block-space matrix into the full embedding space
    or contract it back (reference: basistools.resize_mx:402 /
    resize_std_mx:328).  Implemented exactly as the reference does: through
    the direct-sum std basis's to/from-elementstd transform matrices."""
    import numpy as _np
    from pygsti_tpu.baseobjs.basis import BuiltinBasis, DirectSumBasis
    if dim_or_block_dims is None:
        return mx
    if isinstance(dim_or_block_dims, int):
        dim_or_block_dims = (dim_or_block_dims,)
    ds = DirectSumBasis([BuiltinBasis('std', d * d)
                         for d in dim_or_block_dims])
    T = ds.to_elementstd_transform_matrix()       # [big^2, small^2]
    F = T.conj().T                                 # dual (elements orthonormal)
    mx = _np.asarray(mx)
    if resize == 'expand':
        return T @ mx @ F
    if resize == 'contract':
        return F @ mx @ T
    raise ValueError("resize must be 'expand' or 'contract'")
