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
