"""Operation (gate) parameterizations as pure functions.

Functional re-expression of the reference's operation zoo
(pygsti/modelmembers/operations/, ~13k LoC): each class provides
``to_dense_jax(v)`` mapping its own parameter vector to a dense
superoperator matrix (in the model's basis, typically 'pp').

Derivatives come from jax.jacfwd, replacing all hand-written
``deriv_wrt_params`` plumbing in the reference.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pygsti_tpu.modelmembers.modelmember import ModelMember
from pygsti_tpu.baseobjs.statespace import StateSpace
from pygsti_tpu.tools import optools as _ot


class LinearOperator(ModelMember):
    """Base class for operations; dense rep is a (dim, dim) superop matrix."""

    def __init__(self, dim, initial_paramvals=None):
        super().__init__(initial_paramvals)
        self._dim = dim

    @property
    def dim(self):
        return self._dim

    def acton(self, state_vec):
        return self.to_dense() @ np.asarray(state_vec)


class StaticArbitraryOp(LinearOperator):
    """A fixed (0-parameter) superoperator matrix
    (reference: operations/staticarbitraryop.py)."""

    def __init__(self, mx):
        mx = np.asarray(mx, dtype=float)
        super().__init__(mx.shape[0], np.empty(0))
        self._mx = mx

    def to_dense_jax(self, v):
        return jnp.asarray(self._mx)

    def to_dense(self, on_space='minimal'):
        return self._mx.copy()

    def transform_inplace(self, s, sinv):
        self._mx = sinv @ self._mx @ s

    def _to_nice_serialization(self):
        return {'mx': self._mx}

    @classmethod
    def _from_nice_serialization(cls, state):
        return cls(np.asarray(state['mx']))


class StaticUnitaryOp(StaticArbitraryOp):
    """A fixed superoperator built from a unitary (reference:
    operations/staticunitaryop.py)."""

    def __init__(self, unitary, basis='pp'):
        self.unitary = np.asarray(unitary, dtype=complex)
        super().__init__(_ot.unitary_to_superop(self.unitary, basis))

    def to_unitary_jax(self, v):
        """Complex unitary action on state vectors (statevec evotype path;
        reference: evotypes/statevec opreps)."""
        return jnp.asarray(self.unitary)


class StaticStandardOp(StaticUnitaryOp):
    """A fixed superoperator for a named standard gate (reference:
    operations/staticstdop.py)."""

    def __init__(self, name, basis='pp'):
        from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
        self.name = name
        super().__init__(standard_gatename_unitaries()[name], basis)


class FullArbitraryOp(LinearOperator):
    """Fully parameterized superoperator: every matrix element is a parameter
    (reference: operations/fullarbitraryop.py)."""

    def __init__(self, mx):
        mx = np.asarray(mx, dtype=float)
        super().__init__(mx.shape[0], mx.reshape(-1).copy())

    def _to_nice_serialization(self):
        return {'mx': self.to_dense()}

    @classmethod
    def _from_nice_serialization(cls, state):
        return cls(np.asarray(state['mx']))

    def to_dense_jax(self, v):
        d = self._dim
        return v.reshape(d, d)

    def transform_inplace(self, s, sinv):
        d = self._dim
        mx = sinv @ self._paramvals.reshape(d, d) @ s
        self._paramvals = mx.reshape(-1)


class FullTPOp(LinearOperator):
    """Trace-preserving superop: first row fixed to [1,0,...,0]; remaining
    rows are parameters (reference: operations/fulltpop.py)."""

    def __init__(self, mx):
        mx = np.asarray(mx, dtype=float)
        d = mx.shape[0]
        assert np.allclose(mx[0], np.eye(d)[0], atol=1e-8), \
            "Initial matrix is not trace-preserving (first row != e0)"
        super().__init__(d, mx[1:, :].reshape(-1).copy())

    def to_dense_jax(self, v):
        d = self._dim
        first_row = jnp.zeros((1, d), dtype=v.dtype).at[0, 0].set(1.0)
        return jnp.concatenate([first_row, v.reshape(d - 1, d)], axis=0)

    def _to_nice_serialization(self):
        return {'mx': self.to_dense()}

    @classmethod
    def _from_nice_serialization(cls, state):
        return cls(np.asarray(state['mx']))

    def transform_inplace(self, s, sinv):
        d = self._dim
        mx = np.asarray(self.to_dense())
        mx = sinv @ mx @ s
        assert np.allclose(mx[0], np.eye(d)[0], atol=1e-6), "Gauge transform broke TP"
        mx[0] = np.eye(d)[0]  # clean numerical noise
        self._paramvals = mx[1:, :].reshape(-1)


class FullUnitaryOp(LinearOperator):
    """Superoperator constrained to be unitary: parameterized by a Hermitian
    generator H via U = expm(-iH) (reference: operations/fullunitaryop.py
    uses the same manifold with different coordinates)."""

    def __init__(self, unitary, basis='pp'):
        u = np.asarray(unitary, dtype=complex)
        self.udim = u.shape[0]
        self.basis = basis
        import scipy.linalg as spl
        h = 1j * spl.logm(u)
        h = (h + h.conj().T) / 2
        params = _hermitian_to_real_params(h)
        super().__init__(self.udim ** 2, params)
        from pygsti_tpu.baseobjs.basis import Basis
        b = Basis.cast(basis, self.udim ** 2)
        self._basis_els = np.asarray(b.elements)
        M = b.create_transform_matrix('std')
        # numpy constants (eager complex device_put hangs remote TPUs)
        self._std2basis = np.linalg.inv(M)
        self._basis2std = np.asarray(M)

    def to_dense_jax(self, v):
        h = _real_params_to_hermitian_jax(v, self.udim)
        u = jax.scipy.linalg.expm(-1j * h)
        s_std = jnp.kron(u, u.conj())
        out = self._std2basis @ s_std @ self._basis2std
        return jnp.real(out)

    def to_unitary_jax(self, v):
        """Complex unitary (statevec evotype path)."""
        h = _real_params_to_hermitian_jax(v, self.udim)
        return jax.scipy.linalg.expm(-1j * h)


def _hermitian_to_real_params(h):
    """Hermitian (d,d) -> real param vector (d*d): diag, then (re,im) upper."""
    d = h.shape[0]
    params = list(np.real(np.diag(h)))
    for i in range(d):
        for j in range(i + 1, d):
            params.append(np.real(h[i, j]))
            params.append(np.imag(h[i, j]))
    return np.array(params)


def _real_params_to_hermitian_jax(v, d):
    h = jnp.zeros((d, d), dtype=jnp.complex128 if v.dtype == jnp.float64 else jnp.complex64)
    h = h + jnp.diag(v[:d].astype(h.dtype))
    k = d
    for i in range(d):
        for j in range(i + 1, d):
            val = v[k] + 1j * v[k + 1]
            h = h.at[i, j].add(val)
            h = h.at[j, i].add(jnp.conj(val))
            k += 2
    return h


class ComposedOp(LinearOperator):
    """Composition of factor operations; matches the reference convention
    (operations/composedop.py): factors are applied left-to-right in circuit
    order, so dense = F_{n-1} @ ... @ F_1 @ F_0."""

    def __init__(self, factors):
        self.factors = list(factors)
        dim = self.factors[0].dim
        super().__init__(dim, np.empty(0))

    @property
    def num_params(self):
        return sum(f.num_params for f in self.factors)

    def to_vector(self):
        return np.concatenate([f.to_vector() for f in self.factors]) \
            if self.factors else np.empty(0)

    def from_vector(self, v, close=False, dirty_value=True):
        off = 0
        for f in self.factors:
            n = f.num_params
            f.from_vector(v[off:off + n])
            off += n

    def to_dense_jax(self, v):
        mx = None
        off = 0
        for f in self.factors:
            n = f.num_params
            fm = f.to_dense_jax(v[off:off + n])
            mx = fm if mx is None else fm @ mx
            off += n
        return mx

    def to_dense(self, on_space='minimal'):
        mx = None
        for f in self.factors:
            fm = f.to_dense()
            mx = fm if mx is None else fm @ mx
        return mx

    def _errorgen_factors(self):
        return [f for f in self.factors
                if hasattr(f, 'errorgen_coefficient_labels')]

    def errorgen_coefficient_labels(self):
        labels = []
        for f in self._errorgen_factors():
            labels.extend(f.errorgen_coefficient_labels())
        return labels

    def errorgen_coefficients(self, return_basis=False, logscale_nonham=False):
        out = {}
        for f in self._errorgen_factors():
            out.update(f.errorgen_coefficients())
        return out

    def set_errorgen_coefficients(self, coeff_dict, truncate=False):
        for f in self._errorgen_factors():
            f.set_errorgen_coefficients(coeff_dict, truncate)


class RepeatedOp(LinearOperator):
    """op^k (reference: operations/repeatedop.py)."""

    def __init__(self, op, num_copies):
        self.repeated_op = op
        self.num_copies = num_copies
        super().__init__(op.dim, np.empty(0))

    @property
    def num_params(self):
        return self.repeated_op.num_params

    def to_vector(self):
        return self.repeated_op.to_vector()

    def from_vector(self, v, close=False, dirty_value=True):
        self.repeated_op.from_vector(v)

    def to_dense_jax(self, v):
        m = self.repeated_op.to_dense_jax(v)
        return jnp.linalg.matrix_power(m, self.num_copies)


class EmbeddedOp(LinearOperator):
    """Embed an operation acting on a subset of tensor factors into the full
    state space (reference: operations/embeddedop.py).

    In a tensor-product basis (pp), the full superop index is a multi-index
    over per-factor superop indices; the embedded op acts on the target
    factors' indices and as the identity elsewhere.
    """

    def __init__(self, state_space, target_labels, op_to_embed):
        state_space = StateSpace.cast(state_space)
        self.state_space = state_space
        self.target_labels = tuple(target_labels)
        self.embedded_op = op_to_embed
        dim = state_space.dim
        super().__init__(dim, np.empty(0))

        # Precompute the axis permutation: full space = (target factors in
        # order) x (other factors); we build kron(embedded, I_rest) and
        # permute axes back to the state space's factor order.
        factor_dims = [d * d for d in state_space.tensor_product_block_dims]
        labels = list(state_space.tensor_product_block_labels)
        tgt_pos = [labels.index(t) for t in self.target_labels]
        other_pos = [i for i in range(len(labels)) if i not in tgt_pos]
        self._perm_src = tgt_pos + other_pos  # source axis order of the kron
        self._factor_dims = factor_dims
        self._rest_dim = int(np.prod([factor_dims[i] for i in other_pos])) \
            if other_pos else 1
        # inverse permutation: position in kron-product for each target axis
        nf = len(labels)
        inv = [0] * nf
        for newpos, srcpos in enumerate(self._perm_src):
            inv[srcpos] = newpos
        self._inv_perm = inv
        self._nf = nf

    @property
    def num_params(self):
        return self.embedded_op.num_params

    def to_vector(self):
        return self.embedded_op.to_vector()

    def from_vector(self, v, close=False, dirty_value=True):
        self.embedded_op.from_vector(v)

    def _embed(self, emb_mx, xp):
        nf = self._nf
        if nf == len(self.target_labels):
            return emb_mx
        rest = xp.eye(self._rest_dim, dtype=emb_mx.dtype)
        full = xp.kron(emb_mx, rest)
        # reshape to 2*nf axes in (kron source) order, permute to state-space order
        src_dims = [self._factor_dims[i] for i in self._perm_src]
        full = full.reshape(src_dims + src_dims)
        perm = self._inv_perm
        axes = perm + [p + nf for p in perm]
        full = xp.transpose(full, axes)
        d = self._dim
        return full.reshape(d, d)

    def to_dense_jax(self, v):
        return self._embed(self.embedded_op.to_dense_jax(v), jnp)

    def to_dense(self, on_space='minimal'):
        return np.asarray(self._embed(np.asarray(self.embedded_op.to_dense()), np))


class LindbladErrorgen(ModelMember):
    """Lindblad error generator parameterized by coefficient blocks
    (reference: operations/lindbladerrorgen.py + lindbladcoefficients.py).

    Blocks:
      'ham'            -- coefficients of H-type elementary generators (real)
      'other_diag'     -- diagonal S-type coefficients; param_mode 'elements'
                          (may go negative -> GLND) or 'cholesky' (coeff =
                          theta^2 >= 0 -> CPTP)
      'other'          -- full generalized-Lindblad block M_ij; param_mode
                          'elements' (Hermitian M) or 'cholesky' (M = L L^dag,
                          PSD -> CPTP)
    """

    def __init__(self, dim, blocks, basis='pp'):
        self.blocks = blocks  # list of LindbladCoefficientBlock
        self._dim = dim
        pv = np.concatenate([b.initial_params for b in blocks]) if blocks else np.empty(0)
        super().__init__(pv)

    @property
    def dim(self):
        return self._dim

    @classmethod
    def from_elementary_errorgens(cls, elementary_errorgens, basis='pp', state_space=None,
                                  parameterization='GLND'):
        raise NotImplementedError("use build_lindblad_errorgen")

    def to_dense_jax(self, v):
        out = jnp.zeros((self._dim, self._dim))
        off = 0
        for b in self.blocks:
            n = b.num_params
            out = out + b.errorgen_jax(v[off:off + n])
            off += n
        return out

    def coefficients(self):
        """Dict of (type, basis-label(s)) -> coefficient value at current params."""
        out = {}
        off = 0
        for b in self.blocks:
            n = b.num_params
            out.update(b.coefficients(self._paramvals[off:off + n]))
            off += n
        return out

    def errorgen_coefficient_labels(self):
        """LocalElementaryErrorgenLabel list, ham + diag-stochastic blocks
        (reference: lindbladerrorgen.coefficient_labels); 'other' (C/A)
        blocks are not included."""
        from pygsti_tpu.baseobjs.errorgenlabel import LocalElementaryErrorgenLabel
        labels = []
        for b in self.blocks:
            if b.block_type == 'ham':
                labels.extend(LocalElementaryErrorgenLabel('H', (str(l),))
                              for l in b.basis_element_labels)
            elif b.block_type == 'other_diag':
                labels.extend(LocalElementaryErrorgenLabel('S', (str(l),))
                              for l in b.basis_element_labels)
        return labels

    def errorgen_coefficients(self, return_basis=False, logscale_nonham=False):
        from pygsti_tpu.baseobjs.errorgenlabel import LocalElementaryErrorgenLabel
        out = {}
        for (typ, *bels), val in self.coefficients().items():
            if typ in ('H', 'S'):
                out[LocalElementaryErrorgenLabel(typ, tuple(str(b) for b in bels))] = val
        return out

    def set_errorgen_coefficients(self, coeff_dict, truncate=False):
        """Set H/S coefficients from {LocalElementaryErrorgenLabel: value}
        (reference: lindbladerrorgen.set_coefficients)."""
        from pygsti_tpu.baseobjs.errorgenlabel import (
            GlobalElementaryErrorgenLabel, LocalElementaryErrorgenLabel)
        n_qubits = int(round(np.log2(np.sqrt(self._dim))))
        all_sslbls = tuple(range(n_qubits))
        lookup = {}
        for lbl, val in coeff_dict.items():
            if isinstance(lbl, GlobalElementaryErrorgenLabel):
                lbl = LocalElementaryErrorgenLabel.cast(lbl, all_sslbls)
            elif not isinstance(lbl, LocalElementaryErrorgenLabel):
                lbl = LocalElementaryErrorgenLabel(
                    lbl[0], tuple(lbl[1:]) if len(lbl) > 2 else (lbl[1],))
            lookup[(lbl.errorgen_type, lbl.basis_element_labels[0])] = val
        off = 0
        pv = self._paramvals.copy()
        for b in self.blocks:
            n = b.num_params
            if b.block_type in ('ham', 'other_diag'):
                typ = 'H' if b.block_type == 'ham' else 'S'
                cur = np.asarray(b.coefficient_matrix_jax(jnp.asarray(pv[off:off + n])))
                new = np.array([lookup.get((typ, str(l)), cur[i])
                                for i, l in enumerate(b.basis_element_labels)], float)
                if b.block_type == 'other_diag' and b.param_mode == 'cholesky':
                    if not truncate and np.any(new < -1e-12):
                        raise ValueError("Negative S coefficient in CPTP-constrained block")
                    pv[off:off + n] = np.sqrt(np.clip(new, 0, None))
                else:
                    pv[off:off + n] = new
            off += n
        self.from_vector(pv)


class LindbladCoefficientBlock(object):
    """One block of Lindblad coefficients with its generator tensors."""

    def __init__(self, block_type, basis_element_labels, generators, param_mode='elements',
                 initial_coeffs=None):
        """generators: ndarray [n_coeff_basis, dim, dim] of elementary errorgen
        superops for 'ham'/'other_diag'; for 'other', [n, n, dim, dim] of
        O_ij = A_i rho A_j^dag - ... pair generators."""
        self.block_type = block_type
        self.basis_element_labels = list(basis_element_labels)
        self.param_mode = param_mode
        self._gens = jnp.asarray(generators)
        n = len(basis_element_labels)
        self._n = n
        if block_type in ('ham', 'other_diag'):
            coeffs = np.zeros(n) if initial_coeffs is None else np.asarray(initial_coeffs, float)
            if param_mode == 'cholesky' and block_type == 'other_diag':
                self.initial_params = np.sqrt(np.clip(coeffs, 0, None))
            else:
                self.initial_params = coeffs.copy()
        elif block_type == 'other':
            M = np.zeros((n, n), dtype=complex) if initial_coeffs is None \
                else np.asarray(initial_coeffs, complex)
            if param_mode == 'cholesky':
                # M = L L^dag; params = real diag + (re, im) lower off-diag of L
                try:
                    L = np.linalg.cholesky(M + 1e-14 * np.eye(n))
                except np.linalg.LinAlgError:
                    L = np.zeros((n, n), dtype=complex)
                self.initial_params = _lower_tri_to_params(L, n)
            else:
                self.initial_params = _hermitian_to_params(M, n)
        else:
            raise ValueError("Invalid block type %r" % block_type)

    @property
    def num_params(self):
        if self.block_type in ('ham', 'other_diag'):
            return self._n
        return self._n * self._n

    def coefficient_matrix_jax(self, v):
        n = self._n
        if self.block_type == 'ham':
            return v
        if self.block_type == 'other_diag':
            return v * v if self.param_mode == 'cholesky' else v
        if self.param_mode == 'cholesky':
            L = _params_to_lower_tri_jax(v, n)
            return L @ L.conj().T
        return _params_to_hermitian_jax(v, n)

    def errorgen_jax(self, v):
        coeffs = self.coefficient_matrix_jax(v)
        if self.block_type in ('ham', 'other_diag'):
            return jnp.tensordot(coeffs, jnp.real(self._gens), axes=([0], [0]))
        out = jnp.tensordot(coeffs, self._gens, axes=([0, 1], [0, 1]))
        return jnp.real(out)

    def coefficients(self, v):
        import numpy as _np
        cm = _np.asarray(self.coefficient_matrix_jax(jnp.asarray(v)))
        out = {}
        if self.block_type == 'ham':
            for lbl, c in zip(self.basis_element_labels, cm):
                out[('H', lbl)] = float(c)
        elif self.block_type == 'other_diag':
            for lbl, c in zip(self.basis_element_labels, cm):
                out[('S', lbl)] = float(c)
        else:
            for i, li in enumerate(self.basis_element_labels):
                for j, lj in enumerate(self.basis_element_labels):
                    out[('O', li, lj)] = complex(cm[i, j])
        return out


def _hermitian_to_params(M, n):
    params = list(np.real(np.diag(M)))
    for i in range(n):
        for j in range(i + 1, n):
            params.append(np.real(M[i, j]))
            params.append(np.imag(M[i, j]))
    return np.array(params)


def _params_to_hermitian_jax(v, n):
    return _real_params_to_hermitian_jax(v, n)


def _lower_tri_to_params(L, n):
    params = list(np.real(np.diag(L)))
    for i in range(n):
        for j in range(i):
            params.append(np.real(L[i, j]))
            params.append(np.imag(L[i, j]))
    return np.array(params)


def _params_to_lower_tri_jax(v, n):
    L = jnp.zeros((n, n), dtype=jnp.complex128 if v.dtype == jnp.float64 else jnp.complex64)
    L = L + jnp.diag(v[:n].astype(L.dtype))
    k = n
    for i in range(n):
        for j in range(i):
            L = L.at[i, j].set(v[k] + 1j * v[k + 1])
            k += 2
    return L


def build_lindblad_errorgen(basis, parameterization='GLND', dim=None, initial_coeffs=None,
                            max_weight=None):
    """Construct a LindbladErrorgen over all non-identity elements of `basis`.

    parameterization: 'H' (ham only), 'H+S' / 'H+s' (ham + diag stochastic;
    capital S = CPTP-constrained), 'GLND' (ham + full hermitian block,
    unconstrained), 'CPTPLND' (ham + full cholesky block, CPTP).
    Matches reference naming (lindbladerrorgen.py LindbladParameterization).
    `max_weight` restricts to basis elements of Pauli weight <= max_weight
    (the reference's cloud-noise weight restriction).
    """
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.tools import lindbladtools as _lt
    from pygsti_tpu.tools.basistools import change_basis

    b = basis if isinstance(basis, Basis) else Basis.cast(basis, dim)
    els = b.elements
    d2 = b.dim
    nonid = list(range(1, els.shape[0]))
    if max_weight is not None:
        # weight = number of non-'I' characters in the pp-basis label
        nonid = [i for i in nonid
                 if sum(1 for ch in b.labels[i] if ch != 'I') <= max_weight]
    lbls = [b.labels[i] for i in nonid]
    init = initial_coeffs or {}

    blocks = []
    if parameterization in ('H', 'H+S', 'H+s', 'GLND', 'CPTPLND'):
        ham_gens = np.stack([
            np.real(change_basis(_lt.create_elementary_errorgen('H', els[i]), 'std', b))
            for i in nonid])
        ham_coeffs = np.array([init.get(('H', l), 0.0) for l in lbls])
        blocks.append(LindbladCoefficientBlock('ham', lbls, ham_gens, 'elements', ham_coeffs))
    if parameterization in ('H+S', 'H+s', 'S', 's'):
        s_gens = np.stack([
            np.real(change_basis(_lt.create_elementary_errorgen('S', els[i]), 'std', b))
            for i in nonid])
        mode = 'cholesky' if 'S' in parameterization else 'elements'
        s_coeffs = np.array([init.get(('S', l), 0.0) for l in lbls])
        blocks.append(LindbladCoefficientBlock('other_diag', lbls, s_gens, mode, s_coeffs))
    if parameterization in ('GLND', 'CPTPLND'):
        n = len(nonid)
        pair_gens = np.empty((n, n, d2, d2), dtype=complex)
        for a, i in enumerate(nonid):
            for c, j in enumerate(nonid):
                g = _lt.create_lindbladian_term_errorgen('O', els[i], els[j])
                pair_gens[a, c] = change_basis(g, 'std', b)
        mode = 'cholesky' if parameterization == 'CPTPLND' else 'elements'
        M0 = np.zeros((n, n), dtype=complex)
        for a, li in enumerate(lbls):
            if ('S', li) in init:
                M0[a, a] = init[('S', li)]
        blocks.append(LindbladCoefficientBlock('other', lbls, pair_gens, mode, M0))
    return LindbladErrorgen(d2, blocks, b)


class ExpErrorgenOp(LinearOperator):
    """exp(L) for an error generator L (reference:
    operations/experrorgenop.py)."""

    def __init__(self, errorgen):
        self.errorgen = errorgen
        super().__init__(errorgen.dim, np.empty(0))

    @property
    def num_params(self):
        return self.errorgen.num_params

    def to_vector(self):
        return self.errorgen.to_vector()

    def from_vector(self, v, close=False, dirty_value=True):
        self.errorgen.from_vector(v)

    def to_dense_jax(self, v):
        return jax.scipy.linalg.expm(self.errorgen.to_dense_jax(v))

    def errorgen_coefficient_labels(self):
        return self.errorgen.errorgen_coefficient_labels()

    def errorgen_coefficients(self, return_basis=False, logscale_nonham=False):
        return self.errorgen.errorgen_coefficients()

    def set_errorgen_coefficients(self, coeff_dict, truncate=False):
        self.errorgen.set_errorgen_coefficients(coeff_dict, truncate)


class DepolarizeOp(LinearOperator):
    """Depolarizing channel with one rate parameter; basis-independent form:
    diag(1, w, w, ..., w) in any unital basis with identity-first
    (reference: operations/depolarizeop.py).  param_mode 'depol' squares the
    parameter so the rate stays >= 0."""

    def __init__(self, dim, initial_rate=0.0, param_mode='depol'):
        self.param_mode = param_mode
        p0 = np.sqrt(initial_rate) if param_mode == 'depol' else initial_rate
        super().__init__(dim, np.array([p0]))

    def to_dense_jax(self, v):
        rate = v[0] ** 2 if self.param_mode == 'depol' else v[0]
        d = self._dim
        w = 1.0 - rate
        diag = jnp.concatenate([jnp.ones(1, dtype=v.dtype), w * jnp.ones(d - 1, dtype=v.dtype)])
        return jnp.diag(diag)


class StochasticNoiseOp(LinearOperator):
    """Pauli-stochastic channel: rates r_i for each non-identity basis element
    (reference: operations/stochasticop.py); rates = params^2 (CPTP)."""

    def __init__(self, dim, basis='pp', initial_rates=None):
        from pygsti_tpu.baseobjs.basis import Basis
        from pygsti_tpu.tools import lindbladtools as _lt
        from pygsti_tpu.tools.basistools import change_basis
        b = Basis.cast(basis, dim)
        els = b.elements
        n = els.shape[0] - 1
        rates = np.zeros(n) if initial_rates is None else np.asarray(initial_rates, float)
        super().__init__(dim, np.sqrt(np.clip(rates, 0, None)))
        # channel: rho -> (1 - sum r) rho + sum_i r_i d * B_i rho B_i  (B normalized)
        d_udim = els.shape[1]
        self._unit_super = jnp.asarray(np.stack([
            np.real(change_basis(np.kron(els[i] * np.sqrt(d_udim),
                                         (els[i] * np.sqrt(d_udim)).conj()), 'std', b))
            for i in range(1, n + 1)]))

    def to_dense_jax(self, v):
        rates = v * v
        total = jnp.sum(rates)
        eye = jnp.eye(self._dim)
        return (1.0 - total) * eye + jnp.tensordot(rates, self._unit_super, axes=([0], [0]))


class LinearTimeDriftOp(LinearOperator):
    """Time-dependent operation: G(t) = expm(t * L_drift) @ G_base
    (the reference's time-dependent-GST pattern of linearly-parameterized
    ops with time; cf. timedep tests in pygsti and
    forwardsims bulk_fill_timedep_*).

    Parameters = base-op params followed by drift-errorgen params; the
    time-dependent dense rep comes from ``to_dense_jax_t(v, t)``.
    """

    def __init__(self, base_op, drift_errorgen):
        self.base_op = base_op
        self.drift_errorgen = drift_errorgen
        super().__init__(base_op.dim, np.empty(0))

    @property
    def num_params(self):
        return self.base_op.num_params + self.drift_errorgen.num_params

    def to_vector(self):
        return np.concatenate([self.base_op.to_vector(),
                               self.drift_errorgen.to_vector()])

    def from_vector(self, v, close=False, dirty_value=True):
        nb = self.base_op.num_params
        self.base_op.from_vector(v[:nb])
        self.drift_errorgen.from_vector(v[nb:])

    def to_dense_jax(self, v):
        return self.to_dense_jax_t(v, 0.0)

    def to_dense_jax_t(self, v, t):
        nb = self.base_op.num_params
        base = self.base_op.to_dense_jax(v[:nb])
        L = self.drift_errorgen.to_dense_jax(v[nb:])
        return jax.scipy.linalg.expm(t * L) @ base


class EigenvalueParamDenseOp(LinearOperator):
    """A real operation matrix parameterized only by its eigenvalues
    (reference: operations/eigpdenseop.py:24 EigenvalueParamDenseOp).

    The matrix is eigendecomposed once at construction; the eigenvector
    frame ``B`` is then frozen and the (real, or conjugate-pair) eigenvalues
    become the parameters.  Used by per-germ-power fiducial pair reduction.
    Parameters: one per real eigenvalue; (re, im) per complex-conjugate pair.
    With ``tp_constrained_and_unital=True`` the unit eigenvalue belonging to
    the eigenvector closest to [1,0,...,0] is held fixed.
    """

    def __init__(self, matrix, include_off_diags_in_degen_blocks=False,
                 tp_constrained_and_unital=False):
        mx = np.asarray(matrix)
        assert np.linalg.norm(np.imag(mx)) < 1e-7, "matrix must be real"
        mx = np.real(mx).astype(float)
        d = mx.shape[0]
        evals, B = np.linalg.eig(mx)

        # classify eigenvalues: real vs conjugate pairs
        used = np.zeros(len(evals), bool)
        real_idx, pair_idx = [], []
        for i, ev in enumerate(evals):
            if used[i]:
                continue
            if abs(ev.imag) < 1e-10:
                real_idx.append(i); used[i] = True
            else:
                # find the conjugate partner
                j = None
                for k in range(i + 1, len(evals)):
                    if not used[k] and abs(evals[k] - np.conj(ev)) < 1e-8:
                        j = k; break
                assert j is not None, "complex eigenvalue without conjugate pair"
                pair_idx.append((i, j)); used[i] = used[j] = True

        fixed_idx = None
        if tp_constrained_and_unital:
            unit_row = np.zeros(d); unit_row[0] = 1.0
            assert np.allclose(mx[0, :], unit_row) and np.allclose(mx[:, 0], unit_row), \
                "matrix must be TP and unital"
            # the real unit eigenvalue whose eigenvector is closest to e0
            cands = [i for i in real_idx if abs(evals[i] - 1.0) < 1e-8]
            assert cands, "TP-constrained matrix must have a unit eigenvalue"
            fixed_idx = max(cands, key=lambda i: abs(B[0, i]))
            B[:, fixed_idx] = unit_row
            real_idx = [i for i in real_idx if i != fixed_idx]

        params = [evals[i].real for i in real_idx]
        for (i, j) in pair_idx:
            params.extend([evals[i].real, evals[i].imag])

        super().__init__(d, np.asarray(params, float))
        self._B = B.astype(complex)
        self._Binv = np.linalg.inv(B).astype(complex)
        self._real_idx = np.asarray(real_idx, np.int32)
        self._pair_idx = pair_idx
        self._fixed_idx = fixed_idx
        self._fixed_val = complex(evals[fixed_idx]) if fixed_idx is not None else None
        self._n_evals = len(evals)

    def to_dense_jax(self, v):
        evals = jnp.zeros(self._n_evals, dtype=jnp.complex128
                          if v.dtype == jnp.float64 else jnp.complex64)
        if self._fixed_idx is not None:
            evals = evals.at[self._fixed_idx].set(self._fixed_val)
        nr = len(self._real_idx)
        if nr:
            evals = evals.at[jnp.asarray(self._real_idx)].set(
                v[:nr].astype(evals.dtype))
        for k, (i, j) in enumerate(self._pair_idx):
            lam = v[nr + 2 * k] + 1j * v[nr + 2 * k + 1]
            evals = evals.at[i].set(lam).at[j].set(jnp.conj(lam))
        return jnp.real(self._B @ (evals[:, None] * self._Binv))


class LinearlyParamArbitraryOp(LinearOperator):
    """Matrix whose elements depend linearly on the parameters
    (reference: operations/lpdenseop.py:56 LinearlyParamArbitraryOp).

    ``dense = left @ (base + sum_p v[p] * M_p) @ right`` where each ``M_p``
    has ones at the coordinates mapped to parameter p.
    """

    def __init__(self, base_matrix, parameter_array, parameter_to_base_indices_map,
                 left_transform=None, right_transform=None, real=True):
        base = np.asarray(base_matrix, complex)
        d = base.shape[0]
        nP = len(parameter_array)
        masks = np.zeros((nP, d, d), complex)
        for p, ij_tuples in parameter_to_base_indices_map.items():
            for (i, j) in ij_tuples:
                masks[p, i, j] = 1.0
        super().__init__(d, np.asarray(parameter_array, float))
        self._base = np.asarray(base)
        self._masks = np.asarray(masks)
        self._left = np.asarray(left_transform if left_transform is not None
                                 else np.eye(d))
        self._right = np.asarray(right_transform if right_transform is not None
                                  else np.eye(d))
        self._real = real

    def to_dense_jax(self, v):
        mx = self._base + jnp.tensordot(v.astype(self._masks.dtype),
                                        self._masks, axes=1)
        out = self._left @ mx @ self._right
        return jnp.real(out) if self._real else out


class AffineShiftOp(LinearOperator):
    """Identity plus an affine shift: ones on the diagonal, parameters in the
    first column (rows 1..d-1) (reference: operations/affineshiftop.py:20).
    """

    def __init__(self, m):
        mx = np.asarray(m, float)
        d = mx.shape[0]
        if not (np.allclose(np.diag(mx), 1)
                and np.allclose((mx - np.eye(d))[:, 1:], 0.0)):
            raise ValueError("AffineShiftOp requires arrowhead structure "
                             "(unit diagonal, off-diagonals only in column 0)")
        super().__init__(d, mx[1:, 0].copy())

    def to_dense_jax(self, v):
        d = self._dim
        return jnp.eye(d, dtype=v.dtype).at[1:, 0].set(v)

    def set_dense(self, m):
        mx = np.asarray(m, float)
        d = self._dim
        if not (np.allclose(np.diag(mx), 1)
                and np.allclose((mx - np.eye(d))[:, 1:], 0.0)):
            raise ValueError("matrix does not have the arrowhead structure")
        self._paramvals = mx[1:, 0].copy()


class FullCPTPOp(LinearOperator):
    """CP(TP)-by-construction channel parameterized by the Cholesky factor of
    its trace-normalized Choi matrix (reference: operations/fullcptpop.py:30
    FullCPTPOp).

    params = (real diag, (re, im) lower-tri) of L; the dense superoperator is
    the inverse Jamiolkowski image of ``L L^dag / tr(L L^dag)``.  Because the
    Choi matrix is PSD by construction the operation stays CP for every
    parameter value, making it safe for unconstrained (device-LM) optimization.
    """

    def __init__(self, choi_mx, basis='pp', truncate=False):
        choi = np.asarray(choi_mx, complex)
        d = choi.shape[0]
        trc = np.trace(choi).real
        if not np.isclose(trc, 1.0):
            assert truncate, "choi_mx must have trace 1 (or truncate=True)"
            choi = choi - np.eye(d) / d * (trc - 1.0)
        evals, U = np.linalg.eigh((choi + choi.conj().T) / 2)
        assert truncate or all(ev >= -1e-12 for ev in evals), \
            "choi_mx must be PSD (or truncate=True)"
        choi = (U * evals.clip(1e-16, None)) @ U.conj().T
        L = np.linalg.cholesky(choi)
        super().__init__(d, _lower_tri_to_params(L, d))
        self.basis_name = basis
        from pygsti_tpu.tools import jamiolkowski as _jam
        from pygsti_tpu.baseobjs.basis import Basis
        b = Basis.cast(basis, d)
        # precompute the linear map choi(flat) -> superop(flat)
        n = d * d
        A = np.zeros((n, n), complex)
        for k in range(n):
            e = np.zeros(n); e[k] = 1.0
            A[:, k] = _jam.jamiolkowski_iso_inv(e.reshape(d, d), b, b).reshape(-1)
        self._jam_inv = np.asarray(A)

    @classmethod
    def from_superop_matrix(cls, superop_mx, basis='pp', truncate=False):
        from pygsti_tpu.tools import jamiolkowski as _jam
        from pygsti_tpu.baseobjs.basis import Basis
        d = superop_mx.shape[0]
        b = Basis.cast(basis, d)
        choi = _jam.jamiolkowski_iso(superop_mx, b, b)
        return cls(choi, basis, truncate)

    def to_dense_jax(self, v):
        d = self._dim
        L = _params_to_lower_tri_jax(v, d)
        choi = L @ L.conj().T
        choi = choi / jnp.trace(choi)
        out = (self._jam_inv @ choi.reshape(-1)).reshape(d, d)
        return jnp.real(out)

    @property
    def kraus_operators(self):
        """Kraus operators of the current channel (KrausOperatorInterface
        analogue; reference: operations/krausop.py:14)."""
        return _ot.kraus_decomposition(self.to_dense(), self.basis_name)


class IdentityPlusErrorgenOp(LinearOperator):
    """I + L: the first-order expansion of exp(L), CPTP whenever L is a
    valid Lindbladian (reference: operations/identitypluserrorgenop.py:31)."""

    def __init__(self, errorgen):
        self.errorgen = errorgen
        super().__init__(errorgen.dim, np.empty(0))

    @property
    def num_params(self):
        return self.errorgen.num_params

    def to_vector(self):
        return self.errorgen.to_vector()

    def from_vector(self, v, close=False, dirty_value=True):
        self.errorgen.from_vector(v)

    def to_dense_jax(self, v):
        return jnp.eye(self._dim, dtype=v.dtype) + self.errorgen.to_dense_jax(v)

    def errorgen_coefficients(self, return_basis=False, logscale_nonham=False):
        if hasattr(self.errorgen, 'coefficients'):
            return self.errorgen.coefficients()
        return {}


class CPTRop(LinearOperator):
    """A CP, trace-REDUCING map: Kraus operators with sum K^dag K <= I,
    parameterized by an unnormalized Choi Cholesky factor plus a loss
    parameter (reference: operations/cptrop.py).  Useful for modeling
    leakage/loss channels where probability leaves the computational space.
    """

    def __init__(self, superop_mx, basis='pp', truncate=True):
        from pygsti_tpu.tools import jamiolkowski as _jam
        from pygsti_tpu.baseobjs.basis import Basis
        m = np.asarray(superop_mx, float)
        d = m.shape[0]
        b = Basis.cast(basis, d)
        choi = _jam.jamiolkowski_iso(m, b, b)   # trace <= 1 for trace-reducing
        evals, U = np.linalg.eigh((choi + choi.conj().T) / 2)
        assert truncate or evals.min() > -1e-10, "superop must be CP"
        choi = (U * evals.clip(1e-16, None)) @ U.conj().T
        L = np.linalg.cholesky(choi + 1e-14 * np.eye(d))
        super().__init__(d, _lower_tri_to_params(L, d))
        self.basis_name = basis
        n = d * d
        A = np.zeros((n, n), complex)
        for k in range(n):
            e = np.zeros(n)
            e[k] = 1.0
            A[:, k] = _jam.jamiolkowski_iso_inv(e.reshape(d, d), b, b).reshape(-1)
        self._jam_inv = np.asarray(A)

    def to_dense_jax(self, v):
        d = self._dim
        L = _params_to_lower_tri_jax(v, d)
        choi = L @ L.conj().T
        # trace-reducing constraint: clip total trace at 1 (smooth sigmoid-free
        # formulation: scale down only when trace exceeds 1)
        tr = jnp.real(jnp.trace(choi))
        scale = jnp.where(tr > 1.0, 1.0 / tr, 1.0)
        choi = choi * scale
        out = (self._jam_inv @ choi.reshape(-1)).reshape(d, d)
        return jnp.real(out)
