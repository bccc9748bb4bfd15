"""Gauge groups: parameterized families of gauge transformations
(reference: pygsti/models/gaugegroup.py:39,557-1332).

A gauge transformation S acts as: rho -> Sinv rho,  E -> E S,  G -> Sinv G S.
Each group provides a pure jnp map ``params -> S`` (so gauge optimization can
differentiate through it) plus element construction.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pygsti_tpu.baseobjs.statespace import StateSpace


class GaugeGroupElement(object):
    """A concrete gauge transformation."""

    def __init__(self, matrix, inverse=None):
        self._mx = np.asarray(matrix)
        self._inv = np.asarray(inverse) if inverse is not None else np.linalg.inv(self._mx)

    @property
    def transform_matrix(self):
        return self._mx

    @property
    def transform_matrix_inverse(self):
        return self._inv


class GaugeGroup(object):
    """Base gauge group."""

    name = "Base"

    def __init__(self, state_space):
        self.state_space = StateSpace.cast(state_space)
        self.dim = self.state_space.dim

    @property
    def num_params(self):
        raise NotImplementedError()

    def initial_params(self):
        raise NotImplementedError()

    def element_matrix_jax(self, v):
        """Pure jnp: params -> transform matrix S."""
        raise NotImplementedError()

    def compute_element(self, v):
        mx = np.asarray(self.element_matrix_jax(jnp.asarray(v)))
        return GaugeGroupElement(mx)


class TrivialGaugeGroup(GaugeGroup):
    name = "Trivial"

    @property
    def num_params(self):
        return 0

    def initial_params(self):
        return np.empty(0)

    def element_matrix_jax(self, v):
        return jnp.eye(self.dim)


class FullGaugeGroup(GaugeGroup):
    """All invertible matrices (d^2 params)."""

    name = "Full"

    @property
    def num_params(self):
        return self.dim ** 2

    def initial_params(self):
        return np.eye(self.dim).reshape(-1)

    def element_matrix_jax(self, v):
        return v.reshape(self.dim, self.dim)


class TPGaugeGroup(GaugeGroup):
    """TP-preserving transforms: first row fixed to e0."""

    name = "TP"

    @property
    def num_params(self):
        return self.dim * (self.dim - 1)

    def initial_params(self):
        return np.eye(self.dim)[1:, :].reshape(-1)

    def element_matrix_jax(self, v):
        d = self.dim
        first = jnp.zeros((1, d), dtype=v.dtype).at[0, 0].set(1.0)
        return jnp.concatenate([first, v.reshape(d - 1, d)], axis=0)


class DiagGaugeGroup(GaugeGroup):
    """Diagonal transforms (d params)."""

    name = "Diag"

    @property
    def num_params(self):
        return self.dim

    def initial_params(self):
        return np.ones(self.dim)

    def element_matrix_jax(self, v):
        return jnp.diag(v)


class TPDiagGaugeGroup(GaugeGroup):
    """Diagonal TP transforms: first diag element fixed at 1."""

    name = "TP Diag"

    @property
    def num_params(self):
        return self.dim - 1

    def initial_params(self):
        return np.ones(self.dim - 1)

    def element_matrix_jax(self, v):
        return jnp.diag(jnp.concatenate([jnp.ones(1, dtype=v.dtype), v]))


class UnitaryGaugeGroup(GaugeGroup):
    """Superoperators of unitaries: S = superop(expm(-iH)), H Hermitian on
    the udim-dimensional Hilbert space (reference: gaugegroup.py Unitary)."""

    name = "Unitary"

    def __init__(self, state_space, basis='pp'):
        super().__init__(state_space)
        from pygsti_tpu.baseobjs.basis import Basis
        self.basis = Basis.cast(basis, self.dim) if isinstance(basis, str) else basis
        self.udim = self.state_space.udim
        M = self.basis.create_transform_matrix('std')
        # numpy constants: eager complex128 device_put hangs the remote
        # TPU runtime; numpy folds into the traced graph instead
        self._std2basis = np.linalg.inv(M)
        self._basis2std = np.asarray(M)

    @property
    def num_params(self):
        return self.udim ** 2

    def initial_params(self):
        return np.zeros(self.udim ** 2)

    def element_matrix_jax(self, v):
        from pygsti_tpu.modelmembers.operations import _real_params_to_hermitian_jax
        h = _real_params_to_hermitian_jax(v, self.udim)
        # Cayley transform U = (I - iH/2)(I + iH/2)^{-1}: exactly unitary,
        # equal to expm(-iH) + O(H^3), and covers the group near identity --
        # an optimization-equivalent reparameterization of the reference's
        # expm(-iH) (gaugegroup.py UnitaryGaugeGroupElement) whose graph
        # (one linear solve) compiles ~10x faster than Pade expm + grad,
        # which dominated cold-start gauge-opt compile time.
        eye = jnp.eye(self.udim, dtype=complex)
        u = jnp.linalg.solve(eye + 0.5j * h, eye - 0.5j * h)
        s_std = jnp.kron(u, u.conj())
        return jnp.real(self._std2basis @ s_std @ self._basis2std)


class SpamGaugeGroup(GaugeGroup):
    """2-parameter group scaling the identity-component and the rest of the
    space separately: S = diag(a, b, b, ..., b)
    (reference: gaugegroup.py:907 SpamGaugeGroup)."""

    name = "Spam"

    @property
    def num_params(self):
        return 2

    def initial_params(self):
        return np.ones(2)

    def element_matrix_jax(self, v):
        d = self.dim
        diag = jnp.concatenate([v[0:1], v[1] * jnp.ones(d - 1, dtype=v.dtype)])
        return jnp.diag(diag)


class TPSpamGaugeGroup(GaugeGroup):
    """1-parameter TP version of SpamGaugeGroup: S = diag(1, b, ..., b)."""

    name = "TP Spam"

    @property
    def num_params(self):
        return 1

    def initial_params(self):
        return np.ones(1)

    def element_matrix_jax(self, v):
        d = self.dim
        diag = jnp.concatenate([jnp.ones(1, dtype=v.dtype), v[0] * jnp.ones(d - 1, dtype=v.dtype)])
        return jnp.diag(diag)


def default_gauge_group_for_model(model):
    """The natural gauge group for a model's parameterization (reference:
    explicitmodel.default_gauge_group logic)."""
    t = getattr(model, 'default_gate_type', 'full')
    if t in ('full', 'full arbitrary'):
        return FullGaugeGroup(model.state_space)
    if t in ('full TP', 'TP'):
        return TPGaugeGroup(model.state_space)
    if t in ('static',):
        return TrivialGaugeGroup(model.state_space)
    if t in ('CPTP', 'CPTPLND', 'GLND', 'H+S', 'H+s', 'H'):
        return UnitaryGaugeGroup(model.state_space, model.basis)
    return FullGaugeGroup(model.state_space)
