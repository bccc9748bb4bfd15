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

    def inverse(self):
        """An element representing this element's inverse action
        (reference: gaugegroup.GaugeGroupElement.inverse)."""
        return InverseGaugeGroupElement(self)


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

    element_cls = GaugeGroupElement

    def compute_element(self, v):
        mx = np.asarray(self.element_matrix_jax(jnp.asarray(v)))
        return self.element_cls(mx)


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


# ---------------------------------------------------------------------------
# Reference element-class surface (reference: models/gaugegroup.py): one
# element subclass per group, inverse wrappers, operator-parameterized
# groups, U(1), and the leakage-aware direct-sum unitary group.
# ---------------------------------------------------------------------------

class TrivialGaugeGroupElement(GaugeGroupElement):
    """Identity gauge transformation of the given dimension (reference:
    gaugegroup.TrivialGaugeGroupElement:1097)."""

    def __init__(self, dim):
        eye = np.identity(dim, 'd')
        super().__init__(eye, eye)


class FullGaugeGroupElement(GaugeGroupElement):
    pass


class TPGaugeGroupElement(GaugeGroupElement):
    pass


class DiagGaugeGroupElement(GaugeGroupElement):
    pass


class TPDiagGaugeGroupElement(GaugeGroupElement):
    pass


class UnitaryGaugeGroupElement(GaugeGroupElement):
    """Superoperator of a unitary; keeps the underlying Hilbert-space
    unitary for consumers like DirectSumUnitaryGroupElement."""

    def __init__(self, matrix, inverse=None, unitary=None, basis=None):
        super().__init__(matrix, inverse)
        self._unitary = None if unitary is None else np.asarray(unitary)
        self._basis = basis

    @property
    def unitary(self):
        if self._unitary is None:
            from pygsti_tpu.tools.optools import superop_to_unitary
            self._unitary = superop_to_unitary(self._mx,
                                               self._basis or 'pp')
        return self._unitary


class SpamGaugeGroupElement(GaugeGroupElement):
    pass


class TPSpamGaugeGroupElement(GaugeGroupElement):
    pass


class InverseGaugeGroupElement(GaugeGroupElement):
    """The inverse action of another gauge group element (reference:
    gaugegroup.InverseGaugeGroupElement:206)."""

    def __init__(self, gauge_group_el):
        self.inverse_element = gauge_group_el

    @property
    def transform_matrix(self):
        return self.inverse_element.transform_matrix_inverse

    @property
    def transform_matrix_inverse(self):
        return self.inverse_element.transform_matrix

    def inverse(self):
        return self.inverse_element


class OpGaugeGroupElement(GaugeGroupElement):
    """Element whose transform matrix is a LinearOperator's dense matrix
    (reference: gaugegroup.OpGaugeGroupElement:433)."""

    def __init__(self, operation):
        self.operation = operation
        super().__init__(np.asarray(operation.to_dense()))

    def to_vector(self):
        return self.operation.to_vector()

    @property
    def num_params(self):
        return self.operation.num_params


class OpGaugeGroup(GaugeGroup):
    """Gauge group parameterized by a LinearOperator's parameterization
    (reference: gaugegroup.OpGaugeGroup:318)."""

    def __init__(self, operation, elementcls=OpGaugeGroupElement,
                 name="Op gauge group"):
        self._operation = operation
        self._element_cls = elementcls
        self.name = name
        super().__init__(operation.state_space
                         if hasattr(operation, 'state_space')
                         else int(np.asarray(operation.to_dense()).shape[0]))

    @property
    def num_params(self):
        return self._operation.num_params

    def initial_params(self):
        return np.asarray(self._operation.to_vector())

    def compute_element(self, v):
        import copy as _copy
        op = _copy.deepcopy(self._operation)
        op.from_vector(np.asarray(v))
        return self._element_cls(op)

    def element_matrix_jax(self, v):
        return self._operation.to_dense_jax(jnp.asarray(v))


class OpGaugeGroupWithBasis(OpGaugeGroup):
    """OpGaugeGroup carrying the matrix basis of its operation (reference:
    gaugegroup.OpGaugeGroupWithBasis:414)."""

    def __init__(self, operation, elementcls=OpGaugeGroupElement,
                 name="Op gauge group", basis='pp'):
        self._basis = basis
        super().__init__(operation, elementcls, name)


class U1GroupElement(GaugeGroupElement):
    """Element of U(1): the 1x1 matrix e^{i angle} (reference:
    gaugegroup.U1GroupElement:862)."""

    def __init__(self, angle=0.0):
        self._angle = float(angle) % (2 * np.pi)

    @property
    def num_params(self):
        return 1

    @property
    def transform_matrix(self):
        return np.array([[np.exp(1j * self._angle)]])

    @property
    def transform_matrix_inverse(self):
        return self.transform_matrix.conj()

    @property
    def unitary(self):
        return self.transform_matrix

    def from_vector(self, v):
        self._angle = float(np.asarray(v).item()) % (2 * np.pi)

    def to_vector(self):
        return np.array([self._angle])


class U1Group(GaugeGroup):
    """The complex unit circle as a 1-parameter gauge group (reference:
    gaugegroup.U1Group:838)."""

    name = "U(1); the complex unit circle"

    def __init__(self):
        from pygsti_tpu.baseobjs.statespace import QubitSpace
        super().__init__(QubitSpace(0))  # udim 1, as in the reference

    @property
    def num_params(self):
        return 1

    def initial_params(self):
        return np.zeros(1)

    def compute_element(self, v):
        return U1GroupElement(np.asarray(v).item())


def _normalize_level_partition(level_partition, expected_block_sizes, udim):
    """Validate/canonicalize a direct-sum level partition: one tuple of
    standard-basis levels per summand, jointly a permutation of range(udim)
    (reference: gaugegroup._normalize_level_partition:1202).  None means
    the contiguous block_diag layout."""
    if level_partition is None:
        return None
    blocks = tuple(tuple(int(x) for x in block) for block in level_partition)
    if len(blocks) != len(expected_block_sizes):
        raise ValueError("level_partition has %d blocks but there are %d "
                         "summands" % (len(blocks),
                                       len(expected_block_sizes)))
    for blk, sz in zip(blocks, expected_block_sizes):
        if len(blk) != sz:
            raise ValueError("level_partition block sizes disagree with "
                             "the summand dimensions")
    flat = sorted(x for blk in blocks for x in blk)
    if flat != list(range(udim)):
        raise ValueError("level_partition levels must be a permutation of "
                         "range(%d)" % udim)
    return blocks


class DirectSumUnitaryGroupElement(GaugeGroupElement):
    """Block-diagonal (up to a level permutation) unitary gauge element on
    a direct-sum Hilbert space, as a superoperator in `basis` (reference:
    gaugegroup.DirectSumUnitaryGroupElement:1334)."""

    def __init__(self, subelements, basis, level_partition=None):
        import scipy.linalg as _sla
        from pygsti_tpu.baseobjs.basis import Basis
        from pygsti_tpu.tools.optools import unitary_to_superop
        self.subelements = tuple(subelements)
        self.basis = basis
        blocks = []
        for se in self.subelements:
            if hasattr(se, 'unitary'):
                blocks.append(np.asarray(se.unitary))
            else:  # trivial element: superop identity of dim d**2 -> udim d
                d = se.transform_matrix.shape[0]
                blocks.append(np.eye(int(round(np.sqrt(d)))))
        u = _sla.block_diag(*blocks)
        udim = u.shape[0]
        self.level_partition = _normalize_level_partition(
            level_partition, [b.shape[0] for b in blocks], udim)
        if self.level_partition is not None:
            perm = np.zeros((udim, udim))
            grouped = [lvl for blk in self.level_partition for lvl in blk]
            for i, lvl in enumerate(grouped):
                perm[lvl, i] = 1.0
            u = perm @ u @ perm.T
        basis_obj = Basis.cast(basis, udim ** 2) \
            if isinstance(basis, str) else basis
        m = unitary_to_superop(u, basis_obj)
        if np.linalg.norm(m.imag) < 1e-12:
            m = m.real
        self._unitary_total = u
        super().__init__(np.asarray(m))

    @property
    def num_params(self):
        return int(sum(getattr(se, 'num_params', 0)
                       for se in self.subelements))

    def inverse(self):
        return InverseGaugeGroupElement(self)


class DirectSumUnitaryGroup(GaugeGroup):
    """Subgroup of the unitary group preserving a direct-sum structure of
    the Hilbert space -- block-diagonal unitaries, optionally on
    interleaved levels (reference: gaugegroup.DirectSumUnitaryGroup:1239).
    Used for leakage-aware gauge optimization where the computational and
    leakage subspaces may be gauge-transformed independently."""

    name = "Direct sum gauge group"

    def __init__(self, subgroups, basis, level_partition=None,
                 name="Direct sum gauge group"):
        from pygsti_tpu.baseobjs.basis import Basis
        udim = sum(sg.state_space.udim if hasattr(sg, 'state_space')
                   and sg.state_space is not None else 1
                   for sg in subgroups)
        if isinstance(basis, str):
            basis = Basis.cast(basis, udim ** 2)
        if basis.dim != udim ** 2:
            raise ValueError("basis.dim inconsistent with the direct-sum "
                             "Hilbert space dimension")
        self.basis = basis
        self.subgroups = tuple(subgroups)
        self.name = name
        self.level_partition = _normalize_level_partition(
            level_partition,
            [sg.state_space.udim if hasattr(sg, 'state_space')
             and sg.state_space is not None else 1 for sg in subgroups],
            udim)
        self._param_dims = [sg.num_params for sg in subgroups]
        super().__init__(udim ** 2)

    @property
    def num_params(self):
        return int(sum(self._param_dims))

    def initial_params(self):
        return np.concatenate([np.asarray(sg.initial_params())
                               for sg in self.subgroups]) \
            if self.subgroups else np.empty(0)

    def compute_element(self, v):
        v = np.asarray(v)
        assert v.size == self.num_params
        subelements, offset = [], 0
        for pd, sg in zip(self._param_dims, self.subgroups):
            subelements.append(sg.compute_element(v[offset:offset + pd]))
            offset += pd
        return DirectSumUnitaryGroupElement(subelements, self.basis,
                                            self.level_partition)


# attach per-group element classes (defined above after the groups)
TrivialGaugeGroup.element_cls = TrivialGaugeGroupElement
FullGaugeGroup.element_cls = FullGaugeGroupElement
TPGaugeGroup.element_cls = TPGaugeGroupElement
DiagGaugeGroup.element_cls = DiagGaugeGroupElement
TPDiagGaugeGroup.element_cls = TPDiagGaugeGroupElement
SpamGaugeGroup.element_cls = SpamGaugeGroupElement
TPSpamGaugeGroup.element_cls = TPSpamGaugeGroupElement


def _trivial_compute_element(self, v):
    return TrivialGaugeGroupElement(self.dim)


TrivialGaugeGroup.compute_element = _trivial_compute_element


def _unitary_compute_element(self, v):
    """UnitaryGaugeGroup element: host-side numpy mirror of
    element_matrix_jax (Cayley transform), also recording the Hilbert-space
    unitary so DirectSumUnitaryGroupElement can recover the block without a
    superop_to_unitary round trip."""
    v = np.asarray(v, float)
    d = self.udim
    h = np.zeros((d, d), complex)
    h += np.diag(v[:d])
    k = d
    for i in range(d):
        for j in range(i + 1, d):
            h[i, j] += v[k] + 1j * v[k + 1]
            h[j, i] += v[k] - 1j * v[k + 1]
            k += 2
    eye = np.eye(d, dtype=complex)
    u = np.linalg.solve(eye + 0.5j * h, eye - 0.5j * h)
    s_std = np.kron(u, u.conj())
    mx = np.real(self._std2basis @ s_std @ self._basis2std)
    return UnitaryGaugeGroupElement(mx, unitary=u, basis=self.basis)


UnitaryGaugeGroup.compute_element = _unitary_compute_element
