"""POVM parameterizations as pure functions
(reference: pygsti/modelmembers/povms/, ~6k LoC).

A POVM's dense rep is a stack of effect vectors [n_outcomes, dim]; its
``to_dense_jax(v)`` returns that stack, and ``outcome_labels`` names the rows.
"""

from __future__ import annotations

import collections

import numpy as np

import jax.numpy as jnp

from pygsti_tpu.modelmembers.modelmember import ModelMember


class POVM(ModelMember):
    """Base POVM: ordered outcome labels + effect stack."""

    def __init__(self, dim, outcome_labels, initial_paramvals=None):
        super().__init__(initial_paramvals)
        self._dim = dim
        self._outcome_labels = [str(o) for o in outcome_labels]

    @property
    def dim(self):
        return self._dim

    @property
    def outcome_labels(self):
        return list(self._outcome_labels)

    @property
    def num_outcomes(self):
        return len(self._outcome_labels)

    def keys(self):
        return list(self._outcome_labels)

    def __iter__(self):
        return iter(self._outcome_labels)

    def __len__(self):
        return len(self._outcome_labels)

    def __getitem__(self, outcome):
        """Dense effect vector for one outcome at current params."""
        i = self._outcome_labels.index(str(outcome))
        return self.to_dense()[i]

    def items(self):
        dense = self.to_dense()
        return [(ol, dense[i]) for i, ol in enumerate(self._outcome_labels)]

    def effect_vectors(self):
        return self.to_dense()


class UnconstrainedPOVM(POVM):
    """Every effect fully parameterized (reference: povms/unconstrainedpovm.py)."""

    def _to_nice_serialization(self):
        return {'effects': [[ol, ev] for ol, ev in
                            zip(self.outcome_labels, np.asarray(self.to_dense()))]}

    @classmethod
    def _from_nice_serialization(cls, state):
        return cls(collections.OrderedDict(
            (ol, np.asarray(ev)) for ol, ev in state['effects']))

    def __init__(self, effect_dict):
        items = [(str(k), np.asarray(v, dtype=float).reshape(-1))
                 for k, v in (effect_dict.items() if isinstance(effect_dict, dict)
                              else effect_dict)]
        dim = len(items[0][1])
        pv = np.concatenate([v for _, v in items])
        super().__init__(dim, [k for k, _ in items], pv)

    def to_dense_jax(self, v):
        return v.reshape(self.num_outcomes, self._dim)

    def transform_inplace(self, s, sinv):
        dense = self._paramvals.reshape(self.num_outcomes, self._dim)
        self._paramvals = (dense @ s).reshape(-1)


class TPPOVM(POVM):
    """Trace-preserving POVM: last effect = identity-vec minus the others
    (reference: povms/tppovm.py)."""

    def _to_nice_serialization(self):
        return {'effects': [[ol, ev] for ol, ev in
                            zip(self.outcome_labels, np.asarray(self.to_dense()))]}

    @classmethod
    def _from_nice_serialization(cls, state):
        return cls(collections.OrderedDict(
            (ol, np.asarray(ev)) for ol, ev in state['effects']))

    def __init__(self, effect_dict):
        items = [(str(k), np.asarray(v, dtype=float).reshape(-1))
                 for k, v in (effect_dict.items() if isinstance(effect_dict, dict)
                              else effect_dict)]
        dim = len(items[0][1])
        udim = int(round(np.sqrt(dim)))
        self._identity_vec = np.zeros(dim)
        self._identity_vec[0] = np.sqrt(udim)  # vec of identity in identity-first basis
        total = np.sum([v for _, v in items], axis=0)
        assert np.allclose(total, self._identity_vec, atol=1e-6), \
            "TPPOVM effects must sum to the identity"
        pv = np.concatenate([v for _, v in items[:-1]]) if len(items) > 1 else np.empty(0)
        super().__init__(dim, [k for k, _ in items], pv)

    @property
    def num_free_effects(self):
        return self.num_outcomes - 1

    def to_dense_jax(self, v):
        nfree = self.num_outcomes - 1
        free = v.reshape(nfree, self._dim)
        last = jnp.asarray(self._identity_vec) - jnp.sum(free, axis=0)
        return jnp.concatenate([free, last[None, :]], axis=0)

    def transform_inplace(self, s, sinv):
        nfree = self.num_outcomes - 1
        free = self._paramvals.reshape(nfree, self._dim) @ s
        self._paramvals = free.reshape(-1)


class ComputationalBasisPOVM(POVM):
    """Z-basis measurement on n qubits, 0 parameters
    (reference: povms/computationalpovm.py)."""

    def _to_nice_serialization(self):
        return {'nqubits': self.nqubits}

    @classmethod
    def _from_nice_serialization(cls, state):
        return cls(state['nqubits'])

    def __init__(self, nqubits, basis='pp'):
        from pygsti_tpu.tools.basistools import stdmx_to_vec
        self.nqubits = nqubits
        udim = 2 ** nqubits
        dim = udim * udim
        outcome_labels = [format(i, '0%db' % nqubits) for i in range(udim)]
        effects = np.empty((udim, dim))
        for i in range(udim):
            e = np.zeros((udim, udim), dtype=complex)
            e[i, i] = 1.0
            effects[i] = np.real(stdmx_to_vec(e, basis))
        super().__init__(dim, outcome_labels, np.empty(0))
        self._effects = effects

    def to_dense_jax(self, v):
        return jnp.asarray(self._effects)

    def to_dense(self, on_space='minimal'):
        return self._effects.copy()


class ComposedPOVM(POVM):
    """Error map composed before a base POVM: effects' = base_effects @ M_err
    (reference: povms/composedpovm.py)."""

    def __init__(self, errormap, povm=None, mx_basis='pp'):
        if povm is None:
            import math
            nq = int(round(math.log(math.sqrt(errormap.dim), 2)))
            povm = ComputationalBasisPOVM(nq, mx_basis)
        self.base_povm = povm
        self.error_map = errormap
        super().__init__(povm.dim, povm.outcome_labels, np.empty(0))

    @property
    def num_params(self):
        return self.error_map.num_params

    def to_vector(self):
        return self.error_map.to_vector()

    def from_vector(self, v, close=False, dirty_value=True):
        self.error_map.from_vector(v)

    def to_dense_jax(self, v):
        base = self.base_povm.to_dense_jax(jnp.empty(0))
        return base @ self.error_map.to_dense_jax(v)

    def errorgen_coefficient_labels(self):
        return self.error_map.errorgen_coefficient_labels()

    def errorgen_coefficients(self, return_basis=False, logscale_nonham=False):
        return self.error_map.errorgen_coefficients()

    def set_errorgen_coefficients(self, coeff_dict, truncate=False):
        self.error_map.set_errorgen_coefficients(coeff_dict, truncate)


class MarginalizedPOVM(POVM):
    """Marginalize a POVM onto a subset of qubits (reference:
    povms/marginalizedpovm.py).  Static w.r.t. the base POVM's params for now."""

    def __init__(self, povm_to_marginalize, all_sslbls, sslbls_after_marginalizing):
        self.base_povm = povm_to_marginalize
        self.all_sslbls = tuple(all_sslbls)
        self.kept = tuple(sslbls_after_marginalizing)
        kept_pos = [self.all_sslbls.index(s) for s in self.kept]
        n_all = len(self.all_sslbls)
        n_kept = len(self.kept)
        out_labels = [format(i, '0%db' % n_kept) for i in range(2 ** n_kept)]
        # map each base outcome to a kept outcome
        groups = collections.defaultdict(list)
        for i, ol in enumerate(self.base_povm.outcome_labels):
            kept_bits = "".join(ol[p] for p in kept_pos)
            groups[kept_bits].append(i)
        self._groups = [groups[ol] for ol in out_labels]
        super().__init__(self.base_povm.dim, out_labels, np.empty(0))

    @property
    def num_params(self):
        return self.base_povm.num_params

    def to_vector(self):
        return self.base_povm.to_vector()

    def from_vector(self, v, close=False, dirty_value=True):
        self.base_povm.from_vector(v)

    def to_dense_jax(self, v):
        base = self.base_povm.to_dense_jax(v)
        rows = [jnp.sum(base[jnp.asarray(g)], axis=0) for g in self._groups]
        return jnp.stack(rows)
