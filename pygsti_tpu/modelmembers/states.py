"""State (preparation) parameterizations as pure functions
(reference: pygsti/modelmembers/states/, ~4k LoC)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pygsti_tpu.modelmembers.modelmember import ModelMember


class State(ModelMember):
    """Base: dense rep is a length-dim superket (vector in model basis)."""

    def __init__(self, dim, initial_paramvals=None):
        super().__init__(initial_paramvals)
        self._dim = dim

    @property
    def dim(self):
        return self._dim


class StaticState(State):
    """Fixed state vector (reference: states/staticstate.py)."""

    def _to_nice_serialization(self):
        return {'vec': self.to_dense()}

    @classmethod
    def _from_nice_serialization(cls, state):
        return cls(np.asarray(state['vec']))

    def __init__(self, vec):
        vec = np.asarray(vec, dtype=float).reshape(-1)
        super().__init__(len(vec), np.empty(0))
        self._vec = vec

    def to_dense_jax(self, v):
        return jnp.asarray(self._vec)

    def to_dense(self, on_space='minimal'):
        return self._vec.copy()

    def to_statevec_jax(self, v):
        """Pure state vector when this superket is (close to) a pure density
        matrix; raises ValueError otherwise (statevec evotype path)."""
        from pygsti_tpu.tools.optools import dmvec_to_state
        from pygsti_tpu.tools.basistools import vec_to_stdmx
        psi = dmvec_to_state(vec_to_stdmx(self._vec, 'pp').reshape(-1))
        return jnp.asarray(psi)

    def transform_inplace(self, s, sinv):
        self._vec = sinv @ self._vec


class FullState(State):
    """Fully parameterized state vector (reference: states/fullstate.py)."""

    def _to_nice_serialization(self):
        return {'vec': self.to_dense()}

    @classmethod
    def _from_nice_serialization(cls, state):
        return cls(np.asarray(state['vec']))

    def __init__(self, vec):
        vec = np.asarray(vec, dtype=float).reshape(-1)
        super().__init__(len(vec), vec.copy())

    def to_dense_jax(self, v):
        return v

    def transform_inplace(self, s, sinv):
        self._paramvals = sinv @ self._paramvals


class TPState(State):
    """Trace = 1 state: first component fixed at 1/sqrt(udim) (identity-first
    basis); the rest are parameters (reference: states/tpstate.py)."""

    def _to_nice_serialization(self):
        return {'vec': self.to_dense()}

    @classmethod
    def _from_nice_serialization(cls, state):
        return cls(np.asarray(state['vec']))

    def __init__(self, vec):
        vec = np.asarray(vec, dtype=float).reshape(-1)
        d = len(vec)
        udim = int(round(np.sqrt(d)))
        self._first = 1.0 / np.sqrt(udim)
        assert np.isclose(vec[0], self._first, atol=1e-6), \
            "TPState initial vector must have first component 1/sqrt(udim)"
        super().__init__(d, vec[1:].copy())

    def to_dense_jax(self, v):
        return jnp.concatenate([jnp.full((1,), self._first, dtype=v.dtype), v])

    def transform_inplace(self, s, sinv):
        new = sinv @ np.concatenate([[self._first], self._paramvals])
        assert np.isclose(new[0], self._first, atol=1e-6), "Gauge transform broke TP state"
        self._paramvals = new[1:]


class ComputationalBasisState(State):
    """|00..0>-style computational basis state, 0 parameters
    (reference: states/computationalstate.py)."""

    def _to_nice_serialization(self):
        return {'zvals': list(self.zvals)}

    @classmethod
    def _from_nice_serialization(cls, state):
        return cls(state['zvals'])

    def __init__(self, zvals, basis='pp'):
        from pygsti_tpu.tools.basistools import stdmx_to_vec
        self.zvals = tuple(int(z) for z in zvals)
        udim = 2 ** len(self.zvals)
        idx = int("".join(str(z) for z in self.zvals), 2) if self.zvals else 0
        rho = np.zeros((udim, udim), dtype=complex)
        rho[idx, idx] = 1.0
        vec = np.real(stdmx_to_vec(rho, basis))
        super().__init__(len(vec), np.empty(0))
        self._vec = vec

    def to_dense_jax(self, v):
        return jnp.asarray(self._vec)

    def to_dense(self, on_space='minimal'):
        return self._vec.copy()

    def to_statevec_jax(self, v):
        """Pure state vector |z> (statevec evotype path; reference:
        evotypes/statevec/statereps StateRepComputational)."""
        udim = 2 ** len(self.zvals)
        idx = int("".join(str(z) for z in self.zvals), 2) if self.zvals else 0
        psi = np.zeros(udim, dtype=complex)
        psi[idx] = 1.0
        return jnp.asarray(psi)


class ComposedState(State):
    """Error map applied to a static base state: vec = M_err @ base
    (reference: states/composedstate.py)."""

    def __init__(self, static_state, errormap):
        self.state_vec = static_state
        self.error_map = errormap
        super().__init__(static_state.dim, np.empty(0))

    @property
    def num_params(self):
        return self.error_map.num_params

    def to_vector(self):
        return self.error_map.to_vector()

    def from_vector(self, v, close=False, dirty_value=True):
        self.error_map.from_vector(v)

    def to_dense_jax(self, v):
        base = self.state_vec.to_dense_jax(jnp.empty(0))
        return self.error_map.to_dense_jax(v) @ base

    def errorgen_coefficient_labels(self):
        return self.error_map.errorgen_coefficient_labels()

    def errorgen_coefficients(self, return_basis=False, logscale_nonham=False):
        return self.error_map.errorgen_coefficients()

    def set_errorgen_coefficients(self, coeff_dict, truncate=False):
        self.error_map.set_errorgen_coefficients(coeff_dict, truncate)
