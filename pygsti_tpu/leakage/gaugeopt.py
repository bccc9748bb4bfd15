"""Leakage-aware gauge optimization (LAGO) (reference:
pygsti/leakage/gaugeopt.py).

Gauge freedom for a leakage model must preserve the computational/leakage
direct-sum structure: the gauge group is U(2) (+) U(1) acting on the 3-level
Hilbert space (more generally U(k) (+) U(d-k)).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pygsti_tpu.models.gaugegroup import GaugeGroup, GaugeGroupElement


class DirectSumUnitaryGaugeGroup(GaugeGroup):
    """Superoperators of block-diagonal unitaries U(k) (+) U(d-k)
    (reference: leakage/gaugeopt._leakage_direct_sum_group:67)."""

    name = "DirectSumUnitary"

    def __init__(self, state_space, basis='gm', comp_dim=2):
        super().__init__(state_space)
        from pygsti_tpu.baseobjs.basis import Basis
        self.basis = Basis.cast(basis, self.dim) if isinstance(basis, str) else basis
        self.udim = self.state_space.udim
        self.comp_dim = comp_dim
        self.leak_dim = self.udim - comp_dim
        M = self.basis.create_transform_matrix('std')
        self._std2basis = np.linalg.inv(M)
        self._basis2std = np.asarray(M)

    @property
    def num_params(self):
        return self.comp_dim ** 2 + self.leak_dim ** 2

    def initial_params(self):
        return np.zeros(self.num_params)

    def element_matrix_jax(self, v):
        from pygsti_tpu.modelmembers.operations import _real_params_to_hermitian_jax
        k, m = self.comp_dim, self.leak_dim
        h1 = _real_params_to_hermitian_jax(v[:k * k], k)
        u1 = jax.scipy.linalg.expm(-1j * h1)
        if m > 0:
            h2 = _real_params_to_hermitian_jax(v[k * k:], m)
            u2 = jax.scipy.linalg.expm(-1j * h2)
            u = jnp.block([[u1, jnp.zeros((k, m), complex)],
                           [jnp.zeros((m, k), complex), u2]])
        else:
            u = u1
        s_std = jnp.kron(u, u.conj())
        return jnp.real(self._std2basis @ s_std @ self._basis2std)


def std_lago_gopsuite(model):
    """Standard leakage-aware gauge-opt suite: the direct-sum unitary group
    on the model's (3-level) state space (reference:
    leakage/gaugeopt.std_lago_gopsuite:221)."""
    group = DirectSumUnitaryGaugeGroup(model.state_space, model.basis
                                       if hasattr(model, 'basis') else 'gm')
    return {'LAGO': [{'gauge_group': group, 'item_weights': {'gates': 1.0,
                                                             'spam': 1.0}}]}


def add_lago_models(results, est_key=None, gos=None, verbosity=0):
    """Gauge-optimize each estimate's final model over the leakage-preserving
    direct-sum group and store it as '<go_label>.LAGO' (reference:
    leakage/gaugeopt.add_lago_models:244)."""
    from pygsti_tpu.algorithms.gaugeopt import gaugeopt_to_target
    est_keys = [est_key] if est_key is not None else list(results.estimates)
    for key in est_keys:
        est = results.estimates[key]
        mdl = est.models['final iteration estimate'].copy()
        target = est.models.get('target')
        if target is None:
            continue
        suite = gos or std_lago_gopsuite(mdl)
        for label, params_list in suite.items():
            for params in params_list:
                mdl_go = gaugeopt_to_target(
                    mdl, target, item_weights=params.get('item_weights'),
                    gauge_group=params['gauge_group'], verbosity=verbosity)
                est.models[label] = mdl_go
    return results
