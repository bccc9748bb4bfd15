"""Tests for op-less (error-rates) models and the success/fail simulator."""

import numpy as np
import pytest

from pygsti_tpu.circuits import Circuit
from pygsti_tpu.models.oplessmodel import (TwirledLayersModel, TwirledGatesModel,
                                           AnyErrorCausesFailureModel,
                                           AnyErrorCausesRandomOutputModel)

RATES = {'gates': {'Gx': 0.01, 'Gy': 0.02, 'Gcnot': 0.05, 'Gi': 0.001},
         'readout': {0: 0.03, 1: 0.04}}
CIRC = Circuit([('Gx', 0), ('Gcnot', 0, 1), ('Gy', 1)], (0, 1))

ALL_CLASSES = [TwirledLayersModel, TwirledGatesModel,
               AnyErrorCausesFailureModel, AnyErrorCausesRandomOutputModel]


class TestOplessModels:
    @pytest.mark.parametrize('cls', ALL_CLASSES)
    def test_probabilities_sum_to_one(self, cls):
        m = cls(RATES, 2, idle_name='Gi')
        p = m.probabilities(CIRC)
        assert 0 < p[('success',)] < 1
        assert abs(p[('success',)] + p[('fail',)] - 1.0) < 1e-12

    @pytest.mark.parametrize('cls', ALL_CLASSES)
    def test_analytic_dprob_matches_fd(self, cls):
        m = cls(RATES, 2, idle_name='Gi')
        cache = m._circuit_cache(CIRC)
        analytic = m._success_dprob(CIRC, None, cache)
        eps = 1e-7
        v0 = m.to_vector().copy()
        fd = np.empty_like(analytic)
        sp0 = m._success_prob(CIRC, cache)
        for i in range(m.num_params):
            v = v0.copy(); v[i] += eps
            m.from_vector(v)
            fd[i] = (m._success_prob(CIRC, cache) - sp0) / eps
        m.from_vector(v0)
        assert np.abs(analytic - fd).max() < 1e-5

    def test_zero_noise_gives_unit_success(self):
        rates = {'gates': {k: 0.0 for k in RATES['gates']},
                 'readout': {k: 0.0 for k in RATES['readout']}}
        m = TwirledLayersModel(rates, 2, idle_name='Gi')
        assert abs(m.probabilities(CIRC)[('success',)] - 1.0) < 1e-12

    def test_idle_gates_counted(self):
        """A layer acting on one qubit gets an idle error on the other."""
        m = AnyErrorCausesFailureModel(RATES, 2, idle_name='Gi')
        c1 = Circuit([('Gx', 0)], (0, 1))
        m2 = AnyErrorCausesFailureModel(RATES, 2, idle_name=None)
        p_with = m.probabilities(c1)[('success',)]
        p_without = m2.probabilities(c1)[('success',)]
        assert p_with < p_without  # idle error lowers success

    def test_simulator_dprobs(self):
        m = TwirledGatesModel(RATES, 2, idle_name='Gi')
        d = m.sim.dprobs(CIRC)
        assert np.allclose(d[('success',)], -np.asarray(d[('fail',)]))
