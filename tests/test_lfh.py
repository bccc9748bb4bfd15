"""Tests for locally-fluctuating-Hamiltonian (LFH) simulation."""

import numpy as np
import pytest

from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.extras.lfh import (GaussianParamFluctuation,
                                   LFHIntegratingForwardSimulator,
                                   LFHWeakForwardSimulator,
                                   LFHSigmaForwardSimulator)


@pytest.fixture(scope='module')
def setup():
    m = mp.target_model('H+s')
    m._rebuild_paramvec_if_needed()
    i0 = m.operations[list(m.operations.keys())[1]].gpindices.start
    fl = GaussianParamFluctuation({i0: 0.05})
    c = Circuit([('Gxpi2', 0)] * 8, (0,))
    return m, fl, c


class TestLFH:
    def test_integrating_vs_monte_carlo(self, setup):
        m, fl, c = setup
        pi = LFHIntegratingForwardSimulator(m, fl, order=9).probs(c)
        pw = LFHWeakForwardSimulator(m, fl, shots=20000, base_seed=0).probs(c)
        for o in pi:
            assert abs(pi[o] - pw[o]) < 0.01

    def test_sigma_second_order(self, setup):
        m, fl, c = setup
        pi = LFHIntegratingForwardSimulator(m, fl, order=9).probs(c)
        ps = LFHSigmaForwardSimulator(m, fl).probs(c)
        for o in pi:
            assert abs(pi[o] - ps[o]) < 0.02

    def test_fluctuations_dephase(self, setup):
        """Hamiltonian fluctuations act like dephasing: probabilities move
        away from the noiseless values."""
        m, fl, c = setup
        p0 = m.probabilities(c)
        pi = LFHIntegratingForwardSimulator(m, fl, order=9).probs(c)
        assert abs(pi[('0',)] - p0[('0',)]) > 0.001
        assert abs(sum(pi.values()) - 1.0) < 1e-9

    def test_zero_dev_recovers_exact(self, setup):
        m, fl, c = setup
        fl0 = GaussianParamFluctuation({list(fl.param_devs)[0]: 0.0})
        pi = LFHIntegratingForwardSimulator(m, fl0, order=5).probs(c)
        p0 = m.probabilities(c)
        for o in pi:
            assert abs(pi[o] - p0[o]) < 1e-9
