"""Tests for the weak (shot-sampling) and CHP-text simulators."""

import numpy as np
import pytest

from pygsti_tpu.processors import QubitProcessorSpec
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.forwardsims.weakforwardsim import (CHPForwardSimulator,
                                                   circuit_to_chp_program)


@pytest.fixture(scope='module')
def pspec():
    return QubitProcessorSpec(2, ['Gh', 'Gp', 'Gxpi2', 'Gcnot'],
                              geometry='line')


class TestWeakSim:
    def test_bell_state_sampling(self, pspec):
        c = Circuit([('Gh', 0), ('Gcnot', 0, 1)], (0, 1))
        sim = CHPForwardSimulator(shots=4000, pspec=pspec, base_seed=0)
        p = sim.probs(c)
        assert abs(p[('00',)] - 0.5) < 0.03
        assert abs(p[('11',)] - 0.5) < 0.03
        assert ('01',) not in p and ('10',) not in p

    def test_deterministic_circuit(self, pspec):
        c = Circuit([('Gxpi2', 0), ('Gxpi2', 0)], (0, 1))  # X on qubit 0
        sim = CHPForwardSimulator(shots=50, pspec=pspec, base_seed=1)
        p = sim.probs(c)
        assert p[('10',)] == 1.0

    def test_chp_program_text(self, pspec):
        c = Circuit([('Gh', 0), ('Gcnot', 0, 1)], (0, 1))
        txt = circuit_to_chp_program(c, pspec)
        lines = [l for l in txt.splitlines() if l and not l.startswith('#')]
        assert lines == ['h 0', 'c 0 1', 'm 0', 'm 1']

    def test_chp_program_compiles_nonprimitives(self, pspec):
        c = Circuit([('Gxpi2', 0)], (0, 1))
        txt = circuit_to_chp_program(c, pspec)
        ops = [l.split()[0] for l in txt.splitlines()
               if l and not l.startswith('#')]
        assert set(ops) <= {'h', 'p', 'c', 'm'}


class TestTorchForwardSimulator:
    def test_matches_jax_sim(self):
        import numpy as np
        import pytest
        torch = pytest.importorskip('torch')
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.forwardsims.torchfwdsim import TorchForwardSimulator
        from pygsti_tpu.circuits import Circuit
        model = mp.target_model('full TP').depolarize(op_noise=0.03)
        circuits = [Circuit([('Gxpi2', 0)], line_labels=(0,)),
                    Circuit([('Gxpi2', 0), ('Gypi2', 0)], line_labels=(0,)),
                    Circuit([('Gypi2', 0)] * 3, line_labels=(0,))]
        layout = model.sim.create_layout(circuits)
        p_jax = model.sim.bulk_fill_probs(None, layout)
        J_jax = model.sim.bulk_fill_dprobs(None, layout)
        tsim = TorchForwardSimulator(model)
        p_t = tsim.bulk_fill_probs(None, layout)
        J_t = tsim.bulk_fill_dprobs(None, layout)
        assert np.allclose(p_t, p_jax, atol=1e-10)
        assert np.allclose(J_t, J_jax, atol=1e-8)
