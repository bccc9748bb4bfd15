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
