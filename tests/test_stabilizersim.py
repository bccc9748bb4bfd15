"""Tests for the stabilizer (Clifford) forward simulator."""

import numpy as np
import pytest

from pygsti_tpu.circuits import Circuit
from pygsti_tpu.forwardsims.stabilizersim import StabilizerForwardSimulator
from pygsti_tpu.processors import QubitProcessorSpec
from pygsti_tpu.models.modelconstruction import create_explicit_model


class TestStabilizerSim:
    def test_deterministic_outcomes(self):
        sim = StabilizerForwardSimulator()
        p = sim.probs(Circuit('Gxpi:0@(0)'))
        assert np.isclose(p['1'], 1.0)

    def test_bell_state(self):
        sim = StabilizerForwardSimulator()
        c = Circuit('Gh:0Gcnot:0:1@(0,1)')
        p = sim.probs(c)
        assert np.isclose(p['00'], 0.5) and np.isclose(p['11'], 0.5)
        assert p.get('01', 0.0) == 0.0 and p.get('10', 0.0) == 0.0
        assert np.isclose(sim.probability(c, '00'), 0.5)
        assert np.isclose(sim.probability(c, '01'), 0.0)

    def test_ghz_state(self):
        sim = StabilizerForwardSimulator()
        c = Circuit('Gh:0Gcnot:0:1Gcnot:1:2@(0,1,2)')
        p = sim.probs(c)
        assert np.isclose(p['000'], 0.5) and np.isclose(p['111'], 0.5)

    def test_matches_dense_sim(self):
        """Random Clifford circuits: stabilizer probs match dense superop probs."""
        pspec = QubitProcessorSpec(2, ['Gh', 'Gp', 'Gxpi2', 'Gcnot'], geometry='line')
        dense = create_explicit_model(pspec, ideal_gate_type='static')
        stab = StabilizerForwardSimulator(pspec)
        rng = np.random.RandomState(0)
        names = [('Gh', 0), ('Gp', 0), ('Gxpi2', 1), ('Gh', 1), ('Gcnot', 0, 1)]
        for trial in range(5):
            layers = [names[rng.randint(len(names))] for _ in range(6)]
            c = Circuit(layers, (0, 1))
            p_dense = dense.probabilities(c)
            p_stab = stab.probs(c)
            for o in ('00', '01', '10', '11'):
                assert np.isclose(p_dense[(o,)], p_stab.get(o, 0.0), atol=1e-9), \
                    (trial, c.str, o)

    def test_large_n_fast(self):
        """30-qubit GHZ: poly-time single-outcome probability."""
        sim = StabilizerForwardSimulator()
        n = 30
        layers = [('Gh', 0)] + [('Gcnot', i, i + 1) for i in range(n - 1)]
        c = Circuit(layers, tuple(range(n)))
        assert np.isclose(sim.probability(c, '0' * n), 0.5)
        assert np.isclose(sim.probability(c, '1' * n), 0.5)
        assert np.isclose(sim.probability(c, '1' + '0' * (n - 1)), 0.0)
