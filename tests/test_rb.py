"""End-to-end RB tests: circuit sampling, simulation, decay fitting."""

import numpy as np
import pytest

from pygsti_tpu.processors import QubitProcessorSpec
from pygsti_tpu.algorithms.randomcircuit import (create_clifford_rb_circuit,
                                                 create_direct_rb_circuit,
                                                 create_mirror_rb_circuit)
from pygsti_tpu.algorithms.rbfit import std_least_squares_fit, p_to_r
from pygsti_tpu.protocols.rb import CliffordRBDesign, RandomizedBenchmarking
from pygsti_tpu.protocols.protocol import ProtocolData
from pygsti_tpu.models.modelconstruction import create_explicit_model
from pygsti_tpu.data import simulate_data
from pygsti_tpu.tools import symplectic as sym


@pytest.fixture(scope='module')
def pspec_1q():
    return QubitProcessorSpec(1, ['Gxpi2', 'Gypi2'])


@pytest.fixture(scope='module')
def pspec_2q():
    return QubitProcessorSpec(2, ['Gxpi2', 'Gypi2', 'Gcnot'], geometry='line')


class TestRBCircuits:
    def test_clifford_rb_circuit_identity(self, pspec_1q):
        """Without randomizeout the ideal outcome is all zeros and the
        circuit composes to the identity symplectic."""
        for seed in range(4):
            c, ideal = create_clifford_rb_circuit(pspec_1q, length=3, seed=seed)
            assert ideal == (0,)
            s, p = sym.symplectic_rep_of_clifford_circuit(c, pspec=pspec_1q)
            assert np.array_equal(s, np.identity(2, np.int64))

    def test_clifford_rb_randomizeout(self, pspec_1q):
        outs = set()
        for seed in range(8):
            c, ideal = create_clifford_rb_circuit(pspec_1q, length=2, seed=seed,
                                                  randomizeout=True)
            outs.add(ideal)
        assert len(outs) > 1, "randomizeout should produce varied outcomes"

    def test_clifford_rb_2q(self, pspec_2q):
        c, ideal = create_clifford_rb_circuit(pspec_2q, length=2, seed=5)
        assert ideal == (0, 0)

    def test_direct_rb(self, pspec_2q):
        c, ideal = create_direct_rb_circuit(pspec_2q, length=4, seed=7)
        assert len(ideal) == 2

    def test_mirror_rb(self, pspec_2q):
        c, ideal = create_mirror_rb_circuit(pspec_2q, length=4, seed=9,
                                            paulirandomize=True)
        assert len(ideal) == 2


class TestRBFit:
    def test_exact_decay_recovered(self):
        depths = np.array([0, 1, 2, 4, 8, 16, 32])
        a, b, p = 0.5, 0.5, 0.97
        asps = a + b * p ** depths
        fit = std_least_squares_fit(depths, asps, 1)
        assert fit['success']
        assert np.isclose(fit['estimates']['p'], p, atol=1e-6)
        assert np.isclose(fit['estimates']['r'], p_to_r(p, 2), atol=1e-6)


class TestRBEndToEnd:
    def test_1q_rb_recovers_depolarizing_rate(self, pspec_1q):
        """Simulate Clifford RB on a depolarized model; the fitted r should
        approximate the per-Clifford depolarization strength."""
        design = CliffordRBDesign(pspec_1q, None, depths=(0, 2, 4, 8, 16),
                                  circuits_per_depth=8, seed=2026)
        noise = 0.01
        model = create_explicit_model(pspec_1q, ideal_gate_type='full')
        model = model.depolarize(op_noise=noise)
        ds = simulate_data(model, design.all_circuits_needing_data, 2000, seed=4)
        data = ProtocolData(design, ds)
        rb = RandomizedBenchmarking(bootstrap_samples=20)
        results = rb.run(data)
        r = results.r
        # each Clifford compiles to ~2 native gates, each with EI ~= 3/4*noise...
        # just check r is positive, of sensible magnitude, and the decay fit worked
        assert results.fits['full']['success']
        assert 1e-4 < r < 0.2, "r = %g out of expected range" % r
        assert results.r_std is not None


class TestBinaryRB:
    def test_birb_design_and_analysis(self):
        """BiRB end-to-end: design, simulate weak depolarizing noise, fit
        energies decay (reference: rb.py:1024 BinaryRBDesign)."""
        import numpy as np
        from pygsti_tpu.processors import QubitProcessorSpec
        from pygsti_tpu.protocols.rb import BinaryRBDesign, RandomizedBenchmarking
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.models.modelconstruction import create_crosstalk_free_model
        from pygsti_tpu.data.datasetconstruction import simulate_data

        pspec = QubitProcessorSpec(2, ['Gxpi2', 'Gypi2', 'Gxpi', 'Gcnot'],
                                   geometry='line')
        design = BinaryRBDesign(pspec, depths=[0, 2, 6], circuits_per_depth=4,
                                seed=11)
        mdl = create_crosstalk_free_model(
            pspec, depolarization_strengths={g: 0.01 for g in pspec.gate_names})
        ds = simulate_data(mdl, design.all_circuits_needing_data, 400, seed=5)
        data = ProtocolData(design, ds)
        res = RandomizedBenchmarking(datatype='energies',
                                     bootstrap_samples=0).run(data)
        p = res.fits['full']['estimates']['p']
        assert 0.5 < p <= 1.0  # weak noise: polarization decays mildly

    def test_birb_noiseless_energy_is_sign(self):
        import numpy as np
        from pygsti_tpu.processors import QubitProcessorSpec
        from pygsti_tpu.algorithms.randomcircuit import create_binary_rb_circuit
        from pygsti_tpu.tools import symplectic as sym
        pspec = QubitProcessorSpec(2, ['Gxpi2', 'Gypi2', 'Gxpi', 'Gcnot'],
                                   geometry='line')
        for seed in range(4):
            circ, meas, sign = create_binary_rb_circuit(pspec, length=3,
                                                        seed=seed)
            s_c, p_c = sym.symplectic_rep_of_clifford_circuit(circ, pspec=pspec)
            st = sym.prep_stabilizer_state(2)
            out = sym.apply_clifford_to_stabilizer_state(s_c, p_c, *st)
            support = [i for i, ch in enumerate(meas) if ch == 'Z']
            exp = sum(sym.stabilizer_outcome_probability(*out, [b0, b1])
                      * (-1) ** sum([b0, b1][i] for i in support)
                      for b0 in (0, 1) for b1 in (0, 1))
            assert abs(exp - sign) < 1e-9


class TestInterleavedRB:
    def test_irb_end_to_end(self):
        """IRB: interleaved design + protocol produce an IRB number close to
        the interleaved gate's depolarizing error (reference: rb.py:1685)."""
        import numpy as np
        from pygsti_tpu.processors import QubitProcessorSpec
        from pygsti_tpu.circuits import Circuit
        from pygsti_tpu.protocols.rb import (InterleavedRBDesign,
                                             InterleavedRandomizedBenchmarking)
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.models.modelconstruction import create_crosstalk_free_model
        from pygsti_tpu.data.datasetconstruction import simulate_data

        pspec = QubitProcessorSpec(1, ['Gxpi2', 'Gypi2'])
        interleaved = Circuit([('Gxpi2', 0)], (0,))
        design = InterleavedRBDesign(pspec, interleaved, depths=[0, 2, 4, 8, 16],
                                     circuits_per_depth=10, seed=21)
        mdl = create_crosstalk_free_model(
            pspec, depolarization_strengths={'Gxpi2': 0.01, 'Gypi2': 0.001})
        ds = simulate_data(mdl, design.all_circuits_needing_data, 5000, seed=6)
        data = ProtocolData(design, ds)
        res = InterleavedRandomizedBenchmarking(bootstrap_samples=0).run(data)
        irb = res.irb_numbers['full']
        # Gxpi2 depol 0.01 -> EI infidelity ~ 0.01 * 3/4 = 0.0075
        assert 0.002 < irb < 0.02, irb
        # the interleaved arm must decay faster than the standard arm
        assert res.icrb_results.r > res.crb_results.r


class TestVBExtras:
    def test_periodic_mirror_design(self):
        import numpy as np
        from pygsti_tpu.processors import QubitProcessorSpec
        from pygsti_tpu.circuits import Circuit
        from pygsti_tpu.protocols.vb import PeriodicMirrorCircuitDesign
        from pygsti_tpu.tools import symplectic as sym
        pspec = QubitProcessorSpec(2, ['Gxpi2', 'Gypi2', 'Gxpi', 'Gzpi',
                                       'Gypi', 'Gcnot'], geometry='line')
        germ = Circuit([[('Gxpi2', 0), ('Gypi2', 1)], [('Gcnot', 0, 1)]], (0, 1))
        design = PeriodicMirrorCircuitDesign(pspec, [0, 4], 3, germ, seed=4)
        for circs, ideals in zip(design.circuit_lists, design.idealout_lists):
            for c, ideal in zip(circs, ideals):
                s_c, p_c = sym.symplectic_rep_of_clifford_circuit(c, pspec=pspec)
                st = sym.prep_stabilizer_state(2)
                out = sym.apply_clifford_to_stabilizer_state(s_c, p_c, *st)
                assert abs(sym.stabilizer_outcome_probability(
                    *out, list(ideal)) - 1.0) < 1e-9

    def test_vbdataframe(self):
        import numpy as np
        from pygsti_tpu.protocols.vbdataframe import (VBDataFrame,
                                                      classify_circuit_shape)
        rng = np.random.RandomState(0)
        rows = []
        for d in [2, 4, 8]:
            for w in [1, 2]:
                for _ in range(5):
                    sp = max(0, 1.0 - 0.05 * d * w + rng.randn() * 0.01)
                    rows.append({'Depth': d, 'Width': w, 'polarization': sp,
                                 'total_counts': 100})
        vbdf = VBDataFrame.from_benchmarking_data(rows)
        vb = vbdf.vb_data(statistic='mean')
        assert vb[(2, 1)] > vb[(8, 2)]
        regions = vbdf.capability_regions(threshold=0.7)
        assert regions[(2, 1)] == 2 and regions[(8, 2)] == 0
        # monotonic_min never increases with depth/width
        vbm = vbdf.vb_data(statistic='monotonic_min')
        assert vbm[(8, 2)] <= vbm[(2, 1)]
        # classify: clearly-above and clearly-below
        assert classify_circuit_shape([0.9] * 10, [500] * 10, 0.5) == 2
        assert classify_circuit_shape([0.1] * 10, [500] * 10, 0.5) == 0
        assert classify_circuit_shape([0.9] * 5 + [0.1] * 5, [500] * 10, 0.5) == 1
