"""Tests for RPE, volumetric benchmarks, drift analysis, and IO."""

import numpy as np
import pytest

from pygsti_tpu.circuits import Circuit
from pygsti_tpu.data import DataSet, simulate_data


class TestRPE:
    def test_angle_recovery(self):
        """RPE recovers a known rotation angle from ideal counts."""
        from pygsti_tpu.algorithms.robust_phase_estimation import rpe_phase_estimate
        theta = np.pi / 2 + 0.01  # slightly over-rotated X(pi/2)
        N = 10000
        cos_counts, sin_counts = [], []
        for k in range(6):
            m = 2 ** k
            p_cos = (1 + np.cos(m * theta)) / 2
            p_sin = (1 + np.sin(m * theta)) / 2
            cos_counts.append((int(N * p_cos), N - int(N * p_cos)))
            sin_counts.append((int(N * p_sin), N - int(N * p_sin)))
        est = rpe_phase_estimate(cos_counts, sin_counts)
        assert np.isclose(est % (2 * np.pi), theta, atol=1e-3), (est, theta)

    def test_rpe_protocol(self):
        from pygsti_tpu.protocols.rpe import (RobustPhaseEstimationDesign,
                                              RobustPhaseEstimationProtocol)
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.baseobjs import Label
        theta_err = 0.02
        model = mp.target_model('full')
        # over-rotate Gxpi2 by theta_err
        import scipy.linalg as spl
        from pygsti_tpu.tools.internalgates import sigmaX
        from pygsti_tpu.tools.optools import unitary_to_pauligate
        u = spl.expm(-1j * (np.pi / 2 + theta_err) / 2 * sigmaX)
        from pygsti_tpu.modelmembers.operations import FullArbitraryOp
        model.operations[Label('Gxpi2', 0)] = FullArbitraryOp(
            np.real(unitary_to_pauligate(u)))

        # cos: |0> + Gx^d -> measure (p0 = (1+cos d theta)/2)
        # sin: extra Gx at the start shifts to sin quadrature
        design = RobustPhaseEstimationDesign(
            Label('Gxpi2', 0), [1, 2, 4, 8, 16, 32],
            qubit_labels=(0,), sin_meas=[Label('Gxpi2', 0)])
        ds = simulate_data(model, design.all_circuits_needing_data, 50000, seed=7)
        data = ProtocolData(design, ds)
        res = RobustPhaseEstimationProtocol().run(data)
        # measured angle should be pi/2 + theta_err
        est = res.angle_estimate % (2 * np.pi)
        assert np.isclose(est, np.pi / 2 + theta_err, atol=2e-3), est


class TestVB:
    def test_summary_statistics(self):
        from pygsti_tpu.protocols.vb import ByDepthSummaryStatistics, polarization
        from pygsti_tpu.protocols.rb import CliffordRBDesign
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.processors import QubitProcessorSpec
        from pygsti_tpu.models.modelconstruction import create_explicit_model
        pspec = QubitProcessorSpec(1, ['Gxpi2', 'Gypi2'])
        design = CliffordRBDesign(pspec, None, depths=(0, 2), circuits_per_depth=3,
                                  seed=11)
        model = create_explicit_model(pspec, ideal_gate_type='full').depolarize(op_noise=0.02)
        ds = simulate_data(model, design.all_circuits_needing_data, 500, seed=3)
        stats_proto = ByDepthSummaryStatistics()
        res = stats_proto.run(ProtocolData(design, ds))
        sps = res.statistics['success_probabilities']
        assert set(sps.keys()) == {0, 2}
        assert all(0.3 < p <= 1.0 for p in sps[0])
        df = res.to_dataframe()
        assert len(df) == 6

    def test_polarization(self):
        from pygsti_tpu.protocols.vb import polarization
        assert np.isclose(polarization(1.0, 1), 1.0)
        assert np.isclose(polarization(0.5, 1), 0.0)


class TestDrift:
    def test_no_drift_on_constant(self):
        from pygsti_tpu.extras.drift.stabilityanalyzer import StabilityAnalyzer
        rng = np.random.RandomState(0)
        bits = rng.binomial(1, 0.5, 1000)
        detected, modes, _ = StabilityAnalyzer.analyze_clickstream(bits)
        assert not detected

    def test_detects_oscillation(self):
        from pygsti_tpu.extras.drift.stabilityanalyzer import StabilityAnalyzer
        rng = np.random.RandomState(1)
        T = 1000
        t = np.arange(T)
        p = 0.5 + 0.4 * np.cos(2 * np.pi * 5 * t / T)
        bits = rng.binomial(1, p)
        detected, modes, _ = StabilityAnalyzer.analyze_clickstream(bits)
        assert detected
        traj = StabilityAnalyzer.estimate_probability_trajectory(bits, modes)
        assert np.corrcoef(traj, p)[0, 1] > 0.8

    def test_stability_protocol(self):
        from pygsti_tpu.protocols.stability import StabilityAnalysis
        from pygsti_tpu.protocols.protocol import ProtocolData, ExperimentDesign
        rng = np.random.RandomState(2)
        ds = DataSet()
        T = 500
        t = np.arange(T)
        # drifting circuit
        p_drift = 0.5 + 0.35 * np.cos(2 * np.pi * 3 * t / T)
        bits = rng.binomial(1, p_drift)
        ds.add_raw_series_data(Circuit('Gxpi2:0@(0)'),
                               ['1' if b else '0' for b in bits], t.tolist())
        # stable circuit
        bits2 = rng.binomial(1, 0.3, T)
        ds.add_raw_series_data(Circuit('Gypi2:0@(0)'),
                               ['1' if b else '0' for b in bits2], t.tolist())
        design = ExperimentDesign(list(ds.keys()))
        res = StabilityAnalysis().run(ProtocolData(design, ds))
        assert res.instability_detected
        assert Circuit('Gxpi2:0@(0)') in res.unstable_circuits
        assert Circuit('Gypi2:0@(0)') not in res.unstable_circuits


class TestIO:
    def test_dataset_roundtrip(self, tmp_path):
        from pygsti_tpu.io import write_dataset, read_dataset
        ds = DataSet()
        ds.add_count_dict(Circuit('Gxpi2:0@(0)'), {'0': 55, '1': 45})
        ds.add_count_dict(Circuit('{}@(0)'), {'0': 99, '1': 1})
        path = str(tmp_path / 'test.txt')
        write_dataset(path, ds)
        ds2 = read_dataset(path)
        for c in ds.keys():
            assert dict(ds2[c].counts) == dict(ds[c].counts)

    def test_circuit_list_roundtrip(self, tmp_path):
        from pygsti_tpu.io import write_circuit_list, read_circuit_list
        circs = [Circuit('Gxpi2:0Gypi2:0@(0)'), Circuit('{}@(0)')]
        path = str(tmp_path / 'circuits.txt')
        write_circuit_list(path, circs)
        circs2 = read_circuit_list(path)
        assert circs2 == circs

    def test_reference_format_compat(self, ref_pygsti, tmp_path):
        """Reference can read datasets we write."""
        from pygsti_tpu.io import write_dataset
        ds = DataSet()
        ds.add_count_dict(Circuit('Gxpi2:0@(0)'), {'0': 55, '1': 45})
        path = str(tmp_path / 'compat.txt')
        write_dataset(path, ds)
        rds = ref_pygsti.io.read_dataset(path)
        rc = ref_pygsti.circuits.Circuit('Gxpi2:0@(0)')
        assert rds[rc]['0'] == 55 and rds[rc]['1'] == 45


class TestNewModelpacks:
    def test_all_2q_packs_load(self):
        import importlib
        for n in ['smq2Q_XY', 'smq2Q_XYI', 'smq2Q_XYI1', 'smq2Q_XYI2',
                  'smq2Q_XXII', 'smq2Q_XXYYII', 'smq2Q_XYXX', 'smq2Q_XYZZ',
                  'smq2Q_XYZICNOT', 'smq2Q_XYICPHASE',
                  'smq2Q_XXII_condensed', 'smq2Q_XXYYII_condensed']:
            m = importlib.import_module('pygsti_tpu.modelpacks.' + n)
            tm = m.target_model('static')
            c = m.prep_fiducials()[1] + m.germs()[1] + m.meas_fiducials()[1]
            p = tm.probabilities(c)
            assert abs(sum(p.values()) - 1.0) < 1e-9, n

    def test_single_qubit_restricted_packs(self):
        from pygsti_tpu.modelpacks import smq2Q_XYI1, smq2Q_XYI2
        assert len(smq2Q_XYI1.target_model('static').operations) == 3
        assert len(smq2Q_XYI2.target_model('static').operations) == 3

    def test_rpe_packs(self):
        import numpy as np
        from pygsti_tpu.modelpacks import smq1Q_Xpi2_rpe
        d = smq1Q_Xpi2_rpe.create_rpe_experiment_design(8)
        assert len(d.depths) == 4  # 1,2,4,8


class TestRunLinearGST:
    def test_run_linear_gst_driver(self):
        import numpy as np
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data.datasetconstruction import simulate_data
        from pygsti_tpu.circuits.gstcircuits import create_lgst_circuits
        from pygsti_tpu.drivers.longsequence import run_linear_gst
        from pygsti_tpu.tools.optools import entanglement_fidelity
        t = mp.target_model('full')
        circs = create_lgst_circuits(mp.prep_fiducials(), mp.meas_fiducials(), t)
        ds = simulate_data(t.copy().depolarize(op_noise=0.02), circs, 5000,
                           seed=1)
        res = run_linear_gst(ds, mp.target_model('full TP'),
                             mp.prep_fiducials(), mp.meas_fiducials(),
                             verbosity=0)
        est = res.estimates[list(res.estimates.keys())[0]]
        mdl = est.models['stdgaugeopt']
        # LGST + gaugeopt should land near the true (depolarized) gates
        from pygsti_tpu.baseobjs.label import Label
        f = entanglement_fidelity(
            mdl.operations[Label('Gxpi2', 0)].to_dense(),
            t.operations[Label('Gxpi2', 0)].to_dense())
        assert f > 0.97


class TestStabilityAnalyzerMultiLevel:
    """Multi-level drift tests: per-outcome, per-circuit, global spectra +
    Hz frequencies + trajectories (reference: stabilityanalyzer.py)."""

    def _drifting_dataset(self, n_circuits=4, T=400, f_drift=5, amp=0.12):
        rng = np.random.RandomState(7)
        ds = DataSet()
        t = np.arange(T)
        for i in range(n_circuits):
            # coherent drift shared by all circuits
            p = 0.5 + amp * np.cos(2 * np.pi * f_drift * t / T)
            bits = rng.binomial(1, p)
            ds.add_raw_series_data(Circuit([('Gxpi2', 0)] * (i + 1), (0,)),
                                   ['1' if b else '0' for b in bits],
                                   (0.1 * t).tolist())
        return ds

    def test_global_test_catches_weak_coherent_drift(self):
        from pygsti_tpu.extras.drift.stabilityanalyzer import StabilityAnalyzer
        ds = self._drifting_dataset()
        an = StabilityAnalyzer(ds)
        an.compute_spectra()
        assert an.global_spectrum is not None
        results = an.run_instability_detection()
        # global (circuit-averaged) test flags the shared drift mode
        assert () in results or len(results) > 0
        assert an.instability_detected

    def test_drift_frequencies_in_hz(self):
        from pygsti_tpu.extras.drift.stabilityanalyzer import StabilityAnalyzer
        ds = self._drifting_dataset(n_circuits=1, T=400, f_drift=20, amp=0.3)
        an = StabilityAnalyzer(ds)
        an.compute_spectra()
        an.run_instability_detection()
        c = list(ds.keys())[0]
        freqs = an.drift_frequencies_hz(c)
        assert freqs, "drift frequency not detected"
        # timestep 0.1s, T=400 -> drift at 20/(2*0.1*400) * 2 = mode 40
        # in Hz: f = 20 cycles / (400*0.1 s) = 0.5 Hz
        assert any(abs(f - 0.5) < 0.05 for f in freqs), freqs

    def test_probability_trajectories_accessor(self):
        from pygsti_tpu.extras.drift.stabilityanalyzer import StabilityAnalyzer
        ds = self._drifting_dataset(n_circuits=1)
        an = StabilityAnalyzer(ds)
        an.compute_spectra()
        an.run_instability_detection()
        c = list(ds.keys())[0]
        trajs = an.probability_trajectories(c)
        assert trajs
        for o, traj in trajs.items():
            assert traj.min() >= 0 and traj.max() <= 1
            assert traj.std() > 0.01  # tracks the drift


class TestMultiPassAndRunners:
    def test_multipass_protocol(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.data.multidataset import MultiDataSet
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.protocols import (MultiPassProtocol, ModelTest,
                                          CircuitListsDesign)
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        target = mp.target_model('full TP')
        lists = create_lsgst_circuit_lists(target, mp.prep_fiducials(),
                                           mp.meas_fiducials(), mp.germs(), [1])
        circuits = list(lists[-1])
        mds = MultiDataSet()
        for i, name in enumerate(('pass0', 'pass1')):
            mds.add_dataset(name, simulate_data(
                target.depolarize(op_noise=0.02), circuits, 500, seed=i))
        design = CircuitListsDesign([circuits])
        data = ProtocolData(design, mds)
        proto = MultiPassProtocol(ModelTest(target, name='MT'))
        res = proto.run(data)
        assert set(res.passes.keys()) == {'pass0', 'pass1'}
        for r in res.passes.values():
            assert hasattr(r, 'data')


class TestLegacyDriverAdvancedOptions:
    """Round-5: run_long_sequence_gst honors advanced_options/output_pkl
    (previously accepted-and-ignored)."""

    def _setup(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        from pygsti_tpu.data import simulate_data
        target = mp.target_model('full TP')
        lists = create_lsgst_circuit_lists(
            target, mp.prep_fiducials(), mp.meas_fiducials(), mp.germs(), [1])
        ds = simulate_data(target.depolarize(op_noise=0.02),
                           list(lists[-1]), 300, seed=9)
        from pygsti_tpu.modelpacks import smq1Q_XYI
        return target, smq1Q_XYI, ds

    def test_advanced_options_and_pkl(self, tmp_path):
        import pickle
        from pygsti_tpu.drivers.longsequence import run_long_sequence_gst
        target, mp, ds = self._setup()
        pkl = str(tmp_path / 'res.pkl')
        res = run_long_sequence_gst(
            ds, target, mp.prep_fiducials(), mp.meas_fiducials(), mp.germs(),
            [1], advanced_options={'max_iterations': 10,
                                   'tolerance': 1e-5,
                                   'objective': 'chi2'},
            output_pkl=pkl, verbosity=0)
        assert res.estimates['GateSetTomography'] is not None
        with open(pkl, 'rb') as f:
            res2 = pickle.load(f)
        assert 'GateSetTomography' in res2.estimates

    def test_unknown_advanced_option_raises(self):
        import pytest as _pytest
        from pygsti_tpu.drivers.longsequence import run_long_sequence_gst
        target, mp, ds = self._setup()
        with _pytest.raises(ValueError, match='advanced_options'):
            run_long_sequence_gst(
                ds, target, mp.prep_fiducials(), mp.meas_fiducials(),
                mp.germs(), [1], advanced_options={'bogus_key': 1},
                verbosity=0)
