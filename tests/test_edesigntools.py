"""Tests for experiment-design tools and free-form data simulators."""

import numpy as np
import pytest

from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.protocols.protocol import ExperimentDesign
from pygsti_tpu.tools.edesigntools import (
    calculate_edesign_estimated_runtime, calculate_fisher_information_matrix,
    calculate_fisher_information_matrices_by_L,
    calculate_fisher_information_per_circuit, pad_edesign_with_idle_lines)
from pygsti_tpu.data.freedataset import FreeformDataSet
from pygsti_tpu.protocols.freeformsim import (ModelFreeformSimulator,
                                              ModelDatasetSimulator)

CIRCS = [Circuit([('Gxpi2', 0)], (0,)),
         Circuit([('Gxpi2', 0), ('Gypi2', 0)], (0,))]


class TestEdesignTools:
    def test_runtime_estimation(self):
        ed = ExperimentDesign(CIRCS, (0,))
        t = calculate_edesign_estimated_runtime(
            ed, gate_time_1Q=50e-9, gate_time_2Q=200e-9,
            measure_reset_time=1e-6, total_shots_per_circuit=1000)
        # 3 gates * 50ns + 2 * 1us reset, 1000 shots
        assert np.isclose(t, (3 * 50e-9 + 2 * 1e-6) * 1000)
        # batching latency adds time
        t2 = calculate_edesign_estimated_runtime(
            ed, gate_time_1Q=50e-9, gate_time_2Q=200e-9,
            measure_reset_time=1e-6, total_shots_per_circuit=1000,
            circuits_per_batch=1, interbatch_latency=0.1)
        assert t2 > t

    def test_fisher_information(self):
        m = mp.target_model('full')
        F = calculate_fisher_information_matrix(m, CIRCS, num_shots=100)
        assert F.shape == (m.num_params, m.num_params)
        assert np.linalg.eigvalsh(F).min() > -1e-8  # PSD
        # shots scale linearly
        F2 = calculate_fisher_information_matrix(m, CIRCS, num_shots=200)
        assert np.allclose(F2, 2 * F)

    def test_fisher_by_L_cumulative(self):
        m = mp.target_model('full')
        byL = calculate_fisher_information_matrices_by_L(
            m, [CIRCS[:1], CIRCS], [1, 2])
        # cumulative: L=2 >= L=1 in PSD order
        d = byL[2] - byL[1]
        assert np.linalg.eigvalsh(d).min() > -1e-8

    def test_pad_with_idle_lines(self):
        ed = ExperimentDesign(CIRCS, (0,))
        pad = pad_edesign_with_idle_lines(ed, (0, 1))
        for c in pad.all_circuits_needing_data:
            assert c.line_labels == (0, 1)


class TestFreeform:
    def test_freeform_dataset(self):
        ds = FreeformDataSet(circuits=CIRCS)
        ds[CIRCS[0]] = {'fidelity': 0.99}
        assert ds[CIRCS[0]]['fidelity'] == 0.99
        df = ds.to_dataframe()
        assert 'Circuit' in df.columns

    def test_model_freeform_simulator(self):
        m = mp.target_model('static')
        ed = ExperimentDesign(CIRCS, (0,))
        data = ModelFreeformSimulator({'target': m}).run(ed)
        info = data.dataset[CIRCS[0]]
        assert abs(info['target probs 0'] - 0.5) < 1e-10

    def test_model_dataset_simulator(self):
        m = mp.target_model('static')
        ed = ExperimentDesign(CIRCS, (0,))
        data = ModelDatasetSimulator(m, 500, seed=3).run(ed)
        assert data.dataset[CIRCS[0]].total == 500
