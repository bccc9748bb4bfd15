"""Tests for cloud-noise models."""

import numpy as np
import pytest

from pygsti_tpu.processors import QubitProcessorSpec
from pygsti_tpu.models.cloudnoisemodel import create_cloud_crosstalk_model_from_hops_and_weights
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.data import simulate_data


@pytest.fixture(scope='module')
def cloud_model():
    pspec = QubitProcessorSpec(3, ['Gxpi2', 'Gypi2', 'Gcnot'], geometry='line')
    return create_cloud_crosstalk_model_from_hops_and_weights(
        pspec, maxhops=1, max_idle_weight=1, extra_gate_weight=0, gate_type='H+s')


class TestCloudNoise:
    def test_ideal_at_zero_params(self, cloud_model):
        p = cloud_model.probabilities(Circuit('Gxpi2:1Gxpi2:1@(0,1,2)'))
        assert np.isclose(p[('010',)], 1.0, atol=1e-9)

    def test_cloud_extends_to_neighbors(self, cloud_model):
        """Error in Gxpi2:1's cloud can affect neighbor qubit 0 (maxhops=1)."""
        m = cloud_model.copy()
        v = np.zeros(m.num_params)
        cloud_op = m.operation_blks['cloudnoise'][('cloud', 'Gxpi2', (1,))]
        # find the H_X-on-qubit-0 coefficient within the cloud (qubits 0,1,2)
        eg = cloud_op.errorgen
        lbls = eg.blocks[0].basis_element_labels
        idx_xii = lbls.index('XII')  # X on first cloud qubit (=0)
        sl = cloud_op.gpindices
        v[sl.start + idx_xii] = 0.2
        m.from_vector(v)
        p = m.probabilities(Circuit('Gxpi2:1@(0,1,2)'))
        # some probability leaks onto qubit 0 outcomes
        leak = p[('110',)] + p[('100',)]
        assert leak > 1e-4, "cloud error did not affect neighbor (leak=%g)" % leak

    def test_no_cloud_effect_beyond_hops(self):
        """With maxhops=0 the cloud is only the gate's own qubit."""
        pspec = QubitProcessorSpec(3, ['Gxpi2', 'Gypi2', 'Gcnot'], geometry='line')
        m = create_cloud_crosstalk_model_from_hops_and_weights(
            pspec, maxhops=0, max_idle_weight=0, gate_type='H+s')
        cloud_op = m.operation_blks['cloudnoise'][('cloud', 'Gxpi2', (1,))]
        lbls = cloud_op.errorgen.blocks[0].basis_element_labels
        assert all(len(l) == 1 for l in lbls)  # single-qubit cloud

    def test_fit_cloud_model(self, cloud_model):
        """Cloud model evaluates objectives/Jacobians (fittable)."""
        from pygsti_tpu.objectivefns.objectivefns import (
            RawChi2Function, TimeIndependentMDCObjectiveFunction)
        m = cloud_model.copy()
        circs = [Circuit('Gxpi2:0Gcnot:0:1@(0,1,2)'),
                 Circuit('Gypi2:2Gcnot:1:2@(0,1,2)'),
                 Circuit('[Gxpi2:0Gypi2:2]@(0,1,2)')]
        truth = cloud_model.copy()
        vt = np.zeros(truth.num_params)
        vt[0:3] = 0.02
        truth.from_vector(vt)
        ds = simulate_data(truth, circs, 2000, seed=1)
        obj = TimeIndependentMDCObjectiveFunction(RawChi2Function(), m, ds, circs)
        ls, jtj, jtf = obj.jtj_jtf(m.to_vector())
        assert np.all(np.isfinite(jtj))
        assert jtj.shape == (m.num_params, m.num_params)
