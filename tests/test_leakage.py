"""Tests for leakage (3-level) models and metrics."""

import numpy as np
import pytest
import scipy.linalg as spl

from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.leakage import (create_3level_model, to_3level_unitary,
                                gate_leakage_rate, gate_seepage_rate)
from pygsti_tpu.tools.optools import unitary_to_superop


class TestLeakage:
    def test_embedding_preserves_probabilities(self):
        """Ideal 3-level model reproduces the 2-level probabilities."""
        m2 = mp.target_model('static')
        m3 = create_3level_model(m2, gate_type='static')
        for cstr in ['Gxpi2:0@(0)', 'Gxpi2:0Gxpi2:0@(0)', 'Gxpi2:0Gypi2:0@(0)']:
            c = Circuit(cstr)
            p2 = m2.probabilities(c)
            p3 = m3.probabilities(c)
            for o in ('0', '1'):
                assert np.isclose(p2[(o,)], p3[(o,)], atol=1e-9), (cstr, o)

    def test_leakage_rate_of_leaky_gate(self):
        """A gate coupling |1> <-> |2> has nonzero leakage rate."""
        theta = 0.2
        h = np.zeros((3, 3), dtype=complex)
        h[1, 2] = h[2, 1] = theta
        u_leaky = spl.expm(-1j * h) @ to_3level_unitary(
            np.array([[0, 1], [1, 0]], dtype=complex))
        g = np.real(unitary_to_superop(u_leaky, 'gm'))
        rate = gate_leakage_rate(g)
        assert 0.001 < rate < 0.1
        # ideal gate: no leakage
        g_ideal = np.real(unitary_to_superop(
            to_3level_unitary(np.array([[0, 1], [1, 0]], dtype=complex)), 'gm'))
        assert gate_leakage_rate(g_ideal) < 1e-12

    def test_seepage(self):
        theta = 0.3
        h = np.zeros((3, 3), dtype=complex)
        h[1, 2] = h[2, 1] = theta
        g = np.real(unitary_to_superop(spl.expm(-1j * h), 'gm'))
        assert gate_seepage_rate(g) > 0.001

    def test_fit_3level_model(self):
        """3-level GST: fit a leaky dataset with a full 3-level model."""
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.objectivefns import two_delta_logl
        m3 = create_3level_model(mp.target_model('static'), gate_type='static')
        circs = [Circuit('Gxpi2:0@(0)'), Circuit('Gxpi2:0Gxpi2:0@(0)'),
                 Circuit('Gypi2:0Gxpi2:0@(0)')]
        ds = simulate_data(m3, circs, 1000, seed=2)
        tdl = two_delta_logl(m3, ds, circs)
        k = ds.degrees_of_freedom(circs)
        assert tdl < k + 5 * np.sqrt(2 * max(k, 1))


class TestSubspaceMetricsAndLAGO:
    def test_subspace_metrics_ideal_vs_leaky(self):
        import numpy as np
        from pygsti_tpu.leakage.models import to_3level_unitary
        from pygsti_tpu.leakage.metrics import (
            subspace_entanglement_fidelity, subspace_jtracedist,
            subspace_superop_fro_dist, subspace_restriction)
        from pygsti_tpu.tools.optools import unitary_to_superop
        theta = np.pi / 2
        u2 = np.array([[np.cos(theta / 2), -1j * np.sin(theta / 2)],
                       [-1j * np.sin(theta / 2), np.cos(theta / 2)]])
        u3 = to_3level_unitary(u2)
        S = unitary_to_superop(u3, 'gm')
        # identical ops: perfect subspace fidelity
        f = subspace_entanglement_fidelity(S, S, 'gm')
        assert abs(f - 1.0) < 1e-9
        assert subspace_jtracedist(S, S, 'gm') < 1e-9
        # the subspace restriction of the embedded 2-level unitary equals
        # the 2-level superoperator
        S2 = unitary_to_superop(u2, 'pp')
        R = subspace_restriction(S, 'gm')
        assert np.allclose(R, S2, atol=1e-9), np.max(np.abs(R - S2))
        # leaky op: rotate |1> toward |2>
        eps = 0.1
        leak = np.eye(3, dtype=complex)
        leak[1, 1] = leak[2, 2] = np.cos(eps)
        leak[1, 2] = -np.sin(eps)
        leak[2, 1] = np.sin(eps)
        S_leaky = unitary_to_superop(leak @ u3, 'gm')
        assert subspace_entanglement_fidelity(S_leaky, S, 'gm') < 1.0 - 1e-4
        assert subspace_superop_fro_dist(S_leaky, S, 'gm') > 1e-2

    def test_direct_sum_gauge_group(self):
        import numpy as np
        import jax.numpy as jnp
        from pygsti_tpu.leakage.gaugeopt import DirectSumUnitaryGaugeGroup
        from pygsti_tpu.leakage.models import create_3level_model
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        mdl3 = create_3level_model(mp.target_model('full TP'))
        g = DirectSumUnitaryGaugeGroup(mdl3.state_space, 'gm')
        assert g.num_params == 5  # u(2) + u(1)
        v = np.random.RandomState(0).randn(5) * 0.1
        S = np.asarray(g.element_matrix_jax(jnp.asarray(v)))
        assert S.shape == (9, 9)
        # gauge transform must preserve the computational block structure:
        # acting on a computational-subspace state stays computational
        from pygsti_tpu.leakage.metrics import subspace_restriction
        R = subspace_restriction(S, 'gm')
        # restricted gauge element is itself a unitary superop (orthogonal)
        assert np.allclose(R @ R.T, np.eye(4), atol=1e-8)
