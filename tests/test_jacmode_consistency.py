"""Cross-mode Jacobian consistency (VERDICT r4 #8 / r5 mode table).

The three production Jacobian engines -- 'blocked' (depth-bucketed reverse
scan, the TPU default), 'prodjac' (dproduct-cache tangents through the
germ-power product-cache levels; the reference's
_compute_dproduct_cache analog, matrixforwardsim.py:729), and 'linearize'
(vmapped jax.linearize tangents) -- must produce the same lsvec, JTJ, JTf
and dlsvec at f64.  The bench records which mode ran in its JSON
(`jac_mode`); this pins that they are interchangeable up to float
reassociation.
"""

import os

import numpy as np
import pytest

from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
from pygsti_tpu.data import simulate_data
from pygsti_tpu.objectivefns.objectivefns import (
    RawPoissonPicDeltaLogLFunction, TimeIndependentMDCObjectiveFunction)


@pytest.fixture(scope='module')
def jac_setup():
    target = mp.target_model('full TP')
    datagen = target.copy().depolarize(op_noise=0.03, spam_noise=0.01)
    lists = create_lsgst_circuit_lists(
        target, mp.prep_fiducials(), mp.meas_fiducials(), mp.germs(), [1, 2, 4])
    circuits = list(lists[-1])
    ds = simulate_data(datagen, circuits, 500, seed=5)
    return target, datagen, circuits, ds


def _build(mode, ds, circuits):
    os.environ['PYGSTI_TPU_JAC_MODE'] = mode
    try:
        raw = RawPoissonPicDeltaLogLFunction({'min_prob_clip': 1e-4,
                                              'radius': 1e-4})
        m = mp.target_model('full TP')   # fresh model -> fresh graphs
        return TimeIndependentMDCObjectiveFunction(raw, m, ds, circuits)
    finally:
        del os.environ['PYGSTI_TPU_JAC_MODE']


class TestJacModeConsistency:
    def test_modes_agree_at_f64(self, jac_setup):
        target, datagen, circuits, ds = jac_setup
        v = datagen.to_vector()
        results = {}
        for mode in ('blocked', 'prodjac', 'linearize'):
            obj = _build(mode, ds, circuits)
            assert obj._fns['jac_mode'] == mode
            ls, jtj, jtf = obj.jtj_jtf(v)
            J = obj.dlsvec(v)
            results[mode] = (ls, jtj, jtf, J)
        base = results['blocked']
        for mode in ('prodjac', 'linearize'):
            for i, (name, tol) in enumerate(
                    [('lsvec', 1e-9), ('jtj', 1e-8), ('jtf', 1e-10),
                     ('dlsvec', 1e-7)]):
                a, b = base[i], results[mode][i]
                scale = max(np.max(np.abs(a)), 1e-300)
                diff = np.max(np.abs(a - b)) / scale
                assert diff < tol, (mode, name, diff)

    def test_depth_buckets_match_flat(self, jac_setup):
        """The depth-bucketed blocked Jacobian equals the single flat-depth
        block formulation exactly (same math, different padding)."""
        target, datagen, circuits, ds = jac_setup
        v = datagen.to_vector()
        obj_b = _build('blocked', ds, circuits)
        os.environ['PYGSTI_TPU_DEPTH_BUCKETS'] = '0'
        try:
            obj_f = _build('blocked', ds, circuits)
        finally:
            del os.environ['PYGSTI_TPU_DEPTH_BUCKETS']
        ls_b, jtj_b, jtf_b = obj_b.jtj_jtf(v)
        ls_f, jtj_f, jtf_f = obj_f.jtj_jtf(v)
        assert np.allclose(ls_b, ls_f, atol=1e-12)
        assert np.allclose(jtf_b, jtf_f, atol=1e-10 * np.max(np.abs(jtf_f)))
        assert np.allclose(jtj_b, jtj_f, atol=1e-10 * np.max(np.abs(jtj_f)))
