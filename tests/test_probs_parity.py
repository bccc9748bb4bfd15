"""Strict forward-probability parity vs the reference oracle at 1e-10.

BASELINE.md requires outcome probabilities matching the reference to 1e-10;
this checks bulk probs directly on the 2Q benchmark workload (smq2Q_XYICNOT
germ-power circuits on a depolarized model) and on a 1Q model, against the
reference's MatrixForwardSimulator."""

import numpy as np
import pytest


def _ref_bulk_probs(ref_pygsti, rmodel, circuit_strs):
    rcircuits = [ref_pygsti.circuits.Circuit(s) for s in circuit_strs]
    return rmodel.sim.bulk_probs(rcircuits), rcircuits


class TestProbsParity1e10:
    def test_1q_depolarized_probs(self, ref_pygsti):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        from pygsti.modelpacks import smq1Q_XYI as rmp

        target = mp.target_model('full TP').depolarize(op_noise=0.03,
                                                       spam_noise=0.01)
        rtarget = rmp.target_model('full TP').depolarize(op_noise=0.03,
                                                         spam_noise=0.01)
        lists = create_lsgst_circuit_lists(
            mp.target_model('full TP'), mp.prep_fiducials(),
            mp.meas_fiducials(), mp.germs(), [1, 2, 4, 8])
        circuits = list(lists[-1])
        p_mine = target.sim.bulk_probs(circuits)
        ref_probs, rcircuits = _ref_bulk_probs(
            ref_pygsti, rtarget, [c.str for c in circuits])
        max_err = 0.0
        for c, rc in zip(circuits, rcircuits):
            mine = p_mine[c]
            ref = ref_probs[rc]
            for outcome, v in mine.items():
                max_err = max(max_err, abs(v - ref[outcome]))
        assert max_err < 1e-10, "max |p - p_ref| = %g" % max_err

    def test_2q_benchmark_workload_probs(self, ref_pygsti):
        """The driver-benchmark model family (smq2Q_XYICNOT, depolarized
        'full TP') at maxL=4: probabilities match to 1e-10."""
        from pygsti_tpu.modelpacks import smq2Q_XYICNOT as mp
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        from pygsti.modelpacks import smq2Q_XYICNOT as rmp

        target = mp.target_model('full TP').depolarize(op_noise=0.01,
                                                       spam_noise=0.01)
        rtarget = rmp.target_model('full TP').depolarize(op_noise=0.01,
                                                         spam_noise=0.01)
        lists = create_lsgst_circuit_lists(
            mp.target_model('full TP'), mp.prep_fiducials(),
            mp.meas_fiducials(), mp.germs(), [1, 2, 4])
        circuits = list(lists[-1])[::7]  # every 7th: keep the oracle fast
        p_mine = target.sim.bulk_probs(circuits)
        ref_probs, rcircuits = _ref_bulk_probs(
            ref_pygsti, rtarget, [c.str for c in circuits])
        max_err = 0.0
        for c, rc in zip(circuits, rcircuits):
            mine = p_mine[c]
            ref = ref_probs[rc]
            for outcome, v in mine.items():
                max_err = max(max_err, abs(v - ref[outcome]))
        assert max_err < 1e-10, "max |p - p_ref| = %g" % max_err

    def test_2q_jacobian_parity(self, ref_pygsti):
        """Jacobian of probs matches the reference's analytic derivatives
        (a handful of circuits; 1e-8 absolute)."""
        from pygsti_tpu.modelpacks import smq2Q_XYICNOT as mp
        from pygsti.modelpacks import smq2Q_XYICNOT as rmp
        from pygsti_tpu.circuits.circuit import Circuit

        target = mp.target_model('full TP').depolarize(op_noise=0.01)
        rtarget = rmp.target_model('full TP').depolarize(op_noise=0.01)
        strs = ['Gxpi2:0@(0,1)', 'Gcnot:0:1@(0,1)',
                'Gxpi2:0Gcnot:0:1Gypi2:1@(0,1)']
        circuits = [Circuit(s) for s in strs]
        dps = target.sim.bulk_dprobs(circuits)
        rdps = rtarget.sim.bulk_dprobs(
            [ref_pygsti.circuits.Circuit(s) for s in strs])
        for c, rc in zip(circuits, rdps.keys()):
            for outcome, dvec in dps[c].items():
                np.testing.assert_allclose(dvec, rdps[rc][outcome],
                                           atol=1e-8)
