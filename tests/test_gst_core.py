"""End-to-end GST core tests: objectives, LM, LGST, iterative GST — with
parity vs the reference on identical datasets."""

import numpy as np
import pytest

from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.data import simulate_data
from pygsti_tpu.algorithms.core import run_lgst, run_iterative_gst
from pygsti_tpu.objectivefns import (two_delta_logl, chi2, logl_max,
                                     ObjectiveFunctionBuilder,
                                     TimeIndependentMDCObjectiveFunction)


@pytest.fixture(scope='module')
def gst_setup():
    target = mp.target_model('full TP')
    datagen = mp.target_model('full TP').depolarize(op_noise=0.05, spam_noise=0.02)
    lists = create_lsgst_circuit_lists(target, mp.prep_fiducials(), mp.meas_fiducials(),
                                       mp.germs(), [1, 2, 4])
    ds = simulate_data(datagen, lists[-1], 1000, seed=1234)
    return target, datagen, lists, ds


class TestCircuitLists:
    def test_lists_match_reference(self, ref_pygsti, gst_setup):
        target, _, lists, _ = gst_setup
        from pygsti.modelpacks import smq1Q_XYI as rmp
        rlists = ref_pygsti.circuits.create_lsgst_circuit_lists(
            rmp.target_model(), rmp.prep_fiducials(), rmp.meas_fiducials(),
            rmp.germs(), [1, 2, 4])
        for ml, rl in zip(lists, rlists):
            assert len(ml) == len(rl)
            mset = set(tuple(str(l) for l in c.layertup) for c in ml)
            rset = set(tuple(str(l) for l in c.layertup) for c in rl)
            assert mset == rset


class TestObjectiveParity:
    """Objective values at the target model match the reference exactly."""

    def _ref_dataset(self, ref_pygsti, ds):
        rds = ref_pygsti.data.DataSet(outcome_labels=['0', '1'])
        for c in ds.keys():
            rds.add_count_dict(ref_pygsti.circuits.Circuit(c.str),
                               {k[0]: v for k, v in ds[c].counts.items()})
        rds.done_adding_data()
        return rds

    def test_chi2_matches(self, ref_pygsti, gst_setup):
        target, _, lists, ds = gst_setup
        rds = self._ref_dataset(ref_pygsti, ds)
        from pygsti.modelpacks import smq1Q_XYI as rmp
        rtarget = rmp.target_model('full TP')
        circuits = list(lists[-1])
        rcircuits = [ref_pygsti.circuits.Circuit(c.str) for c in circuits]
        my_val = chi2(target, ds, circuits)
        ref_val = ref_pygsti.tools.chi2(rtarget, rds, rcircuits)
        assert np.isclose(my_val, ref_val, rtol=1e-9), (my_val, ref_val)

    def test_two_delta_logl_matches(self, ref_pygsti, gst_setup):
        target, _, lists, ds = gst_setup
        rds = self._ref_dataset(ref_pygsti, ds)
        from pygsti.modelpacks import smq1Q_XYI as rmp
        rtarget = rmp.target_model('full TP')
        circuits = list(lists[-1])
        rcircuits = [ref_pygsti.circuits.Circuit(c.str) for c in circuits]
        my_val = two_delta_logl(target, ds, circuits)
        ref_val = ref_pygsti.tools.two_delta_logl(rtarget, rds, rcircuits)
        assert np.isclose(my_val, ref_val, rtol=1e-9), (my_val, ref_val)

    def test_dlsvec_matches_finite_difference(self, gst_setup):
        target, _, lists, ds = gst_setup
        circuits = list(lists[0])[:20]
        builder = ObjectiveFunctionBuilder.cast('logl')
        obj = builder.build(target, ds, circuits)
        v = target.to_vector()
        J = obj.dlsvec(v)
        f0 = obj.lsvec(v)
        eps = 1e-7
        for i in [0, 5, 17]:
            vp = v.copy()
            vp[i] += eps
            fd = (obj.lsvec(vp) - f0) / eps
            assert np.allclose(J[:, i], fd, atol=1e-5)


class TestGSTFit:
    def test_lgst_and_iterative_fit(self, gst_setup):
        target, datagen, lists, ds = gst_setup
        mdl_lgst = run_lgst(ds, mp.prep_fiducials(), mp.meas_fiducials(), target)
        models, results = run_iterative_gst(ds, mdl_lgst, lists, None, ['chi2'], ['logl'])
        final = models[-1]
        tdl = two_delta_logl(final, ds, list(lists[-1]))
        k = ds.degrees_of_freedom(list(lists[-1])) - final.num_params
        nsigma = (tdl - k) / np.sqrt(2 * k)
        assert nsigma < 5, "Fit quality too poor: 2dlogl=%g k=%d" % (tdl, k)

    def test_fit_matches_reference_estimate(self, ref_pygsti, gst_setup):
        """Same data -> same optimum (gauge-invariantly, via probabilities)."""
        target, datagen, lists, ds = gst_setup
        mdl_lgst = run_lgst(ds, mp.prep_fiducials(), mp.meas_fiducials(), target)
        models, _ = run_iterative_gst(ds, mdl_lgst, lists, None, ['chi2'], ['logl'])
        my_tdl = two_delta_logl(models[-1], ds, list(lists[-1]))

        from pygsti.modelpacks import smq1Q_XYI as rmp
        rds = ref_pygsti.data.DataSet(outcome_labels=['0', '1'])
        for c in ds.keys():
            rds.add_count_dict(ref_pygsti.circuits.Circuit(c.str),
                               {k[0]: v for k, v in ds[c].counts.items()})
        rds.done_adding_data()
        rlists = ref_pygsti.circuits.create_lsgst_circuit_lists(
            rmp.target_model(), rmp.prep_fiducials(), rmp.meas_fiducials(),
            rmp.germs(), [1, 2, 4])
        rtarget = rmp.target_model('full TP')
        r_lgst = ref_pygsti.algorithms.run_lgst(rds, rmp.prep_fiducials(),
                                                rmp.meas_fiducials(), rtarget,
                                                svd_truncate_to=4)
        res = ref_pygsti.algorithms.core.run_iterative_gst(
            rds, r_lgst, rlists, optimizer=None,
            iteration_objfn_builders=[
                ref_pygsti.objectivefns.ObjectiveFunctionBuilder.create_from('chi2')],
            final_objfn_builders=[
                ref_pygsti.objectivefns.ObjectiveFunctionBuilder.create_from('logl')],
            resource_alloc=None, verbosity=0)
        rmodels = res[0]
        ref_tdl = ref_pygsti.tools.two_delta_logl(rmodels[-1], rds, rlists[-1])
        assert abs(my_tdl - ref_tdl) < 1e-3, (my_tdl, ref_tdl)

        test_circs = list(lists[-1])[::10]
        my_p = models[-1].sim.bulk_probs(test_circs)
        ref_p = rmodels[-1].sim.bulk_probs(
            [ref_pygsti.circuits.Circuit(c.str) for c in test_circs])
        for c in test_circs:
            rc = ref_pygsti.circuits.Circuit(c.str)
            for o in ('0', '1'):
                assert abs(my_p[c][(o,)] - ref_p[rc][(o,)]) < 1e-4


class TestEndToEndReferenceParity:
    """Full iterative GST in both frameworks on identical data converges to
    the same estimate (SURVEY §4(c): estimates within gauge tolerance)."""

    def test_estimates_match_reference(self, ref_pygsti, gst_setup):
        import numpy as np
        target, datagen, lists, ds = gst_setup
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.protocols.gst import (GateSetTomographyDesign,
                                              GateSetTomography, GSTInitialModel)

        design = GateSetTomographyDesign(mp.target_model('full TP'),
                                         [list(l) for l in lists])
        gst = GateSetTomography(GSTInitialModel(model=mp.target_model('full TP')),
                                gaugeopt_suite='stdgaugeopt', verbosity=0,
                                name='GST')
        my_results = gst.run(ProtocolData(design, ds),
                             disable_checkpointing=True)
        my_est = my_results.estimates['GST']
        my_final = my_est.models['stdgaugeopt']

        # reference fit on the same counts
        rds = ref_pygsti.data.DataSet(outcome_labels=['0', '1'])
        for c in ds.keys():
            rds.add_count_dict(ref_pygsti.circuits.Circuit(c.str),
                               {k[0]: v for k, v in ds[c].counts.items()})
        rds.done_adding_data()
        from pygsti.modelpacks import smq1Q_XYI as rmp
        ref_results = ref_pygsti.drivers.run_long_sequence_gst(
            rds, rmp.target_model('full TP'), rmp.prep_fiducials(),
            rmp.meas_fiducials(), rmp.germs(), [1, 2, 4], verbosity=0)
        ref_est = ref_results.estimates[list(ref_results.estimates)[0]]
        gokey = [k for k in ref_est.models
                 if 'gaugeopt' in k.lower() or k == 'go0']
        ref_final = ref_est.models[gokey[0] if gokey else 'final iteration estimate']

        # objective parity at each framework's own optimum
        my_2dl = two_delta_logl(my_est.models['final iteration estimate'], ds,
                                list(lists[-1]))
        rcirc = [ref_pygsti.circuits.Circuit(c.str) for c in lists[-1]]
        ref_2dl = ref_pygsti.tools.two_delta_logl(
            ref_est.models['final iteration estimate'], rds, rcirc)
        assert abs(my_2dl - ref_2dl) < 0.1 + 1e-4 * abs(ref_2dl), \
            "final 2DeltaLogL differ: %g vs %g" % (my_2dl, ref_2dl)

        # gauge-optimized gate matrices agree
        for lbl in (('Gxpi2', 0), ('Gypi2', 0)):
            mine = np.asarray(my_final.operations[lbl].to_dense())
            theirs = np.asarray(ref_final.operations[
                ref_pygsti.baseobjs.Label(lbl)].to_dense())
            assert np.max(np.abs(mine - theirs)) < 5e-4, \
                "gauge-opted %s differs by %g" % (lbl,
                                                  np.max(np.abs(mine - theirs)))
