"""Tests for confidence regions (Hessian-based error bars)."""

import numpy as np
import pytest

from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.protocols.protocol import ProtocolData
from pygsti_tpu.protocols.gst import StandardGSTDesign, GateSetTomography
from pygsti_tpu.data import simulate_data


class TestConfidenceRegions:
    def test_error_bars_scale_with_shots(self):
        """Error bars from the projected Hessian shrink ~1/sqrt(N)."""
        from pygsti_tpu.report.reportables import entanglement_infidelity
        design = StandardGSTDesign(mp.target_model('full TP'), mp.prep_fiducials(),
                                   mp.meas_fiducials(), mp.germs(), [1, 2])
        datagen = mp.target_model('full TP').depolarize(op_noise=0.02)
        target = mp.target_model('full TP')

        ebs = []
        for N in (300, 3000):
            ds = simulate_data(datagen, design.all_circuits_needing_data, N, seed=3)
            results = GateSetTomography(gaugeopt_suite=None, verbosity=0,
                                        name='GST').run(ProtocolData(design, ds))
            est = results.estimates['GST']
            crf = est.create_confidence_region_factory()
            crf.compute_hessian(approximate=True)
            crf.project_hessian()
            view = crf.view(95)

            def fn(mdl):
                return entanglement_infidelity(
                    mdl.operations[('Gxpi2', 0)].to_dense(),
                    target.operations[('Gxpi2', 0)].to_dense())
            eb = view.compute_uncertainty(fn)
            assert eb > 0
            ebs.append(eb)
        ratio = ebs[0] / ebs[1]
        assert 1.5 < ratio < 7, "error bars should shrink ~sqrt(10): ratio=%g" % ratio


class TestReferenceParity:
    """Hessian + non-gauge projection + profile-likelihood intervals match
    the reference oracle on smq1Q_XYI (VERDICT round-1 item 6)."""

    def test_hessian_and_intervals_match_reference(self, ref_pygsti):
        import types
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        from pygsti_tpu.protocols.confidenceregionfactory import (
            ConfidenceRegionFactory)

        mymdl = mp.target_model('full TP').depolarize(op_noise=0.05,
                                                      spam_noise=0.02)
        lists = create_lsgst_circuit_lists(
            mp.target_model('full TP'), mp.prep_fiducials(),
            mp.meas_fiducials(), mp.germs(), [1, 2])
        circuits = list(lists[-1])
        ds = simulate_data(mymdl, circuits, 1000, seed=77)

        # reference copies of the model / dataset / circuits
        from pygsti.modelpacks import smq1Q_XYI as rmp
        rmdl = rmp.target_model('full TP').depolarize(op_noise=0.05,
                                                      spam_noise=0.02)
        rds = ref_pygsti.data.DataSet(outcome_labels=['0', '1'])
        for c in ds.keys():
            rds.add_count_dict(ref_pygsti.circuits.Circuit(c.str),
                               {k[0]: v for k, v in ds[c].counts.items()})
        rds.done_adding_data()
        rcircuits = [ref_pygsti.circuits.Circuit(c.str) for c in circuits]

        # --- Hessians: ours is d2(DeltaLogL) = -d2(logL) -------------------
        H_ref = ref_pygsti.tools.logl_hessian(rmdl, rds, rcircuits,
                                              1e-4, (-1e6, 1e6), 1e-4)
        results_ns = types.SimpleNamespace(dataset=ds,
                                           circuit_lists={'final': circuits})
        est_ns = types.SimpleNamespace(models={'final iteration estimate': mymdl},
                                       parent=results_ns)
        crf = ConfidenceRegionFactory(est_ns)
        H_my = crf.compute_hessian()
        # parameter ordering may differ between frameworks: compare the
        # (permutation-invariant) eigenvalue spectra
        ev_my = np.sort(np.linalg.eigvalsh((H_my + H_my.T) / 2))
        ev_ref = np.sort(np.linalg.eigvalsh(-(H_ref + H_ref.T) / 2))
        scale = np.max(np.abs(ev_ref))
        assert np.allclose(ev_my, ev_ref, atol=2e-6 * scale), \
            "Hessian spectra differ: max rel err %g" % (
                np.max(np.abs(ev_my - ev_ref)) / scale)

        # --- std-projected profile-likelihood intervals --------------------
        crf.project_hessian('std')
        view = crf.view(95)
        my_ints = {}
        for lbl in (('Gxpi2', 0), ('Gypi2', 0), ()):
            my_ints[lbl] = view.retrieve_profile_likelihood_confidence_intervals(lbl)

        RefCRF = ref_pygsti.protocols.confidenceregionfactory.ConfidenceRegionFactory
        rest = types.SimpleNamespace(models={'final iteration estimate': rmdl},
                                     parent=None)
        rcrf = RefCRF(rest, 'final iteration estimate', 'final',
                      hessian=H_ref, non_mark_radius_sq=0.0)
        rcrf.project_hessian('std', verbosity=0)
        rview = rcrf.view(95)
        RLabel = ref_pygsti.baseobjs.Label
        for lbl in (('Gxpi2', 0), ('Gypi2', 0), ()):
            ref_iv = rview.retrieve_profile_likelihood_confidence_intervals(
                RLabel(lbl) if lbl else RLabel(()))
            mine = np.asarray(my_ints[lbl])
            ref_iv = np.asarray(ref_iv)
            assert mine.shape == ref_iv.shape
            # VERDICT tolerance: gate error bars within ~10% of the reference
            denom = np.maximum(np.abs(ref_iv), 1e-12)
            assert np.max(np.abs(mine - ref_iv) / denom) < 0.10, \
                "intervals for %r deviate >10%%" % (lbl,)
