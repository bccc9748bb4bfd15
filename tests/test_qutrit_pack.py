"""stdQT_XYIMS qutrit model pack: reference parity + end-to-end GST.

The reference's own legacy qutrit pack circuits (bare gate names on line '*')
no longer evaluate with its default simulators; here they run end-to-end via
the layout's unique-name op aliasing.
"""

import numpy as np
import pytest

from pygsti_tpu.modelpacks.legacy import stdQT_XYIMS as qt


class TestQutritBasis:
    def test_qt_basis_matches_reference(self, ref_pygsti):
        from pygsti_tpu.baseobjs.basis import Basis
        b = Basis.cast('qt', 9)
        rb = ref_pygsti.baseobjs.Basis.cast('qt', 9)
        assert list(b.labels) == list(rb.labels)
        mine = np.array([np.asarray(e) for e in b.elements])
        ref = np.array([np.asarray(e) for e in rb.elements])
        assert np.abs(mine - ref).max() < 1e-12

    def test_qt_orthonormal(self):
        from pygsti_tpu.baseobjs.basisconstructors import qt_matrices
        mxs = qt_matrices(3)
        g = np.einsum('aij,bji->ab', mxs, mxs)
        assert np.abs(g - np.eye(9)).max() < 1e-12


class TestQutritPack:
    def test_sequence_data_matches_reference(self, ref_pygsti):
        from pygsti.modelpacks.legacy import stdQT_XYIMS as rqt
        for attr in ('prepStrs', 'effectStrs', 'germs', 'germs_lite'):
            mine = [tuple(str(l) for l in c.layertup) for c in getattr(qt, attr)]
            ref = [tuple(str(l) for l in c.layertup) for c in getattr(rqt, attr)]
            assert mine == ref, attr

    def test_target_model_matches_reference(self, ref_pygsti):
        from pygsti.modelpacks.legacy import stdQT_XYIMS as rqt
        tm, rm = qt.target_model(), rqt.target_model()
        assert tm.num_params == rm.num_params == 314
        refops = {str(k): k for k in rm.operations}
        assert set(str(k) for k in tm.operations) == set(refops)
        for lbl in tm.operations:
            d = np.abs(np.asarray(tm.operations[lbl].to_dense(), dtype=float)
                       - rm.operations[refops[str(lbl)]].to_dense()).max()
            assert d < 1e-10, "%s differs by %g" % (lbl, d)
        assert np.abs(np.asarray(tm.preps['rho0'].to_dense()).ravel()
                      - np.asarray(rm.preps['rho0'].to_dense()).ravel()).max() < 1e-10
        for el in ('0bright', '1bright', '2bright'):
            mine = np.asarray(tm.povms['Mdefault'][el]).ravel()
            ref = np.asarray(rm.povms['Mdefault'][el].to_dense()).ravel()
            assert np.abs(mine - ref).max() < 1e-10

    def test_bare_label_circuits_evaluate(self):
        tm = qt.target_model()
        c = qt.germs[9]  # GxGy
        p = tm.probabilities(c)
        assert abs(sum(p.values()) - 1.0) < 1e-9
        assert abs(p[('1bright',)] - 0.5) < 1e-9

    def test_qutrit_gst_fit(self):
        """3-outcome qutrit GST end-to-end (germs_lite, maxL=1)."""
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.protocols.gst import (GateSetTomographyDesign,
                                              GateSetTomography, GSTInitialModel)

        tm = qt.target_model('full TP')
        lists = create_lsgst_circuit_lists(
            tm, qt.prepStrs, qt.effectStrs, qt.germs_lite[:10], [1])
        datagen = qt.target_model('full TP').depolarize(op_noise=0.01,
                                                        spam_noise=0.001)
        ds = simulate_data(datagen, list(lists[-1]), 2000, seed=2026)
        design = GateSetTomographyDesign(tm, lists)
        gst = GateSetTomography(GSTInitialModel(model=tm.copy()),
                                gaugeopt_suite=None, verbosity=0)
        results = gst.run(ProtocolData(design, ds))
        est = results.estimates['GateSetTomography']
        nsigma = est.misfit_sigma()
        assert nsigma < 4.0, "qutrit GST misfit Nsigma=%g" % nsigma
