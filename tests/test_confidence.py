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
