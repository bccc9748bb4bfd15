"""End-to-end protocol + report tests: GateSetTomography protocol run,
gauge optimization, model test, HTML report generation."""

import os

import numpy as np
import pytest

from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.protocols.protocol import ProtocolData
from pygsti_tpu.protocols.gst import (StandardGSTDesign, GateSetTomography,
                                      GSTInitialModel, StandardGST)
from pygsti_tpu.protocols.modeltest import ModelTest
from pygsti_tpu.data import simulate_data


@pytest.fixture(scope='module')
def gst_data():
    design = StandardGSTDesign(mp.target_model('full TP'), mp.prep_fiducials(),
                               mp.meas_fiducials(), mp.germs(), [1, 2, 4])
    datagen = mp.target_model('full TP').depolarize(op_noise=0.03, spam_noise=0.01)
    ds = simulate_data(datagen, design.all_circuits_needing_data, 1000, seed=42)
    return ProtocolData(design, ds), datagen


class TestGSTProtocol:
    def test_gst_protocol_run(self, gst_data):
        data, datagen = gst_data
        proto = GateSetTomography(verbosity=0, name='GateSetTomography')
        results = proto.run(data)
        est = results.estimates['GateSetTomography']
        assert 'final iteration estimate' in est.models
        assert 'stdgaugeopt' in est.models  # gauge-optimized variant added
        nsig = est.misfit_sigma()
        assert nsig < 10, "bad fit: Nsigma=%s" % nsig
        # gauge-optimized model should be close to datagen
        go = est.models['stdgaugeopt']
        err = np.max(np.abs(go.operations[('Gxpi2', 0)].to_dense()
                            - datagen.operations[('Gxpi2', 0)].to_dense()))
        assert err < 0.05, "gauge-opt model far from truth: %g" % err

    def test_model_test_protocol(self, gst_data):
        data, datagen = gst_data
        proto = ModelTest(datagen, mp.target_model('full TP'), verbosity=0,
                          name='ModelTest')
        results = proto.run(data)
        est = results.estimates['ModelTest']
        assert est.misfit_sigma() < 5  # datagen model should fit its own data

        bad = mp.target_model('full TP').depolarize(op_noise=0.2)
        proto2 = ModelTest(bad, mp.target_model('full TP'), verbosity=0, name='Bad')
        results2 = proto2.run(data)
        assert results2.estimates['Bad'].misfit_sigma() > 10

    def test_report_generation(self, gst_data, tmp_path):
        data, _ = gst_data
        proto = GateSetTomography(verbosity=0, name='GateSetTomography')
        results = proto.run(data, disable_checkpointing=True)
        from pygsti_tpu.report import construct_standard_report
        report = construct_standard_report(results, "Test Report",
                                           confidence_level=95)
        path = str(tmp_path / "report.html")
        report.write_html(path)
        assert os.path.exists(path)
        content = open(path).read()
        assert "Model violation" in content
        assert "Gxpi2" in content
        # full standard-report section set (reference factory.py:1226)
        for section in ("Input summary", "Fit progression",
                        "Per-gate metrics", "Model-level metrics",
                        "Gate eigenvalues", "Angles between rotation axes",
                        "Germ-amplified metrics",
                        "Error-generator projections",
                        "Gate decompositions", "SPAM metrics",
                        "SPAM probabilities", "Estimated gate matrices",
                        "SPAM vectors", "Metadata"):
            assert section in content, "missing report section %r" % section
        # >= 60 populated quantities: count table data cells
        import re as _re
        n_cells = len(_re.findall(r'<td[ >]', content))
        assert n_cells >= 60, "only %d populated table cells" % n_cells
        # error bars present (confidence level given)
        assert "&plusmn;" in content

    def test_report_pdf(self, gst_data, tmp_path):
        data, _ = gst_data
        proto = GateSetTomography(verbosity=0, name='GateSetTomography')
        results = proto.run(data, disable_checkpointing=True)
        from pygsti_tpu.report import construct_standard_report
        report = construct_standard_report(results, "PDF Report")
        path = str(tmp_path / "report.pdf")
        report.write_pdf(path)
        raw = open(path, 'rb').read()
        assert raw.startswith(b'%PDF-')
        assert b'%%EOF' in raw
        assert len(raw) > 500

    def test_serialization_roundtrip(self, gst_data, tmp_path):
        data, _ = gst_data
        d = str(tmp_path / "gstdata")
        data.write(d)
        data2 = ProtocolData.from_dir(d)
        assert len(data2.edesign.all_circuits_needing_data) == \
            len(data.edesign.all_circuits_needing_data)
        c0 = data.edesign.all_circuits_needing_data[0]
        assert dict(data2.dataset[c0].counts) == dict(data.dataset[c0].counts)


class TestColorBoxPlot:
    def test_boxplot_in_report(self, gst_results_fixture=None):
        """Per-circuit model violation box plot appears in the HTML report."""
        import jax
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data.datasetconstruction import simulate_data
        from pygsti_tpu.protocols.gst import StandardGSTDesign, GateSetTomography
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.report.factory import construct_standard_report
        import tempfile, os

        design = StandardGSTDesign(mp.target_model('static'),
                                   mp.prep_fiducials(), mp.meas_fiducials(),
                                   mp.germs(), [1])
        ds = simulate_data(mp.target_model('full').depolarize(op_noise=0.02),
                           design.all_circuits_needing_data, 500, seed=1)
        data = ProtocolData(design, ds)
        gst = GateSetTomography(mp.target_model('full TP'),
                                gaugeopt_suite='stdgaugeopt', verbosity=0)
        results = gst.run(data)
        with tempfile.TemporaryDirectory() as d:
            path = construct_standard_report(results, "t").write_html(
                os.path.join(d, 'r.html'))
            txt = open(path).read()
        assert 'class="boxplot"' in txt and 'class="bx"' in txt
        assert 'box plot unavailable' not in txt

    def test_per_circuit_contributions(self):
        import numpy as np
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data.datasetconstruction import simulate_data
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        from pygsti_tpu.report.workspaceplots import per_circuit_2dlogl
        m = mp.target_model('full')
        circs = create_lsgst_circuit_lists(m, mp.prep_fiducials(),
                                           mp.meas_fiducials(), mp.germs(),
                                           [1])[-1]
        ds = simulate_data(m.copy(), circs, 2000, seed=2)
        vals = per_circuit_2dlogl(m, ds, list(circs))
        total = sum(vals.values())
        # ~chi2_k distributed: mean ~ dof per circuit (1); loose sanity bound
        assert 0 < total < 5 * len(vals)


class TestDriftReport:
    def test_drift_report_html(self):
        import numpy as np
        import tempfile, os
        from pygsti_tpu.circuits import Circuit
        from pygsti_tpu.data import DataSet
        from pygsti_tpu.protocols.protocol import ProtocolData, ExperimentDesign
        from pygsti_tpu.protocols.stability import StabilityAnalysis
        from pygsti_tpu.report.driftreport import construct_drift_report

        rng = np.random.RandomState(0)
        ds = DataSet()
        c1 = Circuit([('Gxpi2', 0)], (0,))
        T = 256
        p_t = 0.5 + 0.3 * np.sin(2 * np.pi * 4 * np.arange(T) / T)
        bits = (rng.uniform(size=T) < p_t).astype(int)
        ds.add_raw_series_data(c1, [str(b) for b in bits], list(range(T)),
                               [1] * T)
        data = ProtocolData(ExperimentDesign([c1], (0,)), ds)
        res = StabilityAnalysis().run(data)
        assert res.instability_detected
        with tempfile.TemporaryDirectory() as d:
            path = construct_drift_report(res).write_html(
                os.path.join(d, 'drift.html'))
            txt = open(path).read()
        assert 'YES' in txt and '<svg' in txt and 'Power spectra' in txt


class TestWorkspace:
    def test_workspace_tables_and_plot(self):
        import jax
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data.datasetconstruction import simulate_data
        from pygsti_tpu.circuits.gstcircuits import make_lsgst_structs
        from pygsti_tpu.report.workspace import Workspace
        ws = Workspace()
        m = mp.target_model('full').depolarize(op_noise=0.02)
        t = mp.target_model('full')
        assert 'Gxpi2' in ws.GatesVsTargetTable(m, t).render()
        assert '<table' in ws.SpamVsTargetTable(m, t).render()
        assert '<table' in ws.GatesTable(m).render()
        assert '<table' in ws.ChoiTable(m).render()
        structs = make_lsgst_structs(t, mp.prep_fiducials(),
                                     mp.meas_fiducials(), mp.germs(), [1])
        ds = simulate_data(m.copy(), list(structs[-1]), 500, seed=2)
        assert 'boxplot' in ws.ColorBoxPlot('logl', structs[-1], ds, m).render()

    def test_report_notebook(self):
        import json, tempfile, os
        from pygsti_tpu.report.factory import create_report_notebook
        with tempfile.TemporaryDirectory() as d:
            p = create_report_notebook(None, os.path.join(d, 'r.ipynb'))
            nb = json.load(open(p))
            assert nb['nbformat'] == 4 and len(nb['cells']) > 8


class TestSwitchboard:
    def test_multi_estimate_report_has_switchboard(self, tmp_path):
        """Reports over multiple estimates render an interactive
        Switchboard (reference: workspace.py:725)."""
        import jax
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.protocols.gst import StandardGSTDesign, StandardGST
        target = mp.target_model('full TP')
        design = StandardGSTDesign(target, mp.prep_fiducials(),
                                   mp.meas_fiducials(), mp.germs(), [1])
        ds = simulate_data(target.depolarize(op_noise=0.02),
                           design.all_circuits_needing_data, 500, seed=8)
        res = StandardGST(modes=('full TP', 'Target'), gaugeopt_suite=None,
                          verbosity=0).run(ProtocolData(design, ds),
                                           disable_checkpointing=True)
        from pygsti_tpu.report import construct_standard_report
        path = str(tmp_path / 'multi.html')
        construct_standard_report(res, 'Multi').write_html(path)
        content = open(path).read()
        assert 'switchboard' in content
        assert '<select' in content
        assert 'full TP' in content and 'Target' in content

    def test_switchboard_direct_api(self):
        from pygsti_tpu.report.workspace import Workspace
        ws = Workspace()
        sb = ws.Switchboard(['Mode'], [['A', 'B']])
        sb.add('A', '<p>content-A</p>')
        sb.add('B', '<p>content-B</p>')
        html = sb.render()
        assert 'content-A' in html and 'content-B' in html
        assert html.count('<option') == 2


class TestVBPlot:
    def test_volumetric_plot_html(self):
        import numpy as np
        from pygsti_tpu.report.vbplot import (volumetric_plot_html,
                                              volumetric_boundary_data)
        data = {(d, w): (0.9 if d * w <= 8 else 0.1)
                for d in (2, 4, 8) for w in (1, 2, 4)}
        html = volumetric_plot_html(data, title='VB test')
        assert 'VB test' in html and html.count('<td') > 9
        b = volumetric_boundary_data(data, threshold=0.5)
        assert b[2] == 4 and b[8] == 1


class TestColormaps:
    def test_linlog(self):
        import numpy as np
        from pygsti_tpu.report.colormaps import (LinlogColormap,
                                                 SequentialColormap)
        cm = LinlogColormap(0, 100, num_boxes=50, pcntle=0.05, dof_per_box=1)
        # below threshold: grayscale; far above: red
        low = cm.interpolate_hex(0.1)
        high = cm.interpolate_hex(1000)
        assert low[1:3] == low[3:5] == low[5:7]  # gray: r==g==b
        r, g, b = int(high[1:3], 16), int(high[3:5], 16), int(high[5:7], 16)
        assert r > 200 and g < 100 and b < 100
        # normalization is monotonic
        vals = [cm.normalize(v) for v in (0, 1, cm.trans, 10 * cm.trans, 100)]
        assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))
        sq = SequentialColormap(0, 1)
        assert sq.interpolate_hex(0.0) == '#ffffff'


class TestInstrumentAndPOVMMetrics:
    """ADVICE round-2 fixes: instrument_infidelity must be 0 for identical
    instruments (reference reportables.py:2770-2772 formula) and _povm_map
    must reject POVMs with more outcomes than the Hilbert dimension."""

    @staticmethod
    def _model_with_instrument(scale=1.0):
        from pygsti_tpu.modelmembers.instruments import Instrument
        from pygsti_tpu.modelmembers.operations import FullArbitraryOp
        from pygsti_tpu.tools.basistools import change_basis
        m = mp.target_model()
        P0 = np.array([[1, 0], [0, 0]], complex)
        P1 = scale * np.array([[0, 0], [0, 1]], complex)

        def mk(P):
            S = np.einsum('ij,kl->ikjl', P, P.conj()).reshape(4, 4)
            return FullArbitraryOp(np.real(change_basis(S, 'std', 'pp')))

        m.instruments['Iz'] = Instrument({'p0': mk(P0), 'p1': mk(P1)})
        return m

    def test_instrument_infidelity_identical_is_zero(self):
        import pygsti_tpu.report.reportables as rpt
        m = self._model_with_instrument()
        m2 = self._model_with_instrument()
        assert abs(rpt.instrument_infidelity(m, m2, 'Iz')) < 1e-10

    def test_instrument_infidelity_perturbed_positive(self):
        import pygsti_tpu.report.reportables as rpt
        m = self._model_with_instrument()
        m2 = self._model_with_instrument(scale=0.9)
        val = rpt.instrument_infidelity(m, m2, 'Iz')
        assert 0 < val < 0.5

    def test_instrument_half_diamond_norm_identical_is_zero(self):
        import pygsti_tpu.report.reportables as rpt
        m = self._model_with_instrument()
        m2 = self._model_with_instrument()
        assert abs(rpt.instrument_half_diamond_norm(m, m2, 'Iz')) < 1e-6

    def test_povm_map_rejects_too_many_outcomes(self):
        import pygsti_tpu.report.reportables as rpt
        from pygsti_tpu.modelmembers.povms import UnconstrainedPOVM
        m = mp.target_model()
        e0 = np.array([1 / np.sqrt(2), 0, 0, 0.5])
        e1 = np.array([1 / np.sqrt(2) / 2, 0, 0, -0.25])
        m.povms['M3'] = UnconstrainedPOVM({'0': e0, '1': e1, '2': e1})
        with pytest.raises(ValueError):
            rpt._povm_map(m, 'M3')
