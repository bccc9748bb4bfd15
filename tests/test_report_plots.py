"""Report plot depth (VERDICT r4 missing#2): real colormaps + scatter/
histogram plots, with value parity against the reference.

* Colormap parity: our LinlogColormap / DivergingColormap /
  SequentialColormap reproduce the reference's normalize() and
  interpolate_color() outputs on a value grid (reference:
  pygsti/report/colormaps.py).
* Cell-for-cell box-plot value parity: per_circuit_2dlogl (the numbers the
  color box plot renders) matches the reference's
  tools.two_delta_logl_per_circuit on identical data.
* The rendered HTML/SVG contains the expected number of cells / points /
  bars (visual regression).
"""

import numpy as np
import pytest

from pygsti_tpu.report.colormaps import (LinlogColormap, DivergingColormap,
                                         SequentialColormap,
                                         PiecewiseLinearColormap)


class TestColormapParity:
    def _grid(self, vmax):
        return np.concatenate([np.linspace(0, vmax, 23),
                               [0.0, 1e-8, vmax * 0.999]])

    def test_linlog_normalize_matches_reference(self, ref_pygsti):
        from pygsti.report.colormaps import LinlogColormap as RefLinlog
        for (vmin, vmax, n, pct, dof) in [(0, 40.0, 100, 0.05, 1),
                                          (0, 200.0, 2000, 0.05, 3),
                                          (0, 5.0, 10, 0.33, 2)]:
            mine = LinlogColormap(vmin, vmax, n, pct, dof)
            ref = RefLinlog(vmin, vmax, n, pct, dof)
            assert np.isclose(mine.trans, ref.trans), (mine.trans, ref.trans)
            vals = self._grid(vmax)
            got = np.asarray([mine.normalize(v) for v in vals])
            want = np.asarray([ref.normalize(np.asarray(v)) for v in vals])
            assert np.allclose(got, want, atol=1e-12), \
                np.max(np.abs(got - want))

    def test_linlog_colors_match_reference(self, ref_pygsti):
        from pygsti.report.colormaps import LinlogColormap as RefLinlog
        mine = LinlogColormap(0, 80.0, 500, 0.05, 1)
        ref = RefLinlog(0, 80.0, 500, 0.05, 1)
        for v in self._grid(80.0):
            assert mine.interpolate_color(v) == ref.interpolate_color(v), v

    def test_diverging_and_sequential_match_reference(self, ref_pygsti):
        from pygsti.report.colormaps import (
            DivergingColormap as RefDiv, SequentialColormap as RefSeq)
        # the reference's DivergingColormap doesn't implement
        # normalize_interpolate (interpolate_color raises there), so
        # compare its colorscale anchors instead
        dv, rdv = DivergingColormap(-3, 3), RefDiv(-3, 3)
        assert dv.create_plotly_colorscale() == rdv.create_plotly_colorscale()
        assert dv.interpolate_color(-3) == 'rgb(0,0,255)'
        assert dv.interpolate_color(0) == 'rgb(255,255,255)'
        assert dv.interpolate_color(3) == 'rgb(255,0,0)'
        for color in ('whiteToBlack', 'whiteToRed', 'whiteToBlue'):
            sq, rsq = (SequentialColormap(0, 10, color),
                       RefSeq(0, 10, color))
            for v in np.linspace(0, 10, 11):
                assert sq.interpolate_color(v) == rsq.interpolate_color(v)

    def test_besttxtcolor_matches_reference(self, ref_pygsti):
        from pygsti.report.colormaps import SequentialColormap as RefSeq
        sq, rsq = SequentialColormap(0, 10), RefSeq(0, 10)
        for v in np.linspace(0, 10, 11):
            assert sq.besttxtcolor(v) == rsq.besttxtcolor(v)

    def test_piecewise_linear(self):
        pw = PiecewiseLinearColormap([[0.0, (1., 1., 1.)],
                                      [2.0, (0.5, 0., 0.)],
                                      [4.0, (0., 0., 1.)]])
        assert pw.interpolate_color(0.0) == 'rgb(255,255,255)'
        assert pw.interpolate_color(2.0) == 'rgb(128,0,0)'
        assert pw.interpolate_color(4.0) == 'rgb(0,0,255)'


@pytest.fixture(scope='module')
def gst_plot_setup():
    from pygsti_tpu.modelpacks import smq1Q_XYI as mp
    from pygsti_tpu.circuits.gstcircuits import \
        create_lsgst_circuit_lists
    target = mp.target_model('full TP')
    datagen = target.copy().depolarize(op_noise=0.03, spam_noise=0.01)
    lists = create_lsgst_circuit_lists(
        target, mp.prep_fiducials(), mp.meas_fiducials(), mp.germs(), [1, 2])
    from pygsti_tpu.data import simulate_data
    ds = simulate_data(datagen, lists[-1], 500, seed=21)
    return target, lists[-1], ds


class TestBoxPlotValueParity:
    def test_cell_values_match_reference(self, ref_pygsti, gst_plot_setup):
        """The per-circuit 2dlogL values our color box plot renders match
        the reference oracle cell for cell."""
        target, struct, ds = gst_plot_setup
        from pygsti_tpu.report.workspaceplots import per_circuit_2dlogl
        circuits = list(struct)
        vals = per_circuit_2dlogl(target, ds, circuits, 'logl')

        rds = ref_pygsti.data.DataSet(outcome_labels=['0', '1'])
        for c in circuits:
            rds.add_count_dict(ref_pygsti.circuits.Circuit(c.str),
                               {k[0]: v for k, v in ds[c].counts.items()})
        rds.done_adding_data()
        from pygsti.modelpacks import smq1Q_XYI as rmp
        rtarget = rmp.target_model('full TP')
        rcircuits = [ref_pygsti.circuits.Circuit(c.str) for c in circuits]
        # reference per-circuit 2*Delta(logL), same regularization defaults
        # as our RawPoissonPicDeltaLogLFunction (min_prob_clip/radius 1e-4)
        ref_vals = ref_pygsti.tools.two_delta_logl_per_circuit(
            rtarget, rds, rcircuits, min_prob_clip=1e-4, radius=1e-4,
            poisson_picture=True)
        mine = np.array([vals[c] for c in circuits])
        assert np.allclose(mine, ref_vals, atol=1e-8), \
            np.max(np.abs(mine - ref_vals))


class TestRenderedPlots:
    def test_boxplot_and_summaries_render(self, gst_plot_setup):
        target, struct, ds = gst_plot_setup
        from pygsti_tpu.report.workspaceplots import (
            model_violation_boxplot_html, per_circuit_2dlogl,
            scatter_plot_html, histogram_plot_html)
        html = model_violation_boxplot_html(target, ds, struct)
        n_circuits = len(list(struct))
        # every circuit gets a colored cell; scatter gets a point per
        # circuit; histogram draws at least one bar
        assert html.count('class="bx"') >= n_circuits * 0.9
        assert html.count('<circle') >= n_circuits * 0.9
        assert html.count('<rect') >= 1
        assert 'linear gray below' in html
        vals = per_circuit_2dlogl(target, ds, list(struct))
        assert '<svg' in scatter_plot_html(vals, model=target)
        assert '<svg' in histogram_plot_html(vals, model=target)

    def test_colorboxplot_workspace_types(self, gst_plot_setup):
        target, struct, ds = gst_plot_setup
        from pygsti_tpu.report.workspace import Workspace
        ws = Workspace()
        for typ in ('boxes', 'scatter', 'histogram'):
            out = ws.ColorBoxPlot('logl', struct, ds, target, typ=typ)
            assert len(out.render('html')) > 100
