"""Workspace: factory of renderable report tables/plots (reference:
pygsti/report/workspace.py:177 Workspace, :2012 WorkspaceTable, :2428
WorkspacePlot; SmartCache-backed there, function-cached here).

Each factory method returns a Workspace output object with ``render()``
producing a self-contained HTML fragment, composable into reports or
displayed in notebooks via ``_repr_html_``.
"""

from __future__ import annotations

import html as _html

import numpy as np

from pygsti_tpu.baseobjs.smartcache import SmartCache


class WorkspaceOutput(object):
    """Base for renderable workspace objects."""

    def __init__(self, ws, html):
        self.ws = ws
        self._html = html

    def render(self, typ='html'):
        assert typ == 'html', "only HTML rendering is supported"
        return self._html

    def _repr_html_(self):
        return self._html


class WorkspaceTable(WorkspaceOutput):
    pass


class WorkspacePlot(WorkspaceOutput):
    pass


def _table_html(headers, rows):
    h = ''.join('<th>%s</th>' % _html.escape(str(x)) for x in headers)
    body = ''.join('<tr>%s</tr>' % ''.join(
        '<td>%s</td>' % (x if isinstance(x, str) and x.startswith('<')
                         else _html.escape(str(x))) for x in r)
        for r in rows)
    return ('<table border="1" cellspacing="0" cellpadding="3">'
            '<tr>%s</tr>%s</table>' % (h, body))


class Workspace(object):
    """Factory of report tables and plots (reference: workspace.py:177)."""

    def __init__(self, cachefile=None):
        self.smartCache = SmartCache()

    # -- tables ---------------------------------------------------------------

    def GatesVsTargetTable(self, model, target_model, confidence_region_info=None):
        from pygsti_tpu.report import reportables as _rpt
        crf = confidence_region_info
        gm = _rpt.gate_metrics_table(model, target_model, crf_view=crf)
        if not gm:
            return WorkspaceTable(self, '<p>(no gates)</p>')
        metrics = list(next(iter(gm.values())).keys())
        rows = [[str(lbl)] + [row[m] for m in metrics]
                for lbl, row in gm.items()]
        return WorkspaceTable(self, _table_html(['Gate'] + metrics, rows))

    def SpamVsTargetTable(self, model, target_model, confidence_region_info=None):
        from pygsti_tpu.report import reportables as _rpt
        sm = _rpt.spam_metrics_table(model, target_model)
        rows = [['%s %s' % (kind, lbl)] + ['%.6g' % v for v in d.values()]
                for (kind, lbl), d in sm.items()]
        headers = ['Item'] + (list(next(iter(sm.values())).keys()) if sm else [])
        return WorkspaceTable(self, _table_html(headers, rows))

    def GatesTable(self, model, display_as='numbers'):
        rows = []
        for lbl, op in model.operations.items():
            m = np.asarray(op.to_dense())
            mat = '<table>' + ''.join(
                '<tr>%s</tr>' % ''.join('<td>%.4f</td>' % x for x in r)
                for r in m) + '</table>'
            rows.append([str(lbl), mat])
        return WorkspaceTable(self, _table_html(['Gate', 'Matrix'], rows))

    def ChoiTable(self, model):
        from pygsti_tpu.tools.jamiolkowski import fast_jamiolkowski_iso_std
        rows = []
        for lbl, op in model.operations.items():
            choi = fast_jamiolkowski_iso_std(op.to_dense(), model.basis)
            evals = np.linalg.eigvalsh((choi + choi.conj().T) / 2)
            rows.append([str(lbl),
                         ', '.join('%.4g' % v for v in sorted(evals)[::-1])])
        return WorkspaceTable(self, _table_html(['Gate', 'Choi eigenvalues'],
                                                rows))

    def GateEigenvalueTable(self, model, target_model=None):
        rows = []
        for lbl, op in model.operations.items():
            ev = np.linalg.eigvals(op.to_dense())
            rows.append([str(lbl), ', '.join(
                '%.4f%+.4fj' % (v.real, v.imag) for v in ev)])
        return WorkspaceTable(self, _table_html(['Gate', 'Eigenvalues'], rows))

    def FitComparisonTable(self, max_lengths, circuit_structs, model_by_l,
                           dataset, objfn='logl'):
        from pygsti_tpu.report.workspaceplots import per_circuit_2dlogl
        rows = []
        for L, struct, mdl in zip(max_lengths, circuit_structs, model_by_l):
            vals = per_circuit_2dlogl(mdl, dataset, list(struct), objfn)
            total = sum(vals.values())
            k = max(sum(len(mdl.probabilities(c)) - 1 for c in list(struct)[:0])
                    or (len(vals)), 1)
            rows.append([L, '%.1f' % total, len(vals)])
        return WorkspaceTable(self, _table_html(
            ['L', '2&Delta;log&#8467;', 'N circuits'], rows))

    # -- plots ----------------------------------------------------------------

    def ColorBoxPlot(self, plottype, circuit_struct, dataset, model,
                     typ='boxes'):
        from pygsti_tpu.report.workspaceplots import (per_circuit_2dlogl,
                                                      color_boxplot_html)
        objective = 'logl' if 'logl' in str(plottype) else 'chi2'
        vals = per_circuit_2dlogl(model, dataset, list(circuit_struct),
                                  objective)
        return WorkspacePlot(self, color_boxplot_html(
            circuit_struct, vals, title=str(plottype)))
