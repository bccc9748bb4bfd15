"""Report plots: per-circuit model-violation color box plots rendered as
self-contained HTML (reference: pygsti/report/workspaceplots.py
ColorBoxPlot; the reference renders via plotly -- here cells are inline
HTML, keeping reports dependency-free).
"""

from __future__ import annotations

import html as _html

import numpy as np


def per_circuit_2dlogl(model, dataset, circuits, objective='logl'):
    """Per-circuit 2*Delta(logL) (or chi2) contributions
    {circuit: value}, computed from one bulk objective evaluation."""
    import jax.numpy as jnp
    from pygsti_tpu.objectivefns.objectivefns import (
        RawPoissonPicDeltaLogLFunction, RawChi2Function)
    circuits = list(circuits)
    layout = model.sim.create_layout(circuits, dataset)
    counts, totals = layout.counts_arrays(dataset)
    with np.errstate(invalid='ignore', divide='ignore'):
        freqs = np.where(totals > 0, counts / np.maximum(totals, 1), 0.0)
    pf = model.sim.probs_fn(layout)
    p = np.asarray(pf(jnp.asarray(model.to_vector())))
    raw = RawPoissonPicDeltaLogLFunction() if objective == 'logl' \
        else RawChi2Function()
    terms = np.asarray(raw.terms(jnp.asarray(p), jnp.asarray(counts),
                                 jnp.asarray(totals), jnp.asarray(freqs)))
    scale = 2.0 if objective == 'logl' else 1.0
    out = {}
    for i, c in enumerate(circuits):
        sl = layout.element_slices[i]
        out[c] = scale * float(np.sum(terms[sl]))
    return out


def _color_for(val, vmax):
    """White -> red colormap on [0, vmax]."""
    if not np.isfinite(val):
        return '#dddddd'
    t = min(max(val / vmax, 0.0), 1.0) if vmax > 0 else 0.0
    g = int(round(255 * (1 - t)))
    return '#ff%02x%02x' % (g, g)


def color_boxplot_html(circuit_struct, values_by_circuit, title='',
                       expected_per_circuit=None):
    """Nested color box plot over the (L, germ) plaquette grid as an HTML
    table of colored sub-grids (reference: workspaceplots.py ColorBoxPlot).

    `values_by_circuit`: {circuit: value}; cells colored white->red scaled by
    2x the expected per-circuit value (chi2 mean = number of outcomes-1)."""
    xs = list(circuit_struct.used_xs)
    ys = list(circuit_struct.used_ys)
    vals = [v for v in values_by_circuit.values() if np.isfinite(v)]
    vmax = max(np.percentile(vals, 95) * 1.5, 1e-6) if vals else 1.0

    rows_html = []
    header = '<tr><th></th>' + ''.join(
        '<th>L=%s</th>' % _html.escape(str(x)) for x in xs) + '</tr>'
    for y in ys:
        cells = []
        for x in xs:
            plaq = circuit_struct.plaquette(x, y, empty_if_missing=True)
            if len(plaq) == 0:
                cells.append('<td class="empty"></td>')
                continue
            grid = [['' for _ in range(plaq.num_cols)]
                    for _ in range(plaq.num_rows)]
            for (i, j), c in plaq.elements.items():
                v = values_by_circuit.get(c, np.nan)
                color = _color_for(v, vmax)
                tip = _html.escape('%s : %.3g' % (c.str, v))
                grid[i][j] = ('<div class="bx" style="background:%s" '
                              'title="%s"></div>' % (color, tip))
            inner = ''.join('<div class="bxrow">%s</div>' % ''.join(r)
                            for r in grid)
            cells.append('<td><div class="plaq">%s</div></td>' % inner)
        label = getattr(y, 'str', str(y))
        rows_html.append('<tr><th class="germ">%s</th>%s</tr>'
                         % (_html.escape(label), ''.join(cells)))

    style = ('<style>.plaq{display:inline-block;border:1px solid #999;}'
             '.bxrow{display:flex;}'
             '.bx{width:10px;height:10px;border:0.5px solid #eee;}'
             'td.empty{background:#f8f8f8;}'
             'th.germ{font-family:monospace;text-align:right;'
             'font-size:11px;padding-right:4px;}</style>')
    return ('%s<h4>%s</h4><table class="boxplot">%s%s</table>'
            % (style, _html.escape(title), header, ''.join(rows_html)))


def model_violation_boxplot_html(model, dataset, circuit_struct,
                                 objective='logl'):
    """Complete per-circuit model-violation box plot section."""
    vals = per_circuit_2dlogl(model, dataset, list(circuit_struct), objective)
    name = '2&Delta;log&#8467;' if objective == 'logl' else '&chi;&sup2;'
    return color_boxplot_html(
        circuit_struct, vals,
        title='Per-circuit %s contributions' % name)
