"""Report plots: per-circuit model-violation color box plots, scatter and
histogram summaries, rendered as self-contained HTML/SVG (reference:
pygsti/report/workspaceplots.py ColorBoxPlot and its typ='boxes'/'scatter'/
'histogram' variants; the reference renders via plotly -- here box cells
are inline HTML and scatter/histogram are inline SVG, keeping reports
dependency-free).

Cell colors use the reference's LinlogColormap semantics
(report/colormaps.py): linear grayscale below the chi^2-percentile
transition point (expected statistical fluctuation), logarithmic red above
it (significant model violation).
"""

from __future__ import annotations

import html as _html

import numpy as np

from pygsti_tpu.report.colormaps import LinlogColormap


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


def _linlog_colormap(values_by_circuit, model, linlog_percentile=0.05):
    """The LinlogColormap the reference's ColorBoxPlot would use: one box
    per circuit, dof per box = (num outcomes - 1) (reference:
    workspaceplots.py _create_boxes_plot / colormaps.LinlogColormap)."""
    vals = np.array([v for v in values_by_circuit.values()
                     if np.isfinite(v)])
    n_boxes = max(len(vals), 1)
    # dof per box: outcomes-1 for a generic circuit of this model
    try:
        n_out = max(len(model.povms[k].member_labels
                        if hasattr(model.povms[k], 'member_labels')
                        else range(model.povms[k].num_outcomes))
                    for k in model.povm_keys)
    except Exception:
        n_out = 2
    dof = max(n_out - 1, 1)
    vmax = float(np.max(vals)) if len(vals) else 1.0
    return LinlogColormap(0, vmax, n_boxes, linlog_percentile, dof)


def color_boxplot_html(circuit_struct, values_by_circuit, title='',
                       colormap=None, model=None):
    """Nested color box plot over the (L, germ) plaquette grid as an HTML
    table of colored sub-grids (reference: workspaceplots.py ColorBoxPlot,
    typ='boxes').  Cells are colored by `colormap` (a
    report.colormaps.Colormap; default the reference's linlog map)."""
    xs = list(circuit_struct.used_xs)
    ys = list(circuit_struct.used_ys)
    cmap = colormap or _linlog_colormap(values_by_circuit, model)

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
                color = cmap.interpolate_hex(v) if np.isfinite(v) \
                    else '#ccccff'
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
    legend = ('<p class="meta">linear gray below %.3g '
              '(expected fluctuation), log red above</p>'
              % getattr(cmap, 'trans', np.nan))
    return ('%s<h4>%s</h4>%s<table class="boxplot">%s%s</table>'
            % (style, _html.escape(title), legend, header,
               ''.join(rows_html)))


def _svg_frame(inner, width, height, xlabel, ylabel, title):
    return ('<figure class="rplot"><figcaption>%s</figcaption>'
            '<svg width="%d" height="%d" viewBox="0 0 %d %d" '
            'style="background:#fff;border:1px solid #ccc">%s'
            '<text x="%d" y="%d" font-size="11" text-anchor="middle">%s'
            '</text>'
            '<text x="12" y="%d" font-size="11" text-anchor="middle" '
            'transform="rotate(-90 12 %d)">%s</text></svg></figure>'
            % (_html.escape(title), width, height, width, height, inner,
               width // 2, height - 4, _html.escape(xlabel),
               height // 2, height // 2, _html.escape(ylabel)))


def scatter_plot_html(values_by_circuit, title='', colormap=None,
                      model=None, width=640, height=320):
    """Scatter of per-circuit model-violation values vs circuit DEPTH, with
    points colored by the linlog colormap (reference: ColorBoxPlot
    typ='scatter', workspaceplots._create_scatter_plot)."""
    circuits = list(values_by_circuit.keys())
    vals = np.array([values_by_circuit[c] for c in circuits], float)
    depths = np.array([c.depth for c in circuits], float)
    ok = np.isfinite(vals)
    cmap = colormap or _linlog_colormap(values_by_circuit, model)
    pad_l, pad_r, pad_t, pad_b = 42, 10, 10, 30
    w, h = width - pad_l - pad_r, height - pad_t - pad_b
    xmax = max(depths[ok].max() if ok.any() else 1.0, 1.0)
    ymax = max(vals[ok].max() if ok.any() else 1.0, 1e-6)
    pts = []
    for d, v in zip(depths[ok], vals[ok]):
        x = pad_l + w * d / xmax
        y = pad_t + h * (1 - max(v, 0.0) / ymax)
        pts.append('<circle cx="%.1f" cy="%.1f" r="2.2" fill="%s" '
                   'fill-opacity="0.75"><title>depth %d : %.3g</title>'
                   '</circle>' % (x, y, cmap.interpolate_hex(v), d, v))
    # transition line (statistical-significance threshold)
    trans = getattr(cmap, 'trans', None)
    if trans is not None and trans <= ymax:
        ty = pad_t + h * (1 - trans / ymax)
        pts.append('<line x1="%d" y1="%.1f" x2="%d" y2="%.1f" '
                   'stroke="#999" stroke-dasharray="4,3"/>'
                   % (pad_l, ty, width - pad_r, ty))
    axes = ('<line x1="%d" y1="%d" x2="%d" y2="%d" stroke="#333"/>'
            '<line x1="%d" y1="%d" x2="%d" y2="%d" stroke="#333"/>'
            % (pad_l, pad_t + h, width - pad_r, pad_t + h,
               pad_l, pad_t, pad_l, pad_t + h))
    return _svg_frame(axes + ''.join(pts), width, height,
                      'circuit depth', '2Δlogℓ', title)


def histogram_plot_html(values_by_circuit, title='', colormap=None,
                        model=None, n_bins=30, width=640, height=320):
    """Log-count histogram of per-circuit model-violation values, bars
    colored by the linlog colormap (reference: ColorBoxPlot
    typ='histogram', workspaceplots._create_histogram_plot)."""
    vals = np.array([v for v in values_by_circuit.values()
                     if np.isfinite(v)], float)
    cmap = colormap or _linlog_colormap(values_by_circuit, model)
    if len(vals) == 0:
        return _svg_frame('', width, height, 'value', 'count', title)
    vmax = max(float(vals.max()), 1e-6)
    edges = np.linspace(0.0, vmax * 1.0001, n_bins + 1)
    counts, _ = np.histogram(np.clip(vals, 0, None), bins=edges)
    pad_l, pad_r, pad_t, pad_b = 42, 10, 10, 30
    w, h = width - pad_l - pad_r, height - pad_t - pad_b
    log_max = np.log10(max(counts.max(), 1)) or 1.0
    bars = []
    bw = w / n_bins
    for i, cnt in enumerate(counts):
        if cnt == 0:
            continue
        bh = h * (np.log10(cnt + 1) / np.log10(10 ** log_max + 1))
        x = pad_l + i * bw
        mid = 0.5 * (edges[i] + edges[i + 1])
        bars.append('<rect x="%.1f" y="%.1f" width="%.1f" height="%.1f" '
                    'fill="%s" stroke="#666" stroke-width="0.5">'
                    '<title>[%.3g, %.3g) : %d circuits</title></rect>'
                    % (x, pad_t + h - bh, bw, bh, cmap.interpolate_hex(mid),
                       edges[i], edges[i + 1], cnt))
    axes = ('<line x1="%d" y1="%d" x2="%d" y2="%d" stroke="#333"/>'
            '<line x1="%d" y1="%d" x2="%d" y2="%d" stroke="#333"/>'
            % (pad_l, pad_t + h, width - pad_r, pad_t + h,
               pad_l, pad_t, pad_l, pad_t + h))
    return _svg_frame(axes + ''.join(bars), width, height,
                      'per-circuit value', 'count (log)', title)


def model_violation_boxplot_html(model, dataset, circuit_struct,
                                 objective='logl', include_summaries=True):
    """Complete per-circuit model-violation section: color box plot +
    scatter and histogram summary plots (reference: the standard report's
    violation tab, ColorBoxPlot typ='boxes'/'scatter'/'histogram')."""
    vals = per_circuit_2dlogl(model, dataset, list(circuit_struct), objective)
    name = '2&Delta;log&#8467;' if objective == 'logl' else '&chi;&sup2;'
    cmap = _linlog_colormap(vals, model)
    parts = [color_boxplot_html(
        circuit_struct, vals, colormap=cmap, model=model,
        title='Per-circuit %s contributions' % name)]
    if include_summaries:
        parts.append(scatter_plot_html(
            vals, colormap=cmap, model=model,
            title='Per-circuit model violation vs circuit depth'))
        parts.append(histogram_plot_html(
            vals, colormap=cmap, model=model,
            title='Distribution of per-circuit model violation'))
    return '\n'.join(parts)
