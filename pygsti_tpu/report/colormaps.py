"""Colormaps for report plots (reference: pygsti/report/colormaps.py).

The signature pyGSTi colormap is the "linlog" map used by model-violation
box plots: values below a chi^2-percentile significance threshold render as
a linear grayscale (statistically insignificant), values above transition
into logarithmic red shades (significant violation).
"""

from __future__ import annotations

import numpy as np
import scipy.stats as _stats


def _to_rgb_hex(r, g, b):
    return '#%02x%02x%02x' % (int(255 * r), int(255 * g), int(255 * b))


class Colormap(object):
    """Base colormap: interpolates value -> RGB over anchor points
    (reference: colormaps.Colormap)."""

    def __init__(self, rgb_colors, hmin, hmax):
        self.rgb_colors = list(rgb_colors)   # [(pos in [0,1], (r,g,b))]
        self.hmin = hmin
        self.hmax = hmax

    def _norm(self, value):
        if self.hmax == self.hmin:
            return np.zeros_like(np.asarray(value, float))
        return np.clip((np.asarray(value, float) - self.hmin)
                       / (self.hmax - self.hmin), 0, 1)

    def interpolate_color(self, value):
        t = float(self._norm(value))
        pts = self.rgb_colors
        for (p0, c0), (p1, c1) in zip(pts[:-1], pts[1:]):
            if t <= p1:
                w = 0 if p1 == p0 else (t - p0) / (p1 - p0)
                return _to_rgb_hex(*(np.array(c0) * (1 - w) + np.array(c1) * w))
        return _to_rgb_hex(*pts[-1][1])


class LinlogColormap(Colormap):
    """Linear grayscale below the significance threshold, log red above
    (reference: colormaps.LinlogColormap:312)."""

    def __init__(self, vmin, vmax, num_boxes, pcntle=0.05, dof_per_box=1,
                 color='red'):
        self.percentile = pcntle
        self.dof = dof_per_box
        # threshold: chi2 quantile corrected for the number of boxes
        # (multiple comparisons), as in the reference
        N = max(num_boxes, 1)
        self.trans = _stats.chi2.ppf(1 - pcntle / N, dof_per_box)
        self.vmin = vmin
        self.vmax = max(vmax, self.trans * 1.0001)
        super().__init__([(0.0, (1, 1, 1)), (1.0, (1, 0, 0))], vmin, vmax)

    def normalize(self, value):
        """Map value to [0, 1]: [0, 0.5] linear below trans, (0.5, 1] log
        above (reference: LinlogColormap._norm)."""
        v = np.asarray(value, float)
        lin = 0.5 * np.clip(v / max(self.trans, 1e-300), 0, 1)
        with np.errstate(divide='ignore', invalid='ignore'):
            log_num = np.log10(np.maximum(v / self.trans, 1e-300))
            log_den = np.log10(max(self.vmax / self.trans, 1.0001))
            lg = 0.5 + 0.5 * np.clip(log_num / log_den, 0, 1)
        return np.where(v <= self.trans, lin, lg)

    def interpolate_color(self, value):
        t = float(self.normalize(value))
        if t <= 0.5:
            # white -> light gray
            g = 1.0 - 0.4 * (t / 0.5)
            return _to_rgb_hex(g, g, g)
        # yellow -> red log scale
        w = (t - 0.5) / 0.5
        return _to_rgb_hex(1.0, 0.9 * (1 - w), 0.1 * (1 - w))


class DivergingColormap(Colormap):
    """Blue-white-red diverging map (reference:
    colormaps.DivergingColormap)."""

    def __init__(self, vmin, vmax, color='RdBu'):
        super().__init__([(0.0, (0.02, 0.19, 0.38)), (0.5, (1, 1, 1)),
                          (1.0, (0.40, 0.0, 0.12))], vmin, vmax)


class SequentialColormap(Colormap):
    """White-to-color sequential map (reference:
    colormaps.SequentialColormap)."""

    def __init__(self, vmin, vmax, color='greys'):
        end = {'greys': (0.1, 0.1, 0.1), 'blues': (0.03, 0.19, 0.42),
               'reds': (0.40, 0.0, 0.05)}.get(color, (0.1, 0.1, 0.1))
        super().__init__([(0.0, (1, 1, 1)), (1.0, end)], vmin, vmax)
