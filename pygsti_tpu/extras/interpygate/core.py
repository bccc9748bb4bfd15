"""Interpolated operations (reference: pygsti/extras/interpygate/core.py).

Given sampled process matrices G(p_k) on a parameter grid (e.g. from a
physics simulation), ``InterpolatedDenseOp`` is a model member whose
parameters are the physical parameters and whose dense superoperator is the
(multi)linear interpolation of the samples -- differentiable under jax, so
these gates drop straight into GST fits.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pygsti_tpu.modelmembers.operations import LinearOperator


class InterpolatedDenseOp(LinearOperator):
    """Operation interpolating sampled process matrices over an N-D grid.

    grid_axes: list of 1-D sorted arrays (one per physical parameter).
    samples: ndarray [len(ax0), len(ax1), ..., dim, dim].
    initial_point: starting physical-parameter values.
    """

    def __init__(self, grid_axes, samples, initial_point=None):
        samples = np.asarray(samples, dtype=float)
        self.grid_axes = [np.asarray(a, dtype=float) for a in grid_axes]
        self.samples = samples
        dim = samples.shape[-1]
        npar = len(self.grid_axes)
        assert samples.ndim == npar + 2
        if initial_point is None:
            initial_point = [0.5 * (a[0] + a[-1]) for a in self.grid_axes]
        super().__init__(dim, np.asarray(initial_point, dtype=float))
        self._axes_j = [jnp.asarray(a) for a in self.grid_axes]
        self._samples_j = jnp.asarray(samples)

    def to_dense_jax(self, v):
        """Multilinear interpolation at physical parameters v (clipped to
        the grid's hull), fully differentiable."""
        out = self._samples_j
        # interpolate one axis at a time (axis 0 each round after indexing)
        for k in range(len(self._axes_j)):
            ax = self._axes_j[k]
            x = jnp.clip(v[k], ax[0], ax[-1])
            idx = jnp.clip(jnp.searchsorted(ax, x, side='right') - 1, 0, ax.shape[0] - 2)
            x0 = ax[idx]
            x1 = ax[idx + 1]
            t = (x - x0) / jnp.maximum(x1 - x0, 1e-300)
            lo = jnp.take(out, idx, axis=k if False else 0)
            hi = jnp.take(out, idx + 1, axis=0)
            out = (1 - t) * lo + t * hi
        return out

    def physical_parameters(self):
        return self.to_vector()


class InterpolatedOpFactory(object):
    """Factory producing InterpolatedDenseOp instances for given label args
    (reference: interpygate factory + opfactory.py pattern)."""

    def __init__(self, grid_axes, samples):
        self.grid_axes = grid_axes
        self.samples = samples

    def create_op(self, args=None, sslbls=None):
        point = [float(a) for a in args] if args else None
        return InterpolatedDenseOp(self.grid_axes, self.samples, point)
