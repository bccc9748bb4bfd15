"""Confidence regions: Hessian-based error bars for estimates
(reference: pygsti/protocols/confidenceregionfactory.py:60).

The objective Hessian is computed with jax (jacfwd of the gradient of the
objective), projected onto the non-gauge parameter space, and inverted to
give a parameter covariance used for error-bar propagation.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class ConfidenceRegionFactory(object):
    """Computes and stores the objective Hessian for an estimate."""

    def __init__(self, parent_estimate, model_lbl='final iteration estimate',
                 circuit_list_lbl='final', hessian=None, non_mark_radius=0):
        self.parent = parent_estimate
        self.model_lbl = model_lbl
        self.circuit_list_lbl = circuit_list_lbl
        self.hessian = hessian
        self.inv_hessian_projected = None
        self.nonMarkRadiusSq = non_mark_radius

    @property
    def model(self):
        return self.parent.models[self.model_lbl]

    def has_hessian(self):
        return self.hessian is not None

    def compute_hessian(self, comm=None, mem_limit=None, approximate=False):
        """Hessian of 2*DeltaLogL at the estimate (reference: crf.compute_hessian).

        Uses the Gauss-Newton-exact form: H = 2 * (J^T diag(h) J + sum_e
        dterms_e * d2p_e) where h = hterms; `approximate=True` drops the
        second (d2p) term (Gauss-Newton approximation, much cheaper)."""
        results = self.parent.parent
        ds = results.dataset
        circuits = list(results.circuit_lists[self.circuit_list_lbl])
        model = self.model
        from pygsti_tpu.objectivefns.objectivefns import (
            RawPoissonPicDeltaLogLFunction, TimeIndependentMDCObjectiveFunction)
        raw = RawPoissonPicDeltaLogLFunction()
        obj = TimeIndependentMDCObjectiveFunction(raw, model, ds, circuits)
        probs_fn = model.sim.probs_fn(obj.layout)
        counts = jnp.asarray(obj.counts)
        totals = jnp.asarray(obj.total_counts)
        freqs = jnp.asarray(obj.freqs)

        v = jnp.asarray(model.to_vector())
        if approximate:
            def gn_hessian(v):
                p = probs_fn(v)
                h = raw.hterms(p, counts, totals, freqs)
                J = jax.jacfwd(probs_fn)(v)
                return 2 * (J.T * h[None, :]) @ J
            H = np.asarray(jax.jit(gn_hessian)(v))
        else:
            def total_fn(vv):
                p = probs_fn(vv)
                return 2 * jnp.sum(raw.terms(p, counts, totals, freqs))
            H = np.asarray(jax.jit(jax.jacfwd(jax.grad(total_fn)))(v))
        self.hessian = H
        return H

    def project_hessian(self, projection_type='intrinsic error', label=None, tol=1e-7):
        """Project the Hessian onto non-gauge directions and invert
        (reference: crf.project_hessian, 'intrinsic error' mode uses the
        pseudo-inverse on the nonzero spectrum)."""
        assert self.hessian is not None, "Compute Hessian first"
        H = self.hessian
        evals, evecs = np.linalg.eigh((H + H.T) / 2)
        # gauge directions have (near-)zero curvature
        max_ev = np.max(np.abs(evals)) if len(evals) else 1.0
        keep = np.abs(evals) > tol * max_ev
        inv = np.zeros_like(H)
        for i in np.where(keep)[0]:
            inv += np.outer(evecs[:, i], evecs[:, i]) / evals[i]
        self.inv_hessian_projected = inv
        return inv

    def view(self, confidence_level=95, region_type='normal'):
        return ConfidenceRegionFactoryView(self, confidence_level)


class ConfidenceRegionFactoryView(object):
    """A view at a fixed confidence level, providing error bars on
    functions of the model (reference: confidenceregionfactory.py:787)."""

    def __init__(self, factory, confidence_level=95):
        self.factory = factory
        self.confidence_level = confidence_level
        import scipy.stats as st
        # 1D normal quantile for error bars on scalar quantities
        self._K = st.norm.ppf(0.5 + confidence_level / 200.0)

    def compute_uncertainty(self, fn_of_model, model=None, eps=1e-7):
        """1-sigma-scaled uncertainty of scalar fn(model) via linear
        propagation through the projected inverse Hessian."""
        factory = self.factory
        if factory.inv_hessian_projected is None:
            factory.project_hessian()
        model = model if model is not None else factory.model
        v0 = model.to_vector()
        f0 = fn_of_model(model)
        grad = np.zeros(len(v0))
        work = model.copy()
        for i in range(len(v0)):
            vp = v0.copy()
            vp[i] += eps
            work.from_vector(vp)
            grad[i] = (fn_of_model(work) - f0) / eps
        var = float(grad @ factory.inv_hessian_projected @ grad)
        # factor of 2: hessian is of 2*deltaLogL ~ chi2
        return self._K * np.sqrt(max(2 * var, 0.0))
