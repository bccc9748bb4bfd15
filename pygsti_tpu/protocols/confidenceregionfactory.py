"""Confidence regions: Hessian-based error bars for estimates
(reference: pygsti/protocols/confidenceregionfactory.py:60).

The objective Hessian is computed with jax (exact second-order AD), projected
onto the non-gauge parameter space (several projection modes, reference
:437 project_hessian), and inverted to give a parameter covariance used for
error-bar propagation.  Additional machinery:

* ``compute_nongauge_and_gauge_spaces`` -- gauge directions derived by AD
  through the gauge group's S(v) action and mapped into parameter space via
  the model's params->tensors Jacobian (replacing the reference's
  explicitcalc.nongauge_projector, explicitcalc.py:657).
* 'std' / 'intrinsic error' / 'optimal gate CIs' / 'none' projection modes.
* linear-response error bars: the response of the MLE to a forcing term,
  computed as H^-1 g via conjugate gradients on jax Hessian-vector products
  (reference :538 enable_linear_response_errorbars).
* profile-likelihood confidence intervals per model member
  (reference :787 ConfidenceRegionFactoryView, :976
  retrieve_profile_likelihood_confidence_intervals).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pygsti_tpu.models.nongauge import compute_nongauge_and_gauge_spaces


class ConfidenceRegionFactory(object):
    """Computes and stores the objective Hessian for an estimate
    (reference: confidenceregionfactory.py:60)."""

    def __init__(self, parent_estimate, model_lbl='final iteration estimate',
                 circuit_list_lbl='final', hessian=None, non_mark_radius=0):
        self.parent = parent_estimate
        self.model_lbl = model_lbl
        self.circuit_list_lbl = circuit_list_lbl
        self.hessian = hessian
        self.jacobian = None
        self.inv_hessian_projections = {}
        self.hessian_projection_parameters = {}
        self.nonMarkRadiusSq = non_mark_radius
        self.nNonGaugeParams = None
        self.nGaugeParams = None
        self.linresponse_mlgst_params = None

    @property
    def model(self):
        return self.parent.models[self.model_lbl]

    # kept for backward compatibility: the most recent projection
    @property
    def inv_hessian_projected(self):
        if not self.inv_hessian_projections:
            return None
        last = list(self.inv_hessian_projections)[-1]
        return self.inv_hessian_projections[last]

    @inv_hessian_projected.setter
    def inv_hessian_projected(self, val):
        if val is not None:
            self.inv_hessian_projections['default'] = val

    def has_hessian(self):
        return self.hessian is not None

    def can_construct_views(self):
        return bool(self.inv_hessian_projections) \
            or self.linresponse_mlgst_params is not None

    def _objective_pieces(self):
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

        def grad_fn(vv):
            # Gradient of DeltaLogL (NOT 2*DeltaLogL): the stored Hessian
            # convention is d2(DeltaLogL) = -d2(logL), matching the
            # reference's crf.compute_hessian (which stores
            # tools.logl_hessian, :330) so that intervals
            # sqrt(C1 * |diag(invH)|) have the correct likelihood-ratio
            # scale.
            #
            # Built from the EXPLICIT dterms formula via a vjp rather than
            # as jax.grad of sum(raw.terms): the terms formula clamps
            # roundoff-negative values to zero, and for elements sitting
            # exactly at their minimum (p == f) the clamp's branch select
            # zeroes the AD curvature -- the explicit-dterms route has no
            # clamp, so jacfwd(grad_fn) is the exact Hessian everywhere.
            p, pullback = jax.vjp(probs_fn, vv)
            dt = raw.dterms(p, counts, totals, freqs)
            return pullback(dt)[0]

        return raw, probs_fn, counts, totals, freqs, grad_fn

    def compute_hessian(self, comm=None, mem_limit=None, approximate=False):
        """Hessian of DeltaLogL (== -Hessian of logL) at the estimate
        (reference: crf.compute_hessian:330 stores tools.logl_hessian; ours
        carries the opposite sign, which the |.|-based inversion ignores).
        `approximate=True` uses the Gauss-Newton form (drops the d2p term)."""
        raw, probs_fn, counts, totals, freqs, grad_fn = self._objective_pieces()
        model = self.model
        v = jnp.asarray(model.to_vector())
        if approximate:
            def gn_hessian(v):
                p = probs_fn(v)
                h = raw.hterms(p, counts, totals, freqs)
                J = jax.jacfwd(probs_fn)(v)
                return (J.T * h[None, :]) @ J
            H = np.asarray(jax.jit(gn_hessian)(v))
        else:
            H = np.asarray(jax.jit(jax.jacfwd(grad_fn))(v))
        self.jacobian = np.asarray(jax.jit(grad_fn)(v))
        self.hessian = H
        return H

    def enable_linear_response_errorbars(self, resource_alloc=None):
        """Enable on-demand linear-response error bars: the covariance of a
        quantity f is g^T H^-1 g with H^-1 g obtained by conjugate gradients
        on jax Hessian-vector products -- the response of the MLE to the
        forcing term eps*g (reference: crf.py:538; the reference re-runs
        MLGST with a forcing function, which computes the same response)."""
        self.linresponse_mlgst_params = {'enabled': True}

    def _hvp_solve(self, g, tol=1e-8, maxiter=500):
        """Solve H x = g with CG on Hessian-vector products, restricted to
        the non-gauge subspace (H is singular along gauge directions)."""
        *_, grad_fn = self._objective_pieces()
        v0 = jnp.asarray(self.model.to_vector())
        hvp = jax.jit(lambda x: jax.jvp(grad_fn, (v0,), (x,))[1])
        ng, gauge = compute_nongauge_and_gauge_spaces(self.model)
        Pg = ng @ ng.T  # projector onto non-gauge space

        import scipy.sparse.linalg as spla
        n = len(np.asarray(v0))

        def matvec(x):
            return Pg @ np.asarray(hvp(jnp.asarray(Pg @ x)))

        A = spla.LinearOperator((n, n), matvec=matvec)
        gp = Pg @ np.asarray(g)
        x, info = spla.cg(A, gp, rtol=tol, maxiter=maxiter)
        return Pg @ x

    def project_hessian(self, projection_type='std', label=None, tol=1e-7,
                        maxiter=10000, verbosity=0):
        """Project the Hessian onto non-gauge directions and invert the
        non-gauge part (reference: crf.project_hessian:437).

        projection_type in:
          'std'              -- block-diagonalize in (nongauge, gauge)
                                coordinates, zero the gauge blocks
          'none'             -- no projection (all directions non-gauge)
          'intrinsic error'  -- pseudo-inverse on the nonzero spectrum,
                                treating near-zero curvature as gauge
          'optimal gate CIs' -- optimize a gauge/non-gauge mixing matrix to
                                minimize the resulting gate error bars
        """
        assert self.hessian is not None, "Compute Hessian first"
        if label is None:
            label = projection_type
        H = (self.hessian + self.hessian.T) / 2
        model = self.model
        P = H.shape[0]

        if projection_type != 'none':
            ng_space, g_space = compute_nongauge_and_gauge_spaces(model, tol=tol)
            self.nNonGaugeParams = ng_space.shape[1]
            self.nGaugeParams = P - self.nNonGaugeParams
        else:
            self.nNonGaugeParams, self.nGaugeParams = P, 0

        if projection_type == 'none':
            projected = H
        elif projection_type == 'std':
            projected = self._project_hessian_std(H, ng_space, g_space)
        elif projection_type == 'intrinsic error':
            projected = H  # handled via rank-cut inversion below
        elif projection_type == 'optimal gate CIs':
            projected = self._opt_projection_for_operation_cis(
                H, ng_space, g_space, maxiter=min(maxiter, 100),
                verbosity=verbosity)
        else:
            raise ValueError("Invalid projection_type: %r" % projection_type)

        # invert the non-gauge part of the (projected) quadratic form:
        # zero out the nGaugeParams smallest-|eigenvalue| directions
        evals, U = np.linalg.eigh((projected + projected.T) / 2)
        order = np.argsort(np.abs(evals))
        inv_evals = np.zeros_like(evals)
        for i in order[self.nGaugeParams:]:
            if abs(evals[i]) > 1e-300:
                inv_evals[i] = 1.0 / evals[i]
        inv = (U * inv_evals[None, :]) @ U.T

        self.inv_hessian_projections[label] = inv
        self.hessian_projection_parameters[label] = {
            'projection_type': projection_type, 'tol': tol, 'maxiter': maxiter}
        return inv

    @staticmethod
    def _project_hessian_std(H, nongauge_space, gauge_space):
        """Transform H to (nongauge, gauge) coordinates, zero the gauge and
        coupling blocks, transform back (reference: crf._project_hessian:652)."""
        invB = np.concatenate([nongauge_space, gauge_space], axis=1)
        B = np.linalg.inv(invB)
        Hp = invB.T @ H @ invB
        n = nongauge_space.shape[1]
        Hp[:n, n:] = 0.0
        Hp[n:, :n] = 0.0
        Hp[n:, n:] = 0.0
        return B.T @ Hp @ B

    def _opt_projection_for_operation_cis(self, H, ng_space, g_space,
                                          maxiter=100, verbosity=0):
        """Optimize the gauge-mixing matrix M so the projected Hessian gives
        minimal summed gate confidence intervals (reference:
        crf._opt_projection_for_operation_cis:688)."""
        import scipy.optimize as spo
        model = self.model
        nNG, nG = ng_space.shape[1], g_space.shape[1]
        if nG == 0:
            return self._project_hessian_std(H, ng_space, g_space)

        gate_param_idx = np.concatenate(
            [np.arange(len(model.to_vector()))[op.gpindices]
             for op in model.operations.values()]) \
            if len(model.operations) else np.arange(H.shape[0])

        def gate_ci_sum(vec_m):
            M = vec_m.reshape(nNG, nG)
            ng_mixed = ng_space + g_space @ M.T
            proj = self._project_hessian_std(H, ng_mixed, g_space)
            evals, U = np.linalg.eigh((proj + proj.T) / 2)
            order = np.argsort(np.abs(evals))
            inv_evals = np.zeros_like(evals)
            for i in order[nG:]:
                if abs(evals[i]) > 1e-300:
                    inv_evals[i] = 1.0 / evals[i]
            inv = (U * inv_evals[None, :]) @ U.T
            return float(np.sum(np.sqrt(np.abs(
                np.diag(inv)[gate_param_idx]))))

        x0 = np.zeros(nNG * nG)
        res = spo.minimize(gate_ci_sum, x0, method='L-BFGS-B',
                           options={'maxiter': maxiter, 'eps': 1e-6})
        M = res.x.reshape(nNG, nG)
        return self._project_hessian_std(H, ng_space + g_space @ M.T, g_space)

    def view(self, confidence_level=95, region_type='normal',
             hessian_projection=None):
        """A view at a fixed confidence level (reference: crf.view:582).
        region_type 'normal' or 'non-markovian radius' (inflates intervals
        by the non-Markovian radius, reference crf.py:885)."""
        if hessian_projection is None and not self.inv_hessian_projections \
                and self.hessian is not None:
            self.project_hessian('std')
        return ConfidenceRegionFactoryView(self, confidence_level, region_type,
                                           hessian_projection)


class ConfidenceRegionFactoryView(object):
    """A view at a fixed confidence level, providing error bars on
    functions of the model (reference: confidenceregionfactory.py:787)."""

    def __init__(self, factory, confidence_level=95, region_type='normal',
                 hessian_projection=None):
        import scipy.stats as st
        self.factory = factory
        self.confidence_level = confidence_level
        self.region_type = region_type
        self.hessian_projection = hessian_projection
        # C1 = single-DOF chi2 quantile: profile-likelihood interval scale
        # (reference: crf.py:885 "C1 == Single DOF case")
        C1 = st.chi2.ppf(confidence_level / 100.0, 1)
        if region_type == 'non-markovian radius':
            C1 = C1 * (1 + np.sqrt(max(factory.nonMarkRadiusSq, 0.0)))
        self._C1 = C1
        self._profile_lcis = None

    @property
    def errorbar_type(self):
        if self.factory.linresponse_mlgst_params is not None \
                and not self.factory.inv_hessian_projections:
            return 'linear response'
        return 'hessian'

    def _inv_hessian(self):
        f = self.factory
        if self.hessian_projection is not None:
            if self.hessian_projection not in f.inv_hessian_projections:
                f.project_hessian(self.hessian_projection,
                                  label=self.hessian_projection)
            return f.inv_hessian_projections[self.hessian_projection]
        if not f.inv_hessian_projections:
            f.project_hessian('std')
        return f.inv_hessian_projected

    # -- profile likelihood intervals ---------------------------------------
    def profile_likelihood_confidence_intervals(self):
        """Per-parameter interval half-widths sqrt(C1 * diag(invH))
        (reference: crf.py:937)."""
        if self._profile_lcis is None:
            inv = self._inv_hessian()
            self._profile_lcis = np.sqrt(self._C1 * np.abs(np.diag(inv)))
        return self._profile_lcis

    def retrieve_profile_likelihood_confidence_intervals(self, label=None):
        """Intervals for the parameters of one model member (gate / prep /
        povm label), or all parameters when label is None (reference:
        crf.retrieve_profile_likelihood_confidence_intervals:976)."""
        lcis = self.profile_likelihood_confidence_intervals()
        if label is None:
            return lcis
        model = self.factory.model
        for container in (model.operations, model.preps, model.povms):
            if label in container:
                return lcis[container[label].gpindices]
        raise KeyError("Label %r not found in model members" % (label,))

    # -- error bars on arbitrary quantities ----------------------------------
    def compute_uncertainty(self, fn_of_model, model=None, eps=1e-7):
        """Confidence-interval half-width of scalar fn(model) via linear
        propagation: sqrt(C1 * g^T invH g) (hessian mode) or via the
        linear-response solve H x = g (linear-response mode)."""
        factory = self.factory
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
        if self.errorbar_type == 'linear response':
            x = factory._hvp_solve(grad)
            var = float(grad @ x)
        else:
            var = float(grad @ self._inv_hessian() @ grad)
        return np.sqrt(self._C1 * max(var, 0.0))
