"""Standalone chi2 evaluation helpers (reference: pygsti/tools/chi2fns.py).
Thin delegations to the objective-function implementations (lazy imports
avoid a tools <-> objectivefns cycle)."""

from __future__ import annotations

import numpy as np


def chi2(model, dataset, circuits=None, min_prob_clip_for_weighting=1e-4,
         **_kwargs):
    """Total chi2 of the model (reference: chi2fns.chi2)."""
    from pygsti_tpu.objectivefns.objectivefns import chi2 as _chi2
    return _chi2(model, dataset, circuits,
                 min_prob_clip_for_weighting=min_prob_clip_for_weighting)


def chi2_per_circuit(model, dataset, circuits=None,
                     min_prob_clip_for_weighting=1e-4, **_kwargs):
    """Per-circuit chi2 contributions."""
    from pygsti_tpu.objectivefns.objectivefns import (
        RawChi2Function, TimeIndependentMDCObjectiveFunction)
    raw = RawChi2Function(regularization={
        'min_prob_clip_for_weighting': min_prob_clip_for_weighting})
    obj = TimeIndependentMDCObjectiveFunction(raw, model, dataset,
                                              list(circuits) if circuits
                                              is not None else None)
    return obj.percircuit(model.to_vector())


def chi2_jacobian(model, dataset, circuits=None,
                  min_prob_clip_for_weighting=1e-4, **_kwargs):
    """d(chi2)/d(params) via exact AD (reference: chi2fns.chi2_jacobian)."""
    import jax
    import jax.numpy as jnp
    from pygsti_tpu.objectivefns.objectivefns import (
        RawChi2Function, TimeIndependentMDCObjectiveFunction)
    raw = RawChi2Function(regularization={
        'min_prob_clip_for_weighting': min_prob_clip_for_weighting})
    obj = TimeIndependentMDCObjectiveFunction(raw, model, dataset,
                                              list(circuits) if circuits
                                              is not None else None)
    probs_fn = model.sim.probs_fn(obj.layout)
    counts = jnp.asarray(obj.counts)
    totals = jnp.asarray(obj.total_counts)
    freqs = jnp.asarray(obj.freqs)

    def total(v):
        p = probs_fn(v)
        return jnp.sum(raw.terms(p, counts, totals, freqs))

    return np.asarray(jax.jit(jax.grad(total))(jnp.asarray(model.to_vector())))


def chialpha(alpha, model, dataset, circuits=None, pfratio_stitchpt=1e-2,
             pfratio_derivpt=1e-2, radius=None, **_kwargs):
    """Total chi-alpha objective value (reference: chi2fns.chialpha:330)."""
    return float(np.sum(chialpha_per_circuit(
        alpha, model, dataset, circuits, pfratio_stitchpt=pfratio_stitchpt,
        pfratio_derivpt=pfratio_derivpt, radius=radius)))


def chialpha_per_circuit(alpha, model, dataset, circuits=None,
                         pfratio_stitchpt=1e-2, pfratio_derivpt=1e-2,
                         radius=None, **_kwargs):
    """Per-circuit chi-alpha contributions (reference:
    chi2fns.chialpha_per_circuit:404)."""
    from pygsti_tpu.objectivefns.objectivefns import (
        RawChiAlphaFunction, TimeIndependentMDCObjectiveFunction)
    reg = {'pfratio_stitchpt': pfratio_stitchpt,
           'pfratio_derivpt': pfratio_derivpt}
    if radius is not None:
        reg['radius'] = radius
    raw = RawChiAlphaFunction(regularization=reg, alpha=alpha)
    obj = TimeIndependentMDCObjectiveFunction(raw, model, dataset,
                                              list(circuits) if circuits
                                              is not None else None)
    return obj.percircuit()


def chi2_hessian(model, dataset, circuits=None,
                 min_prob_clip_for_weighting=1e-4, **_kwargs):
    """Exact-AD Hessian of chi2 (reference: chi2fns.chi2_hessian)."""
    import jax
    import jax.numpy as jnp
    from pygsti_tpu.objectivefns.objectivefns import (
        RawChi2Function, TimeIndependentMDCObjectiveFunction)
    raw = RawChi2Function(regularization={
        'min_prob_clip_for_weighting': min_prob_clip_for_weighting})
    obj = TimeIndependentMDCObjectiveFunction(raw, model, dataset,
                                              list(circuits) if circuits
                                              is not None else None)
    probs_fn = model.sim.probs_fn(obj.layout)
    counts = jnp.asarray(obj.counts)
    totals = jnp.asarray(obj.total_counts)
    freqs = jnp.asarray(obj.freqs)

    def total(v):
        p = probs_fn(v)
        return jnp.sum(raw.terms(p, counts, totals, freqs))

    H = jax.jit(jax.hessian(total))(jnp.asarray(model.to_vector()))
    return np.asarray(H)


def chi2_approximate_hessian(model, dataset, circuits=None,
                             min_prob_clip_for_weighting=1e-4, **_kwargs):
    """Gauss-Newton (J^T W J) approximation of the chi2 Hessian -- drops
    second derivatives of the probabilities (reference:
    chi2fns.chi2_approximate_hessian)."""
    import jax
    import jax.numpy as jnp
    from pygsti_tpu.objectivefns.objectivefns import (
        RawChi2Function, TimeIndependentMDCObjectiveFunction)
    raw = RawChi2Function(regularization={
        'min_prob_clip_for_weighting': min_prob_clip_for_weighting})
    obj = TimeIndependentMDCObjectiveFunction(raw, model, dataset,
                                              list(circuits) if circuits
                                              is not None else None)
    probs_fn = model.sim.probs_fn(obj.layout)
    counts = jnp.asarray(obj.counts)
    totals = jnp.asarray(obj.total_counts)
    freqs = jnp.asarray(obj.freqs)
    v = jnp.asarray(model.to_vector())

    def lsv(vv):
        return raw.lsvec(probs_fn(vv), counts, totals, freqs)

    J = jax.jit(jax.jacfwd(lsv))(v)
    return 2.0 * np.asarray(J.T @ J)


def chi2fn_2outcome(n, p, f, min_prob_clip_for_weighting=1e-4):
    """chi^2 term for a 2-outcome measurement: n(p-f)^2 / (cp(1-cp)) with p
    clipped to [mpc, 1-mpc] for the weighting (reference chi2fns.py:477)."""
    cp = np.clip(p, min_prob_clip_for_weighting,
                 1 - min_prob_clip_for_weighting)
    return n * (p - f) ** 2 / (cp * (1 - cp))


def chi2fn_2outcome_wfreqs(n, p, f):
    """Frequency-weighted 2-outcome chi^2: n(p-f)^2 / (f1(1-f1)) with the
    regularized frequency f1 = (fn+1)/(n+2) (reference chi2fns.py:510)."""
    f1 = (f * n + 1) / (n + 2)
    return n * (p - f) ** 2 / (f1 * (1 - f1))


def chi2fn(n, p, f, min_prob_clip_for_weighting=1e-4):
    """Single-outcome chi^2 term n(p-f)^2 / cp, cp = clip(p, mpc, None)
    (reference chi2fns.py:540 delegates to RawChi2Function._weights at
    objectivefns.py:2059, which clips only below -- its docstring overstates
    the clipping interval)."""
    cp = np.clip(p, min_prob_clip_for_weighting, None)
    return n * (p - f) ** 2 / cp


def chi2fn_wfreqs(n, p, f, min_freq_clip_for_weighting=1e-4):
    """Frequency-weighted single-outcome chi^2 term n(p-f)^2 / clip(f)
    (reference chi2fns.py:575)."""
    cf = np.clip(f, min_freq_clip_for_weighting, None)
    return n * (p - f) ** 2 / cf
