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
