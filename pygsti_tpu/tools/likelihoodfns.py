"""Standalone log-likelihood evaluation helpers (reference:
pygsti/tools/likelihoodfns.py).  Thin delegations to the objective-function
implementations (imported lazily to avoid a tools <-> objectivefns import
cycle)."""

from __future__ import annotations

import numpy as np


def logl(model, dataset, circuits=None, min_prob_clip=1e-6, radius=1e-4,
         poisson_picture=True, **_kwargs):
    """logL of the model (reference: likelihoodfns.logl:115)."""
    from pygsti_tpu.objectivefns.objectivefns import logl as _logl
    return _logl(model, dataset, circuits, min_prob_clip=min_prob_clip,
                 radius=radius, poisson_picture=poisson_picture)


def logl_max(model, dataset, circuits=None, poisson_picture=True, **_kwargs):
    """Maximum achievable logL (data frequencies; reference:
    likelihoodfns.logl_max)."""
    from pygsti_tpu.objectivefns.objectivefns import logl_max as _m
    return _m(model, dataset, circuits, poisson_picture=poisson_picture)


def two_delta_logl(model, dataset, circuits=None, min_prob_clip=1e-6,
                   radius=1e-4, poisson_picture=True, **_kwargs):
    """2*(logL_max - logL) (reference: likelihoodfns.two_delta_logl)."""
    from pygsti_tpu.objectivefns.objectivefns import two_delta_logl as _t
    return _t(model, dataset, circuits, min_prob_clip=min_prob_clip,
              radius=radius, poisson_picture=poisson_picture)


def logl_jacobian(model, dataset, circuits=None, min_prob_clip=1e-4,
                  prob_clip_interval=(-1e6, 1e6), radius=1e-4,
                  poisson_picture=True, **_kwargs):
    """d(logL)/d(params) via exact AD (reference: likelihoodfns.logl_jacobian
    -- analytic there; jax grad of the same objective here)."""
    import jax
    import jax.numpy as jnp
    from pygsti_tpu.objectivefns.objectivefns import (
        RawPoissonPicDeltaLogLFunction, RawDeltaLogLFunction,
        TimeIndependentMDCObjectiveFunction)
    raw_cls = RawPoissonPicDeltaLogLFunction if poisson_picture \
        else RawDeltaLogLFunction
    reg = {'min_prob_clip': min_prob_clip}
    if poisson_picture:
        reg['radius'] = radius
    raw = raw_cls(regularization=reg)
    obj = TimeIndependentMDCObjectiveFunction(raw, model, dataset,
                                              list(circuits) if circuits
                                              is not None else None)
    probs_fn = model.sim.probs_fn(obj.layout)
    counts = jnp.asarray(obj.counts)
    totals = jnp.asarray(obj.total_counts)
    freqs = jnp.asarray(obj.freqs)

    def neg_delta(v):
        # logL = logL_max - DeltaLogL; d logL = -d DeltaLogL
        p, pullback = jax.vjp(probs_fn, v)
        dt = raw.dterms(p, counts, totals, freqs)
        return -pullback(dt)[0]

    return np.asarray(jax.jit(neg_delta)(jnp.asarray(model.to_vector())))


def logl_hessian(model, dataset, circuits=None, min_prob_clip=1e-4,
                 prob_clip_interval=(-1e6, 1e6), radius=1e-4,
                 poisson_picture=True, **_kwargs):
    """d2(logL) via exact second-order AD (reference:
    likelihoodfns.logl_hessian:330-427 -- returns the Hessian of logL, i.e.
    MINUS the Hessian of DeltaLogL)."""
    import jax
    import jax.numpy as jnp
    from pygsti_tpu.objectivefns.objectivefns import (
        RawPoissonPicDeltaLogLFunction, RawDeltaLogLFunction,
        TimeIndependentMDCObjectiveFunction)
    raw_cls = RawPoissonPicDeltaLogLFunction if poisson_picture \
        else RawDeltaLogLFunction
    reg = {'min_prob_clip': min_prob_clip}
    if poisson_picture:
        reg['radius'] = radius
    raw = raw_cls(regularization=reg)
    obj = TimeIndependentMDCObjectiveFunction(raw, model, dataset,
                                              list(circuits) if circuits
                                              is not None else None)
    probs_fn = model.sim.probs_fn(obj.layout)
    counts = jnp.asarray(obj.counts)
    totals = jnp.asarray(obj.total_counts)
    freqs = jnp.asarray(obj.freqs)

    def grad_delta(v):
        p, pullback = jax.vjp(probs_fn, v)
        dt = raw.dterms(p, counts, totals, freqs)
        return pullback(dt)[0]

    H = jax.jit(jax.jacfwd(grad_delta))(jnp.asarray(model.to_vector()))
    return -np.asarray(H)


def logl_approximate_hessian(model, dataset, circuits=None, min_prob_clip=1e-4,
                             prob_clip_interval=(-1e6, 1e6), radius=1e-4,
                             poisson_picture=True, **_kwargs):
    """Gauss-Newton approximation of logl_hessian (drops the d2p term;
    reference: likelihoodfns.logl_approximate_hessian:430)."""
    import jax
    import jax.numpy as jnp
    from pygsti_tpu.objectivefns.objectivefns import (
        RawPoissonPicDeltaLogLFunction, TimeIndependentMDCObjectiveFunction)
    raw = RawPoissonPicDeltaLogLFunction(
        regularization={'min_prob_clip': min_prob_clip, 'radius': radius})
    obj = TimeIndependentMDCObjectiveFunction(raw, model, dataset,
                                              list(circuits) if circuits
                                              is not None else None)
    probs_fn = model.sim.probs_fn(obj.layout)
    counts = jnp.asarray(obj.counts)
    totals = jnp.asarray(obj.total_counts)
    freqs = jnp.asarray(obj.freqs)

    def gn(v):
        p = probs_fn(v)
        h = raw.hterms(p, counts, totals, freqs)
        J = jax.jacfwd(probs_fn)(v)
        return (J.T * h[None, :]) @ J

    return -np.asarray(jax.jit(gn)(jnp.asarray(model.to_vector())))


def _logl_max_terms_per_circuit(dataset, circuits, poisson_picture=True):
    """Max-logL contribution per circuit from data frequencies (same
    convention as objectivefns.logl_max: sum n*log(f), minus N in the
    Poisson picture)."""
    out = []
    for c in circuits:
        row = dataset[c]
        total = row.total
        val = 0.0
        for _, n in row.counts.items():
            if n > 0:
                val += n * np.log(n / total)
        if poisson_picture:
            val -= total
        out.append(val)
    return np.array(out)


def logl_per_circuit(model, dataset, circuits=None, min_prob_clip=1e-6,
                     prob_clip_interval=(-1e6, 1e6), radius=1e-4,
                     poisson_picture=True, **_kwargs):
    """Per-circuit logL contributions (reference:
    likelihoodfns.logl_per_circuit:189)."""
    return logl_max_per_circuit(model, dataset, circuits,
                                poisson_picture=poisson_picture) \
        - 0.5 * two_delta_logl_per_circuit(
            model, dataset, circuits, min_prob_clip=min_prob_clip,
            radius=radius, poisson_picture=poisson_picture)


def logl_max_per_circuit(model, dataset, circuits=None, poisson_picture=True,
                         **_kwargs):
    """Per-circuit maximum-achievable logL (reference:
    likelihoodfns.logl_max_per_circuit:563)."""
    circuits = list(circuits) if circuits is not None else list(dataset.keys())
    return _logl_max_terms_per_circuit(dataset, circuits, poisson_picture)


def two_delta_logl_per_circuit(model, dataset, circuits=None,
                               min_prob_clip=1e-6,
                               prob_clip_interval=(-1e6, 1e6), radius=1e-4,
                               poisson_picture=True, **_kwargs):
    """Per-circuit 2*(logL_max - logL) (reference:
    likelihoodfns.two_delta_logl_per_circuit:801)."""
    from pygsti_tpu.objectivefns.objectivefns import (
        RawPoissonPicDeltaLogLFunction, RawDeltaLogLFunction,
        TimeIndependentMDCObjectiveFunction)
    circuits = list(circuits) if circuits is not None else list(dataset.keys())
    raw_cls = RawPoissonPicDeltaLogLFunction if poisson_picture \
        else RawDeltaLogLFunction
    reg = {'min_prob_clip': min_prob_clip}
    if poisson_picture:
        reg['radius'] = radius
    obj = TimeIndependentMDCObjectiveFunction(raw_cls(regularization=reg),
                                              model, dataset, circuits)
    return 2.0 * obj.percircuit()


def two_delta_logl_nsigma(model, dataset, circuits=None, min_prob_clip=1e-6,
                          prob_clip_interval=(-1e6, 1e6), radius=1e-4,
                          poisson_picture=True, dof_calc_method='modeltest',
                          **_kwargs):
    """Number of std deviations of 2*DeltaLogL above its chi2 expectation
    (reference: likelihoodfns.two_delta_logl_nsigma:609)."""
    two_dlogl = two_delta_logl(model, dataset, circuits,
                               min_prob_clip=min_prob_clip, radius=radius,
                               poisson_picture=poisson_picture)
    circuits = list(circuits) if circuits is not None else list(dataset.keys())
    k = dataset.degrees_of_freedom(circuits)
    if dof_calc_method == 'modeltest':
        pass  # dof = dataset dof (the model is FIXED -- no params subtracted)
    elif dof_calc_method == 'nongauge':
        k -= model.num_params
    else:
        raise ValueError("Invalid `dof_calc_method`: %s" % dof_calc_method)
    k = max(k, 1)
    return (two_dlogl - k) / np.sqrt(2 * k)


def two_delta_logl_term(n, p, f, min_prob_clip=1e-6, poisson_picture=True):
    """Pointwise 2*Delta-logL term for counts `n` = N*f at probability `p`
    (reference: likelihoodfns.two_delta_logl_term:913)."""
    n = np.asarray(n, float)
    p = np.clip(np.asarray(p, float), min_prob_clip, None)
    f = np.asarray(f, float)
    N = np.where(f > 0, n / np.where(f > 0, f, 1.0), n)
    with np.errstate(divide='ignore', invalid='ignore'):
        term = 2 * np.where(n > 0, n * (np.log(np.where(f > 0, f, 1.0))
                                        - np.log(p)), 0.0)
    if poisson_picture:
        term = term + 2 * (N * p - n)
    return term
