"""Gauge optimization (reference: pygsti/algorithms/gaugeopt.py:235).

``gaugeopt_to_target`` minimizes a weighted Frobenius distance between the
gauge-transformed model and a target over a gauge group, using jax gradients
+ scipy L-BFGS-B.  The objective matches the reference's weighted
frobeniusdist semantics (explicitcalc.frobeniusdist:127): squared element
differences weighted per-item ('gates'/'spam'/specific labels), normalized by
the weighted number of elements, sqrt at the end (sqrt irrelevant to argmin).

Compile strategy (cold-start): the model/target tensors and item weights are
RUNTIME ARGUMENTS of the jitted Adam loop / value-and-grad executables, which
are cached process-wide keyed on the STRUCTURE of the problem (gauge-group
type, shapes, metrics, penalty on/off) -- so the three stdgaugeopt stages
compile once per structure, every later gauge-opt call (other estimates,
warm re-runs, badfit re-opts) is a cache hit, and
``precompile_gaugeopt_suite`` can build all executables in a background
thread while the (TPU-bound) LM fit is still running, hiding the entire
gauge-opt compile cost of a cold GST run.
"""

from __future__ import annotations

import collections as _collections

import numpy as np

import jax
import jax.numpy as jnp
import scipy.optimize as spo

from pygsti_tpu.baseobjs.verbosityprinter import VerbosityPrinter
from pygsti_tpu.models.gaugegroup import (GaugeGroup, GaugeGroupElement,
                                          default_gauge_group_for_model,
                                          TrivialGaugeGroup)


@jax.custom_jvp
def _tracenorm_herm(A):
    """Trace norm (sum |eigenvalues|) of a Hermitian matrix.  Custom JVP
    (d tracenorm = sum_i sign(l_i) u_i^dag dA u_i) avoids NaN gradients from
    jax's eigh JVP at degenerate eigenvalues."""
    return jnp.sum(jnp.abs(jnp.linalg.eigvalsh(A)))


@_tracenorm_herm.defjvp
def _tracenorm_herm_jvp(primals, tangents):
    A, = primals
    dA, = tangents
    ev, U = jnp.linalg.eigh(A)
    val = jnp.sum(jnp.abs(ev))
    sgn = jnp.sign(ev)
    inner = jnp.einsum('ji,jk,ki->i', U.conj(), dA, U)
    return val, jnp.sum(sgn * jnp.real(inner)).astype(val.dtype)


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

    `maxfev` bounds the L-BFGS-B polish's function evaluations (reference
    gaugeopt_custom's maxfev).  `check_jac` verifies the jax gradient
    against central finite differences at the Adam optimum and raises on
    mismatch (reference _create_objective_fn's check-jacobian mode).
    `comm` is accepted for API parity and ignored: results are identical to
    the reference's comm=None serial path (single-controller JAX replaces
    MPI-parallel objective evaluation).  Leakage-aware optimization is NOT
    routed through `n_leak`; use the LAGO suite
    (pygsti_tpu.leakage.gaugeopt.std_lago_gopsuite / add_lago_models)."""
    if n_leak:
        raise NotImplementedError(
            "n_leak > 0 is not supported here; use the leakage-aware LAGO "
            "gauge-opt suite (pygsti_tpu.leakage.gaugeopt.std_lago_gopsuite)")
    import contextlib
    _cpus = jax.devices('cpu')
    _ctx = jax.default_device(_cpus[0]) if _cpus else contextlib.nullcontext()
    with _ctx:
        return _gaugeopt_to_target_impl(
            model, target_model, item_weights, cptp_penalty_factor,
            spam_penalty_factor, gates_metric, spam_metric, gauge_group,
            method, maxiter, maxfev, tol, return_all, comm, verbosity,
            check_jac, n_leak)


# -- structure-keyed executable cache ---------------------------------------
# key -> (run_adam_jit, vg_jit); see _compiled_gaugeopt_fns.  Executables
# depend only on problem STRUCTURE (shapes, gauge group type, metrics,
# penalties on/off, adam step count, dtype); all VALUES are runtime args.
# LRU-bounded: per-instance keys (non-structural gauge groups) would
# otherwise accumulate forever.
_GO_EXEC_CACHE = _collections.OrderedDict()
_GO_EXEC_CACHE_MAX = 16


# Gauge-group types whose element_matrix_jax graph is a pure function of
# (type, dim[, basis]) -- ONLY these may share compiled executables across
# instances.  Groups with instance-specific structure (OpGaugeGroup wraps an
# arbitrary operation; DirectSumUnitaryGroup has a level partition) get a
# unique per-instance key and never share.
_STRUCTURAL_GROUP_TYPES = frozenset([
    'FullGaugeGroup', 'TPGaugeGroup', 'DiagGaugeGroup', 'TPDiagGaugeGroup',
    'UnitaryGaugeGroup', 'SpamGaugeGroup', 'TPSpamGaugeGroup',
    'TrivialGaugeGroup'])


def _group_struct_key(gg):
    """Structural identity of a gauge group: two instances with the same key
    produce identical element_matrix_jax graphs.  Non-whitelisted group
    types key on instance identity (no cross-instance sharing)."""
    tname = type(gg).__name__
    if tname not in _STRUCTURAL_GROUP_TYPES:
        return (tname, id(gg))
    basis = getattr(gg, 'basis', None)
    bname = getattr(basis, 'name', basis) if basis is not None else None
    return (tname, int(gg.num_params), int(gg.dim), bname)


def _make_objective(gauge_group, dim, gates_metric, spam_metric,
                    cptp_on, spam_on, basis_consts):
    """Build the pure gauge objective f(v, arrs) where arrs =
    (ops, tgt_ops, op_w, preps, tgt_preps, prep_w, effects, tgt_effects,
    effect_w, pen_factors) are traced runtime tensors."""
    d = dim
    need_std = (gates_metric in ("fidelity", "tracedist")
                or spam_metric in ("fidelity", "tracedist")
                or cptp_on or spam_on)
    if need_std:
        M, Minv, els = basis_consts
        udim = int(round(np.sqrt(d)))

        def _choi_std(G):
            s_std = (M @ G.astype(M.dtype)) @ Minv
            return s_std.reshape(udim, udim, udim, udim).transpose(
                0, 2, 1, 3).reshape(d, d) / udim

        def _vec_to_stdmx(vec):
            return jnp.tensordot(vec.astype(els.dtype), jnp.asarray(els), axes=1)

        def _tracenorm(H):
            return _tracenorm_herm((H + H.conj().T) / 2)

        from pygsti_tpu.objectivefns.objectivefns import (
            _sum_neg_evals, _NEG_EIG_SQRT_SHIFT)

        def _neg_evals_sum(H):
            return _sum_neg_evals((H + H.conj().T) / 2)

    def objective(v, arrs):
        (ops, tgt_ops, op_w, preps, tgt_preps, prep_w,
         effects, tgt_effects, effect_w, pen_factors) = arrs
        total_weighted_count = (jnp.sum(op_w) * d * d
                                + jnp.sum(prep_w) * d + jnp.sum(effect_w) * d)
        S = gauge_group.element_matrix_jax(v)
        Sinv = jnp.linalg.inv(S)
        ops_t = jnp.einsum('ij,kjl,lm->kim', Sinv, ops, S)
        preps_t = preps @ Sinv.T          # Sinv @ rho per prep
        effects_t = effects @ S           # E @ S per effect row

        n_ops = ops.shape[0]
        n_preps = preps.shape[0]
        n_effects = effects.shape[0]

        val = jnp.asarray(0.0, v.dtype)
        # -- gates term ------------------------------------------------------
        if "frobenius" in gates_metric:
            val = val + jnp.sum(op_w[:, None, None] * (ops_t - tgt_ops) ** 2) \
                / total_weighted_count
        elif gates_metric == "fidelity":
            # |1 - entanglement fidelity| per gate (unitary targets:
            # F_e = tr(T^T G)/d; reference: gaugeopt.py:642-650)
            for k in range(n_ops):
                fid = jnp.einsum('ij,ij->', tgt_ops[k], ops_t[k]) / d
                val = val + op_w[k] * jnp.abs(1.0 - fid)
        elif gates_metric == "tracedist":
            # jtracedist = 0.5 * tracenorm(choi(G) - choi(T))
            for k in range(n_ops):
                val = val + op_w[k] * 0.5 * _tracenorm(
                    _choi_std(ops_t[k]) - _choi_std(tgt_ops[k]))

        # -- spam term ---------------------------------------------------------
        if "frobenius" in spam_metric:
            val = val + (jnp.sum(prep_w[:, None] * (preps_t - tgt_preps) ** 2)
                         + jnp.sum(effect_w[:, None] * (effects_t - tgt_effects) ** 2)) \
                / total_weighted_count
        elif spam_metric == "fidelity":
            # state fidelity to (near-pure) targets: F = tr(rho sigma)
            for k in range(n_preps):
                fid = jnp.real(jnp.trace(_vec_to_stdmx(preps_t[k])
                                         @ _vec_to_stdmx(tgt_preps[k])))
                val = val + prep_w[k] * jnp.abs(1.0 - fid)
            for k in range(n_effects):
                fid = jnp.real(jnp.trace(_vec_to_stdmx(effects_t[k])
                                         @ _vec_to_stdmx(tgt_effects[k])))
                tgt_fid = jnp.real(jnp.trace(_vec_to_stdmx(tgt_effects[k])
                                             @ _vec_to_stdmx(tgt_effects[k])))
                val = val + effect_w[k] * jnp.abs(tgt_fid - fid)
        elif spam_metric == "tracedist":
            for k in range(n_preps):
                val = val + prep_w[k] * 0.5 * _tracenorm(
                    _vec_to_stdmx(preps_t[k]) - _vec_to_stdmx(tgt_preps[k]))
            for k in range(n_effects):
                val = val + effect_w[k] * 0.5 * _tracenorm(
                    _vec_to_stdmx(effects_t[k]) - _vec_to_stdmx(tgt_effects[k]))

        # -- positivity penalties (reference: gaugeopt.py:615-623) -------------
        if cptp_on:
            for k in range(n_ops):
                val = val + pen_factors[0] * jnp.sqrt(
                    _NEG_EIG_SQRT_SHIFT + _neg_evals_sum(_choi_std(ops_t[k])))
        if spam_on:
            for k in range(n_preps):
                val = val + pen_factors[1] * jnp.sqrt(
                    _NEG_EIG_SQRT_SHIFT + _neg_evals_sum(_vec_to_stdmx(preps_t[k])))
            for k in range(n_effects):
                val = val + pen_factors[1] * jnp.sqrt(
                    _NEG_EIG_SQRT_SHIFT + _neg_evals_sum(_vec_to_stdmx(effects_t[k])))
        return val

    return objective


def _compiled_gaugeopt_fns(gauge_group, dim, shapes, gates_metric, spam_metric,
                           cptp_on, spam_on, basis_key, basis_consts, steps,
                           dtype_key):
    """Return (run_adam_jit, vg_jit) for this problem structure, building and
    caching them on first use.  `shapes` = (n_ops, n_preps, n_effects)."""
    key = (_group_struct_key(gauge_group), dim, shapes, gates_metric,
           spam_metric, cptp_on, spam_on, basis_key, steps, dtype_key)
    fns = _GO_EXEC_CACHE.get(key)
    if fns is not None:
        _GO_EXEC_CACHE.move_to_end(key)
        return fns

    objective = _make_objective(gauge_group, dim, gates_metric, spam_metric,
                                cptp_on, spam_on, basis_consts)
    import optax
    opt = optax.adam(3e-2)

    @jax.jit
    def run_adam(x_init, arrs):
        def step(carry, _):
            x, state = carry
            g = jax.grad(objective)(x, arrs)
            updates, state = opt.update(g, state, x)
            return (optax.apply_updates(x, updates), state), None
        (x_fin, _), _ = jax.lax.scan(step, (x_init, opt.init(x_init)),
                                     None, length=steps)
        return x_fin

    vg_jit = jax.jit(jax.value_and_grad(objective))
    _GO_EXEC_CACHE[key] = (run_adam, vg_jit)
    while len(_GO_EXEC_CACHE) > _GO_EXEC_CACHE_MAX:
        _GO_EXEC_CACHE.popitem(last=False)
    return run_adam, vg_jit


def _gaugeopt_to_target_impl(model, target_model, item_weights, cptp_penalty_factor,
                             spam_penalty_factor, gates_metric, spam_metric,
                             gauge_group, method, maxiter, maxfev, tol,
                             return_all, comm, verbosity, check_jac, n_leak,
                             precompile_only=False):
    printer = VerbosityPrinter.create_printer(verbosity)
    if gauge_group is None:
        gauge_group = default_gauge_group_for_model(model)
    if isinstance(gauge_group, TrivialGaugeGroup) or gauge_group.num_params == 0:
        if precompile_only:
            return None
        return (model.copy(), None, model.copy()) if return_all else model.copy()

    item_weights = dict(item_weights or {})
    gates_weight = item_weights.get('gates', 1.0)
    spam_weight = item_weights.get('spam', 1.0)

    # dense tensors from both models -- runtime args of the cached executables
    op_keys = list(model.operations.keys())
    ops = jnp.asarray(np.stack([model.operations[k].to_dense() for k in op_keys]))
    tgt_ops = jnp.asarray(np.stack([target_model.operations[k].to_dense() for k in op_keys]))
    op_w = jnp.asarray(np.asarray(
        [item_weights.get(k, gates_weight) for k in op_keys], dtype=float))

    prep_keys = list(model.preps.keys())
    preps = jnp.asarray(np.stack([model.preps[k].to_dense() for k in prep_keys]))
    tgt_preps = jnp.asarray(np.stack([target_model.preps[k].to_dense() for k in prep_keys]))
    prep_w = jnp.asarray(np.asarray(
        [item_weights.get(k, spam_weight) for k in prep_keys], dtype=float))

    povm_keys = list(model.povms.keys())
    effects = jnp.asarray(np.concatenate([model.povms[k].to_dense() for k in povm_keys], axis=0))
    tgt_effects = jnp.asarray(np.concatenate([target_model.povms[k].to_dense() for k in povm_keys],
                                             axis=0))
    effect_w_list = []
    for k in povm_keys:
        w = item_weights.get(k, spam_weight)
        effect_w_list.extend([w] * model.povms[k].num_outcomes)
    effect_w = jnp.asarray(np.asarray(effect_w_list, dtype=float))

    d = model.dim

    if gates_metric not in ("frobenius", "frobeniussquared", "fidelity", "tracedist"):
        raise ValueError("Invalid gates_metric: %r" % gates_metric)
    if spam_metric not in ("frobenius", "frobeniussquared", "fidelity", "tracedist"):
        raise ValueError("Invalid spam_metric: %r" % spam_metric)

    cptp_on = cptp_penalty_factor > 0
    spam_on = spam_penalty_factor > 0

    # basis machinery for Choi/density matrices (fidelity, tracedist and the
    # CPTP/SPAM penalties all need the std-basis representation; reference:
    # gaugeopt.py:617-717 _objective_fn, :977-1006 _cptp/_spam_penalty).
    # Static numpy constants, keyed by (basis name, dim).
    need_std = (gates_metric in ("fidelity", "tracedist")
                or spam_metric in ("fidelity", "tracedist")
                or cptp_on or spam_on)
    basis_key = None
    basis_consts = None
    if need_std:
        from pygsti_tpu.baseobjs.basis import Basis
        bobj = getattr(model, 'basis', 'pp')
        bobj = Basis.cast(bobj, d) if isinstance(bobj, str) else bobj
        basis_key = getattr(bobj, 'name', str(bobj))
        M = np.asarray(bobj.create_transform_matrix('std')).astype(complex)
        Minv = np.linalg.inv(M)
        els = np.asarray(bobj.elements).astype(complex)  # [d, u, u]
        basis_consts = (M, Minv, els)

    pen_factors = jnp.asarray(np.asarray(
        [cptp_penalty_factor, spam_penalty_factor], dtype=float))
    arrs = (ops, tgt_ops, op_w, preps, tgt_preps, prep_w,
            effects, tgt_effects, effect_w, pen_factors)

    steps = min(maxiter, 2000)
    shapes = (len(op_keys), len(prep_keys), int(effects.shape[0]))
    run_adam, vg_jit = _compiled_gaugeopt_fns(
        gauge_group, d, shapes, gates_metric, spam_metric, cptp_on, spam_on,
        basis_key, basis_consts, steps, str(ops.dtype))

    x0 = gauge_group.initial_params()

    if check_jac and not precompile_only:
        # verify the jax gradient against central finite differences at x0
        # (reference: gaugeopt._create_objective_fn's check-jacobian mode)
        x0f = np.asarray(x0, float)
        g = np.asarray(vg_jit(jnp.asarray(x0f), arrs)[1], float)
        eps = 1e-6
        fd = np.zeros_like(g)
        for i in range(len(g)):
            xp = x0f.copy()
            xp[i] += eps
            xm = x0f.copy()
            xm[i] -= eps
            fd[i] = (float(vg_jit(jnp.asarray(xp), arrs)[0])
                     - float(vg_jit(jnp.asarray(xm), arrs)[0])) / (2 * eps)
        if not np.allclose(g, fd, atol=1e-4, rtol=1e-3):
            raise ValueError("check_jac: jax gradient disagrees with finite "
                             "differences (max |diff| = %g)"
                             % float(np.max(np.abs(g - fd))))

    if precompile_only:
        # Trigger compilation of both executables (values irrelevant) by
        # CALLING them rather than AOT lower().compile(): only a real call
        # is guaranteed to populate jax's jit dispatch cache, which is what
        # the later gaugeopt_to_target call hits (AOT-compiled executables
        # are not inserted into it).  The wasted execution (~1s of Adam
        # steps on dim<=16 matrices) runs while the main thread is blocked
        # in TPU RPCs, so the host core is otherwise idle.
        xj = jnp.asarray(np.asarray(x0))
        if method in ('auto', 'adam'):
            run_adam(xj, arrs).block_until_ready()
        vg_jit(xj, arrs)[0].block_until_ready()
        return None

    return _run_gaugeopt(run_adam, vg_jit, arrs, gauge_group, x0, method,
                         maxiter, maxfev, tol, model, printer, return_all)


def _run_gaugeopt(run_adam, vg_jit, arrs, gauge_group, x0, method, maxiter,
                  maxfev, tol, model, printer, return_all):
    import scipy.optimize as spo
    if method in ('auto', 'adam'):
        # fully on-device optimization: one jitted Adam loop (avoids
        # per-iteration host round trips), then a short L-BFGS polish.
        x_adam = np.asarray(run_adam(jnp.asarray(np.asarray(x0)), arrs))
    else:
        x_adam = x0

    def fun_and_grad(x):
        f, g = vg_jit(jnp.asarray(x), arrs)
        return float(f), np.asarray(g, dtype=float)

    lbfgs_opts = {'maxiter': min(maxiter, 200), 'ftol': tol, 'gtol': 1e-10}
    if maxfev is not None:
        lbfgs_opts['maxfun'] = int(maxfev)
    res = spo.minimize(fun_and_grad, x_adam, jac=True, method='L-BFGS-B',
                       options=lbfgs_opts)
    printer.log("Gauge optimization: %s -> %s (%d iters)"
                % (fun_and_grad(np.asarray(x0))[0], res.fun, res.nit), 2)

    el = gauge_group.compute_element(res.x)
    new_model = model.copy()
    new_model.transform_inplace(el)
    if return_all:
        return new_model, res.x, el
    return new_model


def precompile_gaugeopt_suite(gaugeopt_suite, model, target_model=None,
                              verbosity=0):
    """Compile (on the CPU backend) every gauge-opt executable a suite will
    need for `model`, WITHOUT transforming anything -- so a later
    ``gaugeopt_to_target`` call is a pure cache hit.  Designed to run in a
    background thread while the (TPU-bound) LM fit is still in progress,
    hiding the entire gauge-opt compile cost of a cold GST run.

    `model` only provides problem STRUCTURE (shapes, parameterization,
    basis); its values are irrelevant, so the GST seed model works."""
    import contextlib
    if gaugeopt_suite is None or gaugeopt_suite.is_empty():
        return
    godict = gaugeopt_suite.to_dictionary(model)
    target = target_model if target_model is not None else model
    _cpus = jax.devices('cpu')
    _ctx = jax.default_device(_cpus[0]) if _cpus else contextlib.nullcontext()
    with _ctx:
        for goparams in godict.values():
            for stage in goparams.get('stages', [goparams]):
                kwargs = dict(stage)
                try:
                    _gaugeopt_to_target_impl(
                        model, target,
                        kwargs.get('item_weights'),
                        kwargs.get('cptp_penalty_factor', 0),
                        kwargs.get('spam_penalty_factor', 0),
                        kwargs.get('gates_metric', 'frobenius'),
                        kwargs.get('spam_metric', 'frobenius'),
                        kwargs.get('gauge_group'),
                        kwargs.get('method', 'auto'),
                        kwargs.get('maxiter', 1000),
                        kwargs.get('maxfev'), kwargs.get('tol', 1e-10),
                        False, None, 0, False, kwargs.get('n_leak', 0),
                        precompile_only=True)
                except Exception:  # best-effort warmup; real call will compile
                    pass


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


class GaugeoptToTargetArgs(object):
    """Argument container for gaugeopt_to_target calls (reference:
    gaugeopt.GaugeoptToTargetArgs) -- stores kwargs so gauge-opt suites can
    be built programmatically and replayed."""

    def __init__(self, **kwargs):
        self.args = dict(kwargs)

    def run(self, model, target_model):
        return gaugeopt_to_target(model, target_model, **self.args)


def gates_with_instruments(model):
    """The model's operation labels plus expanded instrument-member labels
    (reference: gaugeopt.gates_with_instruments)."""
    labels = list(model.operations.keys())
    for ilbl, inst in getattr(model, 'instruments', {}).items():
        for mlbl in inst.member_labels:
            labels.append((ilbl, mlbl))
    return labels
