"""Wildcard-budget optimizers (reference: pygsti/optimize/wildcardopt.py).

Three optimizers over the per-op wildcard vector x >= 0:

* ``optimize_wildcard_budget_neldermead`` / ``optimize_wildcard_budget_1d``
  (in ``pygsti_tpu.objectivefns.wildcardbudget``): penalized simplex search /
  1-D alpha bisection.
* ``optimize_wildcard_budget_barrier`` (here): the reference's fast default
  (wildcardopt.py:413) -- log-barrier interior-point Newton over
      min  L1weights . x
      s.t. 2DeltaLogL(p(x)) <= threshold            (aggregate constraint)
           critical_budget_c <= W_c(x)  per circuit (red-box constraints)
           x >= 0
  with analytic gradient/Hessian through the waterfilled probabilities.

These are host-side optimizations over a handful of parameters; the
probability updates are numpy waterfills (optimizing them on-device buys
nothing at these sizes).
"""

from __future__ import annotations

import numpy as np

from pygsti_tpu.objectivefns.wildcardbudget import (
    _waterfill, optimize_wildcard_budget_1d, optimize_wildcard_budget_neldermead,
    update_circuit_probs)


def _np_logl_terms(p, n, N, f, min_p=1e-10):
    """Poisson-picture 2*DeltaLogL terms in plain numpy (fast small-vector
    path for the per-circuit bisections; formula matches
    RawPoissonPicDeltaLogLFunction.terms at generic points)."""
    with np.errstate(invalid='ignore', divide='ignore'):
        f_nz = np.where(n == 0, 1.0, f)
        p_cl = np.clip(p, min_p, None)
        terms = n * (np.log(f_nz) - np.log(p_cl)) + N * (p_cl - f)
        terms = np.where(n == 0, N * p_cl, terms)
    return np.clip(terms, 0, None)


def _get_critical_circuit_budgets(objfn, redbox_threshold):
    """Per-circuit budget at which that circuit's 2DeltaLogL hits the
    red-box threshold (reference: wildcardopt.py:180)."""
    layout = objfn.layout
    probs = np.asarray(objfn.probs())
    freqs = np.asarray(objfn.freqs)
    counts = np.asarray(objfn.counts)
    totals = np.asarray(objfn.total_counts)
    num_circuits = len(layout.circuits)
    crit = np.zeros(num_circuits)
    for i in range(num_circuits):
        sl = layout.element_slices[i]
        p, f = probs[sl], freqs[sl]
        n, N = counts[sl], totals[sl]
        if N.sum() == 0:
            continue  # masked/padded circuit

        def two_delta_logl(W):
            q = _waterfill(p, f, W)
            return 2 * float(np.sum(_np_logl_terms(q, n, N, f)))

        lbound, ubound = 0.0, 1.0
        if two_delta_logl(0.0) <= redbox_threshold:
            crit[i] = 0.0
            continue
        while ubound - lbound > 1e-6:
            mid = 0.5 * (ubound + lbound)
            if two_delta_logl(mid) < redbox_threshold:
                ubound = mid
            else:
                lbound = mid
        crit[i] = 0.5 * (ubound + lbound)
    return crit


def _agg_dlogl(current_probs, objfn, two_dlogl_threshold):
    n = np.asarray(objfn.counts)
    N = np.asarray(objfn.total_counts)
    f = np.asarray(objfn.freqs)
    return 2 * float(np.sum(_np_logl_terms(current_probs, n, N, f))) \
        - two_dlogl_threshold


def _agg_dlogl_deriv(current_probs, objfn, percircuit_budget_deriv, dp_dW):
    """d(2DeltaLogL)/dx via per-circuit chain rule (reference:
    wildcardopt.py:237)."""
    n = np.asarray(objfn.counts)
    N = np.asarray(objfn.total_counts)
    p_cl = np.clip(current_probs, 1e-10, None)
    dlogl_dp = np.where(n == 0, N, N - n / p_cl)     # dterms/dp
    layout = objfn.layout
    num_circuits = len(layout.circuits)
    dW = np.zeros(num_circuits)
    for i in range(num_circuits):
        sl = layout.element_slices[i]
        dW[i] = 2 * float(np.sum(dlogl_dp[sl] * dp_dW[sl]))
    return dW @ percircuit_budget_deriv


def _agg_dlogl_hessian(current_probs, objfn, percircuit_budget_deriv, dp_dW):
    """Gauss-Newton-style directional Hessian (reference:
    wildcardopt.py:275)."""
    n = np.asarray(objfn.counts)
    N = np.asarray(objfn.total_counts)
    p_cl = np.clip(current_probs, 1e-10, None)
    hterms = np.where(n == 0, 0.0, n / p_cl ** 2)
    layout = objfn.layout
    num_circuits = len(layout.circuits)
    hW = np.zeros(num_circuits)
    with np.errstate(over='ignore'):
        for i in range(num_circuits):
            sl = layout.element_slices[i]
            hW[i] = 2 * float(np.sum(hterms[sl] * dp_dW[sl] ** 2))
    hW[~np.isfinite(hW)] = 1e100
    return percircuit_budget_deriv.T @ (hW[:, None] * percircuit_budget_deriv)


def NewtonSolve(initial_x, fn, fn_with_derivs=None, dx_tol=1e-6, max_iters=20,
                printer=None, lmbda=0.0):
    """Damped Newton with backtracking on the clipped (x >= 0) iterates
    (reference: wildcardopt.py:577)."""
    x = initial_x.copy()
    x_list = [x.copy()]
    I = np.identity(len(x))
    i = 0
    while i < max_iters:
        obj, Dobj, Hobj = fn_with_derivs(x)
        Hobj = (Hobj + Hobj.T) / 2
        if not (np.all(np.isfinite(Hobj)) and np.all(np.isfinite(Dobj))):
            break    # boundary of the feasible region: stop at current x
        if np.linalg.matrix_rank(Hobj) < Hobj.shape[0]:
            dx = -Dobj / max(np.linalg.norm(Dobj), 1e-300)
        else:
            dx = -np.dot((1 - lmbda) * np.linalg.inv(Hobj) + lmbda * I, Dobj)
        with np.errstate(divide='ignore', invalid='ignore'):
            while np.linalg.norm(dx) >= dx_tol:
                test_x = np.clip(x + dx, 0, None)
                if fn(test_x) < obj:
                    break
                dx *= 0.1
            else:
                if printer:
                    printer.log("Newton converged at f=%g (no descent step)"
                                % obj)
                break
        x = np.clip(x + dx, 0, None)
        x_list.append(x.copy())
        i += 1
        if np.linalg.norm(dx) < dx_tol:
            break
    return x, x_list


def optimize_wildcard_budget_barrier(budget, L1weights, objfn,
                                     two_dlogl_threshold, redbox_threshold,
                                     printer=None, tol=1e-7, max_iters=50,
                                     num_steps=3):
    """Log-barrier interior-point optimization of the wildcard budget
    (reference: optimize/wildcardopt.py:413).

    Solves min L1weights.x subject to the aggregate 2DeltaLogL constraint,
    per-circuit red-box constraints, and x >= 0, via Newton on
    t * |c.x| - sum log(-F(x)) for a geometric ladder of t values.
    """
    from pygsti_tpu.baseobjs.verbosityprinter import VerbosityPrinter
    printer = VerbosityPrinter.create_printer(printer if printer is not None
                                              else 0)
    layout = objfn.layout
    circuits = list(layout.circuits)
    critical_percircuit_budgets = _get_critical_circuit_budgets(
        objfn, redbox_threshold)
    percircuit_budget_deriv = budget.precompute_for_same_circuits(circuits)

    initial_probs = np.asarray(objfn.probs())
    freqs = np.asarray(objfn.freqs)
    counts = np.asarray(objfn.counts)
    totals = np.asarray(objfn.total_counts)
    L1weights = np.asarray(L1weights, dtype=float)

    def _updated(x, want_deriv):
        budget.from_vector(np.asarray(x))
        return budget.update_probs(initial_probs, freqs, counts, totals,
                                   layout.element_slices, circuits,
                                   return_deriv=want_deriv)

    def penalty_vec(x):
        q = _updated(x, False)
        f0 = np.array([_agg_dlogl(q, objfn, two_dlogl_threshold)])
        fi = critical_percircuit_budgets - percircuit_budget_deriv @ x
        return np.concatenate((f0, fi))

    def barrierF(x, compute_deriv=True):
        assert min(x) >= 0
        q, dp_dW = _updated(x, True)
        f0 = np.array([_agg_dlogl(q, objfn, two_dlogl_threshold)])
        fi = critical_percircuit_budgets - percircuit_budget_deriv @ x
        f = np.concatenate((f0, fi, -x))
        if np.any(f >= 0):
            # infeasible (a constraint active or violated): the true barrier
            # is +inf here; backtracking must reject such steps
            val = np.inf
        else:
            val = -np.sum(np.log(-f))
        if not compute_deriv:
            return val
        Df0 = _agg_dlogl_deriv(q, objfn, percircuit_budget_deriv, dp_dW)
        deriv = -1 / f0 * Df0 - (1 / fi) @ percircuit_budget_deriv - 1 / x
        Hf0 = _agg_dlogl_hessian(q, objfn, percircuit_budget_deriv, dp_dW)
        hess = (1 / f0 ** 2) * np.outer(Df0, Df0) - (1 / f0) * Hf0 \
            + np.einsum('i,ij,ik->jk', 1 / fi ** 2, percircuit_budget_deriv,
                        percircuit_budget_deriv) \
            + np.diag(1 / x ** 2)
        return val, deriv, hess

    # find a strictly feasible starting point (all coordinates positive so
    # the -log(x) terms are finite)
    x0 = np.maximum(budget.to_vector().astype(float), 1e-7)
    if not np.all(penalty_vec(x0) < 0):
        if np.linalg.norm(x0) < 1e-5:
            x0[:] = 1e-5
        for _ in range(100):
            if np.all(penalty_vec(x0) < 0):
                break
            x0 *= 2.0
        else:
            raise ValueError("Could not find feasible starting point!")
    printer.log("Barrier method initial feasible point: %s" % x0)
    x = x0.copy()

    num_constraints = 1 + len(critical_percircuit_budgets) + 2 * len(x0)
    log10_end = int(np.ceil(np.log10(2 * num_constraints / tol)))
    t_values = np.logspace(log10_end - (num_steps - 1), log10_end, num_steps)

    c = L1weights
    for t in t_values:
        def NewtonObjective(xx):
            return float(t * np.sum(np.abs(c * xx))
                         + barrierF(xx, compute_deriv=False))

        def NewtonObjective_derivs(xx):
            barrier, Dbarrier, Hbarrier = barrierF(xx)
            return (t * np.sum(np.abs(c * xx)) + barrier,
                    t * c + Dbarrier, Hbarrier)

        x, _ = NewtonSolve(x, NewtonObjective, NewtonObjective_derivs,
                           tol, max_iters, printer - 1
                           if hasattr(printer, '__sub__') else printer)

    budget.from_vector(x)
    return budget


def optimize_wildcard_bisect_alpha(budget, objfn, two_dlogl_threshold,
                                   redbox_threshold, printer=None,
                                   guess=0.1, tol=1e-3):
    """1-D alpha bisection (reference: wildcardopt.py:352); delegates to the
    1-D budget optimizer."""
    return optimize_wildcard_budget_1d(objfn, budget, two_dlogl_threshold)


def optimize_wildcard_budget_percircuit_only_cvxpy(budget, L1weights, objfn,
                                                   redbox_threshold,
                                                   printer=None):
    """Linear program: min L1weights.x  s.t.  W_c(x) >= critical_budget_c,
    x >= 0 (reference: wildcardopt.py:151 -- per-circuit constraints only,
    solved there with cvxpy).  The constraints are linear in x, so this is
    an LP; solved with scipy's HiGHS (cvxpy is an optional dependency the
    TPU image does not carry)."""
    from scipy.optimize import linprog
    layout = objfn.layout
    circuits = list(layout.circuits)
    crit = _get_critical_circuit_budgets(objfn, redbox_threshold)
    A = budget.precompute_for_same_circuits(circuits)
    # min c.x  s.t.  -A x <= -crit,  x >= 0
    res = linprog(np.asarray(L1weights, float), A_ub=-A, b_ub=-crit,
                  bounds=[(0, None)] * A.shape[1], method='highs')
    if not res.success:
        raise RuntimeError("percircuit-only wildcard LP failed: %s"
                           % res.message)
    budget.from_vector(res.x)
    return budget
