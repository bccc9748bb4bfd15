"""Wildcard-budget optimizers (reference: pygsti/optimize/wildcardopt.py).

The implementations live in ``pygsti_tpu.objectivefns.wildcardbudget``
(1-D bisection and multi-parameter Nelder-Mead over the likelihood-optimal
waterfilled probabilities); this module provides the reference's module
path.  The reference's cvxpy/barrier variants solve the same optimization
with additional convex machinery and are not reimplemented.
"""

from __future__ import annotations

from pygsti_tpu.objectivefns.wildcardbudget import (
    optimize_wildcard_budget_1d, optimize_wildcard_budget_neldermead)


def optimize_wildcard_bisect_alpha(budget, objfn, two_dlogl_threshold,
                                   redbox_threshold, printer=None,
                                   guess=0.1, tol=1e-3):
    """1-D alpha bisection (reference: wildcardopt.py:352); delegates to the
    1-D budget optimizer."""
    return optimize_wildcard_budget_1d(objfn, budget, two_dlogl_threshold)
