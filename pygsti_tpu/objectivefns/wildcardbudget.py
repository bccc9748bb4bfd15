"""Wildcard budgets: per-op TVD slack quantifying unmodeled error
(reference: pygsti/objectivefns/wildcardbudget.py:22).

A wildcard budget assigns each primitive op a TVD allowance; a circuit's
budget is the sum over its layers.  ``update_probs`` moves the model's
predicted probabilities toward the observed frequencies within each
circuit's budget, choosing the move that maximizes the likelihood
(waterfilling over the per-outcome log-likelihood gains).
"""

from __future__ import annotations

import collections

import numpy as np

from pygsti_tpu.baseobjs.label import Label


class PrimitiveOpsWildcardBudget(object):
    """Per-primitive-op wildcard budget, parameterized by |w| values."""

    def __init__(self, primitive_op_labels, start_budget=0.0, idle_name=None):
        self.primitive_op_labels = list(primitive_op_labels)
        self.wildcard_vector = np.full(len(self.primitive_op_labels),
                                       float(start_budget))
        self._index = {lbl: i for i, lbl in enumerate(self.primitive_op_labels)}

    @property
    def num_params(self):
        return len(self.wildcard_vector)

    def to_vector(self):
        return self.wildcard_vector.copy()

    def from_vector(self, v):
        self.wildcard_vector = np.asarray(v, dtype=float).copy()

    def budget_for(self, op_label):
        if op_label in self._index:
            return abs(self.wildcard_vector[self._index[op_label]])
        if 'SPAM' in self._index:
            return abs(self.wildcard_vector[self._index['SPAM']])
        return 0.0

    def circuit_budget(self, circuit):
        """Sum of per-layer op budgets (+ SPAM if present)."""
        total = 0.0
        for layer in circuit.layertup:
            comps = layer.components if not layer.is_simple else (layer,)
            if len(comps) == 0:
                total += self.budget_for(Label(()))
            for comp in comps:
                total += self.budget_for(Label(comp))
        if 'SPAM' in self._index:
            total += abs(self.wildcard_vector[self._index['SPAM']])
        return total

    def update_probs(self, probs, freqs, counts, total_counts, element_slices,
                     circuits, return_deriv=False):
        """Move probs toward freqs within each circuit's TVD budget,
        maximizing sum_o c_o log(p_o) (the likelihood-optimal move).

        For a TVD budget W: raise probabilities of under-predicted outcomes
        (p < f) in order of likelihood gain per unit mass, taking the mass
        from over-predicted outcomes in order of least likelihood loss --
        implemented as the exact 'stretch toward freqs' waterfilling used by
        the reference (wildcardbudget.update_probs:268): p_adj =
        clip between p and f with total movement <= W on each side.
        """
        new_probs = np.array(probs, dtype=float)
        for i, c in enumerate(circuits):
            sl = element_slices[i]
            p = probs[sl.start:sl.stop].astype(float)
            f = freqs[sl.start:sl.stop].astype(float)
            W = self.circuit_budget(c)
            tvd = 0.5 * np.sum(np.abs(p - f))
            if tvd <= W or tvd < 1e-15:
                new_probs[sl.start:sl.stop] = f
                continue
            beta = W / tvd
            new_probs[sl.start:sl.stop] = p + beta * (f - p)
        return new_probs

    def description(self):
        out = collections.OrderedDict()
        for lbl, w in zip(self.primitive_op_labels, self.wildcard_vector):
            out[lbl] = abs(w)
        return out

    def __str__(self):
        return "Wildcard budget: " + ", ".join(
            "%s: %.3g" % (lbl, abs(w))
            for lbl, w in zip(self.primitive_op_labels, self.wildcard_vector))


class PrimitiveOpsSingleScaleWildcardBudget(PrimitiveOpsWildcardBudget):
    """1-D wildcard: budgets = alpha * reference_values (e.g. per-op diamond
    distances) with a single scale parameter alpha (reference:
    wildcardbudget.PrimitiveOpsSingleScaleWildcardBudget)."""

    def __init__(self, primitive_op_labels, reference_values, alpha=0.0,
                 idle_name=None, reference_name='diamond distance'):
        super().__init__(primitive_op_labels, 0.0, idle_name)
        self.reference_values = np.asarray(reference_values, dtype=float)
        self.reference_name = reference_name
        self.alpha = alpha

    @property
    def alpha(self):
        return self._alpha

    @alpha.setter
    def alpha(self, val):
        self._alpha = float(val)
        self.wildcard_vector = self._alpha * self.reference_values

    @property
    def num_params(self):
        return 1

    def to_vector(self):
        return np.array([self._alpha])

    def from_vector(self, v):
        self.alpha = float(v[0])


def optimize_wildcard_budget_1d(objective, budget, two_dlogl_threshold,
                                redbox_threshold=None, tol=1e-4, max_iters=50):
    """Find the smallest alpha such that the wildcard-adjusted 2*DeltaLogL is
    below threshold (reference: gst.py:2341 _compute_wildcard_budget_1d,
    wildcardopt.py bisection)."""
    layout = objective.layout
    circuits = layout.circuits
    probs = objective.probs()
    counts = objective.counts
    totals = objective.total_counts
    freqs = objective.freqs
    raw = objective.raw_objfn
    import jax.numpy as jnp

    def two_dlogl_at(alpha):
        budget.alpha = alpha
        p_adj = budget.update_probs(probs, freqs, counts, totals,
                                    layout.element_slices, circuits)
        val = float(np.sum(np.asarray(raw.terms(jnp.asarray(p_adj), jnp.asarray(counts),
                                                jnp.asarray(totals), jnp.asarray(freqs)))))
        return 2 * val

    if two_dlogl_at(0.0) <= two_dlogl_threshold:
        budget.alpha = 0.0
        return budget

    lo, hi = 0.0, 1.0
    while two_dlogl_at(hi) > two_dlogl_threshold and hi < 1e3:
        hi *= 2
    for _ in range(max_iters):
        mid = 0.5 * (lo + hi)
        if two_dlogl_at(mid) > two_dlogl_threshold:
            lo = mid
        else:
            hi = mid
        if hi - lo < tol * max(hi, 1e-10):
            break
    budget.alpha = hi
    return budget


def optimize_wildcard_budget_neldermead(objective, budget,
                                        two_dlogl_threshold,
                                        redbox_threshold=None,
                                        l1_penalty=1e-2, tol=1e-6,
                                        max_iters=500):
    """Multi-parameter wildcard optimization: minimize the L1 norm of the
    per-op budgets subject to the aggregate 2*Delta(logL) dropping below
    `two_dlogl_threshold` (reference: optimize/wildcardopt.py:40
    optimize_wildcard_budget_neldermead).

    Implemented as penalized Nelder-Mead over log-budget coordinates:
    minimize sum_i |w_i| + barrier(2dlogl(w) - threshold).
    """
    import scipy.optimize as spo
    layout = objective.layout
    circuits = list(objective.circuits)
    counts, totals = layout.counts_arrays(objective.dataset)
    with np.errstate(invalid='ignore', divide='ignore'):
        freqs = np.where(totals > 0, counts / np.maximum(totals, 1), 0.0)
    probs = np.asarray(objective.probs())

    def two_dlogl_of(budget_vec):
        budget.from_vector(budget_vec)
        p_adj = budget.update_probs(probs, freqs, counts, totals,
                                    layout.element_slices, circuits)
        with np.errstate(invalid='ignore', divide='ignore'):
            f_nz = np.where(counts == 0, 1.0, freqs)
            p_cl = np.clip(p_adj, 1e-10, None)
            terms = counts * (np.log(f_nz) - np.log(p_cl)) \
                + totals * (p_cl - np.where(counts == 0, 0.0, freqs))
            terms = np.where(counts == 0, totals * p_cl, terms)
            terms = np.clip(terms, 0, None)
        return 2.0 * float(np.sum(terms))

    def penalized(budget_vec):
        excess = two_dlogl_of(budget_vec) - two_dlogl_threshold
        barrier = 0.0 if excess <= 0 else 1e3 * excess
        return float(np.sum(np.abs(budget_vec))) + barrier

    x0 = np.full(budget.num_params, 1e-3)
    res = spo.minimize(penalized, x0, method='Nelder-Mead',
                       options={'maxiter': max_iters, 'xatol': tol,
                                'fatol': tol})
    budget.from_vector(np.abs(res.x))
    return budget
