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


def _waterfill(q, f, W, return_deriv=False):
    """Likelihood-optimal move of model probs `q` toward frequencies `f`
    within a TVD budget W: maximize sum_o f_o log(p_o) subject to
    0.5*sum|p - q| <= W and sum p = sum q
    (reference: pygsti/objectivefns/wildcardbudget.py:268 update_probs).

    The optimum raises the outcomes with the lowest ratio q_o/f_o to a
    common ratio alpha (p_o = alpha*f_o) and lowers those with the highest
    ratio to a common ratio beta, with zero-frequency outcomes supplying
    mass first (zero likelihood cost).  alpha = (Q_A + W)/F_A and
    beta = (Q_B - W')/F_B follow from mass conservation + budget saturation.

    With ``return_deriv``, also returns dp/dW at the current active sets
    (piecewise-linear; used by the barrier optimizer's Newton steps,
    reference optimize/wildcardopt.py:455 update_probs(return_deriv=True)).
    """
    q = np.asarray(q, dtype=float)
    f = np.asarray(f, dtype=float)
    n = len(q)
    dp = np.zeros(n)
    if W <= 1e-15:
        return (q.copy(), dp) if return_deriv else q.copy()
    tvd0 = 0.5 * np.sum(np.abs(q - f))
    if tvd0 <= W + 1e-15:
        # budget covers a perfect fit; keep total mass at sum(q) by dumping
        # any excess on the zero-frequency outcomes (likelihood-free)
        p = f.copy()
        extra = np.sum(q) - np.sum(f)
        if abs(extra) > 1e-15:
            zmask = (f <= 0)
            if extra > 0 and np.any(zmask):
                p[zmask] += extra / np.count_nonzero(zmask)
            else:
                p += extra / n
        return (p, dp) if return_deriv else p

    pos = f > 0
    ratio = np.full(n, np.inf)
    ratio[pos] = q[pos] / f[pos]
    ratio[~pos & (q <= 0)] = 1.0     # q=f=0: never moved
    order = np.argsort(ratio, kind='stable')

    p = q.copy()
    # -- lower side: zero-frequency outcomes first (no likelihood cost) ----
    zidx = [i for i in order if not pos[i] and q[i] > 0]
    QZ = float(np.sum(q[zidx])) if zidx else 0.0
    if QZ >= W:
        # only zero-f outcomes are lowered (proportionally), nothing else
        scale_z = 1.0 - W / QZ
        for i in zidx:
            p[i] = q[i] * scale_z
            dp[i] = -q[i] / QZ
        lower_done = True
    else:
        for i in zidx:
            p[i] = 0.0
        lower_done = False
    W_lower = W - min(QZ, W)         # mass still to remove from positive-f

    pos_sorted = [i for i in order if pos[i]]

    # -- raise side: grow A from the lowest ratios --------------------------
    ia = 1
    while True:
        A = pos_sorted[:ia]
        FA = float(np.sum(f[A]))
        QA = float(np.sum(q[A]))
        alpha = (QA + W) / FA
        if ia < len(pos_sorted) and alpha > ratio[pos_sorted[ia]]:
            ia += 1
            continue
        break
    for i in pos_sorted[:ia]:
        p[i] = alpha * f[i]
        dp[i] = f[i] / FA            # d(alpha f_i)/dW

    # -- lower side among positive-f: grow B from the highest ratios --------
    if not lower_done and W_lower > 1e-18:
        ib = 1
        while True:
            B = pos_sorted[len(pos_sorted) - ib:]
            FB = float(np.sum(f[B]))
            QB = float(np.sum(q[B]))
            beta = (QB - W_lower) / FB
            if ib < len(pos_sorted) - ia and \
                    beta < ratio[pos_sorted[len(pos_sorted) - ib - 1]]:
                ib += 1
                continue
            break
        for i in B:
            p[i] = beta * f[i]
            dp[i] = -f[i] / FB       # d(beta f_i)/dW  (dW_lower/dW = 1)
    return (p, dp) if return_deriv else p


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

        Implements the reference's ratio-sorted waterfilling
        (pygsti/objectivefns/wildcardbudget.py:268 update_probs): within the
        TVD ball of radius W around the model probabilities q, the
        likelihood-optimal point raises the lowest q/f-ratio outcomes to a
        common ratio alpha and lowers the highest-ratio outcomes to a common
        ratio beta (zero-frequency outcomes supply mass first, at zero
        likelihood cost), with alpha/beta fixed by mass conservation and
        budget saturation.
        """
        new_probs = np.array(probs, dtype=float)
        dprobs = np.zeros(len(new_probs)) if return_deriv else None
        for i, c in enumerate(circuits):
            sl = element_slices[i]
            q = probs[sl.start:sl.stop].astype(float)
            f = freqs[sl.start:sl.stop].astype(float)
            W = self.circuit_budget(c)
            if return_deriv:
                new_probs[sl.start:sl.stop], dprobs[sl.start:sl.stop] = \
                    _waterfill(q, f, W, return_deriv=True)
            else:
                new_probs[sl.start:sl.stop] = _waterfill(q, f, W)
        return (new_probs, dprobs) if return_deriv else new_probs

    def precompute_for_same_circuits(self, circuits):
        """[n_circuits, num_params] matrix of d(circuit budget)/d(param)
        (reference: wildcardbudget.precompute_for_same_circuits): each
        circuit's budget is linear in the |w| parameters, with coefficient =
        number of occurrences of each primitive op (+1 for SPAM)."""
        return self._occurrence_matrix(circuits)

    def _occurrence_matrix(self, circuits):
        """[n_circuits, n_op_labels] per-op occurrence counts (+SPAM col)."""
        A = np.zeros((len(circuits), len(self.primitive_op_labels)))
        for i, c in enumerate(circuits):
            for layer in c.layertup:
                comps = layer.components if not layer.is_simple else (layer,)
                if len(comps) == 0 and Label(()) in self._index:
                    A[i, self._index[Label(())]] += 1
                for comp in comps:
                    j = self._index.get(Label(comp))
                    if j is None:
                        j = self._index.get('SPAM')
                    if j is not None:
                        A[i, j] += 1
            if 'SPAM' in self._index:
                A[i, self._index['SPAM']] += 1
        return A

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

    def precompute_for_same_circuits(self, circuits):
        A = self._occurrence_matrix(circuits)   # [C, n_op_labels]
        return (A @ self.reference_values)[:, None]   # d(W_c)/d(alpha)


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


# Reference class-name surface: the reference's abstract WildcardBudget /
# PrimitiveOpsWildcardBudgetBase hierarchy collapses to the concrete
# per-primitive-op implementation here (reference: wildcardbudget.py:33,
# :471).
WildcardBudget = PrimitiveOpsWildcardBudget
PrimitiveOpsWildcardBudgetBase = PrimitiveOpsWildcardBudget


def update_circuit_probs(probs, freqs, circuit_budget, circuit=None):
    """Move one circuit's outcome probabilities toward its frequencies
    within a TVD budget, maximizing the likelihood (reference:
    wildcardbudget.update_circuit_probs:835)."""
    return _waterfill(np.asarray(probs, float), np.asarray(freqs, float),
                      float(circuit_budget))
