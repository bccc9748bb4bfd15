"""Time-dependent objective functions (reference:
pygsti/objectivefns/objectivefns.py:5217-5768 TimeDependentChi2Function /
TimeDependentPoissonPicLogLFunction).

For timestamped data, each circuit's counts are grouped by timestamp and the
model's probabilities are evaluated at each unique time via the model's
time-dependent tensors function.  The per-element objective formulas are
the same raw chi2/logL functions used in the time-independent case.
"""

from __future__ import annotations

import collections

import numpy as np

import jax
import jax.numpy as jnp

from pygsti_tpu.objectivefns.objectivefns import (RawChi2Function,
                                                  RawPoissonPicDeltaLogLFunction)
from pygsti_tpu.layouts.layout import CircuitOutcomeProbabilityLayout


class TimeDependentMDCObjectiveFunction(object):
    """Objective over timestamped data: elements are (circuit, time, outcome).

    Builds per-unique-timestamp probability evaluations from the model's
    ``tensors_fn_t`` and sums raw-objective terms over all (circuit, time)
    rows.
    """

    def __init__(self, raw_objfn, model, dataset, circuits, verbosity=0):
        self.raw_objfn = raw_objfn
        self.model = model
        self.dataset = dataset
        self.circuits = list(circuits)
        # collect per-circuit time series: {time: {outcome: count}}
        time_groups = collections.OrderedDict()  # time -> list of (circ_idx, counts)
        for ci, c in enumerate(self.circuits):
            row = dataset[c]
            if row.time is None:
                time_groups.setdefault(0.0, []).append((ci, dict(row.counts)))
            else:
                by_t = collections.OrderedDict()
                series = row.outcome_series
                reps = row.reps if row.reps is not None else [1] * len(series)
                for t, ol, rep in zip(row.time, series, reps):
                    by_t.setdefault(float(t), collections.Counter())[ol] += rep
                for t, counter in by_t.items():
                    time_groups.setdefault(t, []).append((ci, dict(counter)))
        self.times = sorted(time_groups.keys())

        layout = CircuitOutcomeProbabilityLayout(self.circuits, model)
        self.layout = layout
        compute_t = model.tensors_fn_t()
        dim = model.dim
        op_idx = jnp.asarray(layout.op_indices)
        prep_idx = jnp.asarray(layout.prep_index)
        elem_c = jnp.asarray(layout.elem_circuit)
        elem_e = jnp.asarray(layout.elem_effect)

        def probs_at(v, t):
            ten = compute_t(v, t)
            eye = jnp.eye(dim, dtype=ten.ops.dtype)[None]
            G = jnp.concatenate([ten.ops, eye], axis=0)
            rho = ten.preps[prep_idx]
            if layout.max_depth > 0:
                def step(carry, idx_col):
                    return jnp.einsum('bij,bj->bi', G[idx_col], carry), None
                rho, _ = jax.lax.scan(step, rho, op_idx.T)
            E = ten.effects[elem_e]
            return jnp.sum(E * rho[elem_c], axis=1)

        # flat element data over all (time, circuit) rows
        counts, totals, sel = [], [], []
        for t in self.times:
            present = {ci: cnts for ci, cnts in time_groups[t]}
            for ci, c in enumerate(self.circuits):
                if ci not in present:
                    continue
                cnts = present[ci]
                total = sum(cnts.values())
                sl = layout.element_slices[ci]
                for k, outcome in enumerate(layout.outcomes[ci]):
                    sel.append((self.times.index(t), sl.start + k))
                    counts.append(cnts.get(outcome, 0))
                    totals.append(total)
        self._counts = jnp.asarray(np.array(counts, dtype=float))
        self._totals = jnp.asarray(np.array(totals, dtype=float))
        with np.errstate(invalid='ignore', divide='ignore'):
            f = np.where(np.array(totals) > 0,
                         np.array(counts, dtype=float) / np.maximum(totals, 1), 0.0)
        self._freqs = jnp.asarray(f)
        self._sel_time = np.array([s[0] for s in sel])
        self._sel_elem = jnp.asarray(np.array([s[1] for s in sel], dtype=np.int32))
        self._times_j = [jnp.asarray(t) for t in self.times]

        sel_time = self._sel_time
        sel_elem = self._sel_elem
        times_j = self._times_j
        raw = raw_objfn
        counts_j, totals_j, freqs_j = self._counts, self._totals, self._freqs

        def all_probs(v):
            parts = []
            for ti, tj in enumerate(times_j):
                p_t = probs_at(v, tj)
                mask = sel_time == ti
                parts.append(p_t[sel_elem[np.where(mask)[0]]])
            return jnp.concatenate(parts)

        def fn_fn(v):
            p = all_probs(v)
            return jnp.sum(raw.terms(p, counts_j, totals_j, freqs_j))

        def lsvec_fn(v):
            p = all_probs(v)
            return raw.lsvec(p, counts_j, totals_j, freqs_j)

        def jtj_jtf_fn(v):
            p = all_probs(v)
            ls = raw.lsvec(p, counts_j, totals_j, freqs_j)
            dls = raw.dlsvec(p, counts_j, totals_j, freqs_j)
            J = dls[:, None] * jax.jacfwd(all_probs)(v)
            return ls, J.T @ J, J.T @ ls

        self._fn_jit = jax.jit(fn_fn)
        self._lsvec_jit = jax.jit(lsvec_fn)
        self._jtj_jtf_jit = jax.jit(jtj_jtf_fn)
        self.num_elements = len(counts)

    def fn(self, paramvec=None):
        v = jnp.asarray(paramvec if paramvec is not None else self.model.to_vector())
        return float(self._fn_jit(v))

    def lsvec(self, paramvec=None, oob_check=False):
        v = jnp.asarray(paramvec if paramvec is not None else self.model.to_vector())
        return np.asarray(self._lsvec_jit(v))

    def jtj_jtf(self, paramvec):
        ls, jtj, jtf = self._jtj_jtf_jit(jnp.asarray(paramvec))
        return np.asarray(ls), np.asarray(jtj), np.asarray(jtf)

    def chi2k_distributed_qty(self, val):
        return self.raw_objfn.chi2k_distributed_qty(val)


def TimeDependentChi2Function(model, dataset, circuits, regularization=None):
    return TimeDependentMDCObjectiveFunction(
        RawChi2Function(regularization), model, dataset, circuits)


def TimeDependentPoissonPicLogLFunction(model, dataset, circuits, regularization=None):
    return TimeDependentMDCObjectiveFunction(
        RawPoissonPicDeltaLogLFunction(regularization), model, dataset, circuits)
