"""Multiple-hypothesis testing with family-wise error control (reference:
pygsti/data/hypothesistest.py:18 HypothesisTest).

Implements weighted Holm's step-down with optional nested hypothesis sets
(a tuple element groups hypotheses that share a significance budget,
corrected locally with Holm's or Bonferroni) -- the closed-test machinery
used by the data comparator and drift analyses.
"""

from __future__ import annotations

import numpy as np


class HypothesisTest(object):
    """A set of null hypotheses + correction procedure; call
    ``add_pvalues`` then ``run`` (reference: hypothesistest.py:18)."""

    def __init__(self, hypotheses, significance=0.05, weighting='equal',
                 passing_graph='Holms', local_corrections='Holms'):
        self.hypotheses = list(hypotheses)
        self.significance = significance
        self.passing_graph = passing_graph
        self.local_corrections = local_corrections
        self.nested_hypotheses = {h: isinstance(h, tuple)
                                  for h in self.hypotheses}
        n = len(self.hypotheses)
        if weighting == 'equal':
            self.weighting = {h: 1.0 / n for h in self.hypotheses}
        else:
            total = sum(weighting[h] for h in self.hypotheses)
            self.weighting = {h: weighting[h] / total
                              for h in self.hypotheses}
        self.pvalues = None
        self.hypothesis_rejected = None
        self.pvalue_pseudothreshold = None

    def add_pvalues(self, pvalues):
        """pvalues: {hypothesis_label: p} covering every non-nested label and
        every label inside nested tuples."""
        self.pvalues = dict(pvalues)

    def _holm_within(self, labels, budget):
        """Weighted Holm step-down within `labels` given a total significance
        budget; returns set of rejected labels and per-label thresholds."""
        rejected = set()
        thresholds = {l: 0.0 for l in labels}
        remaining = list(labels)
        while remaining:
            m = len(remaining)
            local = {l: budget / m for l in remaining}
            progressed = False
            for l in list(remaining):
                thresholds[l] = max(thresholds[l], local[l])
                if self.pvalues[l] <= local[l]:
                    rejected.add(l)
                    remaining.remove(l)
                    progressed = True
            if not progressed:
                break
        return rejected, thresholds

    def _bonferroni_within(self, labels, budget):
        thr = budget / len(labels)
        rejected = {l for l in labels if self.pvalues[l] <= thr}
        return rejected, {l: thr for l in labels}

    def run(self):
        """Populate ``hypothesis_rejected`` (reference:
        hypothesistest.py:283)."""
        assert self.pvalues is not None, "add_pvalues first"
        self.hypothesis_rejected = {}
        self.pvalue_pseudothreshold = {}

        # top level: weighted Holm over the hypothesis list, treating a
        # nested tuple's p-value as the minimum of its members (a rejected
        # tuple then spends its budget locally on its members)
        def top_pvalue(h):
            if self.nested_hypotheses[h]:
                members = list(h)
                # Bonferroni-corrected representative p-value
                return min(1.0, min(self.pvalues[m] for m in members)
                           * len(members))
            return self.pvalues[h]

        remaining = list(self.hypotheses)
        budgets = {h: self.significance * self.weighting[h]
                   for h in self.hypotheses}
        spent_scale = 1.0
        rejected_top = set()
        while remaining:
            total_w = sum(self.weighting[h] for h in remaining)
            progressed = False
            for h in list(remaining):
                local = self.significance * self.weighting[h] / total_w
                self.pvalue_pseudothreshold[h] = max(
                    self.pvalue_pseudothreshold.get(h, 0.0), local)
                if top_pvalue(h) <= local:
                    rejected_top.add(h)
                    remaining.remove(h)
                    budgets[h] = local
                    progressed = True
            if not progressed:
                break

        for h in self.hypotheses:
            if self.nested_hypotheses[h]:
                members = list(h)
                if h in rejected_top:
                    if self.local_corrections == 'Bonferroni':
                        rej, thr = self._bonferroni_within(members, budgets[h])
                    else:
                        rej, thr = self._holm_within(members, budgets[h])
                else:
                    rej, thr = set(), {m: 0.0 for m in members}
                for m in members:
                    self.hypothesis_rejected[m] = m in rej
                    self.pvalue_pseudothreshold[m] = thr[m]
            else:
                self.hypothesis_rejected[h] = h in rejected_top
        return self.hypothesis_rejected
