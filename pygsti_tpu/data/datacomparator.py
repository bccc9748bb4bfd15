"""Dataset consistency testing via log-likelihood-ratio tests
(reference: pygsti/data/datacomparator.py, hypothesistest.py)."""

from __future__ import annotations

import collections

import numpy as np
import scipy.stats as stats


def _llr_statistic(count_rows):
    """2 * LLR that the datasets share one distribution vs separate ones.

    count_rows: list of {outcome: count} dicts (one per dataset/pass).
    Asymptotically chi2 with (num_datasets-1)*(num_outcomes-1) dof.
    """
    outcomes = sorted({o for row in count_rows for o in row})
    mat = np.array([[row.get(o, 0) for o in outcomes] for row in count_rows],
                   dtype=float)
    totals = mat.sum(axis=1, keepdims=True)
    pooled = mat.sum(axis=0) / max(mat.sum(), 1e-300)
    with np.errstate(divide='ignore', invalid='ignore'):
        p_sep = np.where(totals > 0, mat / np.where(totals > 0, totals, 1), 0)
        ll_sep = np.where(mat > 0, mat * np.log(np.where(p_sep > 0, p_sep, 1)), 0).sum()
        ll_pool = np.where(mat > 0, mat * np.log(np.where(pooled > 0, pooled, 1)[None, :]),
                           0).sum()
    dof = (mat.shape[0] - 1) * (len(outcomes) - 1)
    return 2 * (ll_sep - ll_pool), max(dof, 1)


class DataComparator(object):
    """Compare multiple datasets circuit-by-circuit for statistical
    consistency (reference: datacomparator.DataComparator)."""

    def __init__(self, dataset_list_or_multidataset, circuits='all',
                 op_exclusions=None, op_inclusions=None, ds_names=None,
                 allow_bad_circuits=False):
        from pygsti_tpu.data.multidataset import MultiDataSet
        if isinstance(dataset_list_or_multidataset, MultiDataSet):
            mds = dataset_list_or_multidataset
            self.datasets = [mds[k] for k in mds.keys()]
        else:
            self.datasets = list(dataset_list_or_multidataset)
        if circuits == 'all':
            circuits = [c for c in self.datasets[0].keys()
                        if all(c in ds for ds in self.datasets)]
        self.circuits = list(circuits)
        self.llrs = collections.OrderedDict()
        self.pVals = collections.OrderedDict()
        self.dof = collections.OrderedDict()
        self._tested = False

    def run(self, significance=0.05, per_circuit_correction='Bonferroni',
            verbosity=1):
        """Run the consistency tests; returns self."""
        for c in self.circuits:
            rows = [dict(ds[c].counts) for ds in self.datasets]
            llr, dof = _llr_statistic(rows)
            self.llrs[c] = llr
            self.dof[c] = dof
            self.pVals[c] = stats.chi2.sf(llr, dof)
        n = len(self.circuits)
        self.significance = significance
        threshold = significance / max(n, 1)  # Bonferroni
        self.inconsistent_circuits = [c for c, p in self.pVals.items()
                                      if p < threshold]
        # aggregate test
        total_llr = sum(self.llrs.values())
        total_dof = sum(self.dof.values())
        self.aggregate_llr = total_llr
        self.aggregate_pvalue = stats.chi2.sf(total_llr, max(total_dof, 1))
        self.aggregate_nsigma = (total_llr - total_dof) / np.sqrt(2 * max(total_dof, 1))
        self._tested = True
        return self

    def get_maximum_sstvd(self):
        """Max statistically-significant TVD estimate over circuits."""
        assert self._tested
        out = 0.0
        for c in self.inconsistent_circuits:
            rows = [dict(ds[c].counts) for ds in self.datasets]
            outcomes = sorted({o for r in rows for o in r})
            ps = []
            for r in rows:
                t = sum(r.values())
                ps.append(np.array([r.get(o, 0) / t for o in outcomes]))
            tvd = 0.5 * np.max([np.sum(np.abs(p1 - p2))
                                for i, p1 in enumerate(ps)
                                for p2 in ps[i + 1:]])
            out = max(out, tvd)
        return out

    def __str__(self):
        if not self._tested:
            return "DataComparator (not yet run)"
        return ("DataComparator: %d/%d circuits inconsistent at %g significance; "
                "aggregate Nsigma = %.2f" % (len(self.inconsistent_circuits),
                                             len(self.circuits), self.significance,
                                             self.aggregate_nsigma))
