"""Crosstalk detection (reference: pygsti/extras/crosstalk/core.py).

Detects crosstalk between regions of a device by testing, for each pair of
regions (i, j), whether region i's OUTCOMES are statistically dependent on
region j's SETTINGS (the operations applied there), using chi-squared
contingency tests with multiple-comparison correction.  This is the
conditional-independence formulation of Sarovar et al. (Quantum 4, 321).
"""

from __future__ import annotations

import collections

import numpy as np
import scipy.stats as stats


class CrosstalkResults(object):
    def __init__(self, pvalues, significance, crosstalk_detected, pairs):
        self.pvalues = pvalues          # {(outcome_region, setting_region): p}
        self.significance = significance
        self.crosstalk_detected = crosstalk_detected
        self.crosstalk_pairs = pairs

    def __str__(self):
        if not self.crosstalk_detected:
            return "No crosstalk detected (significance %g)" % self.significance
        return "Crosstalk detected between region pairs: %s" % (self.crosstalk_pairs,)


def do_basic_crosstalk_detection(data_tuples, num_regions, significance=0.05,
                                 verbosity=1):
    """Run crosstalk detection on experiment tuples.

    data_tuples: list of (settings, outcomes) where `settings` and `outcomes`
    are length-num_regions tuples -- the experimental setting (e.g. which
    circuit was applied) and the measured outcome for each region.
    """
    # build contingency tables: outcomes of region i vs settings of region j
    pvalues = {}
    tested = 0
    for i in range(num_regions):
        for j in range(num_regions):
            if i == j:
                continue
            table = collections.defaultdict(lambda: collections.Counter())
            for settings, outcomes in data_tuples:
                # condition on region i's own setting to isolate j's influence
                key = (settings[i], settings[j])
                table[settings[i]][(settings[j], outcomes[i])] += 1
            # for each own-setting stratum, test outcome-vs-foreign-setting
            stratum_pvals = []
            for own_setting, counter in table.items():
                foreign_settings = sorted({k[0] for k in counter})
                outcomes_seen = sorted({k[1] for k in counter})
                if len(foreign_settings) < 2 or len(outcomes_seen) < 2:
                    continue
                mat = np.array([[counter.get((fs, oc), 0) for oc in outcomes_seen]
                                for fs in foreign_settings], dtype=float)
                if mat.sum() == 0:
                    continue
                # drop empty rows/cols
                mat = mat[mat.sum(axis=1) > 0][:, mat.sum(axis=0) > 0]
                if mat.shape[0] < 2 or mat.shape[1] < 2:
                    continue
                _, p, _, _ = stats.chi2_contingency(mat)
                stratum_pvals.append(p)
            if stratum_pvals:
                # Fisher combination over strata
                stat = -2 * np.sum(np.log(np.clip(stratum_pvals, 1e-300, 1)))
                p_comb = stats.chi2.sf(stat, 2 * len(stratum_pvals))
                pvalues[(i, j)] = p_comb
                tested += 1
    threshold = significance / max(tested, 1)  # Bonferroni
    pairs = [k for k, p in pvalues.items() if p < threshold]
    return CrosstalkResults(pvalues, significance, len(pairs) > 0, pairs)
