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
    def __init__(self, pvalues, significance, crosstalk_detected, pairs,
                 num_regions=None, effect_sizes=None):
        self.pvalues = pvalues          # {(outcome_region, setting_region): p}
        self.significance = significance
        self.crosstalk_detected = crosstalk_detected
        self.crosstalk_pairs = pairs
        self.num_regions = num_regions
        self.effect_sizes = effect_sizes or {}  # Cramer's V per pair

    def crosstalk_matrix(self):
        """[R, R] matrix of -log10 p-values (the reference's crosstalk
        graph weights; 0 on the diagonal / untested pairs)."""
        R = self.num_regions or (max(max(k) for k in self.pvalues) + 1
                                 if self.pvalues else 0)
        M = np.zeros((R, R))
        for (i, j), p in self.pvalues.items():
            M[i, j] = -np.log10(max(p, 1e-300))
        return M

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
    effect_sizes = {}
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
            stratum_effects = []
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
                chi2_stat, p, _, _ = stats.chi2_contingency(mat)
                n_tot = mat.sum()
                kdim = min(mat.shape) - 1
                cramers_v = np.sqrt(chi2_stat / (n_tot * max(kdim, 1)))
                stratum_pvals.append(p)
                stratum_effects.append(cramers_v)
            if stratum_pvals:
                # Fisher combination over strata
                stat = -2 * np.sum(np.log(np.clip(stratum_pvals, 1e-300, 1)))
                p_comb = stats.chi2.sf(stat, 2 * len(stratum_pvals))
                pvalues[(i, j)] = p_comb
                effect_sizes[(i, j)] = float(np.median(stratum_effects))
                tested += 1
    threshold = significance / max(tested, 1)  # Bonferroni
    pairs = [k for k, p in pvalues.items() if p < threshold]
    return CrosstalkResults(pvalues, significance, len(pairs) > 0, pairs,
                            num_regions=num_regions,
                            effect_sizes=effect_sizes)


def form_ct_data_tuples(ds, region_qubits):
    """Convert a DataSet into crosstalk (settings, outcomes) tuples
    (reference: crosstalk/core.py:66 form_ct_data_matrix).

    region_qubits: list of qubit-label tuples, one per region.  Each
    circuit's per-region SETTING is the subcircuit acting on that region's
    qubits (the layer labels restricted to them); each shot contributes one
    tuple with the per-region OUTCOME bits.
    """
    qubit_pos = {}
    all_qubits = []
    for r, qs in enumerate(region_qubits):
        for q in qs:
            all_qubits.append(q)

    data_tuples = []
    for c in ds.keys():
        lls = list(c.line_labels) if c.line_labels else all_qubits
        pos = {q: i for i, q in enumerate(lls)}
        settings = []
        for qs in region_qubits:
            qset = set(qs)
            sub = []
            for layer in c.layertup:
                comps = layer.components if not layer.is_simple else (layer,)
                for comp in comps:
                    ssl = comp.sslbls
                    if ssl is None or qset.intersection(ssl):
                        sub.append(str(comp))
            settings.append(tuple(sub))
        row = ds[c]
        for outcome, cnt in row.counts.items():
            bits = outcome[0]
            outs = tuple(
                ''.join(bits[pos[q]] for q in qs if q in pos)
                for qs in region_qubits)
            for _ in range(int(round(cnt))):
                data_tuples.append((tuple(settings), outs))
    return data_tuples


def do_crosstalk_detection_on_dataset(ds, region_qubits, significance=0.05,
                                      verbosity=1):
    """End-to-end: DataSet -> tuples -> detection (reference: core.py:186
    operating directly on a pyGSTi dataset)."""
    tuples = form_ct_data_tuples(ds, region_qubits)
    return do_basic_crosstalk_detection(tuples, len(region_qubits),
                                        significance, verbosity)


def crosstalk_detection_experiment(pspec_or_qubits, lengths,
                                   circuits_per_length, idle_prob=0.1,
                                   one_q_gate_names=('Gxpi2', 'Gypi2'),
                                   seed=None):
    """Random-circuit crosstalk-detection experiment, '1Q' region structure
    (reference: crosstalk/core.py:675 crosstalk_detection_experiment):
    each qubit is a region; per experiment each region independently runs a
    random single-qubit sequence (or idles with probability idle_prob).
    Returns (circuits, settings_list) where settings_list[k][r] indexes the
    sequence applied to region r in circuit k (0 = idle).
    """
    from pygsti_tpu.baseobjs.label import Label
    from pygsti_tpu.circuits.circuit import Circuit
    rng = np.random.RandomState(seed)
    qubits = list(getattr(pspec_or_qubits, 'qubit_labels', pspec_or_qubits))
    circuits, settings_list = [], []
    for L in lengths:
        # candidate per-region sequences of this length
        n_cand = max(4, circuits_per_length)
        cands = [[rng.choice(len(one_q_gate_names), size=L)
                  for _ in range(n_cand)] for _q in qubits]
        for _k in range(circuits_per_length):
            layers = [[] for _ in range(L)]
            settings = []
            for r, q in enumerate(qubits):
                if rng.rand() < idle_prob:
                    settings.append(0)
                    continue
                idx = rng.randint(n_cand)
                settings.append(idx + 1)
                for t, g in enumerate(cands[r][idx]):
                    layers[t].append(Label(one_q_gate_names[g], q))
            layer_labels = []
            for comps in layers:
                if len(comps) == 0:
                    layer_labels.append(Label(()))
                elif len(comps) == 1:
                    layer_labels.append(comps[0])
                else:
                    from pygsti_tpu.baseobjs.label import LabelTupTup
                    layer_labels.append(LabelTupTup.init(tuple(comps)))
            circuits.append(Circuit(layer_labels, tuple(qubits)))
            settings_list.append(tuple(settings))
    return circuits, settings_list
