"""Tests for multiple-hypothesis testing corrections."""

import numpy as np

from pygsti_tpu.data.hypothesistest import HypothesisTest


class TestHypothesisTest:
    def test_holm_stepdown(self):
        ht = HypothesisTest(['a', 'b', 'c'], significance=0.05)
        ht.add_pvalues({'a': 0.001, 'b': 0.03, 'c': 0.8})
        rej = ht.run()
        assert rej['a'] is True            # 0.001 <= 0.05/3
        assert rej['b'] is False           # 0.03 > 0.05/2 after a rejected
        assert rej['c'] is False

    def test_holm_cascade(self):
        ht = HypothesisTest(['a', 'b', 'c'], significance=0.05)
        ht.add_pvalues({'a': 0.001, 'b': 0.02, 'c': 0.04})
        rej = ht.run()
        # a: 0.0167; then b: 0.025; then c: 0.05
        assert rej['a'] and rej['b'] and rej['c']

    def test_no_rejections(self):
        ht = HypothesisTest(['a', 'b'], significance=0.05)
        ht.add_pvalues({'a': 0.5, 'b': 0.9})
        rej = ht.run()
        assert not any(rej.values())

    def test_nested_hypotheses(self):
        nested = ('x1', 'x2', 'x3')
        ht = HypothesisTest(['a', nested], significance=0.05)
        ht.add_pvalues({'a': 0.5, 'x1': 1e-6, 'x2': 0.5, 'x3': 0.9})
        rej = ht.run()
        assert rej['x1'] is True           # tuple rejected, x1 locally sig.
        assert rej['x2'] is False and rej['x3'] is False
        assert rej['a'] is False

    def test_weighting(self):
        ht = HypothesisTest(['a', 'b'], significance=0.05,
                            weighting={'a': 3.0, 'b': 1.0})
        ht.add_pvalues({'a': 0.03, 'b': 0.03})
        rej = ht.run()
        assert rej['a'] is True            # budget 0.0375
        # b initially 0.0125; after a rejected b gets full 0.05 -> rejected
        assert rej['b'] is True


class TestDatasetAggregation:
    def test_aggregate_outcomes(self):
        import jax
        from pygsti_tpu.modelpacks import smq2Q_XYICNOT as mp
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.data.datasetconstruction import (
            aggregate_dataset_outcomes, filter_dataset)
        from pygsti_tpu.circuits import Circuit
        mdl = mp.target_model('full TP').depolarize(op_noise=0.02)
        circs = [Circuit([('Gxpi2', 0)], line_labels=(0, 1)),
                 Circuit([('Gypi2', 1)], line_labels=(0, 1)),
                 Circuit([('Gxpi2', 0), ('Gcnot', 0, 1)], line_labels=(0, 1))]
        ds = simulate_data(mdl, circs, 2000, seed=5)
        agg = aggregate_dataset_outcomes(
            ds, {'0': ['00', '01'], '1': ['10', '11']})
        row = agg[circs[0]]
        orig = ds[circs[0]]
        assert row.counts[('0',)] == orig.counts.get(('00',), 0) + \
            orig.counts.get(('01',), 0)
        assert row.total == orig.total

    def test_filter_dataset(self):
        from pygsti_tpu.modelpacks import smq2Q_XYICNOT as mp
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.data.datasetconstruction import filter_dataset
        from pygsti_tpu.circuits import Circuit
        mdl = mp.target_model('full TP').depolarize(op_noise=0.02)
        c_keep = Circuit([('Gxpi2', 0)], line_labels=(0, 1))
        c_drop = Circuit([('Gcnot', 0, 1)], line_labels=(0, 1))
        ds = simulate_data(mdl, [c_keep, c_drop], 2000, seed=6)
        f = filter_dataset(ds, [0])
        keys = list(f.keys())
        assert len(keys) == 1  # the CNOT circuit is filtered out
        row = f[keys[0]]
        orig = ds[c_keep]
        # marginal over qubit 1
        assert row.counts[('0',)] == orig.counts.get(('00',), 0) + \
            orig.counts.get(('01',), 0)
