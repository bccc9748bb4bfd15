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
