"""Tests for parity benchmarking (residual TVDs / disturbances)."""

import numpy as np
import pytest

from pygsti_tpu.extras.paritybenchmarking import (ResidualTVD,
                                                  compute_residual_tvds,
                                                  compute_disturbances,
                                                  comprehensive_transition_matrix,
                                                  n_parameters)
from pygsti_tpu.extras.paritybenchmarking.disturbancecalc import (_swell,
                                                                  transition_matrix)

P = np.array([0.7, 0.1, 0.15, 0.05])


class TestResidualTVD:
    def test_weight1_noise_removed_by_weight1(self):
        F = np.array([[0.7, 0.3], [0.3, 0.7]])
        q = _swell(F, [1], 2) @ P
        r = compute_residual_tvds(2, P * 1000, q * 1000)
        assert r[0] > 0.05
        assert r[1] < 1e-6
        assert r[2] == 0.0

    def test_correlated_noise_survives_weight1(self):
        T2 = np.eye(4)[:, [3, 1, 2, 0]]  # 00 <-> 11
        q = 0.7 * P + 0.3 * (T2 @ P)
        r = compute_residual_tvds(2, P * 1000, q * 1000)
        assert r[1] > 0.01 and r[2] == 0.0

    def test_weight0_is_plain_tvd(self):
        q = np.array([0.6, 0.2, 0.1, 0.1])
        rt = ResidualTVD(0, 2)(P, q)
        assert abs(rt - 0.5 * np.abs(P - q).sum()) < 1e-12

    def test_transfer_matrix_stochastic(self):
        F = np.array([[0.9, 0.1], [0.1, 0.9]])
        q = _swell(F, [0], 2) @ P
        rtvd = ResidualTVD(1, 2)
        rtvd(P, q)
        T = rtvd.build_transfer_mx()
        assert np.allclose(T.sum(axis=0), 1.0, atol=1e-8)
        assert T.min() > -1e-9

    def test_disturbances(self):
        T2 = np.eye(4)[:, [3, 1, 2, 0]]
        q = 0.7 * P + 0.3 * (T2 @ P)
        d = compute_disturbances(2, P * 1000, q * 1000,
                                 num_bootstrap_samples=5)
        assert len(d) == 2
        assert d[1][0] > 0.01          # weight-2 disturbance dominates
        assert d[1][1] >= 0.0          # error bar present

    def test_comprehensive_transition_matrix(self):
        v = np.random.RandomState(0).uniform(0, 0.1, n_parameters(1, 2))
        ctm = comprehensive_transition_matrix(v, 1, 2)
        assert np.allclose(ctm.sum(axis=0), 1.0)
