"""Tests for the legacy (config-driven) RPE extras module."""

import numpy as np
import pytest

from pygsti_tpu.extras.rpe import rpeconfig_gxpi2_gypi2_00 as cfg
from pygsti_tpu.extras.rpe import rpeconstruction as rc
from pygsti_tpu.extras.rpe import rpetools as rt


class TestLegacyRPE:
    def test_full_analysis_recovers_angles(self):
        d = rc.create_rpe_angle_circuits_dict(6, cfg)
        assert d['k_list'] == [1, 2, 4, 8, 16, 32, 64]
        alpha_true = np.pi / 2 + 0.01
        eps_true = np.pi / 2 - 0.005
        model = rc.create_parameterized_rpe_model(alpha_true, eps_true,
                                                  0.002, 1e-3, 1e-4,
                                                  rpeconfig_inst=cfg)
        ds = rc.create_rpe_dataset(model, d, 5000, seed=42)
        res = rt.analyze_rpe_data(ds, model, d, cfg)
        assert res['alphaErrorList'][-1] < 0.01
        assert res['epsilonErrorList'][-1] < 0.01
        # errors shrink with generation (robust convergence)
        assert res['alphaErrorList'][-1] <= res['alphaErrorList'][0] + 1e-3
        # theta (axis tilt) recovered to ~1e-3
        assert abs(res['thetaHatList'][-1]
                   - rt.extract_theta(model, cfg)) < 2e-3

    def test_extract_angles_from_model(self):
        model = rc.create_parameterized_rpe_model(np.pi / 2, np.pi / 2, 0,
                                                  0, rpeconfig_inst=cfg)
        assert abs(rt.extract_alpha(model, cfg) - np.pi / 2) < 1e-9
        assert abs(rt.extract_epsilon(model, cfg) - np.pi / 2) < 1e-9
        assert abs(rt.extract_theta(model, cfg)) < 1e-6
