"""Knob-behavior tests for custom_leastsq / CustomLMOptimizer
(reference: pygsti/optimize/customlm.py:297): the extended damping modes,
uphill steps, and x_limits are implemented on the host LM loop; the
unsupported reference knobs raise NotImplementedError instead of being
silently ignored."""

import numpy as np
import pytest

from pygsti_tpu.optimize.customlm import custom_leastsq
from pygsti_tpu.optimize.simplerlm import CustomLMOptimizer


def _residual_problem():
    """Small nonlinear least squares: fit y = exp(-a t) + b, optimum at
    a=1.3, b=0.4."""
    t = np.linspace(0, 2, 30)
    y = np.exp(-1.3 * t) + 0.4

    def obj(x, oob_check=False):
        return np.exp(-x[0] * t) + x[1] - y

    def jac(x):
        J = np.empty((len(t), 2))
        J[:, 0] = -t * np.exp(-x[0] * t)
        J[:, 1] = 1.0
        return J

    return obj, jac


class TestDampingModes:
    @pytest.mark.parametrize("mode", ["identity", "JTJ", "invJTJ"])
    def test_converges(self, mode):
        obj, jac = _residual_problem()
        clip = None if mode == "identity" else (1e-6, 1e6)
        x, converged, msg, mu, nu, norm_f, f = custom_leastsq(
            obj, jac, np.array([0.5, 0.0]), damping_mode=mode,
            damping_clip=clip, rel_ftol=1e-12, rel_xtol=1e-12)
        assert converged
        assert np.allclose(x, [1.3, 0.4], atol=1e-3)

    def test_identity_rejects_damping_clip(self):
        obj, jac = _residual_problem()
        with pytest.raises(ValueError):
            custom_leastsq(obj, jac, np.array([0.5, 0.0]),
                           damping_mode="identity", damping_clip=(0.1, 10))

    def test_unsupported_knobs_raise(self):
        obj, jac = _residual_problem()
        with pytest.raises(NotImplementedError):
            custom_leastsq(obj, jac, np.array([0.5, 0.0]),
                           damping_mode="adaptive")
        with pytest.raises(NotImplementedError):
            custom_leastsq(obj, jac, np.array([0.5, 0.0]),
                           damping_basis="singular_values")
        with pytest.raises(NotImplementedError):
            custom_leastsq(obj, jac, np.array([0.5, 0.0]),
                           use_acceleration=True)
        with pytest.raises(NotImplementedError):
            CustomLMOptimizer(damping_mode="adaptive")
        with pytest.raises(NotImplementedError):
            CustomLMOptimizer(use_acceleration=True)


class TestXLimits:
    def test_solution_respects_limits(self):
        obj, jac = _residual_problem()
        limits = np.array([[0.0, 1.0], [-1.0, 1.0]])  # optimum a=1.3 is outside
        x, converged, msg, *_ = custom_leastsq(
            obj, jac, np.array([0.5, 0.0]), x_limits=limits)
        assert x[0] <= 1.0 + 1e-12 and x[1] <= 1.0 + 1e-12
        assert x[0] >= -1e-12


class TestUphillSteps:
    def test_uphill_threshold_allows_progress(self):
        """With a generous uphill threshold the optimizer still converges to
        the optimum (the uphill condition must not break normal descent)."""
        obj, jac = _residual_problem()
        x, converged, msg, *_ = custom_leastsq(
            obj, jac, np.array([0.5, 0.0]), uphill_step_threshold=1.5,
            rel_ftol=1e-12, rel_xtol=1e-12)
        assert converged
        assert np.allclose(x, [1.3, 0.4], atol=1e-3)

    def test_uphill_step_accepted(self):
        """Craft a sequence where dF goes negative and confirm an uphill step
        is actually taken: use a wiggly 1-D residual whose LM step overshoots.
        The run must terminate without error and report convergence."""
        t = np.linspace(0, 1, 8)

        def obj(x, oob_check=False):
            return np.sin(3 * x[0]) * t + (x[0] - 0.7) * np.ones_like(t)

        def jac(x):
            return (3 * np.cos(3 * x[0]) * t + 1.0).reshape(-1, 1)

        x, converged, msg, *_ = custom_leastsq(
            obj, jac, np.array([0.0]), uphill_step_threshold=1.9,
            max_iter=200)
        assert converged


class TestOptimizerRouting:
    def test_custom_knobs_force_host_loop(self):
        """Non-default damping knobs must route through the host LM (the
        device loop implements identity damping only) and still fit."""
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.objectivefns.objectivefns import ObjectiveFunctionBuilder
        from pygsti_tpu.algorithms.core import run_gst_fit_simple

        target = mp.target_model('full TP')
        lists = create_lsgst_circuit_lists(target, mp.prep_fiducials(),
                                           mp.meas_fiducials(), mp.germs(), [1])
        circuits = list(lists[-1])
        ds = simulate_data(target.depolarize(op_noise=0.02), circuits, 1000,
                           seed=21)
        opt = CustomLMOptimizer(damping_mode='JTJ', damping_clip=(1e-6, 1e6),
                                uphill_step_threshold=1.5, maxiter=100)
        mdl = target.copy()
        _, objfn = run_gst_fit_simple(ds, mdl, circuits, opt,
                                      ObjectiveFunctionBuilder('chi2'),
                                      verbosity=0)
        # fit actually improved over the noisy start
        from pygsti_tpu.objectivefns.objectivefns import (
            RawChi2Function, TimeIndependentMDCObjectiveFunction)
        assert not np.allclose(mdl.to_vector(), target.to_vector())
