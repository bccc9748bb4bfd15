"""Device-LM out-of-bounds protocol (optimize/device_lm.py).

Mirrors the reference's OOB semantics (pygsti/optimize/simplerlm.py:500-546,
590-640): OOB candidates rejected with the standard damping update
(oob_action="reject"), best-x tracking restricted to known-in-bounds points,
and revert-to-best on a convergence exit reached while oob_check_interval > 1.

The synthetic problem: residual f(x) = x - a with the unconstrained minimum
`a` placed OUTSIDE the feasible ball ||x||^2 <= R^2, so the OOB-checked run
must stop at the boundary while the unchecked run walks straight to `a`.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pygsti_tpu.optimize.device_lm import make_device_lm, EXIT_MESSAGES
from pygsti_tpu.optimize.simplerlm import simplish_leastsq

A = np.array([3.0, 0.5])      # unconstrained minimum (out of bounds)
R2 = 1.0                      # feasible region: ||x||^2 <= 1

TOLS = dict(f_norm2_tol=1e-10, jac_norm_tol=1e-10, rel_ftol=1e-9,
            rel_xtol=1e-9, max_dx_scale=1.0)


def _device_run(oob_interval, maxiter=200, with_oob_fn=True):
    a = jnp.asarray(A)

    def lsvec(x, a):
        return x - a

    def jtj_jtf(x, a):
        f = x - a
        J = jnp.eye(2)
        return f, J, f  # JTJ = I, JTf = f

    def oob(x, a):
        return jnp.dot(x, x) > R2

    init, chunk, fin = make_device_lm(
        jtj_jtf, lsvec, num_params=2, oob_fn=(oob if with_oob_fn else None))
    tols = jnp.asarray([TOLS['f_norm2_tol'], TOLS['jac_norm_tol'],
                        TOLS['rel_ftol'], TOLS['rel_xtol'],
                        (TOLS['max_dx_scale'] ** 2) * 2])
    st = init(jnp.zeros(2), a, oob_interval=oob_interval)
    while int(st.exit_code) == 0 and int(st.k) < maxiter:
        st = chunk(st, jnp.asarray(min(int(st.k) + 25, maxiter)), tols, a)
    x, f, norm_f, mu, nu, code, k = fin(st, jnp.asarray(maxiter))
    return np.asarray(x), float(norm_f), int(code)


def _host_run(oob_interval, maxiter=200):
    def obj_fn(x, oob_check=False):
        if oob_check and float(np.dot(x, x)) > R2:
            raise ValueError("out of bounds")
        return x - A

    def jtj_jtf(x):
        f = x - A
        return f, np.eye(2), f.copy()

    x, conv, msg, mu, nu, norm_f, f = simplish_leastsq(
        obj_fn, jtj_jtf, np.zeros(2), max_iter=maxiter,
        oob_check_interval=oob_interval, oob_action="reject",
        **TOLS)
    assert conv, msg
    return x, float(norm_f)


def test_unchecked_run_reaches_unconstrained_minimum():
    x, norm_f, code = _device_run(oob_interval=0)
    np.testing.assert_allclose(x, A, atol=1e-4)
    assert norm_f < 1e-8


def test_oob_reject_stops_at_feasible_boundary():
    x, norm_f, code = _device_run(oob_interval=1)
    # never leaves the feasible ball ...
    assert float(np.dot(x, x)) <= R2 + 1e-9, x
    # ... and matches the host loop's boundary point
    x_h, norm_f_h = _host_run(oob_interval=1)
    assert float(np.dot(x_h, x_h)) <= R2 + 1e-9, x_h
    np.testing.assert_allclose(x, x_h, atol=1e-6)
    np.testing.assert_allclose(norm_f, norm_f_h, rtol=1e-6)
    assert code in (3, 4, 6), EXIT_MESSAGES.get(code, code)


def test_interval_gt1_reverts_to_inbounds_point():
    # interval=2: every other candidate skips the check, so the iterate can
    # wander out of bounds -- the revert-to-best protocol must still return
    # an in-bounds point (reference revert_to_best_x, simplerlm.py:598-604)
    x, norm_f, code = _device_run(oob_interval=2)
    assert float(np.dot(x, x)) <= R2 + 1e-9, x
    x_h, _ = _host_run(oob_interval=2)
    assert float(np.dot(x_h, x_h)) <= R2 + 1e-9, x_h


def test_none_oob_fn_ignores_interval():
    # with oob_fn=None the interval must be inert (dense-objective semantics)
    x0, nf0, _ = _device_run(oob_interval=0, with_oob_fn=False)
    x1, nf1, _ = _device_run(oob_interval=1, with_oob_fn=False)
    np.testing.assert_allclose(x0, x1, atol=1e-12)
    np.testing.assert_allclose(nf0, nf1, atol=1e-12)


def test_gst_objective_device_oob_wiring():
    """SimplerLMOptimizer routes oob_check_interval>0 through the device LM
    for the dense objective (device_oob_fn=None => identical results)."""
    from pygsti_tpu.modelpacks import smq1Q_XYI as mp
    from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
    from pygsti_tpu.data import simulate_data
    from pygsti_tpu.objectivefns.objectivefns import (
        RawChi2Function, TimeIndependentMDCObjectiveFunction)
    from pygsti_tpu.optimize.simplerlm import SimplerLMOptimizer

    target = mp.target_model('full TP')
    lists = create_lsgst_circuit_lists(
        target, mp.prep_fiducials(), mp.meas_fiducials(), mp.germs(), [1])
    circuits = list(lists[-1])
    noisy = target.depolarize(op_noise=0.02, spam_noise=0.01)
    ds = simulate_data(noisy, circuits, 1000, seed=7)

    xs = {}
    for interval in (0, 1):
        mdl = target.copy()
        obj = TimeIndependentMDCObjectiveFunction(
            RawChi2Function({'min_prob_clip_for_weighting': 1e-4}),
            mdl, ds, circuits)
        opt = SimplerLMOptimizer(maxiter=15, oob_check_interval=interval)
        result = opt.run(obj, printer=0)
        xs[interval] = np.asarray(result.x)
    np.testing.assert_allclose(xs[1], xs[0], rtol=1e-9, atol=1e-12)
