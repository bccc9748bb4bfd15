"""Custom Levenberg-Marquardt optimizer module-path parity (reference:
pygsti/optimize/customlm.py).  The TPU implementation lives in
simplerlm.py: CustomLMOptimizer extends SimplerLMOptimizer with the
reference's extended knob surface, and the device-resident loop is in
optimize/device_lm.py."""

from pygsti_tpu.optimize.simplerlm import (CustomLMOptimizer,
                                           SimplerLMOptimizer,
                                           Optimizer, OptimizerResult)


def custom_leastsq(obj_fn, jac_fn, x0, f_norm2_tol=1e-6, jac_norm_tol=1e-6,
                   rel_ftol=1e-6, rel_xtol=1e-6, max_iter=100,
                   num_fd_iters=0, max_dx_scale=1.0,
                   damping_mode="identity",
                   damping_basis="diagonal_values", damping_clip=None,
                   use_acceleration=False, uphill_step_threshold=0.0,
                   init_munu="auto", oob_check_interval=0,
                   oob_action="reject", oob_check_mode=0,
                   resource_alloc=None, arrays_interface=None,
                   serial_solve_proc_threshold=100, x_limits=None,
                   verbosity=0, profiler=None):
    """Levenberg-Marquardt least squares with the reference's extended knob
    surface (reference: customlm.custom_leastsq:297).  Delegates to
    simplish_leastsq: on TPU the LM loop is a device-resident
    lax.while_loop (optimize/device_lm.py) and the reference's
    MPI-distributed damping variants are superseded by jax sharding.

    Knob support: damping_mode identity/JTJ/invJTJ (+damping_clip),
    uphill_step_threshold, max_dx_scale, init_munu, oob_check_interval/
    action/mode, and x_limits are implemented; 'adaptive' damping,
    damping_basis='singular_values', and use_acceleration raise
    NotImplementedError.  num_fd_iters is accepted and ignored: Jacobians
    here are exact (AD), so finite-difference warmup iterations have no
    purpose.  resource_alloc/arrays_interface/serial_solve_proc_threshold
    are MPI-machinery parameters with no TPU analog and are ignored."""
    from pygsti_tpu.optimize.simplerlm import simplish_leastsq
    import numpy as _np

    if damping_basis != "diagonal_values":
        raise NotImplementedError(
            "damping_basis=%r is not implemented (only 'diagonal_values'; "
            "the SVD-basis damping has no TPU-side implementation)"
            % damping_basis)
    if use_acceleration:
        raise NotImplementedError(
            "use_acceleration=True (geodesic acceleration) is not "
            "implemented")

    def jtj_jtf_fn(x):
        f = _np.asarray(obj_fn(x))
        J = _np.asarray(jac_fn(x))
        return f, J.T @ J, J.T @ f

    if x_limits is not None:
        x_limits = _np.asarray(x_limits, dtype=float)

    return simplish_leastsq(obj_fn, jtj_jtf_fn, x0,
                            f_norm2_tol=f_norm2_tol,
                            jac_norm_tol=jac_norm_tol, rel_ftol=rel_ftol,
                            rel_xtol=rel_xtol, max_iter=max_iter,
                            max_dx_scale=max_dx_scale,
                            init_munu=init_munu,
                            oob_check_interval=oob_check_interval,
                            oob_action=oob_action,
                            oob_check_mode=oob_check_mode,
                            x_limits=x_limits,
                            damping_mode=damping_mode,
                            damping_clip=damping_clip,
                            uphill_step_threshold=uphill_step_threshold,
                            verbosity=verbosity)
