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
    MPI-distributed damping variants are superseded by jax sharding."""
    from pygsti_tpu.optimize.simplerlm import simplish_leastsq
    import numpy as _np

    def jtj_jtf_fn(x):
        f = _np.asarray(obj_fn(x))
        J = _np.asarray(jac_fn(x))
        return f, J.T @ J, J.T @ f

    return simplish_leastsq(obj_fn, jtj_jtf_fn, x0,
                            f_norm2_tol=f_norm2_tol,
                            jac_norm_tol=jac_norm_tol, rel_ftol=rel_ftol,
                            rel_xtol=rel_xtol, max_iter=max_iter,
                            verbosity=verbosity)
