"""jit helpers: compile-effort control for the big device graphs.

XLA compilation of the fused GST graphs (device LM chunk: Jacobian products
+ damped solve + line search in one while_loop) takes minutes on a
single-core host even though the compiled program runs in seconds.  The
``exec_time_optimization_effort`` compiler option trades optimization effort
for compile time; measured on the 2Q GST workload the low-effort executable
runs within a few percent of the default one while compiling much faster.

Env knob: PYGSTI_TPU_COMPILE_EFFORT (float, e.g. "-1.0" = fastest compile,
"0" = XLA default, unset = the built-in default below).
"""

from __future__ import annotations

import os

import jax

# default: XLA's standard effort.  Measured on the 2Q GST workload,
# effort=-1.0 cut the big-graph compile only ~12% (139s -> 122s) while making
# the compiled LM stages ~2.5x slower (3.8s -> 8.8s) -- a net loss.  The env
# knob remains for experimentation on other workload shapes.
_DEFAULT_EFFORT = None


def compile_effort():
    val = os.environ.get('PYGSTI_TPU_COMPILE_EFFORT')
    if val is None:
        return _DEFAULT_EFFORT
    if val.strip() == '':
        return None
    return float(val)


def jit_fast(fn, effort_default=None, **kwargs):
    """jax.jit with the configured exec-time optimization effort.

    `effort_default` is used when the env knob is UNSET -- callers pass a
    reduced effort for graphs whose runtime is insensitive to XLA's
    optimization level but whose compile time is not (e.g. dim >= 256 dense
    propagation graphs: measured 5Q cloud-noise cold compile 93s -> 54s at
    effort=-1.0 with identical warm runtime).  An explicitly EMPTY env value
    (PYGSTI_TPU_COMPILE_EFFORT="") disables every effort override, including
    effort_default, restoring XLA's default for all graphs."""
    val = os.environ.get('PYGSTI_TPU_COMPILE_EFFORT')
    if val is None:
        effort = _DEFAULT_EFFORT if _DEFAULT_EFFORT is not None \
            else effort_default
    elif val.strip() == '':
        effort = None  # explicit opt-out beats effort_default
    else:
        effort = float(val)
    if effort is not None:
        try:
            return jax.jit(fn, compiler_options={
                'exec_time_optimization_effort': float(effort)}, **kwargs)
        except TypeError:
            pass  # older jax without compiler_options
    return jax.jit(fn, **kwargs)


def big_dim_effort(dim, threshold=256):
    """The effort_default for graphs over dense [dim, dim] superoperators:
    -1.0 on TPU at/above the threshold (MXU-dominant programs gain nothing
    from higher XLA effort), None otherwise."""
    if dim >= threshold and jax.default_backend() == 'tpu':
        return -1.0
    return None
