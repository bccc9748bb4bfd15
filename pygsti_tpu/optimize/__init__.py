"""Optimizers: host and device-resident Levenberg-Marquardt (reference:
pygsti/optimize/__init__.py)."""

from pygsti_tpu.optimize.simplerlm import (
    SimplerLMOptimizer, CustomLMOptimizer, OptimizerResult, simplish_leastsq,
)
from pygsti_tpu.optimize.device_lm import make_device_lm
from pygsti_tpu.optimize import wildcardopt
from pygsti_tpu.optimize.optimize import minimize, check_jac
