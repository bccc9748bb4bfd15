"""Interpolated gates: continuously-parameterized operations built from
sampled (physics-simulation) process matrices
(reference: pygsti/extras/interpygate/, 802 LoC)."""

from pygsti_tpu.extras.interpygate.core import (InterpolatedDenseOp,
                                                InterpolatedOpFactory)
from pygsti_tpu.extras.interpygate.process_tomography import (
    run_process_tomography, multi_kron)
