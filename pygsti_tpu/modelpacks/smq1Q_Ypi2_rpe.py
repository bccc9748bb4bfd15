"""Model pack: RPE experiment design for a single Y(pi/2) gate
(reference: pygsti/modelpacks/smq1Q_Ypi2_rpe.py:21)."""

import numpy as np

from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.protocols import rpe as _rpe


def create_rpe_experiment_design(max_max_length, qubit_labels=None,
                                 req_counts=None):
    """RPE design measuring the Y(pi/2) rotation angle: cos circuits are
    plain Gypi2^L; sin circuits append one extra Gypi2 quarter-turn."""
    max_log = np.log2(max_max_length)
    if int(max_log) != max_log:
        raise ValueError("max_max_length must be an integer power of 2")
    assert qubit_labels is None or tuple(qubit_labels) == (0,)
    return _rpe.RobustPhaseEstimationDesign(
        ('Gypi2', 0),
        [2 ** i for i in range(int(max_log) + 1)],
        qubit_labels=(0,),
        req_counts=req_counts,
        sin_prep=(), sin_meas=[('Gypi2', 0)],
        cos_prep=(), cos_meas=(),
        line_labels=(0,))
