"""Parity benchmarking: weight-X residual TVDs and disturbances (reference:
pygsti/extras/paritybenchmarking/)."""

from pygsti_tpu.extras.paritybenchmarking.disturbancecalc import (
    ResidualTVD, compute_residual_tvds, compute_disturbances,
    comprehensive_transition_matrix, n_parameters)
