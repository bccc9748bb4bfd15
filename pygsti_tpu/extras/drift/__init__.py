"""Drift / stability analysis (reference: pygsti/extras/drift/, 4.2k LoC)."""

from pygsti_tpu.extras.drift.signal import (dct_power_spectrum, lsp_power_spectrum,
                                            power_significance_threshold,
                                            dct_basis_function)
from pygsti_tpu.extras.drift.stabilityanalyzer import StabilityAnalyzer
from pygsti_tpu.extras.drift import probtrajectory
from pygsti_tpu.extras.drift.probtrajectory import (
    ProbTrajectory, ConstantProbTrajectory, CosineProbTrajectory,
    negloglikelihood, maxlikelihood, amplitude_compression)
from pygsti_tpu.extras.drift import trmodel
from pygsti_tpu.extras.drift.trmodel import TimeResolvedModel
