"""Objective functions."""

from pygsti_tpu.objectivefns.objectivefns import (
    RawChi2Function, RawFreqWeightedChi2Function, RawPoissonPicDeltaLogLFunction,
    RawDeltaLogLFunction, RawTVDFunction, ObjectiveFunctionBuilder,
    ModelDatasetCircuitsStore, TimeIndependentMDCObjectiveFunction,
    logl, logl_max, two_delta_logl, chi2,
)
