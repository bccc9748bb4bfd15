"""Protocols: the top-level user API."""

from pygsti_tpu.protocols.protocol import (
    ExperimentDesign, CircuitListsDesign, CombinedExperimentDesign,
    SimultaneousExperimentDesign, FreeformDesign, ProtocolData, Protocol,
    ProtocolResults, ProtocolResultsDir, DefaultRunner, ProtocolCheckpoint,
)
from pygsti_tpu.protocols.gst import (
    GateSetTomographyDesign, StandardGSTDesign, GSTInitialModel, GSTBadFitOptions,
    GSTObjFnBuilders, GSTGaugeOptSuite, GateSetTomography, LinearGateSetTomography,
    StandardGST, ModelEstimateResults, GateSetTomographyCheckpoint,
    StandardGSTCheckpoint,
)
from pygsti_tpu.protocols.estimate import Estimate
from pygsti_tpu.protocols.modeltest import ModelTest
