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
from pygsti_tpu.protocols.rb import (
    BenchmarkingDesign, CliffordRBDesign, DirectRBDesign, MirrorRBDesign,
    BinaryRBDesign, InterleavedRBDesign, RandomizedBenchmarking,
    RandomizedBenchmarkingResults, InterleavedRandomizedBenchmarking,
    InterleavedRandomizedBenchmarkingResults,
)
from pygsti_tpu.protocols.vb import (
    ByDepthDesign, SummaryStatistics, ByDepthSummaryStatistics,
    SummaryStatisticsResults, PeriodicMirrorCircuitDesign,
)
from pygsti_tpu.protocols.rpe import (
    RobustPhaseEstimationDesign, RobustPhaseEstimationResults,
    RobustPhaseEstimationProtocol,
)
from pygsti_tpu.protocols.stability import (StabilityAnalysis,
                                            StabilityAnalysisResults)
from pygsti_tpu.protocols.confidenceregionfactory import (
    ConfidenceRegionFactory, ConfidenceRegionFactoryView)
from pygsti_tpu.protocols.freeformsim import (DataSimulator,
                                              FreeformDataSimulator,
                                              ModelFreeformSimulator)
from pygsti_tpu.protocols.protocol import (MultiPassProtocol, MultiPassResults,
                                           ProtocolPostProcessor, TreeRunner,
                                           SimpleRunner)
from pygsti_tpu.protocols.protocol import SlurmSettings, DataCountsSimulator
