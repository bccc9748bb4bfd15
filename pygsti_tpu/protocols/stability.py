"""Stability analysis protocol (reference: pygsti/protocols/stability.py:36).

Wraps the drift spectral analysis: for every circuit with raw time-series
(clickstream) data, compute DCT power spectra per outcome, run
Bonferroni-corrected instability tests, and estimate probability
trajectories for drifting circuits.
"""

from __future__ import annotations

import collections

import numpy as np

from pygsti_tpu.protocols.protocol import (Protocol, ProtocolResults,
                                            ExperimentDesign)
from pygsti_tpu.extras.drift.stabilityanalyzer import StabilityAnalyzer
from pygsti_tpu.extras.drift import signal as _sig


class StabilityAnalysis(Protocol):
    """Detect drift in time-series data via spectral analysis."""

    def __init__(self, significance=0.05, transform='dct', estimate_trajectories=True,
                 name=None):
        super().__init__(name)
        self.significance = significance
        self.transform = transform
        self.estimate_trajectories = estimate_trajectories

    def run(self, data, memlimit=None, comm=None):
        ds = data.dataset
        analyzer = StabilityAnalyzer(ds, self.transform, self.significance)
        analyzer.compute_spectra()
        analyzer.run_instability_detection()

        trajectories = {}
        if self.estimate_trajectories:
            for c in analyzer.unstable_circuits():
                for o, traj in analyzer.probability_trajectories(c).items():
                    trajectories[(c, o)] = traj
        return StabilityAnalysisResults(data, self, analyzer,
                                        list(analyzer.unstable_circuits()),
                                        trajectories)


class StabilityAnalysisResults(ProtocolResults):
    def __init__(self, data, protocol_instance, analyzer, unstable_circuits,
                 probability_trajectories=None):
        super().__init__(data, protocol_instance)
        self.stabilityanalyzer = analyzer
        self.unstable_circuits = unstable_circuits
        self.probability_trajectories = probability_trajectories or {}

    @property
    def instability_detected(self):
        return self.stabilityanalyzer.instability_detected

    def __str__(self):
        if self.instability_detected:
            return ("StabilityAnalysis: drift DETECTED in %d circuits"
                    % len(self.unstable_circuits))
        return "StabilityAnalysis: no drift detected"


class StabilityAnalysisDesign(ExperimentDesign):
    """Experiment design for stability analysis: any circuit list, with
    timestamped data required (reference: stability.py:16)."""

    def __init__(self, circuits, qubit_labels=None):
        self.needs_timestamps = True
        super().__init__(circuits, qubit_labels=qubit_labels)
