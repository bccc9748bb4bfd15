"""Stability analysis protocol (reference: pygsti/protocols/stability.py:36).

Wraps the drift spectral analysis: for every circuit with raw time-series
(clickstream) data, compute DCT power spectra per outcome, run
Bonferroni-corrected instability tests, and estimate probability
trajectories for drifting circuits.
"""

from __future__ import annotations

import collections

import numpy as np

from pygsti_tpu.protocols.protocol import Protocol, ProtocolResults
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

        per_circuit = collections.OrderedDict()
        unstable = []
        # count total tests for a global Bonferroni correction
        test_counts = 0
        circuit_streams = {}
        for c in ds.keys():
            row = ds[c]
            series = row.outcome_series
            if series is None:
                continue
            outcomes = sorted(set(series))
            streams = {}
            for o in outcomes[:-1]:  # last outcome is determined by the others
                bits = np.array([1 if s == o else 0 for s in series])
                streams[o] = bits
                test_counts += len(bits) - 1
            circuit_streams[c] = streams

        if test_counts == 0:
            analyzer._analyzed = True
            return StabilityAnalysisResults(data, self, analyzer, [], {})

        trajectories = {}
        for c, streams in circuit_streams.items():
            circuit_drifting = False
            modes_by_outcome = {}
            for o, bits in streams.items():
                spectrum = _sig.dct_power_spectrum(bits)
                T = len(spectrum)
                thresh = _sig.power_significance_threshold(self.significance, test_counts)
                sig_modes = [k for k in range(1, T) if spectrum[k] > thresh]
                modes_by_outcome[o] = sig_modes
                analyzer.spectra[(c, o)] = spectrum
                if sig_modes:
                    circuit_drifting = True
                    if self.estimate_trajectories:
                        trajectories[(c, o)] = \
                            StabilityAnalyzer.estimate_probability_trajectory(
                                bits, sig_modes)
            per_circuit[c] = modes_by_outcome
            if circuit_drifting:
                unstable.append(c)
                analyzer.drift_frequencies[c] = modes_by_outcome
        analyzer.instability_detected = len(unstable) > 0
        analyzer._analyzed = True
        return StabilityAnalysisResults(data, self, analyzer, unstable, trajectories)


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
