"""Drift detection & probability-trajectory estimation
(reference: pygsti/extras/drift/stabilityanalyzer.py, 4252 LoC
StabilityAnalyzer).

Implements the reference's multi-test, multi-resolution workflow:

* per-(circuit, outcome) clickstream power spectra (DCT for equally-spaced
  data, Lomb-Scargle for unequally-spaced),
* aggregated per-circuit spectra (averaged over outcomes) and the global
  "mega-spectrum" (averaged over circuits) -- power averaging increases
  sensitivity to drift that is coherent across circuits,
* instability detection at all three aggregation levels with the
  significance budget split across test classes and Bonferroni-corrected
  within each class (reference: run_instability_detection / _equalized
  significance allocation),
* drift frequencies in Hz (from the data's timestep) and DCT-model
  probability-trajectory estimation for the unstable circuits.
"""

from __future__ import annotations

import collections

import numpy as np

from pygsti_tpu.extras.drift import signal as _sig


def _clickstreams(row):
    """{outcome: 0/1 array} per-shot clickstreams from a time-series row
    (expanding repetition counts), ordered by timestamp.  Returns (streams,
    times) or (None, None) when the row has no series data."""
    series = row.outcome_series
    if series is None or row.time is None or len(series) == 0:
        return None, None
    times = np.asarray(row.time, dtype=float)
    reps = np.asarray(row.reps if row.reps is not None
                      else np.ones(len(series)), dtype=int)
    order = np.argsort(times, kind='stable')
    outcomes = sorted(set(series))
    shots = []
    shot_times = []
    for i in order:
        shots.extend([series[i]] * reps[i])
        shot_times.extend([times[i]] * reps[i])
    # drop the last outcome: its stream is determined by the others (for two
    # outcomes the complement has an IDENTICAL spectrum, so including it
    # would double-count correlated tests; reference marginalizes likewise)
    indep = outcomes[:-1] if len(outcomes) > 1 else outcomes
    streams = {o: np.array([1.0 if s == o else 0.0 for s in shots])
               for o in indep}
    return streams, np.asarray(shot_times)


class StabilityAnalyzer(object):
    """Analyze a time-series DataSet for drift (reference:
    stabilityanalyzer.StabilityAnalyzer)."""

    def __init__(self, ds, transform='auto', significance=0.05,
                 tests=(('circuit', 'outcome'), ('circuit',), ())):
        self.dataset = ds
        self.transform = transform
        self.significance = significance
        self.tests = tuple(tests)
        self.spectra = {}            # (circuit, outcome) -> power spectrum
        self.circuit_spectra = {}    # circuit -> outcome-averaged spectrum
        self.global_spectrum = None  # circuit-averaged spectrum
        self.frequencies = {}        # circuit -> mode frequencies in Hz
        self.drift_frequencies = {}  # test key -> significant mode indices
        self.instability_detected = False
        self.unstable_circuits = []
        self._analyzed = False
        self._detected = False

    # -- spectra ---------------------------------------------------------------
    def compute_spectra(self):
        """Per-(circuit,outcome) spectra + per-circuit and global averages."""
        circuit_specs = {}
        for c in self.dataset.keys():
            row = self.dataset[c]
            streams, times = _clickstreams(row)
            if streams is None:
                continue
            equal_spaced = len(times) < 2 or np.allclose(
                np.diff(times), times[1] - times[0], atol=1e-9)
            transform = self.transform
            if transform == 'auto':
                transform = 'dct' if equal_spaced else 'lsp'
            specs = []
            T = None
            for o, bits in streams.items():
                if bits.std() == 0:
                    continue  # constant stream: no spectrum
                if transform == 'dct':
                    spec = _sig.dct_power_spectrum(bits)
                else:
                    T0 = len(bits)
                    dt = max((times[-1] - times[0]) / max(T0 - 1, 1), 1e-12)
                    freqs = _sig.frequencies_from_timestep(dt, T0)[1:]
                    spec = np.concatenate(
                        [[0.0], _sig.lsp_power_spectrum(bits, times, freqs)])
                self.spectra[(c, o)] = spec
                specs.append(spec)
                T = len(spec)
            if specs:
                self.circuit_spectra[c] = np.mean(np.stack(specs), axis=0)
                if len(times) >= 2:
                    dt = (times[-1] - times[0]) / max(len(times) - 1, 1)
                    self.frequencies[c] = _sig.frequencies_from_timestep(
                        dt, T)
        if self.circuit_spectra:
            L = min(len(s) for s in self.circuit_spectra.values())
            self.global_spectrum = np.mean(
                np.stack([s[:L] for s in self.circuit_spectra.values()]),
                axis=0)
        self._analyzed = True
        return self.spectra

    # -- detection ---------------------------------------------------------------
    def run_instability_detection(self, significance=None, verbosity=0):
        """Multi-level drift tests (reference: run_instability_detection):
        the significance budget is split equally across the test classes in
        ``self.tests`` and Bonferroni-corrected within each class.

        Test classes:
          ('circuit','outcome') -- each per-(circuit,outcome) spectrum
          ('circuit',)          -- per-circuit outcome-averaged spectra
          ()                    -- the global circuit-averaged spectrum
        Power-averaged spectra of n streams are ~chi^2_n/n distributed under
        the null, tested with the matching dof.
        """
        if not self._analyzed:
            self.compute_spectra()
        significance = significance if significance is not None \
            else self.significance
        n_classes = max(len(self.tests), 1)
        class_sig = significance / n_classes
        results = {}
        any_drift = False
        unstable = set()

        if ('circuit', 'outcome') in self.tests and self.spectra:
            n_tests = sum(max(len(s) - 1, 0) for s in self.spectra.values())
            for (c, o), spec in self.spectra.items():
                thresh = _sig.power_significance_threshold(
                    class_sig, max(n_tests, 1))
                sig_modes = [k for k in range(1, len(spec))
                             if spec[k] > thresh]
                if sig_modes:
                    results[(c, o)] = sig_modes
                    unstable.add(c)
                    any_drift = True

        if ('circuit',) in self.tests and self.circuit_spectra:
            n_tests = sum(max(len(s) - 1, 0)
                          for s in self.circuit_spectra.values())
            for c, spec in self.circuit_spectra.items():
                n_avg = max(sum(1 for (cc, _) in self.spectra if cc == c), 1)
                thresh = _sig.power_significance_threshold(
                    class_sig, max(n_tests, 1), dof=n_avg) / n_avg
                sig_modes = [k for k in range(1, len(spec))
                             if spec[k] > thresh]
                if sig_modes:
                    results[(c,)] = sig_modes
                    unstable.add(c)
                    any_drift = True

        if () in self.tests and self.global_spectrum is not None:
            spec = self.global_spectrum
            n_avg = max(len(self.circuit_spectra), 1)
            thresh = _sig.power_significance_threshold(
                class_sig, max(len(spec) - 1, 1), dof=n_avg) / n_avg
            sig_modes = [k for k in range(1, len(spec)) if spec[k] > thresh]
            if sig_modes:
                results[()] = sig_modes
                any_drift = True

        self.drift_frequencies = results
        self.unstable_circuits = sorted(unstable, key=str)
        self.instability_detected = any_drift
        self._detected = True
        return results

    # -- accessors ----------------------------------------------------------------
    def power_spectrum(self, key=()):
        """Spectrum for a test key: (circuit, outcome), (circuit,) or ()."""
        if key == ():
            return self.global_spectrum
        if len(key) == 1:
            return self.circuit_spectra.get(key[0])
        return self.spectra.get(tuple(key))

    def instability_indices(self, key=()):
        return self.drift_frequencies.get(key, [])

    def drift_frequencies_hz(self, circuit):
        """Significant drift frequencies of a circuit in Hz."""
        modes = self.drift_frequencies.get((circuit,), []) or \
            [m for (c, o), ms in self.drift_frequencies.items()
             if isinstance((c, o), tuple) and len((c, o)) == 2 and c == circuit
             for m in ms]
        freqs = self.frequencies.get(circuit)
        if freqs is None:
            return []
        return [float(freqs[m]) for m in sorted(set(modes)) if m < len(freqs)]

    def probability_trajectories(self, circuit, significance=None):
        """{outcome: p(t) array} DCT-model trajectory estimates for one
        circuit (reference: probtrajectory.py DCT-model estimation)."""
        row = self.dataset[circuit]
        streams, _ = _clickstreams(row)
        if streams is None:
            return {}
        out = {}
        for o, bits in streams.items():
            out[o] = self.estimate_probability_trajectory(
                bits, significance=significance or self.significance)
        return out

    @staticmethod
    def analyze_clickstream(bits, significance=0.05):
        """Analyze one 0/1 clickstream: returns (drift_detected,
        significant_mode_indices, spectrum)."""
        bits = np.asarray(bits)
        spectrum = _sig.dct_power_spectrum(bits)
        T = len(spectrum)
        thresh = _sig.power_significance_threshold(significance, T - 1)
        sig_modes = [k for k in range(1, T) if spectrum[k] > thresh]
        return (len(sig_modes) > 0), sig_modes, spectrum

    @staticmethod
    def estimate_probability_trajectory(bits, mode_indices=None, significance=0.05):
        """Estimate p(t) from a clickstream by keeping significant DCT modes
        (reference: probtrajectory.py DCT-model estimation)."""
        bits = np.asarray(bits, dtype=float)
        T = len(bits)
        pmean = np.mean(bits)
        if mode_indices is None:
            _, mode_indices, _ = StabilityAnalyzer.analyze_clickstream(bits, significance)
        from scipy.fft import dct as _dct
        z = bits - pmean
        modes = _dct(z, norm='ortho')
        traj = np.full(T, pmean)
        t = np.arange(T)
        for k in mode_indices:
            traj = traj + modes[k] * _sig.dct_basis_function(k, T, t)
        return np.clip(traj, 0, 1)
