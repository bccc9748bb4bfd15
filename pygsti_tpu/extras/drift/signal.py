"""Spectral-analysis primitives for drift detection
(reference: pygsti/extras/drift/signal.py).

Power spectra of binary (clickstream) time series, normalized so that for a
constant-probability process each power is ~chi^2_1 distributed -- the basis
for the drift hypothesis tests.  Uses the type-II DCT; on device this is a
batched matmul against the DCT basis (TPU-friendly)."""

from __future__ import annotations

import numpy as np
import scipy.stats as stats
from scipy.fft import dct


def standardize_sequence(x, null_hypothesis_probability=None):
    """Standardize a 0/1 sequence: (x - p) / sqrt(p(1-p))."""
    x = np.asarray(x, dtype=float)
    p = null_hypothesis_probability if null_hypothesis_probability is not None \
        else np.mean(x)
    p = min(max(p, 1e-12), 1 - 1e-12)
    return (x - p) / np.sqrt(p * (1 - p))


def dct_power_spectrum(x, null_hypothesis_probability=None):
    """Normalized DCT-II power spectrum of a 0/1 sequence; under the
    constant-p null each mode (except DC) is ~chi^2_1."""
    z = standardize_sequence(x, null_hypothesis_probability)
    modes = dct(z, norm='ortho')
    return modes ** 2


def dct_basis_function(omega, T, t):
    """The omega-th orthonormal DCT basis function at time(s) t."""
    if omega == 0:
        return np.ones_like(np.asarray(t, dtype=float)) / np.sqrt(T)
    return np.sqrt(2.0 / T) * np.cos(np.pi * omega * (np.asarray(t) + 0.5) / T)


def lsp_power_spectrum(x, timestamps, frequencies):
    """Lomb-Scargle periodogram for unequally-spaced data."""
    from scipy.signal import lombscargle
    z = standardize_sequence(x)
    ang = 2 * np.pi * np.asarray(frequencies)
    ang = np.where(ang == 0, 1e-12, ang)
    return lombscargle(np.asarray(timestamps, dtype=float), z, ang, normalize=False)


def power_significance_threshold(significance, numtests, dof=1):
    """Bonferroni-corrected chi^2 power threshold for `numtests` modes.

    Powers averaged over `dof` independent chi^2_1 spectra are distributed
    as chi^2_dof / dof under the null, so the threshold is normalized by
    `dof` (reference: signal.py:398 power_significance_threshold)."""
    return stats.chi2.isf(significance / numtests, dof) / dof


def power_significance_quasithreshold(significance, numstats, dof,
                                      procedure='Benjamini-Hochberg'):
    """The Benjamini-Hochberg quasi-threshold: sorted powers are compared
    to this ascending sequence; everything above the first exceedance is
    significant (reference: signal.py:434)."""
    if procedure != 'Benjamini-Hochberg':
        raise ValueError(
            "Can only obtain a quasithreshold for the Benjamini-Hochberg "
            "procedure!")
    return np.array([stats.chi2.isf((numstats - i) * significance / numstats,
                                    dof) / dof for i in range(numstats)])


def power_to_pvalue(power, dof):
    """p-value of a power that is chi^2_dof/dof under the null
    (reference: signal.py:410)."""
    return 1 - stats.chi2.cdf(dof * power, dof)


def maxpower_pvalue(maxpower, numpowers, dof):
    """Approximate p-value of the largest of `numpowers` iid chi^2_dof/dof
    powers (reference: signal.py:420)."""
    return 1 - stats.chi2.cdf(maxpower * dof, dof) ** (numpowers - 1)


def frequencies_from_timestep(timestep, T):
    """DCT mode frequencies (Hz) for sample interval `timestep` and length T."""
    return np.arange(T) / (2 * timestep * T)


def amplitudes_at_frequencies(freq_indices, modes, T):
    """Extract mode amplitudes for given DCT frequency indices."""
    return {k: modes[k] for k in freq_indices}


def dct_amplitudes_at_frequencies(freq_indices, bits):
    """Amplitudes of a 0/1 sequence at the given DCT mode indices, in the
    CosineProbTrajectory basis convention (basis functions 1 and
    sqrt(2)cos(pi k (t+1/2)/T); reference: signal.py
    amplitudes_at_frequencies).  amp_k = DCT-II-ortho coefficient / sqrt(T),
    so sum_k amp_k * basis_k(t) reconstructs the sequence."""
    bits = np.asarray(bits, dtype=float)
    T = len(bits)
    modes = dct(bits, norm='ortho')
    return [float(modes[k]) / np.sqrt(T) for k in freq_indices]


def sparse_signal_from_modes(mode_indices, mode_amplitudes, T, mean=0.5):
    """Reconstruct a probability trajectory from a few DCT modes."""
    t = np.arange(T)
    out = np.full(T, float(mean))
    for k, a in zip(mode_indices, mode_amplitudes):
        out = out + a * dct_basis_function(k, T, t)
    return out
