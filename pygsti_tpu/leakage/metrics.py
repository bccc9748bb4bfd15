"""Leakage metrics (reference: pygsti/leakage/metrics.py)."""

from __future__ import annotations

import numpy as np

from pygsti_tpu.tools.basistools import change_basis, vec_to_stdmx, stdmx_to_vec


def _apply_superop_to_mx(superop_gm, rho_std):
    """Apply a gm-basis superop to a density matrix (3-level)."""
    vec = stdmx_to_vec(rho_std, 'gm')
    out = np.asarray(superop_gm) @ vec
    return vec_to_stdmx(out, 'gm')


def gate_leakage_rate(superop, mx_basis='gm', comp_levels=(0, 1), leak_levels=(2,)):
    """Average probability of leaking out of the computational subspace:
    mean over computational-basis inputs of the population transferred to
    leakage levels (reference: leakage/metrics leakage rate)."""
    d = int(round(np.sqrt(np.asarray(superop).shape[0])))
    superop_gm = change_basis(np.asarray(superop), mx_basis, 'gm')
    rates = []
    for i in comp_levels:
        rho = np.zeros((d, d), dtype=complex)
        rho[i, i] = 1.0
        out = _apply_superop_to_mx(superop_gm, rho)
        rates.append(np.real(sum(out[l, l] for l in leak_levels)))
    return float(np.mean(rates))


def gate_seepage_rate(superop, mx_basis='gm', comp_levels=(0, 1), leak_levels=(2,)):
    """Average probability of returning from the leakage subspace."""
    d = int(round(np.sqrt(np.asarray(superop).shape[0])))
    superop_gm = change_basis(np.asarray(superop), mx_basis, 'gm')
    rates = []
    for l in leak_levels:
        rho = np.zeros((d, d), dtype=complex)
        rho[l, l] = 1.0
        out = _apply_superop_to_mx(superop_gm, rho)
        rates.append(np.real(sum(out[i, i] for i in comp_levels)))
    return float(np.mean(rates))
