"""Robust phase estimation analysis (reference:
pygsti/algorithms/robust_phase_estimation.py:16).

Estimates a rotation angle theta from cosine/sine measurement counts at
exponentially growing depths 2^k, resolving phase ambiguities iteratively
(Kimmel, Low, Yoder PRA 92, 062315)."""

from __future__ import annotations

import numpy as np


class RobustPhaseEstimation(object):
    """Given an object `q` with raw_angles-producing count data, compute
    per-generation angle estimates.

    Inputs (mirroring the reference's interface): `q.measured` maps
    generation k -> (cos_plus, cos_minus, sin_plus, sin_minus) counts for
    depth 2^k."""

    def __init__(self, q):
        self.Q = q
        measured = q.measured
        n_gens = len(measured)
        self.raw_angles = {}
        for k in range(n_gens):
            cp, cm, sp, sm = measured[k]
            p_cos = cp / (cp + cm) if (cp + cm) > 0 else 0.5
            p_sin = sp / (sp + sm) if (sp + sm) > 0 else 0.5
            self.raw_angles[k] = np.arctan2(2 * p_sin - 1, 2 * p_cos - 1) % (2 * np.pi)
        self.angle_estimates = self._resolve()

    def _resolve(self):
        """Iteratively refine theta: at generation k the raw angle equals
        (2^k theta) mod 2pi; choose the branch consistent with the previous
        estimate."""
        estimates = []
        theta = self.raw_angles[0]
        estimates.append(theta)
        for k in range(1, len(self.raw_angles)):
            mult = 2 ** k
            raw = self.raw_angles[k]
            # candidate thetas: (raw + 2 pi j) / mult
            prev = estimates[-1]
            j = np.round((prev * mult - raw) / (2 * np.pi))
            theta_k = (raw + 2 * np.pi * j) / mult
            estimates.append(theta_k % (2 * np.pi))
        return np.array(estimates)

    @property
    def angle_estimate(self):
        return self.angle_estimates[-1]


def rpe_phase_estimate(cos_counts, sin_counts):
    """Convenience: counts at depths [1, 2, 4, ...] -> final angle estimate.

    cos_counts/sin_counts: lists of (plus, minus) count pairs per generation.
    """
    class _Q:
        measured = {k: (cos_counts[k][0], cos_counts[k][1],
                        sin_counts[k][0], sin_counts[k][1])
                    for k in range(len(cos_counts))}
    return RobustPhaseEstimation(_Q()).angle_estimate
