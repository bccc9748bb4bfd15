"""Robust phase estimation protocol (reference: pygsti/protocols/rpe.py:22)."""

from __future__ import annotations

import numpy as np

from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.protocols.protocol import ExperimentDesign, Protocol, ProtocolResults
from pygsti_tpu.algorithms.robust_phase_estimation import RobustPhaseEstimation


class RobustPhaseEstimationDesign(ExperimentDesign):
    """Cos/sin circuit families at depths 2^k (reference: rpe.py:22).

    cos circuit at generation k: prep + gate^(2^k) + meas (measures
    cos(2^k theta)); sin circuit adds a quarter-turn preparation so the same
    repeated gate measures sin(2^k theta).
    """

    def __init__(self, gate_label, depths, qubit_labels=None,
                 req_counts=None,
                 sin_prep=(), sin_meas=(), cos_prep=(), cos_meas=(),
                 line_labels=None):
        self.gate_label = gate_label
        self.depths = list(depths)
        lls = line_labels if line_labels is not None else \
            (qubit_labels if qubit_labels is not None else (0,))
        self.cos_circuits = []
        self.sin_circuits = []
        for d in self.depths:
            base = Circuit([gate_label], lls).repeat(d)
            self.cos_circuits.append(Circuit(list(cos_prep), lls) + base
                                     + Circuit(list(cos_meas), lls))
            self.sin_circuits.append(Circuit(list(sin_prep), lls) + base
                                     + Circuit(list(sin_meas), lls))
        super().__init__(self.cos_circuits + self.sin_circuits, qubit_labels)


class RobustPhaseEstimationResults(ProtocolResults):
    def __init__(self, data, protocol_instance, angle_estimates):
        super().__init__(data, protocol_instance)
        self.angle_estimates = angle_estimates

    @property
    def angle_estimate(self):
        return self.angle_estimates[-1]


class RobustPhaseEstimationProtocol(Protocol):
    """Extract the rotation angle from RPE data (reference: rpe.py:166)."""

    def __init__(self, name=None, cos_outcome_plus='0', sin_outcome_plus='1'):
        super().__init__(name)
        self.cos_outcome_plus = cos_outcome_plus
        self.sin_outcome_plus = sin_outcome_plus

    def run(self, data, memlimit=None, comm=None):
        design = data.edesign
        ds = data.dataset

        measured = {}
        for k in range(len(design.depths)):
            def pm(circ, plus):
                row = ds[circ]
                plus_cnt = row.counts.get((plus,), 0)
                total = row.total
                return plus_cnt, total - plus_cnt
            cp, cm = pm(design.cos_circuits[k], self.cos_outcome_plus)
            sp, sm = pm(design.sin_circuits[k], self.sin_outcome_plus)
            measured[k] = (cp, cm, sp, sm)

        class _Q:
            pass
        q = _Q()
        q.measured = measured
        rpe = RobustPhaseEstimation(q)
        return RobustPhaseEstimationResults(data, self, rpe.angle_estimates)


# alias matching the reference's class name
RobustPhaseEstimation_Protocol = RobustPhaseEstimationProtocol


# reference shorthand aliases (reference: rpe.py:327-329)
RPEDesign = RobustPhaseEstimationDesign
RPE = RobustPhaseEstimationProtocol
RPEResults = RobustPhaseEstimationResults
