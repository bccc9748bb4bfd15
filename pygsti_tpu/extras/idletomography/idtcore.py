"""Idle tomography (reference: pygsti/extras/idletomography/idtcore.py).

Characterizes the error generator of the idle operation: prepare Pauli
eigenstates, idle N times, measure Pauli observables; the slope of
<observable> vs N gives the intrinsic error rates (hamiltonian rates from
antisymmetric observable responses, stochastic rates from eigenstate decay).
"""

from __future__ import annotations

import collections

import numpy as np

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.protocols.protocol import ExperimentDesign, Protocol, ProtocolResults


# 1-qubit Pauli-basis preparation/measurement fiducials in terms of
# Gxpi2/Gypi2 words: prep maps |0> to the +1 eigenstate; meas rotates the
# observable's eigenbasis onto Z.
_PREP_WORDS = {
    'X': [('Gypi2',)],          # |+>  (Y(pi/2)|0> = (|0>+|1>)/sqrt2)
    'Y': [('Gxpi2',), ('Gxpi2',), ('Gxpi2',)],  # |+i> via X(-pi/2) = X(pi/2)^3
    'Z': [],
}
_MEAS_WORDS = {
    'X': [('Gypi2',), ('Gypi2',), ('Gypi2',)],  # rotate X -> Z
    'Y': [('Gxpi2',)],                          # rotate Y -> Z
    'Z': [],
}


def _word_to_labels(word, qubit):
    return [Label(g[0], qubit) for g in word]


class IdleTomographyDesign(ExperimentDesign):
    """Pauli prep + idle^N + Pauli meas circuits for each qubit."""

    def __init__(self, qubit_labels, max_lengths=(0, 1, 2, 4, 8), paulis=('X', 'Y', 'Z'),
                 idle_label=None):
        self.qubit_labels_list = tuple(qubit_labels)
        self.max_lengths = list(max_lengths)
        self.paulis = list(paulis)
        self.idle_label = idle_label if idle_label is not None else Label(())
        circuits = []
        self.circuit_table = {}  # (qubit, prep_pauli, meas_pauli, N) -> circuit
        lls = self.qubit_labels_list
        for q in self.qubit_labels_list:
            for prep_p in self.paulis:
                for meas_p in self.paulis:
                    for N in self.max_lengths:
                        layers = (_word_to_labels(_PREP_WORDS[prep_p], q)
                                  + [self.idle_label] * N
                                  + _word_to_labels(_MEAS_WORDS[meas_p], q))
                        c = Circuit(layers, lls)
                        self.circuit_table[(q, prep_p, meas_p, N)] = c
                        circuits.append(c)
        # dedupe
        seen, uniq = set(), []
        for c in circuits:
            if c not in seen:
                seen.add(c)
                uniq.append(c)
        super().__init__(uniq, qubit_labels)


class IdleTomographyResults(ProtocolResults):
    def __init__(self, data, protocol_instance, intrinsic_rates, observed_slopes):
        super().__init__(data, protocol_instance)
        self.intrinsic_rates = intrinsic_rates    # {qubit: {'H_X':.., 'S_X':..}}
        self.observed_slopes = observed_slopes

    def __str__(self):
        lines = ["Idle tomography intrinsic rates:"]
        for q, rates in self.intrinsic_rates.items():
            lines.append("  qubit %s: %s" % (q, {k: round(v, 5)
                                                 for k, v in rates.items()}))
        return "\n".join(lines)


class IdleTomography(Protocol):
    """Fit idle-error rates from IdleTomographyDesign data."""

    def __init__(self, name=None):
        super().__init__(name)

    def run(self, data, memlimit=None, comm=None):
        design = data.edesign
        ds = data.dataset
        qpos = {q: i for i, q in enumerate(design.qubit_labels_list)}

        def expectation(circ, qubit):
            """<Z-after-meas-rotation> on this qubit = +/- observable expectation."""
            row = ds[circ]
            total = row.total
            i = qpos[qubit]
            exp = 0.0
            for outcome, cnt in row.counts.items():
                bit = int(outcome[0][i])
                exp += (1 - 2 * bit) * cnt
            return exp / total if total > 0 else 0.0

        observed_slopes = collections.OrderedDict()
        intrinsic = collections.OrderedDict()
        Ns = np.array(design.max_lengths, dtype=float)
        for q in design.qubit_labels_list:
            slopes = {}
            for prep_p in design.paulis:
                for meas_p in design.paulis:
                    vals = [expectation(design.circuit_table[(q, prep_p, meas_p, N)], q)
                            for N in design.max_lengths]
                    slope = np.polyfit(Ns, vals, 1)[0] if len(Ns) > 1 else 0.0
                    slopes[(prep_p, meas_p)] = slope
            observed_slopes[q] = slopes
            # intrinsic rates (first order):
            #   stochastic S_P: decay of the P eigenstate's P-observable:
            #     d<P>/dN = -2 (sum of S rates not commuting with P)
            #   hamiltonian H_P: rotation between the other two observables:
            #     e.g. H_Z causes d<Y>/dN for X-prep (and -d<X>/dN for Y-prep)
            rates = {}
            for P in ('X', 'Y', 'Z'):
                rates['decay_%s' % P] = -slopes[(P, P)]
            rates['H_Z'] = 0.5 * (slopes[('X', 'Y')] - slopes[('Y', 'X')]) / 2.0
            rates['H_Y'] = 0.5 * (slopes[('Z', 'X')] - slopes[('X', 'Z')]) / 2.0
            rates['H_X'] = 0.5 * (slopes[('Y', 'Z')] - slopes[('Z', 'Y')]) / 2.0
            intrinsic[q] = rates
        return IdleTomographyResults(data, self, intrinsic, observed_slopes)
