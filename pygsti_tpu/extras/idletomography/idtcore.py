"""Idle tomography (reference: pygsti/extras/idletomography/idtcore.py,
3470 LoC).

Characterizes the idle operation's error generator: prepare Pauli
eigenstates, idle N times, measure Pauli observables; the slopes of
<observable> vs N are linear in the idle's intrinsic error rates.  The
reference inverts a combinatorially-constructed Jacobian
(hamiltonian/stochastic/affine_jac_element, idtcore.py:39-290); here the
same Jacobian is built NUMERICALLY from elementary error-generator
superoperators (design matrix M[(prep,meas), (type,P)] = d<meas>/dN under
rate (type,P)) and least-squares inverted -- the same estimator, with the
Pauli combinatorics replaced by dense linear algebra.

Intrinsic rates extracted per qubit: hamiltonian H_P, stochastic S_P and
affine A_P for P in {X,Y,Z} (9 rates from the 9 (prep,meas) slope
observations).  With ``maxweight=2``, weight-2 correlated stochastic rates
S_{PQ} are extracted per qubit pair from joint-parity decay slopes with the
weight-1 contributions subtracted (reference: maxweight=2 fidpairs,
idtcore.py:294 idle_tomography_fidpairs).
"""

from __future__ import annotations

import collections
import itertools

import numpy as np

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.protocols.protocol import ExperimentDesign, Protocol, ProtocolResults
from pygsti_tpu.tools.lindbladtools import create_elementary_errorgen


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

_PAULIS = {
    'I': np.eye(2, dtype=complex),
    'X': np.array([[0, 1], [1, 0]], dtype=complex),
    'Y': np.array([[0, -1j], [1j, 0]], dtype=complex),
    'Z': np.array([[1, 0], [0, -1]], dtype=complex),
}
_EIGENSTATES = {  # +1 eigenstate density matrices
    'X': 0.5 * (np.eye(2) + _PAULIS['X']),
    'Y': 0.5 * (np.eye(2) + _PAULIS['Y']),
    'Z': 0.5 * (np.eye(2) + _PAULIS['Z']),
}


def _word_to_labels(word, qubit):
    return [Label(g[0], qubit) for g in word]


def _affine_gen(p):
    """Affine elementary generator: rho -> tr(rho) * P (std superop)."""
    d = p.shape[0]
    return np.outer(p.reshape(-1), np.eye(d, dtype=complex).reshape(-1))


def _kron_pauli(letters):
    m = _PAULIS[letters[0]]
    for c in letters[1:]:
        m = np.kron(m, _PAULIS[c])
    return m


def _slope(L, rho, obs):
    """d<obs>/dN for error generator superop L (std basis): tr(obs L(rho))."""
    d = rho.shape[0]
    out = (L @ rho.reshape(-1)).reshape(d, d)
    return float(np.real(np.trace(obs @ out)))


def _weight1_design_matrix():
    """[9 obs, 9 rates] matrix: rows (prep,meas) in XYZ x XYZ order; cols
    (typ,P) for typ in H,S,A and P in X,Y,Z."""
    rows = []
    cols = [(t, P) for t in ('H', 'S', 'A') for P in 'XYZ']
    gens = {}
    for t, P in cols:
        if t == 'A':
            gens[(t, P)] = _affine_gen(_PAULIS[P])
        else:
            gens[(t, P)] = create_elementary_errorgen(t, _PAULIS[P])
    M = np.zeros((9, 9))
    for i, (prep, meas) in enumerate(itertools.product('XYZ', 'XYZ')):
        rho = _EIGENSTATES[prep]
        obs = _PAULIS[meas]
        for j, key in enumerate(cols):
            M[i, j] = _slope(gens[key], rho, obs)
    return M, cols


def _pair_observation_rows():
    """The 27 (prep-pair, observable) rows used for weight-2 analysis: for
    each same-basis prep (P,Q), the joint parity <P(x)Q> plus the two
    marginals <P(x)I> and <I(x)Q> (a weight-2 S rate never damps its own
    joint observable -- they commute -- so marginals are needed for an
    identifiable design)."""
    rows = []
    for p1, p2 in itertools.product('XYZ', 'XYZ'):
        rho = np.kron(_EIGENSTATES[p1], _EIGENSTATES[p2])
        rows.append(((p1, p2), 'joint', rho, _kron_pauli((p1, p2))))
        rows.append(((p1, p2), 'marg1', rho, _kron_pauli((p1, 'I'))))
        rows.append(((p1, p2), 'marg2', rho, _kron_pauli(('I', p2))))
    return rows


def _weight2_s_design_matrix():
    """[27 obs, 9 weight-2 S rates] over the _pair_observation_rows."""
    combos = list(itertools.product('XYZ', 'XYZ'))
    gens = {c: create_elementary_errorgen('S', _kron_pauli(c)) for c in combos}
    rows = _pair_observation_rows()
    M = np.zeros((len(rows), 9))
    for i, (_, _, rho, obs) in enumerate(rows):
        for j, c in enumerate(combos):
            M[i, j] = _slope(gens[c], rho, obs)
    return M, combos


def _embed_1local_superop(S1, which):
    """Embed a 1-qubit std-basis superop as acting on qubit `which` (0/1) of
    a 2-qubit system (identity on the other)."""
    out = np.zeros((16, 16), complex)
    for a in range(2):
        for b in range(2):
            for ap in range(2):
                for bp in range(2):
                    col = (a * 2 + b) * 4 + (ap * 2 + bp)
                    for x in range(2):
                        for xp in range(2):
                            if which == 0:
                                amp = S1[x * 2 + xp, a * 2 + ap]
                                row = (x * 2 + b) * 4 + (xp * 2 + bp)
                            else:
                                amp = S1[x * 2 + xp, b * 2 + bp]
                                row = (a * 2 + x) * 4 + (ap * 2 + xp)
                            out[row, col] += amp
    return out


def _joint_pair_design():
    """Joint design for one qubit pair: 45 observation rows x 27 unknowns
    [w1 rates on a (9), w1 rates on b (9), weight-2 S rates (9)].

    Rows: the 9 single-qubit (prep,meas) slopes for each of the two qubits
    (with the OTHER qubit idling in |0>, so correlated errors contribute --
    fitting jointly untangles weight-1 from weight-2 contributions, as the
    reference's global Jacobian inversion does) + the 27 pair rows.
    Returns (M [45,27], col_keys, row_specs)."""
    w1_cols = [(t, P) for t in ('H', 'S', 'A') for P in 'XYZ']
    w2_cols = list(itertools.product('XYZ', 'XYZ'))
    gens_1q = {}
    for t, P in w1_cols:
        gens_1q[(t, P)] = _affine_gen(_PAULIS[P]) if t == 'A' \
            else create_elementary_errorgen(t, _PAULIS[P])
    emb = {0: {k: _embed_1local_superop(g, 0) for k, g in gens_1q.items()},
           1: {k: _embed_1local_superop(g, 1) for k, g in gens_1q.items()}}
    gens_2q = {c: create_elementary_errorgen('S', _kron_pauli(c))
               for c in w2_cols}

    rho0 = _EIGENSTATES['Z']  # |0><0|
    row_specs = []  # ('single', which, prep, meas) or ('pair', kind, (p1,p2))
    rows = []       # (rho, obs)
    for which in (0, 1):
        for prep, meas in itertools.product('XYZ', 'XYZ'):
            if which == 0:
                rho = np.kron(_EIGENSTATES[prep], rho0)
                obs = _kron_pauli((meas, 'I'))
            else:
                rho = np.kron(rho0, _EIGENSTATES[prep])
                obs = _kron_pauli(('I', meas))
            row_specs.append(('single', which, prep, meas))
            rows.append((rho, obs))
    for (p1, p2), kind, rho, obs in _pair_observation_rows():
        row_specs.append(('pair', kind, (p1, p2)))
        rows.append((rho, obs))

    col_keys = [('a',) + k for k in w1_cols] + [('b',) + k for k in w1_cols] \
        + [('S', c) for c in w2_cols]
    M = np.zeros((len(rows), len(col_keys)))
    for i, (rho, obs) in enumerate(rows):
        j = 0
        for k in w1_cols:
            M[i, j] = _slope(emb[0][k], rho, obs)
            j += 1
        for k in w1_cols:
            M[i, j] = _slope(emb[1][k], rho, obs)
            j += 1
        for c in w2_cols:
            M[i, j] = _slope(gens_2q[c], rho, obs)
            j += 1
    return M, col_keys, row_specs


class IdleTomographyDesign(ExperimentDesign):
    """Pauli prep + idle^N + Pauli meas circuits, per qubit and (for
    maxweight=2) per qubit pair (reference: make_idle_tomography_list,
    idtcore.py:660)."""

    def __init__(self, qubit_labels, max_lengths=(0, 1, 2, 4, 8), paulis=('X', 'Y', 'Z'),
                 idle_label=None, maxweight=1):
        self.qubit_labels_list = tuple(qubit_labels)
        self.max_lengths = list(max_lengths)
        self.paulis = list(paulis)
        self.maxweight = maxweight
        self.idle_label = idle_label if idle_label is not None else Label(())
        circuits = []
        self.circuit_table = {}   # (qubit, prep, meas, N) -> circuit
        self.pair_table = {}      # ((q1,q2), (P,Q), N) -> circuit
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
        if maxweight >= 2 and len(self.qubit_labels_list) >= 2:
            for q1, q2 in itertools.combinations(self.qubit_labels_list, 2):
                for p1 in self.paulis:
                    for p2 in self.paulis:
                        for N in self.max_lengths:
                            layers = (_word_to_labels(_PREP_WORDS[p1], q1)
                                      + _word_to_labels(_PREP_WORDS[p2], q2)
                                      + [self.idle_label] * N
                                      + _word_to_labels(_MEAS_WORDS[p1], q1)
                                      + _word_to_labels(_MEAS_WORDS[p2], q2))
                            c = Circuit(layers, lls)
                            self.pair_table[((q1, q2), (p1, p2), N)] = c
                            circuits.append(c)
        # dedupe
        seen, uniq = set(), []
        for c in circuits:
            if c not in seen:
                seen.add(c)
                uniq.append(c)
        super().__init__(uniq, qubit_labels)


class IdleTomographyResults(ProtocolResults):
    def __init__(self, data, protocol_instance, intrinsic_rates, observed_slopes,
                 pair_rates=None):
        super().__init__(data, protocol_instance)
        self.intrinsic_rates = intrinsic_rates    # {qubit: {('H','X'):..}}
        self.observed_slopes = observed_slopes
        self.pair_rates = pair_rates or {}        # {(q1,q2): {('S',('X','X')):..}}

    def __str__(self):
        lines = ["Idle tomography intrinsic rates:"]
        for q, rates in self.intrinsic_rates.items():
            lines.append("  qubit %s: %s" % (q, {k: round(v, 5)
                                                 for k, v in rates.items()}))
        for pair, rates in self.pair_rates.items():
            big = {k: round(v, 5) for k, v in rates.items()
                   if abs(v) > 1e-4}
            lines.append("  pair %s correlated rates: %s" % (pair, big))
        return "\n".join(lines)


class IdleTomography(Protocol):
    """Fit intrinsic idle-error rates from IdleTomographyDesign data via
    least-squares inversion of the numerically-built rate->slope Jacobian
    (reference: do_idle_tomography, idtcore.py:1040)."""

    def __init__(self, name=None):
        super().__init__(name)

    def run(self, data, memlimit=None, comm=None):
        design = data.edesign
        ds = data.dataset
        qpos = {q: i for i, q in enumerate(design.qubit_labels_list)}
        Ns = np.array(design.max_lengths, dtype=float)

        def expectation(circ, qubits):
            """<Z...Z> parity over `qubits` after the meas rotations."""
            row = ds[circ]
            total = row.total
            idxs = [qpos[q] for q in qubits]
            exp = 0.0
            for outcome, cnt in row.counts.items():
                bits = outcome[0]
                par = sum(int(bits[i]) for i in idxs) % 2
                exp += (1 - 2 * par) * cnt
            return exp / total if total > 0 else 0.0

        def fit_slope(vals):
            return np.polyfit(Ns, vals, 1)[0] if len(Ns) > 1 else 0.0

        M1, cols1 = _weight1_design_matrix()
        observed_slopes = collections.OrderedDict()
        intrinsic = collections.OrderedDict()
        for q in design.qubit_labels_list:
            slopes = {}
            svec = np.zeros(9)
            for i, (prep_p, meas_p) in enumerate(
                    itertools.product('XYZ', 'XYZ')):
                vals = [expectation(design.circuit_table[(q, prep_p, meas_p, N)],
                                    (q,))
                        for N in design.max_lengths]
                slopes[(prep_p, meas_p)] = svec[i] = fit_slope(vals)
            observed_slopes[q] = slopes
            rates_vec, *_ = np.linalg.lstsq(M1, svec, rcond=None)
            rates = collections.OrderedDict(zip(cols1, rates_vec))
            # legacy convenience aliases
            for P in 'XYZ':
                rates['decay_%s' % P] = -slopes[(P, P)]
                rates['H_%s' % P] = rates[('H', P)]
                rates['S_%s' % P] = rates[('S', P)]
            intrinsic[q] = rates

        pair_rates = collections.OrderedDict()
        if getattr(design, 'pair_table', None):
            M2, col_keys, row_specs = _joint_pair_design()
            pairs = sorted({k[0] for k in design.pair_table})
            for pair in pairs:
                q1, q2 = pair
                svec = np.zeros(len(row_specs))
                for i, spec in enumerate(row_specs):
                    if spec[0] == 'single':
                        _, which, prep, meas = spec
                        q = pair[which]
                        vals = [expectation(
                            design.circuit_table[(q, prep, meas, N)], (q,))
                            for N in design.max_lengths]
                    else:
                        _, kind, (p1, p2) = spec
                        qubits = pair if kind == 'joint' else \
                            ((q1,) if kind == 'marg1' else (q2,))
                        vals = [expectation(
                            design.pair_table[(pair, (p1, p2), N)], qubits)
                            for N in design.max_lengths]
                    svec[i] = fit_slope(vals)
                rates_vec, *_ = np.linalg.lstsq(M2, svec, rcond=None)
                fitted = collections.OrderedDict(zip(col_keys, rates_vec))
                pair_rates[pair] = collections.OrderedDict(
                    (k, v) for k, v in fitted.items() if k[0] == 'S'
                    and isinstance(k[1], tuple))
        return IdleTomographyResults(data, self, intrinsic, observed_slopes,
                                     pair_rates)


def do_idle_tomography(nqubits, dataset, max_lengths, pauli_basis_dicts=None,
                       maxweight=2, idle_string=None, include_hamiltonian=True,
                       include_stochastic=True, include_affine=True,
                       advanced_options=None, verbosity=0):
    """One-call idle tomography analysis (reference:
    idtcore.do_idle_tomography:1040): build the design for `nqubits` /
    `max_lengths`, match it against `dataset`, and return the results
    object with extracted H/S/A error rates."""
    qubit_labels = list(range(nqubits)) if isinstance(nqubits, int) else list(nqubits)
    design = IdleTomographyDesign(qubit_labels, max_lengths,
                                  maxweight=maxweight)
    from pygsti_tpu.protocols.protocol import ProtocolData
    data = ProtocolData(design, dataset)
    return IdleTomography().run(data)
