"""Idle-tomography combinatorial helpers (reference:
pygsti/extras/idletomography/idttools.py)."""

from __future__ import annotations

import itertools

from pygsti_tpu.extras.idletomography.pauliobjs import (NQOutcome,
                                                        NQPauliState,
                                                        NQPauliOp)


def alloutcomes(prep, meas, maxweight):
    """Every "error bit string" a weight <= `maxweight` error could cause
    when preparing `prep` and measuring `meas` (same Pauli bases, possibly
    different signs) (reference: idttools.alloutcomes:26)."""
    if not (0 < maxweight <= 2):
        raise NotImplementedError("Only maxweight <= 2 is supported")
    assert prep.rep == meas.rep, "`prep` and `meas` must share a basis!"
    expected = NQOutcome(''.join(
        '0' if s1 == s2 else '1' for s1, s2 in zip(prep.signs, meas.signs)))
    n = len(prep)
    out = [expected.flip(i) for i in range(n)]
    if maxweight == 2:
        out += [expected.flip(i, j)
                for i in range(n) for j in range(i + 1, n)]
    return out


def allerrors(nqubits, maxweight):
    """All weight <= `maxweight` Pauli errors on `nqubits` qubits
    (reference: idttools.allerrors:57)."""
    if not (0 < maxweight <= 2):
        raise NotImplementedError("Only maxweight <= 2 is supported")
    out = [NQPauliOp.weight_1_pauli(nqubits, loc, p)
           for loc in range(nqubits) for p in range(3)]
    if maxweight == 2:
        out += [NQPauliOp.weight_2_pauli(nqubits, l1, l2, p1, p2)
                for l1 in range(nqubits) for l2 in range(l1 + 1, nqubits)
                for p1 in range(3) for p2 in range(3)]
    return out


def allobservables(meas, maxweight):
    """All weight <= `maxweight` observables extractable from the local
    Pauli measurement `meas` (always '+' sign) (reference:
    idttools.allobservables:80)."""
    if not (0 < maxweight <= 2):
        raise NotImplementedError("Only maxweight <= 2 is supported")
    full = NQPauliOp(meas.rep)
    out = [full.subpauli([i]) for i in range(len(meas))]
    if maxweight == 2:
        out += [full.subpauli([i, j])
                for i in range(len(meas)) for j in range(i + 1, len(meas))]
    return out


def tile_pauli_fidpairs(base_fidpairs, nqubits, maxweight):
    """Tile `maxweight`-qubit (prep, meas) NQPauliState pairs onto
    `nqubits` qubits via a k-coverage template so that every size-
    `maxweight` qubit subset experiences every base pair (reference:
    idttools.tile_pauli_fidpairs:107)."""
    from pygsti_tpu.circuits.cloudcircuitconstruction import \
        create_kcoverage_template
    tmpl = create_kcoverage_template(nqubits, maxweight)
    out = []
    seen = set()
    for base_prep, base_meas in base_fidpairs:
        for row in tmpl:
            prep = NQPauliState(''.join(base_prep.rep[i] for i in row),
                                [base_prep.signs[i] for i in row])
            meas = NQPauliState(''.join(base_meas.rep[i] for i in row),
                                [base_meas.signs[i] for i in row])
            key = (str(prep), tuple(prep.signs), str(meas), tuple(meas.signs))
            if key not in seen:
                seen.add(key)
                out.append((prep, meas))
    return out


def nontrivial_paulis(wt):
    """All length-`wt` tuples over {'X','Y','Z'} (reference:
    idttools.nontrivial_paulis:153)."""
    return list(itertools.product(('X', 'Y', 'Z'), repeat=wt))
