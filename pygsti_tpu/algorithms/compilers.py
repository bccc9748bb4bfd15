"""Clifford compilation: symplectic (s, p) -> native-gate circuits
(reference: pygsti/algorithms/compilers.py, 3119 LoC).

Strategy here: synthesize the symplectic matrix over the generator set
{H, P, CNOT} by symplectic Gaussian elimination, map those generators to
native-gate words found by BFS over the device's 1-qubit Clifford group,
then fix the phase vector with a final Pauli layer.  This produces exact
(s AND p) implementations, as required for computing ideal RB outcomes.
"""

from __future__ import annotations

import collections
import functools

import numpy as np

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.tools import symplectic as sym
from pygsti_tpu.tools import matrixmod2 as mod2


# ---------------------------------------------------------------------------
# Elementary-generator symplectic action (1-2 qubit, embedded on the fly)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _gen_sreps():
    from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
    std = standard_gatename_unitaries()
    return {
        'H': sym.unitary_to_symplectic(std['Gh']),
        'P': sym.unitary_to_symplectic(std['Gp']),
        'CNOT': sym.unitary_to_symplectic(std['Gcnot']),
        'X': sym.unitary_to_symplectic(std['Gxpi']),
        'Z': sym.unitary_to_symplectic(std['Gzpi']),
        'Y': sym.unitary_to_symplectic(std['Gypi']),
    }


def _apply_gen(s, p, gen, qubits, n):
    gs, gp = _gen_sreps()[gen]
    es, ep = sym.embed_clifford(gs, gp, qubits, n)
    return sym.compose_cliffords(s, p, es, ep)


def synthesize_symplectic(s_target):
    """Return a list of ('H'|'P'|'CNOT', qubits) generators whose product
    (first element acts first) has symplectic matrix `s_target` (phases
    unconstrained).

    Column-elimination algorithm: left-multiply r by generator symplectics
    until r = I, reducing the X_j / Z_j image columns of each qubit j in
    order.  Symplectic orthogonality with already-reduced columns guarantees
    each step only involves qubits >= j (standard tableau reduction; cf. the
    reference's compilers.py and Aaronson-Gottesman PRA 70, 052328).
    The recorded left-factors L_k...L_1 r = I give the circuit as the
    reversed inverses.
    """
    s_target = np.asarray(s_target) % 2
    n = s_target.shape[0] // 2
    r = s_target.copy()
    gates = []

    def lmul(gen, qubits):
        nonlocal r
        gs, _ = _gen_sreps()[gen]
        es, _ = sym.embed_clifford(gs, np.zeros(gs.shape[0], np.int64), qubits, n)
        r = mod2.dot_mod2(es, r)
        gates.append((gen, tuple(qubits)))

    def cz(j, k):
        lmul('H', (k,))
        lmul('CNOT', (j, k))
        lmul('H', (k,))

    for j in range(n):
        colx, colz = j, n + j
        # ---- reduce column colx (the X_j image) to e_j --------------------
        x = r[0:n, colx]
        z = r[n:2 * n, colx]
        if not np.any(x[j:]):
            k = next(k for k in range(j, n) if z[k])
            lmul('H', (k,))
        x = r[0:n, colx]
        if not x[j]:
            k = next(k for k in range(j + 1, n) if x[k])
            lmul('CNOT', (j, k))
            lmul('CNOT', (k, j))
            lmul('CNOT', (j, k))
        for k in range(n):
            if k != j and r[k, colx]:
                lmul('CNOT', (j, k))       # x_k += x_j : clears x[k]
        if r[n + j, colx]:
            lmul('P', (j,))                # z_j += x_j : clears z[j]
        for k in range(n):
            if k != j and r[n + k, colx]:
                cz(j, k)                   # z_k += x_j : clears z[k]
        # ---- reduce column colz (the Z_j image) to e_{n+j} ----------------
        # invariants now: colz has z[j] = 1 (symplectic product with e_j)
        for k in range(j + 1, n):
            if r[k, colz] and r[n + k, colz]:
                lmul('CNOT', (k, j))       # z_k += z_j : clears z[k]
            if r[k, colz]:
                lmul('H', (k,))            # swap x_k/z_k : x[k] -> z[k]
            if r[n + k, colz]:
                lmul('CNOT', (k, j))
        if r[j, colz]:
            # colz is Y_j-like; sqrt(X) = H P H fixes X_j, maps Y_j -> Z-type
            lmul('H', (j,))
            lmul('P', (j,))
            lmul('H', (j,))
        assert r[n + j, colz] == 1 and not r[j, colz]

    assert np.array_equal(r, np.identity(2 * n, np.int64)), \
        "Symplectic synthesis failed to reduce to identity"
    circuit_gates = []
    for gen, qubits in reversed(gates):
        if gen == 'P':
            circuit_gates.extend([('P', qubits)] * 3)  # P^-1 = P^3
        else:  # H, CNOT self-inverse
            circuit_gates.append((gen, qubits))
    return circuit_gates


# ---------------------------------------------------------------------------
# Native-gate word search
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _native_1q_words(native_gates):
    """BFS: map every 1-qubit Clifford (s,p) -> shortest word over the given
    native 1q gate names.  Returns dict[bytes_key] -> tuple of names."""
    from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
    std = standard_gatename_unitaries()
    sreps = {g: sym.unitary_to_symplectic(std[g]) for g in native_gates}

    def key(s, p):
        return s.tobytes() + bytes(p % 4)

    ident = (np.identity(2, np.int64), np.zeros(2, np.int64))
    words = {key(*ident): ()}
    frontier = [ident]
    while frontier:
        new_frontier = []
        for (s, p) in frontier:
            w = words[key(s, p)]
            for g, (gs, gp) in sreps.items():
                s2, p2 = sym.compose_cliffords(s, p, gs, gp)
                k2 = key(s2, p2)
                if k2 not in words:
                    words[k2] = w + (g,)
                    new_frontier.append((s2, p2))
        frontier = new_frontier
    return words


def compile_1q_clifford(s, p, native_gates=('Gxpi2', 'Gypi2'), qubit_label=0):
    """Shortest native word implementing the 1-qubit Clifford (s, p) exactly."""
    words = _native_1q_words(tuple(native_gates))
    k = s.astype(np.int64).tobytes() + bytes(np.asarray(p, np.int64) % 4)
    if k not in words:
        raise ValueError("Clifford not reachable with native gates %s" % (native_gates,))
    return [Label(g, qubit_label) for g in words[k]]


class CompilationRules(object):
    """Maps abstract generators (H, P, CNOT, Paulis) to native-gate circuits
    for a processor spec (minimal analogue of the reference's
    processors/compilationrules.py + modelpacks' clifford compilations)."""

    def __init__(self, pspec, one_q_gate_names=None):
        self.pspec = pspec
        names_1q = one_q_gate_names
        if names_1q is None:
            names_1q = [g for g in pspec.gate_names
                        if g not in ('{idle}', '(idle)') and pspec.gate_num_qubits(g) == 1]
        self.native_1q = tuple(names_1q)
        self.has_cnot = 'Gcnot' in pspec.gate_names
        self.has_cphase = 'Gcphase' in pspec.gate_names or 'Gcz' in pspec.gate_names

    def word_for_1q(self, gen_name, qubit):
        gs, gp = _gen_sreps()[gen_name]
        return compile_1q_clifford(gs, gp, self.native_1q, qubit)

    def word_for_cnot(self, control, target):
        if self.has_cnot:
            return [Label('Gcnot', (control, target))]
        if self.has_cphase:
            h = self.word_for_1q('H', target)
            return h + [Label('Gcphase', (control, target))] + h
        raise ValueError("Processor has no 2-qubit gate for CNOT compilation")


def compile_clifford(s, p, pspec=None, qubit_labels=None, compilation_rules=None):
    """Compile (s, p) into a Circuit of the processor's native gates
    implementing the Clifford exactly (reference: compilers.compile_clifford)."""
    n = s.shape[0] // 2
    if qubit_labels is None:
        qubit_labels = tuple(pspec.qubit_labels) if pspec is not None else tuple(range(n))
    rules = compilation_rules or CompilationRules(pspec)

    gen_gates = synthesize_symplectic(s)
    labels = []
    for gen, qubits in gen_gates:
        qlbls = tuple(qubit_labels[q] for q in qubits)
        if gen == 'CNOT':
            labels.extend(rules.word_for_cnot(qlbls[0], qlbls[1]))
        else:
            labels.extend(rules.word_for_1q(gen, qlbls[0]))

    circ = Circuit(labels, qubit_labels)
    # phase correction: find Pauli W with  target = W_after . circ
    s_c, p_c = sym.symplectic_rep_of_clifford_circuit(circ)
    assert np.array_equal(s_c, s % 2), "Symplectic synthesis bug"
    sc_inv, pc_inv = sym.inverse_clifford(s_c, p_c)
    s_d, p_d = sym.compose_cliffords(sc_inv, pc_inv, s, p)  # circ^-1 then target
    assert np.array_equal(s_d, np.identity(2 * n, np.int64)), "Pauli diff has s != I"
    # p_d describes a Pauli (possibly with global phase): P X_j P^-1 = (-1)^{zP_j} X_j
    # p_d[j] = 2 means Z on qubit j anticommutes...: choose Pauli with
    # x-part from p_d[n:] and z-part from p_d[:n]
    pauli_labels = []
    for j in range(n):
        zflip = (p_d[j] % 4) != 0       # X_j picks up sign => Pauli has Z_j
        xflip = (p_d[n + j] % 4) != 0   # Z_j picks up sign => Pauli has X_j
        q = qubit_labels[j]
        if xflip and zflip:
            pauli_labels.extend(_pauli_word(rules, 'Y', q))
        elif xflip:
            pauli_labels.extend(_pauli_word(rules, 'X', q))
        elif zflip:
            pauli_labels.extend(_pauli_word(rules, 'Z', q))
    if pauli_labels:
        circ = Circuit(list(circ.layertup) + pauli_labels, qubit_labels)
        s_c, p_c = sym.symplectic_rep_of_clifford_circuit(circ)
    assert np.array_equal(s_c, s % 2)
    assert np.array_equal(p_c % 4, np.asarray(p) % 4), \
        "Phase correction failed: %s vs %s" % (p_c, p)
    return circ


def _pauli_word(rules, pauli, qubit):
    gs, gp = _gen_sreps()[pauli]
    return compile_1q_clifford(gs, gp, rules.native_1q, qubit)
