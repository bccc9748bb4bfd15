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
    if pspec is None and compilation_rules is None:
        # no processor: compile over the internal H/P/CNOT gate set
        from pygsti_tpu.processors.processorspec import QubitProcessorSpec
        pspec = QubitProcessorSpec(n, ['Gh', 'Gp', 'Gcnot'],
                                   geometry='fully_connected',
                                   qubit_labels=qubit_labels)
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


# =============================================================================
# Reference-named compilation entry points (reference: compilers.py).
# =============================================================================

def _gates_to_circuit(gen_gates, pspec, qubit_labels, rules=None, n=None):
    """Generator-name gate list -> Circuit (native gates when a pspec /
    rules is given, internal Gh/Gp/Gcnot labels otherwise).  `n` fixes the
    qubit count (an identity synthesis has NO gates, so the gate list alone
    cannot determine the width)."""
    from pygsti_tpu.baseobjs.label import Label
    if n is None:
        n = 1 + max((max(q) for _, q in gen_gates), default=0)
    if qubit_labels is None:
        qubit_labels = tuple(pspec.qubit_labels) if pspec is not None \
            else tuple(range(n))
    if pspec is not None or rules is not None:
        rules = rules or CompilationRules(pspec)
        labels = []
        for gen, qubits in gen_gates:
            qlbls = tuple(qubit_labels[q] for q in qubits)
            if gen == 'CNOT':
                labels.extend(rules.word_for_cnot(qlbls[0], qlbls[1]))
            else:
                labels.extend(rules.word_for_1q(gen, qlbls[0]))
    else:
        name_map = {'H': 'Gh', 'P': 'Gp', 'CNOT': 'Gcnot'}
        labels = [Label(name_map[gen], tuple(qubit_labels[q] for q in qubits))
                  for gen, qubits in gen_gates]
    return Circuit(labels, qubit_labels)


def compile_symplectic(s, pspec=None, absolute_compilation=None,
                       paulieq_compilation=None, qubit_labels=None,
                       iterations=20, algorithms=('ROCAGE',),
                       costfunction='2QGC:10:depth:1', paulirandomize=False,
                       aargs=None, check=True, rand_state=None):
    """A circuit implementing the Clifford with symplectic matrix `s`, up
    to Paulis (reference: compilers.compile_symplectic).  Uses the
    column-elimination tableau synthesis (Aaronson-Gottesman); native gates
    when `pspec` is given, internal Gh/Gp/Gcnot labels otherwise."""
    gen_gates = synthesize_symplectic(np.asarray(s) % 2)
    circ = _gates_to_circuit(gen_gates, pspec, qubit_labels,
                             rules=absolute_compilation
                             if isinstance(absolute_compilation,
                                           CompilationRules) else None,
                             n=np.asarray(s).shape[0] // 2)
    if check:
        s_c, _ = sym.symplectic_rep_of_clifford_circuit(circ)
        assert np.array_equal(s_c, np.asarray(s) % 2), \
            "compile_symplectic synthesis check failed"
    return circ


def compile_cnot_circuit(s, pspec=None, compilation=None, qubit_labels=None,
                         algorithm='COiCAGE', compile_to_native=False,
                         check=True, aargs=None, rand_state=None):
    """A CNOT circuit implementing the invertible GF(2) matrix encoded in
    `s` (reference: compilers.compile_cnot_circuit).  `s` may be the [n, n]
    GF(2) matrix itself or the symplectic rep of a CNOT circuit (whose
    upper-left block is taken).  Synthesized by Gaussian elimination."""
    s = np.asarray(s) % 2
    n = s.shape[0] // 2 if s.shape[0] % 2 == 0 and s.shape[0] == s.shape[1] \
        and s.shape[0] > 2 and np.array_equal(
            s[:s.shape[0] // 2, s.shape[0] // 2:],
            np.zeros((s.shape[0] // 2,) * 2, s.dtype)) else None
    M = s[:n, :n].copy() if n is not None else s.copy()
    n = M.shape[0]
    # Gaussian elimination: CNOT(c, t) adds row c to row t (x-propagation)
    ops = []
    A = M.copy()
    for j in range(n):
        if not A[j, j]:
            pivots = [k for k in range(j + 1, n) if A[k, j]]
            if not pivots:
                raise AssertionError(
                    "CNOT-circuit matrix is not invertible over GF(2)")
            k = pivots[0]
            A[j, :] ^= A[k, :]
            ops.append(('CNOT', (k, j)))
        for k in range(n):
            if k != j and A[k, j]:
                A[k, :] ^= A[j, :]
                ops.append(('CNOT', (j, k)))
    assert np.array_equal(A, np.eye(n, dtype=A.dtype)), \
        "CNOT-circuit matrix is not invertible over GF(2)"
    # ops reduce M to I (left-multiplying row ops); the circuit implementing
    # M applies them reversed (all CNOTs are self-inverse)
    gen_gates = list(reversed(ops))
    circ = _gates_to_circuit(gen_gates,
                             pspec if compile_to_native else None,
                             qubit_labels, n=n)
    if check:
        s_c, _ = sym.symplectic_rep_of_clifford_circuit(
            circ, srep_dict=sym.compute_internal_gate_symplectic_representations())
        assert np.array_equal(s_c[:n, :n] % 2, M), \
            "compile_cnot_circuit synthesis check failed"
    return circ


def compile_stabilizer_state(s, p, pspec=None, absolute_compilation=None,
                             paulieq_compilation=None, qubit_labels=None,
                             iterations=20, paulirandomize=False,
                             algorithm='COiCAGE', aargs=None, costfunction=None,
                             rand_state=None):
    """A circuit preparing the stabilizer state U|0...0> where U is the
    Clifford (s, p) (reference: compilers.compile_stabilizer_state).
    Compiles the full Clifford -- correct though not depth-minimal (the
    reference exploits the state's stabilizer-group freedom)."""
    return compile_clifford(np.asarray(s), np.asarray(p), pspec,
                            qubit_labels=qubit_labels,
                            compilation_rules=absolute_compilation
                            if isinstance(absolute_compilation,
                                          CompilationRules) else None)


def compile_stabilizer_measurement(s, p, pspec=None,
                                   absolute_compilation=None,
                                   paulieq_compilation=None,
                                   qubit_labels=None, iterations=20,
                                   paulirandomize=False, algorithm='COiCAGE',
                                   aargs=None, costfunction=None,
                                   rand_state=None):
    """A circuit rotating the stabilizer state U|0...0> back to the
    computational basis -- i.e. implementing U^{-1} (reference:
    compilers.compile_stabilizer_measurement)."""
    s_inv, p_inv = sym.inverse_clifford(np.asarray(s), np.asarray(p))
    return compile_clifford(s_inv, p_inv, pspec, qubit_labels=qubit_labels,
                            compilation_rules=absolute_compilation
                            if isinstance(absolute_compilation,
                                          CompilationRules) else None)


# ---------------------------------------------------------------------------
# Conditional-symplectic compilation (reference: compilers.py:2523-3119).
# Core of short-form stabilizer-state compilation: build a circuit whose
# symplectic rep matches the RIGHT half of a target s, which is all that
# matters when acting on |0..0>.
# ---------------------------------------------------------------------------

def _quad_origin(position, n):
    """(row_start, col_start) of an n x n quadrant of a 2n x 2n matrix."""
    return {'UL': (0, 0), 'UR': (0, n),
            'LL': (n, 0), 'LR': (n, n)}[position]


def _cnot_for_quadrant_add(src, dst, optype, position, n):
    """The CNOT (control, target) whose `optype` action on a 2n x 2n
    symplectic adds row/column `src` into `dst` WITHIN the given quadrant.

    Row-action CNOT(c,t): row t ^= row c (top half), row c+n ^= row t+n
    (bottom half).  Column-action CNOT(c,t): col c ^= col t (left half),
    col t+n ^= col c+n (right half)."""
    rs, cs = _quad_origin(position, n)
    if optype == 'row':
        return (src, dst) if rs == 0 else (dst, src)
    return (dst, src) if cs == 0 else (src, dst)


def _submatrix_gauss_jordan_cnots(s, optype, position, qubit_labels):
    """Map one quadrant of `s` to the identity using CNOT row/column
    operations (GF(2) Gauss-Jordan).  Returns (sout, instructions, success);
    instructions are Labels in the order the operations were applied to
    `s`, and None when the quadrant is singular (success False).

    The reference's equivalent (compilers.py:2523) returns its column-op
    lists pre-reversed into before-the-unitary circuit order; here applied
    order is always returned and callers do any reordering."""
    n = s.shape[0] // 2
    sout = s.copy()
    rs, cs = _quad_origin(position, n)
    quad = lambda: sout[rs:rs + n, cs:cs + n]
    instructions = []

    def add(src, dst):
        pair = _cnot_for_quadrant_add(src, dst, optype, position, n)
        sym.apply_internal_gate_to_symplectic(sout, 'CNOT', pair,
                                              optype=optype)
        instructions.append(Label('CNOT', (qubit_labels[pair[0]],
                                           qubit_labels[pair[1]])))

    for k in range(n):
        q = quad()
        if optype == 'row':
            if q[k, k] == 0:
                pivots = [m for m in range(k + 1, n) if q[m, k] == 1]
                if not pivots:
                    return sout, None, False
                add(pivots[0], k)
            q = quad()
            for m in range(n):
                if m != k and q[m, k] == 1:
                    add(k, m)
        else:
            if q[k, k] == 0:
                pivots = [m for m in range(k + 1, n) if q[k, m] == 1]
                if not pivots:
                    return sout, None, False
                add(pivots[0], k)
            q = quad()
            for m in range(n):
                if m != k and q[k, m] == 1:
                    add(k, m)
    return sout, instructions, True


def _make_submatrix_invertible_using_hadamards(s, optype, position,
                                               qubit_labels,
                                               rand_state=None):
    """Apply `optype`-action Hadamards on a subset of qubits until the
    given quadrant of `s` is invertible over GF(2) (reference:
    compilers.py:2619; randomized, as there).  Returns (sout, h_labels)."""
    n = s.shape[0] // 2
    rng = rand_state if rand_state is not None else np.random.RandomState()
    sout = s.copy()
    rs, cs = _quad_origin(position, n)
    h_set = set()
    for iteration in range(10 * n + 101):
        if mod2.rank_mod2(sout[rs:rs + n, cs:cs + n]) == n:
            return sout, [Label('H', qubit_labels[i]) for i in sorted(h_set)]
        hq = rng.randint(n)
        sym.apply_internal_gate_to_symplectic(sout, 'H', (hq,),
                                              optype=optype)
        h_set.symmetric_difference_update({hq})
    raise ValueError("Randomized Hadamard search failed -- the input is "
                     "likely not symplectic.")


def _make_submatrix_invertible_using_phases(s, optype, position,
                                            qubit_labels):
    """Apply `optype`-action phase gates to make the given quadrant of `s`
    invertible, exploiting that the adjacent quadrant (above for row ops,
    to the right for column ops) is the identity so that P on qubit i adds
    e_i into row/column i of the target quadrant (reference:
    compilers.py:2697).  Returns (sout, p_labels)."""
    n = s.shape[0] // 2
    sout = s.copy()
    rs, cs = _quad_origin(position, n)
    if optype == 'row':
        assert position in ('LL', 'LR'), \
            "Row-action phases require a lower quadrant"
    else:
        assert position in ('UL', 'LL'), \
            "Column-action phases require a left quadrant"
    work = sout[rs:rs + n, cs:cs + n].copy()
    instructions = []
    for i in range(n):
        if work[i, i] != 1:
            sym.apply_internal_gate_to_symplectic(sout, 'P', (i,),
                                                  optype=optype)
            instructions.append(Label('P', qubit_labels[i]))
            work[i, i] ^= 1
        # eliminate below/right of the pivot in the scratch copy only
        if optype == 'row':
            for j in range(i + 1, n):
                if work[j, i] == 1:
                    work[j, :] ^= work[i, :]
        else:
            for j in range(i + 1, n):
                if work[i, j] == 1:
                    work[:, j] ^= work[:, i]
    return sout, instructions


def find_albert_factorization_transform_using_cnots(s, optype, position,
                                                    qubit_labels,
                                                    rand_state=None):
    """Given a symmetric invertible quadrant D of `s`, find invertible M
    with D = M M^T (Albert factorization) and apply a CNOT circuit mapping
    that quadrant D -> M^T (row action) or D -> M (column action)
    (reference: compilers.py:2782).  Returns (sout, cnot_labels) with the
    labels in applied order; does not modify `s`."""
    n = s.shape[0] // 2
    rs, cs = _quad_origin(position, n)
    D = s[rs:rs + n, cs:cs + n].copy()
    assert np.array_equal(D, D.T), \
        "The quadrant to Albert-factorize must be symmetric!"
    M = mod2.albert_factor(D, rand_state=rand_state)
    sout = s.copy()
    # Substitute the factor so Gauss-Jordan drives it to I; the recorded
    # operations E then satisfy E . M = I (row) / M^T . E = I (column), so
    # the true quadrant D = M M^T maps to E . D = M^T (resp. D . E = M).
    sout[rs:rs + n, cs:cs + n] = M if optype == 'row' else M.T
    sout, instructions, success = _submatrix_gauss_jordan_cnots(
        sout, optype, position, qubit_labels)
    assert success, "Albert factor was not invertible -- internal error"
    sout[rs:rs + n, cs:cs + n] = M.T if optype == 'row' else M
    return sout, instructions


def compile_conditional_symplectic(s, pspec=None, qubit_labels=None,
                                   calg='COiCAGE', cargs=None, check=True,
                                   rand_state=None):
    """Find circuits (C2, C1) such that C1 is a CNOT circuit, C2 has the
    form 1Q-gates -- CNOTs -- 1Q-gates, and the symplectic rep of C1
    followed by C2 has the same RIGHT half as `s` -- so C2 alone prepares
    the same stabilizer state from |0..0> (up to Paulis) as any Clifford
    with rep (s, p) (reference: compilers.compile_conditional_symplectic:
    2951).  Returns (circuit, precircuit)."""
    n = s.shape[0] // 2
    if qubit_labels is not None:
        assert len(qubit_labels) == n, \
            "qubit_labels length inconsistent with the size of s"
        qubits = list(qubit_labels)
    else:
        assert pspec is not None and len(pspec.qubit_labels) == n, \
            "Need qubit_labels when s covers a subset of pspec's qubits"
        qubits = list(pspec.qubit_labels)
    rng = rand_state if rand_state is not None else np.random.RandomState()

    sout = np.asarray(s).copy()
    # 1. row Hadamards -> UR invertible
    sout, h_some = _make_submatrix_invertible_using_hadamards(
        sout, 'row', 'UR', qubits, rand_state=rng)
    # 2. column CNOTs -> UR = I
    cnots_rhs1 = []
    if n > 1:
        sout, cnots_rhs1, ok = _submatrix_gauss_jordan_cnots(
            sout, 'column', 'UR', qubits)
        assert ok, "UR Gaussian elimination failed -- input not symplectic?"
    # 3. row phases -> LR invertible (UR = I enables the e_i trick)
    sout, p_some = _make_submatrix_invertible_using_phases(
        sout, 'row', 'LR', qubits)
    # 4. row CNOTs via Albert factorization -> UR = LR = M
    cnots_row = []
    cnots_rhs2 = []
    if n > 1:
        sout, cnots_row = find_albert_factorization_transform_using_cnots(
            sout, 'row', 'LR', qubits, rand_state=rng)
        # 5. column CNOTs -> UR = LR = I
        sout, cnots_rhs2, ok = _submatrix_gauss_jordan_cnots(
            sout, 'column', 'UR', qubits)
        assert ok, "Final Gaussian elimination failed"
    # 6. row phases on every qubit -> LR = 0 (adds UR = I into LR = I)
    sout[n:, :] ^= sout[:n, :]
    p_all = [Label('P', q) for q in qubits]
    # 7. row Hadamards on every qubit -> swap halves (UR = 0, LR = I)
    sout = np.concatenate((sout[n:, :], sout[:n, :]), axis=0)
    h_all = [Label('H', q) for q in qubits]

    # The main circuit implements the INVERSE of the accumulated row
    # operations: time order Hall, Pall, reversed row CNOTs, Psome, Hsome
    # (H/P symplectic actions are involutions; each CNOT is self-inverse so
    # reversing the applied-order list inverts the product).
    layers = []
    layers.append(h_all)
    layers.append(p_all)
    mid_cnots = list(reversed(cnots_row))
    if mid_cnots and calg != 'BGE' and pspec is not None:
        # optionally recompile the CNOT block with a smarter CNOT compiler
        cnot_s, _ = sym.symplectic_rep_of_clifford_circuit(
            Circuit([[c] for c in mid_cnots], qubits))
        try:
            recompiled = compile_cnot_circuit(
                cnot_s, pspec, qubit_labels=qubits, algorithm=calg,
                compile_to_native=False, check=True,
                aargs=(cargs or []), rand_state=rng)
            mid_cnots = [lbl for layer in recompiled.layertup
                         for lbl in (layer.components
                                     if not layer.is_simple else (layer,))]
        except Exception:
            pass  # keep the Gaussian-elimination CNOT list
    layers.extend([[c] for c in mid_cnots])
    if p_some:
        layers.append(p_some)
    if h_some:
        layers.append(h_some)
    circuit = Circuit(layers, qubits)

    # The pre-circuit inverts the column operations: time order = applied
    # order (right-multiplication composes in reverse of circuit time).
    pre_layers = [[c] for c in cnots_rhs1 + cnots_rhs2]
    precircuit = Circuit(pre_layers, qubits)

    if check:
        both = Circuit(list(precircuit.layertup) + list(circuit.layertup),
                       qubits)
        scheck, _ = sym.symplectic_rep_of_clifford_circuit(both)
        assert np.array_equal(scheck[:, n:], np.asarray(s)[:, n:]), \
            "compile_conditional_symplectic failed its self-check!"
    return circuit, precircuit
