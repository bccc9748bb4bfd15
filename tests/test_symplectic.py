"""Symplectic Clifford algebra tests: verify all formulas against direct
unitary conjugation, and parity vs the reference's implementation."""

import numpy as np
import pytest

from pygsti_tpu.tools import symplectic as sym
from pygsti_tpu.tools.internalgates import standard_gatename_unitaries


def _conj_check(u, s, p):
    """Check (s, p) correctly describes U W U^dag for all generators."""
    d = u.shape[0]
    n = int(round(np.log2(d)))
    for col in range(2 * n):
        x = np.zeros(n, np.int64)
        z = np.zeros(n, np.int64)
        if col < n:
            x[col] = 1
        else:
            z[col - n] = 1
        W = sym._pauli_matrix_from_vec(x, z)
        expected = u @ W @ u.conj().T
        xp = s[0:n, col]
        zp = s[n:2 * n, col]
        Wp = sym._pauli_matrix_from_vec(xp, zp)
        got = (1j) ** int(p[col]) * Wp
        assert np.allclose(expected, got, atol=1e-8), "col %d mismatch" % col


class TestSymplecticBasics:
    @pytest.mark.parametrize("name", ['Gxpi2', 'Gypi2', 'Gzpi2', 'Gh', 'Gp',
                                      'Gxpi', 'Gcnot', 'Gcphase', 'Gswap'])
    def test_unitary_to_symplectic_roundtrip(self, name):
        u = standard_gatename_unitaries()[name]
        s, p = sym.unitary_to_symplectic(u)
        assert sym.check_valid_clifford(s, p)
        _conj_check(u, s, p)

    def test_compose_matches_unitary(self):
        std = standard_gatename_unitaries()
        for n1, n2 in [('Gxpi2', 'Gypi2'), ('Gh', 'Gp'), ('Gzpi2', 'Gh')]:
            u1, u2 = std[n1], std[n2]
            s1, p1 = sym.unitary_to_symplectic(u1)
            s2, p2 = sym.unitary_to_symplectic(u2)
            s, p = sym.compose_cliffords(s1, p1, s2, p2)
            _conj_check(u2 @ u1, s, p)

    def test_compose_2q(self):
        std = standard_gatename_unitaries()
        u1 = np.kron(std['Gh'], std['Gp'])
        u2 = std['Gcnot']
        s1, p1 = sym.unitary_to_symplectic(u1)
        s2, p2 = sym.unitary_to_symplectic(u2)
        s, p = sym.compose_cliffords(s1, p1, s2, p2)
        _conj_check(u2 @ u1, s, p)

    def test_inverse(self):
        std = standard_gatename_unitaries()
        for name in ['Gxpi2', 'Gh', 'Gp', 'Gcnot']:
            s, p = sym.unitary_to_symplectic(std[name])
            sinv, pinv = sym.inverse_clifford(s, p)
            sc, pc = sym.compose_cliffords(s, p, sinv, pinv)
            assert np.array_equal(sc, np.identity(s.shape[0], np.int64))
            assert np.array_equal(pc, np.zeros(s.shape[0], np.int64))

    def test_kron(self):
        std = standard_gatename_unitaries()
        sp1 = sym.unitary_to_symplectic(std['Gh'])
        sp2 = sym.unitary_to_symplectic(std['Gp'])
        s, p = sym.symplectic_kronecker([sp1, sp2])
        _conj_check(np.kron(std['Gh'], std['Gp']), s, p)


class TestStabilizerStates:
    def test_prep_and_measure(self):
        s, p = sym.prep_stabilizer_state(2, [0, 1])
        bits = sym.measure_all_qubits_deterministic(s, p)
        assert bits == (0, 1)

    def test_x_flips(self):
        std = standard_gatename_unitaries()
        s_x, p_x = sym.unitary_to_symplectic(std['Gxpi'])
        st_s, st_p = sym.prep_stabilizer_state(1, [0])
        out_s, out_p = sym.apply_clifford_to_stabilizer_state(s_x, p_x, st_s, st_p)
        assert sym.measure_all_qubits_deterministic(out_s, out_p) == (1,)

    def test_cnot_entangles_and_computes(self):
        std = standard_gatename_unitaries()
        n = 2
        s_x, p_x = sym.unitary_to_symplectic(np.kron(std['Gxpi'], np.eye(2)))
        s_cn, p_cn = sym.unitary_to_symplectic(std['Gcnot'])
        st = sym.prep_stabilizer_state(2, [0, 0])
        st = sym.apply_clifford_to_stabilizer_state(s_x, p_x, *st)
        st = sym.apply_clifford_to_stabilizer_state(s_cn, p_cn, *st)
        assert sym.measure_all_qubits_deterministic(*st) == (1, 1)

    def test_hadamard_random_outcome(self):
        std = standard_gatename_unitaries()
        s_h, p_h = sym.unitary_to_symplectic(std['Gh'])
        st = sym.prep_stabilizer_state(1, [0])
        st = sym.apply_clifford_to_stabilizer_state(s_h, p_h, *st)
        p0, det = sym.pauli_z_measurement_probability(st[0], st[1], 0)
        assert not det and p0 == 0.5

    def test_random_circuit_outcome_vs_statevector(self):
        """Propagate a random Clifford circuit both symplectically and with
        dense unitaries; compare the final computational outcome."""
        rng = np.random.RandomState(42)
        std = standard_gatename_unitaries()
        names_1q = ['Gxpi2', 'Gypi2', 'Gh', 'Gp', 'Gxpi', 'Gzpi']
        n = 2
        for trial in range(5):
            u_total = np.eye(4, dtype=complex)
            st = sym.prep_stabilizer_state(n, [0, 0])
            for _ in range(8):
                if rng.rand() < 0.3:
                    u = std['Gcnot']
                else:
                    g1 = std[names_1q[rng.randint(len(names_1q))]]
                    g2 = std[names_1q[rng.randint(len(names_1q))]]
                    u = np.kron(g1, g2)
                sp = sym.unitary_to_symplectic(u)
                st = sym.apply_clifford_to_stabilizer_state(sp[0], sp[1], *st)
                u_total = u @ u_total
            # dense probabilities
            psi = u_total[:, 0]
            probs = np.abs(psi) ** 2
            for a in range(n):
                p0_sym, det = sym.pauli_z_measurement_probability(st[0], st[1], a)
                # marginal prob qubit a = 0
                mask = np.array([(i >> (n - 1 - a)) & 1 == 0 for i in range(2 ** n)])
                p0_dense = probs[mask].sum()
                assert np.isclose(p0_sym, p0_dense, atol=1e-8), \
                    "trial %d qubit %d: %g vs %g" % (trial, a, p0_sym, p0_dense)


class TestRandomSampling:
    def test_random_symplectic_valid(self):
        rng = np.random.RandomState(7)
        for n in (1, 2, 3):
            for _ in range(5):
                s = sym.random_symplectic_matrix(n, rand_state=rng)
                assert sym.check_symplectic(s), "invalid symplectic for n=%d" % n

    def test_random_clifford_valid(self):
        rng = np.random.RandomState(11)
        for n in (1, 2):
            for _ in range(5):
                s, p = sym.random_clifford(n, rand_state=rng)
                assert sym.check_valid_clifford(s, p)


class TestReferenceParity:
    def test_internal_sreps_match(self, ref_pygsti):
        ref_sreps = ref_pygsti.tools.symplectic.compute_internal_gate_symplectic_representations()
        my_sreps = sym.compute_internal_gate_symplectic_representations()
        for name in ['Gxpi2', 'Gypi2', 'Gzpi2', 'Gh', 'Gp', 'Gcnot', 'Gcphase',
                     'Gc3', 'Gc12', 'Gc16']:
            if name not in ref_sreps or name not in my_sreps:
                continue
            rs, rp = ref_sreps[name]
            ms, mp = my_sreps[name]
            assert np.array_equal(rs, ms), "s mismatch for %s" % name
            assert np.array_equal(rp % 4, mp % 4), "p mismatch for %s" % name


class TestReferenceSurfaceParity:
    """The public Koenig-Smolin / Pauli-bookkeeping helpers agree with the
    reference implementations (tools/symplectic.py:315-2150)."""

    def test_ks_enumeration_matches_reference(self, ref_pygsti):
        from pygsti.tools import symplectic as rsym
        import pygsti_tpu.tools.symplectic as sym
        rng = np.random.RandomState(4)
        for n in (1, 2, 3):
            total = sym.compute_num_symplectics(n)
            assert total == rsym.compute_num_symplectics(n)
            assert sym.compute_num_cliffords(n) == rsym.compute_num_cliffords(n)
            assert sym.compute_num_cosets(n) == rsym.compute_num_cosets(n)
            for _ in range(8):
                i = int(rng.randint(0, min(total, 2 ** 31 - 1)))
                g_mine = sym.compute_symplectic_matrix(i, n)
                g_ref = rsym.compute_symplectic_matrix(i, n)
                assert np.array_equal(g_mine % 2, np.asarray(g_ref) % 2), (n, i)
                # label inverts the enumeration
                assert sym.compute_symplectic_label(g_mine, n) == i
                assert rsym.compute_symplectic_label(g_mine.astype('int8'),
                                                     n) == i

    def test_convention_change_round_trip(self, ref_pygsti):
        from pygsti.tools import symplectic as rsym
        import pygsti_tpu.tools.symplectic as sym
        rng = np.random.RandomState(5)
        for n in (1, 2, 3):
            s = sym.random_symplectic_matrix(n, rand_state=rng)
            ds = sym.change_symplectic_form_convention(s, 'directsum')
            rds = rsym.change_symplectic_form_convention(s, 'directsum')
            assert np.array_equal(ds, np.asarray(rds))
            back = sym.change_symplectic_form_convention(ds, 'standard')
            assert np.array_equal(back, s)

    def test_pauli_layers_match_reference(self, ref_pygsti):
        from pygsti.tools import symplectic as rsym
        import pygsti_tpu.tools.symplectic as sym
        rng = np.random.RandomState(6)
        for n in (1, 2, 3):
            s, p_impl = sym.random_clifford(n, rand_state=rng)
            p_tgt = sym.construct_valid_phase_vector(
                s, 2 * rng.randint(0, 2, size=2 * n))
            for fn, rfn in [(sym.find_postmultipled_pauli,
                             rsym.find_postmultipled_pauli),
                            (sym.find_premultipled_pauli,
                             rsym.find_premultipled_pauli)]:
                mine = fn(s, p_impl, p_tgt)
                ref = rfn(s, p_impl, p_tgt)
                assert mine == list(ref), (mine, ref)
            pv = np.asarray(p_tgt)
            assert sym.find_pauli_number(pv) == rsym.find_pauli_number(pv)
            assert sym.bitstring_for_pauli(pv.copy()) == \
                rsym.bitstring_for_pauli(pv.copy())

    def test_group_relations_match_reference(self, ref_pygsti):
        from pygsti.tools import symplectic as rsym
        import pygsti_tpu.tools.symplectic as sym
        assert sym.one_q_clifford_symplectic_group_relations() == \
            rsym.one_q_clifford_symplectic_group_relations()

    def test_apply_internal_gate_matches_reference(self, ref_pygsti):
        from pygsti.tools import symplectic as rsym
        import pygsti_tpu.tools.symplectic as sym
        rng = np.random.RandomState(7)
        for gate, nq in [('H', 1), ('P', 1), ('CNOT', 2), ('SWAP', 2)]:
            for optype in ('row', 'column'):
                s0 = sym.random_symplectic_matrix(3, rand_state=rng)
                qi = list(rng.choice(3, nq, replace=False))
                mine = s0.copy()
                sym.apply_internal_gate_to_symplectic(mine, gate, qi, optype)
                ref = s0.copy()
                rsym.apply_internal_gate_to_symplectic(ref, gate, qi, optype)
                assert np.array_equal(mine, ref), (gate, optype)

    def test_unitary_is_clifford(self):
        import pygsti_tpu.tools.symplectic as sym
        from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
        U = standard_gatename_unitaries()
        assert sym.unitary_is_clifford(U['Gh'])
        assert sym.unitary_is_clifford(U['Gcnot'])
        assert not sym.unitary_is_clifford(U['Gtpi8']
                                           if 'Gtpi8' in U else U['Gt'])

    def test_stabilizer_measurement_prob(self):
        import pygsti_tpu.tools.symplectic as sym
        # |0> state: P(0) = 1
        s, p = sym.prep_stabilizer_state(2)
        assert abs(sym.stabilizer_measurement_prob((s, p), [0, 0]) - 1) < 1e-12
        assert sym.stabilizer_measurement_prob((s, p), [1, 0]) == 0.0
        # H on qubit 0 -> uniform over first bit
        srep = sym.compute_internal_gate_symplectic_representations()
        hs, hp = srep['H']
        es, ep = sym.embed_clifford(hs, hp, [0], 2)
        s2, p2 = sym.apply_clifford_to_stabilizer_state(es, ep, s, p)
        pr, st = sym.stabilizer_measurement_prob((s2, p2), [1, 0],
                                                 return_state=True)
        assert abs(pr - 0.5) < 1e-12
        # colsum/colsum_acc keep the frame valid
        sc, pc = sym.prep_stabilizer_state(2)
        sym.colsum(0, 1, sc, pc, 2)
        acc_s, acc_p = sc[:, 0].copy(), np.array([pc[0]])
        sym.colsum_acc(acc_s, acc_p, 1, sc, pc, 2)
