"""Tests for randomized compilation (Pauli twirling) on U3-CX circuits."""

import numpy as np
import pytest

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.processors.random_compilation import (
    RandomCompilation, pauli_randomize_circuit, randomize_central_pauli,
    u3_unitary, u3_angles_from_unitary, inverse_u3, _PAULIS)


def _simulate(circ, n):
    U = np.eye(2 ** n, dtype=complex)
    for i in range(circ.depth):
        lbl = circ.layertup[i]
        comps = lbl.components if not lbl.is_simple else (lbl,)
        L = np.eye(2 ** n, dtype=complex)
        for g in comps:
            if g.name == 'Gu3':
                u = u3_unitary(*(float(a) for a in g.args))
                q = circ.line_labels.index(g.sslbls[0])
                ops = [np.eye(2)] * n
                ops[q] = u
                m = ops[0]
                for o in ops[1:]:
                    m = np.kron(m, o)
                L = m @ L
            elif g.name == 'Gcnot':
                cn = np.eye(4)
                cn[2:, 2:] = [[0, 1], [1, 0]]
                L = cn @ L
        U = L @ U
    return U


@pytest.fixture
def u3_circuit():
    return Circuit([
        [Label('Gu3', (0,), args=(0.3, 0.1, -0.4)),
         Label('Gu3', (1,), args=(1.2, 0.5, 0.7))],
        [Label('Gcnot', (0, 1))],
        [Label('Gu3', (0,), args=(-0.8, 0.2, 0.9)),
         Label('Gu3', (1,), args=(0.4, -0.3, 0.1))],
    ], (0, 1))


class TestRandomCompilation:
    def test_u3_angle_roundtrip(self):
        rng = np.random.RandomState(0)
        for _ in range(30):
            w = u3_unitary(*rng.uniform(-np.pi, np.pi, 3))
            w2 = u3_unitary(*u3_angles_from_unitary(w))
            ratio = w2.conj().T @ w
            assert np.allclose(ratio, ratio[0, 0] * np.eye(2), atol=1e-10)

    def test_inverse_u3(self):
        args = (0.7, -0.2, 1.1)
        winv = u3_unitary(*inverse_u3(args))
        assert np.allclose(winv @ u3_unitary(*args), np.eye(2), atol=1e-12)

    def test_pauli_rc_preserves_unitary_up_to_frame(self, u3_circuit):
        U0 = _simulate(u3_circuit, 2)
        for seed in range(5):
            rc, bs, p = pauli_randomize_circuit(
                u3_circuit, np.random.RandomState(seed),
                return_bs=True, return_target_pauli=True)
            U_rc = _simulate(rc, 2)
            mats = [_PAULIS[(int(p[2 + i]), int(p[i]))] for i in range(2)]
            P_res = np.kron(mats[0], mats[1])
            D = U_rc @ U0.conj().T @ P_res.conj().T
            assert np.allclose(D, D[0, 0] * np.eye(4), atol=1e-9)
            assert bs == ''.join(str(b // 2) for b in p[2:])

    def test_central_pauli(self, u3_circuit):
        U0 = _simulate(u3_circuit, 2)
        cp, bs, p = randomize_central_pauli(
            u3_circuit, np.random.RandomState(3),
            return_bs=True, return_target_pauli=True)
        U_cp = _simulate(cp, 2)
        mats = [_PAULIS[(int(p[2 + i]), int(p[i]))] for i in range(2)]
        P_res = np.kron(mats[0], mats[1])
        D = U_cp @ U0.conj().T @ P_res.conj().T
        assert np.allclose(D, D[0, 0] * np.eye(4), atol=1e-9)

    def test_driver_class(self, u3_circuit):
        rc = RandomCompilation(rc_strategy='pauli_rc', return_bs=True,
                               rand_state=np.random.RandomState(0))
        out = rc.compile(u3_circuit)
        assert len(out) == 2 and isinstance(out[1], str)

    def test_rc_randomizes(self, u3_circuit):
        """Different seeds give different circuits (twirling actually happens)."""
        c1 = pauli_randomize_circuit(u3_circuit, np.random.RandomState(0))[0]
        c2 = pauli_randomize_circuit(u3_circuit, np.random.RandomState(1))[0]
        assert c1.layertup != c2.layertup
