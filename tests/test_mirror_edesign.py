"""Tests for mirror-circuit fidelity-estimation edesigns."""

import numpy as np
import pytest

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.protocols.mirror_edesign import (make_mirror_edesign,
                                                 compute_inverse, init_layer)
from pygsti_tpu.processors.random_compilation import u3_unitary


def _simulate(circ, n, lls):
    U = np.eye(2 ** n, dtype=complex)
    for i in range(circ.depth):
        lbl = circ.layertup[i]
        comps = lbl.components if not lbl.is_simple else (lbl,)
        L = np.eye(2 ** n, dtype=complex)
        for g in comps:
            if g.name == 'Gu3':
                u = u3_unitary(*(float(a) for a in g.args))
                q = lls.index(g.sslbls[0])
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


TEST_CIRC = Circuit([
    [Label('Gu3', (0,), args=(0.3, 0.1, -0.4)),
     Label('Gu3', (1,), args=(1.2, 0.5, 0.7))],
    [Label('Gcnot', (0, 1))],
], (0, 1))


class TestMirrorEdesign:
    def test_compute_inverse(self):
        Tinv = compute_inverse(TEST_CIRC)
        U = _simulate(TEST_CIRC, 2, (0, 1))
        Ui = _simulate(Tinv, 2, (0, 1))
        assert np.allclose(Ui @ U, np.eye(4), atol=1e-10)

    def test_families_have_deterministic_ideal_outcomes(self):
        ed = make_mirror_edesign([TEST_CIRC], num_mcs_per_circ=3,
                                 rand_state=np.random.RandomState(0))
        assert set(ed.keys()) == {'br', 'rr', 'ref'}
        for key in ('br', 'rr', 'ref'):
            for c, auxl in ed[key].aux_info.items():
                bs = auxl[0]['idealout']
                psi = _simulate(c, 2, (0, 1))[:, 0]
                assert abs(abs(psi[int(bs, 2)]) ** 2 - 1.0) < 1e-9

    def test_central_pauli_strategy(self):
        ed = make_mirror_edesign([TEST_CIRC], num_mcs_per_circ=2,
                                 mirroring_strategy='central_pauli',
                                 rand_state=np.random.RandomState(1))
        assert set(ed.keys()) == {'cp', 'cpref'}
        for c, auxl in ed['cp'].aux_info.items():
            bs = auxl[0]['idealout']
            psi = _simulate(c, 2, (0, 1))[:, 0]
            assert abs(abs(psi[int(bs, 2)]) ** 2 - 1.0) < 1e-9

    def test_init_layer(self):
        L = init_layer((0, 1), rand_state=np.random.RandomState(0))
        assert L.depth == 1 and L.num_lines == 2
        assert init_layer((0, 1), state_initialization='none').depth == 0


class TestScarabMCFE:
    def test_process_fidelity_estimation_end_to_end(self):
        """MCFE recovers the process fidelity of a noisy u3-cx circuit
        (reference: scarab.py:293)."""
        import numpy as np
        import jax
        from pygsti_tpu.processors import QubitProcessorSpec
        from pygsti_tpu.models.modelconstruction import create_crosstalk_free_model
        from pygsti_tpu.protocols.scarab import (mirror_benchmark,
                                                 calculate_mirror_benchmark_results)
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.data.datasetconstruction import simulate_data
        from pygsti_tpu.processors.random_compilation import u3_unitary

        def u3f(args):
            return u3_unitary(*(float(a) for a in args))

        pspec = QubitProcessorSpec(2, ['Gu3', 'Gcnot'], geometry='line',
                                   nonstd_gate_unitaries={'Gu3': u3f})
        mdl = create_crosstalk_free_model(
            pspec, depolarization_strengths={'Gu3': 0.003, 'Gcnot': 0.02})
        ed = mirror_benchmark([TEST_CIRC], num_mcs_per_circ=6,
                              rand_state=np.random.RandomState(0))
        ds = simulate_data(mdl, ed.all_circuits_needing_data, 2000, seed=3)
        vbdf = calculate_mirror_benchmark_results(
            [TEST_CIRC], ProtocolData(ed, ds), num_bootstraps=10,
            rand_state=np.random.RandomState(1))
        pfid = vbdf.dataframe['process_fidelity'].iloc[0]
        assert 0.9 < pfid <= 1.0
        assert vbdf.dataframe['process_fidelity_std'].iloc[0] < 0.05
