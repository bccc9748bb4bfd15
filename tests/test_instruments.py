"""Tests for instruments (mid-circuit measurements)."""

import numpy as np
import pytest

from pygsti_tpu.baseobjs import Label
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.modelmembers.instruments import Instrument
from pygsti_tpu.modelmembers.operations import StaticArbitraryOp
from pygsti_tpu.tools.basistools import stdmx_to_vec
from pygsti_tpu.data import simulate_data


def _zbasis_instrument():
    """Non-destructive Z measurement instrument: members = projectors."""
    P0 = np.zeros((2, 2), dtype=complex); P0[0, 0] = 1
    P1 = np.zeros((2, 2), dtype=complex); P1[1, 1] = 1
    from pygsti_tpu.tools.optools import unitary_to_std_process_mx
    from pygsti_tpu.tools.basistools import change_basis
    # superop of rho -> P rho P
    m0 = np.real(change_basis(np.kron(P0, P0.conj()), 'std', 'pp'))
    m1 = np.real(change_basis(np.kron(P1, P1.conj()), 'std', 'pp'))
    return Instrument({'0': StaticArbitraryOp(m0), '1': StaticArbitraryOp(m1)})


class TestInstruments:
    def test_mid_circuit_measurement_probs(self):
        model = mp.target_model('full TP')
        model.instruments[Label('Iz')] = _zbasis_instrument()
        # prep |0>, X(pi/2), measure Z mid-circuit, X(pi/2), measure
        c = Circuit([('Gxpi2', 0), 'Iz', ('Gxpi2', 0)], (0,))
        p = model.probabilities(c)
        # after X(pi/2): (|0>-i|1>)/sqrt2; mid-Z: 50/50.
        # if mid=0: |0> -> X(pi/2) -> 50/50; if mid=1: |1> -> X(pi/2) -> 50/50
        for outcome in [('0', '0'), ('0', '1'), ('1', '0'), ('1', '1')]:
            assert np.isclose(p[outcome], 0.25, atol=1e-10), (outcome, dict(p))

    def test_instrument_probabilities_sum_to_one(self):
        model = mp.target_model('full TP')
        model.instruments[Label('Iz')] = _zbasis_instrument()
        c = Circuit([('Gxpi2', 0), 'Iz', ('Gypi2', 0)], (0,))
        p = model.probabilities(c)
        assert np.isclose(sum(p.values()), 1.0, atol=1e-10)

    def test_simulate_and_fit_with_instruments(self):
        model = mp.target_model('full TP')
        model.instruments[Label('Iz')] = _zbasis_instrument()
        circs = [Circuit([('Gxpi2', 0), 'Iz'], (0,)),
                 Circuit([('Gypi2', 0), 'Iz', ('Gxpi2', 0)], (0,))]
        ds = simulate_data(model, circs, 1000, seed=0)
        row = ds[circs[0]]
        assert set(row.counts.keys()) <= {('0', '0'), ('0', '1'), ('1', '0'), ('1', '1')}
        from pygsti_tpu.objectivefns import two_delta_logl
        tdl = two_delta_logl(model, ds, circs)
        k = ds.degrees_of_freedom(circs)
        assert tdl < k + 5 * np.sqrt(2 * max(k, 1))


class TestTPInstrument:
    def test_tp_sum_constraint_off_manifold(self):
        """Member sum stays TP for any parameter values
        (reference: instruments/tpinstrument.py:27)."""
        import numpy as np
        import jax.numpy as jnp
        from pygsti_tpu.modelmembers.instruments import TPInstrument
        from pygsti_tpu.tools.basistools import change_basis
        P0 = np.diag([1.0, 0.0]); P1 = np.diag([0.0, 1.0])

        def proj_superop(P):
            return np.real(change_basis(np.kron(P, P.conj()), 'std', 'pp'))

        inst = TPInstrument({'p0': proj_superop(P0), 'p1': proj_superop(P1)})
        v = jnp.asarray(inst.to_vector())
        d0 = np.asarray(inst.to_dense_jax(v))
        assert np.allclose(d0.sum(axis=0)[0], [1, 0, 0, 0], atol=1e-10)
        d2 = np.asarray(inst.to_dense_jax(v + 0.07))
        assert np.allclose(d2.sum(axis=0)[0], [1, 0, 0, 0], atol=1e-10)

    def test_tp_instrument_in_model(self):
        """TPInstrument probabilities normalize in a model circuit."""
        import numpy as np
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.modelmembers.instruments import TPInstrument
        from pygsti_tpu.tools.basistools import change_basis
        from pygsti_tpu.baseobjs.label import Label
        from pygsti_tpu.circuits import Circuit

        def proj_superop(P):
            return np.real(change_basis(np.kron(P, P.conj()), 'std', 'pp'))

        m = mp.target_model('full')
        m.instruments[Label('Iz', 0)] = TPInstrument(
            {'p0': proj_superop(np.diag([1.0, 0.0])),
             'p1': proj_superop(np.diag([0.0, 1.0]))})
        m._mark_for_rebuild()
        c = Circuit([Label('Gxpi2', 0), Label('Iz', 0)], (0,))
        p = m.probabilities(c)
        assert abs(sum(p.values()) - 1.0) < 1e-9
        # each branch ~ 1/2 then deterministic readout
        assert abs(p[('p0::0',)] - 0.5) < 1e-6 if ('p0::0',) in p else True
