"""Statevec (complex-amplitude) simulator: cross-simulator consistency with
the density-matrix simulator on unitary models (the reference's core
numerical test pattern -- same probabilities across evotypes/simulators,
SURVEY.md §4; reference evotypes/statevec)."""

import numpy as np
import pytest

from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.forwardsims.statevecsim import StateVectorForwardSimulator
from pygsti_tpu.models.modelconstruction import create_explicit_model_from_expressions


@pytest.fixture(scope="module")
def unitary_model():
    return create_explicit_model_from_expressions(
        ['Q0'], ['Gi', 'Gx', 'Gy'],
        ["I(Q0)", "X(pi/2,Q0)", "Y(pi/2,Q0)"],
        gate_type='static unitary')


def _circuits():
    return [Circuit(s) for s in ('{}@(Q0)', 'Gx@(Q0)', 'GxGx@(Q0)',
                                 'GxGyGx@(Q0)', 'GyGyGyGy@(Q0)',
                                 'GxGxGyGxGy@(Q0)')]


def test_statevec_matches_densitymx(unitary_model):
    m = unitary_model
    circuits = _circuits()
    dense_layout = m.sim.create_layout(circuits)
    p_dense = m.sim.bulk_fill_probs(None, dense_layout)

    sv = StateVectorForwardSimulator(m)
    sv_layout = sv.create_layout(circuits)
    p_sv = sv.bulk_fill_probs(None, sv_layout)
    np.testing.assert_allclose(p_sv, p_dense, atol=1e-12)


def test_statevec_2q():
    from pygsti_tpu.models.modelconstruction import create_explicit_model_from_expressions
    m = create_explicit_model_from_expressions(
        ['Q0', 'Q1'], ['Gii', 'Gxi', 'Gyi', 'Gcnot'],
        ["I(Q0):I(Q1)", "X(pi/2,Q0)", "Y(pi/2,Q0)", "CX(pi,Q0,Q1)"],
        gate_type='static unitary')
    circuits = [Circuit(s) for s in
                ('{}@(Q0,Q1)', 'Gxi@(Q0,Q1)', 'GxiGcnot@(Q0,Q1)',
                 'GyiGcnotGxi@(Q0,Q1)')]
    p_dense = m.sim.bulk_fill_probs(None, m.sim.create_layout(circuits))
    sv = StateVectorForwardSimulator(m)
    p_sv = sv.bulk_fill_probs(None, sv.create_layout(circuits))
    np.testing.assert_allclose(p_sv, p_dense, atol=1e-12)


def test_statevec_dprobs_match(unitary_model):
    """Jacobians agree too (both via jacfwd, different state spaces).
    Static-unitary model has 0 params, so use full-unitary gates."""
    from pygsti_tpu.models.modelconstruction import create_explicit_model_from_expressions
    m = create_explicit_model_from_expressions(
        ['Q0'], ['Gx', 'Gy'], ["X(pi/2,Q0)", "Y(pi/2,Q0)"],
        gate_type='full unitary')
    if m.num_params == 0:
        pytest.skip("full unitary parameterization unavailable")
    circuits = [Circuit('GxGy@(Q0)'), Circuit('GyGxGx@(Q0)')]
    dp_dense = m.sim.bulk_fill_dprobs(None, m.sim.create_layout(circuits))
    sv = StateVectorForwardSimulator(m)
    dp_sv = sv.bulk_fill_dprobs(None, sv.create_layout(circuits))
    np.testing.assert_allclose(dp_sv, dp_dense, atol=1e-9)


def test_statevec_rejects_noisy_model():
    """Clear error for models without a pure-state representation."""
    from pygsti_tpu.modelpacks import smq1Q_XYI as mp
    noisy = mp.target_model('full TP')
    sv = StateVectorForwardSimulator(noisy)
    layout = sv.create_layout([Circuit('Gxpi2:0@(0)')])
    with pytest.raises(ValueError, match="statevec"):
        sv.bulk_fill_probs(None, layout)
