"""Qutrit model construction (reference: pygsti/models/qutrit.py:189
create_qutrit_model): the symmetric two-qubit subspace hosts a qutrit with
identity, XX, YY, and Molmer-Sorensen gates.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as spl

from pygsti_tpu.baseobjs.basis import Basis
from pygsti_tpu.baseobjs.statespace import ExplicitStateSpace
from pygsti_tpu.tools.optools import unitary_to_superop
from pygsti_tpu.tools.basistools import change_basis, stdmx_to_vec


# symmetric/antisymmetric basis change: |00>, (|01>+|10>)/sqrt2,
# (|01>-|10>)/sqrt2, |11>; the qutrit lives on rows {0, 1, 3}
_A = np.array([[1, 0, 0, 0],
               [0, 1 / np.sqrt(2), 1 / np.sqrt(2), 0],
               [0, 1 / np.sqrt(2), -1 / np.sqrt(2), 0],
               [0, 0, 0, 1]])

_X = np.array([[0, 1], [1, 0]])
_Y = np.array([[0, -1j], [1j, 0]])


def _x_2qubit(theta):
    x = spl.expm(-1j / 2 * theta * _X)
    return np.kron(x, x)


def _y_2qubit(theta):
    y = spl.expm(-1j / 2 * theta * _Y)
    return np.kron(y, y)


def _ms_2qubit(theta, phi):
    a = np.cos(phi) * _X + np.sin(phi) * _Y
    return spl.expm(-1j / 2 * theta * np.kron(a, a))


def to_qutrit_space(input_mat):
    """Project a 2-qubit unitary onto the symmetric qutrit subspace
    (reference: qutrit.py:112)."""
    m = _A @ np.asarray(input_mat) @ _A.conj().T
    keep = [0, 1, 3]
    return m[np.ix_(keep, keep)]


def _xx_qutrit(theta):
    return to_qutrit_space(_x_2qubit(theta))


def _yy_qutrit(theta):
    return to_qutrit_space(_y_2qubit(theta))


def _ms_qutrit(theta, phi):
    return to_qutrit_space(_ms_2qubit(theta, phi))


def _random_rot(scale, rand_state):
    rndm = rand_state.rand(3, 3)
    herm = (rndm + rndm.T) / 2 + 1j * 0
    off = rand_state.rand(3, 3)
    herm = herm + 1j * (off - off.T) / 2
    return spl.expm(-1j * scale * herm)


def create_qutrit_model(error_scale, x_angle=np.pi / 2, y_angle=np.pi / 2,
                        ms_global=np.pi / 2, ms_local=0, similarity=False,
                        seed=None, basis='qt', evotype='default'):
    """Standard qutrit model: Gi, Gx (XX), Gy (YY), Gm (Molmer-Sorensen)
    with optional random rotation errors (reference: qutrit.py:189)."""
    from pygsti_tpu.models.explicitmodel import ExplicitOpModel
    from pygsti_tpu.modelmembers.operations import FullTPOp
    from pygsti_tpu.modelmembers.states import TPState
    from pygsti_tpu.modelmembers.povms import TPPOVM
    from pygsti_tpu.models.gaugegroup import TPGaugeGroup

    gateI = np.identity(3, complex)
    gateX = _xx_qutrit(x_angle)
    gateY = _yy_qutrit(y_angle)
    gateM = _ms_qutrit(ms_global, ms_local)

    rndm = np.random.RandomState(seed)
    Xr, Yr, Mr, Ir = (_random_rot(error_scale, rndm) for _ in range(4))
    if similarity:
        gateX = Xr.conj().T @ gateX @ Xr
        gateY = Yr.conj().T @ gateY @ Yr
        gateM = Mr.conj().T @ gateM @ Mr
        gateI = Ir.conj().T @ gateI @ Ir
    else:
        gateX = gateX @ Xr
        gateY = gateY @ Yr
        gateM = gateM @ Mr
        gateI = gateI @ Ir

    b = Basis.cast(basis, 9)
    superI = np.real(unitary_to_superop(gateI, b))
    superX = np.real(unitary_to_superop(gateX, b))
    superY = np.real(unitary_to_superop(gateY, b))
    superM = np.real(unitary_to_superop(gateM, b))

    rho0 = np.real(stdmx_to_vec(np.diag([1.0, 0, 0]).astype(complex), b))
    E0 = np.real(stdmx_to_vec(np.diag([1.0, 0, 0]).astype(complex), b))
    E1 = np.real(stdmx_to_vec(np.diag([0, 1.0, 0]).astype(complex), b))
    E2 = np.real(stdmx_to_vec(np.diag([0, 0, 1.0]).astype(complex), b))

    state_space = ExplicitStateSpace(['T0'], [3])
    mdl = ExplicitOpModel(state_space, b)
    mdl.preps['rho0'] = TPState(rho0.reshape(-1))
    mdl.povms['Mdefault'] = TPPOVM([('0bright', E0.reshape(-1)),
                                    ('1bright', E1.reshape(-1)),
                                    ('2bright', E2.reshape(-1))])
    from pygsti_tpu.baseobjs.label import Label
    mdl.operations[Label('Gi', 'T0')] = FullTPOp(superI)
    mdl.operations[Label('Gx', 'T0')] = FullTPOp(superX)
    mdl.operations[Label('Gy', 'T0')] = FullTPOp(superY)
    mdl.operations[Label('Gm', 'T0')] = FullTPOp(superM)
    mdl.default_gauge_group = TPGaugeGroup(state_space)
    mdl._mark_for_rebuild()
    return mdl
