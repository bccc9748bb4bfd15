"""Leakage models: embed a qubit gate set in a 3-level (qutrit) space
(reference: pygsti/leakage/models.py).

The third level represents leakage; gates act as the 2-level unitary on the
computational subspace and trivially on the leakage level (until noise is
added).  Models use the Gell-Mann ('gm') basis for the 9-dimensional
superoperator space.
"""

from __future__ import annotations

import collections

import numpy as np

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.baseobjs.statespace import ExplicitStateSpace
from pygsti_tpu.baseobjs.basis import Basis
from pygsti_tpu.models.explicitmodel import ExplicitOpModel
from pygsti_tpu.modelmembers import operations as _op
from pygsti_tpu.modelmembers import states as _st
from pygsti_tpu.modelmembers import povms as _pv
from pygsti_tpu.tools import optools as _ot
from pygsti_tpu.tools.basistools import stdmx_to_vec


def to_3level_unitary(u_2level):
    """Embed a 2x2 (or 4x4 two-qubit) unitary into the 3-level space(s),
    acting as identity on the leakage level."""
    u = np.asarray(u_2level, dtype=complex)
    if u.shape == (2, 2):
        out = np.eye(3, dtype=complex)
        out[:2, :2] = u
        return out
    if u.shape == (4, 4):
        # two qutrits: embed on the 2x2 computational block of each
        out = np.eye(9, dtype=complex)
        idx = [0, 1, 3, 4]  # |00>,|01>,|10>,|11> within 3x3 two-qutrit space
        for a, ia in enumerate(idx):
            for b, ib in enumerate(idx):
                out[ia, ib] = u[a, b]
        return out
    raise ValueError("Unsupported unitary shape %s" % (u.shape,))


def create_3level_model(model_2level, gate_type='full', basis='gm',
                        leakage_in_povm='1'):
    """Lift a 1-qubit ExplicitOpModel to a 3-level model: gates embedded via
    to_3level_unitary of their closest unitary; SPAM extended with the
    leakage level counted in outcome `leakage_in_povm` (reference:
    leakage/models.py convention)."""
    ss = ExplicitStateSpace(('QT',), (3,))
    b = Basis.cast(basis, 9)
    mdl = ExplicitOpModel(ss, b, default_gate_type=gate_type)

    for lbl, op in model_2level.operations.items():
        u2 = _ot.superop_to_unitary(op.to_dense(), model_2level.basis, check=False)
        u3 = to_3level_unitary(u2)
        mx = np.real(_ot.unitary_to_superop(u3, b))
        mdl.operations[lbl] = _make(gate_type, mx)

    rho = np.zeros((3, 3), dtype=complex)
    rho[0, 0] = 1.0
    rho_vec = np.real(stdmx_to_vec(rho, b))
    mdl.preps[Label('rho0')] = _st.FullState(rho_vec) if gate_type.startswith('full') \
        else _st.StaticState(rho_vec)

    e0 = np.zeros((3, 3), dtype=complex); e0[0, 0] = 1.0
    e1 = np.zeros((3, 3), dtype=complex); e1[1, 1] = 1.0
    e2 = np.zeros((3, 3), dtype=complex); e2[2, 2] = 1.0
    effects = collections.OrderedDict()
    if leakage_in_povm == '1':
        effects['0'] = np.real(stdmx_to_vec(e0, b))
        effects['1'] = np.real(stdmx_to_vec(e1 + e2, b))
    elif leakage_in_povm == 'separate':
        effects['0'] = np.real(stdmx_to_vec(e0, b))
        effects['1'] = np.real(stdmx_to_vec(e1, b))
        effects['2'] = np.real(stdmx_to_vec(e2, b))
    else:
        raise ValueError("leakage_in_povm must be '1' or 'separate'")
    mdl.povms[Label('Mdefault')] = _pv.UnconstrainedPOVM(effects) \
        if gate_type.startswith('full') else _pv.UnconstrainedPOVM(effects)
    mdl._mark_for_rebuild()
    return mdl


def _make(gate_type, mx):
    if gate_type in ('static',):
        return _op.StaticArbitraryOp(mx)
    if gate_type in ('full TP', 'TP'):
        return _op.FullTPOp(mx)
    return _op.FullArbitraryOp(mx)


# reference-compatible alias
create_leakage_model = create_3level_model
