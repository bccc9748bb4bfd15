"""Legacy model pack: the 24 single-qubit Clifford gates Gc0-Gc23
(reference: pygsti/modelpacks/legacy/std1Q_Cliffords.py)."""

from __future__ import annotations

import numpy as np

description = "The 1-qubit Clifford group"

gates = ['Gc%d' % i for i in range(24)]


def target_model(parameterization_type="full", sim_type="auto"):
    """ExplicitOpModel containing all 24 1Q Clifford gates (reference:
    std1Q_Cliffords.target_model)."""
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.baseobjs.label import Label
    from pygsti_tpu.models.explicitmodel import ExplicitOpModel
    from pygsti_tpu.models.modelconstruction import (_make_op, _make_prep,
                                                     _make_povm)
    from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
    from pygsti_tpu.tools.optools import unitary_to_superop

    std = standard_gatename_unitaries()
    basis = Basis.cast('pp', 4)
    gtype = parameterization_type
    ptype = 'full TP' if gtype in ('full TP', 'TP') else gtype
    mdl = ExplicitOpModel(['Q0'], basis, default_gate_type=gtype,
                          default_prep_type=ptype, default_povm_type=ptype)
    rho0 = np.array([1, 0, 0, 1.0]) / np.sqrt(2)
    mdl.preps[Label('rho0')] = _make_prep(rho0, ptype, basis, 1)
    E0 = np.array([1, 0, 0, 1.0]) / np.sqrt(2)
    E1 = np.array([1, 0, 0, -1.0]) / np.sqrt(2)
    import collections
    mdl.povms[Label('Mdefault')] = _make_povm(
        collections.OrderedDict([('0', E0), ('1', E1)]), ptype, basis, 1)
    for i in range(24):
        U = std['Gc%d' % i]
        mdl.operations[Label('Gc%d' % i)] = _make_op(
            np.real(unitary_to_superop(U, basis)), gtype, basis)
    mdl._mark_for_rebuild()
    return mdl


def processor_spec():
    return target_model('static').create_processor_spec(None)


from collections import OrderedDict as _OrderedDict

clifford_compilation = _OrderedDict(
    [('Gc%d' % i, ['Gc%d' % i]) for i in range(24)])
