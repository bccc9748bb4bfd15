"""Legacy RPE circuit/model/dataset construction (reference:
pygsti/extras/rpe/rpeconstruction.py: create_parameterized_rpe_model:20,
create_rpe_angle_circuit_lists:117, create_rpe_angle_circuits_dict:201,
create_rpe_dataset:261)."""

from __future__ import annotations

import numpy as np

from pygsti_tpu.circuits.circuit import Circuit


def create_parameterized_rpe_model(alpha_true, epsilon_true, aux_rot,
                                   spam_depol, gate_depol=None, with_id=True,
                                   rpeconfig_inst=None):
    """1-qubit model with X rotation `alpha_true`, Y rotation `epsilon_true`
    tilted by aux (Z) rotation `aux_rot`, plus depolarization
    (reference: rpeconstruction.py:20).  Only the standard X/Y axis
    configuration (rpeconfig_gxpi2_gypi2_00) is implemented; an
    `rpeconfig_inst` with different fixed/loose axes raises."""
    if rpeconfig_inst is not None:
        fixed = getattr(rpeconfig_inst, 'fixed_axis_label', 'X')
        loose = getattr(rpeconfig_inst, 'loose_axis_label', 'Y')
        if (fixed, loose) != ('X', 'Y'):
            raise NotImplementedError(
                "rpeconfig with axes (%s, %s) is not supported; only the "
                "standard (X, Y) configuration is implemented"
                % (fixed, loose))
    from pygsti_tpu.models.modelconstruction import (
        create_explicit_model_from_expressions)
    gates = (['Gi'] if with_id else []) + ['Gx', 'Gy']
    exprs = (["I(Q0)"] if with_id else []) + \
        ["X(%.12f,Q0)" % alpha_true, "Y(%.12f,Q0)" % epsilon_true]
    model = create_explicit_model_from_expressions(
        ['Q0'], gates, exprs)
    if aux_rot != 0:
        aux = create_explicit_model_from_expressions(
            ['Q0'], ['Gz'], ["Z(%.12f,Q0)" % aux_rot])
        from pygsti_tpu.modelmembers.operations import FullArbitraryOp
        from pygsti_tpu.baseobjs.label import Label
        gz = aux.operations[_find(aux, 'Gz')].to_dense()
        gy_lbl = _find(model, 'Gy')
        gy = model.operations[gy_lbl].to_dense()
        model.operations[gy_lbl] = FullArbitraryOp(
            np.linalg.inv(gz) @ gy @ gz)
        model._mark_for_rebuild()
    if gate_depol:
        model = model.depolarize(op_noise=gate_depol)
    if spam_depol:
        model = model.depolarize(spam_noise=spam_depol)
    return model


def _find(model, name):
    from pygsti_tpu.baseobjs.label import Label
    for cand in (name, Label(name), Label(name, 0)):
        if cand in model.operations:
            return cand
    raise KeyError(name)


def create_rpe_angle_circuit_lists(k_list, angle_name, rpeconfig_inst):
    """(sin_circuits, cos_circuits) for an angle's germ generations
    (reference: rpeconstruction.py:117)."""
    prep_c = getattr(rpeconfig_inst, '%s_cos_prep_tuple' % angle_name)
    germ_c = getattr(rpeconfig_inst, '%s_cos_germ_tuple' % angle_name)
    meas_c = getattr(rpeconfig_inst, '%s_cos_meas_tuple' % angle_name)
    prep_s = getattr(rpeconfig_inst, '%s_sin_prep_tuple' % angle_name)
    germ_s = getattr(rpeconfig_inst, '%s_sin_germ_tuple' % angle_name)
    meas_s = getattr(rpeconfig_inst, '%s_sin_meas_tuple' % angle_name)
    cos_list, sin_list = [], []
    for k in k_list:
        cos_list.append(Circuit(list(prep_c)) + Circuit(list(germ_c)).repeat(k)
                        + Circuit(list(meas_c)))
        sin_list.append(Circuit(list(prep_s)) + Circuit(list(germ_s)).repeat(k)
                        + Circuit(list(meas_s)))
    return sin_list, cos_list


def create_rpe_angle_circuits_dict(log2k_max_or_k_list, rpeconfig_inst):
    """{(angle, 'sin'|'cos'): circuits} plus the full circuit list
    (reference: rpeconstruction.py:201)."""
    if isinstance(log2k_max_or_k_list, int):
        k_list = [2 ** k for k in range(log2k_max_or_k_list + 1)]
    else:
        k_list = list(log2k_max_or_k_list)
    d = {'k_list': k_list}
    all_circuits = []
    for angle in ('alpha', 'epsilon', 'theta'):
        sin_l, cos_l = create_rpe_angle_circuit_lists(k_list, angle,
                                                      rpeconfig_inst)
        d[angle, 'sin'] = sin_l
        d[angle, 'cos'] = cos_l
        for c in sin_l + cos_l:
            if c not in all_circuits:
                all_circuits.append(c)
    d['totalCircList'] = all_circuits
    return d


def create_rpe_dataset(model_or_dataset, string_list_d, n_samples,
                       sample_error='binomial', seed=None):
    """Simulate (or resample) RPE data (reference:
    rpeconstruction.py:261)."""
    from pygsti_tpu.data.datasetconstruction import simulate_data
    return simulate_data(model_or_dataset, string_list_d['totalCircList'],
                         n_samples, sample_error=sample_error, seed=seed)
