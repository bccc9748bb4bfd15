"""Model construction API (reference: pygsti/models/modelconstruction.py:758).

``create_explicit_model(pspec, ...)`` builds an ExplicitOpModel whose
operations are the processor spec's primitive ops (embedded on the full
state space), parameterized per ``ideal_gate_type`` / spam types.
"""

from __future__ import annotations

import collections

import numpy as np

from pygsti_tpu.baseobjs.statespace import QubitSpace
from pygsti_tpu.baseobjs.basis import Basis
from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.models.explicitmodel import ExplicitOpModel
from pygsti_tpu.modelmembers import operations as _op
from pygsti_tpu.modelmembers import states as _st
from pygsti_tpu.modelmembers import povms as _pv
from pygsti_tpu.tools import optools as _ot
from pygsti_tpu.tools.basistools import stdmx_to_vec


def _embed_unitary_superop(u, target_qubits, all_qubits, basis_name='pp'):
    """Dense superop (in tensor `basis_name` basis) of a unitary acting on
    `target_qubits` within the full qubit set, identity elsewhere."""
    nq_gate = int(round(np.log2(u.shape[0])))
    assert len(target_qubits) == nq_gate
    bname = basis_name if isinstance(basis_name, str) else basis_name.name
    small = np.real(_ot.unitary_to_superop(u, Basis.cast(bname, 4 ** nq_gate)))
    n = len(all_qubits)
    if n == nq_gate and tuple(target_qubits) == tuple(all_qubits):
        return small
    # embed: kron(small, I_rest) then permute factor axes to device order
    tgt_pos = [list(all_qubits).index(t) for t in target_qubits]
    other_pos = [i for i in range(n) if i not in tgt_pos]
    rest_dim = 4 ** len(other_pos)
    full = np.kron(small, np.eye(rest_dim))
    src_order = tgt_pos + other_pos
    inv = [0] * n
    for newpos, srcpos in enumerate(src_order):
        inv[srcpos] = newpos
    dims = [4] * n
    full = full.reshape(dims + dims)
    full = np.transpose(full, inv + [p + n for p in inv])
    return full.reshape(4 ** n, 4 ** n)


def _make_op(ideal_mx, gate_type, basis):
    if gate_type in ('static', 'static arbitrary'):
        return _op.StaticArbitraryOp(ideal_mx)
    if gate_type in ('full', 'full arbitrary'):
        return _op.FullArbitraryOp(ideal_mx)
    if gate_type in ('full TP', 'TP'):
        return _op.FullTPOp(ideal_mx)
    if gate_type in ('static unitary', 'static standard'):
        u = _ot.superop_to_unitary(np.asarray(ideal_mx), basis)
        return _op.StaticUnitaryOp(u, basis)
    if gate_type == 'full unitary':
        u = _ot.superop_to_unitary(np.asarray(ideal_mx), basis)
        return _op.FullUnitaryOp(u, basis)
    if gate_type in ('CPTP', 'CPTPLND', 'GLND', 'H+S', 'H+s', 'H'):
        param = 'CPTPLND' if gate_type == 'CPTP' else gate_type
        eg = _op.build_lindblad_errorgen(basis, param)
        return _op.ComposedOp([_op.StaticArbitraryOp(ideal_mx), _op.ExpErrorgenOp(eg)])
    raise ValueError("Unknown gate type %r" % gate_type)


def _make_prep(ideal_vec, prep_type, basis, nqubits):
    if prep_type in ('computational', 'static', 'static unitary',
                     'static standard', 'full unitary', 'static pure'):
        if nqubits is None:
            raise ValueError("prep type %r requires a qubit state space"
                             % prep_type)
        return _st.ComputationalBasisState([0] * nqubits, basis)
    if prep_type in ('full', 'full arbitrary'):
        return _st.FullState(ideal_vec)
    if prep_type in ('full TP', 'TP'):
        return _st.TPState(ideal_vec)
    if prep_type in ('CPTP', 'CPTPLND', 'GLND', 'H+S', 'H+s'):
        param = 'CPTPLND' if prep_type == 'CPTP' else prep_type
        eg = _op.build_lindblad_errorgen(basis, param)
        return _st.ComposedState(_st.ComputationalBasisState([0] * nqubits, basis),
                                 _op.ExpErrorgenOp(eg))
    raise ValueError("Unknown prep type %r" % prep_type)


def _make_povm(ideal_effects, povm_type, basis, nqubits):
    if povm_type in ('computational', 'static', 'static unitary',
                     'static standard', 'full unitary', 'static pure'):
        if nqubits is None:
            raise ValueError("povm type %r requires a qubit state space"
                             % povm_type)
        return _pv.ComputationalBasisPOVM(nqubits, basis)
    if povm_type in ('full', 'full arbitrary'):
        return _pv.UnconstrainedPOVM(ideal_effects)
    if povm_type in ('full TP', 'TP'):
        return _pv.TPPOVM(ideal_effects)
    if povm_type in ('CPTP', 'CPTPLND', 'GLND', 'H+S', 'H+s'):
        param = 'CPTPLND' if povm_type == 'CPTP' else povm_type
        eg = _op.build_lindblad_errorgen(basis, param)
        return _pv.ComposedPOVM(_op.ExpErrorgenOp(eg),
                                _pv.ComputationalBasisPOVM(nqubits, basis))
    raise ValueError("Unknown povm type %r" % povm_type)


def create_explicit_model(processor_spec, custom_gates=None, basis='pp',
                          ideal_gate_type='auto', ideal_prep_type='auto',
                          ideal_spam_type='auto', ideal_povm_type='auto',
                          simulator='auto', evotype=None, embed_gates=True):
    """Build an ExplicitOpModel from a QubitProcessorSpec (reference:
    modelconstruction.create_explicit_model:758)."""
    if ideal_gate_type == 'auto':
        ideal_gate_type = 'static'
    if ideal_prep_type == 'auto':
        ideal_prep_type = ideal_spam_type if ideal_spam_type != 'auto' else 'computational'
    if ideal_povm_type == 'auto':
        ideal_povm_type = ideal_spam_type if ideal_spam_type != 'auto' else 'computational'

    pspec = processor_spec
    nq = pspec.num_qubits
    qlbls = pspec.qubit_labels
    state_space = QubitSpace(qlbls)
    basis_obj = Basis.cast(basis, state_space.dim)

    mdl = ExplicitOpModel(state_space, basis_obj, default_gate_type=ideal_gate_type,
                          default_prep_type=ideal_prep_type, default_povm_type=ideal_povm_type,
                          simulator=simulator)

    custom_gates = custom_gates or {}
    for lbl in pspec.primitive_op_labels:
        if lbl in custom_gates:
            mdl.operations[lbl] = custom_gates[lbl]
            continue
        if lbl == Label(()):
            u = np.eye(2 ** nq, dtype=complex)
            targets = qlbls
        else:
            u = pspec.gate_unitaries[lbl.name]
            targets = lbl.sslbls
        mx = _embed_unitary_superop(u, targets, qlbls, basis)
        mdl.operations[lbl] = _make_op(mx, ideal_gate_type, basis_obj)

    # SPAM
    udim = 2 ** nq
    rho_ideal = np.zeros((udim, udim), dtype=complex)
    rho_ideal[0, 0] = 1.0
    rho_vec = np.real(stdmx_to_vec(rho_ideal, basis_obj))
    mdl.preps[Label('rho0')] = _make_prep(rho_vec, ideal_prep_type, basis_obj, nq)

    effects = collections.OrderedDict()
    for i in range(udim):
        e = np.zeros((udim, udim), dtype=complex)
        e[i, i] = 1.0
        effects[format(i, '0%db' % nq)] = np.real(stdmx_to_vec(e, basis_obj))
    mdl.povms[Label('Mdefault')] = _make_povm(effects, ideal_povm_type, basis_obj, nq)

    mdl._mark_for_rebuild()
    return mdl


def create_spam_vector(vec_expr, state_space, basis):
    """Build a prep vector from an expression like '0' (computational index)."""
    from pygsti_tpu.baseobjs.statespace import StateSpace
    state_space = StateSpace.cast(state_space)
    udim = state_space.udim
    idx = int(vec_expr)
    rho = np.zeros((udim, udim), dtype=complex)
    rho[idx, idx] = 1.0
    return np.real(stdmx_to_vec(rho, basis))


def create_operation(op_expr, state_space, basis='pp', parameterization='full'):
    """Build an operation matrix from an expression like 'X(pi/2,Q0)'
    (subset of the reference's expression parser, modelconstruction.py:150)."""
    import re
    from pygsti_tpu.baseobjs.statespace import StateSpace
    import scipy.linalg as spl
    from pygsti_tpu.tools.internalgates import sigmaX, sigmaY, sigmaZ

    state_space = StateSpace.cast(state_space)
    qlbls = state_space.tensor_product_block_labels

    # composite expressions 'I(Q0):X(pi/2,Q1)' compose factor superops
    # (disjoint targets, so matrix product == tensor composition)
    parts = [p for p in op_expr.strip().split(':') if p.strip()]
    if len(parts) > 1:
        out = np.eye(state_space.dim)
        for part in parts:
            out = create_operation(part, state_space, basis,
                                   parameterization) @ out
        return out

    m = re.match(r'([A-Z]+)\((.*)\)\s*$', op_expr.strip())
    if not m:
        if op_expr.strip() == 'I' or op_expr.strip() == '':
            return np.eye(state_space.dim)
        raise ValueError("Cannot parse operation expression %r" % op_expr)
    kind, argstr = m.group(1), m.group(2)
    args = [a.strip() for a in argstr.split(',')] if argstr else []

    def _angle(s):
        return float(eval(s, {'pi': np.pi, 'sqrt': np.sqrt,
                              '__builtins__': {}}))  # noqa: S307

    if kind in ('X', 'Y', 'Z'):
        theta = _angle(args[0])
        sigma = {'X': sigmaX, 'Y': sigmaY, 'Z': sigmaZ}[kind]
        u = spl.expm(-1j * theta / 2 * sigma)
        target = args[1]
        return _embed_unitary_superop(u, (target,), qlbls, basis)
    if kind == 'I':
        return np.eye(state_space.dim)
    if kind == 'CX':
        theta = _angle(args[0])
        u4 = np.eye(4, dtype=complex)
        u4[2:, 2:] = spl.expm(-1j * theta / 2 * sigmaX)
        return _embed_unitary_superop(u4, (args[1], args[2]), qlbls, basis)
    if kind == 'CZ':
        theta = _angle(args[0])
        u4 = np.eye(4, dtype=complex)
        u4[2:, 2:] = spl.expm(-1j * theta / 2 * sigmaZ)
        return _embed_unitary_superop(u4, (args[1], args[2]), qlbls, basis)
    if kind == 'CNOT':
        u4 = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=complex)
        return _embed_unitary_superop(u4, (args[0], args[1]), qlbls, basis)
    if kind == 'CPHASE':
        u4 = np.diag([1, 1, 1, -1]).astype(complex)
        return _embed_unitary_superop(u4, (args[0], args[1]), qlbls, basis)
    if kind == 'N':
        # N(theta, sx, sy, sz, Q0): rotation by theta about axis
        # (sx, sy, sz) (reference: modelconstruction.create_operation 'N')
        theta = _angle(args[0])
        sx, sy, sz = (_angle(a) for a in args[1:4])
        gen = sx * sigmaX + sy * sigmaY + sz * sigmaZ
        u = spl.expm(-1j * theta / 2 * gen)
        return _embed_unitary_superop(u, (args[4],), qlbls, basis)
    raise ValueError("Unknown operation kind %r" % kind)


def create_explicit_model_from_expressions(state_space, op_labels, op_expressions,
                                           prep_labels=('rho0',), prep_expressions=('0',),
                                           effect_labels='standard', effect_expressions='standard',
                                           povm_labels='Mdefault', basis='pp',
                                           gate_type='full', prep_type='auto', povm_type='auto'):
    """Legacy-style construction from expression strings (reference:
    modelconstruction.create_explicit_model_from_expressions)."""
    from pygsti_tpu.baseobjs.statespace import StateSpace
    state_space = StateSpace.cast(state_space)
    basis_obj = Basis.cast(basis, state_space.dim)
    if prep_type == 'auto':
        prep_type = 'full TP' if gate_type in ('full TP', 'TP') else gate_type
    if povm_type == 'auto':
        povm_type = 'full TP' if gate_type in ('full TP', 'TP') else gate_type

    mdl = ExplicitOpModel(state_space, basis_obj, default_gate_type=gate_type,
                          default_prep_type=prep_type, default_povm_type=povm_type)
    nq = state_space.num_qubits

    for plbl, pexpr in zip(prep_labels, prep_expressions):
        vec = create_spam_vector(pexpr, state_space, basis_obj)
        mdl.preps[Label(plbl)] = _make_prep(vec, prep_type, basis_obj, nq)

    udim = state_space.udim
    if effect_labels == 'standard':
        effect_labels = [format(i, '0%db' % nq) for i in range(udim)]
        effect_expressions = [str(i) for i in range(udim)]
    effects = collections.OrderedDict()
    for elbl, eexpr in zip(effect_labels, effect_expressions):
        effects[elbl] = create_spam_vector(eexpr, state_space, basis_obj)
    if isinstance(povm_labels, str):
        povm_labels = (povm_labels,)
    for povm_lbl in povm_labels:
        mdl.povms[Label(povm_lbl)] = _make_povm(effects, povm_type, basis_obj, nq)

    for olbl, oexpr in zip(op_labels, op_expressions):
        mx = create_operation(oexpr, state_space, basis_obj)
        mdl.operations[Label(olbl)] = _make_op(mx, gate_type, basis_obj)

    mdl._mark_for_rebuild()
    return mdl


def _noise_op_for_gate(udim_gate, basis_name, depol=None, stochastic=None, lindblad=None):
    """Build the noise operation (superop on the gate's qubits) from noise
    spec entries (reference: models/modelnoise.py conventions)."""
    d2 = udim_gate * udim_gate
    factors = []
    if depol is not None:
        factors.append(_op.DepolarizeOp(d2, float(depol)))
    if stochastic is not None:
        rates = np.asarray(stochastic, dtype=float)
        factors.append(_op.StochasticNoiseOp(d2, Basis.cast('pp', d2), rates))
    if lindblad is not None:
        coeffs = {}
        for k, val in lindblad.items():
            typ, lbls = k[0], k[1:]
            coeffs[(typ,) + tuple(lbls)] = val
        has_other = any(k[0] in ('S', 'C', 'A') for k in coeffs)
        param = 'H+s' if has_other else 'H'
        # map ('H','X')-style keys to basis labels
        init = {}
        for k, val in coeffs.items():
            if k[0] in ('H', 'S'):
                init[(k[0], k[1])] = val
        eg = _op.build_lindblad_errorgen(Basis.cast('pp', d2), param, initial_coeffs=init)
        factors.append(_op.ExpErrorgenOp(eg))
    if not factors:
        return None
    if len(factors) == 1:
        return factors[0]
    return _op.ComposedOp(factors)


def create_crosstalk_free_model(processor_spec, custom_gates=None,
                                depolarization_strengths=None, stochastic_error_probs=None,
                                lindblad_error_coeffs=None, depolarization_parameterization='depolarize',
                                stochastic_parameterization='stochastic',
                                lindblad_parameterization='auto', evotype=None,
                                simulator='auto', on_construction_error='raise',
                                independent_gates=False, independent_spam=True,
                                ensure_composed_gates=False, ideal_gate_type='auto',
                                ideal_spam_type='computational', implicit_idle_mode='none',
                                basis='pp'):
    """Create a crosstalk-free (local-noise) implicit model
    (reference: modelconstruction.create_crosstalk_free_model:1568).

    Per-gate noise given by the three dicts (keyed by gate name or
    (gate_name, qubits) label) acts only on each gate's target qubits.

    Supported knob values (non-default settings that would silently change
    semantics raise instead of being ignored): `ideal_gate_type`
    'auto'/'static' (static ideals) or 'full'/'full TP' (parameterized
    ideals); `ensure_composed_gates` wraps every gate in a ComposedOp;
    `on_construction_error` 'raise' or 'warn' (skip the failing gate's
    noise); `independent_spam` is vacuous here (one prep/povm pair, always
    its own parameters).  `independent_gates=True` (per-instance gate
    parameters), non-default noise parameterizations, alternate
    `ideal_spam_type`/`implicit_idle_mode`, and explicit `evotype`s other
    than densitymx semantics are not implemented.
    """
    from pygsti_tpu.models.localnoisemodel import LocalNoiseModel
    from pygsti_tpu.baseobjs.label import Label

    if depolarization_parameterization != 'depolarize':
        raise NotImplementedError(
            "depolarization_parameterization=%r is not implemented (only "
            "'depolarize'); express the noise via stochastic_error_probs or "
            "lindblad_error_coeffs instead" % (depolarization_parameterization,))
    if stochastic_parameterization != 'stochastic':
        raise NotImplementedError(
            "stochastic_parameterization=%r is not implemented (only "
            "'stochastic')" % (stochastic_parameterization,))
    if lindblad_parameterization != 'auto':
        raise NotImplementedError(
            "lindblad_parameterization=%r is not implemented (only 'auto', "
            "which infers H/H+s blocks from the given coefficients)"
            % (lindblad_parameterization,))
    if evotype not in (None, 'default', 'densitymx'):
        raise NotImplementedError(
            "evotype=%r: the TPU pipeline implements dense superoperator "
            "(densitymx) semantics only" % (evotype,))
    if on_construction_error not in ('raise', 'warn'):
        raise ValueError("on_construction_error must be 'raise' or 'warn'")
    if independent_gates:
        raise NotImplementedError(
            "independent_gates=True (independent parameters per gate "
            "instance) is not implemented; gate noise is shared by name")
    if ideal_gate_type not in ('auto', 'static', 'full', 'full TP', 'TP'):
        raise NotImplementedError(
            "ideal_gate_type=%r is not supported" % (ideal_gate_type,))
    if ideal_spam_type != 'computational':
        raise NotImplementedError(
            "ideal_spam_type=%r is not supported (only 'computational')"
            % (ideal_spam_type,))
    if implicit_idle_mode != 'none':
        raise NotImplementedError(
            "implicit_idle_mode=%r is not supported (only 'none'); model "
            "idle noise with an explicit '{idle}' gate instead"
            % (implicit_idle_mode,))

    pspec = processor_spec
    depolarization_strengths = depolarization_strengths or {}
    stochastic_error_probs = stochastic_error_probs or {}
    lindblad_error_coeffs = lindblad_error_coeffs or {}
    custom_gates = custom_gates or {}
    nq = pspec.num_qubits

    def noise_for(name_or_label):
        for key in (name_or_label, getattr(name_or_label, 'name', name_or_label)):
            d = depolarization_strengths.get(key)
            s = stochastic_error_probs.get(key)
            l = lindblad_error_coeffs.get(key)
            if d is not None or s is not None or l is not None:
                return d, s, l
        return None, None, None

    gate_members = collections.OrderedDict()
    for name in pspec.gate_names:
        if name in ('{idle}', '(idle)'):
            continue
        u = pspec.gate_unitaries[name]
        if callable(u):
            # continuously-parameterized gate -> op factory (reference:
            # localnoisemodel.py:198 gate_is_factory)
            gate_members[('__factory__', Label(name))] = u
            continue
        udim = u.shape[0]
        d2 = udim * udim
        smx = np.real(_ot.unitary_to_superop(u, Basis.cast(basis, d2)))
        if ideal_gate_type in ('auto', 'static'):
            ideal = _op.StaticArbitraryOp(smx)
        elif ideal_gate_type == 'full':
            ideal = _op.FullArbitraryOp(smx)
        else:  # 'full TP' / 'TP'
            ideal = _op.FullTPOp(smx)
        d, s, l = noise_for(Label(name))
        try:
            noise = _noise_op_for_gate(udim, basis, d, s, l)
        except Exception:
            if on_construction_error == 'raise':
                raise
            import warnings as _warnings
            _warnings.warn("Failed to construct noise for gate %r; "
                           "proceeding without it" % (name,))
            noise = None
        member = ideal if noise is None else _op.ComposedOp([ideal, noise])
        if ensure_composed_gates and not isinstance(member, _op.ComposedOp):
            member = _op.ComposedOp([member])
        if name in custom_gates:
            member = custom_gates[name]
        gate_members[Label(name)] = member

    # idle noise
    idle_member = None
    idle_names = [n for n in pspec.gate_names if n in ('{idle}', '(idle)')]
    if idle_names:
        d, s, l = noise_for(Label(idle_names[0])) if False else noise_for(idle_names[0])
        noise = _noise_op_for_gate(2 ** nq, basis, d, s, l)
        idle_member = noise if noise is not None else \
            _op.StaticArbitraryOp(np.eye(4 ** nq))

    # SPAM
    prep_noise = noise_for('rho0')
    prep_member = _st.ComputationalBasisState([0] * nq, basis)
    pn = _noise_op_for_gate(2 ** nq, basis, *prep_noise)
    if pn is not None:
        prep_member = _st.ComposedState(prep_member, pn)
    povm_noise = noise_for('Mdefault')
    povm_member = _pv.ComputationalBasisPOVM(nq, basis)
    mn = _noise_op_for_gate(2 ** nq, basis, *povm_noise)
    if mn is not None:
        povm_member = _pv.ComposedPOVM(mn, povm_member)

    factory_fns = {lbl: fn for key, fn in list(gate_members.items())
                   if isinstance(key, tuple) and key[0] == '__factory__'
                   for lbl in [key[1]]}
    for key in [k for k in gate_members
                if isinstance(k, tuple) and k[0] == '__factory__']:
        del gate_members[key]

    mdl = LocalNoiseModel(pspec, gate_members, prep_member, povm_member,
                          basis=basis, simulator=simulator, idle_member=idle_member)
    if factory_fns:
        from pygsti_tpu.modelmembers.opfactory import UnitaryOpFactory
        for lbl, fn in factory_fns.items():
            # probe udim from a zero-arg call; default to 1-qubit
            try:
                udim = np.asarray(fn((0.0,))).shape[0]
            except Exception:
                udim = 2
            mdl.factories['gates'][lbl.name] = UnitaryOpFactory(fn, udim, basis)
    return mdl


def create_cloud_crosstalk_model(processor_spec, custom_gates=None,
                                 depolarization_strengths=None,
                                 stochastic_error_probs=None,
                                 lindblad_error_coeffs=None,
                                 evotype=None, simulator='auto',
                                 independent_gates=True, errcomp_type='gates',
                                 implicit_idle_mode='none', basis='pp',
                                 verbosity=0):
    """Create a cloud-crosstalk implicit model: per-gate noise may act on
    qubits OTHER than the gate's targets, specified with stencil labels
    (reference: modelconstruction.create_cloud_crosstalk_model:1772).

    ``lindblad_error_coeffs`` maps gate names to ``{(typ, spec): rate}``
    where ``typ`` is 'H' or 'S' and ``spec`` is ``'PAULIS:q1,q2,...'``:
    each ``q`` is either ``@k`` (the gate's k-th target qubit) or an
    absolute qubit label, e.g. ``('H', 'X:@0')``, ``('S', 'XX:@0,@1')``,
    ``('S', 'X:2')`` (always qubit 2, wherever the gate acts).  A bare
    ``'PAULIS'`` spec (no colon) applies to the gate's target qubits.
    ``depolarization_strengths`` / ``stochastic_error_probs`` act on the
    gate's target qubits (as in the crosstalk-free constructor).

    Non-default `evotype`/`independent_gates`/`errcomp_type`/
    `implicit_idle_mode` values raise NotImplementedError rather than being
    silently ignored.
    """
    from pygsti_tpu.models.cloudnoisemodel import CloudNoiseModel
    from pygsti_tpu.baseobjs.label import Label

    if evotype not in (None, 'default', 'densitymx'):
        raise NotImplementedError(
            "evotype=%r: only dense superoperator (densitymx) semantics are "
            "implemented" % (evotype,))
    if not independent_gates:
        raise NotImplementedError(
            "independent_gates=False (stencil-shared cloud parameters "
            "across gate instances) is not implemented: each (gate, "
            "targets) cloud gets its own parameters here")
    if errcomp_type != 'gates':
        raise NotImplementedError(
            "errcomp_type=%r is not implemented (only 'gates': noise "
            "composed as error maps)" % (errcomp_type,))
    if implicit_idle_mode != 'none':
        raise NotImplementedError(
            "implicit_idle_mode=%r is not supported (only 'none')"
            % (implicit_idle_mode,))

    pspec = processor_spec
    depolarization_strengths = depolarization_strengths or {}
    stochastic_error_probs = stochastic_error_probs or {}
    lindblad_error_coeffs = lindblad_error_coeffs or {}
    custom_gates = custom_gates or {}
    nq = pspec.num_qubits
    qlbls = tuple(pspec.qubit_labels)

    def _resolve_spec(spec, targets):
        """'PAULIS[:q1,q2]' -> list of (pauli_char, absolute_qubit)."""
        if ':' in spec:
            paulis, qs = spec.split(':')
            qubits = []
            for q in qs.split(','):
                q = q.strip()
                if q.startswith('@'):
                    qubits.append(targets[int(q[1:])])
                else:
                    qubits.append(type(qlbls[0])(q) if not isinstance(
                        qlbls[0], str) else q)
        else:
            paulis, qubits = spec, list(targets)
        assert len(paulis) == len(qubits), \
            "Pauli string %r does not match qubit list %r" % (paulis, qubits)
        return list(zip(paulis, qubits))

    gate_members = collections.OrderedDict()
    cloud_members_blk = collections.OrderedDict()
    cloud_map = {}

    for name in pspec.gate_names:
        if name in ('{idle}', '(idle)'):
            continue
        u = pspec.gate_unitaries[name]
        udim = u.shape[0]
        d2 = udim * udim
        ideal = _op.StaticArbitraryOp(
            np.real(_ot.unitary_to_superop(u, Basis.cast(basis, d2))))
        member = custom_gates.get(name, ideal)
        # target-local depol/stochastic noise composes onto the gate itself
        d = depolarization_strengths.get(name)
        s = stochastic_error_probs.get(name)
        local_noise = _noise_op_for_gate(udim, basis, d, s, None)
        if local_noise is not None:
            member = _op.ComposedOp([member, local_noise])
        gate_members[Label(name)] = member

        lcoeffs = lindblad_error_coeffs.get(name)
        if not lcoeffs:
            continue
        for targets in pspec.resolved_availability(name):
            targets = tuple(targets)
            # resolve all specs; the union of touched qubits is the cloud
            resolved = {}
            cloud_set = set()
            for key, rate in lcoeffs.items():
                typ, spec = key[0], key[1]
                assert typ in ('H', 'S'), \
                    "cloud-crosstalk noise supports 'H' and 'S' terms " \
                    "(reference C/A stencils not implemented)"
                pq = _resolve_spec(spec, targets)
                resolved[key] = (typ, pq, rate)
                cloud_set.update(q for _, q in pq)
            cloud = tuple(sorted(cloud_set, key=lambda x: qlbls.index(x)))
            m = len(cloud)
            init = {}
            for typ, pq, rate in resolved.values():
                chars = ['I'] * m
                for p, q in pq:
                    chars[cloud.index(q)] = p
                init[(typ, ''.join(chars))] = \
                    init.get((typ, ''.join(chars)), 0.0) + rate
            has_s = any(k[0] == 'S' for k in init)
            param = 'H+s' if has_s else 'H'
            eg = _op.build_lindblad_errorgen(Basis.cast(basis, 4 ** m),
                                             param, initial_coeffs=init)
            key = (name, targets)
            cloud_members_blk[key] = _op.ExpErrorgenOp(eg)
            cloud_map[(Label(name), targets)] = (key, cloud)

    # global idle / SPAM noise on all qubits
    idle_member = None
    for idle_name in ('{idle}', '(idle)'):
        lc = lindblad_error_coeffs.get(idle_name)
        if lc:
            init = {}
            for key, rate in lc.items():
                typ, spec = key[0], key[1]
                pq = _resolve_spec(spec, qlbls)
                chars = ['I'] * nq
                for p, q in pq:
                    chars[qlbls.index(q)] = p
                init[(typ, ''.join(chars))] = rate
            has_s = any(k[0] == 'S' for k in init)
            eg = _op.build_lindblad_errorgen(Basis.cast(basis, 4 ** nq),
                                             'H+s' if has_s else 'H',
                                             initial_coeffs=init)
            idle_member = _op.ExpErrorgenOp(eg)

    prep_member = _st.ComputationalBasisState([0] * nq, basis)
    pn = _noise_op_for_gate(2 ** nq, basis,
                            depolarization_strengths.get('rho0'),
                            stochastic_error_probs.get('rho0'),
                            lindblad_error_coeffs.get('rho0'))
    if pn is not None:
        prep_member = _st.ComposedState(prep_member, pn)
    povm_member = _pv.ComputationalBasisPOVM(nq, basis)
    mn = _noise_op_for_gate(2 ** nq, basis,
                            depolarization_strengths.get('Mdefault'),
                            stochastic_error_probs.get('Mdefault'),
                            lindblad_error_coeffs.get('Mdefault'))
    if mn is not None:
        povm_member = _pv.ComposedPOVM(mn, povm_member, basis)

    return CloudNoiseModel(pspec, gate_members, prep_member, povm_member,
                           cloud_map, cloud_members_blk, basis=basis,
                           simulator=simulator, idle_member=idle_member)


def create_identity_vec(basis):
    """The identity superket in `basis` (reference:
    modelconstruction.create_identity_vec:114)."""
    from pygsti_tpu.baseobjs.basis import Basis
    from pygsti_tpu.tools.basistools import stdmx_to_vec
    b = basis if isinstance(basis, Basis) else Basis.cast(basis, None)
    udim = int(round(np.sqrt(b.dim)))
    return np.real(np.asarray(stdmx_to_vec(np.eye(udim).astype(complex),
                                           b))).ravel()


def create_explicit_alias_model(mdl_primitives, alias_dict):
    """A model whose gates are compositions of an existing model's gates,
    per `alias_dict` {new_label: Circuit of primitive labels}; SPAM is
    copied unchanged (reference:
    modelconstruction.create_explicit_alias_model:720)."""
    from pygsti_tpu.modelmembers.operations import FullArbitraryOp
    mdl_new = mdl_primitives.copy()
    for lbl in list(mdl_new.operations.keys()):
        del mdl_new.operations[lbl]
    for alias_lbl, circuit in alias_dict.items():
        mx = np.eye(mdl_primitives.dim)
        for layer in circuit.layertup:
            mx = np.asarray(
                mdl_primitives.operations[layer].to_dense()) @ mx
        mdl_new.operations[alias_lbl] = FullArbitraryOp(mx)
    if hasattr(mdl_new, '_mark_for_rebuild'):
        mdl_new._mark_for_rebuild()
    return mdl_new


def create_cloud_crosstalk_model_from_hops_and_weights(
        processor_spec, custom_gates=None, max_idle_weight=1,
        max_spam_weight=1, maxhops=0, extra_weight_1_hops=0,
        extra_gate_weight=0, simulator="auto", evotype=None,
        gate_type="H+S", spam_type="H+S", implicit_idle_mode="none",
        errcomp_type="gates", independent_gates=True, independent_spam=True,
        connected_highweight_errors=False, basis='pp', verbosity=0):
    """Cloud-crosstalk model from maximum error weights and graph hops
    (reference:
    modelconstruction.create_cloud_crosstalk_model_from_hops_and_weights:2013).

    Thin alias of
    :func:`pygsti_tpu.models.cloudnoisemodel.create_cloud_crosstalk_model_from_hops_and_weights`
    (the working implementation), with `independent_gates` mapped to its
    `independent_clouds`.  `independent_spam` is vacuous here (one
    prep/povm pair).  See that function for which non-default knob values
    raise."""
    from pygsti_tpu.models.cloudnoisemodel import \
        create_cloud_crosstalk_model_from_hops_and_weights as _impl
    return _impl(processor_spec, custom_gates=custom_gates,
                 max_idle_weight=max_idle_weight,
                 max_spam_weight=max_spam_weight, maxhops=maxhops,
                 extra_weight_1_hops=extra_weight_1_hops,
                 extra_gate_weight=extra_gate_weight, simulator=simulator,
                 evotype=evotype, gate_type=gate_type, spam_type=spam_type,
                 implicit_idle_mode=implicit_idle_mode,
                 errcomp_type=errcomp_type,
                 independent_clouds=independent_gates,
                 connected_highweight_errors=connected_highweight_errors,
                 basis=basis, verbosity=verbosity)
