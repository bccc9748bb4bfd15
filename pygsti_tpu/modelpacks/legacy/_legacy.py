"""Legacy model-pack machinery (reference: pygsti/modelpacks/legacy/).

Legacy packs use positional gate names ('Gx', 'Gix', 'Gcnot', ...) and
sslbl-free circuits over line label '*'.  Rather than duplicating circuit
data, each legacy module derives its fiducials/germs from the matching
smq* pack by renaming layers (the inverse of the reference's
`stdmodule_to_smqmodule` find-replace conversion) and builds its target
model from the same gate expressions the reference uses.
"""

from __future__ import annotations

from pygsti_tpu.circuits.circuit import Circuit

_CHAR = {'Gxpi2': 'x', 'Gypi2': 'y', 'Gzpi2': 'z', 'Gxpi4': 'x', 'Gn': 'n'}


def _legacy_layer_name(layer, nq):
    """Map an smq layer label to its legacy gate name."""
    if layer is None:
        comps = ()
    elif isinstance(layer, tuple) and not hasattr(layer, 'name'):
        comps = layer
    elif hasattr(layer, 'is_simple') and not layer.is_simple:
        comps = tuple(layer.components)
    else:
        comps = (layer,)
    if len(comps) == 0:
        return 'Gi' if nq == 1 else 'Gii'
    if len(comps) == 1:
        lbl = comps[0]
        sslbls = lbl.sslbls or (0,)
        if len(sslbls) > 1:
            return lbl.name  # multi-qubit gates keep their name (Gcnot, ...)
        if nq == 1:
            return 'G' + _CHAR[lbl.name]
        chars = ['i'] * nq
        chars[int(sslbls[0])] = _CHAR[lbl.name]
        return 'G' + ''.join(chars)
    chars = ['i'] * nq
    for lbl in comps:
        chars[int((lbl.sslbls or (0,))[0])] = _CHAR[lbl.name]
    return 'G' + ''.join(chars)


def convert_circuit_strs(strs, nq):
    """smq circuit strings -> legacy Circuits over line label '*'."""
    out = []
    for s in strs:
        c = Circuit(s)
        names = tuple(_legacy_layer_name(layer, nq) for layer in c.layertup)
        out.append(Circuit(names, line_labels=('*',)))
    return out


def populate(ns, smq_pack, description, gates, state_space, op_labels,
             op_expressions, effect_labels=None, effect_expressions=None):
    """Fill a legacy module namespace `ns` (a dict) with the standard
    legacy-pack surface derived from `smq_pack` (a GSTModelPack subclass)
    and the target-model expression table."""
    from pygsti_tpu.models.modelconstruction import \
        create_explicit_model_from_expressions

    nq = smq_pack._nqubits
    prepStrs = convert_circuit_strs(smq_pack._prep_fids, nq)
    effectStrs = convert_circuit_strs(smq_pack._meas_fids, nq)
    germs = convert_circuit_strs(smq_pack._germs, nq)
    germs_lite = convert_circuit_strs(
        smq_pack._germs_lite if smq_pack._germs_lite is not None
        else smq_pack._germs, nq)

    def target_model(parameterization_type="full", sim_type="auto"):
        kwargs = {}
        if effect_labels is not None:
            kwargs['effect_labels'] = effect_labels
            kwargs['effect_expressions'] = effect_expressions
        mdl = create_explicit_model_from_expressions(
            state_space, list(op_labels), list(op_expressions), **kwargs)
        if parameterization_type not in ("full", "full arbitrary"):
            mdl.set_all_parameterizations(parameterization_type)
        return mdl

    def processor_spec():
        return target_model('static').create_processor_spec(None)

    ns.update(description=description, gates=list(gates),
              prepStrs=prepStrs, effectStrs=effectStrs,
              fiducials=prepStrs, prep_fiducials=prepStrs,
              meas_fiducials=effectStrs, germs=germs, germs_lite=germs_lite,
              target_model=target_model, processor_spec=processor_spec)

    cc = _clifford_compilation_for(smq_pack, gates)
    if cc is not None:
        ns['clifford_compilation'] = cc


def _clifford_compilation_for(smq_pack, legacy_gates):
    """Legacy-named Clifford compilation table (reference: e.g.
    std1Q_XYI.py:74, std2Q_XYI.py:200), derived from the BFS-computed smq
    compilation.  1Q packs get 'Gc0'..'Gc23'; 2Q packs with per-qubit
    x/y gates get the paired 'Gc{i}c{j}' table.  None when inapplicable."""
    import collections

    nq = smq_pack._nqubits
    base = smq_pack.clifford_compilation() if nq == 1 else None
    if nq == 1:
        if base is None:
            return None
        has_idle = 'Gi' in legacy_gates
        out = collections.OrderedDict()
        for cname, word in base.items():
            names = ['G' + _CHAR[lbl[0]] for lbl in word if lbl != ()]
            if not names:
                names = ['Gi'] if has_idle else \
                    ['G' + _CHAR[smq_pack._gates[0]]] * 4
            out[cname] = names
        return out

    if nq == 2 and {'Gxi', 'Gyi', 'Gix', 'Giy'} <= set(legacy_gates) \
       and 'Gii' in legacy_gates:
        # per-qubit 1Q compilation tiled in parallel, padded with idles
        from pygsti_tpu.modelpacks.smq1Q_XYI import _Pack as _XYI
        base = _XYI.clifford_compilation()
        if base is None:
            return None
        chars = {c: ([_CHAR[lbl[0]] for lbl in w if lbl != ()] or ['i'])
                 for c, w in base.items()}
        maxlen = max(len(v) for v in chars.values())
        # packs with parallel two-qubit names ('Gxx', ...) get the full
        # 576-entry paired table (reference: std2Q_XXYYII.py); others only
        # the one-sided 'Gc0c{j}' / 'Gc{i}c0' entries (reference:
        # std2Q_XYI.py:200)
        full = {'Gxx', 'Gyy', 'Gxy', 'Gyx'} <= set(legacy_gates)
        pairs = [(i, j) for i in range(24) for j in range(24)] if full \
            else [(0, j) for j in range(24)] + \
                 [(i, 0) for i in range(1, 24)]
        out = collections.OrderedDict()
        for i, j in pairs:
            ci, cj = chars['Gc%d' % i], chars['Gc%d' % j]
            row = []
            for k in range(maxlen):
                a = ci[k] if k < len(ci) else 'i'
                b = cj[k] if k < len(cj) else 'i'
                row.append('G' + a + b)
            out['Gc%dc%d' % (i, j)] = row
        return out
    return None
