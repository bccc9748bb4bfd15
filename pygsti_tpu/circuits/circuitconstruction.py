"""Circuit-list construction utilities (reference:
pygsti/circuits/circuitconstruction.py)."""

from __future__ import annotations

import itertools

import numpy as np

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.circuits.gstcircuits import (repeat_with_max_length,
                                             repeat_and_truncate)


def to_circuits(list_of_op_label_tuples, line_labels=None):
    """Convert tuples of op labels into Circuits (reference:
    circuitconstruction.to_circuits)."""
    return [Circuit(t, line_labels=line_labels)
            for t in list_of_op_label_tuples]


def repeat(x, num_times, assert_at_least_one_rep=False):
    """x repeated num_times (reference: circuitconstruction.repeat)."""
    if assert_at_least_one_rep:
        assert num_times > 0
    return x * num_times


def repeat_count_with_max_length(x, max_length,
                                 assert_at_least_one_rep=False):
    """floor(max_length / len(x)) (reference:
    circuitconstruction.repeat_count_with_max_length)."""
    l = len(x)
    reps = max_length // l if l > 0 else 0
    if assert_at_least_one_rep:
        assert reps > 0
    return reps


def iter_all_circuits_onelen(op_labels, length):
    """All length-`length` circuits over op_labels (reference:
    circuitconstruction.iter_all_circuits_onelen)."""
    for combo in itertools.product(op_labels, repeat=length):
        yield Circuit(combo)


def list_all_circuits_onelen(op_labels, length):
    return list(iter_all_circuits_onelen(op_labels, length))


def iter_all_circuits(op_labels, min_length, max_length):
    """All circuits with min_length <= depth <= max_length (reference:
    circuitconstruction.iter_all_circuits)."""
    for L in range(min_length, max_length + 1):
        yield from iter_all_circuits_onelen(op_labels, L)


def list_all_circuits(op_labels, min_length, max_length):
    return list(iter_all_circuits(op_labels, min_length, max_length))


def list_all_circuits_without_powers_and_cycles(op_labels, max_length):
    """All circuits up to max_length excluding cyclic rotations and powers
    of shorter circuits -- the canonical germ-candidate set (reference:
    circuitconstruction.list_all_circuits_without_powers_and_cycles)."""
    out = []
    seen = set()
    for L in range(1, max_length + 1):
        for combo in itertools.product(op_labels, repeat=L):
            # exclude powers of shorter words
            is_power = False
            for d in range(1, L):
                if L % d == 0 and combo == combo[:d] * (L // d):
                    is_power = True
                    break
            if is_power:
                continue
            canon = min(combo[i:] + combo[:i] for i in range(L))
            if canon in seen:
                continue
            seen.add(canon)
            out.append(Circuit(combo))
    return out


def list_random_circuits_onelen(op_labels, length, count, seed=None):
    """`count` uniformly random circuits of the given length (reference:
    circuitconstruction.list_random_circuits_onelen)."""
    rng = np.random.RandomState(seed)
    ops = list(op_labels)
    return [Circuit([ops[rng.randint(len(ops))] for _ in range(length)])
            for _ in range(count)]


def list_partial_circuits(circuit):
    """All prefixes of a circuit, incl. empty and full (reference:
    circuitconstruction.list_partial_circuits)."""
    tup = tuple(circuit.layertup if isinstance(circuit, Circuit) else circuit)
    return [tuple(tup[:i]) for i in range(len(tup) + 1)]


def translate_circuit(circuit, alias_dict):
    """Replace op labels via alias_dict {label: tuple-of-labels} (reference:
    circuitconstruction.translate_circuit)."""
    if alias_dict is None:
        return circuit
    new_layers = []
    for lbl in circuit.layertup:
        if lbl in alias_dict:
            new_layers.extend(alias_dict[lbl])
        else:
            new_layers.append(lbl)
    return Circuit(tuple(new_layers), circuit.line_labels)


def translate_circuits(circuits, alias_dict):
    return [translate_circuit(c, alias_dict) for c in circuits]


def filter_circuits(circuits, sslbls_to_keep, new_sslbls=None, drop=False):
    """Keep only circuits whose gates act within sslbls_to_keep (reference:
    circuitconstruction.filter_circuits)."""
    out = []
    keep = set(sslbls_to_keep)
    for c in circuits:
        ok = True
        for layer in c.layertup:
            comps = (layer,) if layer.is_simple else tuple(layer.components)
            for comp in comps:
                if comp.sslbls is not None and not set(comp.sslbls) <= keep:
                    ok = False
                    break
            if not ok:
                break
        if ok:
            out.append(c)
        elif not drop:
            out.append(None)
    return out


def create_circuits(*args, **kwargs):
    """Create circuits via python-expression templates evaluated in a nested
    loop over the list/tuple keyword arguments (reference:
    circuitconstruction.create_circuits:28).  Example::

        create_circuits('f0+germ*e+f1', f0=fids, f1=fids, germ=germs, e=2)
    """
    import itertools
    lst = []
    loop_order = list(kwargs.pop('order', []))
    loop_lists = {}
    loop_locals = {'True': True, 'False': False, 'str': str, 'int': int,
                   'float': float}
    for key, val in kwargs.items():
        if type(val) in (list, tuple):
            loop_lists[key] = val
            if key not in loop_order:
                loop_order.append(key)
        else:
            loop_locals[key] = val

    for expr in args:
        if len(expr) == 0:
            lst.append(Circuit(()))
            continue
        keys = [k for k in loop_order if k in expr]
        for vals in itertools.product(*[loop_lists[k] for k in keys]):
            scope = {k: v for k, v in zip(keys, vals)}
            scope.update(loop_locals)
            try:
                result = eval(expr, {"__builtins__": {}}, scope)
            except AssertionError:
                continue
            if isinstance(result, Circuit):
                lst.append(result)
            elif isinstance(result, (list, tuple)):
                lst.append(Circuit(result))
            elif isinstance(result, str):
                from pygsti_tpu.io.stdinput import parse_circuit
                lst.append(parse_circuit(result))
        if not keys:
            # expression with no loop variables evaluates once (handled
            # above by the empty itertools.product)
            pass
    return lst


def create_lgst_circuits(prep_fiducials, meas_fiducials, op_label_src):
    """The circuits LGST needs: fiducials, fiducial pairs, and
    prep+gate+meas sandwiches (reference:
    circuitconstruction.create_lgst_circuits:470).  `op_label_src` is a
    Model or a list of operation labels."""
    if hasattr(op_label_src, 'operations'):
        op_labels = list(op_label_src.operations.keys())
    else:
        op_labels = list(op_label_src)
    singles = [Circuit((gl,), prep_fiducials[0].line_labels)
               for gl in op_labels]
    lgst_list = list(prep_fiducials) + list(meas_fiducials)
    seen = set(lgst_list)

    def add(c):
        if c not in seen:
            seen.add(c)
            lgst_list.append(c)

    for e in meas_fiducials:
        for r in prep_fiducials:
            add(r + e)
    for g in singles:
        for e in meas_fiducials:
            for r in prep_fiducials:
                add(r + g + e)
    return lgst_list


def list_circuits_lgst_can_estimate(dataset, prep_fiducials, meas_fiducials):
    """The circuits whose process matrices LGST can estimate from `dataset`:
    those `c` with every prep + c + meas sandwich present (reference:
    circuitconstruction.list_circuits_lgst_can_estimate:509)."""
    estimatable = []
    seen = set()
    ds_circuits = set(dataset.keys())
    for c in dataset.keys():
        # try interpreting c as prep + middle + meas for the FIRST pair and
        # then demand all sandwiches exist
        for r in prep_fiducials:
            for e in meas_fiducials:
                rl, el = len(r.layertup), len(e.layertup)
                if rl + el > len(c.layertup):
                    continue
                if tuple(c.layertup[:rl]) != tuple(r.layertup):
                    continue
                if el > 0 and tuple(c.layertup[-el:]) != tuple(e.layertup):
                    continue
                mid = Circuit(c.layertup[rl:len(c.layertup) - el],
                              c.line_labels)
                if mid in seen:
                    continue
                if all((r2 + mid + e2) in ds_circuits
                       for r2 in prep_fiducials for e2 in meas_fiducials):
                    seen.add(mid)
                    estimatable.append(mid)
    return estimatable


def manipulate_circuit(circuit, rules, line_labels="auto"):
    """Apply (find, replace) layer-tuple rewrite rules to a circuit,
    left-to-right without double-modification (reference:
    circuitconstruction.manipulate_circuit:684)."""
    if rules is None:
        return circuit
    layers = tuple(circuit.layertup)
    out = []
    i = 0
    while i < len(layers):
        for find, replace in rules:
            n = len(find)
            if tuple(layers[i:i + n]) == tuple(find):
                out.extend(replace)
                i += n
                break
        else:
            out.append(layers[i])
            i += 1
    lls = circuit.line_labels if line_labels == "auto" else line_labels
    return Circuit(tuple(out), lls)


def manipulate_circuits(circuits, rules, line_labels="auto"):
    """manipulate_circuit over a list (reference:
    circuitconstruction.manipulate_circuits)."""
    return [manipulate_circuit(c, rules, line_labels) for c in circuits]


def filter_circuit(circuit, sslbls_to_keep, new_sslbls=None, drop=False):
    """Keep only the gates acting within `sslbls_to_keep` (reference:
    circuitconstruction.filter_circuit)."""
    out = filter_circuits([circuit], sslbls_to_keep, new_sslbls, drop)
    return out[0] if out else None
