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
