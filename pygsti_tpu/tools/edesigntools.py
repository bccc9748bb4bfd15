"""Experiment-design tools: runtime estimation and Fisher information
(reference: pygsti/tools/edesigntools.py:
calculate_edesign_estimated_runtime:17,
calculate_fisher_information_per_circuit:125,
calculate_fisher_information_matrix:328,
calculate_fisher_information_matrices_by_L:464,
pad_edesign_with_idle_lines:853).

Fisher information uses the TPU jacobian path: per-circuit outcome-prob
jacobians from jax, F = sum_o N/p_o j_o j_o^T.
"""

from __future__ import annotations

import collections

import numpy as np


def calculate_edesign_estimated_runtime(edesign, gate_time_dict=None,
                                        gate_time_1Q=None, gate_time_2Q=None,
                                        measure_reset_time=0.0,
                                        interbatch_latency=0.0,
                                        total_shots_per_circuit=1000,
                                        shots_per_circuit_per_batch=None,
                                        circuits_per_batch=None):
    """Estimated wall-clock time to run an experiment design
    (reference: edesigntools.py:17)."""
    assert gate_time_dict is not None or \
        (gate_time_1Q is not None and gate_time_2Q is not None), \
        "Specify gate_time_dict, or gate_time_1Q and gate_time_2Q"

    def comp_time(comp):
        if gate_time_dict is not None:
            t = gate_time_dict.get(comp, None)
            if t is None:
                t = gate_time_dict.get(comp.name, None)
            assert t is not None, "no gate time for %s" % str(comp)
            return t
        nq = len(comp.sslbls) if comp.sslbls else 1
        return gate_time_1Q if nq == 1 else gate_time_2Q

    def layer_time(layer):
        comps = layer.components if not layer.is_simple else (layer,)
        return max((comp_time(c) for c in comps), default=0.0)

    circuits = list(edesign.all_circuits_needing_data)
    circuit_times = []
    for c in circuits:
        t = sum(layer_time(c.layertup[i]) for i in range(c.depth))
        circuit_times.append(t + measure_reset_time)

    n_circuits = len(circuits)
    if circuits_per_batch is None:
        circuits_per_batch = n_circuits
    if shots_per_circuit_per_batch is None:
        shots_per_circuit_per_batch = total_shots_per_circuit

    n_batches = int(np.ceil(n_circuits / circuits_per_batch))
    n_rounds = int(np.ceil(total_shots_per_circuit / shots_per_circuit_per_batch))

    total_circ_time = sum(circuit_times) * shots_per_circuit_per_batch * n_rounds
    total_latency = interbatch_latency * n_batches * n_rounds
    return total_circ_time + total_latency


def calculate_fisher_information_per_circuit(model, circuits, approx=True,
                                             regularization=1e-8, verbosity=0,
                                             comm=None, mem_limit=None):
    """{circuit: per-circuit Fisher information matrix [P, P]} for one shot
    (reference: edesigntools.py:125).  F_c = sum_o (1/p_o) j_o j_o^T (the
    expected information of a single multinomial draw)."""
    import jax
    import jax.numpy as jnp
    P = model.num_params
    fims = {}
    v = jnp.asarray(model.to_vector())
    sim = model.sim
    for c in circuits:
        layout = sim.create_layout([c])
        pf = sim.probs_fn(layout)
        p = np.asarray(pf(v))
        J = np.asarray(jax.jacfwd(pf)(v))     # [n_out, P]
        pr = np.clip(p, regularization, None)
        F = (J / pr[:, None]).T @ J
        if not approx:
            # exact: subtract sum_o H_o (vanishes when outcomes sum to 1)
            H = np.asarray(jax.jacfwd(jax.jacrev(pf))(v))  # [n_out, P, P]
            F = F - np.sum(H, axis=0)
        fims[c] = F
    return fims


def calculate_fisher_information_matrix(model, circuits, num_shots=1,
                                        term_cache=None, approx=True,
                                        regularization=1e-8, verbosity=0,
                                        comm=None, mem_limit=None):
    """Total Fisher information over a circuit list (reference:
    edesigntools.py:328).  `num_shots` may be an int or {circuit: int}."""
    if term_cache is None:
        term_cache = {}
    missing = [c for c in circuits if c not in term_cache]
    if missing:
        term_cache.update(calculate_fisher_information_per_circuit(
            model, missing, approx, regularization, verbosity))
    P = model.num_params
    F = np.zeros((P, P))
    for c in circuits:
        n = num_shots[c] if isinstance(num_shots, dict) else num_shots
        F += n * term_cache[c]
    return F


def calculate_fisher_information_matrices_by_L(model, circuit_lists, Ls,
                                               num_shots=1, term_cache=None,
                                               approx=True,
                                               regularization=1e-8,
                                               cumulative=True, verbosity=0,
                                               comm=None, mem_limit=None):
    """{L: Fisher info matrix} for nested GST circuit lists (reference:
    edesigntools.py:464)."""
    if term_cache is None:
        term_cache = {}
    out = collections.OrderedDict()
    for L, cl in zip(Ls, circuit_lists):
        out[L] = calculate_fisher_information_matrix(
            model, list(cl), num_shots, term_cache, approx, regularization,
            verbosity)
    if not cumulative:
        prev = None
        for L in list(out.keys()):
            cur = out[L].copy()
            if prev is not None:
                out[L] = cur - prev
            prev = cur
    return out


def pad_edesign_with_idle_lines(edesign, line_labels):
    """Map an edesign onto more qubit lines, padding circuits with idle
    lines (reference: edesigntools.py:853)."""
    from pygsti_tpu.circuits.circuit import Circuit
    from pygsti_tpu.protocols.protocol import (ExperimentDesign,
                                               CircuitListsDesign)

    def pad(c):
        return Circuit(list(c.layertup), tuple(line_labels))

    if hasattr(edesign, 'circuit_lists'):
        new_lists = [[pad(c) for c in cl] for cl in edesign.circuit_lists]
        return CircuitListsDesign(new_lists, qubit_labels=tuple(line_labels))
    circuits = [pad(c) for c in edesign.all_circuits_needing_data]
    return ExperimentDesign(circuits, qubit_labels=tuple(line_labels))
