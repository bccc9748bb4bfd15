"""QubitProcessorSpec: the device's native gate set + connectivity
(reference: pygsti/processors/processorspec.py:853)."""

from __future__ import annotations

import numpy as np

from pygsti_tpu.baseobjs.qubitgraph import QubitGraph
from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.tools.internalgates import standard_gatename_unitaries


class QubitProcessorSpec(object):
    """Specification of a quantum processor: qubits, native gates, availability."""

    def __init__(self, num_qubits, gate_names, nonstd_gate_unitaries=None,
                 availability=None, geometry=None, qubit_labels=None):
        self.num_qubits = num_qubits
        self.qubit_labels = tuple(qubit_labels) if qubit_labels is not None \
            else tuple(range(num_qubits))
        self.gate_names = list(gate_names)
        std = standard_gatename_unitaries()
        self.gate_unitaries = {}
        nonstd = nonstd_gate_unitaries or {}
        for name in self.gate_names:
            if name in nonstd:
                u = nonstd[name]
                # callables are op-factory generators (continuously
                # parameterized gates, e.g. Gzr;theta)
                self.gate_unitaries[name] = u if callable(u) else np.asarray(u)
            elif name in std:
                self.gate_unitaries[name] = std[name]
            elif name in ('{idle}', '(idle)', 'Gidle', '[]', ''):
                self.gate_unitaries[name] = np.eye(2 ** num_qubits, dtype=complex)
            else:
                raise ValueError("Unknown gate name %r (provide nonstd_gate_unitaries)" % name)

        if geometry is None or isinstance(geometry, str):
            self.qubit_graph = QubitGraph.common_graph(
                num_qubits, geometry or 'fully_connected', qubit_labels=self.qubit_labels)
        else:
            self.qubit_graph = geometry

        self.availability = {}
        availability = availability or {}
        for name in self.gate_names:
            if name in availability:
                self.availability[name] = availability[name]
            else:
                self.availability[name] = 'all-edges'

    def gate_num_qubits(self, gate_name):
        u = self.gate_unitaries[gate_name]
        if u is None:
            return self.num_qubits
        if callable(u):
            u = np.asarray(u((0.0,)))
        return int(round(np.log2(u.shape[0])))

    def resolved_availability(self, gate_name, tuple_or_function='tuple'):
        """Concrete tuple of target-qubit tuples for a gate."""
        avail = self.availability.get(gate_name, 'all-edges')
        nq_gate = self.gate_num_qubits(gate_name)
        if isinstance(avail, (list, tuple)) and avail not in ('all-edges', 'all-permutations'):
            return tuple(tuple(a) for a in avail)
        if nq_gate == self.num_qubits:
            return (self.qubit_labels,) if self.num_qubits > 1 else \
                tuple((q,) for q in self.qubit_labels)
        if nq_gate == 1:
            return tuple((q,) for q in self.qubit_labels)
        if nq_gate == 2:
            edges = self.qubit_graph.edges()
            if avail == 'all-permutations':
                return tuple(e for edge in edges for e in (tuple(edge), tuple(reversed(edge))))
            return tuple(tuple(e) for e in edges)
        raise ValueError("Cannot resolve availability for %d-qubit gate" % nq_gate)

    @property
    def idle_gate_names(self):
        return [n for n in self.gate_names if n in ('{idle}', '(idle)', 'Gidle', '[]', '')]

    @property
    def primitive_op_labels(self):
        """All concrete (gate, qubits) labels.  The global idle gets the empty
        label ``Label(())`` (printed '[]'), matching the reference convention."""
        out = []
        for name in self.gate_names:
            if name in ('{idle}', '(idle)', '[]', ''):
                out.append(Label(()))
                continue
            if self.gate_num_qubits(name) == self.num_qubits and self.num_qubits > 1:
                out.append(Label(name, self.qubit_labels))
                continue
            for targets in self.resolved_availability(name):
                out.append(Label(name, targets))
        return out

    def compute_clifford_symplectic_reps(self, subset=None):
        from pygsti_tpu.tools import symplectic
        out = {}
        for name in (subset if subset is not None else self.gate_names):
            u = self.gate_unitaries.get(name)
            if u is None:
                continue
            try:
                s, p = symplectic.unitary_to_symplectic(u)
                out[name] = (s, p)
            except ValueError:
                pass  # not a Clifford
        return out


class ProcessorSpec(object):
    """Base class for processor specifications (reference:
    processorspec.ProcessorSpec:37)."""


class QuditProcessorSpec(ProcessorSpec):
    """Specification of a qudit processor: per-qudit Hilbert dimensions
    plus native gates given as unitaries (reference:
    processorspec.QuditProcessorSpec:51)."""

    def __init__(self, qudit_labels, qudit_udims, gate_names,
                 nonstd_gate_unitaries=None, availability=None,
                 geometry=None, prep_names=('rho0',), povm_names=('Mdefault',)):
        self.qudit_labels = tuple(qudit_labels)
        self.qudit_udims = tuple(qudit_udims)
        self.gate_names = list(gate_names)
        self.gate_unitaries = dict(nonstd_gate_unitaries or {})
        std = standard_gatename_unitaries()
        for name in self.gate_names:
            if name not in self.gate_unitaries and name in std:
                self.gate_unitaries[name] = std[name]
        self.availability = dict(availability or {})
        self.geometry = geometry
        self.prep_names = tuple(prep_names)
        self.povm_names = tuple(povm_names)

    @property
    def num_qudits(self):
        return len(self.qudit_labels)

    @property
    def udim(self):
        out = 1
        for u in self.qudit_udims:
            out *= u
        return out

    def gate_num_qudits(self, gate_name):
        u = self.gate_unitaries.get(gate_name)
        if u is None or callable(u):
            return 1
        import numpy as _np
        dim = _np.asarray(u).shape[0]
        for n in range(1, len(self.qudit_labels) + 1):
            prod = 1
            for ud in self.qudit_udims[:n]:
                prod *= ud
            if prod == dim:
                return n
        return 1
