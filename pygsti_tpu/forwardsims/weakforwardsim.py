"""Weak (shot-sampling) forward simulation and the CHP text backend
(reference: pygsti/forwardsims/weakforwardsim.py:20 WeakForwardSimulator;
pygsti/evotypes/chp/ — CHP program-text generation).

The TPU framework's stabilizer machinery IS an Aaronson-Gottesman
simulator, so the "CHP" path here serializes circuits to CHP program text
(interop) while outcome sampling runs on the internal symplectic tableau
(no external binary needed).
"""

from __future__ import annotations

import numpy as np

from pygsti_tpu.baseobjs.outcomelabeldict import OutcomeLabelDict
from pygsti_tpu.tools import symplectic as sym


def circuit_to_chp_program(circuit, pspec=None):
    """Serialize a Clifford circuit to CHP (Aaronson-Gottesman) program text:
    lines of 'h q' / 'p q' / 'c q1 q2' / 'm q' (reference: evotypes/chp/).

    Gates are compiled to the CHP primitive set {H, P, CNOT} via the
    symplectic compiler when they are not already primitives.
    """
    from pygsti_tpu.algorithms.compilers import synthesize_symplectic
    qubits = list(circuit.line_labels)
    qidx = {q: i for i, q in enumerate(qubits)}
    lines = ['#', '']
    direct = {'Gh': 'h', 'Gp': 'p', 'Gcnot': 'c'}
    srep_dict = dict(sym.compute_internal_gate_symplectic_representations())
    if pspec is not None:
        srep_dict.update(pspec.compute_clifford_symplectic_reps())
    for i in range(circuit.depth):
        lbl = circuit.layertup[i]
        comps = lbl.components if not lbl.is_simple else (lbl,)
        for g in comps:
            if g.name in direct:
                qs = ' '.join(str(qidx[q]) for q in g.sslbls)
                lines.append('%s %s' % (direct[g.name], qs))
            else:
                # compile to H/P/CNOT generators
                if g.name not in srep_dict:
                    raise ValueError("Non-Clifford gate %s in CHP export"
                                     % g.name)
                s_g, p_g = srep_dict[g.name]
                gen_gates = synthesize_symplectic(s_g)
                for gen, local_qs in gen_gates:
                    mapped = [qidx[g.sslbls[lq]] for lq in local_qs]
                    if gen == 'CNOT':
                        lines.append('c %d %d' % (mapped[0], mapped[1]))
                    elif gen == 'H':
                        lines.append('h %d' % mapped[0])
                    elif gen == 'P':
                        lines.append('p %d' % mapped[0])
    for i in range(len(qubits)):
        lines.append('m %d' % i)
    return '\n'.join(lines) + '\n'


def sample_stabilizer_outcome(state_s, state_p, rand_state):
    """Sample one computational-basis outcome from a stabilizer state,
    measuring qubits in order with collapse."""
    n = len(state_p) // 2
    s, p = state_s, state_p
    bits = []
    for a in range(n):
        p0, st0, p1, st1 = sym.pauli_z_measurement(s, p, a)
        if p1 == 0.0 or (p0 > 0 and rand_state.uniform() < p0):
            bits.append(0)
            s, p = st0
        else:
            bits.append(1)
            s, p = st1
    return tuple(bits)


class WeakForwardSimulator(object):
    """Outcome probabilities as average frequencies over `shots` sampled
    runs (reference: weakforwardsim.py:20)."""

    def __init__(self, shots, model=None, base_seed=None):
        self.shots = shots
        self.model = model
        self.base_seed = base_seed if base_seed is not None else 2026

    def _compute_circuit_outcome_for_shot(self, circuit, rand_state,
                                          time=None):
        raise NotImplementedError

    def probs(self, circuit, outcomes=None, time=None, clip_to=None):
        counts = {}
        for k in range(self.shots):
            rng = np.random.RandomState(self.base_seed + k)
            out = self._compute_circuit_outcome_for_shot(circuit, rng, time)
            counts[out] = counts.get(out, 0) + 1
        keep = None if outcomes is None else \
            {OutcomeLabelDict.to_outcome(o) for o in outcomes}
        d = OutcomeLabelDict()
        for out, cnt in sorted(counts.items()):
            key = (''.join(map(str, out)),)
            if keep is not None and key not in keep:
                continue
            d[key] = cnt / self.shots
        if clip_to is not None:
            for k in d:
                d[k] = float(np.clip(d[k], clip_to[0], clip_to[1]))
        return d

    def bulk_probs(self, circuits, clip_to=None, resource_alloc=None,
                   smartc=None):
        return {c: self.probs(c, clip_to=clip_to) for c in circuits}


class CHPForwardSimulator(WeakForwardSimulator):
    """Weak simulator over the internal Aaronson-Gottesman tableau (the
    framework's CHP-equivalent backend; reference: evotypes/chp/ +
    weakforwardsim.py).  Also exports circuits as CHP program text."""

    def __init__(self, shots=100, model=None, base_seed=None, pspec=None):
        super().__init__(shots, model, base_seed)
        self.pspec = pspec

    def _compute_circuit_outcome_for_shot(self, circuit, rand_state,
                                          time=None):
        s_c, p_c = sym.symplectic_rep_of_clifford_circuit(circuit,
                                                          pspec=self.pspec)
        n = len(circuit.line_labels)
        st = sym.prep_stabilizer_state(n)
        out_s, out_p = sym.apply_clifford_to_stabilizer_state(s_c, p_c, *st)
        return sample_stabilizer_outcome(out_s, out_p, rand_state)

    def to_chp_program(self, circuit):
        return circuit_to_chp_program(circuit, self.pspec)
