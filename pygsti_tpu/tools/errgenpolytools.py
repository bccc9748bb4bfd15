"""Outcome probabilities as POLYNOMIALS in error-generator rates
(reference: pygsti/tools/errgenpolytools.py).

The reference builds symbolic polynomials through BCH/Magnus machinery;
here the Taylor coefficients are computed exactly with the dense
elementary-errorgen superoperators (16^n cost, <= 3 qubits) and returned
as compact `Polynomial` objects over rate-variable indices -- enabling the
"evaluate probabilities/sensitivities at many rate settings without
re-propagation" workflow (the v0.10 flagship speedup).
"""

from __future__ import annotations

import numpy as np

from pygsti_tpu.baseobjs.polynomial import Polynomial
from pygsti_tpu.tools import symplectic as _sym
from pygsti_tpu.tools.errgenproptools import (errorgen_label_to_dense,
                                              StabilizerAmplitudes)


def errorgen_gate_contributors(errorgen_label, circuit, propagator=None):
    """Which circuit layers' error generators propagate onto the given
    end-of-circuit label (reference:
    errgenpolytools.errorgen_gate_contributors).  Requires a propagator
    with per-layer label maps; returns layer indices."""
    assert propagator is not None, "Provide an ErrorGeneratorPropagator"
    out = []
    per_layer = propagator.propagate_errorgens_per_layer(circuit) \
        if hasattr(propagator, 'propagate_errorgens_per_layer') else None
    if per_layer is None:
        return out
    for t, layer in enumerate(per_layer):
        if errorgen_label in layer:
            out.append(t)
    return out


def stabilizer_probability_polynomial(errorgen_labels, state_s, state_p,
                                      bitstring, order=2):
    """p(bitstring) as a Polynomial in the rates of `errorgen_labels`
    (reference: errgenpolytools.
    stabilizer_probability_correction_symbolic_polynomial, built dense).

    Exact Taylor expansion of <b| exp(sum_j r_j L_j) rho |b> through
    `order`; variable index j corresponds to errorgen_labels[j].
    """
    bits = np.asarray(list(bitstring), np.int64)
    n = len(state_p) // 2
    d = 2 ** n
    amps = StabilizerAmplitudes(state_s, state_p)
    psi = np.array([amps.amplitude(np.array(
        [(k >> (n - 1 - q)) & 1 for q in range(n)], np.int64))
        for k in range(d)], complex)
    rho = np.outer(psi, psi.conj())
    b_idx = 0
    for q in range(n):
        b_idx = (b_idx << 1) | int(bits[q])

    Ls = [errorgen_label_to_dense(l, n) for l in errorgen_labels]
    coeffs = {(): float(np.real(rho[b_idx, b_idx]))}
    vec = rho.reshape(-1)
    # first order: <b| L_j rho |b>
    Lvecs = [L @ vec for L in Ls]
    for j, lv in enumerate(Lvecs):
        c = float(np.real(lv.reshape(d, d)[b_idx, b_idx]))
        if abs(c) > 1e-15:
            coeffs[(j,)] = c
    if order >= 2:
        for j in range(len(Ls)):
            for k in range(j, len(Ls)):
                if j == k:
                    # (1/2) <b| L_j^2 rho |b>
                    c = 0.5 * float(np.real(
                        (Ls[j] @ Lvecs[j]).reshape(d, d)[b_idx, b_idx]))
                else:
                    # coefficient of r_j r_k: (1/2)<b|(L_j L_k + L_k L_j)rho|b>
                    m = Ls[j] @ Lvecs[k] + Ls[k] @ Lvecs[j]
                    c = 0.5 * float(np.real(m.reshape(d, d)[b_idx, b_idx]))
                if abs(c) > 1e-15:
                    coeffs[(j, k)] = c
    assert order <= 2, "polynomial construction implemented through order 2"
    return Polynomial(coeffs, max_num_vars=len(Ls))


def circuit_probability_polynomial(propagator, circuit, bitstring,
                                   pspec=None, order=2):
    """End-to-end: propagate the circuit's error generators and return
    p(bitstring) as a Polynomial in the propagated rates.  Returns
    (polynomial, labels) where labels[j] is variable j's errorgen label."""
    errorgens = propagator.propagate_errorgens(circuit, pspec=pspec)
    labels = list(errorgens.keys())
    n = propagator.num_qubits
    srep = _sym.symplectic_rep_of_clifford_circuit(circuit, pspec=pspec)
    st = _sym.prep_stabilizer_state(n)
    out_s, out_p = _sym.apply_clifford_to_stabilizer_state(srep[0], srep[1],
                                                           *st)
    poly = stabilizer_probability_polynomial(labels, out_s, out_p,
                                             bitstring, order)
    return poly, labels
