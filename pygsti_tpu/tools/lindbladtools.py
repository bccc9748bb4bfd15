"""Lindblad / elementary-error-generator constructors.

Matches the reference conventions (pygsti/tools/lindbladtools.py:255,
arXiv:2103.01928) for the four elementary error generator types acting on a
density matrix rho:

  H:  L(rho) = -i [p, rho]
  S:  L(rho) = p rho p^dag - (1/2){p^dag p, rho}
  C:  L(rho) = p rho q^dag + q rho p^dag - (1/2){p^dag q + q^dag p, rho}
  A:  L(rho) = i (p rho q^dag - q rho p^dag + (1/2){p^dag q - q^dag p, rho})

Superoperators use the row-major vec convention: vec(A rho B) =
(A kron B^T) vec(rho).
"""

from __future__ import annotations

import numpy as np

from pygsti_tpu.baseobjs.basis import Basis
from pygsti_tpu.tools.basistools import change_basis


def _sandwich(a, b):
    """Superop of rho -> a rho b^dag in std (row-major vec) basis."""
    return np.kron(a, b.conj())


def _left(a):
    d = a.shape[0]
    return np.kron(a, np.identity(d))


def _right(a):
    d = a.shape[0]
    return np.kron(np.identity(d), a.T)


def create_elementary_errorgen(typ, p, q=None, sparse=False):
    """Elementary error generator superoperator in the std basis."""
    p = np.asarray(p, dtype=complex)
    pdag = p.conj().T
    if typ == 'H':
        assert q is None
        out = -1j * (_left(p) - _right(p))
    elif typ == 'S':
        assert q is None
        pdp = pdag @ p
        out = _sandwich(p, p) - 0.5 * (_left(pdp) + _right(pdp))
    elif typ == 'C':
        q = np.asarray(q, dtype=complex)
        qdag = q.conj().T
        anti = pdag @ q + qdag @ p
        out = _sandwich(p, q) + _sandwich(q, p) - 0.5 * (_left(anti) + _right(anti))
    elif typ == 'A':
        q = np.asarray(q, dtype=complex)
        qdag = q.conj().T
        anti = pdag @ q - qdag @ p
        out = 1j * (_sandwich(p, q) - _sandwich(q, p) + 0.5 * (_left(anti) + _right(anti)))
    else:
        raise ValueError("Invalid elementary errorgen type %r" % typ)
    return out


def create_elementary_errorgen_dual(typ, p, q=None, sparse=False):
    """Dual elementary error generators, normalized so that
    <dual_i, errorgen_j> = Tr(dual_i^dag errorgen_j) = delta_ij for the
    H/S/C/A family built on a trace-orthonormal basis (reference:
    lindbladtools.create_elementary_errorgen_dual)."""
    p = np.asarray(p, dtype=complex)
    d = p.shape[0]
    if typ == 'H':
        out = -1j * (_left(p) - _right(p)) / (2.0 * d)
    elif typ == 'S':
        out = _sandwich(p, p) / d
    elif typ == 'C':
        q = np.asarray(q, dtype=complex)
        out = (_sandwich(p, q) + _sandwich(q, p)) / (2 * d)
    elif typ == 'A':
        q = np.asarray(q, dtype=complex)
        out = 1j * (_sandwich(p, q) - _sandwich(q, p)) / (2 * d)
    else:
        raise ValueError("Invalid elementary errorgen type %r" % typ)
    return out


def create_pairing_normalized_errorgen_dual(typ, p, q=None):
    """A dual scaled so <dual, elementary_errorgen(typ, p, q)> = 1 EXACTLY
    at any Hilbert dimension (the fixed-scale duals above match the
    reference's convention, which pairs to 1 only at d = 2; coefficient
    extraction needs the exact pairing)."""
    out = create_elementary_errorgen_dual(typ, p, q)
    prim = create_elementary_errorgen(typ, p, q)
    scale = np.real(np.vdot(out, prim))
    assert abs(scale) > 1e-300, "degenerate elementary errorgen"
    return out / scale


def create_lindbladian_term_errorgen(typ, lindblad_term_basis_mx, other_mx=None, sparse=False):
    """'L-term' generators: H same as elementary-H; 'O' (other) terms are the
    general-Lindbladian off-diagonal generators
    L(rho) = A rho B^dag - (1/2){B^dag A, rho} (reference:
    lindbladtools.create_lindbladian_term_errorgen)."""
    a = np.asarray(lindblad_term_basis_mx, dtype=complex)
    if typ == 'H':
        return -1j * (_left(a) - _right(a))
    elif typ == 'O':
        b = np.asarray(other_mx, dtype=complex) if other_mx is not None else a
        bda = b.conj().T @ a
        return _sandwich(a, b) - 0.5 * (_left(bda) + _right(bda))
    raise ValueError("Invalid lindblad term type %r" % typ)


def elementary_errorgens_matrix(typ, basis_elements, mx_basis='pp'):
    """Stack of elementary errorgens (one per basis element, skipping the
    identity-like first element) converted to `mx_basis`; returns
    [n, d2, d2] ndarray.  For 'C'/'A', pairs (i<j) are enumerated row-major."""
    els = np.asarray(basis_elements)
    n = els.shape[0]
    out = []
    if typ in ('H', 'S'):
        for i in range(1, n):
            eg = create_elementary_errorgen(typ, els[i])
            out.append(change_basis(eg, 'std', mx_basis))
    else:
        for i in range(1, n):
            for j in range(i + 1, n):
                eg = create_elementary_errorgen(typ, els[i], els[j])
                out.append(change_basis(eg, 'std', mx_basis))
    return np.stack(out) if out else np.zeros((0, els.shape[1] ** 2, els.shape[1] ** 2))


def create_elementary_errorgen_pauli(typ, p, q=None, sparse=False):
    """Alias of create_elementary_errorgen for dense Pauli inputs
    (reference: lindbladtools.create_elementary_errorgen_pauli -- there a
    faster Pauli-specialized path; here the dense route is already fast)."""
    return create_elementary_errorgen(typ, p, q)


def create_elementary_errorgen_dual_pauli(typ, p, q=None, sparse=False):
    """Alias of create_elementary_errorgen_dual for Pauli inputs."""
    return create_elementary_errorgen_dual(typ, p, q)


def random_CPTP_error_generator_rates(num_qubits, errorgen_types=('H', 'S', 'C', 'A'),
                                      max_weights=None, H_params=(0., .01),
                                      SCA_params=(0., .01), error_metric=None,
                                      error_metric_value=None, seed=None):
    """Sample random error-generator rates whose exponential is CPTP
    (reference: lindbladtools.random_CPTP_error_generator_rates:767).

    H rates are normal(H_params); the S/C/A rates come from a randomly
    sampled positive-semidefinite Pauli-pair matrix M = A A^dag (scaled by
    SCA_params[1]), whose diagonal gives S rates and off-diagonals give
    C (real part) and A (imaginary part) rates -- PSD M guarantees the
    Lindbladian is completely positive.  `max_weights` restricts the Pauli
    weight per type; `error_metric='total_generator_error'` rescales so
    sum(S) + sum(H^2) equals `error_metric_value`.  Returns
    {ElementaryErrorgenLabel: rate}.
    """
    import numpy as _np
    from pygsti_tpu.tools.errgenproptools import (
        elementary_errorgen_basis_labels, _all_pauli_labels)
    from pygsti_tpu.errorgenpropagation.errorpropagator import (
        ElementaryErrorgenLabel)
    rng = _np.random.default_rng(seed)
    max_weights = max_weights or {}
    paulis = _all_pauli_labels(num_qubits)

    def wt(pl):
        x, z = pl.x_bits, pl.z_bits
        return bin(x | z).count('1')

    out = {}
    if 'H' in errorgen_types:
        wH = max_weights.get('H')
        for pl in paulis:
            if wH is not None and wt(pl) > wH:
                continue
            out[ElementaryErrorgenLabel('H', pl)] = float(
                rng.normal(H_params[0], H_params[1]))
    sca = [t for t in errorgen_types if t in ('S', 'C', 'A')]
    if sca:
        wS = max_weights.get('S')
        allowed = [pl for pl in paulis if wS is None or wt(pl) <= wS]
        K = len(allowed)
        A = rng.normal(0, 1, (K, K)) + 1j * rng.normal(0, 1, (K, K))
        M = (A @ A.conj().T) * (SCA_params[1] ** 2 / (2 * K))
        if 'C' not in errorgen_types and 'A' not in errorgen_types:
            M = _np.diag(_np.diag(M))  # diagonal-only stays PSD
        for i, pi in enumerate(allowed):
            if 'S' in errorgen_types:
                out[ElementaryErrorgenLabel('S', pi)] = float(_np.real(M[i, i]))
            for j in range(i + 1, K):
                pj = allowed[j]
                if 'C' in errorgen_types:
                    out[ElementaryErrorgenLabel('C', pi, pj)] = \
                        float(_np.real(M[i, j]))
                if 'A' in errorgen_types:
                    out[ElementaryErrorgenLabel('A', pi, pj)] = \
                        float(_np.imag(M[i, j]))
    if error_metric is not None:
        assert error_metric in ('total_generator_error', 'generator_infidelity')
        s_total = sum(v for k, v in out.items() if k.errorgen_type == 'S')
        h_total = sum(v ** 2 for k, v in out.items() if k.errorgen_type == 'H')
        cur = s_total + h_total
        if cur > 0:
            t = error_metric_value / cur
            for k in out:
                out[k] = out[k] * (t if k.errorgen_type != 'H'
                                   else _np.sqrt(t))
    return out
