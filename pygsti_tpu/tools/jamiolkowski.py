"""Choi <-> superoperator (Jamiolkowski) isomorphism.

Matches the reference's convention (pygsti/tools/jamiolkowski.py): the Choi
matrix is trace-normalized, J(Lambda) = (1/d) sum_ij Lambda(E_ij) kron E_ij
expressed in the 'pp' (or given) basis so a CPTP map gives trace(J) = 1 and
J >= 0.
"""

from __future__ import annotations

import numpy as np

from pygsti_tpu.baseobjs.basis import Basis
from pygsti_tpu.tools.basistools import change_basis


def jamiolkowski_iso(operation_mx, op_mx_basis='pp', choi_mx_basis='pp', normalized=True):
    """Superoperator -> Choi matrix in `choi_mx_basis`.

    Convention (matching the reference, jamiolkowski.py:141-159): J is the
    expansion of the std-basis superoperator in the operator basis
    {B_i kron B_j^*}:  S_std = sum_ij (d * J_ij) B_i kron B_j^*, so that a
    CPTP map yields J >= 0 with trace(J) = 1 (when `normalized`).
    """
    std = change_basis(np.asarray(operation_mx), op_mx_basis, 'std')
    d2 = std.shape[0]
    d = int(round(np.sqrt(d2)))
    b = Basis.cast(choi_mx_basis, d2)
    els = b.elements
    n = els.shape[0]
    svec = std.flatten()
    choi = np.empty((n, n), dtype=complex)
    for i in range(n):
        for j in range(n):
            bij = np.kron(els[i], els[j].conj())
            choi[i, j] = (bij.conj().flatten() @ svec) / np.linalg.norm(bij) ** 2
    if normalized:
        choi /= d
    return choi


def jamiolkowski_iso_inv(choi_mx, choi_mx_basis='pp', op_mx_basis='pp', normalized=True):
    """Inverse of jamiolkowski_iso."""
    choi = np.asarray(choi_mx)
    n = choi.shape[0]
    d2 = n
    d = int(round(np.sqrt(d2)))
    b = Basis.cast(choi_mx_basis, d2)
    els = b.elements
    scale = d if normalized else 1.0
    std = np.zeros((d2, d2), dtype=complex)
    for i in range(n):
        for j in range(n):
            std += (scale * choi[i, j]) * np.kron(els[i], els[j].conj())
    return change_basis(std, 'std', op_mx_basis)


def fast_jamiolkowski_iso_std(operation_mx, op_mx_basis='pp'):
    """Superoperator -> Choi matrix in the *std* basis (trace-normalized)."""
    std = change_basis(np.asarray(operation_mx), op_mx_basis, 'std')
    d2 = std.shape[0]
    d = int(round(np.sqrt(d2)))
    return std.reshape(d, d, d, d).transpose(0, 2, 1, 3).reshape(d2, d2) / d


def fast_jamiolkowski_iso_std_inv(choi_mx, op_mx_basis='pp'):
    choi = np.asarray(choi_mx)
    d2 = choi.shape[0]
    d = int(round(np.sqrt(d2)))
    std = choi.reshape(d, d, d, d).transpose(0, 2, 1, 3).reshape(d2, d2) * d
    return change_basis(std, 'std', op_mx_basis)


def sum_of_negative_choi_eigenvalues(model):
    """Sum over gates of the magnitudes of negative Choi eigenvalues."""
    total = 0.0
    for lbl, op in model.operations.items():
        choi = fast_jamiolkowski_iso_std(op.to_dense(), model.basis)
        evals = np.linalg.eigvalsh((choi + choi.conj().T) / 2)
        total += -float(np.sum(evals[evals < 0]))
    return total


def sums_of_negative_choi_eigenvalues(model):
    out = []
    for lbl, op in model.operations.items():
        choi = fast_jamiolkowski_iso_std(op.to_dense(), model.basis)
        evals = np.linalg.eigvalsh((choi + choi.conj().T) / 2)
        out.append(-float(np.sum(evals[evals < 0])))
    return out


def sum_of_negative_choi_eigenvalues_gate(gate_mx, mx_basis='pp'):
    """Sum of negative Choi eigenvalues of a single gate matrix (reference:
    jamiolkowski.sum_of_negative_choi_eigenvalues_gate)."""
    import numpy as np
    J = fast_jamiolkowski_iso_std(gate_mx, mx_basis)
    evals = np.linalg.eigvals(J)
    return float(sum(-ev.real for ev in evals if ev.real < 0))


def magnitudes_of_negative_choi_eigenvalues(model, dimensions=None):
    """List of |negative Choi eigenvalues| over all model operations
    (reference: jamiolkowski.magnitudes_of_negative_choi_eigenvalues)."""
    import numpy as np
    out = []
    for lbl in model.operations.keys():
        J = fast_jamiolkowski_iso_std(
            np.asarray(model.operations[lbl].to_dense()), model.basis
            if hasattr(model, 'basis') else 'pp')
        evals = np.linalg.eigvals(J)
        out.extend([-ev.real for ev in evals if ev.real < 0])
    return out
