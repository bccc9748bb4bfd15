"""Contract models to physically-valid (CP / TP / CPTP) sets
(reference: pygsti/algorithms/contract.py:24)."""

from __future__ import annotations

import numpy as np

from pygsti_tpu.tools import optools as _ot
from pygsti_tpu.tools.basistools import change_basis
from pygsti_tpu.tools.jamiolkowski import (fast_jamiolkowski_iso_std,
                                           fast_jamiolkowski_iso_std_inv)


def _contract_op_to_cp(mx, basis='pp'):
    """Project a superoperator onto the CP cone: clip negative Choi
    eigenvalues to zero (the reference's direct CP contraction)."""
    std = change_basis(np.asarray(mx), basis, 'std')
    choi = fast_jamiolkowski_iso_std(std, 'std')
    evals, evecs = np.linalg.eigh((choi + choi.conj().T) / 2)
    clipped = np.clip(evals, 0, None)
    choi_cp = (evecs * clipped) @ evecs.conj().T
    std_cp = fast_jamiolkowski_iso_std_inv(choi_cp, 'std')
    return np.real(change_basis(std_cp, 'std', basis))


def _contract_op_to_tp(mx):
    """Force the first row to e0 (identity-first basis TP condition)."""
    mx = np.array(mx)
    mx[0, :] = 0
    mx[0, 0] = 1.0
    return mx


def contract(model, to_what, dataset=None, maxiter=100, tol=1e-7, use_direct_cp=True,
             method="Nelder-Mead", verbosity=0):
    """Contract a model to 'CP', 'TP', 'CPTP', 'vSPAM' or 'nothing'
    (reference: contract.contract:24).  CPTP iterates CP and TP
    projections (Dykstra-style alternation).

    The reference's dataset-driven experimental-probability targets
    ('XP'/'XPTP') and its optimization-based CP path
    (use_direct_cp=False, tuned by `method`) are not implemented and
    raise; the direct eigenvalue-projection CP used here is the
    reference's use_direct_cp=True default."""
    if to_what in ('XP', 'XPTP'):
        raise NotImplementedError(
            "to_what=%r (contract so the DATASET's circuit probabilities "
            "lie in [0,1]) is not implemented; use 'CP'/'TP'/'CPTP'"
            % (to_what,))
    if not use_direct_cp:
        raise NotImplementedError(
            "use_direct_cp=False (optimization-based CP contraction, tuned "
            "by `method`) is not implemented; the direct eigenvalue "
            "projection (the reference default) is always used")
    new_model = model.copy()
    if to_what == 'nothing':
        return new_model
    basis = model.basis

    for lbl, op in list(new_model.operations.items()):
        mx = op.to_dense()
        if to_what in ('TP', 'XPTP'):
            mx = _contract_op_to_tp(mx)
        elif to_what in ('CP', 'XP'):
            mx = _contract_op_to_cp(mx, basis)
        elif to_what == 'CPTP':
            for _ in range(maxiter):
                mx_cp = _contract_op_to_cp(mx, basis)
                mx_tp = _contract_op_to_tp(mx_cp)
                if np.max(np.abs(mx_tp - mx)) < tol:
                    mx = mx_tp
                    break
                mx = mx_tp
        elif to_what == 'vSPAM':
            continue
        else:
            raise ValueError("Invalid contraction target %r" % to_what)
        new_model.operations[lbl] = type(op)(mx) if type(op).__name__ != 'StaticArbitraryOp' \
            else type(op)(mx)

    if to_what == 'vSPAM' or to_what in ('CPTP', 'CP'):
        # contract SPAM to valid states: clip density-matrix eigenvalues
        from pygsti_tpu.tools.basistools import vec_to_stdmx, stdmx_to_vec
        for lbl, prep in list(new_model.preps.items()):
            vec = prep.to_dense()
            rho = vec_to_stdmx(vec, basis)
            evals, evecs = np.linalg.eigh((rho + rho.conj().T) / 2)
            clipped = np.clip(evals, 0, None)
            if clipped.sum() > 0:
                clipped = clipped / clipped.sum()
            rho2 = (evecs * clipped) @ evecs.conj().T
            new_vec = np.real(stdmx_to_vec(rho2, basis))
            try:
                new_model.preps[lbl] = type(prep)(new_vec)
            except AssertionError:
                pass  # parameterization constraint (e.g. TP first element)
    new_model._mark_for_rebuild()
    return new_model
