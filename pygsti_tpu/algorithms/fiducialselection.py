"""Fiducial selection: informationally complete prep/meas fiducial sets
(reference: pygsti/algorithms/fiducialselection.py:29, 2019 LoC).

Prep fiducials F_j must make {F_j |rho>>} span superket space; measurement
fiducials H_i must make {<<E_e| H_i} span superbra space.  Scoring uses the
eigenvalues of the Gram-like matrix R R^T ('all' = sum of inverse
eigenvalues, 'worst' = 1/min eigenvalue); selection is greedy from short
candidate words.
"""

from __future__ import annotations

import itertools

import numpy as np

from pygsti_tpu.baseobjs.verbosityprinter import VerbosityPrinter
from pygsti_tpu.circuits.circuit import Circuit


def _prep_vectors(model, fiducials):
    """[n_fid * n_preps, d2] of F|rho> vectors."""
    rows = []
    for f in fiducials:
        for plbl in model.prep_keys:
            rho = model.preps[plbl].to_dense()
            for l in f.layertup:
                rho = model.operations[l].to_dense() @ rho
            rows.append(rho)
    return np.stack(rows)


def _meas_vectors(model, fiducials):
    """[n_fid * n_effects, d2] of <E|H vectors."""
    rows = []
    for f in fiducials:
        H = np.eye(model.dim)
        for l in f.layertup:
            H = model.operations[l].to_dense() @ H
        for mlbl in model.povm_keys:
            for evec in model.povms[mlbl].to_dense():
                rows.append(evec @ H)
    return np.stack(rows)


def compute_composite_fiducial_score(model, fiducials, prep_or_meas,
                                     score_func='all'):
    """(score, n_spanned, eigenvalues) for a fiducial set."""
    R = _prep_vectors(model, fiducials) if prep_or_meas == 'prep' \
        else _meas_vectors(model, fiducials)
    gram = R.T @ R
    evals = np.linalg.eigvalsh(gram)[::-1]
    d2 = model.dim
    n_spanned = int(np.sum(evals > 1e-10 * max(evals[0], 1e-30)))
    safe = np.clip(evals[:d2], 1e-30, None)
    score = float(np.sum(1.0 / safe)) if score_func == 'all' else float(1.0 / safe[-1])
    return score, n_spanned, evals


def test_fiducial_list(model, fiducials, prep_or_meas, score_func='all',
                       return_all=False, threshold=1e6):
    """True if the fiducial set is informationally complete."""
    score, n_spanned, evals = compute_composite_fiducial_score(
        model, fiducials, prep_or_meas, score_func)
    ok = (n_spanned >= model.dim) and score < threshold
    if return_all:
        return ok, score, evals
    return ok


def find_fiducials(target_model, omit_identity=True, eq_thresh=1e-6,
                   ops_to_omit=None, force_empty=True, candidate_fid_counts=4,
                   algorithm='greedy', algorithm_kwargs=None, verbosity=1,
                   prep_fids=True, meas_fids=True, assume_clifford=False,
                   candidate_list=None):
    """Find prep and measurement fiducial sets (reference:
    fiducialselection.find_fiducials:29).  Returns (prep_fiducials,
    meas_fiducials) (either None if disabled)."""
    printer = VerbosityPrinter.create_printer(verbosity)
    model = target_model
    op_labels = [l for l in model.operations.keys()
                 if not (ops_to_omit and l in ops_to_omit)]
    if omit_identity:
        from pygsti_tpu.baseobjs.label import Label
        op_labels = [l for l in op_labels if l != Label(())]
    lls = model.state_space.qubit_labels

    if candidate_list is not None:
        candidates = list(candidate_list)
    else:
        max_len = candidate_fid_counts if isinstance(candidate_fid_counts, int) else 4
        candidates = []
        for L in range(0 if force_empty else 1, max_len + 1):
            for combo in itertools.product(op_labels, repeat=L):
                candidates.append(Circuit(combo, lls))

    def greedy(prep_or_meas):
        chosen = [Circuit((), lls)] if force_empty else []
        d2 = model.dim
        best_score, n_spanned, _ = compute_composite_fiducial_score(
            model, chosen, prep_or_meas) if chosen else (np.inf, 0, None)
        while n_spanned < d2:
            best = None
            for cand in candidates:
                if cand in chosen:
                    continue
                s, ns, _ = compute_composite_fiducial_score(
                    model, chosen + [cand], prep_or_meas)
                if best is None or (ns, -s) > (best[1], -best[2]):
                    best = (cand, ns, s)
            if best is None:
                break
            chosen.append(best[0])
            n_spanned, best_score = best[1], best[2]
            printer.log("  %s fiducials: added %s -> %d/%d spanned"
                        % (prep_or_meas, best[0].str, n_spanned, d2), 2)
        assert n_spanned >= d2, "Could not find complete %s fiducials" % prep_or_meas
        # a few more greedy adds can improve conditioning; try one extra pass
        improved = True
        while improved:
            improved = False
            for cand in candidates:
                if cand in chosen:
                    continue
                s, ns, _ = compute_composite_fiducial_score(
                    model, chosen + [cand], prep_or_meas)
                if s < 0.7 * best_score:
                    chosen.append(cand)
                    best_score = s
                    improved = True
                    break
        return chosen

    prep = greedy('prep') if prep_fids else None
    meas = greedy('meas') if meas_fids else None
    return prep, meas
