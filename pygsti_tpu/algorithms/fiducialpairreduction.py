"""Fiducial pair reduction (reference:
pygsti/algorithms/fiducialpairreduction.py:59,302,511).

For each germ, only a subset of (prep_fiducial, meas_fiducial) pairs is
needed to detect the germ's amplified parameters.  We build, per germ, the
sensitivity matrix M[(i,j), k] = d p_{ij} / d (amplified direction k) --
the derivative of the fiducial-pair probability through the germ's twirled
derivative -- and greedily select pairs until M reaches full column rank.
"""

from __future__ import annotations

import numpy as np

from pygsti_tpu.baseobjs.verbosityprinter import VerbosityPrinter
from pygsti_tpu.algorithms.germselection import twirled_deriv, _nongauge_projector


def _germ_pair_sensitivities(model, germ, prep_fiducials, meas_fiducials,
                             non_gauge_projector=None, eps=1e-6):
    """[n_pairs*n_outcomes, n_amp_directions] sensitivity matrix + the number
    of amplified directions for this germ."""
    proj = non_gauge_projector if non_gauge_projector is not None \
        else _nongauge_projector(model)
    T = twirled_deriv(model, germ, eps) @ proj          # [d2*d2, P]
    # amplified directions: right singular vectors with nonzero singular value
    U, s, Vh = np.linalg.svd(T, full_matrices=False)
    keep = s > 1e-8 * max(s[0], 1e-30)
    directions = Vh[keep]                                # [n_amp, P]
    dG_dirs = T @ directions.conj().T                    # [d2*d2, n_amp]
    d2 = model.dim
    n_amp = dG_dirs.shape[1]

    prep_lbl = model._default_prep_label()
    povm_lbl = model._default_povm_label()
    rho0 = model.preps[prep_lbl].to_dense()
    E_stack = model.povms[povm_lbl].to_dense()           # [n_out, d2]

    rows = []
    pair_index = []
    for i, f1 in enumerate(prep_fiducials):
        rho = rho0.copy()
        for l in f1.layertup:
            rho = model.operations[l].to_dense() @ rho
        for j, f2 in enumerate(meas_fiducials):
            H = np.eye(d2)
            for l in f2.layertup:
                H = model.operations[l].to_dense() @ H
            E_eff = E_stack @ H                          # [n_out, d2]
            for e in range(E_eff.shape[0]):
                # d p / d direction_k = E_eff[e] . dG_k . rho
                row = np.array([np.real(E_eff[e] @ dG_dirs[:, k].reshape(d2, d2) @ rho)
                                for k in range(n_amp)])
                rows.append(row)
                pair_index.append((i, j))
    return np.stack(rows), pair_index, n_amp, directions


from pygsti_tpu.tools.argchecks import check_unsupported as _check_unsupported


def find_sufficient_fiducial_pairs_per_germ(target_model, prep_fiducials,
                                            meas_fiducials, germs,
                                            prepovm_tuples="first", search_mode="greedy",
                                            constrain_to_tp=True, n_random=100,
                                            min_iterations=None, base_loweig_tol=1e-1,
                                            seed=None, verbosity=0, num_soln_returned=1,
                                            type_soln_returned='best', retry_for_smaller=True,
                                            mem_limit=None):
    """Per-germ fiducial pair reduction (reference:
    fiducialpairreduction.find_sufficient_fiducial_pairs_per_germ:302).
    Returns {germ: [(iPrep, iMeas), ...]}.

    The greedy rank-building search is the only implemented mode
    (reference search_mode='greedy'); multi-solution returns and
    non-default prepovm tuples raise.  `retry_for_smaller` is vacuous with
    a single returned solution; `n_random` applies only to the
    unimplemented 'random' mode."""
    _check_unsupported('find_sufficient_fiducial_pairs_per_germ',
                       prepovm_tuples=(prepovm_tuples, 'first'),
                       search_mode=(search_mode, 'greedy'),
                       constrain_to_tp=(constrain_to_tp, True),
                       min_iterations=(min_iterations, None),
                       num_soln_returned=(num_soln_returned, 1),
                       type_soln_returned=(type_soln_returned, 'best'))
    printer = VerbosityPrinter.create_printer(verbosity)
    model = target_model.rotate(max_rotate=1e-2, seed=seed) \
        if target_model.state_space.num_qubits == 1 else \
        target_model.depolarize(max_op_noise=1e-2, seed=seed)
    proj = _nongauge_projector(model)

    out = {}
    for germ in germs:
        M, pair_index, n_amp, _dirs = _germ_pair_sensitivities(
            model, germ, prep_fiducials, meas_fiducials, proj)
        if n_amp == 0:
            out[germ] = [(0, 0)]
            continue
        # greedy: add the pair whose rows most increase the rank / conditioning
        chosen_pairs = []
        chosen_rows = []
        pair_rows = {}
        for r, pi in zip(M, pair_index):
            pair_rows.setdefault(pi, []).append(r)
        remaining = list(pair_rows.keys())
        cur_rank = 0
        while cur_rank < n_amp and remaining:
            best = None
            for pi in remaining:
                trial = chosen_rows + pair_rows[pi]
                s = np.linalg.svd(np.stack(trial), compute_uv=False)
                rank = int(np.sum(s > 1e-8 * max(s[0], 1e-30)))
                smin = s[min(rank, n_amp) - 1] if rank > 0 else 0.0
                if best is None or (rank, smin) > (best[1], best[2]):
                    best = (pi, rank, smin)
            chosen_pairs.append(best[0])
            chosen_rows.extend(pair_rows[best[0]])
            remaining.remove(best[0])
            cur_rank = best[1]
        out[germ] = chosen_pairs
        printer.log("  germ %s: %d/%d pairs (rank %d/%d)"
                    % (germ.str, len(chosen_pairs),
                       len(prep_fiducials) * len(meas_fiducials), cur_rank, n_amp), 2)
    return out


def find_sufficient_fiducial_pairs_per_germ_greedy(
        target_model, prep_fiducials, meas_fiducials, germs,
        prepovm_tuples="first", inv_trace_tol=10.0, initial_seed_mode='greedy',
        evd_tol=1e-10, sensitivity_threshold=1e-10, check_complete_fid_set=True,
        seed=None, verbosity=0, mem_limit=None):
    """Score-based greedy per-germ FPR (reference:
    fiducialpairreduction.find_sufficient_fiducial_pairs_per_germ_greedy:511):
    instead of stopping at full rank, keep adding pairs until the
    sum-of-inverse-eigenvalues of the pair-sensitivity Gram matrix is within
    `inv_trace_tol` times that of the full pair set (conditioning, not just
    rank).  The greedy seed is the only implemented `initial_seed_mode`;
    non-default prepovm tuples, eigenvalue tolerances and the
    completeness pre-check knob raise rather than being ignored."""
    _check_unsupported('find_sufficient_fiducial_pairs_per_germ_greedy',
                       prepovm_tuples=(prepovm_tuples, 'first'),
                       initial_seed_mode=(initial_seed_mode, 'greedy'),
                       evd_tol=(evd_tol, 1e-10),
                       sensitivity_threshold=(sensitivity_threshold, 1e-10),
                       check_complete_fid_set=(check_complete_fid_set, True))
    printer = VerbosityPrinter.create_printer(verbosity)
    model = target_model.rotate(max_rotate=1e-2, seed=seed) \
        if target_model.state_space.num_qubits == 1 else \
        target_model.depolarize(max_op_noise=1e-2, seed=seed)
    proj = _nongauge_projector(model)

    out = {}
    for germ in germs:
        M, pair_index, n_amp, _dirs = _germ_pair_sensitivities(
            model, germ, prep_fiducials, meas_fiducials, proj)
        if n_amp == 0:
            out[germ] = [(0, 0)]
            continue

        def inv_trace(rows):
            if not rows:
                return np.inf
            s = np.linalg.svd(np.stack(rows), compute_uv=False)
            ev = np.zeros(n_amp)
            ev[:min(len(s), n_amp)] = (s ** 2)[:n_amp]
            return float(np.sum(1.0 / np.clip(ev, 1e-30, None)))

        pair_rows = {}
        for r, pi in zip(M, pair_index):
            pair_rows.setdefault(pi, []).append(r)
        full_score = inv_trace([r for rows in pair_rows.values()
                                for r in rows])
        target_score = full_score * inv_trace_tol

        chosen_pairs, chosen_rows = [], []
        remaining = list(pair_rows.keys())
        while remaining:
            best = None
            for pi in remaining:
                s = inv_trace(chosen_rows + pair_rows[pi])
                if best is None or s < best[1]:
                    best = (pi, s)
            chosen_pairs.append(best[0])
            chosen_rows.extend(pair_rows[best[0]])
            remaining.remove(best[0])
            if best[1] <= target_score:
                break
        out[germ] = chosen_pairs
        printer.log("  germ %s: %d/%d pairs (inv-trace %.3g <= %.3g)"
                    % (germ.str, len(chosen_pairs), len(pair_rows),
                       inv_trace(chosen_rows), target_score), 2)
    return out


def find_sufficient_fiducial_pairs_per_germ_power(
        target_model, prep_fiducials, meas_fiducials, germs, max_lengths,
        prepovm_tuples="first", search_mode="greedy", constrain_to_tp=True,
        trunc_scheme="whole germ powers", n_random=100, min_iterations=None,
        base_loweig_tol=1e-1, seed=None, verbosity=0, mem_limit=None):
    """Per-(germ, L) fiducial pair reduction (reference:
    fiducialpairreduction.find_sufficient_fiducial_pairs_per_germ_power:668):
    sensitivities are computed for the germ RAISED TO ITS POWER at each
    max-length L (the operator that actually appears in the experiment),
    and pairs chosen per (germ, L).  Returns {(germ, L): [(iPrep,iMeas),..]}.

    Greedy search only; non-default prepovm tuples / search modes /
    iteration floors raise rather than being ignored."""
    _check_unsupported('find_sufficient_fiducial_pairs_per_germ_power',
                       prepovm_tuples=(prepovm_tuples, 'first'),
                       search_mode=(search_mode, 'greedy'),
                       constrain_to_tp=(constrain_to_tp, True),
                       min_iterations=(min_iterations, None))
    from pygsti_tpu.circuits.circuit import Circuit
    printer = VerbosityPrinter.create_printer(verbosity)
    model = target_model.rotate(max_rotate=1e-2, seed=seed) \
        if target_model.state_space.num_qubits == 1 else \
        target_model.depolarize(max_op_noise=1e-2, seed=seed)
    proj = _nongauge_projector(model)

    out = {}
    for germ in germs:
        glen = max(len(germ.layertup), 1)
        for L in max_lengths:
            power = max(L // glen, 1) if trunc_scheme == "whole germ powers" \
                else max(L, 1)
            germ_power = Circuit(germ.layertup * power, germ.line_labels)
            M, pair_index, n_amp, _dirs = _germ_pair_sensitivities(
                model, germ_power, prep_fiducials, meas_fiducials, proj)
            if n_amp == 0:
                out[(germ, L)] = [(0, 0)]
                continue
            pair_rows = {}
            for r, pi in zip(M, pair_index):
                pair_rows.setdefault(pi, []).append(r)
            chosen_pairs, chosen_rows = [], []
            remaining = list(pair_rows.keys())
            cur_rank = 0
            while cur_rank < n_amp and remaining:
                best = None
                for pi in remaining:
                    trial = chosen_rows + pair_rows[pi]
                    s = np.linalg.svd(np.stack(trial), compute_uv=False)
                    rank = int(np.sum(s > 1e-8 * max(s[0], 1e-30)))
                    smin = s[min(rank, n_amp) - 1] if rank > 0 else 0.0
                    if best is None or (rank, smin) > (best[1], best[2]):
                        best = (pi, rank, smin)
                chosen_pairs.append(best[0])
                chosen_rows.extend(pair_rows[best[0]])
                remaining.remove(best[0])
                cur_rank = best[1]
            out[(germ, L)] = chosen_pairs
            printer.log("  germ %s L=%d: %d/%d pairs"
                        % (germ.str, L, len(chosen_pairs), len(pair_rows)), 2)
    return out


def find_sufficient_fiducial_pairs(target_model, prep_fiducials, meas_fiducials,
                                   germs, test_lengths=(256, 2048), prepovm_tuples="first",
                                   tol=0.75, search_mode="sequential", n_random=100,
                                   seed=None, verbosity=0, test_pair_list=None,
                                   mem_limit=None, minimum_pairs=1):
    """Global (same pairs for all germs) reduction: union of per-germ needs
    (reference: fiducialpairreduction.find_sufficient_fiducial_pairs:59).

    Sufficiency is established by the per-germ SVD rank criterion rather
    than the reference's two-test-length amplification probe, so
    `test_lengths`/`tol` have no effect here and non-default values raise;
    `test_pair_list` (evaluate a fixed candidate list) is unimplemented."""
    _check_unsupported('find_sufficient_fiducial_pairs',
                       test_lengths=(tuple(test_lengths), ((256, 2048),)),
                       prepovm_tuples=(prepovm_tuples, 'first'),
                       tol=(tol, 0.75),
                       test_pair_list=(test_pair_list, None),
                       minimum_pairs=(minimum_pairs, 1))
    per_germ = find_sufficient_fiducial_pairs_per_germ(
        target_model, prep_fiducials, meas_fiducials, germs, seed=seed,
        verbosity=verbosity)
    union = set()
    for pairs in per_germ.values():
        union.update(pairs)
    return sorted(union)


def test_fiducial_pairs(fid_pairs, target_model, prep_fiducials,
                        meas_fiducials, germs, test_lengths=(256, 2048),
                        prep_povm_tuples="first", tol=0.75, verbosity=0,
                        mem_limit=None):
    """How many (non-gauge) model parameters the given fiducial pairs
    amplify (reference: fiducialpairreduction.test_fiducial_pairs:870).
    `fid_pairs` is a global list of (iPrep, iMeas) index 2-tuples or a
    per-germ dict of such lists.  Amplification is measured by the SVD
    rank of the pair-restricted sensitivity rows (not the reference's
    two-test-length probe), so non-default `test_lengths`/`tol` raise."""
    _check_unsupported('test_fiducial_pairs',
                       test_lengths=(tuple(test_lengths), ((256, 2048),)),
                       prep_povm_tuples=(prep_povm_tuples, 'first'),
                       tol=(tol, 0.75))
    proj = _nongauge_projector(target_model)
    total_rows = []
    for germ in germs:
        pairs = fid_pairs[germ] if isinstance(fid_pairs, dict) else fid_pairs
        rows, pair_index, n_amp, directions = _germ_pair_sensitivities(
            target_model, germ, prep_fiducials, meas_fiducials, proj)
        pair_set = set(tuple(p) for p in pairs)
        sel = [k for k, pi in enumerate(pair_index) if pi in pair_set]
        if not sel:
            continue
        # rows are in per-germ amplified-direction coordinates; map back to
        # full parameter space for cross-germ accumulation
        total_rows.append(rows[sel] @ directions)
    if not total_rows:
        return 0
    J = np.concatenate(total_rows, axis=0)
    s = np.linalg.svd(J, compute_uv=False)
    return int(np.sum(s > 1e-8 * max(s[0] if len(s) else 0.0, 1e-30)))


def find_sufficient_fiducial_pairs_per_germ_global(
        target_model, prep_fiducials, meas_fiducials, germs=None,
        initial_seed_mode='greedy', evd_tol=1e-10, sensitivity_threshold=1e-10,
        seed=None, verbosity=0, num_soln_returned=1, type_soln_returned='best',
        retry_for_smaller=True, mem_limit=None, germ_vector_spanning_set=None,
        precomputed_jacobians=None):
    """Per-germ fiducial-pair reduction scored against the GLOBAL germ-set
    amplified directions (reference:
    fiducialpairreduction.find_sufficient_fiducial_pairs_per_germ_global:668):
    pairs are added greedily per germ, but each addition is judged by the
    rank of the UNION of all selected sensitivity rows across germs (mapped
    to the full parameter space), so later germs need only cover directions
    earlier germs left unamplified.

    Single-solution greedy only; precomputed-jacobian / spanning-set
    injection and multi-solution returns raise rather than being ignored.
    `retry_for_smaller` is vacuous with a single returned solution."""
    _check_unsupported('find_sufficient_fiducial_pairs_per_germ_global',
                       initial_seed_mode=(initial_seed_mode, 'greedy'),
                       evd_tol=(evd_tol, 1e-10),
                       sensitivity_threshold=(sensitivity_threshold, 1e-10),
                       num_soln_returned=(num_soln_returned, 1),
                       type_soln_returned=(type_soln_returned, 'best'),
                       germ_vector_spanning_set=(germ_vector_spanning_set, None),
                       precomputed_jacobians=(precomputed_jacobians, None))
    printer = VerbosityPrinter.create_printer(verbosity)
    proj = _nongauge_projector(target_model)
    # full-param sensitivity rows per germ + the global achievable rank
    germ_data = {}
    all_rows = []
    for germ in germs:
        rows, pair_index, n_amp, directions = _germ_pair_sensitivities(
            target_model, germ, prep_fiducials, meas_fiducials, proj)
        rows_full = rows @ directions                 # [n_rows, P]
        germ_data[germ] = (rows_full, pair_index)
        all_rows.append(rows_full)
    stacked = np.concatenate(all_rows, axis=0)
    sv = np.linalg.svd(stacked, compute_uv=False)
    global_rank = int(np.sum(sv > 1e-8 * max(sv[0] if len(sv) else 0.0,
                                             1e-30)))

    out = {}
    selected_rows = []          # accumulated rows across germs
    current_rank = 0
    for germ in germs:
        rows_full, pair_index = germ_data[germ]
        pairs_order = list(dict.fromkeys(pair_index))
        chosen = []
        # this germ's own reachable union rank (for the stopping rule)
        germ_target_sv = np.linalg.svd(
            np.concatenate(selected_rows + [rows_full], axis=0)
            if selected_rows else rows_full, compute_uv=False)
        germ_target = int(np.sum(
            germ_target_sv > 1e-8 * max(germ_target_sv[0], 1e-30)))
        while current_rank < germ_target and len(chosen) < len(pairs_order):
            best = None
            for cand in pairs_order:
                if cand in chosen:
                    continue
                sel = [k for k, pi in enumerate(pair_index)
                       if pi in chosen or pi == cand]
                trial = np.concatenate(selected_rows + [rows_full[sel]],
                                       axis=0) if selected_rows                     else rows_full[sel]
                rank = np.linalg.matrix_rank(trial,
                                             tol=sensitivity_threshold)
                if best is None or rank > best[1]:
                    best = (cand, rank)
            if best is None or best[1] <= current_rank and chosen:
                # no candidate improves the union rank further
                if best[1] <= current_rank:
                    break
            chosen.append(best[0])
            current_rank = best[1]
        sel = [k for k, pi in enumerate(pair_index) if pi in chosen]
        selected_rows.append(rows_full[sel])
        out[germ] = chosen
        printer.log("  germ %s: %d pairs (union rank %d/%d)"
                    % (germ.str, len(chosen), current_rank, global_rank), 2)
    return out


get_per_germ_fid_pairs_global = find_sufficient_fiducial_pairs_per_germ_global


def filter_useless_fid_pairs(fid_pairs, target_model, prep_fiducials,
                             meas_fiducials, germ,
                             sensitivity_threshold=1e-10):
    """Drop pairs whose sensitivity rows are (numerically) zero for `germ`
    (reference: fiducialpairreduction.filter_useless_fid_pairs)."""
    rows, pair_index, _, _dirs = _germ_pair_sensitivities(
        target_model, germ, prep_fiducials, meas_fiducials)
    useful = set()
    for k, pi in enumerate(pair_index):
        if np.linalg.norm(rows[k]) > sensitivity_threshold:
            useful.add(pi)
    return [p for p in fid_pairs if tuple(p) in useful]


def compute_jacobian_dicts(target_model, germs, prep_fiducials,
                           meas_fiducials, comm=None, mem_limit=None,
                           verbosity=0):
    """Per-germ sensitivity Jacobians keyed by germ (reference:
    fiducialpairreduction.compute_jacobian_dicts)."""
    out = {}
    proj = _nongauge_projector(target_model)
    for germ in germs:
        rows, pair_index, n_amp = _germ_pair_sensitivities(
            target_model, germ, prep_fiducials, meas_fiducials, proj)
        out[germ] = {'jacobian': rows, 'pair_index': pair_index,
                     'num_amplified': n_amp}
    return out


def construct_compact_evd_cache(fiducial_indices, complete_jacobian,
                                element_map, eigenvalue_tolerance=1e-10):
    """{fid_index: U sqrt(e)} compact halves of each fiducial pair's
    Jacobian Gramian, where element_map gives each pair's rows of the
    complete Jacobian (reference:
    fiducialpairreduction.construct_compact_evd_cache:1519)."""
    from pygsti_tpu.algorithms.germselection import compact_EVD
    sqrteU = {}
    for fid_index in fiducial_indices:
        rows = np.take(complete_jacobian, element_map[fid_index], axis=0)
        e, U = compact_EVD(rows.T @ rows, eigenvalue_tolerance,
                           assume_hermitian=True)
        sqrteU[fid_index] = U @ np.diag(np.sqrt(np.abs(e)))
    return sqrteU
