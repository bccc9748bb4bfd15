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

    algorithm_kwargs = dict(algorithm_kwargs or {})

    def run(prep_or_meas):
        if algorithm == 'greedy':
            return greedy(prep_or_meas)
        if algorithm == 'slack':
            return _integer_slack(model, candidates, prep_or_meas,
                                  force_empty, printer, **algorithm_kwargs)
        if algorithm == 'grasp':
            return _grasp(model, candidates, prep_or_meas, force_empty,
                          printer, greedy, **algorithm_kwargs)
        raise ValueError("Invalid algorithm: %r" % algorithm)

    prep = run('prep') if prep_fids else None
    meas = run('meas') if meas_fids else None
    return prep, meas


def _integer_slack(model, candidates, prep_or_meas, force_empty, printer,
                   fixed_slack=None, slack_frac=None, initial_weights=None,
                   max_iters=10000, **_ignored):
    """Integer-weight slack optimization (reference:
    fiducialselection.optimize_integer_fiducials_slack:29): start from the
    full candidate pool and remove fiducials while the composite score stays
    within the allowed slack and the set remains informationally complete."""
    from pygsti_tpu.circuits.circuit import Circuit
    if fixed_slack is None and slack_frac is None:
        slack_frac = 0.1
    lls = model.state_space.qubit_labels
    chosen = list(dict.fromkeys(
        ([Circuit((), lls)] if force_empty else []) + list(candidates)))
    d2 = model.dim
    cur_score, n_spanned, _ = compute_composite_fiducial_score(
        model, chosen, prep_or_meas)
    assert n_spanned >= d2, "Candidate pool is not informationally complete"
    for _ in range(max_iters):
        slack = fixed_slack if fixed_slack is not None \
            else abs(cur_score) * slack_frac
        best = None
        for f in chosen:
            if force_empty and f.depth == 0:
                continue
            trial = [x for x in chosen if x != f]
            s, ns, _ = compute_composite_fiducial_score(
                model, trial, prep_or_meas)
            if ns >= d2 and s <= cur_score + slack:
                if best is None or s < best[1]:
                    best = (f, s)
        if best is None:
            break
        chosen.remove(best[0])
        cur_score = best[1]
        printer.log("  slack: removed %s -> %d fiducials (score %.3g)"
                    % (best[0].str, len(chosen), cur_score), 2)
    return chosen


def _grasp(model, candidates, prep_or_meas, force_empty, printer,
           greedy_fn, iterations=5, alpha=0.5, seed=None, **_ignored):
    """GRASP fiducial search: randomized-greedy construction + pruning local
    search, best of `iterations` restarts (reference:
    fiducialselection GRASP mode via algorithms/grasp.py)."""
    from pygsti_tpu.circuits.circuit import Circuit
    rng = np.random.RandomState(seed)
    d2 = model.dim
    lls = model.state_space.qubit_labels
    best_solution = None
    for it in range(iterations):
        chosen = [Circuit((), lls)] if force_empty else []
        n_spanned = 0
        while n_spanned < d2:
            scored = []
            for cand in candidates:
                if cand in chosen:
                    continue
                s, ns, _ = compute_composite_fiducial_score(
                    model, chosen + [cand], prep_or_meas)
                scored.append((cand, ns, s))
            if not scored:
                break
            best_ns = max(x[1] for x in scored)
            top = sorted([x for x in scored if x[1] == best_ns],
                         key=lambda x: x[2])
            rcl = top[:max(1, int(np.ceil(alpha * len(top))))]
            pick = rcl[rng.randint(len(rcl))]
            chosen.append(pick[0])
            n_spanned = pick[1]
        if n_spanned < d2:
            continue
        # prune
        base_s, _, _ = compute_composite_fiducial_score(model, chosen,
                                                        prep_or_meas)
        improved = True
        while improved:
            improved = False
            for f in list(chosen):
                if force_empty and f.depth == 0:
                    continue
                trial = [x for x in chosen if x != f]
                s, ns, _ = compute_composite_fiducial_score(
                    model, trial, prep_or_meas)
                if ns >= d2 and s <= base_s * 1.1:
                    chosen = trial
                    base_s = s
                    improved = True
        s, ns, _ = compute_composite_fiducial_score(model, chosen, prep_or_meas)
        q = (-len(chosen), -s)
        if best_solution is None or q > best_solution[0]:
            best_solution = (q, chosen)
        printer.log("  GRASP iter %d: %d fiducials (score %.3g)"
                    % (it, len(chosen), s), 2)
    assert best_solution is not None, "GRASP found no complete fiducial set"
    return best_solution[1]


def create_prep_mxs(model, prep_fid_list, prep_cache=None):
    """One matrix per model preparation: columns are the fiducial-evolved
    prep superkets (reference: fiducialselection.create_prep_mxs:731)."""
    return [np.stack(_prep_vectors(model, prep_fid_list), axis=1)]


def create_meas_mxs(model, meas_fid_list, meas_cache=None):
    """One matrix per measurement effect: columns are the back-propagated
    effect rows (reference: fiducialselection.create_meas_mxs:790)."""
    return [np.stack(_meas_vectors(model, meas_fid_list), axis=1)]


def create_candidate_fiducial_list(target_model, omit_identity=True,
                                   ops_to_omit=None, candidate_fid_counts=2,
                                   max_fid_length=None, eq_thresh=1e-6,
                                   candidate_seed=None):
    """Candidate fiducial circuits: all gate words up to a length bound,
    deduplicated by the superoperator they produce (reference:
    fiducialselection.create_candidate_fiducial_list:1911).
    `candidate_fid_counts` is an int max length, or a dict
    {length: 'all upto' | count}."""
    import itertools
    if max_fid_length is not None:
        candidate_fid_counts = int(max_fid_length)
    ops_to_omit = set(ops_to_omit or ())
    op_labels = [gl for gl in target_model.operations.keys()
                 if gl not in ops_to_omit]
    if omit_identity:
        op_labels = [gl for gl in op_labels
                     if getattr(gl, 'name', str(gl)) not in ('Gi', '[]', '')]
    lls = target_model.state_space.qubit_labels
    if isinstance(candidate_fid_counts, int):
        counts = {candidate_fid_counts: 'all upto'}
    else:
        counts = dict(candidate_fid_counts)
    rng = np.random.RandomState(candidate_seed)
    fids = [Circuit((), lls)]
    seen_words = {()}
    for length, how in counts.items():
        if how == 'all upto':
            for L in range(1, length + 1):
                for combo in itertools.product(op_labels, repeat=L):
                    if combo not in seen_words:
                        seen_words.add(combo)
                        fids.append(Circuit(combo, lls))
        else:
            for _ in range(int(how)):
                combo = tuple(op_labels[rng.randint(len(op_labels))]
                              for _ in range(length))
                if combo not in seen_words:
                    seen_words.add(combo)
                    fids.append(Circuit(combo, lls))
    # dedupe by the fiducial's dense product
    from pygsti_tpu.algorithms.germselection import _germ_product_and_jacobian
    kept, prods = [], []
    for c in fids:
        if len(c.layertup) == 0:
            prod = np.eye(target_model.dim)
        else:
            prod, _ = _germ_product_and_jacobian(target_model, c)
            prod = np.asarray(prod)
        if any(np.linalg.norm(prod - p2) < eq_thresh for p2 in prods):
            continue
        prods.append(prod)
        kept.append(c)
    return kept


# ---------------------------------------------------------------------------
# Greedy-search support: PTM/prep/meas caches, candidate cleaning, compact
# EVD halves, and penalty terms (reference: fiducialselection.py:412-1935).
# ---------------------------------------------------------------------------

def xor(*args):
    """True iff exactly one argument is truthy (reference:
    fiducialselection.xor:412)."""
    return sum(bool(x) for x in args) == 1


def create_circuit_cache(model, circuit_list):
    """{circuit.str: PTM} product cache for the candidate fiducials
    (reference: fiducialselection.create_circuit_cache:607)."""
    cache = {}
    for circuit in circuit_list:
        G = np.eye(model.dim)
        for l in circuit.layertup:
            G = model.operations[l].to_dense() @ G
        cache[circuit.str] = G
    return cache


def clean_fid_list(model, circuit_cache, available_fid_list,
                   drop_identities=True, drop_duplicates=True,
                   eq_thresh=1e-6, assume_clifford=False):
    """Drop identity-acting and PTM-duplicate fiducials from the candidate
    list (reference: fiducialselection.clean_fid_list:433).  Returns
    (cleaned_fid_list, cleaned_circuit_cache); the first circuit of each
    duplicate group (in list order) is kept, and the empty circuit is never
    dropped as an identity."""
    cache = dict(circuit_cache)
    if drop_identities:
        ident = np.identity(model.dim, 'd')
        for key in list(cache.keys()):
            if key in ('{}', ()) or key == '':
                continue
            if np.linalg.norm(cache[key] - ident) < eq_thresh:
                del cache[key]
    if drop_duplicates:
        # group candidates by cheap invariants (rounded trace, nonzero
        # count), then norm-compare only within groups
        groups = {}
        for key, ptm in cache.items():
            inv = (round(float(np.real(np.trace(ptm))), 7),
                   int(np.count_nonzero(np.abs(ptm) > 1e-8)))
            groups.setdefault(inv, []).append(key)
        kept = {}
        for group_keys in groups.values():
            reps = []
            for key in group_keys:
                ptm = cache[key]
                if any(np.linalg.norm(ptm - cache[r]) < eq_thresh
                       for r in reps):
                    continue
                reps.append(key)
            for r in reps:
                kept[r] = cache[r]
        cache = kept
    cleaned = [c for c in available_fid_list if c.str in cache]
    return cleaned, cache


def create_prep_cache(model, available_prep_fid_list, circuit_cache=None):
    """{(rho_param_bytes, fid.str): F @ |rho>} effective-prep cache plus the
    rho key list (reference: fiducialselection.create_prep_cache:638)."""
    if circuit_cache is None:
        circuit_cache = create_circuit_cache(model, available_prep_fid_list)
    prep_cache, keylist = {}, []
    for rho in model.preps.values():
        key = np.asarray(rho.to_vector()).tobytes()
        keylist.append(key)
        vec = np.asarray(rho.to_dense())
        for fid in available_prep_fid_list:
            prep_cache[(key, fid.str)] = circuit_cache[fid.str] @ vec
    return prep_cache, keylist


def create_meas_cache(model, available_meas_fid_list, circuit_cache=None):
    """{(povm_bytes, effect_bytes, fid.str): <E| @ F} effective-measurement
    cache plus the (povm, effect) key-pair list (reference:
    fiducialselection.create_meas_cache:683)."""
    if circuit_cache is None:
        circuit_cache = create_circuit_cache(model, available_meas_fid_list)
    meas_cache, keypairs = {}, []
    for povm in model.povms.values():
        pkey = np.asarray(povm.to_dense()).tobytes() \
            if hasattr(povm, 'to_dense') else repr(povm).encode()
        for evec in np.atleast_2d(np.asarray(povm.to_dense())):
            ekey = evec.tobytes()
            keypairs.append((pkey, ekey))
            for fid in available_meas_fid_list:
                meas_cache[(pkey, ekey, fid.str)] = \
                    evec @ circuit_cache[fid.str]
    return meas_cache, keypairs


def build_bitvec_mx(n, k):
    """All length-n binary vectors of Hamming weight k, as the rows of a
    (binom(n,k), n) array (reference:
    fiducialselection.build_bitvec_mx:1066)."""
    import itertools
    combos = list(itertools.combinations(range(n), k))
    mx = np.zeros((len(combos), n))
    for i, locs in enumerate(combos):
        mx[i, list(locs)] = 1
    return mx


def construct_compact_evd_cache(model, fids_list, prep_or_meas, fid_cache,
                                eigenvalue_tolerance=1e-10):
    """{fiducial: U sqrt(e)} compact halves of each single-fiducial Gramian,
    for low-rank greedy fiducial search (reference:
    fiducialselection.construct_compact_evd_cache:1852)."""
    from pygsti_tpu.algorithms.germselection import compact_EVD
    sqrteU = {}
    for fiducial in fids_list:
        if prep_or_meas == 'prep':
            arrays = create_prep_mxs(model, [fiducial], fid_cache)
        elif prep_or_meas == 'meas':
            arrays = create_meas_mxs(model, [fiducial], fid_cache)
        else:
            raise ValueError("prep_or_meas must be 'prep' or 'meas'")
        fid_mat = np.concatenate(arrays, axis=1)
        e, U = compact_EVD(fid_mat @ fid_mat.conj().T,
                           eigenvalue_tolerance, assume_hermitian=True)
        sqrteU[fiducial] = U @ np.diag(np.sqrt(np.abs(e)))
    return sqrteU


def add_penalties_greedy(unpenalized_score, fid_list, l1_penalty=0,
                         op_penalty=0, gate_penalty=None):
    """Add l1 / op-count / per-gate penalties to a greedy fiducial-set
    score (reference: fiducialselection.add_penalties_greedy:1871)."""
    score = unpenalized_score
    score += l1_penalty * len(fid_list)
    score += op_penalty * sum(len(fiducial) for fiducial in fid_list)
    if gate_penalty is not None:
        for gate, penalty in gate_penalty.items():
            for fiducial in fid_list:
                score += fiducial.str.count(str(gate)) * penalty
    return score
