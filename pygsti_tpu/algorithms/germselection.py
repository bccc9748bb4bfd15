"""Germ selection: find amplificationally-complete germ sets
(reference: pygsti/algorithms/germselection.py:59, 5235 LoC).

A germ set is amplificationally complete (AC) when the union of the germs'
*twirled derivatives* spans the non-gauge parameter directions: errors along
every non-gauge direction grow linearly with germ power L.  The twirled
derivative of germ product M(theta) keeps only the derivative components
that survive averaging under conjugation by M's eigenbasis (the large-L
limit of d(M^L)/dtheta / L).
"""

from __future__ import annotations

import numpy as np

from pygsti_tpu.baseobjs.verbosityprinter import VerbosityPrinter
from pygsti_tpu.circuits.circuit import Circuit


def _germ_product_and_jacobian(model, germ):
    """Dense product M of the germ's ops and dM/dtheta [d^2*d^2, P] via jax."""
    import jax
    import jax.numpy as jnp
    compute = model.tensors_fn()
    op_keys = model.op_keys
    idx = [op_keys.index(l) for l in germ.layertup]
    dim = model.dim

    def product(v):
        t = compute(v)
        m = jnp.eye(dim, dtype=t.ops.dtype)
        for i in idx:
            m = t.ops[i] @ m
        return m

    v = jnp.asarray(model.to_vector())
    M = np.asarray(product(v))
    J = np.asarray(jax.jacfwd(product)(v)).reshape(dim * dim, -1)
    return M, J


def twirled_deriv(model, germ, eps=1e-6):
    """Twirled derivative of the germ product: project dM/dtheta onto the
    commutant of M (keep only equal-eigenvalue projector blocks), which is
    the direction amplified by germ powers (reference:
    germselection._twirled_deriv)."""
    M, J = _germ_product_and_jacobian(model, germ)
    d2 = M.shape[0]
    evals, V = np.linalg.eig(M)
    Vinv = np.linalg.inv(V)
    # twirl: T = sum_{i,j:|li - lj| < eps} P_i dM P_j   (in eigenbasis: mask)
    mask = (np.abs(evals[:, None] - evals[None, :]) < eps).astype(complex)
    P = J.shape[1]
    out = np.empty((d2 * d2, P), dtype=complex)
    for p in range(P):
        dM = J[:, p].reshape(d2, d2)
        dM_eig = Vinv @ dM @ V
        out[:, p] = (V @ (mask * dM_eig) @ Vinv).reshape(-1)
    return out


def _nongauge_projector(model, item_weights=None):
    """Projector onto non-gauge parameter directions: complement of the
    column space of the gauge-generator matrix dG_gauge (reference:
    model.num_gauge_params / gaugegroup machinery)."""
    import jax
    import jax.numpy as jnp
    from pygsti_tpu.models.gaugegroup import default_gauge_group_for_model
    gg = default_gauge_group_for_model(model)
    if gg.num_params == 0:
        return np.eye(model.num_params)
    # derivative of model paramvec under infinitesimal gauge transformations:
    # dtheta/depsilon for S = S(x0 + eps e_k)
    x0 = gg.initial_params()
    v0 = model.to_vector()
    eps = 1e-7

    work = model.copy()
    cols = []
    for k in range(gg.num_params):
        x = x0.copy()
        x[k] += eps
        el = gg.compute_element(x)
        m = model.copy()
        try:
            m.transform_inplace(el)
        except AssertionError:
            continue  # gauge direction incompatible with parameterization
        cols.append((m.to_vector() - v0) / eps)
    if not cols:
        return np.eye(model.num_params)
    gauge_dirs = np.stack(cols, axis=1)  # [P, n_gauge]
    q, r = np.linalg.qr(gauge_dirs)
    # numerical rank
    keep = np.abs(np.diag(r)) > 1e-7 * max(np.abs(np.diag(r)).max(), 1e-30)
    q = q[:, keep]
    return np.eye(model.num_params) - q @ q.T


def compute_composite_germ_set_score(model, germs, score_func='all', eps=1e-6,
                                     non_gauge_projector=None):
    """Score a germ set: build J_comp = sum_g Re(T_g^dag T_g) projected onto
    non-gauge space; score 'all' = sum of inverse nonzero eigenvalues
    (lower = better), 'worst' = 1/smallest-nonzero-eigenvalue.  Returns
    (score, n_amplified, eigenvalues)."""
    P = model.num_params
    proj = non_gauge_projector if non_gauge_projector is not None \
        else _nongauge_projector(model)
    n_nongauge = int(round(np.trace(proj)))
    Jc = np.zeros((P, P))
    for germ in germs:
        T = twirled_deriv(model, germ, eps) @ proj
        Jc += np.real(T.conj().T @ T)
    evals = np.linalg.eigvalsh(Jc)
    evals = evals[::-1]  # descending
    nonzero = evals[:n_nongauge]
    n_amplified = int(np.sum(nonzero > 1e-10 * max(evals[0], 1e-30)))
    safe = np.clip(nonzero, 1e-30, None)
    if score_func == 'all':
        score = float(np.sum(1.0 / safe))
    else:
        score = float(1.0 / safe[-1])
    return score, n_amplified, evals


def max_amplified_directions(model, op_labels=None, max_len=3, eps=1e-6,
                             non_gauge_projector=None):
    """The number of non-gauge directions amplifiable by ANY germ set: the
    rank of the union of twirled derivatives over all candidate germs up to
    `max_len` (saturation count).  This is the meaningful completeness
    target: directions outside this span (e.g. SPAM parameters) cannot be
    amplified by germs at all."""
    import itertools
    proj = non_gauge_projector if non_gauge_projector is not None \
        else _nongauge_projector(model)
    if op_labels is None:
        op_labels = list(model.operations.keys())
    lls = model.state_space.qubit_labels
    germs, seen = [], set()
    for L in range(1, max_len + 1):
        for combo in itertools.product(op_labels, repeat=L):
            key = _cyclic_canonical(combo)
            if key not in seen:
                seen.add(key)
                germs.append(Circuit(combo, lls))
    _, n_amp, _ = compute_composite_germ_set_score(model, germs, 'all', eps, proj)
    return n_amp


def test_germs_list_completeness(model, germs, score_func='all', threshold=1e6,
                                 eps=1e-6):
    """Return amplified(germs) - amplified(saturating candidate set): >= 0
    means the set amplifies every germ-amplifiable non-gauge direction
    (cf. reference germselection.test_germs_list_completeness, which compares
    against a spam-removed model's non-gauge count)."""
    proj = _nongauge_projector(model)
    n_max = max_amplified_directions(model, non_gauge_projector=proj, eps=eps)
    _, n_amp, _ = compute_composite_germ_set_score(model, germs, score_func, eps, proj)
    return n_amp - n_max


def find_germs(target_model, randomize=True, randomization_strength=1e-2,
               num_gs_copies=1, seed=None, candidate_germ_counts=None,
               candidate_seed=None, force="singletons", algorithm='greedy',
               score_func='all', threshold=1e6, verbosity=1, mem_limit=None,
               assume_real=True, float_type=np.float64, mode='allJac',
               l1_penalty=1e-2, op_penalty=0.0, fixed_slack=None,
               slack_frac=None):
    """Find an amplificationally-complete germ set by greedy selection from
    power-limited candidate circuits (reference: germselection.find_germs:59).

    `num_gs_copies`, `assume_real` and `float_type` are numeric-backend
    hints in the reference; this implementation always scores with one
    model copy in real float64 arithmetic, and other requests raise."""
    _check_unsupported_germsel('find_germs',
                               num_gs_copies=(num_gs_copies, (None, 1)),
                               assume_real=(assume_real, True),
                               float_type=(float_type, np.float64))
    printer = VerbosityPrinter.create_printer(verbosity)
    model = target_model
    if randomize:
        model = model.randomize_with_unitary(randomization_strength, seed=seed) \
            if hasattr(model, 'randomize_with_unitary') else \
            model.rotate(max_rotate=randomization_strength, seed=seed) \
            if model.state_space.num_qubits == 1 else model.depolarize(
                max_op_noise=randomization_strength, seed=seed)

    op_labels = list(model.operations.keys())
    lls = model.state_space.qubit_labels

    # candidates: all products up to given lengths
    if candidate_germ_counts is None:
        candidate_germ_counts = {3: 'all upto'}
    candidates = []
    seen = set()
    import itertools
    rng = np.random.RandomState(candidate_seed)
    for length, count in candidate_germ_counts.items():
        if count == 'all upto':
            for L in range(1, length + 1):
                for combo in itertools.product(op_labels, repeat=L):
                    c = Circuit(combo, lls)
                    key = _cyclic_canonical(combo)
                    if key not in seen:
                        seen.add(key)
                        candidates.append(c)
        else:
            for _ in range(count):
                L = length
                combo = tuple(op_labels[rng.randint(len(op_labels))] for _ in range(L))
                key = _cyclic_canonical(combo)
                if key not in seen:
                    seen.add(key)
                    candidates.append(Circuit(combo, lls))

    proj = _nongauge_projector(model)
    # completeness target: the directions amplifiable by THIS candidate pool
    # (candidate pools limited to short germs cannot reach the full
    # saturation count; the pool's own span is the achievable target)
    _, n_nongauge, _ = compute_composite_germ_set_score(
        model, candidates, score_func, non_gauge_projector=proj)
    printer.log("Germ selection: %d candidates, %d amplifiable directions to cover"
                % (len(candidates), n_nongauge))

    # start with forced germs (singletons)
    germs = []
    if force == "singletons":
        germs = [Circuit((l,), lls) for l in op_labels]

    # greedy: add the candidate that most improves the score
    twirled = {}       # full Gram accumulation ('allJac' mode)
    compact = {}       # rank-truncated factors ('compactEVD' mode,
                       # reference germselection.py compactEVD memory mode)

    def _gate_count(germ_list):
        return sum(len(g.layertup) for g in germ_list)

    def set_score(germ_list):
        if mode == 'compactEVD':
            # score from stacked compact factors: eigvals(sum_g T_g^T T_g)
            # == squared singular values of the stacked factor matrix
            factors = []
            for g in germ_list:
                if g not in compact:
                    T = twirled_deriv(model, g) @ proj
                    U, s, Vh = np.linalg.svd(np.real(T), full_matrices=False)
                    keep = s > 1e-10 * max(s[0], 1e-30)
                    compact[g] = (s[keep, None] * Vh[keep])  # [rank, P]
                factors.append(compact[g])
            F = np.concatenate(factors, axis=0) if factors \
                else np.zeros((0, model.num_params))
            sv = np.linalg.svd(F, compute_uv=False)
            evals = np.zeros(n_nongauge)
            evals[:min(len(sv), n_nongauge)] = (sv ** 2)[:n_nongauge]
        else:
            Jc = np.zeros((model.num_params, model.num_params))
            for g in germ_list:
                if g not in twirled:
                    T = twirled_deriv(model, g) @ proj
                    twirled[g] = np.real(T.conj().T @ T)
                Jc += twirled[g]
            evals = np.linalg.eigvalsh(Jc)[::-1][:n_nongauge]
        safe = np.clip(evals, 1e-30, None)
        n_amp = int(np.sum(evals > 1e-10 * max(np.max(evals), 1e-30)))
        base = float(np.sum(1.0 / safe)) if score_func == 'all' \
            else float(1.0 / safe[-1])
        # germ-count and gate-count penalties (reference: germselection
        # l1_penalty / op_penalty scoring knobs)
        base += l1_penalty * len(germ_list) + op_penalty * _gate_count(germ_list)
        return base, n_amp

    if algorithm == 'grasp':
        return _find_germs_grasp(candidates, germs, set_score, n_nongauge,
                                 threshold, printer,
                                 rand_state=np.random.RandomState(seed))
    if algorithm == 'slack':
        return _find_germs_integer_slack(
            candidates, germs, set_score, n_nongauge, threshold, printer,
            fixed_slack=fixed_slack, slack_frac=slack_frac)

    cur_score, n_amp = set_score(germs)
    max_iters = len(candidates)
    for _ in range(max_iters):
        if n_amp >= n_nongauge and cur_score < threshold:
            break
        best = None
        for cand in candidates:
            if cand in germs:
                continue
            s, na = set_score(germs + [cand])
            if best is None or (na, -s) > (best[1], -best[2]):
                best = (cand, na, s)
        if best is None:
            break
        germs.append(best[0])
        n_amp, cur_score = best[1], best[2]
        printer.log("  added germ %s -> %d/%d amplified, score %.3g"
                    % (best[0].str, n_amp, n_nongauge, cur_score), 2)
        if best[1] >= n_nongauge and cur_score < threshold:
            break
    assert n_amp >= n_nongauge, \
        "Could not find an amplificationally complete germ set (%d/%d)" % (n_amp, n_nongauge)
    return germs


def _find_germs_grasp(candidates, forced, set_score, n_nongauge, threshold,
                      printer, iterations=5, alpha=0.5, rand_state=None):
    """GRASP germ search: randomized-greedy construction from a restricted
    candidate list + local swap search, best of `iterations` restarts
    (reference: pygsti/algorithms/grasp.py:275 run_grasp_iteration;
    germselection GRASP mode)."""
    rng = rand_state if rand_state is not None else np.random.RandomState()
    best_solution = None

    def solution_quality(germs):
        s, na = set_score(germs)
        return (na, -len(germs), -s)   # maximize coverage, then small & low

    for it in range(iterations):
        # --- randomized greedy construction ------------------------------
        germs = list(forced)
        cur_score, n_amp = set_score(germs)
        while not (n_amp >= n_nongauge and cur_score < threshold):
            scored = []
            for cand in candidates:
                if cand in germs:
                    continue
                sc, na = set_score(germs + [cand])
                scored.append((cand, na, sc))
            if not scored:
                break
            # restricted candidate list: within alpha of the best by
            # (coverage, score) ordering
            best_na = max(x[1] for x in scored)
            top = [x for x in scored if x[1] == best_na]
            top.sort(key=lambda x: x[2])
            rcl = top[:max(1, int(np.ceil(alpha * len(top))))]
            pick = rcl[rng.randint(len(rcl))]
            germs.append(pick[0])
            n_amp, cur_score = pick[1], pick[2]
        if not (n_amp >= n_nongauge):
            continue

        # --- local search: prune germs while coverage holds and the score
        # does not degrade appreciably -------------------------------------
        base_s, _ = set_score(germs)
        improved = True
        while improved:
            improved = False
            for g in list(germs):
                if g in forced:
                    continue
                trial = [x for x in germs if x != g]
                s, na = set_score(trial)
                if na >= n_nongauge and s <= max(base_s * 1.1, threshold):
                    germs = trial
                    base_s = s
                    improved = True
        q = solution_quality(germs)
        if best_solution is None or q > best_solution[0]:
            best_solution = (q, list(germs))
        printer.log("  GRASP iter %d: %d germs (coverage %d/%d)"
                    % (it, len(germs), q[0], n_nongauge), 2)

    assert best_solution is not None,         "GRASP could not find an amplificationally complete germ set"
    return best_solution[1]


def _find_germs_integer_slack(candidates, forced, set_score, n_nongauge,
                              threshold, printer, fixed_slack=None,
                              slack_frac=None, max_iters=10000):
    """Integer-weight slack optimization (reference:
    germselection.optimize_integer_germs_slack, germselection.py:59 'slack'
    mode): start from the FULL candidate set (known complete) and repeatedly
    remove the element whose removal keeps the score within the current
    score + slack, where slack = fixed_slack or slack_frac * score."""
    if fixed_slack is None and slack_frac is None:
        slack_frac = 0.1
    germs = list(dict.fromkeys(list(forced) + list(candidates)))
    cur_score, n_amp = set_score(germs)
    assert n_amp >= n_nongauge, \
        "Candidate germ pool is not amplificationally complete (%d/%d)" \
        % (n_amp, n_nongauge)
    for _ in range(max_iters):
        slack = fixed_slack if fixed_slack is not None \
            else abs(cur_score) * slack_frac
        best = None
        for g in germs:
            if g in forced:
                continue
            trial = [x for x in germs if x != g]
            s, na = set_score(trial)
            if na >= n_nongauge and s <= cur_score + slack:
                if best is None or s < best[1]:
                    best = (g, s, na)
        if best is None:
            break
        germs.remove(best[0])
        cur_score = best[1]
        printer.log("  slack: removed %s -> %d germs (score %.3g)"
                    % (best[0].str, len(germs), cur_score), 2)
    return germs


def _cyclic_canonical(combo):
    """Canonical form under cyclic rotation (germs are cyclic)."""
    rots = [combo[i:] + combo[:i] for i in range(len(combo))]
    return min(rots)


# =============================================================================
# Reference-named public entry points (reference: germselection.py).  Each
# search strategy is one `algorithm=` mode of find_germs; the reference also
# exposes them as standalone functions operating on explicit candidate lists.
# =============================================================================

def _make_set_score(model, score_func='all', op_penalty=0.0, l1_penalty=0.0):
    """(set_score, n_target): the same scoring closure find_germs builds,
    over an explicit germ list (twirled-deriv Gram eigenvalues projected
    onto non-gauge space; cached per germ).  n_target is the number of
    germ-AMPLIFIABLE directions (less than the non-gauge count: SPAM-only
    directions are never germ-amplified)."""
    proj = _nongauge_projector(model)
    n_nongauge = int(round(np.trace(proj)))
    n_target = max_amplified_directions(model, non_gauge_projector=proj)
    twirled = {}

    def set_score(germ_list):
        Jc = np.zeros((model.num_params, model.num_params))
        for g in germ_list:
            if g not in twirled:
                T = twirled_deriv(model, g) @ proj
                twirled[g] = np.real(T.conj().T @ T)
            Jc += twirled[g]
        evals = np.linalg.eigvalsh(Jc)[::-1][:n_nongauge]
        safe = np.clip(evals, 1e-30, None)
        n_amp = int(np.sum(evals > 1e-10 * max(np.max(evals), 1e-30)))
        base = float(np.sum(1.0 / safe)) if score_func == 'all' \
            else float(1.0 / safe[-1])
        base += l1_penalty * len(germ_list) \
            + op_penalty * sum(len(g.layertup) for g in germ_list)
        return base, n_amp

    return set_score, n_target


def _first_model(model_list):
    return model_list[0] if isinstance(model_list, (list, tuple)) \
        else model_list


def _forced_singletons(model, force):
    if force == "singletons":
        lls = model.state_space.qubit_labels
        return [Circuit((gl,), lls) for gl in model.operations.keys()]
    return list(force) if isinstance(force, (list, tuple)) else []


from pygsti_tpu.tools.argchecks import \
    check_unsupported as _check_unsupported_germsel


def find_germs_breadthfirst(model_list, germs_list, randomize=False,
                            randomization_strength=1e-3, num_copies=None,
                            seed=0, op_penalty=0, score_func='all', tol=1e-6,
                            threshold=1e6, check=False, force="singletons",
                            verbosity=0, **_kwargs):
    """Greedy (breadth-first) germ selection from an explicit candidate list
    (reference: germselection.find_germs_breadthfirst)."""
    _check_unsupported_germsel('find_germs_breadthfirst',
                               num_copies=(num_copies, (None, 1)),
                               check=(check, False))
    model = _first_model(model_list)
    if randomize:
        model = randomize_model_list([model], randomization_strength, 1,
                                     seed)[0]
    printer = VerbosityPrinter.create_printer(verbosity)
    set_score, n_nongauge = _make_set_score(model, score_func, op_penalty)
    germs = _forced_singletons(model, force)
    candidates = [c for c in germs_list if c not in germs]
    cur_score, n_amp = set_score(germs) if germs else (np.inf, 0)
    while candidates:
        if n_amp >= n_nongauge and cur_score < threshold:
            break
        best = None
        for cand in candidates:
            sc, na = set_score(germs + [cand])
            if best is None or (na, -sc) > (best[2], -best[1]):
                best = (cand, sc, na)
        germs.append(best[0])
        candidates.remove(best[0])
        cur_score, n_amp = best[1], best[2]
        printer.log("  added %s -> %d/%d" % (best[0].str, n_amp, n_nongauge),
                    2)
    return germs


find_germs_breadthfirst_greedy = find_germs_breadthfirst


def find_germs_depthfirst(model_list, germs_list, randomize=False,
                          randomization_strength=1e-3, num_copies=None,
                          seed=0, op_penalty=0, score_func='all', tol=1e-6,
                          threshold=1e6, check=False, force="singletons",
                          verbosity=0, **_kwargs):
    """Depth-first germ selection: add candidates in list order until the
    set is amplificationally complete (reference:
    germselection.find_germs_depthfirst)."""
    _check_unsupported_germsel('find_germs_depthfirst',
                               num_copies=(num_copies, (None, 1)),
                               check=(check, False))
    model = _first_model(model_list)
    if randomize:
        model = randomize_model_list([model], randomization_strength, 1,
                                     seed)[0]
    set_score, n_nongauge = _make_set_score(model, score_func, op_penalty)
    germs = _forced_singletons(model, force)
    for cand in germs_list:
        if cand in germs:
            continue
        score, n_amp = set_score(germs)
        if n_amp >= n_nongauge and score < threshold:
            break
        germs.append(cand)
    return germs


def find_germs_grasp(model_list, germs_list, alpha=0.1, randomize=False,
                     randomization_strength=1e-3, num_copies=None, seed=0,
                     op_penalty=0, score_func='all', tol=1e-6, threshold=1e6,
                     force="singletons", iterations=5, verbosity=0,
                     return_all=False, **_kwargs):
    """GRASP germ search over an explicit candidate list (reference:
    germselection.find_germs_grasp)."""
    _check_unsupported_germsel('find_germs_grasp',
                               num_copies=(num_copies, (None, 1)),
                               return_all=(return_all, False))
    model = _first_model(model_list)
    if randomize:
        model = randomize_model_list([model], randomization_strength, 1,
                                     seed)[0]
    set_score, n_nongauge = _make_set_score(model, score_func, op_penalty)
    forced = _forced_singletons(model, force)
    best = _find_germs_grasp(list(germs_list), forced, set_score, n_nongauge,
                             threshold,
                             VerbosityPrinter.create_printer(verbosity),
                             iterations=iterations, alpha=alpha,
                             rand_state=np.random.RandomState(seed))
    return best


def find_germs_integer_slack(model_list, germs_list, randomize=False,
                             randomization_strength=1e-3, num_copies=None,
                             seed=0, l1_penalty=1e-2, op_penalty=0,
                             initial_weights=None, score_func='all',
                             max_iter=100, fixed_slack=False,
                             slack_frac=False, return_all=False, tol=1e-6,
                             check=False, force="singletons", verbosity=0,
                             **_kwargs):
    """Integer-weight slack-based germ optimization (reference:
    germselection.find_germs_integer_slack)."""
    _check_unsupported_germsel('find_germs_integer_slack',
                               num_copies=(num_copies, (None, 1)),
                               initial_weights=(initial_weights, None),
                               return_all=(return_all, False),
                               check=(check, False))
    model = _first_model(model_list)
    if randomize:
        model = randomize_model_list([model], randomization_strength, 1,
                                     seed)[0]
    set_score, n_nongauge = _make_set_score(model, score_func, op_penalty,
                                            l1_penalty)
    forced = _forced_singletons(model, force)
    return _find_germs_integer_slack(
        list(germs_list), forced, set_score, n_nongauge, threshold=1e6,
        printer=VerbosityPrinter.create_printer(verbosity),
        fixed_slack=fixed_slack or None,
        slack_frac=slack_frac or (None if fixed_slack else 0.1),
        max_iters=max_iter)


def compute_germ_set_score(germs, target_model=None, neighborhood=None,
                           neighborhood_size=5,
                           randomization_strength=1e-2, score_func='all',
                           op_penalty=0.0, l1_penalty=0.0, seed=None):
    """Worst (max) composite score of a germ set over a neighborhood of
    randomized models (reference: germselection.compute_germ_set_score)."""
    if neighborhood is None:
        neighborhood = randomize_model_list([target_model],
                                            randomization_strength,
                                            neighborhood_size, seed)
    worst = -np.inf
    for m in neighborhood:
        set_score, _ = _make_set_score(m, score_func, op_penalty, l1_penalty)
        worst = max(worst, set_score(list(germs))[0])
    return worst


def test_germ_set_infl(model, germs_to_test, score_func='all',
                       threshold=1e6):
    """Whether a germ set is amplificationally complete at infinite L
    (twirled-derivative rank test; reference:
    germselection.test_germ_set_infl)."""
    return bool(test_germs_list_completeness(model, germs_to_test,
                                             score_func=score_func,
                                             threshold=threshold) >= 0)


def test_germ_set_finitel(model, germs_to_test, length, weights=None,
                          return_spectrum=False, tol=1e-6):
    """Whether the germ set is amplificationally complete at FINITE length
    `length`: the derivatives of germ^(length//|germ|) products span the
    non-gauge directions (reference: germselection.test_germ_set_finitel)."""
    proj = _nongauge_projector(model)
    n_target = max_amplified_directions(model, non_gauge_projector=proj)
    derivs = []
    for germ in germs_to_test:
        reps = max(int(length) // max(len(germ.layertup), 1), 1)
        power = germ * reps
        _, J = _germ_product_and_jacobian(model, power)
        derivs.append(np.real(np.asarray(J)) / max(len(power.layertup), 1))
    if weights is None:
        weights = np.ones(len(derivs))
    gram = sum(w * (d @ proj).T @ (d @ proj)
               for w, d in zip(weights, derivs))
    spectrum = np.sort(np.linalg.eigvalsh(gram))
    observable = spectrum[-n_target:] if n_target > 0 else spectrum
    ok = bool(observable[0] > tol)
    if return_spectrum:
        return ok, spectrum
    return ok


def randomize_model_list(model_list, randomization_strength, num_copies,
                         seed=None):
    """Randomize each model (or make `num_copies` randomized copies of a
    single model) (reference: germselection.randomize_model_list)."""
    if not isinstance(model_list, (list, tuple)):
        model_list = [model_list]
    if len(model_list) > 1 and num_copies not in (None, 1):
        raise ValueError("Input multiple models XOR request multiple copies "
                         "of one model -- not both!")
    out = []
    for i, m in enumerate(model_list):
        for j in range(num_copies or 1):
            s = None if seed is None else seed + i * (num_copies or 1) + j
            out.append(m.randomize_with_unitary(randomization_strength,
                                                seed=s)
                       if hasattr(m, 'randomize_with_unitary')
                       else m.depolarize(max_op_noise=randomization_strength,
                                         seed=s))
    return out


def drop_random_germs(candidate_list, rand_frac, target_model,
                      keep_bare=True, seed=None):
    """Randomly drop a fraction of candidate germs, optionally keeping the
    bare single-gate germs (reference: germselection.drop_random_germs)."""
    rng = np.random.RandomState(seed)
    lls = target_model.state_space.qubit_labels
    bare = {Circuit((gl,), lls) for gl in target_model.operations.keys()} \
        if keep_bare else set()
    return [c for c in candidate_list
            if c in bare or rng.rand() >= rand_frac]


def create_circuit_cache(model, circuits):
    """{Circuit: dense product matrix} cache (reference:
    germselection.create_circuit_cache)."""
    out = {}
    for c in circuits:
        prod, _ = _germ_product_and_jacobian(model, c)
        out[c] = np.asarray(prod)
    return out


def clean_germ_list(model, circuit_cache, eq_thresh=1e-6):
    """Deduplicate candidate germs whose dense products coincide (reference:
    germselection.clean_germ_list).  Returns (deduped_circuits,
    deduped_cache)."""
    seen = []
    out_circuits, out_cache = [], {}
    for c, mx in circuit_cache.items():
        if any(np.linalg.norm(mx - m2) < eq_thresh for m2 in seen):
            continue
        seen.append(mx)
        out_circuits.append(c)
        out_cache[c] = mx
    return out_circuits, out_cache


# ---------------------------------------------------------------------------
# Compact-EVD / low-rank-update machinery for greedy germ + vector selection
# (reference: germselection.py:3255-5230).  Host-side numpy: these drive the
# greedy search bookkeeping; the Jacobians themselves come from jax.
# ---------------------------------------------------------------------------

def compact_EVD(mat, threshold=1e-10, assume_hermitian=False):  # noqa: N802
    """Compact eigenvalue decomposition: the nonzero eigenvalues e and
    eigenvector columns U of `mat` with U diag(e) U^H = mat (reference:
    germselection.compact_EVD:3255)."""
    if assume_hermitian:
        e, U = np.linalg.eigh((mat + mat.conj().T) / 2)
    else:
        e, U = np.linalg.eig(mat)
    keep = np.nonzero(np.abs(e) > threshold)[0]
    return e[keep], U[:, keep]


def compact_EVD_via_SVD(mat, threshold=1e-10):  # noqa: N802
    """Compact EVD of mat^H mat computed from the SVD of `mat`: eigenvalues
    are squared singular values, eigenvectors the right singular vectors
    (reference: germselection.compact_EVD_via_SVD:3296)."""
    import scipy.linalg as _sla
    try:
        _, s, Vh = np.linalg.svd(mat)
    except np.linalg.LinAlgError:
        _, s, Vh = _sla.svd(mat, lapack_driver='gesvd')
    keep = np.nonzero(np.abs(s) > threshold)[0]
    return s[keep] ** 2, Vh.conj().T[:, keep]


def construct_update_cache(mat, evd_tol=1e-10):
    """Precompute (e, U, projU) for a run of symmetric low-rank updates to
    `mat`: the compact spectrum, eigenvectors, and the projector
    I - U U^T onto the complement of the column space (reference:
    germselection.construct_update_cache:3340)."""
    e, U = compact_EVD(mat, evd_tol, assume_hermitian=True)
    proj_U = np.eye(mat.shape[0]) - U @ U.T
    return e, U, proj_U


def _complement_basis(proj_U, update, tol):
    """Orthonormal basis P for the part of `update`'s column space lying in
    the complement of the cached column space, via pivoted QR."""
    import scipy.linalg as _sla
    proj_update = proj_U @ update
    q, r, _ = _sla.qr(proj_update, mode='economic', pivoting=True)
    keep = np.nonzero(np.abs(np.diag(r)) > tol)[0]
    return q[:, keep], proj_update


def symmetric_low_rank_spectrum_update(update, orig_e, U, proj_U,
                                       force_rank_increase=False):
    """Spectrum of (mat + update @ update.T) given the update cache of mat,
    computed in the low-dimensional subspace spanned by U and the new
    directions (M. Brand's compact-SVD update).  Returns
    (new_eigenvalues, rank_increased); (None, False) when the update adds
    no new directions (reference:
    germselection.symmetric_low_rank_spectrum_update:3383)."""
    P, proj_update = _complement_basis(proj_U, update, 1e-10)
    if P.shape[1] == 0:
        return None, False
    block_column = np.concatenate([U.T @ update, P.T @ proj_update], axis=0)
    K = block_column @ block_column.T
    K[np.arange(len(orig_e)), np.arange(len(orig_e))] += orig_e
    return np.linalg.eigvalsh(K), True


def minamide_style_inverse_trace(update, orig_e, U, proj_U,
                                 force_rank_increase=False):
    """Trace of pinv(mat + update @ update.T) via Minamide's pseudoinverse
    update on the cached compact EVD of mat.  Returns (updated_trace,
    updated_rank, rank_increased); (None, None, False) when
    `force_rank_increase` and the update lies inside the current column
    space (reference: germselection.minamide_style_inverse_trace:3541)."""
    P, proj_update = _complement_basis(proj_U, update, 1e-9)
    rank_inc = P.shape[1]
    beta = U.T @ update
    e_inv = 1.0 / orig_e

    if rank_inc == 0:
        if force_rank_increase:
            return None, None, False
        # update inside column space: ordinary Woodbury on the spectrum
        X = e_inv[:, None] * beta
        central = np.linalg.inv(np.eye(beta.shape[1]) + beta.T @ X)
        drop = np.einsum('ij,jk,ik->i', X, central, X)
        return float(np.sum(e_inv) - np.sum(drop)), len(orig_e), False

    R_update = P.T @ proj_update
    try:
        pinv_R = np.linalg.pinv(R_update, rcond=1e-10)
    except np.linalg.LinAlgError:
        pinv_R = stable_pinv(R_update)
    gamma = pinv_R.T @ beta.T
    pinv_E_beta = e_inv[:, None] * beta
    B = np.eye(pinv_R.shape[0]) - pinv_R @ R_update
    Dinv = np.linalg.inv(np.eye(pinv_R.shape[0])
                         + B @ (pinv_E_beta.T @ pinv_E_beta) @ B)
    EbB = pinv_E_beta @ B
    upper_diag = np.einsum('ij,jk,ik->i', EbB, Dinv, EbB) + e_inv
    lower_right = gamma @ (e_inv[:, None] * gamma.T) + pinv_R.T @ pinv_R \
        - gamma @ EbB @ Dinv @ EbB.T @ gamma.T
    trace = float(np.sum(upper_diag) + np.trace(lower_right))
    return trace, len(orig_e) + rank_inc, True


def stable_pinv(mat):
    """Pseudoinverse via scipy's gesvd-driver SVD, for matrices where
    numpy's default gesdd fails to converge (reference:
    germselection.stable_pinv:4626)."""
    import scipy.linalg as _sla
    U, s, Vh = _sla.svd(mat, lapack_driver='gesvd', full_matrices=False)
    s_inv = np.where(s > 1e-10, 1.0 / np.where(s > 1e-10, s, 1.0), 0.0)
    return Vh.T @ (s_inv[:, None] * U.T)


def fast_kron(a, b):
    """Kronecker product via broadcasting, faster than np.kron for the
    mid-sized dense matrices in germ selection (reference:
    germselection.fast_kron:4618)."""
    return (a[:, None, :, None] * b[None, :, None, :]).reshape(
        a.shape[0] * b.shape[0], a.shape[1] * b.shape[1])


def construct_update_cache_rank_one(mat, evd_tol=1e-10,
                                    prev_update_cache=None,
                                    rank_one_update=None):
    """Precompute (pinv_A, proj_A, trace(pinv_A), rank) for a run of
    rank-one pseudoinverse updates to `mat` (Meyer's generalized-inverse
    update; reference: germselection.construct_update_cache_rank_one:5028).
    When the previous cache and the vector just added are given, the new
    pinv is itself obtained by a rank-one update."""
    import scipy.linalg as _sla
    if prev_update_cache is not None and rank_one_update is not None:
        pinv_A, rank_increased = rank_one_psuedoinverse_update(
            rank_one_update, prev_update_cache[0], prev_update_cache[1])
        rank = prev_update_cache[3] + (1 if rank_increased else 0)
    else:
        try:
            pinv_A, rank = _sla.pinvh(mat, return_rank=True)
        except np.linalg.LinAlgError:
            pinv_A = stable_pinv(mat)
            rank = int(np.linalg.matrix_rank(mat, tol=evd_tol))
    proj_A = np.eye(mat.shape[0]) - mat @ pinv_A
    return pinv_A, proj_A, float(np.trace(pinv_A)), rank


def rank_one_inverse_trace_update(vector_update, pinv_A, proj_A,
                                  pinv_A_trace, force_rank_increase=False):
    """trace(pinv(A + v v^T)) from trace(pinv(A)) using only the diagonal
    of Meyer's update term (reference:
    germselection.rank_one_inverse_trace_update:5096).  Returns
    (updated_trace, rank_increased)."""
    v_ = np.asarray(vector_update).reshape(-1)
    v = pinv_A @ v_
    beta = 1.0 + float(v_ @ v)
    w = proj_A @ v_
    norm_w = np.linalg.norm(w)
    if norm_w > 1e-10:
        G_diag = (-2.0 / norm_w ** 2) * (v * w) \
            + (beta / norm_w ** 4) * (w ** 2)
        rank_increased = True
    elif beta > 1e-10:
        G_diag = (-beta / abs(beta) ** 2) * (v ** 2)
        rank_increased = False
    else:
        # v is a "-1 eigenstate" corner case (Meyer case 6)
        gamma = pinv_A @ v
        norm_v = np.linalg.norm(v)
        G_diag = (-2.0 / norm_v ** 2) * (gamma * v) \
            + (float(v @ gamma) / norm_v ** 4) * (v ** 2)
        rank_increased = False
    return float(np.sum(G_diag) + pinv_A_trace), rank_increased


def rank_one_psuedoinverse_update(vector_update, pinv_A, proj_A,
                                  force_rank_increase=False):
    """pinv(A + v v^T) from pinv(A) (Meyer's generalized-inverse update;
    reference: germselection.rank_one_psuedoinverse_update:5159).  Returns
    (updated_pinv, rank_increased)."""
    v_ = np.asarray(vector_update).reshape(-1, 1)
    assert np.linalg.norm(np.imag(v_)) <= 1e-16
    v = pinv_A @ v_
    beta = 1.0 + float((v_.T @ v)[0, 0])
    w = proj_A @ v_
    norm_w = np.linalg.norm(w)
    if norm_w > 1e-10:
        vw = v @ w.T
        G = (-1.0 / norm_w ** 2) * (vw + vw.T) \
            + (beta / norm_w ** 4) * (w @ w.T)
        rank_increased = True
    elif beta > 1e-10:
        G = (-beta / abs(beta) ** 2) * (v @ v.T)
        rank_increased = False
    else:
        gamma = pinv_A @ v
        norm_v = np.linalg.norm(v)
        gv = gamma @ v.T
        G = (-1.0 / norm_v ** 2) * (gv + gv.T) \
            + (float(np.sum(v * gamma)) / norm_v ** 4) * (v @ v.conj().T)
        rank_increased = False
    return pinv_A + G, rank_increased


def _penalty_terms(l1_penalty, op_penalty, gate_penalty, germ_lengths,
                   num_germs, germ_list):
    n = num_germs if num_germs is not None else \
        (len(germ_lengths) if germ_lengths is not None else 0)
    score = l1_penalty * n
    if op_penalty != 0.0:
        if germ_lengths is None:
            raise ValueError("Must provide germ_lengths when "
                             "op_penalty != 0.0!")
        score += op_penalty * float(np.sum(germ_lengths))
    if gate_penalty is not None:
        assert germ_list is not None, \
            "Must specify germ_list when using gate_penalty."
        for gate, penalty in gate_penalty.items():
            for circ in germ_list:
                count = sum(1 for layer in circ.layertup
                            for lbl in (layer.components
                                        if hasattr(layer, 'components')
                                        and not layer.is_simple
                                        else (layer,))
                            if getattr(lbl, 'name', str(lbl)) == gate)
                score += penalty * count
    return score


def _remove_spam_vectors(model):
    """A copy of `model` with preps and povms removed -- germ selection
    scores only gate parameters (reference:
    germselection._remove_spam_vectors:1077)."""
    reduced = model.copy()
    try:
        for lbl in list(reduced.preps.keys()):
            del reduced.preps[lbl]
        for lbl in list(reduced.povms.keys()):
            del reduced.povms[lbl]
    except (AttributeError, KeyError, TypeError):
        pass  # implicit models: scoring falls back to the full model
    return reduced


def _resolve_nongauge(num_nongauge_params, model):
    if num_nongauge_params is not None:
        return num_nongauge_params
    if model is None:
        raise ValueError("Must provide either num_nongauge_params or model!")
    reduced = _remove_spam_vectors(model)
    return int(round(np.trace(_nongauge_projector(reduced))))


def compute_composite_germ_set_score_compactevd(
        current_update_cache, germ_update, score_fn="all", threshold_ac=1e6,
        init_n=1, model=None, partial_germs_list=None, eps=None,
        num_germs=None, op_penalty=0.0, l1_penalty=0.0,
        num_nongauge_params=None, num_params=None,
        force_rank_increase=False, germ_lengths=None, gate_penalty=None,
        germ_list=None):
    """CompositeScore of a candidate germ set via the low-rank SPECTRUM
    update: count how many of the largest nongauge eigenvalues keep the
    list_score under `threshold_ac` (reference:
    germselection.compute_composite_germ_set_score_compactevd:4305)."""
    from pygsti_tpu.algorithms.scoring import CompositeScore, list_score
    fn = (lambda ev: list_score(ev, score_fn)) if isinstance(score_fn, str) \
        else score_fn
    num_nongauge_params = _resolve_nongauge(num_nongauge_params, model)
    penalties = _penalty_terms(l1_penalty, op_penalty, gate_penalty,
                               germ_lengths, num_germs, germ_list)
    new_evals, rank_increased = symmetric_low_rank_spectrum_update(
        germ_update, current_update_cache[0], current_update_cache[1],
        current_update_cache[2], force_rank_increase)
    if not rank_increased:
        return CompositeScore(np.inf, -np.inf, -np.inf)
    padded = np.pad(new_evals, (num_params - len(new_evals), 0))
    observable = padded[-num_nongauge_params:]
    N_AC, AC_score = 0, np.inf
    for N in range(init_n, len(observable) + 1):
        cand = fn(observable[-N:])
        if cand > threshold_ac:
            break
        AC_score, N_AC = cand, N
    return CompositeScore(-N_AC + penalties, AC_score, N_AC)


def compute_composite_germ_set_score_low_rank_trace(
        current_update_cache, germ_update, threshold_ac=1e6, model=None,
        partial_germs_list=None, eps=None, num_germs=None, op_penalty=0.0,
        l1_penalty=0.0, num_nongauge_params=None,
        force_rank_increase=False, germ_lengths=None, gate_penalty=None,
        germ_list=None):
    """CompositeScore via the low-rank pseudoinverse-TRACE update (minamide
    formula): N = updated rank, score = updated trace (reference:
    germselection.compute_composite_germ_set_score_low_rank_trace:4466)."""
    from pygsti_tpu.algorithms.scoring import CompositeScore
    num_nongauge_params = _resolve_nongauge(num_nongauge_params, model)
    penalties = _penalty_terms(l1_penalty, op_penalty, gate_penalty,
                               germ_lengths, num_germs, germ_list)
    inverse_trace, updated_rank, rank_increased = \
        minamide_style_inverse_trace(
            germ_update, current_update_cache[0], current_update_cache[1],
            current_update_cache[2], force_rank_increase)
    if not rank_increased:
        N_AC, AC_score = -np.inf, -np.inf
    else:
        N_AC, AC_score = updated_rank, inverse_trace
    return CompositeScore(-N_AC + penalties, AC_score, N_AC)


def compute_composite_vector_set_score(current_update_cache, vector_update,
                                       model=None, num_nongauge_params=None,
                                       force_rank_increase=False,
                                       printer=None):
    """CompositeScore of adding one amplified-direction vector, via the
    rank-one pseudoinverse-trace update (reference:
    germselection.compute_composite_vector_set_score:4941)."""
    from pygsti_tpu.algorithms.scoring import CompositeScore
    num_nongauge_params = _resolve_nongauge(num_nongauge_params, model)
    inverse_trace, rank_increased = rank_one_inverse_trace_update(
        vector_update, current_update_cache[0], current_update_cache[1],
        current_update_cache[2], force_rank_increase)
    if not rank_increased and force_rank_increase:
        return CompositeScore(np.inf, -np.inf, -np.inf)
    N_AC = current_update_cache[3] + (1 if rank_increased else 0)
    return CompositeScore(-N_AC, inverse_trace, N_AC)


def _bulk_twirled_ddd_compact(model, germ_list, tol, evd_tol=1e-10):
    """Per-germ compact halves A_g (with A_g A_g^T = Re(T_g^H T_g), the
    twirled-derivative Gramian) and their eigenvalue lists (reference:
    germselection._compute_bulk_twirled_ddd_compact:3106)."""
    halves, eig_lists = [], []
    for germ in germ_list:
        T = twirled_deriv(model, germ, tol)
        DDD = np.real(T.conj().T @ T)
        e, U = compact_EVD(DDD, evd_tol, assume_hermitian=True)
        halves.append(U * np.sqrt(np.abs(e))[None, :])
        eig_lists.append(e)
    return halves, eig_lists


def germ_set_spanning_vectors(target_model, germ_list, float_type=None,
                              num_nongauge_params=None, tol=1e-6,
                              pretest=False, evd_tol=1e-10, verbosity=1,
                              threshold=1e6, mode='greedy',
                              update_cache_low_rank=False, final_test=True,
                              comm=None):
    """Select a minimal set of amplified directions spanning the nongauge
    parameter space across an (assumed amplificationally complete) germ
    set, for globally-aware fiducial pair reduction (reference:
    germselection.germ_set_spanning_vectors:4647).  Returns
    (germ_vec_dict, currentDDD)."""
    from pygsti_tpu.algorithms.scoring import CompositeScore
    from pygsti_tpu.baseobjs.verbosityprinter import VerbosityPrinter
    printer = VerbosityPrinter.create_printer(verbosity)
    num_nongauge = _resolve_nongauge(num_nongauge_params, target_model)
    printer.log('Number of non-gauge parameters: %d' % num_nongauge, 1)

    halves, eig_lists = _bulk_twirled_ddd_compact(target_model, germ_list,
                                                  tol, evd_tol)
    composite = np.concatenate(halves, axis=1)
    composite_eigs = np.concatenate(eig_lists, axis=None)
    idx_to_germ = [(germ, j) for gi, germ in enumerate(germ_list)
                   for j in range(len(eig_lists[gi]))]
    germ_vec_dict = {germ: [] for germ in germ_list}

    if mode == 'greedy':
        n_cand = composite.shape[1]
        weights = np.zeros(n_cand, np.int64)
        best0 = int(np.argmax(composite_eigs))
        weights[best0] = 1
        germ_vec_dict[idx_to_germ[best0][0]].append(
            composite[:, [best0]] / np.sqrt(composite_eigs[best0]))
        currentDDD = composite[:, [best0]] @ composite[:, [best0]].conj().T
        initN = 1
        best_score = CompositeScore(1.0e100, 0, None)
        while np.any(weights == 0) and initN < num_nongauge:
            cache = construct_update_cache_rank_one(currentDDD,
                                                    evd_tol=evd_tol)
            best_score = CompositeScore(1.0e100, 0, None)
            best_idx = None
            for idx in np.where(weights == 0)[0]:
                score = compute_composite_vector_set_score(
                    cache, composite[:, [idx]],
                    num_nongauge_params=num_nongauge)
                if score < best_score:
                    best_score, best_idx = score, int(idx)
            weights[best_idx] = 1
            initN = best_score.N
            printer.log('Best score this iteration: %s' % best_score, 2)
            sel = np.where(weights == 1)[0]
            currentDDD = composite[:, sel] @ composite[:, sel].conj().T
            germ_vec_dict[idx_to_germ[best_idx][0]].append(
                composite[:, [best_idx]] / np.sqrt(composite_eigs[best_idx]))
        if final_test and best_score.N is not None:
            evals = np.flip(np.linalg.eigvalsh(currentDDD))
            restricted = evals[:num_nongauge]
            test_rank = int(np.count_nonzero(restricted > 1e-7))
            test_trace = float(np.sum(1.0 / restricted[restricted > 1e-7]))
            if abs(test_trace - best_score.minor) > 1 or \
               test_rank != best_score.N:
                raise ValueError(
                    'Final test failed: trace %g vs %g, rank %d vs %d'
                    % (test_trace, best_score.minor, test_rank,
                       best_score.N))
    elif mode == 'RRQR':
        import scipy.linalg as _sla
        _, _, Vh = np.linalg.svd(composite, full_matrices=False)
        _, Pp = _sla.qr(Vh[:num_nongauge, :], mode='r', pivoting=True)
        sel = Pp[:num_nongauge]
        for vec_idx in sel:
            germ_vec_dict[idx_to_germ[vec_idx][0]].append(
                composite[:, [vec_idx]] / np.sqrt(composite_eigs[vec_idx]))
        currentDDD = composite[:, sel] @ composite[:, sel].conj().T
    else:
        raise NotImplementedError("mode must be 'greedy' or 'RRQR'")
    return germ_vec_dict, currentDDD
