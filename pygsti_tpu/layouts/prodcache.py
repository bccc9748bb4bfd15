"""Germ-power product-cache factorization of circuit layouts.

The TPU rebirth of the reference's EvalTree insight
(/root/reference/pygsti/layouts/evaltree.py:31-90,
matrixforwardsim.py:675-729): GST circuits are prepFid * germ^k * measFid,
so the bulk of every circuit's operator product can be computed ONCE as a
shared cache of subproducts -- germ powers via repeated squaring -- and each
circuit reduces to (state-after-prefix) . (cached power matrix) .
(effect-through-suffix).

Differences from the reference's design, driven by TPU/XLA:

* The reference's EvalTree emits a SEQUENTIAL instruction list evaluated
  one pairwise matmul at a time (matrixforwardsim.py:675).  Here the cache
  is organized into dependency LEVELS; each level is one batched [n, d, d]
  matmul on the MXU, and the number of levels is logarithmic in the longest
  germ power (repeated squaring) -- ~10 levels instead of a depth-~70 scan.

* Factorization is structural, not metadata-driven: each row's op-index
  sequence is scanned for its maximal interior repeated block (the germ
  power) by vectorized autocorrelation, so plain circuit lists -- not just
  PlaquetteGridCircuitStructure objects -- factor.  Rows with no repeated
  block degrade gracefully (the whole row becomes the "prefix", evaluated
  by the same short scan that the unfactorized path would use).

Produces a :class:`LayoutFactorization` consumed by
``forwardsims.forwardsim.SimpleForwardSimulator`` (factorized probs kernel)
and ``objectivefns.objectivefns._compiled_objective_graphs`` (linearize-
based Jacobians).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class LayoutFactorization(NamedTuple):
    """Static index tensors describing the factorized evaluation plan.

    Extended-table indexing convention: indices 0..K-1 address the model's
    stacked op tensors, index K is the virtual identity, and indices K+1..
    K+n_cache address cache entries in level order.  Entry i at level L is
    ``T[left[i]] @ T[right[i]]`` where both operands live at levels < L.
    """
    levels: tuple                 # tuple of (lefts int32[n], rights int32[n])
    n_cache: int                  # total cache entries (across levels)
    a_prefix_ops: np.ndarray      # int32 [n_a, Dp]  identity-padded prefix op rows
    a_prep: np.ndarray            # int32 [n_a]      prep row per a-entry
    e_suffix_ops_rev: np.ndarray  # int32 [n_er, Ds] reversed suffix rows, id-padded
    e_effect: np.ndarray          # int32 [n_er]     effect row per e-entry
    pair_g: np.ndarray            # int32 [Q] extended-table index of power block
    pair_a: np.ndarray            # int32 [Q] a-table row
    elem_pair: np.ndarray         # int32 [E]
    elem_erow: np.ndarray         # int32 [E]
    flops_probs: float            # estimated flops of one probs evaluation


def _best_power_blocks(op_indices, depths, max_period=16):
    """Per-row maximal interior repeated block via vectorized autocorrelation.

    Returns int32 arrays (start, period, mult): row r factors as
    ``s[:start] + w^mult + s[start+period*mult:]`` with ``w = s[start:
    start+period]``; mult == 0 marks rows with no block (mult >= 2 required).
    """
    B, D = op_indices.shape
    best_sav = np.zeros(B, dtype=np.int64)
    best_start = np.zeros(B, dtype=np.int32)
    best_p = np.ones(B, dtype=np.int32)
    best_m = np.zeros(B, dtype=np.int32)
    if D < 2 or B == 0:
        return best_start, best_p, best_m
    pos = np.arange(D)
    for p in range(1, min(max_period, D - 1) + 1):
        # match[r, t] = s[r,t] == s[r,t+p], both within the row's depth
        valid = (pos[None, : D - p] + p) < depths[:, None]
        match = (op_indices[:, p:] == op_indices[:, :-p]) & valid
        # longest run of consecutive True per row (+ its start)
        run = np.zeros(B, dtype=np.int64)
        cur = np.zeros(B, dtype=np.int64)
        run_start = np.zeros(B, dtype=np.int64)
        cur_start = np.zeros(B, dtype=np.int64)
        for t in range(D - p):
            col = match[:, t]
            cur_start = np.where(col & (cur == 0), t, cur_start)
            cur = np.where(col, cur + 1, 0)
            upd = cur > run
            run = np.where(upd, cur, run)
            run_start = np.where(upd, cur_start, run_start)
        m = (run + p) // p             # full multiplicity of the periodic block
        sav = np.where(m >= 2, (m - 1) * p, 0)
        upd = sav > best_sav           # strict >: ties keep the smaller period
        best_sav = np.where(upd, sav, best_sav)
        best_start = np.where(upd, run_start.astype(np.int32), best_start)
        best_p = np.where(upd, np.int32(p), best_p)
        best_m = np.where(upd, m.astype(np.int32), best_m)
    best_m = np.where(best_sav > 0, best_m, 0).astype(np.int32)
    return best_start, best_p, best_m


def _find_known_word(seq, words_by_len):
    """Longest known word occurring as a substring of seq -> (start, word)
    or (None, None).  Used to route power-free rows (e.g. the L=1 GST
    circuits, prepFid*germ*measFid) through already-cached germ products."""
    n = len(seq)
    for wl in sorted(words_by_len.keys(), reverse=True):
        if wl > n:
            continue
        words = words_by_len[wl]
        for start in range(n - wl + 1):
            if seq[start:start + wl] in words:
                return start, seq[start:start + wl]
    return None, None


class _CacheBuilder:
    """Hash-consed subsequence product cache with power-aware splitting."""

    def __init__(self, identity_index):
        self.identity_index = identity_index
        self.memo = {(): identity_index}
        self.entries = []   # (left_ref, right_ref); refs are ints (base ops)
        #                     or ('c', i) provisional cache markers

    def build(self, seq):
        """Provisional extended-table ref of prod(seq) = G[s_n]...G[s_1]."""
        seq = tuple(seq)
        hit = self.memo.get(seq)
        if hit is not None:
            return hit
        n = len(seq)
        if n == 1:
            self.memo[seq] = int(seq[0])
            return int(seq[0])
        # power-aware split: smallest period p with seq = w^m, m >= 2
        h = None
        for p in range(1, n // 2 + 1):
            if n % p == 0 and seq == seq[:p] * (n // p):
                h = p * ((n // p) // 2)
                break
        if h is None:
            h = n // 2
        right = self.build(seq[:h])    # earlier part (applied first)
        left = self.build(seq[h:])     # later part
        prov = ('c', len(self.entries))
        self.entries.append((left, right))
        self.memo[seq] = prov
        return prov

    def finalize(self):
        """Assign level-ordered final indices; return (levels, n_cache,
        resolve) where resolve maps provisional indices -> final int."""
        K1 = self.identity_index + 1   # base ops + identity
        depth = {}
        for i, (l, r) in enumerate(self.entries):
            dl = depth[l[1]] if isinstance(l, tuple) else 0
            dr = depth[r[1]] if isinstance(r, tuple) else 0
            depth[i] = 1 + max(dl, dr)
        order = sorted(range(len(self.entries)), key=lambda i: (depth[i], i))
        final_of = {}
        for pos, i in enumerate(order):
            final_of[i] = K1 + pos

        def resolve(ref):
            return final_of[ref[1]] if isinstance(ref, tuple) else int(ref)

        levels = []
        cur_d, lefts, rights = None, [], []
        for i in order:
            d = depth[i]
            l, r = self.entries[i]
            if d != cur_d:
                if lefts:
                    levels.append((np.asarray(lefts, np.int32),
                                   np.asarray(rights, np.int32)))
                cur_d, lefts, rights = d, [], []
            lefts.append(resolve(l))
            rights.append(resolve(r))
        if lefts:
            levels.append((np.asarray(lefts, np.int32),
                           np.asarray(rights, np.int32)))
        return tuple(levels), len(self.entries), resolve


def factorize_layout(layout, max_period=16):
    """Build a :class:`LayoutFactorization` for a compiled layout, or None
    when factorization is not applicable (no rows)."""
    op_indices = layout.op_indices
    B, D = op_indices.shape
    if B == 0:
        return None
    depths = layout.depths
    identity = layout.identity_index

    start, period, mult = _best_power_blocks(op_indices, depths, max_period)

    rows = [tuple(op_indices[r, :depths[r]].tolist()) for r in range(B)]

    # collect power words, then give power-free rows a known-word block
    words = {}
    for r in range(B):
        if mult[r] >= 2:
            words.setdefault(int(period[r]), set()).add(
                rows[r][start[r]:start[r] + period[r]])
    words_by_len = {wl: ws for wl, ws in words.items()}

    cache = _CacheBuilder(identity)
    row_prefix = [None] * B
    row_suffix = [None] * B
    row_gref = [None] * B
    for r in range(B):
        s = rows[r]
        if mult[r] >= 2:
            a, p, m = int(start[r]), int(period[r]), int(mult[r])
            w = s[a:a + p]
            row_prefix[r] = s[:a]
            row_suffix[r] = s[a + p * m:]
            row_gref[r] = cache.build(w * m)
        else:
            a, w = _find_known_word(s, words_by_len) if s else (None, None)
            if w is not None:
                row_prefix[r] = s[:a]
                row_suffix[r] = s[a + len(w):]
                row_gref[r] = cache.build(w)
            else:
                row_prefix[r] = s
                row_suffix[r] = ()
                row_gref[r] = identity

    levels, n_cache, resolve = cache.finalize()
    row_g = np.asarray([resolve(g) for g in row_gref], np.int32)

    # -- a-table: unique (prep, prefix) ------------------------------------
    a_index = {}
    row_a = np.empty(B, np.int32)
    for r in range(B):
        key = (int(layout.prep_index[r]), row_prefix[r])
        ia = a_index.get(key)
        if ia is None:
            ia = len(a_index)
            a_index[key] = ia
        row_a[r] = ia
    n_a = len(a_index)
    Dp = max((len(k[1]) for k in a_index), default=0)
    a_prefix_ops = np.full((n_a, max(Dp, 1)), identity, np.int32)
    a_prep = np.empty(n_a, np.int32)
    for (prep, pref), ia in a_index.items():
        a_prefix_ops[ia, :len(pref)] = pref
        a_prep[ia] = prep

    # -- pair table: unique (g, a) ------------------------------------------
    pair_index = {}
    row_pair = np.empty(B, np.int32)
    for r in range(B):
        key = (int(row_g[r]), int(row_a[r]))
        q = pair_index.get(key)
        if q is None:
            q = len(pair_index)
            pair_index[key] = q
        row_pair[r] = q
    Q = len(pair_index)
    pair_g = np.empty(Q, np.int32)
    pair_a = np.empty(Q, np.int32)
    for (g, ia), q in pair_index.items():
        pair_g[q] = g
        pair_a[q] = ia

    # -- e-table: unique (suffix, effect row), numpy-vectorized over elements
    sfx_index = {}
    row_sfx = np.empty(B, np.int32)
    for r in range(B):
        s = row_suffix[r]
        i = sfx_index.get(s)
        if i is None:
            i = len(sfx_index)
            sfx_index[s] = i
        row_sfx[r] = i
    elem_effect = layout.elem_effect
    elem_circuit = layout.elem_circuit     # holds the ROW index per element
    n_eff_tot = int(elem_effect.max()) + 1 if layout.num_elements else 1
    codes = (row_sfx[elem_circuit].astype(np.int64) * n_eff_tot
             + elem_effect.astype(np.int64))
    uniq_codes, elem_erow = np.unique(codes, return_inverse=True)
    elem_erow = elem_erow.astype(np.int32)
    elem_pair = row_pair[elem_circuit].astype(np.int32)
    n_er = len(uniq_codes)
    sfx_by_id = [None] * len(sfx_index)
    for s, i in sfx_index.items():
        sfx_by_id[i] = s
    Ds = max((len(s) for s in sfx_by_id), default=0)
    e_suffix_ops_rev = np.full((n_er, max(Ds, 1)), identity, np.int32)
    e_effect = (uniq_codes % n_eff_tot).astype(np.int32)
    for ie, code in enumerate(uniq_codes):
        sfx = sfx_by_id[int(code // n_eff_tot)]
        e_suffix_ops_rev[ie, :len(sfx)] = sfx[::-1]   # last layer applied first

    d = getattr(layout.model, 'dim', 0) or 0
    n_lvl_entries = sum(len(l) for l, _ in levels)
    flops_probs = float(
        2 * n_lvl_entries * d ** 3                  # cache levels
        + 2 * n_a * a_prefix_ops.shape[1] * d * d   # a-table scan (gathered)
        + 2 * n_er * e_suffix_ops_rev.shape[1] * d * d
        + 2 * Q * d * d                             # X = C @ a
        + 2 * layout.num_elements * d)              # element dots

    return LayoutFactorization(
        levels=levels, n_cache=n_cache,
        a_prefix_ops=a_prefix_ops, a_prep=a_prep,
        e_suffix_ops_rev=e_suffix_ops_rev, e_effect=e_effect,
        pair_g=pair_g, pair_a=pair_a,
        elem_pair=elem_pair, elem_erow=elem_erow,
        flops_probs=flops_probs)
