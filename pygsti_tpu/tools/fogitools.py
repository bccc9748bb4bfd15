"""First-order-gauge-invariant (FOGI) analysis
(reference: pygsti/tools/fogitools.py, models/fogistore.py).

To first order, a gauge transformation exp(eps K) changes each gate's error
generator by  delta L_k = K - T_k^-1 K T_k  (T_k = the ideal/target gate)
and the SPAM error maps by -K (prep) and +K (effects).  Stacking the
elementary-errorgen coefficients of these shifts over all gauge directions
K_j gives the gauge-action matrix M; FOGI quantities are the left null
space of M -- linear combinations of error rates no gauge transformation
can change.
"""

from __future__ import annotations

import collections

import numpy as np

from pygsti_tpu.baseobjs.basis import Basis
from pygsti_tpu.tools import lindbladtools as _lt
from pygsti_tpu.tools.basistools import change_basis


def elementary_errorgen_bases(basis, typs=('H', 'S')):
    """(labels, gens, duals): elementary errorgens over non-identity basis
    elements, with duals normalized so <dual_i, gen_j> = delta_ij."""
    els = basis.elements
    labels, gens, duals = [], [], []
    for typ in typs:
        for i in range(1, els.shape[0]):
            g = np.real(change_basis(_lt.create_elementary_errorgen(typ, els[i]),
                                     'std', basis))
            d = change_basis(_lt.create_elementary_errorgen_dual(typ, els[i]),
                             'std', basis)
            labels.append((typ, basis.labels[i]))
            gens.append(g)
            duals.append(d)
    gens = np.stack(gens)
    duals = np.stack(duals)
    # re-orthonormalize duals against gens (guards dual normalization)
    gram = np.einsum('aij,bij->ab', duals.conj(), gens)
    duals = np.einsum('ab,bij->aij', np.linalg.inv(gram).T.conj(), duals)
    return labels, gens, duals


def errorgen_coefficients_of(L, duals):
    """Project a dense error generator onto the elementary basis."""
    return np.real(np.einsum('aij,ij->a', duals.conj(), L))


def _spam_extractors(gens, rho0_vec, effect_stack):
    """(extract_prep, extract_povm): least-norm coefficient extraction
    operators for SPAM errors, which are only observable through their
    action on rho0 / the effects.  extract_prep(delta_rho) and
    extract_povm(delta_effects_flat) return coefficient vectors consistent
    with the gauge-action rows (same pinv applied to both)."""
    n = gens.shape[0]
    A = np.stack([gens[j] @ rho0_vec for j in range(n)], axis=1)      # [d2, n]
    A_pinv = np.linalg.pinv(A, rcond=1e-10)
    B = np.stack([(effect_stack @ gens[j]).reshape(-1) for j in range(n)],
                 axis=1)                                               # [nE*d2, n]
    B_pinv = np.linalg.pinv(B, rcond=1e-10)
    return A_pinv, B_pinv


def compute_gauge_action_matrix(target_ops, basis, typs=('H', 'S'),
                                include_spam=True, rho0_vec=None,
                                effect_stack=None):
    """M [n_total_coeffs, n_gauge_dirs] of first-order gauge action.

    target_ops: dict {label: dense target superop}.  Gauge directions =
    the same elementary errorgens.  SPAM rows use the least-norm coefficient
    extraction (SPAM errorgens are only observable through rho0 / effects)."""
    labels, gens, duals = elementary_errorgen_bases(basis, typs)
    n = len(labels)
    op_items = list(target_ops.items())
    rows_per_block = n
    n_blocks = len(op_items) + (2 if include_spam else 0)
    M = np.zeros((n_blocks * rows_per_block, n))
    row_labels = []
    for bi, (lbl, T) in enumerate(op_items):
        Tinv = np.linalg.inv(T)
        for j in range(n):
            K = gens[j]
            dL = K - Tinv @ K @ T
            M[bi * n:(bi + 1) * n, j] = errorgen_coefficients_of(dL, duals)
        row_labels.extend([(lbl, l) for l in labels])
    if include_spam:
        assert rho0_vec is not None and effect_stack is not None, \
            "include_spam requires rho0_vec and effect_stack"
        A_pinv, B_pinv = _spam_extractors(gens, rho0_vec, effect_stack)
        base = len(op_items) * n
        for j in range(n):
            M[base:base + n, j] = np.real(A_pinv @ (-gens[j] @ rho0_vec))
            M[base + n:base + 2 * n, j] = np.real(
                B_pinv @ (effect_stack @ gens[j]).reshape(-1))
        row_labels.extend([('rho0', l) for l in labels])
        row_labels.extend([('Mdefault', l) for l in labels])
    return M, row_labels, labels


def compute_fogi_directions(target_ops, basis, typs=('H', 'S'), include_spam=True,
                            tol=1e-7, rho0_vec=None, effect_stack=None):
    """FOGI directions: orthonormal rows q with q^T M_gauge = 0.
    Returns (Q [n_fogi, n_total_coeffs], row_labels)."""
    M, row_labels, gauge_labels = compute_gauge_action_matrix(
        target_ops, basis, typs, include_spam, rho0_vec, effect_stack)
    U, s, Vh = np.linalg.svd(M, full_matrices=True)
    rank = int(np.sum(s > tol * max(s[0] if len(s) else 1.0, 1e-30)))
    Q = U[:, rank:].T  # left null space
    return Q, row_labels


class FOGIStore(object):
    """Stores FOGI directions for a model and evaluates FOGI error rates
    (reference: models/fogistore.py:836)."""

    def __init__(self, target_ops, basis, typs=('H', 'S'), include_spam=True,
                 rho0_vec=None, effect_stack=None):
        self.basis = Basis.cast(basis, next(iter(target_ops.values())).shape[0]) \
            if isinstance(basis, str) else basis
        self.typs = typs
        self.include_spam = include_spam
        self.target_ops = dict(target_ops)
        self.rho0_vec = rho0_vec
        self.effect_stack = effect_stack
        self.fogi_directions, self.errorgen_space_labels = compute_fogi_directions(
            target_ops, self.basis, typs, include_spam, rho0_vec=rho0_vec,
            effect_stack=effect_stack)
        _, self._gens, self._duals = elementary_errorgen_bases(self.basis, typs)
        if include_spam:
            self._A_pinv, self._B_pinv = _spam_extractors(
                self._gens, rho0_vec, effect_stack)

    @property
    def num_fogi_quantities(self):
        return self.fogi_directions.shape[0]

    def errorgen_vector(self, model):
        """Stack the model's per-op (and SPAM) errorgen coefficients in the
        store's row order, extracting L = log(T^-1 G) for each op."""
        import scipy.linalg as spl
        vec = []
        for lbl, T in self.target_ops.items():
            G = model.operations[lbl].to_dense()
            L = np.real(spl.logm(np.linalg.inv(T) @ G))
            vec.append(errorgen_coefficients_of(L, self._duals))
        if self.include_spam:
            prep_lbl = model._default_prep_label()
            povm_lbl = model._default_povm_label()
            drho = model.preps[prep_lbl].to_dense() - self.rho0_vec
            vec.append(np.real(self._A_pinv @ drho))
            dE = (model.povms[povm_lbl].to_dense() - self.effect_stack).reshape(-1)
            vec.append(np.real(self._B_pinv @ dE))
        return np.concatenate(vec)

    def fogi_errorgen_rates(self, model):
        """The gauge-invariant error rates of a model."""
        return self.fogi_directions @ self.errorgen_vector(model)

    # -- naming / classification (reference: fogitools op_elem_vec_names and
    #    the intrinsic/relational split in models/fogistore.py) --------------
    def _row_label_str(self, row_index):
        blk, (typ, plbl) = self.errorgen_space_labels[row_index]
        return "%s(%s)_%s" % (typ, plbl, blk)

    def fogi_quantity_label(self, k, max_terms=4, tol=0.05):
        """Human-readable name for FOGI quantity k: its dominant components,
        e.g. '0.71 H(X)_Gxpi2 - 0.71 H(X)_Gypi2'."""
        q = self.fogi_directions[k]
        order = np.argsort(-np.abs(q))
        parts = []
        for i in order[:max_terms]:
            if abs(q[i]) < tol:
                break
            parts.append("%+.2f %s" % (q[i], self._row_label_str(i)))
        return " ".join(parts) if parts else "(null)"

    def fogi_quantity_labels(self, max_terms=4):
        return [self.fogi_quantity_label(k, max_terms)
                for k in range(self.num_fogi_quantities)]

    def _block_of_row(self, row_index):
        return self.errorgen_space_labels[row_index][0]

    def fogi_quantity_is_intrinsic(self, k, threshold=0.95):
        """True when >= `threshold` of the direction's squared weight lies in
        a single op/SPAM block (an 'intrinsic' error rate of that op);
        otherwise the quantity is 'relational' between ops (reference:
        fogistore's intrinsic/relational classification)."""
        q = self.fogi_directions[k]
        by_block = collections.defaultdict(float)
        for i, w in enumerate(q):
            by_block[self._block_of_row(i)] += float(w * w)
        total = sum(by_block.values())
        return max(by_block.values()) >= threshold * max(total, 1e-300)

    def fogi_contribution(self, model, op_label, error_type='H',
                          intrinsic_or_relational='intrinsic'):
        """Sum of |FOGI rates| of the given kind that involve `op_label`
        with the given elementary-errorgen type (reference:
        model.fogi_contribution, models/model.py:2776)."""
        rates = self.fogi_errorgen_rates(model)
        want_intrinsic = (intrinsic_or_relational == 'intrinsic')
        total = 0.0
        for k in range(self.num_fogi_quantities):
            if self.fogi_quantity_is_intrinsic(k) != want_intrinsic:
                continue
            q = self.fogi_directions[k]
            involves = any(
                abs(q[i]) > 1e-6
                and self.errorgen_space_labels[i][0] == op_label
                and self.errorgen_space_labels[i][1][0] == error_type
                for i in range(len(q)))
            if involves:
                total += abs(float(rates[k]))
        return total


def make_fogi_store_for_model(model, typs=('H', 'S'), include_spam=True):
    """Build a FOGIStore from an ExplicitOpModel's own operations as the
    targets (the usual reference usage: `model.setup_fogi()` on a target
    model; reference models/model.py:2516)."""
    target_ops = {lbl: np.asarray(op.to_dense())
                  for lbl, op in model.operations.items()}
    rho0 = effects = None
    if include_spam:
        rho0 = np.asarray(model.preps[model._default_prep_label()].to_dense())
        effects = np.asarray(model.povms[model._default_povm_label()].to_dense())
    basis = Basis.cast('pp', model.dim)
    return FOGIStore(target_ops, basis, typs=typs, include_spam=include_spam,
                     rho0_vec=rho0, effect_stack=effects)
