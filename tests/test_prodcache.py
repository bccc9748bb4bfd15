"""Tests for the germ-power product-cache factorization (layouts/prodcache.py)
and the factorized forward-simulation / Jacobian paths built on it.

Reference parity target: the factorized evaluation must agree with the
direct scanned propagation (and hence with the reference oracle, see
tests/test_probs_parity.py) to reassociation-level precision.
"""

import os

import numpy as np
import pytest

from pygsti_tpu.layouts.prodcache import (
    factorize_layout, _best_power_blocks)


class _FakeModel:
    def __init__(self, dim):
        self.dim = dim


class _FakeLayout:
    """Minimal layout stand-in for direct prodcache tests."""

    def __init__(self, seqs, n_ops, dim, n_prep=2, n_eff=3, rng=None):
        rng = rng or np.random.default_rng(0)
        B = len(seqs)
        D = max((len(s) for s in seqs), default=1)
        self.op_indices = np.full((B, max(D, 1)), n_ops, np.int32)
        for r, s in enumerate(seqs):
            self.op_indices[r, :len(s)] = s
        self.depths = np.array([len(s) for s in seqs], np.int32)
        self.identity_index = n_ops
        self.prep_index = rng.integers(0, n_prep, B).astype(np.int32)
        self.elem_circuit = np.repeat(np.arange(B, dtype=np.int32), n_eff)
        self.elem_effect = np.tile(np.arange(n_eff, dtype=np.int32), B)
        self.num_elements = B * n_eff
        self.model = _FakeModel(dim)


def _eval_factorized(F, Gx, preps, effs):
    T = list(Gx)
    for lefts, rights in F.levels:
        for l, r in zip(lefts, rights):
            T.append(T[l] @ T[r])
    T = np.array(T)
    a = np.einsum('mij,rj->mri', T[F.a_pfx_cache], preps[:F.n_preps])
    a = a.reshape(-1, preps.shape[1])
    e = np.einsum('oi,mij->moj', effs[:F.n_effects], T[F.e_sfx_cache])
    e = e.reshape(-1, preps.shape[1])
    X = np.einsum('qij,qj->qi', T[F.pair_g], a[F.pair_a])
    return np.sum(e[F.elem_erow] * X[F.elem_pair], axis=1)


def _eval_direct(L, Gx, preps, effs):
    p = np.empty(L.num_elements)
    for el in range(L.num_elements):
        r = L.elem_circuit[el]
        rho = preps[L.prep_index[r]]
        for op in L.op_indices[r, :L.depths[r]]:
            rho = Gx[op] @ rho
        p[el] = effs[L.elem_effect[el]] @ rho
    return p


class TestPowerBlockDetection:
    def test_simple_power(self):
        ops = np.array([[0, 1, 2, 1, 2, 1, 2, 3]], np.int32)
        start, period, mult = _best_power_blocks(ops, np.array([8]))
        assert mult[0] == 3 and period[0] == 2 and start[0] == 1

    def test_no_power(self):
        ops = np.array([[0, 1, 2, 3]], np.int32)
        _, _, mult = _best_power_blocks(ops, np.array([4]))
        assert mult[0] == 0

    def test_single_op_power(self):
        ops = np.array([[3, 3, 3, 3, 3]], np.int32)
        start, period, mult = _best_power_blocks(ops, np.array([5]))
        assert period[0] == 1 and mult[0] == 5 and start[0] == 0

    def test_padding_ignored(self):
        # identity padding beyond the row's depth must not create blocks
        ops = np.array([[0, 1, 9, 9, 9, 9]], np.int32)
        _, _, mult = _best_power_blocks(ops, np.array([2]))
        assert mult[0] == 0


class TestProductCacheNumerics:
    def _check(self, seqs, n_ops=5, dim=4, seed=1):
        rng = np.random.default_rng(seed)
        L = _FakeLayout(seqs, n_ops, dim, rng=rng)
        F = factorize_layout(L)
        G = np.array([np.linalg.qr(rng.standard_normal((dim, dim)))[0]
                      for _ in range(n_ops)])
        Gx = np.concatenate([G, np.eye(dim)[None]], 0)
        preps = rng.standard_normal((2, dim))
        effs = rng.standard_normal((3, dim))
        p = _eval_factorized(F, Gx, preps, effs)
        p_ref = _eval_direct(L, Gx, preps, effs)
        assert np.abs(p - p_ref).max() < 1e-12
        return F

    def test_gst_like_deep_powers(self):
        germ = [1, 2]
        seqs = [pf + germ * k + mf
                for k in (1, 2, 4, 8, 16, 32)
                for pf in ([0], [3, 4], [])
                for mf in ([2], [0, 1], [])]
        F = self._check(seqs)
        # repeated squaring: cache depth is logarithmic, entries modest
        assert len(F.levels) <= 10
        assert F.n_cache < 40
        # germ powers must actually have been extracted: prefixes are the
        # handful of fiducials (+ phase-shifted germ variants), not rows
        assert len(F.a_pfx_cache) <= 8

    def test_random_and_edge_rows(self):
        rng = np.random.default_rng(7)
        seqs = [list(rng.integers(0, 5, rng.integers(0, 9)))
                for _ in range(25)]
        seqs += [[], [0], [4, 4], [0, 1, 0, 1, 0]]
        self._check(seqs)

    def test_known_word_reuse_for_power_free_rows(self):
        # L=1-style rows (germ appears once) must reuse the germ product
        germ = [1, 2, 3]
        seqs = [[0] + germ * 4 + [4]] + \
               [pf + germ + mf for pf in ([0], [4]) for mf in ([0], [4])]
        F = self._check(seqs)
        # all rows factored: every prefix is a 1-op fiducial
        assert len(F.a_pfx_cache) <= 2


def test_factorized_vs_scan_full_stack(monkeypatch):
    """End-to-end: SimpleForwardSimulator probs + objective Jacobians agree
    between the factorized path and the scan path on a real model."""
    import jax
    from pygsti_tpu.modelpacks import smq1Q_XYI as mp
    from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
    from pygsti_tpu.data import simulate_data
    from pygsti_tpu.objectivefns.objectivefns import (
        ObjectiveFunctionBuilder, TimeIndependentMDCObjectiveFunction)

    target = mp.target_model('full TP')
    lists = create_lsgst_circuit_lists(
        target, mp.prep_fiducials(), mp.meas_fiducials(), mp.germs(), [1, 2, 4, 8])
    circuits = list(lists[-1])
    datagen = mp.target_model('full TP').depolarize(op_noise=0.02, spam_noise=0.01)
    ds = simulate_data(datagen, circuits, 1000, seed=42)

    def build(env_val):
        monkeypatch.setenv('PYGSTI_TPU_FACTORIZED', env_val)
        mdl = target.copy()
        layout = mdl.sim.create_layout(circuits, ds)
        if env_val == '1':
            assert layout.factorization is not None
        else:
            assert layout.factorization is None
        raw = ObjectiveFunctionBuilder('logl').build_raw()
        obj = TimeIndependentMDCObjectiveFunction(raw, mdl, ds, circuits,
                                                  layout=layout)
        v = mdl.to_vector()
        return (np.asarray(obj.lsvec(v)), np.asarray(obj.dlsvec(v)),
                obj.jtj_jtf(v))

    ls_f, J_f, (lsj_f, jtj_f, jtf_f) = build('1')
    ls_s, J_s, (lsj_s, jtj_s, jtf_s) = build('0')
    assert np.allclose(ls_f, ls_s, atol=1e-9)
    assert np.allclose(J_f, J_s, atol=1e-7)
    assert np.allclose(np.asarray(jtj_f), np.asarray(jtj_s),
                       rtol=1e-6, atol=1e-6)
    assert np.allclose(np.asarray(jtf_f), np.asarray(jtf_s),
                       rtol=1e-6, atol=1e-6)
