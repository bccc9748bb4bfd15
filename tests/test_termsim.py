"""Tests for the Taylor-term forward simulator and polynomial/opcalc stack."""

import numpy as np
import pytest

from pygsti_tpu.baseobjs.polynomial import (Polynomial,
                                            bulk_load_compact_polynomials,
                                            compact_polynomial_list)
from pygsti_tpu.baseobjs import opcalc
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.forwardsims.termforwardsim import TermForwardSimulator
from pygsti_tpu.modelpacks import smq1Q_XYI as mp


class TestPolynomial:
    def test_algebra(self):
        p = Polynomial({(): 1.0, (0,): 2.0})
        q = Polynomial({(1,): 3.0})
        r = p.mult(q)
        assert r == {(1,): 3.0, (0, 1): 6.0}
        x = np.array([0.5, 2.0])
        assert abs(r.evaluate(x) - (3.0 * 2 + 6.0 * 0.5 * 2)) < 1e-12
        assert abs((p ** 2).evaluate(x) - p.evaluate(x) ** 2) < 1e-12

    def test_deriv(self):
        p = Polynomial({(0, 0): 3.0, (0, 1): 2.0, (1,): 5.0})
        d0 = p.deriv(0)
        x = np.array([0.7, 1.3])
        assert abs(d0.evaluate(x) - (6 * 0.7 + 2 * 1.3)) < 1e-12

    def test_compact_roundtrip(self):
        polys = [Polynomial({(): 1.0, (2,): 1j}), Polynomial({(0, 1): 2.0})]
        vt, ct = compact_polynomial_list(polys)
        loaded = bulk_load_compact_polynomials(vt, ct)
        x = np.array([0.3, 0.4, 0.5], complex)
        for a, b in zip(polys, loaded):
            assert abs(a.evaluate(x) - b.evaluate(x)) < 1e-12

    def test_bulk_eval_native_matches_python(self):
        rng = np.random.RandomState(0)
        polys = []
        for _ in range(30):
            coeffs = {tuple(sorted(rng.randint(0, 8, rng.randint(0, 4)))):
                      complex(rng.randn(), rng.randn())
                      for _ in range(rng.randint(1, 5))}
            polys.append(Polynomial(coeffs))
        vt, ct = compact_polynomial_list(polys)
        x = rng.randn(8).astype(complex)
        py = opcalc._py_bulk_eval(vt, ct, x, (len(polys),), 'complex')
        full = opcalc.bulk_eval_compact_polynomials_complex(vt, ct, x,
                                                            (len(polys),))
        assert np.abs(py - full).max() < 1e-12

    def test_compact_deriv_matches_poly_deriv(self):
        p = Polynomial({(0, 0): 3.0, (0, 1): 2.0, (1,): 5.0})
        vt, ct = compact_polynomial_list([p])
        x = np.array([0.7, 1.3], complex)
        dmat = opcalc.bulk_eval_compact_polynomials_derivs_complex(
            vt, ct, np.array([0, 1]), x, (1, 2))
        assert abs(dmat[0, 0] - p.deriv(0).evaluate(x)) < 1e-12
        assert abs(dmat[0, 1] - p.deriv(1).evaluate(x)) < 1e-12


@pytest.fixture(scope='module')
def noisy_hs_model():
    m = mp.target_model('H+s')
    rng = np.random.RandomState(3)
    m.from_vector(m.to_vector() + rng.randn(m.num_params) * 0.005)
    return m


class TestTermForwardSimulator:
    def test_order2_matches_dense_weak_noise(self, noisy_hs_model):
        m = noisy_hs_model
        sim = TermForwardSimulator(m, max_order=2)
        for c in [Circuit([('Gxpi2', 0)], (0,)),
                  Circuit([('Gxpi2', 0), ('Gypi2', 0), ('Gxpi2', 0)], (0,)),
                  Circuit([], (0,)),
                  Circuit([('Gypi2', 0)] * 4, (0,))]:
            pd = m.probabilities(c)
            pt = sim.probs(c)
            assert max(abs(pt[o] - pd[o]) for o in pd) < 5e-6

    def test_cubic_convergence(self):
        """Order-2 truncation error scales as noise^3."""
        c = Circuit([('Gxpi2', 0), ('Gypi2', 0), ('Gxpi2', 0)], (0,))
        rng = np.random.RandomState(3)
        noise = rng.randn(30)
        errs = []
        for scale in [0.01, 0.005]:
            m = mp.target_model('H+s')
            m.from_vector(m.to_vector() + noise * scale)
            sim = TermForwardSimulator(m, max_order=2)
            errs.append(max(abs(sim.probs(c)[o] - m.probabilities(c)[o])
                            for o in m.probabilities(c)))
        assert 5 < errs[0] / errs[1] < 12

    def test_order1_worse_than_order2(self, noisy_hs_model):
        m = noisy_hs_model
        c = Circuit([('Gxpi2', 0), ('Gypi2', 0)], (0,))
        pd = m.probabilities(c)
        e1 = max(abs(TermForwardSimulator(m, max_order=1).probs(c)[o] - pd[o])
                 for o in pd)
        e2 = max(abs(TermForwardSimulator(m, max_order=2).probs(c)[o] - pd[o])
                 for o in pd)
        assert e2 < e1

    def test_dprobs_matches_finite_difference(self, noisy_hs_model):
        m = noisy_hs_model
        c = Circuit([('Gxpi2', 0), ('Gypi2', 0)], (0,))
        sim = TermForwardSimulator(m, max_order=2)
        dp = sim.dprobs(c)
        v = m.to_vector().copy()
        base = dict(m.probabilities(c))
        eps = 1e-6
        for k in [0, 3, 10]:
            v2 = v.copy(); v2[k] += eps
            m.from_vector(v2)
            pp = m.probabilities(c)
            m.from_vector(v)
            for o in base:
                fd = (pp[o] - base[o]) / eps
                assert abs(fd - dp[o][k]) < 1e-3

    def test_polys_probability_conservation(self, noisy_hs_model):
        """Outcome polynomials sum to the constant 1 (all orders cancel)."""
        m = noisy_hs_model
        sim = TermForwardSimulator(m, max_order=2)
        c = Circuit([('Gxpi2', 0), ('Gypi2', 0)], (0,))
        polys, outcomes = sim.prob_polynomials(c)
        total = polys[0]
        for p in polys[1:]:
            total = total.add(p)
        assert abs(total.get((), 0) - 1.0) < 1e-10
        for k, val in total.items():
            if k != ():
                assert abs(val) < 1e-9, (k, val)

    def test_rejects_nonlinear_parameterization(self):
        m = mp.target_model('CPTPLND')
        sim = TermForwardSimulator(m, max_order=1)
        with pytest.raises((ValueError, KeyError)):
            sim.probs(Circuit([('Gxpi2', 0)], (0,)))


class TestGeneralOrderAndPruning:
    """Arbitrary taylor order + pruned-path SOPM machinery
    (reference: termforwardsim.py:40-161, 416-941)."""

    def test_general_order2_matches_fast_path(self, noisy_hs_model):
        m = noisy_hs_model
        sim = TermForwardSimulator(m, max_order=2)
        c = Circuit([('Gxpi2', 0), ('Gypi2', 0), ('Gxpi2', 0)], (0,))
        polys_fast, outs = sim.prob_polynomials(c)
        polys_gen, outs2, ach, mx = sim.prob_polynomials_general(c)
        v = np.asarray(m.to_vector())
        for pf, pg in zip(polys_fast, polys_gen):
            assert abs(pf.evaluate(v) - pg.evaluate(v)) < 1e-12
        assert 0 < ach <= mx * (1 + 1e-9)

    def test_higher_order_improves_accuracy(self):
        """Order-4 expansion beats order-2 at moderate noise."""
        c = Circuit([('Gxpi2', 0), ('Gypi2', 0)] * 2, (0,))
        m = mp.target_model('H+s')
        rng = np.random.RandomState(5)
        m.from_vector(m.to_vector() + rng.randn(m.num_params) * 0.03)
        pd = m.probabilities(c)
        errs = {}
        for order in (2, 4):
            sim = TermForwardSimulator(m, max_order=order)
            pt = sim.probs(c)
            errs[order] = max(abs(pt[o] - pd[o]) for o in pd)
        assert errs[4] < errs[2] * 0.2

    def test_pruned_mode_matches_exact(self, noisy_hs_model):
        m = noisy_hs_model
        c = Circuit([('Gxpi2', 0), ('Gypi2', 0), ('Gxpi2', 0)], (0,))
        exact = TermForwardSimulator(m, max_order=2).probs(c)
        pruned = TermForwardSimulator(m, max_order=2, mode='pruned',
                                      min_term_mag=1e-6,
                                      allowed_perr=1e-3).probs(c)
        assert max(abs(pruned[o] - exact[o]) for o in exact) < 1e-3

    def test_pruning_drops_paths_and_gap_tracks(self, noisy_hs_model):
        m = noisy_hs_model
        c = Circuit([('Gxpi2', 0), ('Gypi2', 0)] * 3, (0,))
        sim = TermForwardSimulator(m, max_order=3, mode='pruned')
        # aggressive threshold drops paths -> fewer monomials
        polys_all, _, ach_all, mx = sim.prob_polynomials_general(
            c, min_term_mag=0.0)
        polys_cut, _, ach_cut, mx2 = sim.prob_polynomials_general(
            c, min_term_mag=1e-5)
        n_all = sum(len(p) for p in polys_all)
        n_cut = sum(len(p) for p in polys_cut)
        assert n_cut < n_all
        assert ach_cut <= ach_all + 1e-12
        assert abs(mx - mx2) < 1e-12

    def test_clear_error_for_unsupported_model(self):
        m = mp.target_model('full TP')
        sim = TermForwardSimulator(m, max_order=2)
        with pytest.raises(ValueError, match="[Tt]erm simulator"):
            sim.probs(Circuit([('Gxpi2', 0)], (0,)))
