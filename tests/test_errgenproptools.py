"""Tests for analytic stabilizer-probability corrections (errgenproptools)."""

import numpy as np
import pytest

from pygsti_tpu.tools import symplectic as sym
from pygsti_tpu.tools.errgenproptools import (
    StabilizerAmplitudes, alpha, approximate_stabilizer_probability,
    approximate_circuit_outcome_probability)
from pygsti_tpu.errorgenpropagation.errorpropagator import (
    PauliLabel, ElementaryErrorgenLabel, ErrorGeneratorPropagator)
from pygsti_tpu.tools.lindbladtools import create_elementary_errorgen

PAULIS_1 = {'I': np.eye(2), 'X': np.array([[0, 1], [1, 0]]),
            'Y': np.array([[0, -1j], [1j, 0]]), 'Z': np.diag([1, -1.0])}


def _pstr_to_mat(s):
    m = 1
    for ch in s:
        m = np.kron(m, PAULIS_1[ch])
    return m


def _pstr_to_label(s, n):
    x = z = 0
    for q, ch in enumerate(s):
        if ch in 'XY':
            x |= (1 << q)
        if ch in 'ZY':
            z |= (1 << q)
    return PauliLabel(x, z, n)


class TestStabilizerAmplitudes:
    def test_amplitudes_reproduce_probabilities_and_stabilizers(self):
        rng = np.random.RandomState(0)
        n = 2
        for _ in range(5):
            s_c, p_c = sym.random_clifford(n, rng)
            S, P = sym.apply_clifford_to_stabilizer_state(
                s_c, p_c, *sym.prep_stabilizer_state(n))
            amps = StabilizerAmplitudes(S, P)
            vec = np.array([amps.amplitude([b0, b1])
                            for b0 in (0, 1) for b1 in (0, 1)])
            probs = np.array([sym.stabilizer_outcome_probability(S, P, [b0, b1])
                              for b0 in (0, 1) for b1 in (0, 1)])
            assert np.allclose(np.abs(vec) ** 2, probs, atol=1e-12)
            assert abs(np.linalg.norm(vec) - 1) < 1e-12


class TestAlpha:
    def test_alpha_matches_dense_errorgens(self):
        """alpha == <b| L(rho) |b> for all H/S/C/A types."""
        rng = np.random.RandomState(1)
        n = 2
        cases = [('H', ('XI',)), ('S', ('YZ',)), ('C', ('XI', 'ZI')),
                 ('A', ('XI', 'YI')), ('A', ('XZ', 'ZX'))]
        for _ in range(3):
            s_c, p_c = sym.random_clifford(n, rng)
            S, P = sym.apply_clifford_to_stabilizer_state(
                s_c, p_c, *sym.prep_stabilizer_state(n))
            amps = StabilizerAmplitudes(S, P)
            vec = np.array([amps.amplitude([b0, b1])
                            for b0 in (0, 1) for b1 in (0, 1)])
            rho = np.outer(vec, vec.conj())
            for typ, pstrs in cases:
                L = create_elementary_errorgen(
                    typ, *[_pstr_to_mat(s) for s in pstrs])
                Lrho = (L @ rho.reshape(-1)).reshape(4, 4)
                lbl = ElementaryErrorgenLabel(
                    typ, *[_pstr_to_label(s, n) for s in pstrs])
                for bidx, bits in enumerate([[0, 0], [0, 1], [1, 0], [1, 1]]):
                    a = alpha(lbl, S, P, bits, amps)
                    assert abs(a - np.real(Lrho[bidx, bidx])) < 1e-9


class TestEndToEnd:
    def test_first_order_matches_dense_weak_noise(self):
        import jax
        from pygsti_tpu.processors import QubitProcessorSpec
        from pygsti_tpu.models.modelconstruction import \
            create_crosstalk_free_model
        from pygsti_tpu.circuits import Circuit
        pspec = QubitProcessorSpec(2, ['Gxpi2', 'Gypi2', 'Gh', 'Gcnot'],
                                   geometry='line')
        coeffs = {'Gxpi2': {('H', 'X'): 0.005, ('S', 'Y'): 0.002},
                  'Gcnot': {('H', 'ZZ'): 0.004, ('S', 'XI'): 0.003}}
        mdl = create_crosstalk_free_model(pspec, lindblad_error_coeffs=coeffs)
        prop = ErrorGeneratorPropagator.from_errorgen_dict(coeffs, 2)
        c = Circuit([('Gh', 0), ('Gcnot', 0, 1), ('Gxpi2', 0),
                     ('Gcnot', 0, 1)], (0, 1))
        p_dense = mdl.probabilities(c)
        for bits, outcome in [((0, 0), '00'), ((1, 1), '11')]:
            p_apx = approximate_circuit_outcome_probability(prop, c, bits,
                                                            pspec=pspec)
            assert abs(p_apx - p_dense[(outcome,)]) < 6e-5

    def test_scales_to_many_qubits(self):
        """Analytic corrections run in poly time at 16 qubits."""
        from pygsti_tpu.processors import QubitProcessorSpec
        from pygsti_tpu.circuits import Circuit
        from pygsti_tpu.baseobjs.label import Label
        n = 16
        pspec = QubitProcessorSpec(n, ['Gh', 'Gcnot'], geometry='line')
        layers = [[Label('Gh', 0)]] + \
            [[Label('Gcnot', (i, i + 1))] for i in range(n - 1)]
        c = Circuit(layers, tuple(range(n)))  # GHZ prep
        coeffs = {'Gcnot': {('S', 'XI'): 0.001, ('H', 'ZZ'): 0.002}}
        prop = ErrorGeneratorPropagator.from_errorgen_dict(coeffs, n)
        p00 = approximate_circuit_outcome_probability(
            prop, c, [0] * n, pspec=pspec)
        p11 = approximate_circuit_outcome_probability(
            prop, c, [1] * n, pspec=pspec)
        assert 0.4 < p00 < 0.6 and 0.4 < p11 < 0.6
        assert abs((p00 + p11) - 1.0) < 0.1  # leading outcomes still dominate


class TestErrorgenAlgebra:
    def test_projection_round_trip(self):
        from pygsti_tpu.tools.errgenproptools import (
            project_errorgen, errorgen_label_to_dense,
            elementary_errorgen_basis_labels)
        for lbl in elementary_errorgen_basis_labels(1):
            proj = project_errorgen(errorgen_label_to_dense(lbl, 1), 1)
            assert abs(proj.get(lbl, 0) - 1.0) < 1e-9
            assert all(abs(v) < 1e-9 for k, v in proj.items() if k != lbl)

    def test_bch_order2_beats_order1(self):
        import scipy.linalg as spl
        from pygsti_tpu.tools.errgenproptools import (
            bch_approximation, errorgen_label_to_dense)
        X = PauliLabel(1, 0, 1)
        Z = PauliLabel(0, 1, 1)
        lay1 = {ElementaryErrorgenLabel('H', X): 0.05}
        lay2 = {ElementaryErrorgenLabel('H', Z): 0.03,
                ElementaryErrorgenLabel('S', X): 0.01}
        L1 = sum(c * errorgen_label_to_dense(k, 1) for k, c in lay1.items())
        L2 = sum(c * errorgen_label_to_dense(k, 1) for k, c in lay2.items())
        exact = spl.logm(spl.expm(L1) @ spl.expm(L2))

        def dense_of(d):
            return sum(c * errorgen_label_to_dense(k, 1) for k, c in d.items())
        e1 = np.abs(dense_of(bch_approximation(lay1, lay2, 1, bch_order=1))
                    - exact).max()
        e2 = np.abs(dense_of(bch_approximation(lay1, lay2, 1, bch_order=2))
                    - exact).max()
        assert e2 < e1 / 10

    def test_magnus_order2(self):
        import scipy.linalg as spl
        from pygsti_tpu.tools.errgenproptools import (
            magnus_expansion, errorgen_label_to_dense)
        X = PauliLabel(1, 0, 1)
        Z = PauliLabel(0, 1, 1)
        lays = [{ElementaryErrorgenLabel('S', X): 0.02},
                {ElementaryErrorgenLabel('H', Z): 0.03},
                {ElementaryErrorgenLabel('H', X): 0.05}]

        def dense_of(d):
            return sum(c * errorgen_label_to_dense(k, 1) for k, c in d.items())
        exact = spl.logm(spl.expm(dense_of(lays[2]))
                         @ spl.expm(dense_of(lays[1]))
                         @ spl.expm(dense_of(lays[0])))
        e1 = np.abs(dense_of(magnus_expansion(lays, 1, magnus_order=1))
                    - exact).max()
        e2 = np.abs(dense_of(magnus_expansion(lays, 1, magnus_order=2))
                    - exact).max()
        assert e2 < e1 / 5

    def test_commutator_exactness(self):
        from pygsti_tpu.tools.errgenproptools import (
            error_generator_commutator_numerical, errorgen_label_to_dense)
        X = PauliLabel(1, 0, 1)
        Z = PauliLabel(0, 1, 1)
        l1 = ElementaryErrorgenLabel('H', X)
        l2 = ElementaryErrorgenLabel('S', Z)
        comm = error_generator_commutator_numerical(l1, l2, 1)
        L1 = errorgen_label_to_dense(l1, 1)
        L2 = errorgen_label_to_dense(l2, 1)
        recon = sum(c * errorgen_label_to_dense(k, 1) for k, c in comm.items())
        assert np.abs((L1 @ L2 - L2 @ L1) - recon).max() < 1e-10


class TestHigherOrderBCH:
    """BCH orders 3-5 and Magnus order 3 converge monotonically to the
    exact matrix logarithm (reference: errgenproptools.py:100 orders 1-5,
    :468 magnus orders 1-3)."""

    def _setup(self):
        import scipy.linalg as spl
        from pygsti_tpu.tools.errgenproptools import (
            errorgen_label_to_dense, elementary_errorgen_basis_labels)
        labels = elementary_errorgen_basis_labels(1, types=('H', 'S'))
        rng = np.random.RandomState(0)

        def rand_layer(scale):
            return {lbl: rng.randn() * scale for lbl in labels
                    if rng.rand() < 0.6}

        def dense(layer):
            M = np.zeros((4, 4), complex)
            for lbl, c in layer.items():
                M += c * errorgen_label_to_dense(lbl, 1)
            return M
        return rand_layer, dense, spl

    def test_bch_orders_converge(self):
        from pygsti_tpu.tools.errgenproptools import bch_approximation
        rand_layer, dense, spl = self._setup()
        X, Y = rand_layer(0.08), rand_layer(0.08)
        exact = spl.logm(spl.expm(dense(X)) @ spl.expm(dense(Y)))
        prev = None
        for order in (1, 2, 3, 4, 5):
            err = np.linalg.norm(
                dense(bch_approximation(X, Y, 1, bch_order=order)) - exact)
            if prev is not None:
                assert err < prev * 0.8, (order, err, prev)
            prev = err
        assert prev < 1e-4

    def test_magnus_order3_converges(self):
        from pygsti_tpu.tools.errgenproptools import magnus_expansion
        rand_layer, dense, spl = self._setup()
        layers = [rand_layer(0.05) for _ in range(4)]
        P = np.eye(4)
        for L in layers:
            P = spl.expm(dense(L)) @ P
        exact = spl.logm(P)
        prev = None
        for order in (1, 2, 3):
            err = np.linalg.norm(
                dense(magnus_expansion(layers, 1, magnus_order=order)) - exact)
            if prev is not None:
                assert err < prev * 0.8
            prev = err
        assert prev < 1e-3


class TestZassenhausAndComposition:
    def test_zassenhaus_order2(self):
        """exp(X+Y) ~= exp(X)exp(Y)exp(W2): order 2 beats order 1."""
        import scipy.linalg as spl
        from pygsti_tpu.tools.errgenproptools import (
            zassenhaus_formula, errorgen_label_to_dense)
        X = PauliLabel(1, 0, 1)
        Z = PauliLabel(0, 1, 1)
        g1 = {ElementaryErrorgenLabel('H', X): 0.05}
        g2 = {ElementaryErrorgenLabel('H', Z): 0.04,
              ElementaryErrorgenLabel('S', X): 0.02}

        def dense_of(d):
            return sum(c * errorgen_label_to_dense(k, 1) for k, c in d.items()) \
                if d else np.zeros((4, 4))

        exact = spl.expm(dense_of(g1) + dense_of(g2))

        def product_of(groups):
            M = np.eye(4)
            for g in groups:
                M = M @ spl.expm(dense_of(g))
            return M

        e1 = np.abs(product_of(zassenhaus_formula([g1, g2],
                                                  zassenhaus_order=1)) - exact).max()
        z2 = zassenhaus_formula([g1, g2], zassenhaus_order=2)
        assert len(z2) == 3
        e2 = np.abs(product_of(z2) - exact).max()
        assert e2 < e1 / 5

    def test_iterative_composition_matches_dense(self):
        from pygsti_tpu.tools.errgenproptools import (
            iterative_error_generator_composition, errorgen_label_to_dense,
            project_errorgen)
        X = PauliLabel(1, 0, 1)
        Z = PauliLabel(0, 1, 1)
        labels = [ElementaryErrorgenLabel('H', X),
                  ElementaryErrorgenLabel('S', Z),
                  ElementaryErrorgenLabel('H', Z)]
        rates = [0.5, 2.0, -1.5]
        out = iterative_error_generator_composition(labels, rates)
        dense = np.eye(4)
        for l, r in zip(labels, rates):
            dense = dense @ (r * errorgen_label_to_dense(l, 1))
        expected = project_errorgen(dense, 1)
        got = {l: r for l, r in out}
        for k in set(expected) | set(got):
            assert abs(expected.get(k, 0) - got.get(k, 0)) < 1e-9

    def test_second_order_probability_correction(self):
        """order-2 Taylor beats order-1 for moderate error rates."""
        import scipy.linalg as spl
        from pygsti_tpu.tools.errgenproptools import (
            approximate_stabilizer_probability, errorgen_label_to_dense)
        rng = np.random.RandomState(5)
        n = 2
        s_c, p_c = sym.random_clifford(n, rng)
        S, P = sym.apply_clifford_to_stabilizer_state(
            s_c, p_c, *sym.prep_stabilizer_state(n))
        amps = StabilizerAmplitudes(S, P)
        psi = np.array([amps.amplitude([b0, b1])
                        for b0 in (0, 1) for b1 in (0, 1)])
        rho = np.outer(psi, psi.conj())
        X1 = _pstr_to_label('XI', n)
        Z2 = _pstr_to_label('IZ', n)
        errs = {ElementaryErrorgenLabel('S', X1): 0.05,
                ElementaryErrorgenLabel('H', Z2): 0.08}
        L = sum(r * errorgen_label_to_dense(l, n) for l, r in errs.items())
        rho_out = (spl.expm(L) @ rho.reshape(-1)).reshape(4, 4)
        for b_idx, bits in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            p_exact = np.real(rho_out[b_idx, b_idx])
            p1 = approximate_stabilizer_probability(errs, S, P, bits, order=1)
            p2 = approximate_stabilizer_probability(errs, S, P, bits, order=2)
            p3 = approximate_stabilizer_probability(errs, S, P, bits, order=3)
            assert abs(p2 - p_exact) <= abs(p1 - p_exact) + 1e-12
            assert abs(p3 - p_exact) < 1e-4


class TestErrgenPolytools:
    def test_probability_polynomial_matches_exact(self):
        import numpy as np
        import scipy.linalg as spl
        from pygsti_tpu.tools.errgenpolytools import (
            stabilizer_probability_polynomial)
        from pygsti_tpu.tools.errgenproptools import errorgen_label_to_dense
        rng = np.random.RandomState(3)
        n = 2
        s_c, p_c = sym.random_clifford(n, rng)
        S, P = sym.apply_clifford_to_stabilizer_state(
            s_c, p_c, *sym.prep_stabilizer_state(n))
        labels = [ElementaryErrorgenLabel('S', _pstr_to_label('XI', n)),
                  ElementaryErrorgenLabel('H', _pstr_to_label('IZ', n)),
                  ElementaryErrorgenLabel('H', _pstr_to_label('XX', n))]
        poly = stabilizer_probability_polynomial(labels, S, P, (0, 1),
                                                 order=2)
        # exact via dense expm at a few rate settings
        from pygsti_tpu.tools.errgenproptools import StabilizerAmplitudes
        amps = StabilizerAmplitudes(S, P)
        psi = np.array([amps.amplitude([b0, b1])
                        for b0 in (0, 1) for b1 in (0, 1)])
        rho = np.outer(psi, psi.conj())
        for rates in ([0.01, 0.02, -0.015], [0.03, 0.0, 0.01]):
            L = sum(r * errorgen_label_to_dense(l, n)
                    for r, l in zip(rates, labels))
            p_exact = np.real((spl.expm(L) @ rho.reshape(-1)).reshape(4, 4)[1, 1])
            p_poly = poly.evaluate(rates)
            assert abs(p_poly - p_exact) < 5e-5, (p_poly, p_exact)


def _errlabel(typ, *pstrs):
    n = len(pstrs[0])
    return ElementaryErrorgenLabel(typ, *[_pstr_to_label(s, n) for s in pstrs])


class TestAnalyticBitmaskAlgebra:
    """The analytic Pauli-bitmask engine (tools/errgenalgebra.py) vs the
    dense 16^n numerical oracle (reference: errgenproptools.py:801
    error_generator_commutator, :1340-6415 composition tables)."""

    def _random_label_pairs(self, n, count, seed):
        from pygsti_tpu.tools.errgenproptools import \
            elementary_errorgen_basis_labels
        rng = np.random.default_rng(seed)
        labels = elementary_errorgen_basis_labels(n)
        idx = rng.choice(len(labels), size=(count, 2))
        return [(labels[i], labels[j]) for i, j in idx]

    @pytest.mark.parametrize('n', [1, 2])
    def test_commutator_matches_numerical(self, n):
        from pygsti_tpu.tools import errgenalgebra as ega
        from pygsti_tpu.tools.errgenproptools import \
            error_generator_commutator_numerical
        for l1, l2 in self._random_label_pairs(n, 25, seed=n):
            num = error_generator_commutator_numerical(l1, l2, n)
            ana = ega.error_generator_commutator(l1, l2, n)
            for k in set(num) | set(ana):
                assert abs(num.get(k, 0) - ana.get(k, 0)) < 1e-9, \
                    (str(l1), str(l2), str(k), num.get(k, 0), ana.get(k, 0))

    @pytest.mark.parametrize('n', [1, 2])
    def test_composition_matches_numerical(self, n):
        from pygsti_tpu.tools import errgenalgebra as ega
        from pygsti_tpu.tools.errgenproptools import \
            error_generator_composition_numerical
        for l1, l2 in self._random_label_pairs(n, 25, seed=10 + n):
            num = error_generator_composition_numerical(l1, l2, n)
            ana = ega.error_generator_composition(l1, l2, n)
            for k in set(num) | set(ana):
                assert abs(num.get(k, 0) - ana.get(k, 0)) < 1e-9, \
                    (str(l1), str(l2), str(k), num.get(k, 0), ana.get(k, 0))

    def test_iterative_composition_matches_numerical(self):
        from pygsti_tpu.tools.errgenproptools import (
            iterative_error_generator_composition,
            iterative_error_generator_composition_numerical)
        n = 2
        labels = [_errlabel('H', 'XI'), _errlabel('S', 'ZY'),
                  _errlabel('A', 'XY', 'ZI')]
        rates = [0.3, -0.7, 0.5]
        ana = dict(iterative_error_generator_composition(labels, rates, n))
        num = dict(iterative_error_generator_composition_numerical(
            labels, rates, n))
        for k in set(ana) | set(num):
            assert abs(num.get(k, 0) - ana.get(k, 0)) < 1e-9

    def test_correction_analytic_matches_dense_3q(self):
        """Order-2 analytic stabilizer-probability corrections == the dense
        16^n path at 3 qubits."""
        from pygsti_tpu.tools.errgenproptools import (
            stabilizer_probability_correction,
            stabilizer_probability_correction_numerical)
        n = 3
        rng = np.random.default_rng(7)
        errgen = {
            _errlabel('H', 'XII'): 0.02, _errlabel('S', 'ZZI'): 0.01,
            _errlabel('C', 'XYI', 'IIZ'): 0.005,
            _errlabel('A', 'IXZ', 'ZII'): 0.008,
        }
        # random stabilizer state via a few random Clifford layers
        s, p = sym.prep_stabilizer_state(n)
        from pygsti_tpu.circuits.circuit import Circuit
        c = Circuit([('Gh', 0), ('Gcnot', 0, 1), ('Gcnot', 1, 2),
                     ('Gp', 2)], line_labels=(0, 1, 2))
        sc, pc = sym.symplectic_rep_of_clifford_circuit(c)
        s, p = sym.apply_clifford_to_stabilizer_state(sc, pc, s, p)
        for bits in ([0, 0, 0], [1, 0, 1], [0, 1, 1]):
            ana = stabilizer_probability_correction(errgen, s, p, bits, order=2)
            num = stabilizer_probability_correction_numerical(
                errgen, s, p, bits, order=2)
            assert abs(ana - num) < 1e-10, (bits, ana, num)

    def test_bch_order2_at_10_qubits(self):
        """The analytic engine's raison d'etre: BCH order-2 propagation on a
        10-qubit noisy Clifford circuit (dense would be 16^10).  Checks the
        corrected probability against the repo's stabilizer sim on the ideal
        circuit (weak noise => small correction in the right direction)."""
        from pygsti_tpu.tools.errgenproptools import bch_approximation
        n = 10
        rng = np.random.default_rng(3)
        # two "layers" of weight-2 H/S errors spread over the 10 qubits
        def rand_layer(seed):
            r = np.random.default_rng(seed)
            out = {}
            for _ in range(12):
                q1, q2 = r.choice(n, size=2, replace=False)
                x = int(1 << q1)
                z = int(1 << q2)
                typ = ['H', 'S'][int(r.integers(2))]
                out[ElementaryErrorgenLabel(
                    typ, PauliLabel(x, z, n))] = float(r.normal() * 0.01)
            return out
        L1, L2 = rand_layer(1), rand_layer(2)
        combined = bch_approximation(L1, L2, n, bch_order=2)
        assert combined  # nonempty
        # order-2 adds the half-commutator: verify a couple of coefficients
        # against the direct analytic layer commutator
        from pygsti_tpu.tools import errgenalgebra as ega
        comm = ega.layer_commutator_analytic(L1, L2, n, weight=0.5)
        first_order = {}
        for d in (L1, L2):
            for k, v in d.items():
                first_order[k] = first_order.get(k, 0.0) + v
        for k in comm:
            expect = first_order.get(k, 0.0) + comm[k]
            assert abs(combined.get(k, 0.0) - expect) < 1e-12
