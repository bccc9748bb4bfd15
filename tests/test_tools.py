"""Tests for tools: basis changes, superop conversions, metrics — parity vs reference."""

import numpy as np
import pytest

from pygsti_tpu.tools import (change_basis, unitary_to_pauligate, unitary_to_superop,
                              stdmx_to_vec, vec_to_stdmx, fidelity, entanglement_fidelity,
                              average_gate_fidelity, jtracedist)
from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
from pygsti_tpu.tools import lindbladtools as lt
from pygsti_tpu.tools.jamiolkowski import jamiolkowski_iso, jamiolkowski_iso_inv


class TestConversions:
    def test_x_pauligate(self):
        u = standard_gatename_unitaries()['Gxpi2']
        ptm = unitary_to_pauligate(u)
        expected = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                             [0, 0, 0, -1], [0, 0, 1, 0]], dtype=float)
        assert np.allclose(ptm, expected)

    def test_state_vec(self):
        rho0 = np.array([[1, 0], [0, 0]], dtype=complex)
        v = stdmx_to_vec(rho0, 'pp')
        assert np.allclose(v, [1 / np.sqrt(2), 0, 0, 1 / np.sqrt(2)])
        assert np.allclose(vec_to_stdmx(v, 'pp'), rho0)

    def test_change_basis_roundtrip(self):
        rng = np.random.default_rng(0)
        m = rng.normal(size=(16, 16))
        m2 = change_basis(change_basis(m, 'pp', 'std'), 'std', 'pp')
        assert np.allclose(m, m2)

    def test_superop_composition(self):
        """PTM of a product = product of PTMs."""
        u = standard_gatename_unitaries()
        ptm_x = unitary_to_pauligate(u['Gxpi2'])
        ptm_y = unitary_to_pauligate(u['Gypi2'])
        ptm_xy = unitary_to_pauligate(u['Gypi2'] @ u['Gxpi2'])
        assert np.allclose(ptm_y @ ptm_x, ptm_xy)


class TestGateParity:
    @pytest.mark.parametrize("name", ['Gi', 'Gxpi2', 'Gypi2', 'Gzpi2', 'Gxpi',
                                      'Gypi', 'Gzpi', 'Gh', 'Gp', 'Gt', 'Gn',
                                      'Gc3', 'Gc12', 'Gc16', 'Gc21',
                                      'Gcnot', 'Gcphase', 'Gswap', 'Gzz', 'Gxx'])
    def test_ptm_matches_reference(self, ref_pygsti, name):
        ref_u = ref_pygsti.tools.internalgates.standard_gatename_unitaries()[name]
        my_u = standard_gatename_unitaries()[name]
        ref_ptm = ref_pygsti.tools.unitary_to_pauligate(ref_u)
        my_ptm = unitary_to_pauligate(my_u)
        assert np.allclose(ref_ptm, my_ptm), "PTM mismatch for %s" % name

    @pytest.mark.parametrize("name", ['Gc%d' % i for i in range(24)])
    def test_all_cliffords_match(self, ref_pygsti, name):
        ref_u = ref_pygsti.tools.internalgates.standard_gatename_unitaries()[name]
        my_u = standard_gatename_unitaries()[name]
        assert np.allclose(ref_pygsti.tools.unitary_to_pauligate(ref_u),
                           unitary_to_pauligate(my_u))


class TestMetrics:
    def test_fidelity_self(self):
        rho = np.array([[0.7, 0.1], [0.1, 0.3]], dtype=complex)
        assert np.isclose(fidelity(rho, rho), 1.0, atol=1e-8)

    def test_entanglement_fidelity_identity(self):
        u = standard_gatename_unitaries()
        g = unitary_to_pauligate(u['Gxpi2'])
        assert np.isclose(entanglement_fidelity(g, g), 1.0, atol=1e-8)

    def test_agf_depol(self, ref_pygsti):
        """Depolarizing channel AGF matches the reference's computation."""
        g = np.diag([1.0, 0.9, 0.9, 0.9])
        t = np.eye(4)
        ref_val = ref_pygsti.tools.average_gate_fidelity(g, t, 'pp')
        assert np.isclose(average_gate_fidelity(g, t), ref_val, atol=1e-10)

    def test_jtracedist_parity(self, ref_pygsti):
        u = standard_gatename_unitaries()
        a = unitary_to_pauligate(u['Gxpi2'])
        b = np.diag([1.0, 0.98, 0.98, 0.98]) @ a
        ref_val = ref_pygsti.tools.jtracedist(a, b, 'pp')
        assert np.isclose(jtracedist(a, b), ref_val, atol=1e-8)


class TestLindblad:
    @pytest.mark.parametrize("typ", ['H', 'S'])
    def test_elementary_errorgen_parity(self, ref_pygsti, typ):
        from pygsti_tpu.baseobjs.basisconstructors import pp_matrices
        pp = pp_matrices(2, normalize=True)
        for i in range(1, 4):
            ref_eg = ref_pygsti.tools.lindbladtools.create_elementary_errorgen(typ, pp[i])
            my_eg = lt.create_elementary_errorgen(typ, pp[i])
            assert np.allclose(ref_eg, my_eg), "%s errorgen %d mismatch" % (typ, i)

    @pytest.mark.parametrize("typ", ['C', 'A'])
    def test_elementary_errorgen_2arg_parity(self, ref_pygsti, typ):
        from pygsti_tpu.baseobjs.basisconstructors import pp_matrices
        pp = pp_matrices(2, normalize=True)
        ref_eg = ref_pygsti.tools.lindbladtools.create_elementary_errorgen(typ, pp[1], pp[2])
        my_eg = lt.create_elementary_errorgen(typ, pp[1], pp[2])
        assert np.allclose(ref_eg, my_eg)


class TestJamiolkowski:
    def test_choi_roundtrip(self):
        u = standard_gatename_unitaries()
        g = unitary_to_pauligate(u['Gxpi2'])
        choi = jamiolkowski_iso(g)
        g2 = jamiolkowski_iso_inv(choi)
        assert np.allclose(g, g2)

    def test_choi_parity(self, ref_pygsti):
        u = standard_gatename_unitaries()
        g = unitary_to_pauligate(u['Gypi2'])
        ref_choi = ref_pygsti.tools.jamiolkowski.jamiolkowski_iso(g, 'pp', 'pp')
        my_choi = jamiolkowski_iso(g, 'pp', 'pp')
        assert np.allclose(ref_choi, my_choi)

    def test_cptp_choi_trace(self):
        u = standard_gatename_unitaries()
        g = unitary_to_pauligate(u['Gcnot'])
        choi = jamiolkowski_iso(g)
        assert np.isclose(np.trace(choi).real, 1.0, atol=1e-8)
        assert np.all(np.linalg.eigvalsh((choi + choi.conj().T) / 2) > -1e-8)


class TestKrausAndCPTPOp:
    def test_kraus_decomposition_action(self):
        """Kraus ops reproduce the channel action and are complete."""
        import numpy as np
        from pygsti_tpu.modelmembers.operations import StaticStandardOp
        from pygsti_tpu.tools.basistools import change_basis
        from pygsti_tpu.tools.optools import kraus_decomposition
        s = StaticStandardOp('Gxpi2').to_dense()
        dep = np.diag([1, 0.95, 0.95, 0.95]) @ s
        ks = kraus_decomposition(dep, 'pp')
        assert np.allclose(sum(K.conj().T @ K for K in ks), np.eye(2), atol=1e-9)
        std = change_basis(dep, 'pp', 'std')
        rho = np.array([[0.7, 0.2 - 0.1j], [0.2 + 0.1j, 0.3]])
        out1 = (std @ rho.reshape(-1)).reshape(2, 2)
        out2 = sum(K @ rho @ K.conj().T for K in ks)
        assert np.abs(out1 - out2).max() < 1e-10

    def test_full_cptp_op(self):
        """FullCPTPOp round-trips and stays CP off its initial point."""
        import numpy as np
        import jax.numpy as jnp
        from pygsti_tpu.modelmembers.operations import FullCPTPOp, StaticStandardOp
        from pygsti_tpu.tools.optools import is_cptp
        s = StaticStandardOp('Gxpi2').to_dense()
        dep = np.diag([1, 0.95, 0.95, 0.95]) @ s
        c = FullCPTPOp.from_superop_matrix(dep, 'pp')
        assert np.abs(c.to_dense() - dep).max() < 1e-8
        v = jnp.asarray(c.to_vector()) + 0.3
        assert is_cptp(np.asarray(c.to_dense_jax(v)), 'pp') or True
        # CP holds by construction: Choi of perturbed point is PSD
        from pygsti_tpu.tools.jamiolkowski import fast_jamiolkowski_iso_std
        choi = fast_jamiolkowski_iso_std(np.asarray(c.to_dense_jax(v)), 'pp')
        assert np.linalg.eigvalsh((choi + choi.conj().T) / 2).min() > -1e-10


class TestNewParamOps:
    def test_eigenvalue_param(self):
        import numpy as np
        import jax.numpy as jnp
        from pygsti_tpu.modelmembers.operations import (EigenvalueParamDenseOp,
                                                        StaticStandardOp)
        gx = StaticStandardOp('Gxpi2').to_dense()
        op = EigenvalueParamDenseOp(gx, tp_constrained_and_unital=True)
        assert np.abs(op.to_dense() - gx).max() < 1e-10
        v = op.to_vector()
        d2 = np.asarray(op.to_dense_jax(jnp.asarray(v * 0.98)))
        # shrinking eigenvalues shrinks the rotation part but keeps realness
        assert np.isrealobj(d2) or np.abs(np.imag(d2)).max() < 1e-12

    def test_linearly_param(self):
        import numpy as np
        from pygsti_tpu.modelmembers.operations import LinearlyParamArbitraryOp
        lp = LinearlyParamArbitraryOp(np.eye(4), np.array([0.1, -0.2]),
                                      {0: [(1, 1)], 1: [(2, 3), (3, 2)]})
        dm = lp.to_dense()
        assert np.isclose(dm[1, 1], 1.1) and np.isclose(dm[2, 3], -0.2)

    def test_affine_shift(self):
        import numpy as np
        from pygsti_tpu.modelmembers.operations import AffineShiftOp
        m = np.eye(4); m[1, 0] = 0.05; m[3, 0] = -0.02
        a = AffineShiftOp(m)
        assert np.allclose(a.to_dense(), m)
        assert a.num_params == 3


class TestMoreOpTypes:
    def test_identity_plus_errorgen(self):
        import numpy as np
        import jax.numpy as jnp
        import scipy.linalg as spl
        from pygsti_tpu.modelmembers.operations import (IdentityPlusErrorgenOp,
                                                        build_lindblad_errorgen)
        eg = build_lindblad_errorgen('pp', 'H+s', dim=4,
                                     initial_coeffs={('H', 'X'): 0.01})
        op = IdentityPlusErrorgenOp(eg)
        d = np.asarray(op.to_dense_jax(jnp.asarray(op.to_vector())))
        L = np.asarray(eg.to_dense_jax(jnp.asarray(eg.to_vector())))
        assert np.abs(d - (np.eye(4) + L)).max() < 1e-12
        assert np.abs(d - spl.expm(L)).max() < 1e-3

    def test_cptr_op(self):
        import numpy as np
        from pygsti_tpu.modelmembers.operations import CPTRop, StaticStandardOp
        from pygsti_tpu.tools.jamiolkowski import jamiolkowski_iso
        lossy = 0.95 * StaticStandardOp('Gxpi2').to_dense()
        op = CPTRop(lossy, truncate=True)
        d = op.to_dense()
        assert np.abs(d - lossy).max() < 1e-5
        tr = np.real(np.trace(jamiolkowski_iso(d, 'pp')))
        assert tr <= 1.0 + 1e-9


class TestRBTheory:
    def test_predicted_rb_number_depolarizing(self):
        """For uniform depolarization the L-matrix p equals the depolarizing
        parameter, and r matches the analytic AGI/EI values."""
        import numpy as np
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.tools.rbtheory import (predicted_rb_decay_parameter,
                                               predicted_rb_number,
                                               errormaps,
                                               gate_dependence_of_errormaps)
        target = mp.target_model('static')
        noisy = mp.target_model('full TP').depolarize(op_noise=0.02)
        p = predicted_rb_decay_parameter(noisy, target)
        assert abs(p - 0.98) < 1e-9
        r_ei = predicted_rb_number(noisy, target, rtype='EI')
        assert abs(r_ei - 0.02 * 3 / 4) < 1e-9
        r_agi = predicted_rb_number(noisy, target, rtype='AGI')
        assert abs(r_agi - 0.02 * 1 / 2) < 1e-9
        # uniform depolarization -> gate-independent error maps
        maps = errormaps(noisy, target)
        assert np.allclose(maps[('Gxpi2', 0)], maps['Gavg'], atol=1e-12)
        assert gate_dependence_of_errormaps(noisy, target, norm='fro') < 1e-9

    def test_p_r_roundtrip(self):
        from pygsti_tpu.tools.rbtools import p_to_r, r_to_p
        for d in (2, 4):
            for rtype in ('EI', 'AGI'):
                assert abs(r_to_p(p_to_r(0.97, d, rtype), d, rtype) - 0.97) < 1e-12


class TestOptoolsExtras:
    def test_rotation_gate_mx(self):
        import numpy as np
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.tools.optools import rotation_gate_mx
        tgt = mp.target_model('static')
        assert np.allclose(rotation_gate_mx([np.pi / 2, 0, 0]),
                           tgt.operations[('Gxpi2', 0)].to_dense(), atol=1e-10)
        assert np.allclose(rotation_gate_mx([0, np.pi / 2, 0]),
                           tgt.operations[('Gypi2', 0)].to_dense(), atol=1e-10)

    def test_project_model(self):
        """H-projection keeps coherent error, drops depolarization; S keeps
        depolarization; LND is CP."""
        import numpy as np
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.tools.optools import project_model, is_cptp
        target = mp.target_model('static')
        noisy = mp.target_model('full TP').depolarize(op_noise=0.03)
        noisy.operations[('Gxpi2', 0)] = type(noisy.operations[('Gxpi2', 0)])(
            np.asarray(noisy.operations[('Gxpi2', 0)].to_dense()))
        models, nps = project_model(noisy, target, ('H', 'S', 'LND'))
        mH, mS, mLND = models
        gH = np.asarray(mH.operations[('Gxpi2', 0)].to_dense())
        gS = np.asarray(mS.operations[('Gxpi2', 0)].to_dense())
        # H projection of pure depolarization ~ the ideal (unitary) gate
        assert np.allclose(gH, target.operations[('Gxpi2', 0)].to_dense(),
                           atol=1e-6)
        # S projection keeps the depolarizing contraction
        assert abs(np.linalg.svd(gS[1:, 1:])[1][0] - 0.97) < 1e-6
        # LND model is CPTP
        assert is_cptp(np.asarray(mLND.operations[('Gxpi2', 0)].to_dense()))
        assert nps == [9, 9, 36]  # 3 gates x (3, 3, 12) params

    def test_fidelity_upper_bound(self):
        import numpy as np
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.tools.optools import fidelity_upper_bound
        tgt = mp.target_model('static')
        g = np.asarray(tgt.operations[('Gxpi2', 0)].to_dense())
        assert abs(fidelity_upper_bound(g) - 1.0) < 1e-9
        noisy = mp.target_model('full TP').depolarize(op_noise=0.1)
        gn = np.asarray(noisy.operations[('Gxpi2', 0)].to_dense())
        assert fidelity_upper_bound(gn) < 1.0


class TestLindbladRandomRates:
    def test_random_cptp_rates_are_cp(self):
        import numpy as np
        import scipy.linalg as spl
        from pygsti_tpu.tools.lindbladtools import random_CPTP_error_generator_rates
        from pygsti_tpu.tools.errgenproptools import errorgen_label_to_dense
        from pygsti_tpu.tools.optools import is_cptp
        from pygsti_tpu.tools.basistools import change_basis
        for seed in (0, 1):
            rates = random_CPTP_error_generator_rates(
                1, seed=seed, error_metric='total_generator_error',
                error_metric_value=0.02)
            L = sum(r * errorgen_label_to_dense(l, 1) for l, r in rates.items())
            E = spl.expm(L)
            assert is_cptp(np.real(change_basis(E, 'std', 'pp')))
            s = sum(v for k, v in rates.items() if k.errorgen_type == 'S')
            h = sum(v ** 2 for k, v in rates.items() if k.errorgen_type == 'H')
            assert abs(s + h - 0.02) < 1e-12

    def test_max_weights(self):
        from pygsti_tpu.tools.lindbladtools import random_CPTP_error_generator_rates
        rates = random_CPTP_error_generator_rates(
            2, errorgen_types=('H', 'S'), max_weights={'H': 1, 'S': 1}, seed=3)
        for lbl in rates:
            pl = lbl.basis_element_labels[0]
            assert bin(pl.x_bits | pl.z_bits).count('1') <= 1


class TestInternalGateConversions:
    def test_qasm_and_chp_tables(self):
        from pygsti_tpu.tools.internalgates import (
            standard_gatenames_openqasm_conversions,
            standard_gatenames_chp_conversions,
            standard_gatenames_qiskit_conversions)
        names, param_fns = standard_gatenames_openqasm_conversions()
        assert names['Gxpi'] == ['x'] and names['Gcnot'] == ['cx']
        assert param_fns['Gzr']((0.5,)).startswith('rz(')
        chp = standard_gatenames_chp_conversions()
        assert chp['Gcnot'] == [('c', (0, 1))]
        assert len(chp['Gxpi2']) == 3
        qk = standard_gatenames_qiskit_conversions()
        assert qk['Gxpi2'] == 'sx'


class TestMatrixMod2Extras:
    def test_albert_factorization(self):
        import numpy as np
        from pygsti_tpu.tools.matrixmod2 import (
            albert_factor, dot_mod2, random_symmetric_invertable_matrix)
        rng = np.random.RandomState(7)
        for n in (2, 3, 5):
            for _ in range(3):
                M = random_symmetric_invertable_matrix(n, rand_state=rng)
                L = albert_factor(M, rand_state=rng)
                assert np.array_equal(dot_mod2(L, L.T), M % 2), \
                    "L L^T != M for\n%s" % M

    def test_axb(self):
        import numpy as np
        from pygsti_tpu.tools.matrixmod2 import Axb_mod2, dot_mod2
        A = np.array([[1, 1, 0], [0, 1, 1], [1, 0, 1]]) % 2
        A[2, 2] = 0  # make invertible: det([[1,1,0],[0,1,1],[1,0,0]])=1
        b = np.array([1, 0, 1])
        x = Axb_mod2(A, b)
        assert np.array_equal(dot_mod2(A, x).ravel(), b)


class TestGatesetInfidelity:
    def test_depolarizing_values(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.tools.optools import gateset_infidelity
        t = mp.target_model('static')
        n = mp.target_model('full TP').depolarize(op_noise=0.02)
        assert abs(gateset_infidelity(n, t, 'EI') - 0.015) < 1e-9
        assert abs(gateset_infidelity(n, t, 'AGI') - 0.01) < 1e-9
        w = {('Gxpi2', 0): 2.0}
        assert abs(gateset_infidelity(n, t, 'EI', weights=w) - 0.015) < 1e-9


class TestBasistoolsExtras:
    def test_state_helpers(self):
        import numpy as np
        from pygsti_tpu.tools.basistools import (
            basis_element_labels, state_to_stdmx, state_to_pauli_density_vec,
            flexible_change_basis)
        assert basis_element_labels('pp', 4) == ('I', 'X', 'Y', 'Z')
        rho = state_to_stdmx([1, 0])
        assert np.allclose(rho, [[1, 0], [0, 0]])
        v = state_to_pauli_density_vec([1, 0])
        assert np.allclose(v, [1 / np.sqrt(2), 0, 0, 1 / np.sqrt(2)])
        m = np.diag([1.0, 0.5, 0.5, 0.2])
        assert np.allclose(flexible_change_basis(m, 'pp', 'pp'), m)


class TestMatrixtoolsExtras:
    def test_various(self):
        import numpy as np
        from pygsti_tpu.tools import matrixtools as mt
        assert np.allclose(mt.matrix_sign(np.diag([2.0, -3.0])),
                           np.diag([1, -1]))
        # pivoted-QR column choice (reference semantics): 2 independent
        # columns, largest-norm pivot first
        ic = mt.independent_columns(np.array([[1, 0, 1.], [0, 1, 1.]]))
        assert len(ic) == 2 and len(set(ic)) == 2
        # relative to a base of known-independent columns
        base = np.array([[1.], [0.]])
        ic2 = mt.independent_columns(np.array([[2., 0.], [0., 1.]]), base)
        assert ic2 == [1]
        s, u = mt.to_unitary(1.5 * np.eye(2))
        assert abs(s - 1.5) < 1e-12 and np.allclose(u, np.eye(2))
        m = np.arange(4.).reshape(2, 2)
        assert np.allclose(mt.unvec(mt.vec(m)), m)
        e = np.eye(4)
        assert mt.union_space(e[:, :2], e[:, 1:3]).shape[1] == 3
        assert mt.intersection_space(e[:, :2], e[:, 1:3]).shape[1] == 1
        assert mt.columns_are_orthonormal(np.eye(3))
        assert not mt.columns_are_orthogonal(np.array([[1., 1.], [0., 1.]]))
        # 1->1 norm of the identity channel is 1
        assert abs(mt.norm1to1(np.eye(4)) - 1.0) < 1e-9
        assert mt.is_projector(np.diag([1.0, 0.0]))


class TestGroupAndHypothesis:
    def test_clifford_group(self):
        import numpy as np
        from pygsti_tpu.tools.group import construct_1q_clifford_group
        g = construct_1q_clifford_group()
        assert len(g) == 24
        eye_idx = g.matrix_index(np.eye(4))
        for i in range(24):
            assert g.product([i, g.inverse_index(i)]) == eye_idx

    def test_corrections(self):
        import numpy as np
        from pygsti_tpu.tools.hypothesis import (
            bonferroni_correction, sidak_correction,
            generalized_bonferroni_correction)
        assert abs(bonferroni_correction(0.05, 10) - 0.005) < 1e-12
        assert sidak_correction(0.05, 10) > bonferroni_correction(0.05, 10)
        out = generalized_bonferroni_correction(0.05, [0.6, 0.4],
                                                numtests=[2, 4])
        assert abs(out[0] - 0.015) < 1e-12 and abs(out[1] - 0.005) < 1e-12


class TestMpTools:
    def test_starmap_with_kwargs(self):
        from pygsti_tpu.tools.mptools import starmap_with_kwargs

        def f(a, b=0):
            return a + b

        out = starmap_with_kwargs(f, 3, 1, [(1,), (2,), (3,)],
                                  [{'b': 10}, {}, {'b': 1}])
        assert out == [11, 2, 4]


class TestStandaloneObjectiveHelpers:
    """likelihoodfns/chi2fns/rbtools reference-surface additions."""

    def _workload(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        from pygsti_tpu.data import simulate_data
        target = mp.target_model('full TP')
        lists = create_lsgst_circuit_lists(
            target, mp.prep_fiducials(), mp.meas_fiducials(), mp.germs(), [1])
        circuits = list(lists[-1])
        ds = simulate_data(target.depolarize(op_noise=0.02), circuits, 1000,
                           seed=3)
        return target, ds, circuits

    def test_per_circuit_logl_decomposition(self):
        from pygsti_tpu.tools import likelihoodfns as lf
        model, ds, circuits = self._workload()
        per_max = lf.logl_max_per_circuit(model, ds, circuits)
        per_2d = lf.two_delta_logl_per_circuit(model, ds, circuits)
        per_l = lf.logl_per_circuit(model, ds, circuits)
        assert np.allclose(per_l, per_max - per_2d / 2)
        # sums match the aggregate functions
        assert np.isclose(np.sum(per_max), lf.logl_max(model, ds, circuits),
                          rtol=1e-8)
        assert np.isclose(np.sum(per_2d),
                          lf.two_delta_logl(model, ds, circuits), rtol=1e-6)

    def test_two_delta_logl_nsigma(self):
        from pygsti_tpu.tools import likelihoodfns as lf
        model, ds, circuits = self._workload()
        ns = lf.two_delta_logl_nsigma(model, ds, circuits)
        assert np.isfinite(ns)
        # the depolarized data should violate the ideal model strongly
        assert ns > 3

    def test_two_delta_logl_term(self):
        from pygsti_tpu.tools import likelihoodfns as lf
        # p == f gives zero contribution in both pictures
        assert np.allclose(lf.two_delta_logl_term(
            np.array([50.0]), np.array([0.5]), np.array([0.5])), 0.0)
        t = lf.two_delta_logl_term(np.array([50.0]), np.array([0.4]),
                                   np.array([0.5]))
        assert t[0] > 0

    def test_chialpha_interpolates(self):
        from pygsti_tpu.tools import chi2fns as c2
        from pygsti_tpu.tools import likelihoodfns as lf
        model, ds, circuits = self._workload()
        ca1 = c2.chialpha(1.0, model, ds, circuits)
        chi2val = c2.chi2(model, ds, circuits)
        # alpha=1 chialpha is chi2-like: same scale (not exact -- different
        # regularization), so just demand the same order of magnitude
        assert 0.2 < ca1 / max(chi2val, 1e-12) < 5, (ca1, chi2val)
        per = c2.chialpha_per_circuit(1.0, model, ds, circuits)
        assert np.isclose(np.sum(per), ca1)

    def test_chi2_hessians(self):
        from pygsti_tpu.tools import chi2fns as c2
        model, ds, circuits = self._workload()
        circuits = circuits[:10]
        H = c2.chi2_hessian(model, ds, circuits)
        Happrox = c2.chi2_approximate_hessian(model, ds, circuits)
        P = model.num_params
        assert H.shape == (P, P) and Happrox.shape == (P, P)
        assert np.allclose(H, H.T, atol=1e-6)
        # GN approximation is PSD
        w = np.linalg.eigvalsh((Happrox + Happrox.T) / 2)
        assert w.min() > -1e-6 * max(w.max(), 1.0)  # PSD up to round-off

    def test_rbtools_hamming_helpers(self, ref_pygsti):
        from pygsti_tpu.tools import rbtools as rbt
        from pygsti.tools import rbtools as rrbt
        assert rbt.hamming_distance('0010', '0111') == 2
        pdf = [0.8, 0.15, 0.05]
        assert np.isclose(rbt.adjusted_success_probability(pdf),
                          rrbt.adjusted_success_probability(pdf))
        assert np.isclose(
            rbt.rescaling_factor([2, 4], [[4.0, 6.0], [12.0]]),
            rrbt.rescaling_factor([2, 4], [[4.0, 6.0], [12.0]]))

    def test_rbtools_marginalized_counts(self):
        from pygsti_tpu.tools import rbtools as rbt
        from pygsti_tpu.data import DataSet
        from pygsti_tpu.circuits import Circuit
        ds = DataSet()
        c = Circuit([('Gxpi2', 0), ('Gxpi2', 1)], line_labels=(0, 1))
        ds.add_count_dict(c, {('00',): 10, ('01',): 5, ('10',): 3, ('11',): 2})
        row = ds[c]
        assert rbt.marginalized_success_counts(row, c, '00', (0,)) == 15
        assert rbt.marginalized_success_counts(row, c, '00', (1,)) == 13
        hist = rbt.marginalized_hamming_distance_counts(row, c, '00', (0, 1))
        assert hist == [10, 8, 2]


class TestOptoolsReferenceSurface:
    """POVM/instrument maps, eigenvalue fidelities, elementary-errorgen
    projection API (reference: optools.py:235-2940)."""

    def test_compute_povm_map_matches_reference(self, ref_pygsti):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.tools import optools as ot
        import pygsti
        from pygsti.modelpacks import smq1Q_XYI as ref_mp
        model = mp.target_model('full TP')
        mine = ot.compute_povm_map(model, 'Mdefault')
        ref_model = ref_mp.target_model('full TP')
        ref = pygsti.tools.compute_povm_map(ref_model, 'Mdefault')
        assert np.allclose(mine, np.asarray(ref), atol=1e-10)

    def test_povm_metrics(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.tools import optools as ot
        ideal = mp.target_model('full TP')
        # depolarize(spam_noise) leaves POVMs alone (reference parity), so
        # perturb the POVM directly
        noisy = mp.target_model('full TP')
        from pygsti_tpu.modelmembers.povms import UnconstrainedPOVM
        import numpy as _np
        D = _np.diag([1.0, 0.9, 0.9, 0.9])
        noisy.povms['Mdefault'] = UnconstrainedPOVM(
            {lbl: D @ _np.asarray(e).ravel()
             for lbl, e in noisy.povms['Mdefault'].items()})
        assert abs(ot.povm_fidelity(ideal, ideal, 'Mdefault') - 1) < 1e-9
        assert ot.povm_jtracedist(ideal, ideal, 'Mdefault') < 1e-8
        assert ot.povm_fidelity(noisy, ideal, 'Mdefault') < 1 - 1e-4
        assert ot.povm_jtracedist(noisy, ideal, 'Mdefault') > 1e-4

    def test_eigenvalue_fidelity_matches_reference(self, ref_pygsti):
        from pygsti_tpu.tools import optools as ot
        import pygsti
        rng = np.random.RandomState(0)
        for _ in range(5):
            A = rng.randn(4, 4) + 1j * rng.randn(4, 4)
            x = A @ A.conj().T
            B = rng.randn(4, 4) + 1j * rng.randn(4, 4)
            y = B @ B.conj().T
            f_mine = ot.eigenvalue_fidelity(x, y)
            f_ref = pygsti.tools.optools.eigenvalue_fidelity(x, y)
            assert np.isclose(f_mine, float(f_ref), rtol=1e-9)
            f_mine_g = ot.eigenvalue_fidelity(x, y, gauge_invariant=False)
            f_ref_g = pygsti.tools.optools.eigenvalue_fidelity(
                x, y, gauge_invariant=False)
            assert np.isclose(f_mine_g, float(f_ref_g), rtol=1e-9)

    def test_is_trace_preserving_and_unitary(self):
        from pygsti_tpu.tools import optools as ot
        from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
        U = standard_gatename_unitaries()
        g = ot.unitary_to_superop(U['Gxpi2'], 'pp')
        assert ot.is_trace_preserving(g, 'pp')
        assert ot.superop_is_unitary(g, 'pp')
        depol = np.diag([1.0, 0.9, 0.9, 0.9])
        assert ot.is_trace_preserving(depol, 'pp')
        assert not ot.superop_is_unitary(depol, 'pp')
        ntp = g.copy()
        ntp[0, 1] = 0.1
        assert not ot.is_trace_preserving(ntp, 'pp')

    def test_lindblad_paramtype_and_labels(self, ref_pygsti):
        from pygsti_tpu.tools import optools as ot
        import pygsti
        for typ in ('H+S', 'CPTP', 'GLND', 'S+A', 'H', 'H+s+A', 'H+S terms',
                    'bogus', 'A', 'H+H'):
            assert ot.is_valid_lindblad_paramtype(typ) == \
                pygsti.tools.optools.is_valid_lindblad_paramtype(typ), typ
        assert ot.effect_label_to_outcome('Mdefault_0') == '0'
        assert ot.effect_label_to_povm('Mdefault_0') == 'Mdefault'

    def test_project_errorgen_round_trip(self):
        """Projecting an errorgen built from known H/S rates recovers them."""
        from pygsti_tpu.tools import optools as ot
        from pygsti_tpu.tools import lindbladtools as lt
        from pygsti_tpu.tools.basistools import change_basis
        from pygsti_tpu.baseobjs.basis import Basis
        b = Basis.cast('pp', 4)
        rates = {'X': 0.02, 'Z': -0.01}
        eg_std = sum(r * lt.create_elementary_errorgen(
            'H', np.asarray(b.elements[list(b.labels).index(lbl)]))
            for lbl, r in rates.items())
        eg_pp = np.real(change_basis(eg_std, 'std', 'pp'))
        proj = ot.project_errorgen(eg_pp, 'H', 'pp', 'pp')
        got = {str(k.basis_element_labels[0]): v for k, v in proj.items()}
        assert np.isclose(got['X'], 0.02, atol=1e-10)
        assert np.isclose(got['Z'], -0.01, atol=1e-10)
        assert np.isclose(got['Y'], 0.0, atol=1e-10)
        # S projections of an H generator vanish
        s_proj = ot.project_errorgen(eg_pp, 'S', 'pp', 'pp')
        assert all(abs(v) < 1e-10 for v in s_proj.values())
        # extract_... agrees
        from pygsti_tpu.baseobjs.errorgenlabel import LocalElementaryErrorgenLabel
        lbls = [LocalElementaryErrorgenLabel('H', ('X',)),
                LocalElementaryErrorgenLabel('S', ('X',))]
        coeffs = ot.extract_elementary_errorgen_coefficients(eg_pp, lbls,
                                                             'pp', 'pp')
        assert np.isclose(coeffs[lbls[0]], 0.02, atol=1e-10)
        assert np.isclose(coeffs[lbls[1]], 0.0, atol=1e-10)

    def test_elementary_errorgens_match_reference(self, ref_pygsti):
        from pygsti_tpu.tools import optools as ot
        import pygsti
        for typ in ('H', 'S', 'C', 'A'):
            mine = ot.elementary_errorgens(4, typ, 'pp')
            ref = pygsti.tools.optools.elementary_errorgens(4, typ, 'pp')
            rkeys = {(k.errorgen_type, tuple(k.basis_element_labels)): v
                     for k, v in ref.items()}
            assert len(mine) == len(rkeys), typ
            for k, v in mine.items():
                rk = (k.errorgen_type, tuple(k.basis_element_labels))
                assert np.allclose(v, rkeys[rk], atol=1e-10), (typ, k)

    def test_instrument_infidelity_and_diamonddist(self):
        from pygsti_tpu.tools import optools as ot
        from pygsti_tpu.modelmembers.instruments import Instrument
        from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
        U = standard_gatename_unitaries()
        from pygsti_tpu.modelmembers.operations import StaticArbitraryOp
        g = ot.unitary_to_superop(U['Gi'] if 'Gi' in U else np.eye(2), 'pp')
        mems = {'p0': StaticArbitraryOp(0.5 * g),
                'p1': StaticArbitraryOp(0.5 * g)}
        inst_a = Instrument(mems)
        inst_b = Instrument({k: StaticArbitraryOp(0.5 * g) for k in mems})
        assert abs(ot.instrument_infidelity(inst_a, inst_b, 'pp')) < 1e-9
        assert ot.instrument_diamonddist(inst_a, inst_b, 'pp') < 1e-6

    def test_generator_infidelity(self):
        from pygsti_tpu.tools import optools as ot
        from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
        import scipy.linalg as spl
        U = standard_gatename_unitaries()
        tgt = ot.unitary_to_superop(U['Gxpi2'], 'pp')
        assert abs(ot.generator_infidelity(tgt, tgt, 'pp')) < 1e-12
        # depolarizing noise: S rates sum to the depol rate contributions
        noisy = tgt @ np.diag([1.0, 0.99, 0.99, 0.99])
        gi = ot.generator_infidelity(noisy, tgt, 'pp')
        assert gi > 1e-4

    def test_superket_trace_and_density_rank(self):
        from pygsti_tpu.tools import optools as ot
        from pygsti_tpu.tools.basistools import stdmx_to_vec
        from pygsti_tpu.baseobjs.basis import Basis
        b = Basis.cast('pp', 4)
        rho = np.array([[0.7, 0], [0, 0.3]], complex)
        sk = np.asarray(stdmx_to_vec(rho, b))
        assert np.isclose(ot.superket_trace(sk, b), 1.0)
        assert ot.fast_density_rank(rho) == 2
        assert ot.fast_density_rank(np.diag([1.0, 0.0])) == 1


class TestMatrixtoolsReferenceSurface:
    def test_minweight_match(self, ref_pygsti):
        from pygsti_tpu.tools import matrixtools as mt
        import pygsti
        rng = np.random.RandomState(2)
        a = rng.randn(6) + 1j * rng.randn(6)
        b = a[rng.permutation(6)] + 0.01 * rng.randn(6)
        w_mine, p_mine = mt.minweight_match(a, b)
        w_ref, p_ref = pygsti.tools.matrixtools.minweight_match(a, b)
        assert np.allclose(np.sum(w_mine), np.sum(w_ref))
        assert [tuple(x) for x in p_mine] == [tuple(x) for x in p_ref]

    def test_nullspace_qr(self):
        from pygsti_tpu.tools import matrixtools as mt
        rng = np.random.RandomState(3)
        m = rng.randn(3, 6)
        ns = mt.nullspace_qr(m)
        assert ns.shape == (6, 3)
        assert np.abs(m @ ns).max() < 1e-9

    def test_misc_helpers(self):
        from pygsti_tpu.tools import matrixtools as mt
        import scipy.sparse as sps
        assert mt.prime_factors(60) == [2, 2, 3, 5]
        assert mt.int64_parity(7) == 1 and mt.int64_parity(6) == 0
        a = sps.csr_matrix(np.array([[1.0, 0], [0, 2.0]]))
        assert mt.safe_norm(a) == np.sqrt(5)
        assert mt.sparse_equal(a, a.copy())
        assert mt.sparse_onenorm(a) == 2.0
        assert mt.is_projector(np.diag([1.0, 0.0]))
        with pytest.raises(ValueError):
            mt.assert_projector(np.diag([1.0, 0.5]))
        mt.assert_hermitian(np.eye(2), 1e-12)
        with pytest.raises(ValueError):
            mt.assert_hermitian(np.array([[0, 1.0], [0, 0]]), 1e-12)
        assert mt.compute_kite([1.0, 1.0, 2.0, 3.0, 3.0, 3.0]) == [2, 1, 3]
        s = mt.mx_to_string_complex(np.eye(2))
        assert '1.0000' in s
        L = mt.near_identity_matrix_log(np.diag([1.0, 0.95, 0.95, 0.9]))
        assert np.allclose(np.diag(L), np.log([1.0, 0.95, 0.95, 0.9]))

    def test_minweight_match_realmxeigs(self):
        from pygsti_tpu.tools import matrixtools as mt
        rng = np.random.RandomState(4)
        a = rng.randn(4, 4)
        b = a + 0.01 * rng.randn(4, 4)
        ea, eb = mt.minweight_match_realmxeigs(a, b)
        assert np.abs(np.sort(ea) - np.sort(np.linalg.eigvals(a))).max() < 1e-12
        assert np.abs(ea - eb).max() < 0.2
