"""Tests for cloud-noise models."""

import numpy as np
import pytest

from pygsti_tpu.processors import QubitProcessorSpec
from pygsti_tpu.models.cloudnoisemodel import create_cloud_crosstalk_model_from_hops_and_weights
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.data import simulate_data


@pytest.fixture(scope='module')
def cloud_model():
    pspec = QubitProcessorSpec(3, ['Gxpi2', 'Gypi2', 'Gcnot'], geometry='line')
    return create_cloud_crosstalk_model_from_hops_and_weights(
        pspec, maxhops=1, max_idle_weight=1, extra_gate_weight=0, gate_type='H+s')


class TestCloudNoise:
    def test_ideal_at_zero_params(self, cloud_model):
        p = cloud_model.probabilities(Circuit('Gxpi2:1Gxpi2:1@(0,1,2)'))
        assert np.isclose(p[('010',)], 1.0, atol=1e-9)

    def test_cloud_extends_to_neighbors(self, cloud_model):
        """Error in Gxpi2:1's cloud can affect neighbor qubit 0 (maxhops=1)."""
        m = cloud_model.copy()
        v = np.zeros(m.num_params)
        cloud_op = m.operation_blks['cloudnoise'][('cloud', 'Gxpi2', (1,))]
        # find the H_X-on-qubit-0 coefficient within the cloud (qubits 0,1,2)
        eg = cloud_op.errorgen
        lbls = eg.blocks[0].basis_element_labels
        idx_xii = lbls.index('XII')  # X on first cloud qubit (=0)
        sl = cloud_op.gpindices
        v[sl.start + idx_xii] = 0.2
        m.from_vector(v)
        p = m.probabilities(Circuit('Gxpi2:1@(0,1,2)'))
        # some probability leaks onto qubit 0 outcomes
        leak = p[('110',)] + p[('100',)]
        assert leak > 1e-4, "cloud error did not affect neighbor (leak=%g)" % leak

    def test_no_cloud_effect_beyond_hops(self):
        """With maxhops=0 the cloud is only the gate's own qubit."""
        pspec = QubitProcessorSpec(3, ['Gxpi2', 'Gypi2', 'Gcnot'], geometry='line')
        m = create_cloud_crosstalk_model_from_hops_and_weights(
            pspec, maxhops=0, max_idle_weight=0, gate_type='H+s')
        cloud_op = m.operation_blks['cloudnoise'][('cloud', 'Gxpi2', (1,))]
        lbls = cloud_op.errorgen.blocks[0].basis_element_labels
        assert all(len(l) == 1 for l in lbls)  # single-qubit cloud

    def test_fit_cloud_model(self, cloud_model):
        """Cloud model evaluates objectives/Jacobians (fittable)."""
        from pygsti_tpu.objectivefns.objectivefns import (
            RawChi2Function, TimeIndependentMDCObjectiveFunction)
        m = cloud_model.copy()
        circs = [Circuit('Gxpi2:0Gcnot:0:1@(0,1,2)'),
                 Circuit('Gypi2:2Gcnot:1:2@(0,1,2)'),
                 Circuit('[Gxpi2:0Gypi2:2]@(0,1,2)')]
        truth = cloud_model.copy()
        vt = np.zeros(truth.num_params)
        vt[0:3] = 0.02
        truth.from_vector(vt)
        ds = simulate_data(truth, circs, 2000, seed=1)
        obj = TimeIndependentMDCObjectiveFunction(RawChi2Function(), m, ds, circs)
        ls, jtj, jtf = obj.jtj_jtf(m.to_vector())
        assert np.all(np.isfinite(jtj))
        assert jtj.shape == (m.num_params, m.num_params)


class TestCreateCloudCrosstalkModel:
    def test_stencil_noise_on_spectator_qubit(self):
        """('H','Z:1') noise on Gxpi2:0 acts on qubit 1 (true crosstalk)."""
        import numpy as np
        from pygsti_tpu.processors import QubitProcessorSpec
        from pygsti_tpu.models.modelconstruction import (
            create_cloud_crosstalk_model)
        from pygsti_tpu.circuits import Circuit

        pspec = QubitProcessorSpec(2, ['Gxpi2', 'Gypi2'],
                                   geometry='line')
        rate = 0.08
        mdl = create_cloud_crosstalk_model(
            pspec, lindblad_error_coeffs={'Gxpi2': {('H', 'X:1'): rate}})
        # Gxpi2 on qubit 0 with H(X) crosstalk on qubit 1: qubit 1 leaves
        # |0> even though the gate doesn't act on it
        c = Circuit([('Gxpi2', 0)], line_labels=(0, 1))
        p = mdl.probabilities(c)
        p1_excited = sum(v for k, v in p.items() if k[0][1] == '1')
        assert p1_excited > 1e-3, \
            "crosstalk noise should excite the spectator qubit"
        # analytic: H coefficients are in the normalized-Pauli (pp basis,
        # X/sqrt(2)) convention -> rotation angle sqrt(2)*rate about X,
        # p(1) = sin^2(rate/sqrt(2))
        assert abs(p1_excited - np.sin(rate / np.sqrt(2)) ** 2) < 1e-6
        # and a plain Gypi2 on qubit 1 (no noise configured) stays ideal
        c3 = Circuit([('Gypi2', 1)], line_labels=(0, 1))
        p3 = mdl.probabilities(c3)
        assert abs(sum(v for k, v in p3.items() if k[0][1] == '1') - 0.5) < 1e-9
        assert abs(sum(p.values()) - 1.0) < 1e-9

    def test_target_stencil_refs(self):
        """@0 stencil follows the gate's target qubit."""
        from pygsti_tpu.processors import QubitProcessorSpec
        from pygsti_tpu.models.modelconstruction import (
            create_cloud_crosstalk_model)
        from pygsti_tpu.circuits import Circuit

        pspec = QubitProcessorSpec(2, ['Gxpi2'], geometry='line')
        mdl = create_cloud_crosstalk_model(
            pspec, lindblad_error_coeffs={'Gxpi2': {('S', 'X:@0'): 0.05}})
        for q in (0, 1):
            c = Circuit([('Gxpi2', q)], line_labels=(0, 1))
            p = mdl.probabilities(c)
            assert abs(sum(p.values()) - 1.0) < 1e-9
            # stochastic X noise on the rotated qubit changes nothing for
            # an X rotation (X commutes) -- but the model must build and
            # the off-qubit stays in |0>
            other = 1 - q
            marg = sum(v for k, v in p.items() if k[0][other] == '1')
            assert marg < 1e-9


class TestKCoverageTemplate:
    def test_templates(self):
        from pygsti_tpu.circuits.cloudcircuitconstruction import (
            create_kcoverage_template, check_kcoverage_template)
        for n, k in [(3, 1), (4, 2), (6, 2), (5, 3), (6, 3), (4, 4)]:
            rows = create_kcoverage_template(n, k)
            check_kcoverage_template(rows, n, k)  # raises on violation
            assert all(len(r) == n and set(r) <= set(range(k)) for r in rows)

    def test_violation_detected(self):
        from pygsti_tpu.circuits.cloudcircuitconstruction import (
            check_kcoverage_template)
        with pytest.raises(AssertionError):
            check_kcoverage_template([[0, 1]], 2, 2)  # (1, 0) never appears
        # missing the (1, 0) permutation at positions (0, 1):
        with pytest.raises(AssertionError):
            check_kcoverage_template([[0, 1, 0], [0, 0, 1], [1, 1, 0]], 3, 2)


class TestCloudnoiseCircuits:
    def test_create_cloudnoise_circuits(self):
        from pygsti_tpu.circuits.cloudcircuitconstruction import (
            create_cloudnoise_circuits)
        from pygsti_tpu.circuits.circuitstructure import (
            PlaquetteGridCircuitStructure)
        pspec = QubitProcessorSpec(2, ['Gxpi2', 'Gypi2', 'Gcnot'],
                                   geometry='line')
        fids = [(), ('Gxpi2',), ('Gypi2',), ('Gxpi2', 'Gxpi2')]
        struct = create_cloudnoise_circuits(
            pspec, [1, 2, 4], fids, max_idle_weight=1, maxhops=0,
            extra_gate_weight=0, max_candidates=48, seed=3)
        assert isinstance(struct, PlaquetteGridCircuitStructure)
        assert struct.xs == [1, 2, 4]
        germ_strs = [g.str for g in struct.ys]
        assert any('Gcnot' in g for g in germ_strs)
        assert germ_strs[0] == '[]@(0,1)'  # global-idle germ first
        assert len(struct) > 20
        for c in struct:
            assert c.line_labels == (0, 1)
        # plaquette (L=4, idle germ) repeats the idle layer 4 times
        idle_germ = struct.ys[0]
        plaq = struct.plaquette(4, idle_germ)
        assert plaq.power == 4 and plaq.base.depth == 4

    def test_idle_only_design_amplifies_idle_errors(self):
        """The idle-only design's probability Jacobian grows linearly with
        germ power in every direction the construction marked amplified."""
        from pygsti_tpu.circuits.cloudcircuitconstruction import (
            create_cloudnoise_circuits)
        pspec = QubitProcessorSpec(2, ['Gxpi2', 'Gypi2', 'Gcnot'],
                                   geometry='line')
        fids = [(), ('Gxpi2',), ('Gypi2',), ('Gxpi2', 'Gxpi2')]
        struct = create_cloudnoise_circuits(
            pspec, [1], fids, max_idle_weight=1, idle_only=True,
            max_candidates=64, seed=0)
        m = create_cloud_crosstalk_model_from_hops_and_weights(
            pspec, maxhops=0, max_idle_weight=1, gate_type='H+s')
        idle_germ = struct.ys[0]
        plaq = struct.plaquette(1, idle_germ)

        def design_jac(power):
            circs = [prep + idle_germ.repeat(power) + meas
                     for (prep, meas) in plaq.fidpairs.values()]
            layout = m.sim.create_layout(circs)
            return np.asarray(m.sim.bulk_fill_dprobs(None, layout))

        A = design_jac(2) - design_jac(1)
        # weight-1 idle H+s on 2 qubits has 12 params; the X/Y axes (8 of
        # them) are first-order amplifiable with these fiducials
        rank = np.linalg.matrix_rank(A, tol=1e-9)
        assert rank >= 8, "idle design amplifies only rank %d" % rank


class TestCloudnoiseGSTEndToEnd:
    def test_fit_recovers_cloud_rates(self):
        """Full loop: amplifying design -> noisy data -> LM fit recovers the
        planted cloud-noise error rates."""
        from pygsti_tpu.algorithms.core import run_gst_fit_simple
        from pygsti_tpu.circuits.cloudcircuitconstruction import (
            create_cloudnoise_circuits)
        from pygsti_tpu.objectivefns.objectivefns import (
            ObjectiveFunctionBuilder)

        pspec = QubitProcessorSpec(2, ['Gxpi2', 'Gypi2', 'Gcnot'],
                                   geometry='line')
        fids = [(), ('Gxpi2',), ('Gypi2',), ('Gxpi2', 'Gxpi2')]
        struct = create_cloudnoise_circuits(
            pspec, [1, 2, 4], fids, max_idle_weight=1, maxhops=0,
            extra_gate_weight=0, max_candidates=48, seed=3)
        circuits = list(struct)

        truth = create_cloud_crosstalk_model_from_hops_and_weights(
            pspec, maxhops=0, max_idle_weight=1, gate_type='H+s')
        vt = np.zeros(truth.num_params)
        # plant an H_X error on the idle's qubit-0 and an H_Y on Gxpi2:0's
        # cloud (labels: idle block first at gpindices of idle_member)
        idle_sl = truth.idle_member.gpindices
        lbls = truth.idle_member.errorgen.blocks[0].basis_element_labels
        vt[idle_sl.start + lbls.index('XI')] = 0.03
        truth.from_vector(vt)
        ds = simulate_data(truth, circuits, 20000, seed=11)

        start = truth.copy()
        start.from_vector(np.zeros(truth.num_params))
        opt_result, objective = run_gst_fit_simple(
            ds, start, circuits, optimizer={'maxiter': 60},
            objective_function_builder=ObjectiveFunctionBuilder.cast('chi2'))
        vfit = np.asarray(objective.model.to_vector())
        planted = vfit[idle_sl.start + lbls.index('XI')]
        assert abs(planted - 0.03) < 0.01, \
            "recovered idle H_X rate %g (expected 0.03)" % planted
        # cloud-noise params are gauge-redundant, so other components need
        # not vanish -- instead require the fit to predict the data at
        # least as well as the generating model
        from pygsti_tpu.tools.likelihoodfns import two_delta_logl
        tdl_fit = two_delta_logl(objective.model, ds, circuits)
        tdl_truth = two_delta_logl(truth, ds, circuits)
        assert tdl_fit < tdl_truth + 10.0, \
            "fit 2DlogL %g worse than truth %g" % (tdl_fit, tdl_truth)


class TestLoglPoissonPicture:
    def test_nonpoisson_two_delta_logl_formula(self):
        """poisson_picture=False matches 2*sum N*f*log(f/p) directly."""
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuits
        from pygsti_tpu.tools.likelihoodfns import two_delta_logl

        t = mp.target_model()
        circs = create_lsgst_circuits(t, mp.prep_fiducials(),
                                      mp.meas_fiducials(), mp.germs(), [1])
        noisy = t.depolarize(op_noise=0.02)
        ds = simulate_data(noisy, circs, 2000, seed=3)
        # evaluate at the datagen model so all probabilities stay well above
        # the min_prob_clip stitching region
        got = two_delta_logl(noisy, ds, circs, poisson_picture=False)
        expected = 0.0
        for c in circs:
            row = ds[c]
            probs = noisy.probabilities(c)
            for outcome, cnt in row.items():
                if cnt > 0:
                    f = cnt / row.total
                    p = max(float(probs.get(outcome, 0.0)), 1e-6)
                    expected += 2 * cnt * np.log(f / p)
        assert abs(got - expected) / abs(expected) < 1e-3
