"""Tests for implicit (crosstalk-free local-noise) models."""

import numpy as np
import pytest

from pygsti_tpu.processors import QubitProcessorSpec
from pygsti_tpu.models.modelconstruction import (create_crosstalk_free_model,
                                                 create_explicit_model)
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.data import simulate_data


@pytest.fixture(scope='module')
def pspec_3q():
    return QubitProcessorSpec(3, ['Gxpi2', 'Gypi2', 'Gcnot'], geometry='line')


class TestCrosstalkFreeModel:
    def test_ideal_probabilities(self, pspec_3q):
        mdl = create_crosstalk_free_model(pspec_3q)
        p = mdl.probabilities(Circuit('Gxpi2:0Gxpi2:0@(0,1,2)'))
        assert np.isclose(p[('100',)], 1.0, atol=1e-10)
        p = mdl.probabilities(Circuit('Gxpi2:1Gxpi2:1Gcnot:1:2@(0,1,2)'))
        assert np.isclose(p[('011',)], 1.0, atol=1e-10)

    def test_parallel_layers(self, pspec_3q):
        mdl = create_crosstalk_free_model(pspec_3q)
        p = mdl.probabilities(Circuit('[Gxpi2:0Gxpi2:2][Gxpi2:0Gxpi2:2]@(0,1,2)'))
        assert np.isclose(p[('101',)], 1.0, atol=1e-10)

    def test_depolarizing_noise_is_local(self, pspec_3q):
        mdl = create_crosstalk_free_model(
            pspec_3q, depolarization_strengths={'Gxpi2': 0.1})
        # noisy on the gate's qubit
        p = mdl.probabilities(Circuit('Gxpi2:0Gxpi2:0@(0,1,2)'))
        assert p[('100',)] < 0.95
        # other qubits untouched: prob of flips elsewhere = 0
        assert np.isclose(p[('101',)] + p[('110',)] + p[('111',)], p[('100',)] * 0
                          + (1 - sum(p[(o,)] for o in ('100', '000'))), atol=1e-9)
        assert np.isclose(p[('001',)] + p[('010',)] + p[('011',)], 0.0, atol=1e-10)

    def test_matches_explicit_for_2q(self):
        """Crosstalk-free 2Q model with no noise matches the explicit model."""
        pspec = QubitProcessorSpec(2, ['Gxpi2', 'Gypi2', 'Gcnot'], geometry='line')
        impl = create_crosstalk_free_model(pspec)
        expl = create_explicit_model(pspec, ideal_gate_type='static')
        circs = [Circuit('Gxpi2:0Gcnot:0:1@(0,1)'), Circuit('[Gxpi2:0Gypi2:1]@(0,1)'),
                 Circuit('Gypi2:1Gcnot:0:1Gxpi2:0@(0,1)')]
        for c in circs:
            pi = impl.probabilities(c)
            pe = expl.probabilities(c)
            for o in pi:
                assert np.isclose(pi[o], pe[o], atol=1e-10), (c.str, o)

    def test_lindblad_noise(self, pspec_3q):
        mdl = create_crosstalk_free_model(
            pspec_3q, lindblad_error_coeffs={'Gxpi2': {('H', 'X'): 0.05}})
        # over-rotation error: repeated gate accumulates coherent error
        p2 = mdl.probabilities(Circuit('Gxpi2:0Gxpi2:0@(0,1,2)'))
        assert p2[('100',)] < 1.0 - 1e-4

    def test_gst_on_crosstalk_free_data(self, pspec_3q):
        """simulate 5-qubit-style workflow at 3 qubits: model testing."""
        mdl = create_crosstalk_free_model(
            pspec_3q, depolarization_strengths={'Gxpi2': 0.02, 'Gypi2': 0.02,
                                                'Gcnot': 0.05})
        circs = [Circuit('Gxpi2:0Gcnot:0:1Gypi2:2@(0,1,2)'),
                 Circuit('Gcnot:1:2Gcnot:0:1@(0,1,2)'),
                 Circuit('[Gxpi2:0Gypi2:1]Gcnot:1:2@(0,1,2)')]
        ds = simulate_data(mdl, circs, 1000, seed=0)
        from pygsti_tpu.objectivefns import two_delta_logl
        tdl = two_delta_logl(mdl, ds, circs)
        k = ds.degrees_of_freedom(circs)
        assert tdl < k + 5 * np.sqrt(2 * k)

    def test_num_params(self, pspec_3q):
        mdl = create_crosstalk_free_model(
            pspec_3q, depolarization_strengths={'Gxpi2': 0.01})
        assert mdl.num_params == 1  # one shared depol rate leaf


class TestOpFactories:
    def test_unitary_op_factory_in_crosstalk_free_model(self):
        """Continuously-parameterized gates via circuit-label args
        (reference: opfactory.py:771 UnitaryOpFactory)."""
        import numpy as np
        from pygsti_tpu.processors import QubitProcessorSpec
        from pygsti_tpu.models.modelconstruction import create_crosstalk_free_model
        from pygsti_tpu.circuits import Circuit
        from pygsti_tpu.baseobjs.label import Label

        def zr(args):
            th = args[0]
            return np.array([[1, 0], [0, np.exp(1j * th)]])

        pspec = QubitProcessorSpec(2, ['Gxpi2', 'Gzr', 'Gcnot'], geometry='line',
                                   nonstd_gate_unitaries={'Gzr': zr})
        mdl = create_crosstalk_free_model(pspec)
        lz = Label('Gzr', (0,), args=(np.pi / 2,))
        c = Circuit([Label('Gxpi2', 0), lz, Label('Gxpi2', 0)], (0, 1))
        p = mdl.probabilities(c)
        X = np.array([[np.cos(np.pi / 4), -1j * np.sin(np.pi / 4)],
                      [-1j * np.sin(np.pi / 4), np.cos(np.pi / 4)]])
        psi = X @ zr((np.pi / 2,)) @ X @ np.array([1, 0])
        assert abs(p[('00',)] - abs(psi[0]) ** 2) < 1e-9

    def test_composed_and_embedded_factories(self):
        import numpy as np
        from pygsti_tpu.baseobjs.statespace import QubitSpace
        from pygsti_tpu.modelmembers.opfactory import (UnitaryOpFactory,
                                                       EmbeddingOpFactory,
                                                       ComposedOpFactory)
        from pygsti_tpu.modelmembers.operations import StaticArbitraryOp

        def zr(args):
            th = args[0]
            return np.array([[1, 0], [0, np.exp(1j * th)]])

        f = UnitaryOpFactory(zr, 2)
        op = f.create_op((0.5,))
        assert op.to_dense().shape == (4, 4)

        ss = QubitSpace(2)
        ef = EmbeddingOpFactory(ss, f)
        big = ef.create_op((0.5,), sslbls=(1,))
        assert big.to_dense().shape == (16, 16)

        cf = ComposedOpFactory([f, StaticArbitraryOp(np.eye(4))])
        cop = cf.create_op((0.5,))
        assert np.allclose(cop.to_dense(), op.to_dense(), atol=1e-12)


class TestModelNoiseObjects:
    def test_noise_spec_objects_build_models(self):
        from pygsti_tpu.models.modelnoise import (
            DepolarizationNoise, StochasticNoise, LindbladNoise,
            OpModelPerOpNoise, ComposedOpModelNoise)
        from pygsti_tpu.models.modelconstruction import (
            create_crosstalk_free_model)
        from pygsti_tpu.processors import QubitProcessorSpec
        from pygsti_tpu.circuits import Circuit
        spec = OpModelPerOpNoise({
            'Gxpi2': DepolarizationNoise(0.02),
            'Gypi2': LindbladNoise({('H', 'Z'): 0.01}),
        })
        d, s, l = spec.to_construction_dicts()
        assert d == {'Gxpi2': 0.02} and ('H', 'Z') in l['Gypi2']
        pspec = QubitProcessorSpec(1, ['Gxpi2', 'Gypi2'])
        mdl = create_crosstalk_free_model(pspec, depolarization_strengths=d,
                                          stochastic_error_probs=s,
                                          lindblad_error_coeffs=l)
        p = mdl.probabilities(Circuit([('Gxpi2', 0)], line_labels=(0,)))
        assert abs(sum(p.values()) - 1.0) < 1e-9
        assert abs(p[('1',)] - 0.5) < 0.02  # depolarized pi/2 rotation
        comp = ComposedOpModelNoise([spec,
                                     OpModelPerOpNoise({'Gypi2':
                                                        DepolarizationNoise(0.01)})])
        d2, _, l2 = comp.to_construction_dicts()
        assert d2['Gypi2'] == 0.01 and ('H', 'Z') in l2['Gypi2']


class TestStencilLabels:
    def test_resolution(self):
        from pygsti_tpu.models.stencillabel import (StencilLabelTuple,
                                                    StencilLabelRadiusCombos)
        from pygsti_tpu.baseobjs.qubitgraph import QubitGraph
        g = QubitGraph.common_graph(4, 'line')
        t = StencilLabelTuple(('@0', '@1'))
        assert t.compute_absolute_sslbls(g, (2, 3)) == [(2, 3)]
        t2 = StencilLabelTuple(('@0+left',))
        res = t2.compute_absolute_sslbls(g, (1,))
        assert res and res[0][0] in (0, 2)
        rc = StencilLabelRadiusCombos(('@0',), radius=1, num_to_choose=2)
        combos = rc.compute_absolute_sslbls(g, (1,))
        region = {q for c in combos for q in c}
        assert region <= {0, 1, 2} and all(len(c) == 2 for c in combos)


class TestModelMemberGraph:
    def test_similar_and_equivalent_explicit(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        m1 = mp.target_model('full TP')
        m2 = mp.target_model('full TP')
        g1, g2 = m1.create_modelmember_graph(), m2.create_modelmember_graph()
        assert g1.is_similar(g2) and g1.is_equivalent(g2)
        # perturb a parameter: still similar, no longer equivalent
        import numpy as np
        v = np.array(m2.to_vector())
        v[0] += 0.05
        m2.from_vector(v)
        g2b = m2.create_modelmember_graph()
        assert g1.is_similar(g2b)
        assert not g1.is_equivalent(g2b)

    def test_dissimilar_models(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI, smq1Q_XY
        g1 = smq1Q_XYI.target_model().create_modelmember_graph()
        g2 = smq1Q_XY.target_model().create_modelmember_graph()
        assert not g1.is_similar(g2)  # different op label sets
        # different parameterization of the same gates: not similar either
        g3 = smq1Q_XYI.target_model('full TP').create_modelmember_graph()
        g4 = smq1Q_XYI.target_model('static').create_modelmember_graph()
        assert not g3.is_similar(g4)
