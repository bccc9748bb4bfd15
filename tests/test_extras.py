"""Tests for extras: crosstalk detection and idle tomography."""

import numpy as np
import pytest

from pygsti_tpu.circuits import Circuit
from pygsti_tpu.data import simulate_data


class TestCrosstalkDetection:
    def _make_data(self, coupling, n_samples=200, seed=0):
        """2 regions; region 0's outcome depends on region 1's setting iff
        coupling > 0."""
        rng = np.random.RandomState(seed)
        tuples = []
        for _ in range(n_samples):
            s0, s1 = rng.randint(2), rng.randint(2)
            p0 = 0.2 + coupling * s1
            o0 = int(rng.rand() < p0)
            o1 = int(rng.rand() < 0.5)
            tuples.append(((s0, s1), (o0, o1)))
        return tuples

    def test_no_crosstalk(self):
        from pygsti_tpu.extras.crosstalk import do_pairwise_crosstalk_detection
        res = do_pairwise_crosstalk_detection(self._make_data(0.0, 500), 2)
        assert not res.crosstalk_detected

    def test_crosstalk_detected(self):
        from pygsti_tpu.extras.crosstalk import do_pairwise_crosstalk_detection
        res = do_pairwise_crosstalk_detection(self._make_data(0.5, 500), 2)
        assert res.crosstalk_detected
        assert (0, 1) in res.crosstalk_pairs
        assert (1, 0) not in res.crosstalk_pairs

    def test_pc_pipeline_recovers_planted_edge(self):
        """PC-algorithm pipeline (reference core.py:186): a planted
        dependence of region 0's outcome on region 1's setting is recovered
        as a crosstalk edge, and no spurious pairs appear."""
        from pygsti_tpu.extras.crosstalk import do_basic_crosstalk_detection
        res = do_basic_crosstalk_detection(self._make_data(0.5, 4000), 2,
                                           verbosity=0)
        assert res.any_crosstalk_detect()
        assert res.crosstalk_detected
        assert (0, 1) in res.crosstalk_pairs or (1, 0) in res.crosstalk_pairs
        # the CPDAG contains the outcome0 <-> setting1 edge (columns 0 and 3)
        assert res.graph.has_edge(0, 3) or res.graph.has_edge(3, 0)
        # TVD weight for the crosstalk edge is large (true TVD = 0.5)
        assert max(res.max_tvds.values()) > 0.3
        assert "Crosstalk detected" in str(res)
        assert "R$" in res.show_crosstalk_table()

    def test_pc_pipeline_null(self):
        """No dependence => no crosstalk edges from the PC pipeline."""
        from pygsti_tpu.extras.crosstalk import do_basic_crosstalk_detection
        res = do_basic_crosstalk_detection(self._make_data(0.0, 4000), 2,
                                           verbosity=0)
        assert not res.any_crosstalk_detect()
        assert res.crosstalk_pairs == []

    def test_pc_pipeline_three_regions_matrix_input(self):
        """3-region matrix input: outcome of region 1 depends on the setting
        of region 2 only; the cmatrix names exactly that pair."""
        from pygsti_tpu.extras.crosstalk import do_basic_crosstalk_detection
        rng = np.random.RandomState(7)
        n = 6000
        s = rng.randint(0, 2, size=(n, 3))
        o = rng.randint(0, 2, size=(n, 3))
        o[:, 1] = (rng.rand(n) < (0.15 + 0.6 * s[:, 2])).astype(int)
        data = np.hstack([o, s])
        res = do_basic_crosstalk_detection(data, 3, settings=[1, 1, 1],
                                           verbosity=0)
        pairs = set(res.crosstalk_pairs)
        assert pairs and pairs <= {(1, 2), (2, 1)}

    def test_g_square_dis(self):
        """G^2 CI test: dependent pair rejects, independent pair accepts,
        conditional independence detected given the mediator."""
        from pygsti_tpu.extras.crosstalk.pcalg import g_square_dis
        rng = np.random.RandomState(0)
        n = 5000
        x = rng.randint(0, 2, n)
        z = (x + (rng.rand(n) < 0.1)).astype(int) % 2  # z depends on x
        y = (z + (rng.rand(n) < 0.1)).astype(int) % 2  # y depends on z
        w = rng.randint(0, 2, n)                        # independent
        data = np.stack([x, y, z, w], axis=1)
        assert g_square_dis(data, 0, 1, ()) < 0.01      # x ~ y marginally
        assert g_square_dis(data, 0, 3, ()) > 0.05      # x indep w
        assert g_square_dis(data, 0, 1, (2,)) > 0.01    # x indep y | z

    def test_dataset_auxinfo_pipeline(self):
        """DataSet + auxInfo['settings'] path through form_ct_data_matrix
        (reference core.py:228-295)."""
        from pygsti_tpu.extras.crosstalk import (do_basic_crosstalk_detection,
                                                 form_ct_data_matrix)
        from pygsti_tpu.data.dataset import DataSet
        from pygsti_tpu.circuits.circuit import Circuit
        from pygsti_tpu.baseobjs.label import Label
        import itertools
        ds = DataSet()
        for i, g0 in enumerate(('Gxpi2', 'Gypi2')):
            c = Circuit([Label(g0, 0), Label('Gxpi2', 1)], (0, 1))
            p1 = 0.2 if g0 == 'Gxpi2' else 0.8  # q1 outcome <- q0 setting
            counts = {}
            for b0, b1 in itertools.product('01', '01'):
                p = 0.5 * (p1 if b1 == '1' else 1 - p1)
                counts[b0 + b1] = int(round(4000 * p))
            ds.add_count_dict(c, counts,
                              aux={'settings': {(0,): i, (1,): 0}})
        data = form_ct_data_matrix(ds, 2, [1, 1])
        assert data.shape == (8000, 4)
        res = do_basic_crosstalk_detection(ds, 2, settings=[1, 1],
                                           verbosity=0)
        pairs = set(res.crosstalk_pairs)
        assert pairs and pairs <= {(1, 0), (0, 1)}


class TestIdleTomography:
    def test_detects_idle_overrotation(self):
        """Idle with a small Z over-rotation: H_Z rate recovered."""
        from pygsti_tpu.extras.idletomography import (IdleTomographyDesign,
                                                      IdleTomography)
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.baseobjs.label import Label
        from pygsti_tpu.modelmembers.operations import StaticArbitraryOp
        from pygsti_tpu.tools.optools import unitary_to_pauligate
        import scipy.linalg as spl
        from pygsti_tpu.tools.internalgates import sigmaZ

        theta = 0.02
        model = mp.target_model('static')
        model.operations[Label(())] = StaticArbitraryOp(
            np.real(unitary_to_pauligate(spl.expm(-1j * theta / 2 * sigmaZ))))

        design = IdleTomographyDesign((0,), max_lengths=(0, 1, 2, 4, 8, 16))
        ds = simulate_data(model, design.all_circuits_needing_data, 50000, seed=1)
        res = IdleTomography().run(ProtocolData(design, ds))
        rates = res.intrinsic_rates[0]
        # d<Y>/dN for X-prep = +theta (rotation about Z): H_Z ~ theta/2
        assert abs(rates['H_Z']) > 3 * abs(rates['H_X'])
        assert abs(rates['H_Z']) > 3 * abs(rates['H_Y'])
        assert np.isclose(abs(rates['H_Z']), theta / 2, rtol=0.2)

    def test_detects_idle_decay(self):
        """Depolarizing idle: all three decay rates positive and similar."""
        from pygsti_tpu.extras.idletomography import (IdleTomographyDesign,
                                                      IdleTomography)
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.baseobjs.label import Label
        from pygsti_tpu.modelmembers.operations import StaticArbitraryOp

        model = mp.target_model('static')
        model.operations[Label(())] = StaticArbitraryOp(
            np.diag([1.0, 0.98, 0.98, 0.98]))
        design = IdleTomographyDesign((0,), max_lengths=(0, 1, 2, 4, 8))
        ds = simulate_data(model, design.all_circuits_needing_data, 20000, seed=3)
        res = IdleTomography().run(ProtocolData(design, ds))
        rates = res.intrinsic_rates[0]
        for P in ('X', 'Y', 'Z'):
            assert 0.005 < rates['decay_%s' % P] < 0.05


class TestIdleTomographyDeep:
    """Design-matrix rate extraction: S/A weight-1 rates and weight-2
    correlated stochastic rates (reference: idtcore.py:294,1040)."""

    def test_stochastic_rate_recovered(self):
        from pygsti_tpu.extras.idletomography import (IdleTomographyDesign,
                                                      IdleTomography)
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.baseobjs.label import Label
        from pygsti_tpu.modelmembers.operations import StaticArbitraryOp
        from pygsti_tpu.tools.lindbladtools import create_elementary_errorgen
        from pygsti_tpu.tools.basistools import change_basis
        import scipy.linalg as spl

        s_rate = 0.01
        sigmaZmx = np.array([[1, 0], [0, -1]], complex)
        L_pp = np.real(change_basis(
            create_elementary_errorgen('S', sigmaZmx), 'std', 'pp'))
        model = mp.target_model('static')
        model.operations[Label(())] = StaticArbitraryOp(
            np.real(spl.expm(s_rate * L_pp)))
        design = IdleTomographyDesign((0,), max_lengths=(0, 1, 2, 4, 8))
        ds = simulate_data(model, design.all_circuits_needing_data, 100000,
                           seed=9)
        res = IdleTomography().run(ProtocolData(design, ds))
        rates = res.intrinsic_rates[0]
        assert np.isclose(rates[('S', 'Z')], s_rate, rtol=0.25), rates
        assert abs(rates[('S', 'X')]) < s_rate / 2
        assert abs(rates[('H', 'Z')]) < s_rate / 2

    def test_weight2_correlated_stochastic_rate(self):
        from pygsti_tpu.extras.idletomography import (IdleTomographyDesign,
                                                      IdleTomography)
        from pygsti_tpu.extras.idletomography.idtcore import _kron_pauli
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.modelpacks import smq2Q_XYI as mp2
        from pygsti_tpu.baseobjs.label import Label
        from pygsti_tpu.modelmembers.operations import StaticArbitraryOp
        from pygsti_tpu.tools.lindbladtools import create_elementary_errorgen
        from pygsti_tpu.tools.basistools import change_basis
        import scipy.linalg as spl

        s_rate = 0.01
        L_pp = np.real(change_basis(
            create_elementary_errorgen('S', _kron_pauli(('Z', 'Z'))),
            'std', 'pp'))
        model = mp2.target_model('static')
        model.operations[Label(())] = StaticArbitraryOp(
            np.real(spl.expm(s_rate * L_pp)))
        design = IdleTomographyDesign((0, 1), max_lengths=(0, 1, 2, 4),
                                      maxweight=2)
        ds = simulate_data(model, design.all_circuits_needing_data, 100000,
                           seed=10)
        res = IdleTomography().run(ProtocolData(design, ds))
        pr = res.pair_rates[(0, 1)]
        assert np.isclose(pr[('S', ('Z', 'Z'))], s_rate, rtol=0.3), pr
        others = [abs(v) for k, v in pr.items() if k != ('S', ('Z', 'Z'))]
        assert max(others) < s_rate / 2


class TestCrosstalkDeep:
    """Dataset pipeline + experiment generation + crosstalk graph
    (reference: crosstalk/core.py:66,186,675)."""

    def test_experiment_generation(self):
        from pygsti_tpu.extras.crosstalk.core import crosstalk_detection_experiment
        circuits, settings = crosstalk_detection_experiment(
            [0, 1], lengths=[2, 4], circuits_per_length=5, seed=3)
        assert len(circuits) == 10 and len(settings) == 10
        assert all(len(s) == 2 for s in settings)

    def test_dataset_pipeline_detects_crosstalk(self):
        """A model where qubit 1's outcome depends on qubit 0's gates."""
        import itertools
        from pygsti_tpu.extras.crosstalk.core import (
            do_crosstalk_detection_on_dataset, form_ct_data_tuples)
        from pygsti_tpu.data.dataset import DataSet
        from pygsti_tpu.circuits.circuit import Circuit
        from pygsti_tpu.baseobjs.label import Label
        rng = np.random.RandomState(4)
        ds = DataSet()
        # settings: region 0 applies Gxpi2 or Gypi2; region 1 always Gxpi2.
        # CROSSTALK: qubit 1's flip probability depends on region 0's gate.
        for g0 in ('Gxpi2', 'Gypi2'):
            for rep in range(2):
                c = Circuit([Label(g0, 0), Label('Gxpi2', 1)], (0, 1))
                if g0 == 'Gxpi2':
                    p1 = 0.2  # qubit1 '1' probability depends on qubit0 gate
                else:
                    p1 = 0.8
                counts = {}
                for b0, b1 in itertools.product('01', '01'):
                    p = (0.5) * (p1 if b1 == '1' else 1 - p1)
                    counts[b0 + b1] = int(round(4000 * p))
                ds.add_count_dict(c, counts)
        # need distinct settings for region 0; circuits already differ there
        res = do_crosstalk_detection_on_dataset(ds, [(0,), (1,)],
                                                significance=0.05)
        assert res.crosstalk_detected
        assert (1, 0) in res.crosstalk_pairs  # q1 outcomes depend on q0 setting
        M = res.crosstalk_matrix()
        assert M.shape == (2, 2)
        assert M[1, 0] > M[0, 1]
        assert res.effect_sizes[(1, 0)] > 0.1


class TestProbTrajectory:
    def test_cosine_trajectory_mle_recovers_drift(self):
        """MLE on synthetic drifting data recovers the amplitude."""
        import numpy as np
        from pygsti_tpu.extras.drift.probtrajectory import (
            CosineProbTrajectory, maxlikelihood, negloglikelihood,
            amplitude_compression)
        rng = np.random.RandomState(0)
        T = 512
        times = np.arange(T, dtype=float)
        # truth: p0(t) = 0.5 + 0.2*sqrt(2)*cos mode 3
        truth = CosineProbTrajectory(['0', '1'], [0, 3], {'0': [0.5, 0.2]},
                                     starttime=0, timestep=1.0, numtimes=T)
        p0 = truth.probabilities(times)['0']
        clicks0 = rng.binomial(1, p0)
        clickstreams = {'0': clicks0, '1': 1 - clicks0}
        seed = CosineProbTrajectory(['0', '1'], [0, 3], {'0': [0.5, 0.0]},
                                    starttime=0, timestep=1.0, numtimes=T)
        fit = maxlikelihood(seed, clickstreams, times)
        a0, a3 = fit.parameters['0']
        assert abs(a0 - 0.5) < 0.05
        assert abs(a3 - 0.2) < 0.07, "amplitude not recovered: %g" % a3
        # the fit improves the likelihood over the constant seed
        assert negloglikelihood(fit, clickstreams, times) < \
            negloglikelihood(seed, clickstreams, times)
        # compression keeps probabilities physical
        big = CosineProbTrajectory(['0', '1'], [0, 3], {'0': [0.5, 0.6]},
                                   starttime=0, timestep=1.0, numtimes=T)
        comp, was = amplitude_compression(big, times)
        assert was
        ps = comp.probabilities(times, trim=False)
        assert np.min(ps['0']) >= -1e-9 and np.max(ps['0']) <= 1 + 1e-9


class TestIdleTomographyPauliObjs:
    def test_pauli_algebra(self):
        import numpy as np
        from pygsti_tpu.extras.idletomography.pauliobjs import (
            NQOutcome, NQPauliState, NQPauliOp)
        X = NQPauliOp.weight_1_pauli(2, 0, 'X')
        Y = NQPauliOp.weight_1_pauli(2, 0, 'Y')
        Z = NQPauliOp.weight_1_pauli(2, 0, 'Z')
        assert not X.commuteswith(Y)
        assert X.commuteswith(NQPauliOp('IX'))
        # i[X,Y]/2 = -Z  (since [X,Y]=2iZ => i[X,Y]/2 = i*iZ = -Z)
        c = X.icommutator_over_2(Y)
        assert c.rep == 'ZI' and c.sign == -1, str(c)
        assert Z.icommutator_over_2(NQPauliOp('IX')) is None
        # dense cross-check of the commutator identity on qubit 0
        sx = np.array([[0, 1], [1, 0]], complex)
        sy = np.array([[0, -1j], [1j, 0]])
        sz = np.diag([1, -1.0]).astype(complex)
        icomm = 1j * (sx @ sy - sy @ sx) / 2
        assert np.allclose(icomm, c.sign * sz)
        # dot / statedot
        assert X.dot(NQPauliOp('XI')) == 1
        assert X.dot(NQPauliOp('XI', -1)) == -1
        assert X.dot('YI') == 0
        st = NQPauliState('XZ', (1, -1))
        assert NQPauliOp('XI').statedot(st) == 1
        assert NQPauliOp('IZ').statedot(st) == -1
        assert NQPauliOp('ZI').statedot(st) == 0
        # outcomes
        o = NQOutcome.weight_1_string(3, 1)
        assert str(o) == '010' and str(o.flip(0, 1)) == '100'

    def test_state_to_circuit(self):
        from pygsti_tpu.extras.idletomography.pauliobjs import NQPauliState
        basis = {'+X': ('Gypi2',), '-X': ('Gympi2',), '+Y': ('Gxmpi2',),
                 '-Y': ('Gxpi2',), '+Z': (), '-Z': ('Gxpi',)}
        c = NQPauliState('XZ', (1, -1)).to_circuit(basis)
        names = [str(l) for l in c.layertup]
        assert any('Gypi2' in n for n in names) and any('Gxpi' in n for n in names)


class TestIdtTools:
    def test_alloutcomes_allerrors_allobservables(self):
        from pygsti_tpu.extras.idletomography import idttools
        from pygsti_tpu.extras.idletomography.pauliobjs import NQPauliState
        prep = NQPauliState('XY', (1, 1))
        meas = NQPauliState('XY', (1, -1))
        outs = idttools.alloutcomes(prep, meas, 1)
        # expected outcome is '01' (sign mismatch on qubit 1); errors flip bits
        assert [str(o) for o in outs] == ['11', '00']
        outs2 = idttools.alloutcomes(prep, meas, 2)
        assert len(outs2) == 3 and str(outs2[-1]) == '10'

        errs1 = idttools.allerrors(3, 1)
        assert len(errs1) == 9  # 3 qubits x {X,Y,Z}
        errs2 = idttools.allerrors(3, 2)
        assert len(errs2) == 9 + 3 * 9  # + C(3,2) pairs x 9 pauli combos

        obs = idttools.allobservables(NQPauliState('XZ'), 2)
        assert len(obs) == 3  # 2 weight-1 + 1 weight-2
        assert str(obs[0]).endswith('XI') and str(obs[2]).endswith('XZ')

    def test_tile_pauli_fidpairs(self):
        from pygsti_tpu.extras.idletomography import idttools
        from pygsti_tpu.extras.idletomography.pauliobjs import NQPauliState
        base = [(NQPauliState('XY', (1, 1)), NQPauliState('XY', (1, -1))),
                (NQPauliState('ZZ', (1, 1)), NQPauliState('ZZ', (1, 1)))]
        tiled = idttools.tile_pauli_fidpairs(base, 4, 2)
        assert all(len(p) == 4 and len(m) == 4 for p, m in tiled)
        # every pair of qubit positions must see every base pair in some
        # tiled pair (the k-coverage guarantee)
        for i, j in [(0, 1), (0, 3), (2, 3)]:
            for bp, bm in base:
                found = any(
                    (p.rep[i], p.signs[i], p.rep[j], p.signs[j]) ==
                    (bp.rep[0], bp.signs[0], bp.rep[1], bp.signs[1]) and
                    (m.rep[i], m.signs[i], m.rep[j], m.signs[j]) ==
                    (bm.rep[0], bm.signs[0], bm.rep[1], bm.signs[1])
                    for p, m in tiled)
                assert found, "base pair not tiled onto qubits (%d,%d)" % (i, j)

    def test_nontrivial_paulis(self):
        from pygsti_tpu.extras.idletomography import idttools
        assert len(idttools.nontrivial_paulis(1)) == 3
        assert len(idttools.nontrivial_paulis(2)) == 9
        assert ('X', 'Z') in idttools.nontrivial_paulis(2)


class TestIdtReport:
    def test_create_idletomography_report(self, tmp_path):
        from pygsti_tpu.extras.idletomography import (
            IdleTomographyDesign, IdleTomography,
            create_idletomography_report)
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.baseobjs.label import Label
        from pygsti_tpu.modelmembers.operations import StaticArbitraryOp
        from pygsti_tpu.tools.optools import unitary_to_pauligate
        import scipy.linalg as spl
        from pygsti_tpu.tools.internalgates import sigmaZ

        model = mp.target_model('static')
        model.operations[Label(())] = StaticArbitraryOp(
            np.real(unitary_to_pauligate(spl.expm(-1j * 0.02 / 2 * sigmaZ))))
        design = IdleTomographyDesign((0,), max_lengths=(0, 1, 2, 4))
        ds = simulate_data(model, design.all_circuits_needing_data, 2000,
                           seed=5)
        res = IdleTomography().run(ProtocolData(design, ds))
        out = str(tmp_path / "idt_report.html")
        create_idletomography_report(res, out, title="IDT Test")
        txt = open(out).read()
        assert '<svg' in txt and 'Intrinsic rates' in txt
        assert 'IDT Test' in txt and 'H(Z)' in txt


class TestTimeResolvedModel:
    def test_ramsey_mle_recovers_frequency_amplitude(self):
        """Time-resolved Ramsey: p1(t) = 0.5 + A*cos(w*t); MLE recovers A."""
        from pygsti_tpu.extras.drift.trmodel import (TimeResolvedModel,
                                                     negloglikelihood,
                                                     maxlikelihood)
        from pygsti_tpu.data import DataSet
        from pygsti_tpu.circuits import Circuit

        w = 0.31

        class RamseyModel(TimeResolvedModel):
            def probabilities(self, circuit, times):
                A = self.parameters[0]
                p1 = np.clip(0.5 + A * np.cos(w * np.asarray(times)), 0, 1)
                return {('1',): p1, ('0',): 1 - p1}

        rng = np.random.RandomState(7)
        times = np.arange(400, dtype=float)
        p1 = 0.5 + 0.3 * np.cos(w * times)
        outcomes = ['1' if rng.rand() < p else '0' for p in p1]
        ds = DataSet(outcome_labels=[('0',), ('1',)])
        c = Circuit('Gxpi2:0@(0)')
        ds.add_raw_series_data(c, outcomes, times)
        ds.done_adding_data()

        seed = RamseyModel([w], [0.05])
        nll_seed = negloglikelihood(seed, ds, 1e-4, 1 - 1e-4)
        fit = maxlikelihood(seed, ds, verbosity=0,
                            bounds=[(-0.49, 0.49)])
        nll_fit = negloglikelihood(fit, ds, 1e-4, 1 - 1e-4)
        assert nll_fit < nll_seed
        assert abs(fit.parameters[0] - 0.3) < 0.05

    def test_timeseries_for_outcomes(self):
        from pygsti_tpu.data import DataSet
        from pygsti_tpu.circuits import Circuit
        ds = DataSet(outcome_labels=[('0',), ('1',)])
        c = Circuit('Gxpi2:0@(0)')
        ds.add_raw_series_data(c, ['0', '1', '1', '0'], [0.0, 0.0, 1.0, 2.0])
        ds.done_adding_data()
        times, series = ds[c].timeseries_for_outcomes
        assert times == [0.0, 1.0, 2.0]
        assert series[('0',)] == [1, 0, 1]
        assert series[('1',)] == [1, 1, 0]
