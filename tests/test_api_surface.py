"""Reference API-surface additions: io read/write wrappers, full GST
results round trip, circuitconstruction helpers, rbfit FitResults, fiducial
candidate generation, and random-circuit layer samplers."""

import os

import numpy as np
import pytest

from pygsti_tpu.circuits import Circuit


@pytest.fixture(scope="module")
def gst_results(tmp_path_factory):
    from pygsti_tpu.modelpacks import smq1Q_XYI as mp
    from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
    from pygsti_tpu.data import simulate_data
    from pygsti_tpu.protocols.protocol import ProtocolData
    from pygsti_tpu.protocols.gst import (GateSetTomographyDesign,
                                          GateSetTomography, GSTInitialModel)
    target = mp.target_model('full TP')
    lists = create_lsgst_circuit_lists(target, mp.prep_fiducials(),
                                       mp.meas_fiducials(), mp.germs(), [1])
    ds = simulate_data(target.depolarize(op_noise=0.02), list(lists[-1]),
                       500, seed=5)
    gst = GateSetTomography(GSTInitialModel(model=target.copy()),
                            gaugeopt_suite='stdgaugeopt', verbosity=0)
    return gst.run(ProtocolData(GateSetTomographyDesign(target, lists), ds))


class TestResultsRoundTrip:
    def test_write_and_read_results(self, gst_results, tmp_path):
        from pygsti_tpu.io.readers import (read_results_from_dir,
                                           read_data_from_dir,
                                           read_edesign_from_dir)
        from pygsti_tpu.protocols.protocol import ProtocolResults
        d = str(tmp_path / 'results_dir')
        gst_results.write(d)
        loaded = ProtocolResults.from_dir(d)
        assert type(loaded).__name__ == 'ModelEstimateResults'
        est0 = gst_results.estimates['GateSetTomography']
        est1 = loaded.estimates['GateSetTomography']
        for key in ('target', 'final iteration estimate', 'stdgaugeopt'):
            m0 = est0.models[key]
            m1 = est1.models[key]
            for lbl in m0.operations:
                assert np.allclose(np.asarray(m0.operations[lbl].to_dense()),
                                   np.asarray(m1.operations[lbl].to_dense()))
        assert np.isclose(est1.misfit_sigma(), est0.misfit_sigma())
        # named-reader variant + edesign/data readers
        loaded2 = read_results_from_dir(d, name='GateSetTomography')
        assert np.isclose(
            loaded2.estimates['GateSetTomography'].misfit_sigma(),
            est0.misfit_sigma())
        data = read_data_from_dir(d)
        assert len(data.dataset) == len(gst_results.data.dataset)
        ed = read_edesign_from_dir(d)
        assert len(ed.all_circuits_needing_data) == \
            len(gst_results.data.edesign.all_circuits_needing_data)


class TestIoHelpers:
    def test_circuit_strings_round_trip(self, tmp_path):
        from pygsti_tpu.io.writers import (convert_circuits_to_strings,
                                           write_circuit_strings)
        from pygsti_tpu.io.readers import (convert_strings_to_circuits,
                                           read_circuit_strings)
        c1 = Circuit(('Gxpi2', 'Gypi2'), (0,))
        c2 = Circuit(('Gxpi2',), (0,))
        obj = {'list': [c1, c2], 'single': c1, 'n': 3}
        enc = convert_circuits_to_strings(obj)
        assert enc['single'].startswith('circuit/')
        dec = convert_strings_to_circuits(enc)
        assert dec['list'][0] == c1 and dec['single'] == c1 and dec['n'] == 3
        fn = str(tmp_path / 'circs.json')
        write_circuit_strings(fn, obj)
        dec2 = read_circuit_strings(fn)
        assert dec2['list'][1] == c2

    def test_write_empty_protocol_data_and_fill(self, tmp_path):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.io.writers import (write_empty_protocol_data,
                                           fill_in_empty_dataset_with_fake_data)
        from pygsti_tpu.io.readers import read_data_from_dir
        design = mp.create_gst_experiment_design(2)
        d = str(tmp_path / 'empty_data')
        write_empty_protocol_data(d, design)
        ds_file = os.path.join(d, 'data', 'dataset.txt')
        assert os.path.exists(ds_file)
        model = mp.target_model('full TP').depolarize(op_noise=0.05)
        ds = fill_in_empty_dataset_with_fake_data(ds_file, model, 1000,
                                                  seed=7)
        data = read_data_from_dir(d)
        assert len(data.dataset) == len(design.all_circuits_needing_data)
        row = data.dataset[design.all_circuits_needing_data[0]]
        assert row.total == 1000


class TestCircuitConstructionHelpers:
    def test_create_circuits(self):
        from pygsti_tpu.circuits import circuitconstruction as cc
        fids = cc.to_circuits([(), ('Gxpi2',), ('Gypi2',)], line_labels=(0,))
        germs = cc.to_circuits([('Gxpi2',), ('Gxpi2', 'Gypi2')],
                               line_labels=(0,))
        lst = cc.create_circuits('f0+germ*e+f1', f0=fids, f1=fids,
                                 germ=germs, e=2,
                                 order=['germ', 'f0', 'f1'])
        assert len(lst) == len(germs) * len(fids) ** 2
        assert lst[0] == germs[0] * 2

    def test_create_lgst_circuits_and_estimatable(self):
        from pygsti_tpu.circuits import circuitconstruction as cc
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data import simulate_data
        preps, meass = list(mp.prep_fiducials()), list(mp.meas_fiducials())
        model = mp.target_model('full TP')
        lgst_list = cc.create_lgst_circuits(preps, meass, model)
        assert all(isinstance(c, Circuit) for c in lgst_list)
        ds = simulate_data(model, lgst_list, 100, seed=1)
        estimatable = cc.list_circuits_lgst_can_estimate(ds, preps, meass)
        names = {c.str for c in estimatable}
        assert any('Gxpi2' in n for n in names)

    def test_manipulate_and_filter(self):
        from pygsti_tpu.circuits import circuitconstruction as cc
        c = Circuit(('Gxpi2', 'Gypi2', 'Gxpi2'), (0,))
        m = cc.manipulate_circuit(c, [(('Gxpi2',), ('Gzpi2', 'Gzpi2'))])
        assert [getattr(l, 'name', str(l)) for l in m.layertup] == \
            ['Gzpi2', 'Gzpi2', 'Gypi2', 'Gzpi2', 'Gzpi2']
        ms = cc.manipulate_circuits([c, c], [(('Gypi2',), ())])
        assert all(len(x.layertup) == 2 for x in ms)


class TestRbFitAndSamplers:
    def test_custom_least_squares_fit(self):
        from pygsti_tpu.algorithms.rbfit import custom_least_squares_fit
        m = np.array([2, 4, 8, 16, 32])
        asps = 0.5 + 0.48 * 0.97 ** m
        res = custom_least_squares_fit(m, asps, 1)
        assert res.success and abs(res.estimates['p'] - 0.97) < 1e-6
        res_fa = custom_least_squares_fit(m, asps, 1, a=0.5)
        assert res_fa.success and abs(res_fa.estimates['p'] - 0.97) < 1e-6
        assert res_fa.estimates['a'] == 0.5
        assert 'p =' in str(res_fa).replace('= ', '= ') or res_fa.estimates

    def test_layer_samplers_cover_all_qubits(self):
        from pygsti_tpu.processors.processorspec import QubitProcessorSpec
        from pygsti_tpu.algorithms import randomcircuit as rc
        from pygsti_tpu.baseobjs.label import Label
        pspec = QubitProcessorSpec(3, ['Gxpi2', 'Gypi2', 'Gcnot'],
                                   geometry='line')
        co2 = [[Label('Gcnot', (0, 1))], [Label('Gcnot', (1, 2))], []]
        for sampler, args in [('edgegrab', {}), ('Qelimination', {}),
                              ('local', {}),
                              ('co2Qgates', {'co2_q_gates': co2})]:
            c = rc.create_random_circuit(pspec, 6, sampler=sampler,
                                         samplerargs=args, seed=3)
            for layer in c.layertup:
                comps = layer.components if not layer.is_simple else (layer,)
                qs = sorted(q for l in comps for q in l.sslbls)
                assert qs == [0, 1, 2], (sampler, layer)

    def test_zxzxz_samplers(self):
        import numpy as np
        from pygsti_tpu.processors.processorspec import QubitProcessorSpec
        from pygsti_tpu.algorithms import randomcircuit as rc
        from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
        pspec = QubitProcessorSpec(3, ['Gzr', 'Gxpi2', 'Gczr'],
                                   geometry='line')
        rng = np.random.RandomState(7)

        # Haar ZXZXZ angles reproduce the sampled unitary (up to phase)
        t1, t2, t3 = rc.sample_haar_random_one_qubit_unitary_parameters(rng)
        gzr = standard_gatename_unitaries()['Gzr']
        gx = standard_gatename_unitaries()['Gxpi2']
        u = gzr((t3,)) @ gx @ gzr((t2,)) @ gx @ gzr((t1,))
        assert abs(abs(np.trace(u.conj().T @ u)) - 2) < 1e-9  # unitary

        c1 = rc.sample_compiled_haar_random_one_qubit_gates_zxzxz_circuit(
            pspec, rand_state=rng)
        assert c1.depth == 5 and c1.width == 3

        # Clifford variant: all Z angles are multiples of pi/2
        tc = rc.sample_random_clifford_one_qubit_unitary_parameters(rng)
        assert all(abs((t / (np.pi / 2)) - round(t / (np.pi / 2))) < 1e-12
                   for t in tc)

        c = rc.sample_random_cz_zxzxz_circuit(pspec, 4,
                                              qubit_labels=pspec.qubit_labels,
                                              rand_state=rng)
        # length blocks of (5-layer 1Q, 1 2Q layer) + final 5-layer 1Q block
        assert c.depth == 4 * 6 + 5 and c.width == 3
        names = {l.name for layer in c.layertup
                 for l in (layer.components if not layer.is_simple
                           else (layer,)) if l.name}
        assert names <= {'Gzr', 'Gxpi2', 'Gczr'}
        # every Gczr carries a +/- pi/2 args tuple
        for layer in c.layertup:
            for l in (layer.components if not layer.is_simple else (layer,)):
                if l.name == 'Gczr':
                    assert abs(abs(float(l.args[0])) - np.pi / 2) < 1e-9

    def test_candidate_fiducials(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.algorithms import fiducialselection as fs
        model = mp.target_model('full TP')
        cands = fs.create_candidate_fiducial_list(model,
                                                  candidate_fid_counts=3)
        assert len(cands) > 4
        assert Circuit((), model.state_space.qubit_labels) in cands
        pm = fs.create_prep_mxs(model, cands)
        mm = fs.create_meas_mxs(model, cands)
        assert pm[0].shape[1] == len(cands)
        assert mm[0].shape[0] == model.dim


class TestCompilerEntryPoints:
    """compile_symplectic / compile_cnot_circuit / compile_stabilizer_*
    (reference: compilers.py)."""

    def test_compile_symplectic(self):
        from pygsti_tpu.algorithms import compilers as cmp
        from pygsti_tpu.tools import symplectic as sym
        rng = np.random.RandomState(0)
        for n in (1, 2, 3):
            s, _ = sym.random_clifford(n, rand_state=rng)
            c = cmp.compile_symplectic(s)
            s_c, _ = sym.symplectic_rep_of_clifford_circuit(c)
            assert np.array_equal(s_c, s % 2)

    def test_compile_symplectic_native(self):
        from pygsti_tpu.algorithms import compilers as cmp
        from pygsti_tpu.tools import symplectic as sym
        from pygsti_tpu.processors.processorspec import QubitProcessorSpec
        pspec = QubitProcessorSpec(2, ['Gxpi2', 'Gypi2', 'Gcnot'],
                                   geometry='line')
        rng = np.random.RandomState(1)
        s, _ = sym.random_clifford(2, rand_state=rng)
        c = cmp.compile_symplectic(s, pspec=pspec)
        names = {getattr(l, 'name', str(l)) for l in c.layertup}
        assert names <= {'Gxpi2', 'Gypi2', 'Gcnot'}
        s_c, _ = sym.symplectic_rep_of_clifford_circuit(c)
        assert np.array_equal(s_c, s % 2)

    def test_compile_cnot_circuit(self):
        from pygsti_tpu.algorithms import compilers as cmp
        from pygsti_tpu.tools import symplectic as sym
        M = np.array([[1, 1, 0], [0, 1, 0], [1, 0, 1]])
        c = cmp.compile_cnot_circuit(M)
        s_c, _ = sym.symplectic_rep_of_clifford_circuit(c)
        assert np.array_equal(s_c[:3, :3] % 2, M % 2)
        with pytest.raises(AssertionError):
            cmp.compile_cnot_circuit(np.array([[1, 1], [1, 1]]))

    def test_stabilizer_prep_meas_inverse(self):
        from pygsti_tpu.algorithms import compilers as cmp
        from pygsti_tpu.tools import symplectic as sym
        rng = np.random.RandomState(2)
        s, p = sym.random_clifford(2, rand_state=rng)
        prep = cmp.compile_stabilizer_state(s, p)
        meas = cmp.compile_stabilizer_measurement(s, p)
        s1, p1 = sym.symplectic_rep_of_clifford_circuit(prep)
        s2, p2 = sym.symplectic_rep_of_clifford_circuit(meas)
        sc, pc = sym.compose_cliffords(s1, p1, s2, p2)
        assert np.array_equal(sc, np.eye(4, dtype=np.int64))
        assert np.all(pc % 4 == 0)

    def test_compile_conditional_symplectic(self):
        from pygsti_tpu.algorithms import compilers as cmp
        from pygsti_tpu.tools import symplectic as sym
        rng = np.random.RandomState(11)
        for n in (1, 2, 3):
            s, _ = sym.random_clifford(n, rand_state=rng)
            # check=True asserts rep(precircuit; circuit)[:, n:] == s[:, n:]
            circ, pre = cmp.compile_conditional_symplectic(
                s, qubit_labels=list(range(n)), calg='BGE', check=True,
                rand_state=rng)
            # precircuit must be CNOTs only
            for layer in pre.layertup:
                comps = layer.components if not layer.is_simple else (layer,)
                assert all(l.name == 'CNOT' for l in comps)

    def test_albert_factorization_transform(self):
        from pygsti_tpu.algorithms import compilers as cmp
        from pygsti_tpu.tools import matrixmod2 as mod2
        rng = np.random.RandomState(4)
        n = 3
        D = mod2.random_symmetric_invertable_matrix(n, rand_state=rng)
        s = np.zeros((2 * n, 2 * n), np.int64)
        s[:n, :n] = np.eye(n, dtype=np.int64)
        s[n:, n:] = D
        sout, cnots = cmp.find_albert_factorization_transform_using_cnots(
            s, 'row', 'LR', list(range(n)), rand_state=rng)
        M_T = sout[n:, n:]
        # quadrant mapped to M^T with D = M M^T
        assert np.array_equal((M_T.T @ M_T) % 2, D % 2)
        assert mod2.rank_mod2(M_T) == n
        assert all(l.name == 'CNOT' for l in cnots)


class TestSmallToolsSurface:
    def test_slicetools_group_basistools(self, ref_pygsti):
        import pygsti
        from pygsti_tpu.tools import slicetools, group, basistools as bt
        i, w1, w2 = slicetools.intersect_within(slice(2, 8), slice(5, 12))
        ri, rw1, rw2 = pygsti.tools.slicetools.intersect_within(
            slice(2, 8), slice(5, 12))
        assert (i, w1, w2) == (ri, rw1, rw2)
        assert group.is_integer(np.int32(3)) and not group.is_integer(2.5)
        rng = np.random.RandomState(0)
        m, B = rng.randn(5, 5), rng.randn(9, 9)
        assert np.allclose(bt.resize_mx(m, (2, 1), 'expand'),
                           np.asarray(pygsti.tools.resize_mx(m, (2, 1),
                                                             'expand')))
        assert np.allclose(bt.resize_mx(B, (2, 1), 'contract'),
                           np.asarray(pygsti.tools.resize_mx(B, (2, 1),
                                                             'contract')))

    def test_gram_rank_and_closest_unitary(self):
        from pygsti_tpu.algorithms import core
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.circuits import circuitconstruction as cc
        m = mp.target_model('full TP')
        preps, meass = list(mp.prep_fiducials()), list(mp.meas_fiducials())
        lgst_list = cc.create_lgst_circuits(preps, meass, m)
        ds = simulate_data(m, lgst_list, 1000, seed=2)
        rank, evals, tgt_evals = core.gram_rank_and_eigenvalues(
            ds, preps, meass, m)
        assert rank >= 4
        from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
        from pygsti_tpu.tools.optools import unitary_to_superop
        sup = np.real(unitary_to_superop(
            standard_gatename_unitaries()['Gxpi2'], 'pp'))
        noisy = np.diag([1, 0.95, 0.95, 0.95]) @ sup
        closest = core.find_closest_unitary_opmx(noisy)
        assert np.abs(closest - sup).max() < 1e-6

    def test_rbtheory_r_matrix(self):
        from pygsti_tpu.tools import rbtheory, group
        g = group.construct_1q_clifford_group()
        # depolarized Clifford model; group labels are ints, so map them to
        # model labels via group_to_model
        from pygsti_tpu.modelmembers.operations import FullArbitraryOp
        from pygsti_tpu.models.explicitmodel import ExplicitOpModel
        from pygsti_tpu.baseobjs.statespace import QubitSpace
        from pygsti_tpu.baseobjs.basis import Basis
        from pygsti_tpu.baseobjs.label import Label
        mdl = ExplicitOpModel(QubitSpace(1), Basis.cast('pp', 4))
        D = np.diag([1.0, 0.98, 0.98, 0.98])
        group_to_model = {}
        for i in range(len(g)):
            lbl = Label('Gc%d' % i, (0,))
            mdl.operations[lbl] = FullArbitraryOp(D @ g.matrix(i))
            group_to_model[g.labels[i]] = lbl
        p = rbtheory.R_matrix_predicted_rb_decay_parameter(
            mdl, g, group_to_model=group_to_model)
        assert abs(p - 0.98) < 5e-3, p

    def test_leakage_reportables(self):
        from pygsti_tpu.report import reportables as rpt
        # 3-level system in the leakage basis: inject leakage on level 2
        from pygsti_tpu.baseobjs.basis import Basis
        from pygsti_tpu.tools.basistools import change_basis
        udim = 3
        # unitary mixing |1> and |2> slightly -> leakage
        theta = 0.1
        U = np.eye(3, dtype=complex)
        U[1, 1] = U[2, 2] = np.cos(theta)
        U[1, 2] = -np.sin(theta)
        U[2, 1] = np.sin(theta)
        sup_std = np.kron(U, U.conj())
        op = np.real(change_basis(sup_std, 'std', 'l2p1'))
        # |1> leaks into |2> at rate sin^2(theta)
        rate = rpt.pergate_leakrate_max(op, None, 'l2p1')
        assert np.isclose(rate, np.sin(theta) ** 2, atol=1e-10), rate
        assert rpt.pergate_leakrate_min(op, None, 'l2p1') < 1e-10
        seep = rpt.pergate_seeprate(op, None, 'l2p1')
        assert np.isclose(seep, np.sin(theta) ** 2, atol=1e-10)
        # a non-leakage basis reports NaN
        b4 = Basis.cast('pp', 4)
        assert np.isnan(rpt.pergate_leakrate_max(np.eye(4), None, b4))
        # leaky entanglement infidelity of identity is ~0
        ident9 = np.eye(9)
        assert abs(rpt.leaky_entanglement_infidelity(
            ident9, ident9, 'l2p1')) < 1e-9

    def test_fpr_test_and_global(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.algorithms import fiducialpairreduction as fpr
        m = mp.target_model('full TP')
        preps = list(mp.prep_fiducials())
        meass = list(mp.meas_fiducials())
        germs = list(mp.germs())[:4]
        allpairs = [(i, j) for i in range(len(preps))
                    for j in range(len(meass))]
        n_all = fpr.test_fiducial_pairs(allpairs, m, preps, meass, germs)
        pg = fpr.find_sufficient_fiducial_pairs_per_germ_global(
            m, preps, meass, germs=germs)
        n_pg = fpr.test_fiducial_pairs(pg, m, preps, meass, germs)
        assert n_pg == n_all
        assert sum(len(v) for v in pg.values()) < len(allpairs) * len(germs)


class TestGermPowerCircuits:
    def test_random_germ_and_powers(self):
        from pygsti_tpu.processors.processorspec import QubitProcessorSpec
        from pygsti_tpu.algorithms import randomcircuit as rc
        pspec = QubitProcessorSpec(3, ['Gxpi2', 'Gypi2', 'Gcnot'],
                                   geometry='line')
        rng = np.random.RandomState(5)
        g = rc.create_random_germ(pspec, [4], 0.2, [0, 1, 2], rand_state=rng)
        assert len(g.layertup) >= 1
        circs, aux = rc.create_random_germpower_circuits(
            pspec, [4, 16], 0.2, [0, 1, 2], rand_state=rng)
        assert len(circs) == 2 and len(aux['germs']) == 2
        assert len(circs[1].layertup) >= len(circs[0].layertup)
        # fixed_versus_depth shares one germ
        circs2, aux2 = rc.create_random_germpower_circuits(
            pspec, [4, 8], 0.2, [0, 1, 2], fixed_versus_depth=True,
            rand_state=rng)
        assert aux2['germs'][0] == aux2['germs'][1]

    def test_germpower_mirror_circuits(self):
        from pygsti_tpu.processors.processorspec import QubitProcessorSpec
        from pygsti_tpu.algorithms import randomcircuit as rc
        pspec = QubitProcessorSpec(2, ['Gxpi2', 'Gypi2', 'Gcnot'],
                                   geometry='line')
        rng = np.random.RandomState(6)
        mcs, outs, aux = rc.create_random_germpower_mirror_circuits(
            pspec, None, [4], qubit_labels=(0, 1), rand_state=rng)
        assert len(mcs) == 1 and len(outs[0]) == 2
        assert set(outs[0]) <= {'0', '1'}


class TestErrgenNquditApi:
    def test_nqudit_duals_pair_to_one(self):
        from pygsti_tpu.tools import optools as ot
        from pygsti_tpu.baseobjs.basis import Basis
        b1 = Basis.cast('pp', 4)
        for typ, lbls in [('H', ('XY',)), ('S', ('ZZ',)),
                          ('C', ('XI', 'IZ')), ('A', ('XY', 'YX'))]:
            dual = ot.create_elementary_errorgen_nqudit_dual(typ, lbls, b1)
            prim = ot.create_elementary_errorgen_nqudit(typ, lbls, b1)
            assert np.isclose(np.real(np.vdot(dual, prim)), 1.0), typ
        bulk = ot.bulk_create_elementary_errorgen_nqudit(
            'H', [('XI',), ('IZ',)], b1)
        assert len(bulk) == 2

    def test_2q_projection_exact(self):
        from pygsti_tpu.tools import optools as ot
        from pygsti_tpu.tools import lindbladtools as lt
        from pygsti_tpu.tools.basistools import change_basis
        from pygsti_tpu.baseobjs.basisconstructors import pp_matrices
        from itertools import product
        pp2 = pp_matrices(16)
        lbls = ["".join(t) for t in product('IXYZ', repeat=2)]
        eg_std = 0.03 * lt.create_elementary_errorgen(
            'H', pp2[lbls.index('ZZ')]) + 0.01 * lt.create_elementary_errorgen(
            'S', pp2[lbls.index('XI')])
        eg_pp = np.real(change_basis(eg_std, 'std', 'pp'))
        h = ot.project_errorgen(eg_pp, 'H', 'pp', 'pp')
        s = ot.project_errorgen(eg_pp, 'S', 'pp', 'pp')
        hvals = {str(k.basis_element_labels[0]): v for k, v in h.items()
                 if abs(v) > 1e-9}
        svals = {str(k.basis_element_labels[0]): v for k, v in s.items()
                 if abs(v) > 1e-9}
        assert len(hvals) == 1 and np.isclose(list(hvals.values())[0], 0.03)
        assert len(svals) == 1 and np.isclose(list(svals.values())[0], 0.01)

    def test_misc_superop_helpers(self):
        from pygsti_tpu.tools import optools as ot
        t = ot.tensorized_with_eye(np.eye(4), 'pp')
        assert np.abs(np.asarray(t) - np.eye(16)).max() < 1e-9
        K = np.array([[0, 1], [1, 0]], complex)
        rc_ = ot.rootconj_superop(K, 'pp')
        assert np.isclose(np.real(rc_[3, 3]), -1)
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        m = mp.target_model('full TP').depolarize(op_noise=0.02)
        tgt = mp.target_model('full TP')
        proj = ot.project_to_target_eigenspace(m, tgt)
        assert set(str(k) for k in proj.operations) == \
            set(str(k) for k in tgt.operations)


class TestReviewRegressions:
    """Regressions for the round-3 code-review findings."""

    def test_compile_identity_symplectic(self):
        from pygsti_tpu.algorithms import compilers as cmp
        from pygsti_tpu.tools import symplectic as sym
        for n in (2, 3):
            c = cmp.compile_symplectic(np.eye(2 * n, dtype=np.int64))
            s_c, _ = sym.symplectic_rep_of_clifford_circuit(c) \
                if len(c.layertup) else (np.eye(2 * n, dtype=np.int64), None)
            assert s_c.shape == (2 * n, 2 * n)
        c = cmp.compile_cnot_circuit(np.eye(3, dtype=int))
        assert len(c.line_labels) == 3

    def test_dataset_copy_truncate_keep_auxinfo(self):
        from pygsti_tpu.data import DataSet
        from pygsti_tpu.circuits import Circuit
        ds = DataSet()
        c = Circuit(('Gxpi2',), (0,))
        ds.add_count_dict(c, {('0',): 5, ('1',): 5},
                          aux={'settings': {'a': 1}})
        ds2 = ds.copy()
        assert ds2.auxInfo[c].get('settings') == {'a': 1}
        ds3 = ds.truncate([c])
        assert ds3.auxInfo[c].get('settings') == {'a': 1}

    def test_fill_in_with_path_object(self, tmp_path):
        import pathlib
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.io.writers import (write_empty_protocol_data,
                                           fill_in_empty_dataset_with_fake_data)
        design = mp.create_gst_experiment_design(1)
        d = tmp_path / 'pd'
        write_empty_protocol_data(str(d), design)
        p = pathlib.Path(d) / 'data' / 'dataset.txt'
        model = mp.target_model('full TP')
        ds = fill_in_empty_dataset_with_fake_data(p, model, 100, seed=1)
        assert len(ds) == len(design.all_circuits_needing_data)
        # swapped order also works
        ds2 = fill_in_empty_dataset_with_fake_data(model, p, 100, seed=1)
        assert len(ds2) == len(ds)

    def test_idt_auto_affine_no_keyerror(self):
        """All-'auto' do_idle_tomography on data too sparse for the
        stochastic Jacobian must not crash."""
        from pygsti_tpu.extras import idletomography as idt
        from pygsti_tpu.data import DataSet
        from pygsti_tpu.circuits import Circuit
        prep_d = {'X': ('Gypi2',), 'Y': ('Gxpi2',) * 3, 'Z': (),
                  '-X': ('Gypi2',) * 3, '-Y': ('Gxpi2',), '-Z': ('Gxpi2',) * 2}
        meas_d = {'X': ('Gypi2',) * 3, 'Y': ('Gxpi2',), 'Z': (),
                  '-X': ('Gypi2',), '-Y': ('Gxpi2',) * 3, '-Z': ('Gxpi2',) * 2}
        max_lengths = [0, 1]
        # restrict fidpairs so the stochastic Jacobian is rank-deficient
        fps = idt.idle_tomography_fidpairs(1, maxweight=1)[:3]
        ds = DataSet()
        for prep, meas in fps:
            for L in max_lengths:
                c = prep.to_circuit(prep_d) \
                    + idt.idtcore._idle_circuit(((),), 1) * L \
                    + meas.to_circuit(meas_d)
                if c not in ds:
                    ds.add_count_dict(c, {('0',): 50, ('1',): 50})
        res = idt.do_idle_tomography(
            1, ds, max_lengths, (prep_d, meas_d), maxweight=1,
            advanced_options={'pauli_fidpairs': fps})
        assert isinstance(res.intrinsic_rates, dict)  # no KeyError


class TestMatrixtoolsExtras:
    """csr helpers, expm_multiply, OperatorLike, projector utilities
    (reference: tools/matrixtools.py)."""

    def test_csr_sum_and_flat(self):
        import scipy.sparse as sps
        import pygsti_tpu.tools.matrixtools as mt
        rng = np.random.RandomState(0)
        mats = [sps.random(6, 6, density=0.3, random_state=rng, format='csr')
                for _ in range(3)]
        coeffs = [1.5, -0.5, 2.0]
        ref = sum(c * m for c, m in zip(coeffs, mats))
        inds, indptr, cols, N = mt.csr_sum_indices(mats)
        data = np.zeros(len(cols), complex)
        mt.csr_sum(data, coeffs, mats, inds)
        assert abs(sps.csr_matrix((data, cols, indptr),
                                  shape=(N, N)) - ref).max() < 1e-12
        fd, fdata, nnzp, ip2, cols2, N2 = mt.csr_sum_flat_indices(mats)
        data2 = np.zeros(len(cols2), complex)
        mt.csr_sum_flat(data2, np.array(coeffs), fd, fdata, nnzp)
        assert abs(sps.csr_matrix((data2, cols2, ip2),
                                  shape=(N2, N2)) - ref).max() < 1e-12
        assert mt.csr_sum_indices([])[3] == 0

    def test_expm_multiply(self):
        import scipy.sparse as sps
        import scipy.linalg as spl
        import pygsti_tpu.tools.matrixtools as mt
        rng = np.random.RandomState(1)
        A = sps.random(8, 8, density=0.4, random_state=rng, format='csr')
        prep = mt.expm_multiply_prep(A)
        v = rng.randn(8)
        assert np.allclose(mt.expm_multiply_fast(prep, v),
                           spl.expm(A.toarray()) @ v)

    def test_operatorlike(self):
        import pygsti_tpu.tools.matrixtools as mt
        I = mt.to_operatorlike(None)
        x = np.random.randn(3, 3)
        assert I @ x is x and x @ I is x and I.T is I and I.conj() is I
        assert isinstance(np.eye(2), mt.OperatorLike)
        with pytest.raises(ValueError):
            mt.to_operatorlike(42)

    def test_projector_and_misc(self):
        import pygsti_tpu.tools.matrixtools as mt
        rng = np.random.RandomState(2)
        V = np.linalg.qr(rng.randn(5, 2))[0]
        assert np.allclose(mt.induced_projector(3.7 * V @ V.T), V @ V.T)
        with pytest.raises(ValueError):
            mt.induced_projector(rng.randn(4, 4))  # not hermitian
        M = np.linalg.qr(rng.randn(5, 3))[0] * np.array([2.0, 3.0, 0.5])
        assert np.allclose(
            mt.pinv_of_matrix_with_orthogonal_columns(M) @ M, np.eye(3))
        assert mt.complex_compare(1 + 2j, 1 + 3j) == -1
        assert mt.complex_compare(2 + 0j, 1 + 9j) == 1
        assert mt.complex_compare(1 + 1j, 1 + 1j) == 0
        assert abs(mt.jamiolkowski_angle(np.zeros((2, 2)))) < 1e-6
        s2 = 1 / np.sqrt(2)
        assert np.allclose(mt.zvals_int64_to_dense(1, 1), [s2, 0, 0, -s2])
        base = np.zeros(12)
        a = base.reshape(3, 4)
        assert mt.ndarray_base(a[1:, :2]) is base
        J = mt.pivot_indices_after_deflation(rng.randn(6, 2),
                                             rng.randn(6, 4))
        assert sorted(J) == [0, 1, 2, 3]

    def test_zero_commutant_connection(self):
        import scipy.linalg as spl
        import pygsti_tpu.tools.matrixtools as mt
        rng = np.random.RandomState(3)
        th = 0.3
        rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        G0 = np.kron(np.eye(2), rot)
        evals0, u0 = np.linalg.eig(G0)
        idx = np.argsort(evals0)
        evals0, u0 = evals0[idx], u0[:, idx]
        kite = mt.compute_kite(evals0)
        A = rng.randn(4, 4) * 0.05
        Q = spl.expm(A - A.T)
        G = Q @ G0 @ Q.T
        u = Q @ u0
        R = mt.find_zero_communtant_connection(
            u, np.linalg.inv(u), u0, np.linalg.inv(u0), kite)
        assert np.allclose(R @ G0 @ np.linalg.inv(R), G)
        r = mt.real_matrix_log(R)
        comm = u0 @ mt.project_onto_kite(np.linalg.inv(u0) @ r @ u0,
                                         kite) @ np.linalg.inv(u0)
        assert np.linalg.norm(comm) < 1e-8


class TestLeakageCoreAndMisc:
    def test_computational_subspace_machinery(self):
        from pygsti_tpu.baseobjs.basis import Basis
        from pygsti_tpu.leakage import core as lc
        bl = Basis.cast('l2p1', 9)
        E = lc.computational_effect(bl)
        assert np.allclose(E @ E, E) and round(np.trace(E).real) == 2
        U = lc.computational_superkets(bl)
        assert U.shape == (9, 4) and np.allclose(U.T @ U, np.eye(4))
        P = lc.computational_projector(bl)
        assert np.allclose(P @ P, P) and round(np.trace(P)) == 4
        assert np.allclose(
            lc.computational_superkets(Basis.cast('pp', 4)), np.eye(4))
        baug = lc.augment_for_leakage_modeling(Basis.cast('gm', 9),
                                               np.diag([1., 1., 0.]))
        assert baug.implies_leakage_modeling()
        assert list(baug.labels)[0] == 'C[I]' and \
            list(baug.labels)[-1] == 'L[I]'
        els = np.asarray(baug.elements)
        G = np.array([[np.vdot(a, b).real for b in els] for a in els])
        assert np.allclose(G, np.eye(9), atol=1e-8)

    def test_mpitools_serial(self):
        from pygsti_tpu.tools import mpitools as mpt
        li, own, lc_ = mpt.distribute_indices(list('abc'), None)
        assert li == list('abc') and lc_ is None
        assert mpt.slice_up_range(7, 3) == [slice(0, 3), slice(3, 5),
                                            slice(5, 7)]
        a, b = np.random.randn(4, 5), np.random.randn(5, 3)
        rs, cs, tups = mpt.distribute_for_dot(a.shape, b.shape, None)
        assert np.allclose(mpt.mpidot(a, b, rs, cs, tups, None), a @ b)
        assert mpt.parallel_apply(lambda x: x * 2, [1, 2], None) == [2, 4]
        assert mpt.processor_group_size(12, 5) == 12
        assert mpt.closest_divisor(12, 5) == 4
        s = mpt.build_slurm_script(job_name='t', nodes=2, ntasks_per_node=4,
                                   cpus_per_task=2, runner_path='r.py')
        assert '--nodes=2' in s and 'OMP_NUM_THREADS=2' in s

    def test_gauge_group_elements(self):
        from pygsti_tpu.models import gaugegroup as gg
        from pygsti_tpu.baseobjs.statespace import QubitSpace
        el = gg.FullGaugeGroupElement(np.diag([1., 2., 3., 4.]))
        assert np.allclose(el.inverse().transform_matrix,
                           np.diag([1, .5, 1 / 3, .25]))
        assert el.inverse().inverse() is el
        assert isinstance(gg.TrivialGaugeGroup(1).compute_element(
            np.empty(0)), gg.TrivialGaugeGroupElement)
        sub_u = gg.UnitaryGaugeGroup(QubitSpace(1), 'pp')
        ue = sub_u.compute_element(np.array([0.1, -0.2, 0.05, 0.3]))
        assert isinstance(ue, gg.UnitaryGaugeGroupElement)
        assert np.allclose(ue.unitary @ ue.unitary.conj().T, np.eye(2))
        dsg = gg.DirectSumUnitaryGroup((sub_u, gg.U1Group()), 'gm')
        assert dsg.num_params == 5
        el2 = dsg.compute_element(np.array([0.1, 0.2, -0.1, 0.05, 0.4]))
        S = el2.transform_matrix
        assert S.shape == (9, 9) and np.allclose(
            S @ el2.transform_matrix_inverse, np.eye(9))
        u = el2._unitary_total
        assert np.allclose(u @ u.conj().T, np.eye(3))
        assert abs(u[0, 2]) < 1e-12  # block structure preserved
        # interleaved partition: computational levels {0,2}
        el3 = gg.DirectSumUnitaryGroupElement(
            (sub_u.compute_element(np.ones(4) * 0.1),
             gg.U1GroupElement(0.2)), 'gm', level_partition=[(0, 2), (1,)])
        u3 = el3._unitary_total
        assert abs(u3[0, 1]) < 1e-12 and abs(u3[0, 2]) > 1e-6

    def test_scoring_rcl_and_gst_base(self):
        from pygsti_tpu.algorithms.scoring import (CompositeScore,
                                                   filter_composite_rcl)
        scores = [CompositeScore(-3, 5.0, 3), CompositeScore(-3, 9.0, 3),
                  CompositeScore(-1, 2.0, 1)]
        assert list(filter_composite_rcl(scores, 0.0)) == [0, 1]
        assert list(filter_composite_rcl(scores, 1.0)) == [0, 1, 2]
        import pygsti_tpu.drivers.longsequence as ls
        assert callable(ls.run_long_sequence_gst_base)


class TestReferenceNameSurface:
    """Aliases and small classes matching the reference's public names."""

    def test_protocol_aliases(self):
        import pygsti_tpu.protocols.gst as g
        import pygsti_tpu.protocols.rb as rb
        import pygsti_tpu.protocols.rpe as rpe
        assert g.GST is g.GateSetTomography
        assert g.GSTDesign is g.GateSetTomographyDesign
        assert g.LGST is g.LinearGateSetTomography
        assert rb.RB is rb.RandomizedBenchmarking
        assert rb.RBResults is rb.RandomizedBenchmarkingResults
        assert rpe.RPE is rpe.RobustPhaseEstimationProtocol
        from pygsti_tpu.protocols.estimate import CRFkey
        k = CRFkey('final iteration estimate', 'final')
        assert k == ('final iteration estimate', 'final')  # tuple interop

    def test_protocol_runner_machinery(self):
        from pygsti_tpu.protocols.protocol import (
            ProtocolRunner, DefaultRunner, CanCreateAllCircuitsDesign,
            DataSimulator, run_default_protocols, ProtocolData,
            ExperimentDesign, ProtocolResultsDir)
        assert issubclass(DefaultRunner, object)
        with pytest.raises(NotImplementedError):
            ProtocolRunner().run(None)
        with pytest.raises(NotImplementedError):
            DataSimulator().run(None)
        ed = ExperimentDesign([Circuit(('Gxpi2',), (0,))])
        from pygsti_tpu.data.dataset import DataSet
        ds = DataSet(outcome_labels=['0', '1'])
        ds.add_count_dict(Circuit(('Gxpi2',), (0,)), {'0': 50, '1': 50})
        ds.done_adding_data()
        out = run_default_protocols(ProtocolData(ed, ds))
        assert isinstance(out, ProtocolResultsDir)

    def test_label_variants(self):
        import pickle
        from pygsti_tpu.baseobjs.label import (
            CircuitLabel, LabelTupWithTime, LabelTupTupWithTime,
            LabelTupTupWithArgs, Label)
        l1 = Label('Gx', (0,))
        cl = CircuitLabel('box', (l1, l1), (0,), reps=3)
        assert cl.depth == 6 and cl.reps == 3
        assert len(cl.expand_subcircuits()) == 6
        assert pickle.loads(pickle.dumps(cl)) == cl
        lt = LabelTupWithTime.init('Gx', (0,), 1.5)
        assert lt.time == 1.5 and lt.name == 'Gx'
        ltt = LabelTupTupWithTime.init((l1,), 0.8)
        assert ltt.time == 0.8 and ltt.components == (l1,)
        la = LabelTupTupWithArgs.init((l1,), ('0.5',))
        assert la.args == ('0.5',) and la.components == (l1,)
        assert pickle.loads(pickle.dumps(la)) == la

    def test_basis_statespace_helpers(self):
        from pygsti_tpu.baseobjs.basis import (LazyBasis, Basis,
                                               default_basis_for_udims)
        from pygsti_tpu.baseobjs.statespace import (
            default_space_for_udim, default_space_for_num_qubits)
        assert default_basis_for_udims([2, 2]) == 'pp'
        assert default_basis_for_udims([3]) == 'gm'
        assert default_space_for_udim(4).num_qubits == 2
        assert default_space_for_udim(3).udim == 3
        assert default_space_for_num_qubits(2).udim == 4
        built = []
        lb = LazyBasis('lazy', lambda: built.append(1) or ['I'],
                       lambda: Basis.cast('pp', 4).elements[:1])
        assert not built
        assert lb.labels == ['I'] and built  # built lazily on access

    def test_smartcache_digest(self):
        from pygsti_tpu.baseobjs.smartcache import digest, CustomDigestError
        assert digest({'a': [1, 2], 'b': np.arange(3)}) == \
            digest({'b': np.arange(3), 'a': [1, 2]})
        assert digest('x') != digest('y')
        assert issubclass(CustomDigestError, Exception)

    def test_modelfn_factories(self):
        from pygsti_tpu.report.modelfunction import (
            opfn_factory, opsfn_factory, spamfn_factory, povmfn_factory)
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        model = mp.target_model()
        gl = list(model.operations.keys())[1]
        TraceFn = opfn_factory(lambda gate, basis: np.trace(gate))
        val = TraceFn(model, gl).evaluate(model)
        assert np.isclose(val,
                          np.trace(np.asarray(
                              model.operations[gl].to_dense())))
        DiffFn = opsfn_factory(lambda g1, g2, basis: np.linalg.norm(g1 - g2))
        assert np.isclose(DiffFn(model, model, gl).evaluate(model), 0.0)
        NumPrepsFn = spamfn_factory(lambda preps, povms: len(preps))
        assert NumPrepsFn(model).evaluate(model) == 1
        NPovm = povmfn_factory(lambda m: len(m.povms))
        assert NPovm(model).evaluate(model) == 1

    def test_objectivefn_surface(self):
        import pygsti_tpu.objectivefns.objectivefns as o
        assert o.MDCObjectiveFunction is o.TimeIndependentMDCObjectiveFunction
        assert o.ObjectiveFunction is o.RawObjectiveFunction
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data import simulate_data
        target = mp.target_model('full TP')
        circs = [Circuit(('Gxpi2',), (0,)), Circuit(('Gypi2',) * 2, (0,))]
        ds = simulate_data(target.depolarize(op_noise=0.05), circs, 400,
                           seed=9)
        f2 = o.Chi2Function(target, ds, circs)
        ref = o.ObjectiveFunctionBuilder('chi2').build(target, ds, circs)
        assert np.isclose(f2.fn(), ref.fn())
        store = o.ModelDatasetCircuitsStore(target, ds, circs)
        ev = o.EvaluatedModelDatasetCircuitsStore(store)
        assert ev.probs.shape[0] == ev.layout.num_elements

    def test_time_dependent_and_wildcard(self):
        import pygsti_tpu.objectivefns.objectivefns as o
        from pygsti_tpu.objectivefns.wildcardbudget import (
            PrimitiveOpsWildcardBudget, update_circuit_probs, WildcardBudget)
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data.dataset import DataSet
        target = mp.target_model('full TP')
        c = Circuit(('Gxpi2', 'Gxpi2'), (0,))
        tds = DataSet(outcome_labels=['0', '1'])
        tds.add_raw_series_data(c, ['0', '1', '0', '1'],
                                [0.0, 0.0, 1.0, 1.0], [40, 60, 55, 45])
        tds.done_adding_data()
        td = o.TimeDependentPoissonPicLogLFunction(target, tds, [c])
        assert td.num_elements == 4 and np.isfinite(td.fn())
        assert td.dterms().shape == (4, target.num_params)
        p = update_circuit_probs(np.array([0.7, 0.3]),
                                 np.array([0.5, 0.5]), 0.1)
        assert np.allclose(p, [0.6, 0.4])
        assert WildcardBudget is PrimitiveOpsWildcardBudget
        from pygsti_tpu.data import simulate_data
        circs = [c]
        ds = simulate_data(target.depolarize(op_noise=0.05), circs, 500,
                           seed=3)
        fl = o.PoissonPicDeltaLogLFunction(target, ds, circs)
        wb = PrimitiveOpsWildcardBudget(list(target.operations.keys()))
        wf = o.LogLWildcardFunction(fl, None, wb)
        assert np.isclose(wf.fn(np.zeros(wb.num_params)), fl.fn(),
                          rtol=1e-5)
        assert wf.fn(np.ones(wb.num_params)) <= wf.fn(
            np.zeros(wb.num_params)) + 1e-9

    def test_custom_leastsq_and_printer(self):
        from pygsti_tpu.optimize.customlm import custom_leastsq
        from pygsti_tpu.optimize.optimize import create_objfn_printer
        xs = np.linspace(0, 2, 20)
        ys = np.exp(-1.3 * xs)
        obj = lambda p: np.exp(-p[0] * xs) - ys
        jac = lambda p: (-xs * np.exp(-p[0] * xs)).reshape(-1, 1)
        out = custom_leastsq(obj, jac, np.array([0.5]))
        assert out[1] and abs(out[0][0] - 1.3) < 1e-5
        printer = create_objfn_printer(lambda x: float(np.sum(x ** 2)))
        printer(np.array([1.0, 2.0]))  # shouldn't raise

    def test_qudit_pspec_and_layout_alias(self):
        from pygsti_tpu.processors.processorspec import (ProcessorSpec,
                                                         QuditProcessorSpec)
        from pygsti_tpu.layouts.layout import (MapCOPALayout, COPALayout,
                                               CircuitOutcomeProbabilityLayout)
        assert MapCOPALayout is CircuitOutcomeProbabilityLayout
        q = QuditProcessorSpec(('Q0', 'Q1'), (3, 3), ['Gi'])
        assert q.udim == 9 and q.num_qudits == 2
        assert isinstance(q, ProcessorSpec)


class TestModelTextFormatAndMisc:
    def test_model_text_round_trip(self, tmp_path):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.io.writers import write_model
        from pygsti_tpu.io.stdinput import parse_model
        m = mp.target_model('full TP')
        fn = str(tmp_path / 'model.txt')
        write_model(m, fn, 'round trip test')
        m2 = parse_model(fn)
        for lbl in m.operations:
            assert np.allclose(np.asarray(m.operations[lbl].to_dense()),
                               np.asarray(m2.operations[lbl].to_dense()))
        assert np.allclose(np.asarray(m.preps['rho0'].to_dense()),
                           np.asarray(m2.preps['rho0'].to_dense()))
        assert np.allclose(np.asarray(m.povms['Mdefault'].to_dense()),
                           np.asarray(m2.povms['Mdefault'].to_dense()))

    def test_model_text_parses_reference_file(self, tmp_path, ref_pygsti):
        from pygsti.io.writers import write_model as ref_write
        from pygsti.modelpacks import smq1Q_XYI as ref_mp
        from pygsti_tpu.io.stdinput import parse_model
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        import warnings
        fn = str(tmp_path / 'refmodel.txt')
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            ref_write(ref_mp.target_model('full TP'), fn)
        ours = mp.target_model('full TP')
        parsed = parse_model(fn)
        for lbl in ours.operations:
            assert np.allclose(np.asarray(ours.operations[lbl].to_dense()),
                               np.asarray(parsed.operations[lbl].to_dense()),
                               atol=1e-7)

    def test_compressed_circuit(self):
        from pygsti_tpu.circuits.circuit import (CompressedCircuit,
                                                 SeparatePOVMCircuit,
                                                 validate_line_labels)
        c = Circuit(('Gxpi2', 'Gypi2') * 30 + ('Gxpi2',), (0,))
        cc = CompressedCircuit(c)
        assert len(cc._tup) < c.depth and cc.expand() == c
        short = Circuit(('Gxpi2',), (0,))
        assert CompressedCircuit(short).expand() == short
        sp = SeparatePOVMCircuit(short, 'Mdefault', ['0', '1'])
        assert sp.full_effect_labels == ('Mdefault_0', 'Mdefault_1')
        validate_line_labels([0, 1, 'Q2'])
        with pytest.raises(ValueError):
            validate_line_labels(['bad label!'])

    def test_lfh_errorgen_and_model(self):
        from pygsti_tpu.extras.lfh.lfherrorgen import LFHLindbladErrorgen
        from pygsti_tpu.extras.lfh.lfhmodel import LFHExplicitOpModel
        eg = LFHLindbladErrorgen([0.01, 0.0, 0.02], np.zeros(9),
                                 {'X': 0.005, 'Y': 0.005, 'Z': 0.005},
                                 rng=7)
        L0 = eg.to_dense()
        assert L0.shape == (4, 4) and len(eg.coefficients) == 12
        eg.sample_hamiltonian_rates()
        assert not np.allclose(L0, eg.to_dense())
        # pure H(Z) errorgen generates Z rotation structure in pp basis
        eg2 = LFHLindbladErrorgen([0, 0, 0.5], np.zeros(9),
                                  {'X': 0, 'Y': 0, 'Z': 0})
        L = eg2.to_dense()
        assert abs(L[0, 0]) < 1e-12 and abs(abs(L[1, 2]) - 1.0) < 1e-9

    def test_interpygate_quantities(self):
        from pygsti_tpu.extras.interpygate.core import (
            InterpolatedQuantityFactory, PhysicalProcess,
            PhysicalErrorGenerator, OpPhysicalProcess)
        fac = InterpolatedQuantityFactory(
            lambda x, y: np.array([x + y, x * y]), qty_shape=(2,),
            parameter_ranges=[(0, 1, 11), (0, 2, 11)])
        iq = fac.build()
        assert np.allclose(iq([0.35, 1.31]), [1.66, 0.4585], atol=0.02)
        with pytest.raises(ValueError):
            iq([2.0, 0.5])
        with pytest.raises(NotImplementedError):
            PhysicalProcess(1, (4, 4)).create_process_matrix([0.1])
        with pytest.raises(NotImplementedError):
            PhysicalErrorGenerator(1, (4, 4)).create_errorgen_matrix([0.1])

    def test_rpe_consistency_and_devcore(self):
        from pygsti_tpu.extras.rpe.rpetools import consistency_check
        assert consistency_check(0.1, 0.1, 4) == 1.0
        assert consistency_check(0.1 + 2 * np.pi, 0.1, 4) == 1.0
        assert consistency_check(1.0, 0.1, 8) == 0.0
        from pygsti_tpu.extras.devices.devcore import (
            basic_device_information, create_clifford_processor_spec)
        dev = basic_device_information('ibmq_bogota')
        assert len(dev.qubits) == 5
        pspec = create_clifford_processor_spec('ibmq_bogota',
                                               ['Gxpi2', 'Gypi2'])
        assert pspec.num_qubits == 5

    def test_transform_composed_and_layer_rules(self):
        from pygsti_tpu.models.explicitmodel import (ExplicitLayerRules,
                                                     transform_composed_model)
        from pygsti_tpu.models.cloudnoisemodel import CloudNoiseLayerRules
        from pygsti_tpu.models.gaugegroup import FullGaugeGroupElement
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        m = mp.target_model('full')
        S = np.eye(4)
        S[1, 1] = 0.9
        m2 = transform_composed_model(m, FullGaugeGroupElement(S))
        gl = list(m.operations.keys())[1]
        G = np.asarray(m.operations[gl].to_dense())
        G2 = np.asarray(m2.operations[gl].to_dense())
        assert np.allclose(G2, np.linalg.inv(S) @ G @ S) or \
            np.allclose(G2, S @ G @ np.linalg.inv(S))
        rules = ExplicitLayerRules()
        assert np.allclose(
            np.asarray(rules.operation_layer_operator(m, gl, {}).to_dense()),
            G)
        cr = CloudNoiseLayerRules('errorgens', (0, 1), 'add_global', None,
                                  None)
        assert cr.errcomp_type == 'errorgens'

    def test_mongodb_and_metadir_helpers(self, tmp_path):
        import pygsti_tpu.io.mongodb as m
        import pygsti_tpu.io.metadir as md

        class FakeColl:
            def __init__(self):
                self.docs = []

            def insert_one(self, doc, session=None):
                self.docs.append(dict(doc))

            def replace_one(self, q, doc, upsert=False, session=None):
                self.docs.append(dict(doc))

            def find(self, q):
                return [d for d in self.docs
                        if all(d.get(k) == v for k, v in q.items())]

            def delete_many(self, q, session=None):
                self.docs = [d for d in self.docs
                             if not all(d.get(k) == v for k, v in q.items())]

            def create_index(self, k):
                pass

        class FakeDB(dict):
            def __getitem__(self, k):
                return super().setdefault(k, FakeColl())

        db = FakeDB()
        m.write_dict_to_mongodb({'x': [1, 2], 'y': 's'}, db, 'col', 'p1')
        assert m.read_dict_from_mongodb(db, 'col', 'p1') == \
            {'x': [1, 2], 'y': 's'}
        m.remove_dict_from_mongodb(db, 'col', 'p1')
        assert m.read_dict_from_mongodb(db, 'col', 'p1') == {}
        m.create_mongodb_indices_for_pygsti_collections(db)
        import os
        d = str(tmp_path / 'jsonpkl')
        md.write_dict_to_json_or_pkl_files({'a': [1, 2], 'b': object()}, d)
        assert sorted(os.listdir(d)) == ['a.json', 'b.pkl']
