"""Tests for germ and fiducial selection."""

import numpy as np
import pytest

from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.algorithms.fiducialselection import (find_fiducials,
                                                     compute_composite_fiducial_score)
from pygsti_tpu.algorithms.fiducialselection import test_fiducial_list as check_fiducial_list
from pygsti_tpu.algorithms.germselection import (find_germs,
                                                 compute_composite_germ_set_score)
from pygsti_tpu.algorithms.germselection import test_germs_list_completeness as check_germs_completeness


class TestFiducialSelection:
    def test_standard_fiducials_are_complete(self):
        model = mp.target_model('full TP')
        assert check_fiducial_list(model, mp.prep_fiducials(), 'prep')
        assert check_fiducial_list(model, mp.meas_fiducials(), 'meas')

    def test_incomplete_set_detected(self):
        model = mp.target_model('full TP')
        assert not check_fiducial_list(model, mp.prep_fiducials()[:2], 'prep')

    def test_find_fiducials(self):
        model = mp.target_model('full TP')
        prep, meas = find_fiducials(model, candidate_fid_counts=3, verbosity=0)
        assert check_fiducial_list(model, prep, 'prep')
        assert check_fiducial_list(model, meas, 'meas')
        assert len(prep) <= 8


class TestGermSelection:
    def test_standard_germs_beat_singletons(self):
        """The standard XYI germ set amplifies strictly more directions than
        the single-gate germs alone."""
        from pygsti_tpu.circuits import Circuit
        from pygsti_tpu.algorithms.germselection import (
            compute_composite_germ_set_score, _nongauge_projector)
        model = mp.target_model('full TP').rotate(max_rotate=0.01, seed=0)
        proj = _nongauge_projector(model)
        singles = [Circuit((l,), (0,)) for l in model.operations.keys()]
        _, n_single, _ = compute_composite_germ_set_score(model, singles,
                                                          non_gauge_projector=proj)
        _, n_std, _ = compute_composite_germ_set_score(model, mp.germs(),
                                                       non_gauge_projector=proj)
        assert n_std > n_single

    def test_find_germs(self):
        """find_germs reaches the saturation amplification count."""
        from pygsti_tpu.algorithms.germselection import (
            compute_composite_germ_set_score, _nongauge_projector,
            max_amplified_directions)
        model = mp.target_model('full TP')
        germs = find_germs(model, randomize=True, randomization_strength=0.01,
                           seed=1, candidate_germ_counts={3: 'all upto'},
                           verbosity=0)
        check_model = mp.target_model('full TP').rotate(max_rotate=0.01, seed=1)
        proj = _nongauge_projector(check_model)
        n_max = max_amplified_directions(check_model, non_gauge_projector=proj)
        _, n_amp, _ = compute_composite_germ_set_score(check_model, germs,
                                                       non_gauge_projector=proj)
        assert n_amp >= n_max - 2, (n_amp, n_max)


class TestFiducialPairReduction:
    def test_per_germ_reduction(self):
        """Reduced pairs per germ are fewer than all pairs, and GST circuit
        lists built with them still fit well."""
        from pygsti_tpu.algorithms.fiducialpairreduction import (
            find_sufficient_fiducial_pairs_per_germ)
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.algorithms.core import run_iterative_gst, run_lgst
        from pygsti_tpu.objectivefns import two_delta_logl

        target = mp.target_model('full TP')
        pairs = find_sufficient_fiducial_pairs_per_germ(
            target, mp.prep_fiducials(), mp.meas_fiducials(), mp.germs(), seed=0)
        total_all = len(mp.prep_fiducials()) * len(mp.meas_fiducials())
        assert all(0 < len(p) < total_all for p in pairs.values())

        lists = create_lsgst_circuit_lists(target, mp.prep_fiducials(),
                                           mp.meas_fiducials(), mp.germs(),
                                           [1, 2, 4], fid_pairs=pairs)
        full_lists = create_lsgst_circuit_lists(target, mp.prep_fiducials(),
                                                mp.meas_fiducials(), mp.germs(),
                                                [1, 2, 4])
        assert len(lists[-1]) < len(full_lists[-1])

        datagen = mp.target_model('full TP').depolarize(op_noise=0.03)
        ds = simulate_data(datagen, lists[-1], 1000, seed=6)
        seed_mdl = run_lgst(ds, mp.prep_fiducials(), mp.meas_fiducials(), target)
        models, _ = run_iterative_gst(ds, seed_mdl, lists, None, ['chi2'], ['logl'])
        tdl = two_delta_logl(models[-1], ds, list(lists[-1]))
        k = ds.degrees_of_freedom(list(lists[-1])) - models[-1].num_params
        assert (tdl - k) / np.sqrt(2 * max(k, 1)) < 5


class TestGraspGermSearch:
    def test_grasp_finds_complete_smaller_set(self):
        """GRASP germ search yields a complete set no larger than greedy's
        (reference: grasp.py:275 + germselection GRASP mode)."""
        import numpy as np
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.algorithms.germselection import find_germs
        g_grasp = find_germs(mp.target_model('full'), seed=4,
                             algorithm='grasp',
                             candidate_germ_counts={3: 'all upto'},
                             verbosity=0)
        g_greedy = find_germs(mp.target_model('full'), seed=4,
                              algorithm='greedy',
                              candidate_germ_counts={3: 'all upto'},
                              verbosity=0)
        assert len(g_grasp) <= len(g_greedy)
        assert len(g_grasp) >= 3


class TestSelectionVariants:
    """New algorithm modes: slack / GRASP searches, compactEVD scoring,
    gate penalties, FPR greedy and per-germ-power variants
    (reference: fiducialselection.py:29, fiducialpairreduction.py:511,668,
    germselection.py:59)."""

    def _model(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        return mp.target_model('full TP')

    def test_find_fiducials_slack(self):
        model = self._model()
        prep, meas = find_fiducials(model, candidate_fid_counts=3,
                                    algorithm='slack',
                                    algorithm_kwargs={'slack_frac': 0.2},
                                    verbosity=0)
        from pygsti_tpu.algorithms.fiducialselection import test_fiducial_list
        assert test_fiducial_list(model, prep, 'prep')
        assert test_fiducial_list(model, meas, 'meas')

    def test_find_fiducials_grasp(self):
        model = self._model()
        prep, meas = find_fiducials(model, candidate_fid_counts=2,
                                    algorithm='grasp',
                                    algorithm_kwargs={'iterations': 2,
                                                      'seed': 4},
                                    verbosity=0)
        from pygsti_tpu.algorithms.fiducialselection import test_fiducial_list
        assert test_fiducial_list(model, prep, 'prep')
        assert test_fiducial_list(model, meas, 'meas')

    def test_find_germs_slack_and_compactevd(self):
        from pygsti_tpu.algorithms.germselection import (
            find_germs, compute_composite_germ_set_score)
        model = self._model()
        germs = find_germs(model, randomize=True, randomization_strength=0.01,
                           seed=2, candidate_germ_counts={2: 'all upto'},
                           algorithm='slack', fixed_slack=0.5,
                           mode='compactEVD', verbosity=0)
        # selected set must amplify the same directions as the full
        # length-<=2 candidate pool it was drawn from
        rmodel = model.rotate(max_rotate=0.01, seed=2)
        import itertools
        from pygsti_tpu.circuits.circuit import Circuit
        ops = list(model.operations.keys())
        pool = [Circuit(c, model.state_space.qubit_labels)
                for L in (1, 2) for c in itertools.product(ops, repeat=L)]
        _, n_pool, _ = compute_composite_germ_set_score(rmodel, pool)
        _, n_sel, _ = compute_composite_germ_set_score(rmodel, germs)
        assert n_sel >= n_pool
        assert len(germs) < len(pool)  # slack actually removed germs

    def test_germ_gate_penalty_prefers_short_germs(self):
        from pygsti_tpu.algorithms.germselection import find_germs
        model = self._model()
        short = find_germs(model, randomize=True, randomization_strength=0.01,
                           seed=2, candidate_germ_counts={2: 'all upto'},
                           op_penalty=1.0, verbosity=0)
        assert all(len(g.layertup) <= 2 for g in short)

    def test_fpr_per_germ_greedy(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.algorithms.fiducialpairreduction import (
            find_sufficient_fiducial_pairs_per_germ_greedy)
        model = self._model()
        germs = mp.germs()[:3]
        pairs = find_sufficient_fiducial_pairs_per_germ_greedy(
            model, mp.prep_fiducials(), mp.meas_fiducials(), germs,
            inv_trace_tol=10.0, seed=7, verbosity=0)
        n_full = len(mp.prep_fiducials()) * len(mp.meas_fiducials())
        for germ, plist in pairs.items():
            assert 0 < len(plist) <= n_full

    def test_fpr_per_germ_power(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.algorithms.fiducialpairreduction import (
            find_sufficient_fiducial_pairs_per_germ_power)
        model = self._model()
        germs = mp.germs()[:2]
        pairs = find_sufficient_fiducial_pairs_per_germ_power(
            model, mp.prep_fiducials(), mp.meas_fiducials(), germs,
            max_lengths=[1, 2], seed=7, verbosity=0)
        assert set(pairs.keys()) == {(g, L) for g in germs for L in (1, 2)}
        for plist in pairs.values():
            assert len(plist) >= 1


class TestGermSelectionReferenceEntryPoints:
    """find_germs_* standalone entry points + germ-set test functions
    (reference: germselection.py)."""

    def _setup(self):
        import itertools
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        import pygsti_tpu.algorithms.germselection as gs
        from pygsti_tpu.circuits import Circuit
        model = mp.target_model('full TP')
        rmodel = gs.randomize_model_list([model], 1e-2, 1, seed=4)[0]
        lls = model.state_space.qubit_labels
        ops = list(model.operations.keys())
        cands = [Circuit(c, lls) for L in (1, 2, 3)
                 for c in itertools.product(ops, repeat=L)]
        return gs, rmodel, cands, mp

    def test_breadthfirst_and_depthfirst(self):
        gs, rmodel, cands, mp = self._setup()
        g_bf = gs.find_germs_breadthfirst(rmodel, cands, threshold=1e8)
        assert gs.test_germ_set_infl(rmodel, g_bf)
        g_df = gs.find_germs_depthfirst(rmodel, cands, threshold=1e8)
        assert gs.test_germ_set_infl(rmodel, g_df)

    def test_grasp_and_slack(self):
        gs, rmodel, cands, mp = self._setup()
        g_gr = gs.find_germs_grasp(rmodel, cands, iterations=2, seed=1,
                                   threshold=1e8)
        assert gs.test_germ_set_infl(rmodel, g_gr)
        g_sl = gs.find_germs_integer_slack(rmodel, cands, slack_frac=0.2)
        assert gs.test_germ_set_infl(rmodel, g_sl)

    def test_germ_set_tests(self):
        gs, rmodel, cands, mp = self._setup()
        pack = list(mp.germs())
        assert gs.test_germ_set_infl(rmodel, pack)
        assert gs.test_germ_set_finitel(rmodel, pack, 16)
        assert not gs.test_germ_set_infl(rmodel, [cands[0]])
        ok, spectrum = gs.test_germ_set_finitel(rmodel, pack, 16,
                                                return_spectrum=True)
        assert ok and len(spectrum) == rmodel.num_params

    def test_score_cache_and_drop(self):
        gs, rmodel, cands, mp = self._setup()
        sc = gs.compute_germ_set_score(list(mp.germs()), target_model=rmodel,
                                       neighborhood_size=2, seed=1)
        assert np.isfinite(sc)
        cache = gs.create_circuit_cache(rmodel, cands[:12])
        c2, cache2 = gs.clean_germ_list(rmodel, cache)
        assert len(c2) <= 12 and set(cache2) == set(c2)
        dropped = gs.drop_random_germs(cands, 0.5, rmodel, seed=2)
        assert len(dropped) < len(cands)
        # bare singletons survive
        from pygsti_tpu.circuits import Circuit
        lls = rmodel.state_space.qubit_labels
        for gl in rmodel.operations.keys():
            assert Circuit((gl,), lls) in dropped


class TestCompactEvdMachinery:
    """Low-rank update machinery for greedy selection (reference:
    germselection.py:3255-5230)."""

    def test_spectrum_and_trace_updates(self):
        from pygsti_tpu.algorithms import germselection as gs
        rng = np.random.RandomState(0)
        P = 16
        B = rng.randn(P, 6)
        M = B @ B.T
        cache = gs.construct_update_cache(M)
        A = rng.randn(P, 2)
        new_e, flag = gs.symmetric_low_rank_spectrum_update(A, *cache)
        assert flag
        direct = np.linalg.eigvalsh(M + A @ A.T)
        assert np.allclose(np.sort(new_e[np.abs(new_e) > 1e-9]),
                           np.sort(direct[np.abs(direct) > 1e-9]))
        # in-space update: no rank increase
        assert gs.symmetric_low_rank_spectrum_update(
            B @ rng.randn(6, 2), *cache) == (None, False)
        # minamide trace matches direct pinv trace in both regimes
        tr, rank, inc = gs.minamide_style_inverse_trace(A, *cache)
        assert inc and rank == 8
        assert np.isclose(tr, np.trace(np.linalg.pinv(M + A @ A.T)))
        A_in = B @ rng.randn(6, 2)
        tr2, rank2, inc2 = gs.minamide_style_inverse_trace(A_in, *cache)
        assert not inc2 and rank2 == 6
        assert np.isclose(tr2, np.trace(np.linalg.pinv(M + A_in @ A_in.T)))
        assert gs.minamide_style_inverse_trace(
            A_in, *cache, force_rank_increase=True) == (None, None, False)

    def test_rank_one_updates(self):
        from pygsti_tpu.algorithms import germselection as gs
        rng = np.random.RandomState(1)
        B = rng.randn(12, 5)
        M = B @ B.T
        c = gs.construct_update_cache_rank_one(M)
        v = rng.randn(12, 1)
        tr, inc = gs.rank_one_inverse_trace_update(v, c[0], c[1], c[2])
        assert inc
        assert np.isclose(tr, np.trace(np.linalg.pinv(M + v @ v.T)))
        pinv_new, inc2 = gs.rank_one_psuedoinverse_update(v, c[0], c[1])
        assert inc2 and np.allclose(pinv_new, np.linalg.pinv(M + v @ v.T))
        # chained cache equals from-scratch cache
        c2 = gs.construct_update_cache_rank_one(
            M + v @ v.T, prev_update_cache=c, rank_one_update=v)
        c2d = gs.construct_update_cache_rank_one(M + v @ v.T)
        assert np.allclose(c2[0], c2d[0], atol=1e-8) and c2[3] == c2d[3]

    def test_misc_helpers(self):
        from pygsti_tpu.algorithms import germselection as gs
        rng = np.random.RandomState(2)
        X = rng.randn(6, 4)
        assert np.allclose(gs.stable_pinv(X), np.linalg.pinv(X))
        a, b = rng.randn(3, 2), rng.randn(4, 5)
        assert np.allclose(gs.fast_kron(a, b), np.kron(a, b))
        B = rng.randn(10, 4)
        e, U = gs.compact_EVD(B @ B.T, assume_hermitian=True)
        assert len(e) == 4 and np.allclose(U @ np.diag(e) @ U.T, B @ B.T)
        e2, U2 = gs.compact_EVD_via_SVD(B.T)
        assert np.allclose(U2 @ np.diag(e2) @ U2.conj().T, B @ B.T)

    def test_germ_set_spanning_vectors(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.algorithms import germselection as gs
        model = mp.target_model('full TP')
        germs = list(mp.germs())
        nongauge = gs._resolve_nongauge(None, model)
        vec_dict, DDD = gs.germ_set_spanning_vectors(model, germs,
                                                     verbosity=0)
        n_sel = sum(len(v) for v in vec_dict.values())
        evals = np.flip(np.linalg.eigvalsh(DDD))
        assert n_sel == nongauge
        assert int(np.count_nonzero(evals > 1e-7)) == nongauge
        # RRQR mode achieves the same rank
        _, DDD2 = gs.germ_set_spanning_vectors(model, germs, verbosity=0,
                                               mode='RRQR')
        assert int(np.count_nonzero(
            np.flip(np.linalg.eigvalsh(DDD2)) > 1e-7)) == nongauge

    def test_fiducial_caches_and_cleaning(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.algorithms import fiducialselection as fs
        model = mp.target_model()
        cands = fs.create_candidate_fiducial_list(model,
                                                  candidate_fid_counts=3)
        cache = fs.create_circuit_cache(model, cands)
        cleaned, cache2 = fs.clean_fid_list(model, cache, cands)
        assert 0 < len(cleaned) <= len(cands)
        # deduped: all remaining PTMs pairwise distinct
        keys = list(cache2.keys())
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                assert np.linalg.norm(cache2[keys[i]]
                                      - cache2[keys[j]]) > 1e-6
        pc, rho_keys = fs.create_prep_cache(model, cleaned, cache2)
        assert len(rho_keys) == 1 and len(pc) == len(cleaned)
        mc, pairs = fs.create_meas_cache(model, cleaned, cache2)
        assert len(pairs) == 2 and len(mc) == 2 * len(cleaned)
        sq = fs.construct_compact_evd_cache(model, cleaned[:3], 'prep', pc)
        f0 = cleaned[0]
        fm = np.concatenate(fs.create_prep_mxs(model, [f0], pc), axis=1)
        assert np.allclose(sq[f0] @ sq[f0].conj().T, fm @ fm.conj().T)
        mx = fs.build_bitvec_mx(5, 2)
        assert mx.shape == (10, 5) and (mx.sum(axis=1) == 2).all()
        assert fs.xor(True, False) and not fs.xor(True, True)
        assert fs.add_penalties_greedy(1.0, cleaned[:2],
                                       l1_penalty=0.5) == 2.0
