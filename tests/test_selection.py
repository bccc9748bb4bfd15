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
