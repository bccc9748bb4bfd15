"""Depth tests for the drift/stability machinery: test condensing,
inclass corrections (Bonferroni + Benjamini-Hochberg), named detectors,
characterization (filter/mle), TVD bounds -- plus a reference-oracle parity
test that the same synthetic drifting dataset produces the same detections
as the reference's StabilityAnalyzer."""

import numpy as np
import pytest

from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.data.dataset import DataSet
from pygsti_tpu.extras.drift import stabilityanalyzer as sa


@pytest.fixture(scope="module", autouse=True)
def _stub_plotly():
    """The reference's drift package imports plotly at module scope; stub
    it so the oracle imports in this image (plotly is not installed)."""
    import sys
    import types
    if 'plotly' in sys.modules:
        yield
        return
    plotly = types.ModuleType('plotly')
    graph_objs = types.ModuleType('plotly.graph_objs')
    graph_objs.__getattr__ = lambda name: type(name, (), {})
    tools = types.ModuleType('plotly.tools')
    plotly.graph_objs = graph_objs
    plotly.tools = tools
    sys.modules['plotly'] = plotly
    sys.modules['plotly.graph_objs'] = graph_objs
    sys.modules['plotly.tools'] = tools
    yield
    for m in ('plotly', 'plotly.graph_objs', 'plotly.tools'):
        sys.modules.pop(m, None)


def make_drifting_dataset(n_circuits=4, T=500, f_drift=6, amp=0.2,
                          drifting=(0,), seed=11, timestep=1.0):
    """DataSet where circuits in `drifting` have a cosine probability
    drift and the rest are stable."""
    rng = np.random.RandomState(seed)
    ds = DataSet()
    t = np.arange(T)
    for i in range(n_circuits):
        p = np.full(T, 0.5)
        if i in drifting:
            p = 0.5 + amp * np.cos(np.pi * f_drift * (t + 0.5) / T)
        bits = rng.binomial(1, p)
        ds.add_raw_series_data(Circuit([('Gxpi2', 0)] * (i + 1), (0,)),
                               ['1' if b else '0' for b in bits],
                               (timestep * t).tolist())
    return ds


class TestTestSpecMachinery:
    def test_condense_tests_matches_reference(self, ref_pygsti):
        ref_sa = __import__('pygsti.extras.drift.stabilityanalyzer',
                            fromlist=['x'])
        for shape in [(1, 5, 2), (2, 5, 2), (1, 1, 2), (1, 5, 4)]:
            for tests in [((), ('dataset',), ('dataset', 'circuit')),
                          (('circuit',), ('circuit', 'outcome')),
                          (('dataset', 'circuit', 'outcome'),)]:
                ours, _ = sa.condense_tests(shape, tests)
                theirs, _ = ref_sa.condense_tests(shape, tests)
                assert ours == theirs, (shape, tests)
                w = {t: 1.0 / len(tests) for t in tests}
                ours_c, ours_w = sa.condense_tests(shape, tests, w)
                theirs_c, theirs_w = ref_sa.condense_tests(shape, tests, w)
                assert ours_w == theirs_w

    def test_auto_tests_match_reference(self, ref_pygsti):
        ref_sa = __import__('pygsti.extras.drift.stabilityanalyzer',
                            fromlist=['x'])
        for shape in [(1, 5, 2), (2, 5, 2), (3, 1, 2)]:
            for ids in (False, True):
                assert tuple(sa.compute_auto_tests(shape, ids)) == \
                    tuple(ref_sa.compute_auto_tests(shape, ids))

    def test_populate_inclass_correction_matches_reference(self, ref_pygsti):
        ref_sa = __import__('pygsti.extras.drift.stabilityanalyzer',
                            fromlist=['x'])
        for partial in [None, {'circuit': 'Benjamini-Hochberg'},
                        {'spectrum': 'Benjamini-Hochberg'}]:
            ours = sa.populate_inclass_correction(
                dict(partial) if partial else None)
            theirs = ref_sa.populate_inclass_correction(
                dict(partial) if partial else None)
            assert ours == theirs

    def test_invalid_corrections_rejected(self):
        with pytest.raises(AssertionError):
            sa.populate_inclass_correction(
                {'dataset': 'Benjamini-Hochberg', 'spectrum': 'Bonferroni'})


class TestDetectionDepth:
    def test_bonferroni_detects_planted_drift(self):
        ds = make_drifting_dataset(drifting=(0, 1))
        an = sa.StabilityAnalyzer(ds)
        an.compute_spectra()
        an.run_instability_detection()
        assert an.instability_detected
        circuits = list(ds.keys())
        assert circuits[0] in an.unstable_circuits()
        assert circuits[1] in an.unstable_circuits()

    def test_benjamini_hochberg_detector(self):
        ds = make_drifting_dataset(drifting=(0,))
        an = sa.StabilityAnalyzer(ds)
        an.compute_spectra()
        an.run_instability_detection(
            inclass_correction={'spectrum': 'Benjamini-Hochberg'},
            saveas='bh')
        assert an.instability_detected
        c0 = list(ds.keys())[0]
        inds = an.instability_indices({'circuit': c0}, detectorkey='bh')
        assert 6 in inds, inds
        # BH is no less powerful than Bonferroni: every Bonferroni
        # detection is also a BH detection
        an.run_instability_detection(saveas='bonf', default=False)
        bonf = an.instability_indices({'circuit': c0}, detectorkey='bonf')
        assert set(bonf) <= set(inds)

    def test_named_detectors_and_thresholds(self):
        ds = make_drifting_dataset()
        an = sa.StabilityAnalyzer(ds)
        an.compute_spectra()
        an.run_instability_detection(saveas='a')
        an.run_instability_detection(significance=0.01, saveas='b',
                                     default=False)
        assert an._def_detection == 'a'
        assert abs(an.statistical_significance('a') - 0.05) < 1e-12
        assert abs(an.statistical_significance('b') - 0.01) < 1e-12
        # per-circuit power threshold is a scalar for Bonferroni
        th = an.power_threshold(('circuit',), detectorkey='a')
        assert th > 1.0
        pv = an.pvalue_threshold(('circuit',), detectorkey='a')
        assert 0 < pv < 0.05
        # stricter significance -> higher threshold
        assert an.power_threshold(('circuit',), detectorkey='b') > th

    def test_maximum_power_pvalue(self):
        ds = make_drifting_dataset(drifting=(0,))
        an = sa.StabilityAnalyzer(ds)
        an.compute_spectra()
        c0 = list(ds.keys())[0]
        p_drifting = an.maximum_power_pvalue({'circuit': c0})
        p_stable = an.maximum_power_pvalue({'circuit': list(ds.keys())[2]})
        assert p_drifting < 1e-4
        assert p_stable > 1e-3
        assert p_drifting < p_stable


class TestCharacterization:
    def test_filter_and_mle_estimates(self):
        ds = make_drifting_dataset(drifting=(0,), amp=0.25)
        an = sa.StabilityAnalyzer(ds)
        an.compute_spectra()
        an.run_instability_detection()
        an.run_instability_characterization(estimator='mle')
        c0, c1 = list(ds.keys())[:2]
        ptraj = an.probability_trajectory_model(c0, estimator='filter')
        times = np.arange(500, dtype=float)
        probs = ptraj.probabilities(times)
        # the filter estimate tracks the planted cosine
        truth = 0.5 + 0.25 * np.cos(np.pi * 6 * (times + 0.5) / 500)
        err = np.abs(probs[('1',)] - truth).mean()
        assert err < 0.05, err
        # mle estimate exists and is at least as good in logL terms
        mle = an.probability_trajectory_model(c0, estimator='mle')
        assert mle is not ptraj
        # a stable circuit gets (close to) the null trajectory
        stable = an.probability_trajectory_model(c1)
        p_stable = stable.probabilities(times)[('1',)]
        assert np.std(p_stable) < 0.05

    def test_tvd_bounds(self):
        ds = make_drifting_dataset(drifting=(0,), amp=0.25)
        an = sa.StabilityAnalyzer(ds)
        an.compute_spectra()
        an.run_instability_detection()
        an.run_instability_characterization()
        c0 = list(ds.keys())[0]
        maxtvd = an.maximum_tvd_bound(c0)
        # planted drift: p oscillates +-0.25 around the mean, so the max
        # TVD is ~0.25; the bound should be in that ballpark and >= 0.1
        assert 0.1 < maxtvd < 0.6, maxtvd
        assert an.maxmax_tvd_bound() >= maxtvd - 1e-12


class TestReferenceOracle:
    @pytest.mark.slow
    def test_detections_match_reference(self, ref_pygsti):
        """Same synthetic drifting dataset -> same per-circuit detected
        drift frequencies as the reference's StabilityAnalyzer."""
        T, f_drift = 500, 6
        rng = np.random.RandomState(11)
        t = np.arange(T)
        streams = []
        for i in range(4):
            p = np.full(T, 0.5)
            if i == 0:
                p = 0.5 + 0.2 * np.cos(np.pi * f_drift * (t + 0.5) / T)
            streams.append(rng.binomial(1, p))

        ds = DataSet()
        ref_ds = ref_pygsti.data.DataSet()
        for i, bits in enumerate(streams):
            ours_c = Circuit([('Gxpi2', 0)] * (i + 1), (0,))
            ref_c = ref_pygsti.circuits.Circuit(
                [('Gxpi2', 0)] * (i + 1), (0,))
            labels = ['1' if b else '0' for b in bits]
            ds.add_raw_series_data(ours_c, labels, t.astype(float).tolist())
            ref_ds.add_raw_series_data(ref_c, labels,
                                       t.astype(float).tolist())

        an = sa.StabilityAnalyzer(ds)
        an.compute_spectra()
        an.run_instability_detection()

        ref_an = ref_pygsti.extras.drift.StabilityAnalyzer(ref_ds)
        ref_an.compute_spectra()
        ref_an.run_instability_detection(0.05, verbosity=0)

        assert an.instability_detected == \
            ref_an.instability_detected()
        ours_inds = an.instability_indices(
            {'circuit': list(ds.keys())[0]})
        ref_inds = ref_an.instability_indices(
            {'circuit': list(ref_ds.keys())[0]})
        assert set(ours_inds) == set(ref_inds), (ours_inds, ref_inds)
        # the planted mode is among them
        assert f_drift in set(ours_inds)
        # stable circuits are clean in both
        assert an.instability_indices(
            {'circuit': list(ds.keys())[2]}) == ()
        assert tuple(ref_an.instability_indices(
            {'circuit': list(ref_ds.keys())[2]})) == ()


class TestAnalyzerAuxSurface:
    """dof_reduction / same_frequencies / averaging_allowed /
    unstable_circuits options (reference: stabilityanalyzer.py:602-770,
    1357)."""

    def _drifting_analyzer(self):
        from pygsti_tpu.extras.drift.stabilityanalyzer import StabilityAnalyzer
        from pygsti_tpu.data import DataSet
        from pygsti_tpu.circuits import Circuit
        rng = np.random.RandomState(0)
        T = 128
        times = np.arange(T, dtype=float)
        ds = DataSet()
        c_drift = Circuit('Gxpi2:0@(0)')
        p = 0.5 + 0.35 * np.cos(2 * np.pi * 5 * times / T)
        outcomes = [('1',) if rng.rand() < pi else ('0',) for pi in p]
        ds.add_raw_series_data(c_drift, outcomes, times)
        c_stable = Circuit('Gypi2:0@(0)')
        outcomes = [('1',) if rng.rand() < 0.5 else ('0',) for _ in times]
        ds.add_raw_series_data(c_stable, outcomes, times)
        an = StabilityAnalyzer(ds, significance=0.05)
        an.compute_spectra()
        an.run_instability_detection()
        return an, c_drift, c_stable

    def test_dof_and_averaging(self):
        an, _, _ = self._drifting_analyzer()
        for a in ('dataset', 'circuit', 'outcome'):
            assert an.dof_reduction(a) == 0
            assert an._check_dofreduction_set(a)
        assert an.same_frequencies()          # shared timestep
        assert an.averaging_allowed()
        assert an.averaging_allowed(checklevel=0)

    def test_unstable_circuits_method(self):
        an, c_drift, c_stable = self._drifting_analyzer()
        uc = an.unstable_circuits()
        assert c_drift in uc and c_stable not in uc
        freqs = uc[c_drift]
        assert len(freqs) >= 1 and all(f > 0 for f in freqs)
        uc_idx = an.unstable_circuits(freqindices=True)
        assert all(isinstance(i, (int, np.integer)) for i in uc_idx[c_drift])
        an.run_instability_characterization()  # required for max-TVD bounds
        uc_tvd = an.unstable_circuits(getmaxtvd=True)
        fr, tvd = uc_tvd[c_drift]
        assert tvd > 0.05, tvd

    def test_freqpointers_differ(self):
        """Circuits with different timesteps get distinct frequency sets."""
        from pygsti_tpu.extras.drift.stabilityanalyzer import StabilityAnalyzer
        from pygsti_tpu.data import DataSet
        from pygsti_tpu.circuits import Circuit
        rng = np.random.RandomState(1)
        T = 64
        ds = DataSet()
        c1, c2 = Circuit('Gxpi2:0@(0)'), Circuit('Gypi2:0@(0)')
        ds.add_raw_series_data(c1, [(str(rng.randint(2)),) for _ in range(T)],
                               np.arange(T, dtype=float))
        ds.add_raw_series_data(c2, [(str(rng.randint(2)),) for _ in range(T)],
                               2.5 * np.arange(T, dtype=float))
        an = StabilityAnalyzer(ds)
        an.compute_spectra()
        assert not an.same_frequencies()
        assert an.same_frequencies({'circuit': c1})
        assert not an.averaging_allowed()
