"""Content-keyed graph-cache correctness (round 5).

The global caches in objectivefns (_OBJ_GRAPH_GLOBAL_CACHE,
_DEVICE_LM_GLOBAL_CACHE) and algorithms.gaugeopt (_GO_EXEC_CACHE) share
compiled executables across objects keyed on problem STRUCTURE/CONTENT.
A wrong hit silently corrupts results, so these tests pin:

* value-independence: cache-shared executables produce each model's own
  numbers (values are runtime args, never baked constants)
* no false sharing: different circuits / different model constants miss
* re-fit identity: a second fit of the same design hits the cache and
  reproduces the first fit exactly
"""

import numpy as np
import pytest

import pygsti_tpu.objectivefns.objectivefns as ofns
from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
from pygsti_tpu.data import simulate_data


@pytest.fixture(scope='module')
def setup():
    target = mp.target_model('full TP')
    lists = create_lsgst_circuit_lists(target, mp.prep_fiducials(),
                                       mp.meas_fiducials(), mp.germs(), [1, 2])
    circuits = list(lists[-1])
    datagen = mp.target_model('full TP').depolarize(op_noise=0.02,
                                                    spam_noise=0.01)
    ds = simulate_data(datagen, circuits, 1000, seed=11)
    return target, circuits, ds


class TestObjectiveGraphCache:
    def test_refit_same_design_hits_cache_and_matches(self, setup):
        target, circuits, ds = setup
        raw = ofns.RawPoissonPicDeltaLogLFunction()
        obj1 = ofns.TimeIndependentMDCObjectiveFunction(
            raw, target.copy(), ds, list(circuits))
        f1 = obj1.fn()
        ck1 = obj1._fns['content_key']
        # fresh model copy + fresh layout, identical content
        obj2 = ofns.TimeIndependentMDCObjectiveFunction(
            ofns.RawPoissonPicDeltaLogLFunction(), target.copy(), ds,
            list(circuits))
        ck2 = obj2._fns['content_key']
        assert isinstance(ck1, tuple) and ck1 == ck2, \
            "identical design must share the global graph-cache entry"
        assert obj2._fns is obj1._fns, "fns dict must be the SAME object"
        assert abs(obj2.fn() - f1) < 1e-12

    def test_shared_graphs_are_value_independent(self, setup):
        target, circuits, ds = setup
        raw = ofns.RawPoissonPicDeltaLogLFunction()
        m1 = target.copy()
        m2 = target.copy()
        v2 = m2.to_vector() + 0.01 * np.sin(np.arange(m2.num_params))
        m2.from_vector(v2)
        obj1 = ofns.TimeIndependentMDCObjectiveFunction(raw, m1, ds,
                                                        list(circuits))
        obj2 = ofns.TimeIndependentMDCObjectiveFunction(
            ofns.RawPoissonPicDeltaLogLFunction(), m2, ds, list(circuits))
        # same structure (only the parameter VECTOR differs) -> shared graphs
        assert obj1._fns is obj2._fns
        f1, f2 = obj1.fn(), obj2.fn()
        assert abs(f1 - f2) > 1e-3, \
            "shared executables must evaluate each model's own parameters"
        # evaluating obj1 again is unaffected by obj2's existence
        assert abs(obj1.fn() - f1) < 1e-12

    def test_different_circuits_miss(self, setup):
        target, circuits, ds = setup
        raw = ofns.RawPoissonPicDeltaLogLFunction()
        obj1 = ofns.TimeIndependentMDCObjectiveFunction(
            raw, target.copy(), ds, list(circuits))
        obj2 = ofns.TimeIndependentMDCObjectiveFunction(
            ofns.RawPoissonPicDeltaLogLFunction(), target.copy(), ds,
            list(circuits[:-5]))
        assert obj1._fns is not obj2._fns
        assert obj1._fns['content_key'] != obj2._fns['content_key']

    def test_different_static_constants_miss(self, setup):
        """Two models with identical parameterization but different BAKED
        constants (datagen-style static structure) must not share graphs.
        Model fingerprints hash the jaxpr's constants, so a 'full TP' model
        vs the same model with an extra static depolarization on the
        underlying target differ."""
        target, circuits, ds = setup
        m1 = mp.target_model('full TP')
        m2 = mp.target_model('static').depolarize(op_noise=0.05)
        fp1 = ofns._model_graph_fingerprint(m1)
        fp2 = ofns._model_graph_fingerprint(m2)
        assert fp1 != fp2

    def test_fingerprint_tracks_structural_edit(self, setup):
        """A structural edit after a fit must change the fingerprint (the
        fingerprint is deliberately recomputed, never cached on the model)."""
        target, circuits, ds = setup
        m = target.copy()
        fp_before = ofns._model_graph_fingerprint(m)
        from pygsti_tpu.modelmembers.operations import StaticArbitraryOp
        lbl = list(m.operations.keys())[0]
        m.operations[lbl] = StaticArbitraryOp(
            np.asarray(m.operations[lbl].to_dense()) * 0.999)
        fp_after = ofns._model_graph_fingerprint(m)
        assert fp_before != fp_after


class TestGaugeoptExecCache:
    def test_structure_shared_value_independent(self, setup):
        """Two gauge-opts with the same structure but different model values
        share compiled executables yet produce their own optima."""
        from pygsti_tpu.algorithms import gaugeopt as go
        target = mp.target_model('full TP')
        m1 = mp.target_model('full TP').depolarize(op_noise=0.03)
        m1 = _gauge_rotate(m1, 0.05)
        m2 = mp.target_model('full TP').depolarize(op_noise=0.01)
        m2 = _gauge_rotate(m2, -0.08)
        n_before = len(go._GO_EXEC_CACHE)
        g1 = go.gaugeopt_to_target(m1, target)
        n_mid = len(go._GO_EXEC_CACHE)
        g2 = go.gaugeopt_to_target(m2, target)
        n_after = len(go._GO_EXEC_CACHE)
        assert n_after == n_mid, "same-structure gauge-opt must cache-hit"
        # each result is close to ITS model's depolarization, not the other's
        d1 = _frob_to(g1, target)
        d2 = _frob_to(g2, target)
        assert d1 > d2, \
            "0.03-depolarized model must stay farther from target than 0.01"

    def test_precompile_then_run_matches_direct(self, setup):
        """precompile_gaugeopt_suite warms the cache from the SEED model's
        structure; the later real call must produce the same result as a
        fresh process would."""
        from pygsti_tpu.algorithms import gaugeopt as go
        from pygsti_tpu.protocols.gst import GSTGaugeOptSuite
        target = mp.target_model('full TP')
        noisy = _gauge_rotate(
            mp.target_model('full TP').depolarize(op_noise=0.02), 0.04)
        suite = GSTGaugeOptSuite.cast('stdgaugeopt')
        go.precompile_gaugeopt_suite(suite, target.copy(), target)
        godict = suite.to_dictionary(noisy)
        stages = godict['stdgaugeopt']['stages']
        cur = noisy
        for stage in stages:
            cur = go.gaugeopt_to_target(cur, target, **dict(stage))
        # the gauge-opt must reduce distance-to-target vs the rotated input
        assert _frob_to(cur, target) < _frob_to(noisy, target)


def _gauge_rotate(model, angle):
    """Apply a small unitary gauge rotation (keeps the gauge orbit)."""
    from pygsti_tpu.models.gaugegroup import UnitaryGaugeGroup
    gg = UnitaryGaugeGroup(model.state_space, 'pp')
    v = np.zeros(gg.num_params)
    v[min(1, len(v) - 1)] = angle
    el = gg.compute_element(v)
    out = model.copy()
    out.transform_inplace(el)
    return out


def _frob_to(model, target):
    tot = 0.0
    for k in target.operations:
        tot += float(np.sum((np.asarray(model.operations[k].to_dense())
                             - np.asarray(target.operations[k].to_dense())) ** 2))
    return tot


class TestGaugeoptHonestKwargs:
    """gaugeopt_to_target's auxiliary kwargs are honest (no accept-and-
    ignore): maxfev bounds L-BFGS-B, check_jac really checks, n_leak
    raises with a pointer to the LAGO suite."""

    def test_check_jac_passes_on_consistent_gradient(self):
        from pygsti_tpu.algorithms import gaugeopt as go
        target = mp.target_model('full TP')
        noisy = _gauge_rotate(
            mp.target_model('full TP').depolarize(op_noise=0.02), 0.03)
        out = go.gaugeopt_to_target(noisy, target, check_jac=True)
        assert _frob_to(out, target) < _frob_to(noisy, target)

    def test_n_leak_raises(self):
        from pygsti_tpu.algorithms import gaugeopt as go
        target = mp.target_model('full TP')
        with pytest.raises(NotImplementedError):
            go.gaugeopt_to_target(target.copy(), target, n_leak=1)

    def test_maxfev_accepted(self):
        from pygsti_tpu.algorithms import gaugeopt as go
        target = mp.target_model('full TP')
        noisy = mp.target_model('full TP').depolarize(op_noise=0.02)
        out = go.gaugeopt_to_target(noisy, target, maxfev=5)
        assert out is not None
