"""Tests for time-dependent models and objectives."""

import numpy as np
import pytest

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.data import DataSet
from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.modelmembers.operations import (LinearTimeDriftOp, StaticArbitraryOp,
                                                build_lindblad_errorgen)
from pygsti_tpu.objectivefns.timedep import TimeDependentPoissonPicLogLFunction
from pygsti_tpu.optimize.simplerlm import SimplerLMOptimizer


def _make_drifting_model(h_x_rate):
    """Gxpi2 whose X over-rotation error grows linearly in time."""
    model = mp.target_model('static')
    base = model.operations[Label('Gxpi2', 0)]
    eg = build_lindblad_errorgen('pp', 'H', dim=4,
                                 initial_coeffs={('H', 'X'): h_x_rate})
    model.operations[Label('Gxpi2', 0)] = LinearTimeDriftOp(
        StaticArbitraryOp(base.to_dense()), eg)
    model._mark_for_rebuild()
    return model


class TestTimeDependent:
    def test_time_dependent_probs_change(self):
        model = _make_drifting_model(0.1)
        import jax.numpy as jnp
        compute_t = model.tensors_fn_t()
        v = jnp.asarray(model.to_vector())
        t0 = np.asarray(compute_t(v, 0.0).ops)
        t5 = np.asarray(compute_t(v, 5.0).ops)
        gxpi2_idx = model.op_keys.index(Label('Gxpi2', 0))
        assert not np.allclose(t0[gxpi2_idx], t5[gxpi2_idx])
        # idle op (no drift) unchanged
        idle_idx = model.op_keys.index(Label(()))
        assert np.allclose(t0[idle_idx], t5[idle_idx])

    def test_fit_drift_rate(self):
        """Recover the drift rate from timestamped data."""
        rng = np.random.RandomState(0)
        true_rate = 0.05
        truth = _make_drifting_model(true_rate)
        compute_t = truth.tensors_fn_t()
        import jax.numpy as jnp
        v_true = jnp.asarray(truth.to_vector())

        circs = [Circuit([('Gxpi2', 0)] * k, (0,)) for k in (1, 2, 4)]
        ds = DataSet()
        times = [0.0, 2.0, 4.0, 8.0]
        layout_model = truth
        for c in circs:
            ols, ts, reps = [], [], []
            for t in times:
                p = _probs_at(truth, c, t)
                N = 5000
                n0 = rng.binomial(N, min(max(p, 0), 1))
                ols.extend(['0', '1'])
                ts.extend([t, t])
                reps.extend([n0, N - n0])
            ds.add_raw_series_data(c, ols, ts, reps)

        fit_model = _make_drifting_model(0.0)  # seed with no drift
        obj = TimeDependentPoissonPicLogLFunction(fit_model, ds, circs)
        result = SimplerLMOptimizer(maxiter=50).run(obj, printer=0)
        # the H_Z drift coefficient is the last parameter block
        fit_rate = fit_model.operations[Label('Gxpi2', 0)].drift_errorgen.to_vector()
        hx = fit_rate[0]  # ham block labels are ['X','Y','Z']
        assert np.isclose(hx, true_rate, atol=0.01), (hx, true_rate)


def _probs_at(model, circuit, t):
    """p('0') of a circuit at time t (helper using tensors_fn_t)."""
    import jax.numpy as jnp
    compute_t = model.tensors_fn_t()
    v = jnp.asarray(model.to_vector())
    ten = compute_t(v, t)
    op_keys = model.op_keys
    rho = np.asarray(ten.preps)[0]
    G = np.asarray(ten.ops)
    for l in circuit.layertup:
        rho = G[op_keys.index(l)] @ rho
    E = np.asarray(ten.effects)
    return float(E[0] @ rho)


class TestTrimTimesteps:
    def test_trim(self):
        from pygsti_tpu.data.dataset import DataSet
        from pygsti_tpu.data.datasetconstruction import (
            trim_to_constant_numtimesteps)
        from pygsti_tpu.circuits import Circuit
        ds = DataSet(outcome_labels=['0', '1'])
        c1 = Circuit([('Gxpi2', 0)], line_labels=(0,))
        c2 = Circuit([('Gypi2', 0)], line_labels=(0,))
        ds.add_raw_series_data(c1, ['0', '1', '0', '1'], [0.0, 1.0, 2.0, 3.0])
        ds.add_raw_series_data(c2, ['1', '0'], [0.0, 1.0])
        ds.done_adding_data()
        t = trim_to_constant_numtimesteps(ds)
        assert len(set(t[c1].time)) == 2 and len(set(t[c2].time)) == 2
        assert t[c1].counts[('0',)] == 1 and t[c1].counts[('1',)] == 1


class TestSimulateDataTimesAndAliases:
    """Round-5: simulate_data's times/alias_dict/collision_action are now
    honored (previously accepted-and-ignored)."""

    def test_times_records_series(self):
        import numpy as np
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.circuits.circuit import Circuit
        target = mp.target_model('full TP')
        circs = [Circuit('Gxpi2:0@(0)'), Circuit('Gxpi2:0Gxpi2:0@(0)')]
        ds = simulate_data(target, circs, 100, seed=4, times=[0.0, 1.5, 3.0])
        row = ds[circs[0]]
        assert row.time is not None
        assert set(np.unique(row.time)) == {0.0, 1.5, 3.0}
        # 100 shots at each of the 3 timestamps
        assert row.total == 300

    def test_alias_dict_changes_simulated_probs(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.circuits.circuit import Circuit
        target = mp.target_model('full TP')
        c = Circuit([('Gxpi2', 0)], (0,))
        # alias X(pi/2) -> X(pi/2)X(pi/2) = X(pi): P(1) becomes ~1
        from pygsti_tpu.baseobjs.label import Label
        alias = {Label('Gxpi2', (0,)): Circuit([('Gxpi2', 0), ('Gxpi2', 0)], (0,))}
        ds = simulate_data(target, [c], 400, sample_error='none',
                           alias_dict=alias)
        row = ds[c]  # keyed on the ORIGINAL circuit
        assert abs(row.counts[('1',)] - 400) < 1e-6

    def test_keepseparate_raises(self):
        import pytest as _pytest
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.circuits.circuit import Circuit
        target = mp.target_model('full TP')
        with _pytest.raises(NotImplementedError):
            simulate_data(target, [Circuit([('Gxpi2', 0)], (0,))], 10,
                          collision_action='keepseparate')
