"""Tests for DataComparator and model contraction."""

import numpy as np
import pytest

from pygsti_tpu.circuits import Circuit
from pygsti_tpu.data import DataSet
from pygsti_tpu.data.datacomparator import DataComparator
from pygsti_tpu.algorithms.contract import contract
from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.tools.optools import is_cptp


class TestDataComparator:
    def _make_ds(self, p, seed, n=1000, circuits=10):
        rng = np.random.RandomState(seed)
        ds = DataSet()
        for i in range(circuits):
            c = Circuit([('Gxpi2', 0)] * (i + 1), (0,))
            n0 = rng.binomial(n, p)
            ds.add_count_dict(c, {'0': n0, '1': n - n0})
        return ds

    def test_consistent_datasets(self):
        ds1 = self._make_ds(0.5, 1)
        ds2 = self._make_ds(0.5, 2)
        comp = DataComparator([ds1, ds2]).run()
        assert len(comp.inconsistent_circuits) == 0
        assert abs(comp.aggregate_nsigma) < 3

    def test_inconsistent_datasets(self):
        ds1 = self._make_ds(0.5, 3)
        ds2 = self._make_ds(0.65, 4)
        comp = DataComparator([ds1, ds2]).run()
        assert len(comp.inconsistent_circuits) > 5
        assert comp.aggregate_nsigma > 10
        assert comp.get_maximum_sstvd() > 0.05


class TestContract:
    def test_contract_to_tp(self):
        m = mp.target_model('full')
        # perturb to break TP
        op = m.operations[('Gxpi2', 0)]
        mx = op.to_dense()
        mx[0, 1] = 0.05
        m.operations[('Gxpi2', 0)] = type(op)(mx)
        m2 = contract(m, 'TP')
        mx2 = m2.operations[('Gxpi2', 0)].to_dense()
        assert np.allclose(mx2[0], [1, 0, 0, 0])

    def test_contract_to_cptp(self):
        m = mp.target_model('full')
        op = m.operations[('Gxpi2', 0)]
        mx = op.to_dense() * 1.05  # scale breaks CP and TP
        m.operations[('Gxpi2', 0)] = type(op)(mx)
        assert not is_cptp(mx, 'pp')
        m2 = contract(m, 'CPTP')
        mx2 = m2.operations[('Gxpi2', 0)].to_dense()
        assert is_cptp(mx2, 'pp', tol=1e-5)


class TestQutritModel:
    def test_qutrit_model_probabilities(self):
        import numpy as np
        from pygsti_tpu.models.qutrit import (create_qutrit_model,
                                              _xx_qutrit)
        from pygsti_tpu.circuits import Circuit
        from pygsti_tpu.baseobjs.label import Label
        U = _xx_qutrit(np.pi / 2)
        assert np.allclose(U @ U.conj().T, np.eye(3), atol=1e-10)
        m = create_qutrit_model(0.0)
        c = Circuit([Label('Gx', 'T0'), Label('Gm', 'T0')], ('T0',))
        p = m.probabilities(c)
        assert abs(sum(p.values()) - 1) < 1e-9
        assert abs(p[('1bright',)] - 0.5) < 1e-9
        m2 = create_qutrit_model(0.05, seed=3)
        p2 = m2.probabilities(c)
        assert max(abs(p[k] - p2[k]) for k in p) > 1e-3


class TestGramMatrix:
    def test_gram_rank_full_for_complete_data(self):
        import numpy as np
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.algorithms.grammatrix import (
            max_gram_rank_and_eigenvalues, max_gram_basis)
        target = mp.target_model('full TP')
        lists = create_lsgst_circuit_lists(
            target, mp.prep_fiducials(), mp.meas_fiducials(), mp.germs(), [1])
        ds = simulate_data(target.depolarize(op_noise=0.02), list(lists[-1]),
                           4000, seed=11)
        fixed = (list(mp.prep_fiducials()), list(mp.meas_fiducials()))
        rank, svals, tsvals = max_gram_rank_and_eigenvalues(
            ds, target, fixed_lists=fixed)
        # informationally complete 1Q fiducials: >= 4 significant singular
        # values in the data (shot noise keeps the trailing ones nonzero),
        # exactly 4 in the noiseless target Gram
        assert rank >= 4
        assert len(svals) == len(fixed[0]) and len(tsvals) == len(fixed[0])
        assert tsvals[3] > 1e-3 and tsvals[4] < 1e-10
        assert svals[3] > 10 * svals[4]


class TestMirroring:
    def test_create_mirror_circuit(self):
        from pygsti_tpu.processors import QubitProcessorSpec
        from pygsti_tpu.circuits import Circuit
        from pygsti_tpu.algorithms.mirroring import create_mirror_circuit
        pspec = QubitProcessorSpec(2, ['Gxpi2', 'Gypi2', 'Gcnot'],
                                   geometry='line')
        c = Circuit([('Gxpi2', 0), ('Gcnot', 0, 1), ('Gypi2', 1)],
                    line_labels=(0, 1))
        for seed in (0, 1, 2):
            mc, outcome = create_mirror_circuit(c, pspec, seed=seed)
            assert set(outcome) <= {'0', '1'} and len(outcome) == 2
            assert mc.depth >= 2 * c.depth


class TestGrasp:
    """Generic GRASP over a set-cover-ish problem: pick a subset of integers
    whose sum of coverage reaches a threshold with minimal cardinality."""

    def _setup(self):
        elements = list(range(10))
        value = {i: (i % 4) + 1 for i in elements}

        def score(sub):
            # minimize (cardinality, -coverage)
            cov = sum(value[e] for e in sub)
            return (len(sub), -cov)

        def rcl(scores):
            best = min(scores)
            return [i for i, s in enumerate(scores) if s == best]

        return elements, value, score, rcl

    def test_neighboring_weight_vectors(self):
        from pygsti_tpu.algorithms.grasp import neighboring_weight_vectors
        w = np.array([1, 0, 1, 0])
        nbrs = neighboring_weight_vectors(w)
        # 2 in-elements x 2 out-slots = 4 neighbors, each still weight 2
        assert len(nbrs) == 4
        for nb in nbrs:
            assert nb.sum() == 2 and not np.array_equal(nb, w)
        forced = neighboring_weight_vectors(w, forced_weights=[1, 0, 0, 0])
        assert len(forced) == 2
        for nb in forced:
            assert nb[0] == 1

    def test_run_grasp(self):
        from pygsti_tpu.algorithms.grasp import run_grasp
        elements, value, score, rcl = self._setup()

        def feasible(sub):
            return sum(value[e] for e in sub) >= 10

        best = run_grasp(elements, score, rcl, score, 
                         lambda w: __import__(
                             'pygsti_tpu.algorithms.grasp',
                             fromlist=['x']).neighboring_weight_vectors(w),
                         score, iterations=4, feasible_fn=feasible, seed=7)
        assert feasible(best)
        # max per-element value is 4, so at least 3 elements are needed; a
        # good search finds a 3-element solution
        assert len(best) == 3

    def test_threshold_feasibility(self):
        from pygsti_tpu.algorithms.grasp import run_grasp_iteration, \
            neighboring_weight_vectors
        elements, value, score, rcl = self._setup()
        # feasible iff cardinality < 6 and coverage better than -12
        init, local = run_grasp_iteration(
            elements, score, rcl, score, neighboring_weight_vectors,
            feasible_threshold=(6, -12), rng=__import__('random').Random(3))
        assert score(local) <= score(init)
        assert score(local) < (6, -12)


class TestOptimizeMethods:
    def test_customcg_method(self):
        from pygsti_tpu.optimize.optimize import minimize
        res = minimize(lambda x: float(((x - 3.0) ** 2).sum()),
                       np.zeros(4), method='customcg', tol=1e-10)
        assert np.allclose(res.x, 3.0, atol=1e-4) and res.fun < 1e-6
