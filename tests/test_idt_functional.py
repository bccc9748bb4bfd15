"""Reference-parity functional idle-tomography API: analytic Jacobian
elements, fiducial-pair generation, experiment lists, and do_idle_tomography
end-to-end (reference: pygsti/extras/idletomography/idtcore.py)."""

import numpy as np
import pytest

from pygsti_tpu.extras import idletomography as idt
from pygsti_tpu.extras.idletomography.pauliobjs import (NQOutcome,
                                                        NQPauliState,
                                                        NQPauliOp)

PREP_DICT = {'X': ('Gypi2',), 'Y': ('Gxpi2',) * 3, 'Z': (),
             '-X': ('Gypi2',) * 3, '-Y': ('Gxpi2',), '-Z': ('Gxpi2', 'Gxpi2')}
MEAS_DICT = {'X': ('Gypi2',) * 3, 'Y': ('Gxpi2',), 'Z': (),
             '-X': ('Gypi2',), '-Y': ('Gxpi2',) * 3, '-Z': ('Gxpi2', 'Gxpi2')}


def _ref_idt(ref_pygsti):
    # the reference package __init__ pulls in idtreport -> plotly (not
    # installed); stub plotly so the core module imports
    import sys, types
    if 'plotly' not in sys.modules:
        class _DummyMeta(type):
            def __getattr__(cls, name):
                return _Dummy

        class _Dummy(metaclass=_DummyMeta):
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                return self

        def _mod(name, **attrs):
            m = types.ModuleType(name)
            m.__getattr__ = lambda a, _n=name: _Dummy
            m.__path__ = []  # mark as package so submodule imports resolve
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
            return m
        plotly = _mod('plotly', __version__='5.0.0')
        plotly.graph_objs = _mod('plotly.graph_objs')
        sub = _mod('plotly.subplots', make_subplots=lambda *a, **k: None)
        plotly.subplots = sub
        pio = _mod('plotly.io', to_html=lambda *a, **k: "")
        plotly.io = pio
        plotly.tools = _mod('plotly.tools')
        plotly.offline = _mod('plotly.offline')
    from pygsti.extras import idletomography as ref_idt
    return ref_idt


class TestJacElementsParity:
    """Every analytic Jacobian element equals the reference's, over an
    exhaustive sweep of 2-qubit preps/errors/observables/outcomes."""

    def _states(self, pobjs, reps_and_signs):
        return [pobjs.NQPauliState(r, s) for r, s in reps_and_signs]

    def test_hamiltonian_jac_elements(self, ref_pygsti):
        ref_idt = _ref_idt(ref_pygsti)
        from pygsti.extras.idletomography import pauliobjs as rpo
        rng = np.random.RandomState(0)
        lets = ['I', 'X', 'Y', 'Z']
        for _ in range(200):
            prep_rep = ''.join(rng.choice(['X', 'Y', 'Z'], 2))
            signs = tuple(rng.choice([1, -1], 2))
            err_rep = ''.join(rng.choice(lets, 2))
            obs_rep = ''.join(rng.choice(lets, 2))
            if err_rep == 'II' or obs_rep == 'II':
                continue
            mine = idt.hamiltonian_jac_element(
                NQPauliState(prep_rep, signs), NQPauliOp(err_rep),
                NQPauliOp(obs_rep))
            ref = ref_idt.hamiltonian_jac_element(
                rpo.NQPauliState(prep_rep, signs), rpo.NQPauliOp(err_rep),
                rpo.NQPauliOp(obs_rep))
            assert mine == ref, (prep_rep, signs, err_rep, obs_rep, mine, ref)

    def test_stochastic_and_affine_jac_elements(self, ref_pygsti):
        ref_idt = _ref_idt(ref_pygsti)
        from pygsti.extras.idletomography import pauliobjs as rpo
        rng = np.random.RandomState(1)
        lets = ['I', 'X', 'Y', 'Z']
        for _ in range(200):
            basis = ''.join(rng.choice(['X', 'Y', 'Z'], 2))
            psigns = tuple(rng.choice([1, -1], 2))
            msigns = tuple(rng.choice([1, -1], 2))
            err_rep = ''.join(rng.choice(lets, 2))
            if err_rep == 'II':
                continue
            out = ''.join(rng.choice(['0', '1'], 2))
            args = (NQPauliState(basis, psigns), NQPauliOp(err_rep),
                    NQPauliState(basis, msigns), NQOutcome(out))
            rargs = (rpo.NQPauliState(basis, psigns), rpo.NQPauliOp(err_rep),
                     rpo.NQPauliState(basis, msigns), rpo.NQOutcome(out))
            assert idt.stochastic_jac_element(*args) == \
                ref_idt.stochastic_jac_element(*rargs)
            assert idt.affine_jac_element(*args) == \
                ref_idt.affine_jac_element(*rargs)
            assert str(idt.stochastic_outcome(args[0], args[1], args[2])) == \
                str(ref_idt.stochastic_outcome(rargs[0], rargs[1], rargs[2]))

    def test_affine_jac_obs_elements(self, ref_pygsti):
        ref_idt = _ref_idt(ref_pygsti)
        from pygsti.extras.idletomography import pauliobjs as rpo
        rng = np.random.RandomState(2)
        lets = ['I', 'X', 'Y', 'Z']
        for _ in range(200):
            prep_rep = ''.join(rng.choice(['X', 'Y', 'Z'], 2))
            signs = tuple(rng.choice([1, -1], 2))
            err_rep = ''.join(rng.choice(lets, 2))
            obs_rep = ''.join(rng.choice(lets, 2))
            if err_rep == 'II':
                continue
            mine = idt.affine_jac_obs_element(
                NQPauliState(prep_rep, signs), NQPauliOp(err_rep),
                NQPauliOp(obs_rep))
            ref = ref_idt.affine_jac_obs_element(
                rpo.NQPauliState(prep_rep, signs), rpo.NQPauliOp(err_rep),
                rpo.NQPauliOp(obs_rep))
            assert mine == ref


class TestFidpairsAndLists:
    def test_fidpairs_match_reference(self, ref_pygsti):
        ref_idt = _ref_idt(ref_pygsti)
        for mw in (1, 2):
            mine = idt.idle_tomography_fidpairs(2, maxweight=mw)
            ref = ref_idt.idle_tomography_fidpairs(2, maxweight=mw)
            key = lambda fp: (''.join(fp[0].rep), tuple(fp[0].signs),
                              ''.join(fp[1].rep), tuple(fp[1].signs))
            assert [key(fp) for fp in mine] == [key(fp) for fp in ref]

    def test_preferred_signs(self, ref_pygsti):
        ref_idt = _ref_idt(ref_pygsti)
        assert idt.preferred_signs_from_paulidict(PREP_DICT) == \
            ref_idt.preferred_signs_from_paulidict(PREP_DICT)
        assert idt.preferred_signs_from_paulidict(MEAS_DICT) == \
            ref_idt.preferred_signs_from_paulidict(MEAS_DICT)

    def test_experiment_list_matches_reference(self, ref_pygsti):
        ref_idt = _ref_idt(ref_pygsti)
        mine = idt.make_idle_tomography_list(
            2, [0, 1, 4], (PREP_DICT, MEAS_DICT), maxweight=2)
        ref = ref_idt.make_idle_tomography_list(
            2, [0, 1, 4], (PREP_DICT, MEAS_DICT), maxweight=2)
        assert len(mine) == len(ref)
        for mc, rc in zip(mine, ref):
            assert [str(l) for l in mc.layertup] == \
                [str(l) for l in rc.layertup], (mc, rc)

    def test_make_lists_per_length(self):
        lists = idt.make_idle_tomography_lists(
            2, [0, 1, 4], (PREP_DICT, MEAS_DICT), maxweight=1)
        assert len(lists) == 3
        assert len(set(len(l) for l in lists)) == 1

    def test_determine_paulidicts(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        dicts = idt.determine_paulidicts(mp.target_model('static'))
        assert dicts is not None
        prep_dict, meas_dict = dicts
        assert prep_dict['Z'] == ()
        assert len(prep_dict['X']) == 1 and len(meas_dict['Y']) == 1


class TestDoIdleTomography:
    def _simulate(self, nq, circuits, ham_z=0.0, sto_z=0.0, seed=7,
                  nsamples=100000):
        """Simulate data from a model whose global idle has H_Z/S_Z errors
        on qubit 0."""
        import scipy.linalg as spl
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.baseobjs.label import Label
        from pygsti_tpu.modelmembers.operations import StaticArbitraryOp
        from pygsti_tpu.tools.lindbladtools import create_elementary_errorgen
        from pygsti_tpu.tools.basistools import change_basis
        if nq == 1:
            from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        else:
            from pygsti_tpu.modelpacks import smq2Q_XYI as mp
        model = mp.target_model('static')
        sigZ = np.array([[1, 0], [0, -1]], complex)
        L = ham_z * np.real(change_basis(
            create_elementary_errorgen('H', sigZ), 'std', 'pp'))
        L = L + sto_z * np.real(change_basis(
            create_elementary_errorgen('S', sigZ), 'std', 'pp'))
        idle_1q = np.real(spl.expm(L))
        idle = idle_1q if nq == 1 else np.kron(idle_1q, np.eye(4))
        model.operations[Label(())] = StaticArbitraryOp(idle)
        return simulate_data(model, circuits, nsamples, seed=seed)

    def test_recovers_hamiltonian_rate_1q(self):
        ham_z = 0.02
        max_lengths = [0, 1, 2, 4, 8]
        circuits = idt.make_idle_tomography_list(
            1, max_lengths, (PREP_DICT, MEAS_DICT), maxweight=1)
        ds = self._simulate(1, circuits, ham_z=ham_z)
        results = idt.do_idle_tomography(
            1, ds, max_lengths, (PREP_DICT, MEAS_DICT), maxweight=1)
        rates = dict(zip([str(e) for e in results.error_list],
                         results.intrinsic_rates['hamiltonian']))
        # Lindblad H errorgen -i[H,rho] with H = eps*sigZ gives
        # d<obs>/dL = 2*eps along the idt convention's Z axis, so the
        # intrinsic 'hamiltonian' rate is 2*ham_z
        assert abs(rates['Z'] - 2 * ham_z) < 0.004, rates
        assert abs(rates['X']) < 0.004 and abs(rates['Y']) < 0.004

    def test_recovers_stochastic_rate_2q(self):
        sto_z = 0.01
        max_lengths = [0, 1, 2, 4]
        circuits = idt.make_idle_tomography_list(
            2, max_lengths, (PREP_DICT, MEAS_DICT), maxweight=1,
            include_hamiltonian=False, include_affine=False)
        ds = self._simulate(2, circuits, sto_z=sto_z, nsamples=200000)
        results = idt.do_idle_tomography(
            2, ds, max_lengths, (PREP_DICT, MEAS_DICT), maxweight=1,
            include_hamiltonian=False, include_affine=False)
        rates = dict(zip([str(e) for e in results.error_list],
                         results.intrinsic_rates['stochastic']))
        assert abs(rates['ZI'] - sto_z) < 0.003, rates
        for k in ('XI', 'YI', 'IX', 'IY', 'IZ'):
            assert abs(rates[k]) < 0.003, rates

    def test_jacmodes_agree(self):
        """'separate' and 'together' jacobian modes give the same rates."""
        max_lengths = [0, 1, 2, 4]
        circuits = idt.make_idle_tomography_list(
            1, max_lengths, (PREP_DICT, MEAS_DICT), maxweight=1)
        ds = self._simulate(1, circuits, ham_z=0.01, sto_z=0.005)
        r_sep = idt.do_idle_tomography(
            1, ds, max_lengths, (PREP_DICT, MEAS_DICT), maxweight=1)
        r_tog = idt.do_idle_tomography(
            1, ds, max_lengths, (PREP_DICT, MEAS_DICT), maxweight=1,
            advanced_options={"jacobian mode": "together"})
        for typ in r_sep.intrinsic_rates:
            assert typ in r_tog.intrinsic_rates
            assert np.allclose(r_sep.intrinsic_rates[typ],
                               r_tog.intrinsic_rates[typ], atol=2e-3), typ

    def test_results_str(self):
        max_lengths = [0, 1, 2]
        circuits = idt.make_idle_tomography_list(
            1, max_lengths, (PREP_DICT, MEAS_DICT), maxweight=1)
        ds = self._simulate(1, circuits, ham_z=0.01, nsamples=5000)
        res = idt.do_idle_tomography(1, ds, max_lengths,
                                     (PREP_DICT, MEAS_DICT), maxweight=1)
        s = str(res)
        assert "hamiltonian" in s and "stochastic" in s


class TestModelBridges:
    """set_idle_errors / extract_idle_errors / predicted_*_rates round trips
    (reference: idttools.py:172-549)."""

    def _model_with_idle(self, nq):
        from pygsti_tpu.baseobjs.label import Label
        from pygsti_tpu.modelmembers.operations import (
            ExpErrorgenOp, build_lindblad_errorgen)
        if nq == 1:
            from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        else:
            from pygsti_tpu.modelpacks import smq2Q_XYI as mp
        model = mp.target_model('static')
        eg = build_lindblad_errorgen('pp', 'H+s', dim=4 ** nq, max_weight=1)
        model.operations[Label(())] = ExpErrorgenOp(eg)
        return model

    def test_set_extract_round_trip(self):
        from pygsti_tpu.extras.idletomography import idttools
        model = self._model_with_idle(2)
        rates = {"H(ZI)": 0.02, "S(IX)": 0.01, "S(ZI)": 0.004}
        idttools.set_idle_errors(2, model, rates)
        ham, sto, _ = idttools.extract_idle_errors(2, model)
        assert abs(ham.get('ZI', 0) - 0.02) < 1e-10, ham
        assert abs(sto.get('IX', 0) - 0.01) < 1e-10, sto
        assert abs(sto.get('ZI', 0) - 0.004) < 1e-10, sto
        assert all(abs(v) < 1e-10 for k, v in ham.items() if k != 'ZI')

    def test_predicted_matches_do_idle_tomography(self):
        """Intrinsic rates recovered by do_idle_tomography match
        predicted_intrinsic_rates on a model with known idle errors."""
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.extras.idletomography import idttools
        model = self._model_with_idle(1)
        idttools.set_idle_errors(1, model, {"H(Z)": 0.03, "S(X)": 0.008})
        max_lengths = [0, 1, 2, 4, 8]
        circuits = idt.make_idle_tomography_list(
            1, max_lengths, (PREP_DICT, MEAS_DICT), maxweight=1)
        ds = simulate_data(model, circuits, 200000, seed=11)
        results = idt.do_idle_tomography(
            1, ds, max_lengths, (PREP_DICT, MEAS_DICT), maxweight=1)
        ham_pred, sto_pred, _ = idttools.predicted_intrinsic_rates(
            1, 1, model)
        assert np.allclose(results.intrinsic_rates['hamiltonian'], ham_pred,
                           atol=0.005), (results.intrinsic_rates, ham_pred)
        assert np.allclose(results.intrinsic_rates['stochastic'], sto_pred,
                           atol=0.003), (results.intrinsic_rates, sto_pred)

    def test_predicted_observable_rates(self):
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.extras.idletomography import idttools
        model = self._model_with_idle(1)
        idttools.set_idle_errors(1, model, {"S(Z)": 0.01})
        max_lengths = [0, 1, 2, 4]
        circuits = idt.make_idle_tomography_list(
            1, max_lengths, (PREP_DICT, MEAS_DICT), maxweight=1)
        ds = simulate_data(model, circuits, 100000, seed=13)
        results = idt.do_idle_tomography(
            1, ds, max_lengths, (PREP_DICT, MEAS_DICT), maxweight=1)
        pred = idttools.predicted_observable_rates(results, 'samebasis', 1, 1,
                                                   model)
        obs_and_pred = []
        for fidpair, infos in zip(results.pauli_fidpairs['samebasis'],
                                  results.observed_rate_infos['samebasis']):
            for out, info in infos.items():
                obs_and_pred.append((info['rate'], pred[fidpair][out]))
        obs = np.array([o for o, _ in obs_and_pred])
        prd = np.array([p for _, p in obs_and_pred])
        assert np.abs(obs - prd).max() < 0.003, list(zip(obs, prd))
