"""Legacy (positional-gate-name) model packs."""

import importlib

import numpy as np
import pytest

ALL_PACKS = [
    'std1Q_XY', 'std1Q_XYI', 'std1Q_XYZI', 'std1Q_XZ', 'std1Q_ZN',
    'std1Q_pi4_pi2_XZ', 'std2Q_XY', 'std2Q_XXII', 'std2Q_XXYYII',
    'std2Q_XYI', 'std2Q_XYI1', 'std2Q_XYI2', 'std2Q_XYCNOT',
    'std2Q_XYICNOT', 'std2Q_XYCPHASE', 'std2Q_XYICPHASE',
    'std2Q_XYZICNOT', 'std1Q_Cliffords',
]


class TestLegacyPacks:
    @pytest.mark.parametrize('name', ALL_PACKS)
    def test_matches_reference_target_model(self, name, ref_pygsti):
        mine = importlib.import_module('pygsti_tpu.modelpacks.legacy.' + name)
        ref = importlib.import_module('pygsti.modelpacks.legacy.' + name)
        m, rm = mine.target_model(), ref.target_model()
        refops = {str(k): k for k in rm.operations}
        assert set(str(k) for k in m.operations.keys()) == set(refops)
        for lbl in m.operations:
            d = np.max(np.abs(np.asarray(m.operations[lbl].to_dense(),
                                         dtype=np.float64)
                              - rm.operations[refops[str(lbl)]].to_dense()))
            assert d < 1e-6, "%s/%s differs by %g" % (name, lbl, d)

    @pytest.mark.parametrize('name', ['std1Q_XYI', 'std2Q_XYICNOT'])
    def test_circuits_consistent_with_model(self, name):
        mod = importlib.import_module('pygsti_tpu.modelpacks.legacy.' + name)
        m = mod.target_model()
        opnames = set(str(k) for k in m.operations.keys())
        for c in list(mod.germs) + list(mod.prepStrs) + list(mod.effectStrs):
            assert c.line_labels == ('*',)
            for layer in c.layertup:
                nm = layer.name if hasattr(layer, 'name') else str(layer)
                assert nm in opnames, "%s uses unknown op %s" % (c.str, nm)

    def test_gates_lists(self):
        std = importlib.import_module('pygsti_tpu.modelpacks.legacy.std1Q_XYI')
        assert std.gates == ['Gi', 'Gx', 'Gy']
        assert std.fiducials is std.prepStrs
        assert [c.str for c in std.fiducials[:3]] == ['{}', 'Gx', 'Gy']
        cnot = importlib.import_module(
            'pygsti_tpu.modelpacks.legacy.std2Q_XYICNOT')
        assert 'Gcnot' in cnot.gates and 'Gii' in cnot.gates

    def test_lgst_runs_on_legacy_pack(self):
        """End-to-end: simulate data from the legacy target and run LGST."""
        from pygsti_tpu.algorithms.core import run_lgst
        from pygsti_tpu.circuits.gstcircuits import create_lgst_circuits
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.tools.optools import entanglement_fidelity

        std = importlib.import_module('pygsti_tpu.modelpacks.legacy.std1Q_XYI')
        target = std.target_model()
        circuits = create_lgst_circuits(std.fiducials, std.fiducials,
                                        list(std.gates))
        ds = simulate_data(target, circuits, 10000, seed=42)
        mdl = run_lgst(ds, std.fiducials, std.fiducials, target_model=target,
                       svd_truncate_to=4)
        for lbl in target.operations:
            f = entanglement_fidelity(
                np.asarray(mdl.operations[lbl].to_dense()),
                np.asarray(target.operations[lbl].to_dense()))
            assert f > 0.99, "LGST %s fidelity %g" % (lbl, f)

    def test_clifford_pack_group_closure(self):
        """The 24 Clifford superops form a closed group."""
        cl = importlib.import_module(
            'pygsti_tpu.modelpacks.legacy.std1Q_Cliffords')
        m = cl.target_model()
        mats = [np.asarray(op.to_dense(), dtype=np.float64).round(8)
                for op in m.operations.values()]
        assert len(mats) == 24
        keys = {tuple(mx.ravel().round(4)) for mx in mats}
        assert len(keys) == 24
        prod = (mats[1] @ mats[2]).round(4)
        assert tuple(prod.ravel()) in keys


class TestCliffordCompilation:
    def test_smq_bfs_compilation_correct(self):
        import numpy as np
        from pygsti_tpu.modelpacks.smq1Q_XYI import _Pack
        from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
        from pygsti_tpu.tools.optools import unitary_to_superop
        from pygsti_tpu.baseobjs.basis import Basis
        cc = _Pack.clifford_compilation()
        assert cc is not None and len(cc) == 24
        std = standard_gatename_unitaries()
        basis = Basis.cast('pp', 4)
        for i in range(24):
            mx = np.eye(4)
            for lbl in cc['Gc%d' % i]:
                if lbl == ():
                    continue
                mx = np.real(unitary_to_superop(std[lbl[0]], basis)) @ mx
            t = np.real(unitary_to_superop(std['Gc%d' % i], basis))
            assert np.allclose(mx, t, atol=1e-6), 'Gc%d word wrong' % i

    def test_legacy_tables_present_and_valid(self):
        import numpy as np
        mods = {
            'std1Q_XYI': 24, 'std1Q_XY': 24, 'std2Q_XYI': 47,
            'std2Q_XXYYII': 576, 'std1Q_Cliffords': 24,
        }
        for name, n in mods.items():
            mod = importlib.import_module(
                'pygsti_tpu.modelpacks.legacy.' + name)
            cc = mod.clifford_compilation
            assert len(cc) == n, name
            m = mod.target_model()
            opnames = set(str(k) for k in m.operations.keys())
            for word in cc.values():
                assert set(word) <= opnames, (name, word)

    def test_nongenerating_pack_returns_none(self):
        from pygsti_tpu.modelpacks.smq1Q_ZN import _Pack
        assert _Pack.clifford_compilation() is None


class TestFiducialPairReductionData:
    """fpr=True uses the packs' ported per-germ FPR data (round 5:
    previously accepted-and-ignored)."""

    def test_fpr_design_smaller_and_fits(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        d_full = mp._Pack.create_gst_experiment_design(8)
        d_fpr = mp._Pack.create_gst_experiment_design(8, fpr=True)
        n_full = len(d_full.all_circuits_needing_data)
        n_fpr = len(d_fpr.all_circuits_needing_data)
        assert n_fpr < n_full
        # every fpr circuit is in the full design (pairs SELECT, not invent)
        assert set(d_fpr.all_circuits_needing_data) <= \
            set(d_full.all_circuits_needing_data)

    def test_fpr_pairs_match_reference_data(self, ref_pygsti):
        from pygsti_tpu.modelpacks import smq2Q_XYICNOT as mp
        rmp = __import__('pygsti.modelpacks.smq2Q_XYICNOT',
                         fromlist=['x'])
        ours = mp._Pack.pergerm_fidpair_dict(lite=True)
        rcls = next(getattr(rmp, a) for a in dir(rmp)
                    if isinstance(getattr(rmp, a), type)
                    and hasattr(getattr(rmp, a), '_pergerm_fidpairsdict_lite'))
        theirs = rcls._pergerm_fidpairsdict_lite
        assert len(ours) == len(theirs)
        theirs_by_str = {}
        for k, pairs in theirs.items():
            from pygsti_tpu.circuits.circuit import Circuit
            c = Circuit(list(k), tuple(range(2)))
            theirs_by_str[c.str] = sorted(map(tuple, pairs))
        for c, pairs in ours.items():
            assert sorted(map(tuple, pairs)) == theirs_by_str[c.str], c.str

    def test_fpr_without_data_raises(self):
        import pytest as _pytest
        from pygsti_tpu.modelpacks import smq2Q_XYZICNOT as nolite
        with _pytest.raises(ValueError, match='No FPR information'):
            nolite._Pack.create_gst_experiment_design(2, fpr=True, lite=True)

    def test_global_fidpairs_accessor(self):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        g = mp._Pack.global_fidpairs(lite=True)
        assert g and all(len(p) == 2 for p in g)
