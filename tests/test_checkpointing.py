"""Checkpoint/resume: per-iteration writes + warm restart reproduce the
uninterrupted fit (reference: pygsti/protocols/gst.py:1437-1505, 3475-3540)."""

import glob
import os

import numpy as np
import pytest

from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
from pygsti_tpu.data import simulate_data
from pygsti_tpu.protocols.protocol import ProtocolData
from pygsti_tpu.protocols.gst import (
    GateSetTomography, GateSetTomographyDesign, GSTInitialModel,
    GateSetTomographyCheckpoint, StandardGST, StandardGSTCheckpoint)


@pytest.fixture(scope="module")
def gst_data():
    target = mp.target_model('full TP')
    lists = create_lsgst_circuit_lists(target, mp.prep_fiducials(), mp.meas_fiducials(),
                                       mp.germs(), [1, 2, 4])
    datagen = target.depolarize(op_noise=0.03, spam_noise=0.01)
    ds = simulate_data(datagen, list(lists[-1]), 1000, seed=100)
    design = GateSetTomographyDesign(target, lists)
    return ProtocolData(design, ds), target


def _run(data, target, tmp_path, tag, checkpoint=None):
    gst = GateSetTomography(GSTInitialModel(model=target.copy()),
                            gaugeopt_suite=None, verbosity=0,
                            name='GateSetTomography')
    return gst.run(data, checkpoint=checkpoint,
                   checkpoint_path=str(tmp_path / tag))


def test_checkpoint_files_written(gst_data, tmp_path):
    data, target = gst_data
    _run(data, target, tmp_path, 'ckpt')
    files = sorted(glob.glob(str(tmp_path / 'ckpt_iteration_*.json')))
    assert len(files) == 3  # one per circuit-list iteration
    ck = GateSetTomographyCheckpoint.read(files[-1])
    assert ck.last_completed_iter == 2
    assert len(ck.mdl_list) == 3
    assert ck.final_objfn is not None


def test_resume_mid_run_matches_uninterrupted(gst_data, tmp_path):
    data, target = gst_data
    full = _run(data, target, tmp_path, 'full')
    full_mdl = full.estimates['GateSetTomography'].models['final iteration estimate']

    # simulate a crash after iteration 0: resume from its checkpoint file
    ck = GateSetTomographyCheckpoint.read(str(tmp_path / 'full_iteration_0.json'))
    assert ck.last_completed_iter == 0
    resumed = _run(data, target, tmp_path, 'resumed', checkpoint=ck)
    res_mdl = resumed.estimates['GateSetTomography'].models['final iteration estimate']

    np.testing.assert_allclose(res_mdl.to_vector(), full_mdl.to_vector(),
                               atol=1e-8)
    # resumed run skipped iteration 0 (only wrote iterations 1, 2)
    assert not os.path.exists(str(tmp_path / 'resumed_iteration_0.json'))
    assert os.path.exists(str(tmp_path / 'resumed_iteration_2.json'))


def test_resume_fully_complete(gst_data, tmp_path):
    data, target = gst_data
    full = _run(data, target, tmp_path, 'done')
    ck = GateSetTomographyCheckpoint.read(str(tmp_path / 'done_iteration_2.json'))
    resumed = _run(data, target, tmp_path, 'done2', checkpoint=ck)
    a = resumed.estimates['GateSetTomography'].models['final iteration estimate']
    b = full.estimates['GateSetTomography'].models['final iteration estimate']
    np.testing.assert_allclose(a.to_vector(), b.to_vector(), atol=1e-12)
    assert resumed.estimates['GateSetTomography'].parameters['final_objfn_value'] \
        == pytest.approx(full.estimates['GateSetTomography'].parameters['final_objfn_value'])


def test_standardgst_checkpoint_roundtrip(gst_data, tmp_path):
    data, target = gst_data
    std = StandardGST(modes=('full TP', 'Target'), gaugeopt_suite=None,
                      verbosity=0, name='StandardGST')
    res = std.run(data, checkpoint_path=str(tmp_path / 'std'))
    assert set(res.estimates.keys()) == {'full TP', 'Target'}
    ck = StandardGSTCheckpoint.read(str(tmp_path / 'std.json'))
    assert ck.completed_modes == ['full TP', 'Target']
    assert 'full TP' in ck.children
    # resume: completed child checkpoints mean no iterations re-run
    res2 = std.run(data, checkpoint=ck, checkpoint_path=str(tmp_path / 'std2'))
    a = res2.estimates['full TP'].models['final iteration estimate']
    b = res.estimates['full TP'].models['final iteration estimate']
    np.testing.assert_allclose(a.to_vector(), b.to_vector(), atol=1e-12)


class TestModelTestCheckpointing:
    """ModelTest.run writes per-iteration checkpoints and resumes past
    completed iterations (round-5: checkpoint args were previously
    accepted-and-ignored)."""

    def test_write_and_resume(self, tmp_path):
        import numpy as np
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.protocols.gst import GateSetTomographyDesign
        from pygsti_tpu.protocols.modeltest import ModelTest, ModelTestCheckpoint

        target = mp.target_model('full TP')
        lists = create_lsgst_circuit_lists(
            target, mp.prep_fiducials(), mp.meas_fiducials(), mp.germs(), [1, 2])
        ds = simulate_data(target.depolarize(op_noise=0.02),
                           list(lists[-1]), 500, seed=3)
        data = ProtocolData(GateSetTomographyDesign(target, lists), ds)
        path = str(tmp_path / 'mt')
        mt = ModelTest(target.copy(), verbosity=0)
        res = mt.run(data, checkpoint_path=path)
        nsig = float(res.estimates['ModelTest'].misfit_sigma())

        # both iteration checkpoints written
        ck = ModelTestCheckpoint.read(path + '_iteration_0.json')
        assert ck.last_completed_iter == 0 and len(ck.objfn_vals) == 1
        ck1 = ModelTestCheckpoint.read(path + '_iteration_1.json')
        assert ck1.last_completed_iter == 1

        # resume from iteration 0: identical final result
        res2 = ModelTest(target.copy(), verbosity=0).run(
            data, checkpoint=ck, checkpoint_path=str(tmp_path / 'mt2'))
        nsig2 = float(res2.estimates['ModelTest'].misfit_sigma())
        assert abs(nsig - nsig2) < 1e-8

        # fully-completed checkpoint: no recompute, same values
        res3 = ModelTest(target.copy(), verbosity=0).run(
            data, checkpoint=ck1, checkpoint_path=str(tmp_path / 'mt3'))
        assert abs(float(res3.estimates['ModelTest'].misfit_sigma())
                   - nsig) < 1e-8

    def test_disable_checkpointing_writes_nothing(self, tmp_path):
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.protocols.protocol import ProtocolData, ExperimentDesign
        from pygsti_tpu.protocols.modeltest import ModelTest
        import os
        target = mp.target_model('full TP')
        circs = [c for c in mp.create_gst_experiment_design(2).all_circuits_needing_data][:20]
        ds = simulate_data(target, circs, 200, seed=5)
        data = ProtocolData(ExperimentDesign(circs), ds)
        cwd_snapshot = set(os.listdir('.'))
        ModelTest(target.copy(), verbosity=0).run(
            data, disable_checkpointing=True)
        assert set(os.listdir('.')) == cwd_snapshot
