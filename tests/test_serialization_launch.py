"""Tests for MongoDB serialization protocol and launcher artifacts."""

import os
import tempfile

import numpy as np
import pytest

from pygsti_tpu.baseobjs.mongoserializable import (MongoSerializable,
                                                   create_mongodb_collection)
from pygsti_tpu.protocols.protocol import ExperimentDesign, ProtocolData
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.data import DataSet


class TestMongoSerialization:
    def test_round_trip_mock_collection(self):
        ed = ExperimentDesign([Circuit([('Gxpi2', 0)], (0,))], (0,))
        coll = create_mongodb_collection()
        doc_id = MongoSerializable.write_to_mongodb(ed, coll)
        back = MongoSerializable.from_mongodb(coll, doc_id)
        assert list(back.all_circuits_needing_data) == \
            list(ed.all_circuits_needing_data)

    def test_overwrite(self):
        ed = ExperimentDesign([Circuit([('Gxpi2', 0)], (0,))], (0,))
        coll = create_mongodb_collection()
        MongoSerializable.write_to_mongodb(ed, coll, doc_id='x')
        ed2 = ExperimentDesign([Circuit([('Gypi2', 0)], (0,))], (0,))
        MongoSerializable.write_to_mongodb(ed2, coll, doc_id='x',
                                           overwrite_existing=True)
        back = MongoSerializable.from_mongodb(coll, 'x')
        assert list(back.all_circuits_needing_data)[0].layertup[0].name == 'Gypi2'


class TestLaunchTools:
    def test_stage_protocol_run(self):
        from pygsti_tpu.tools.launchtools import stage_protocol_run
        from pygsti_tpu.protocols.stability import StabilityAnalysis
        ed = ExperimentDesign([Circuit([('Gxpi2', 0)], (0,))], (0,))
        ds = DataSet()
        ds.add_count_dict(Circuit([('Gxpi2', 0)], (0,)), {'0': 5, '1': 5})
        data = ProtocolData(ed, ds)
        with tempfile.TemporaryDirectory() as d:
            out = stage_protocol_run(StabilityAnalysis(), data, d,
                                     slurm=True, nodes=4, tpu_type='v5e-8')
            assert os.path.exists(out['runner'])
            slurm = open(out['slurm_script']).read()
            assert '--nodes=4' in slurm and 'tpu:v5e-8' in slurm
            runner = open(out['runner']).read()
            assert 'jax.distributed' in runner
            assert os.access(out['runner'], os.X_OK)


class TestIBMQExperiment:
    def test_offline_lifecycle(self):
        from pygsti_tpu.extras.ibmq import IBMQExperiment
        from pygsti_tpu.protocols.protocol import ExperimentDesign
        from pygsti_tpu.circuits import Circuit
        circs = [Circuit([('Gxpi2', 0)], (0,)),
                 Circuit([('Gxpi2', 0), ('Gxpi2', 0)], (0,))]
        exp = IBMQExperiment(ExperimentDesign(circs, (0,)), num_shots=100,
                             seed=0)
        data = exp.add_counts_from_dict({circs[0]: {'0': 50, '1': 50},
                                         circs[1]: {'1': 100}})
        assert data.dataset[circs[1]].counts[('1',)] == 100
        with tempfile.TemporaryDirectory() as d:
            exp.write(d)
            exp2 = IBMQExperiment.from_dir(d)
            assert exp2.num_shots == 100

    def test_qiskit_gated(self):
        import pytest as _pytest
        from pygsti_tpu.extras.ibmq import IBMQExperiment
        from pygsti_tpu.protocols.protocol import ExperimentDesign
        from pygsti_tpu.circuits import Circuit
        exp = IBMQExperiment(ExperimentDesign(
            [Circuit([('Gxpi2', 0)], (0,))], (0,)))
        try:
            import qiskit  # noqa
            _pytest.skip("qiskit installed; gating test not applicable")
        except ImportError:
            with _pytest.raises(ImportError):
                exp.transpile()


class TestJsonCodec:
    def test_roundtrip_primitives(self):
        import numpy as np
        from pygsti_tpu.serialization import dumps, loads
        obj = {'arr': np.arange(6, dtype=np.float64).reshape(2, 3),
               'c': 1 + 2j, 't': (1, 'x', 2.5),
               'carr': np.array([1 + 1j, 2 - 3j]),
               'nested': {'k': [1, (2, 3)]}}
        out = loads(dumps(obj))
        assert np.array_equal(out['arr'], obj['arr'])
        assert out['arr'].dtype == np.float64
        assert out['c'] == 1 + 2j and out['t'] == (1, 'x', 2.5)
        assert np.allclose(out['carr'], obj['carr'])
        assert out['nested']['k'][1] == (2, 3)

    def test_roundtrip_nicely_serializable(self):
        from pygsti_tpu.serialization import dumps, loads
        from pygsti_tpu.protocols.gst import GateSetTomographyCheckpoint
        ckpt = GateSetTomographyCheckpoint(name='test-ckpt')
        ckpt.last_completed_iter = 3
        out = loads(dumps(ckpt))
        assert isinstance(out, GateSetTomographyCheckpoint)
        assert out.name == 'test-ckpt' and out.last_completed_iter == 3
