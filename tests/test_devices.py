"""Tests for experimental device specs and calibration-derived models."""

import numpy as np
import pytest

from pygsti_tpu.extras.devices import (ExperimentalDevice,
                                       create_processor_spec,
                                       create_error_rates_model,
                                       create_local_depolarizing_model,
                                       edgelist)
from pygsti_tpu.circuits import Circuit
from pygsti_tpu.baseobjs.label import Label


class TestDevices:
    def test_legacy_device_topologies(self):
        for name in ('ibmq_belem', 'ibmq_athens', 'ibmq_lagos'):
            dev = ExperimentalDevice.from_legacy_device(name)
            assert len(dev.qubits) in (5, 7)
            assert len(edgelist(dev)) >= len(dev.qubits) - 1

    def test_processor_spec_from_device(self):
        dev = ExperimentalDevice.from_legacy_device('ibmq_belem')
        pspec = create_processor_spec(dev, ['Gxpi2', 'Gypi2'])
        assert pspec.qubit_labels == ('Q0', 'Q1', 'Q2', 'Q3', 'Q4')
        assert ('Q1', 'Q3') in pspec.qubit_graph.edges() \
            or ('Q3', 'Q1') in pspec.qubit_graph.edges()

    def test_error_rates_model_from_caldata(self):
        dev = ExperimentalDevice.from_legacy_device('ibmq_belem')
        cal = {'gates': {'Q0': 0.001, 'Q1': 0.002,
                         frozenset(('Q0', 'Q1')): 0.02},
               'readout': {'Q0': 0.03, 'Q1': 0.02}}
        m = create_error_rates_model(cal, dev, model_type='TwirledLayers')
        c = Circuit([Label('Gxpi2', ('Q0',)), Label('Gcnot', ('Q0', 'Q1'))],
                    ('Q0', 'Q1'))
        p = m.probabilities(c)[('success',)]
        assert 0.8 < p < 1.0
        # no calibration -> perfect device
        m0 = create_error_rates_model(None, dev)
        assert abs(m0.probabilities(c)[('success',)] - 1.0) < 1e-10

    def test_local_depolarizing_model(self):
        dev = ExperimentalDevice.from_legacy_device('ibmq_athens')
        cal = {'gates': {'Q0': 0.002, 'Q1': 0.002,
                         frozenset(('Q0', 'Q1')): 0.01}}
        m = create_local_depolarizing_model(cal, dev)
        c = Circuit([Label('Gxpi2', ('Q0',))] * 2, tuple(dev.qubits))
        probs = m.probabilities(c)
        assert abs(sum(probs.values()) - 1.0) < 1e-9


class TestDeviceDataParity:
    """All 40 reference devices ship as data and match the reference's
    published edge lists (reference: extras/devices/ibmq_*.py,
    rigetti_*.py)."""

    def test_all_reference_devices_resolve(self):
        from pygsti_tpu.extras.devices.experimentaldevice import _device_data
        data = _device_data()
        assert len(data) == 40
        for name, d in data.items():
            dev = ExperimentalDevice.from_legacy_device(name)
            assert len(dev.qubits) == d['n']
            assert len(edgelist(dev)) == len(d['pairs']), name
            assert dev.two_qubit_gate == d['gate']

    def test_reference_edge_parity_spot_checks(self):
        # belem: 5q T (reference ibmq_belem.py edgelist)
        dev = ExperimentalDevice.from_legacy_device('ibmq_belem')
        assert {frozenset(e) for e in edgelist(dev)} == {
            frozenset(p) for p in
            [('Q0', 'Q1'), ('Q1', 'Q2'), ('Q1', 'Q3'), ('Q3', 'Q4')]}
        # agave: 8q ring, native CZ (reference rigetti_agave.py)
        dev = ExperimentalDevice.from_legacy_device('rigetti_agave')
        assert len(edgelist(dev)) == 8 and dev.two_qubit_gate == 'Gcphase'
        assert dev.spec_format == 'rigetti'
        # sherbrooke: 127q heavy-hex eagle
        dev = ExperimentalDevice.from_legacy_device('ibm_sherbrooke')
        assert len(dev.qubits) == 127
        # aspen4 keeps its noncontiguous reference qubit labels
        dev = ExperimentalDevice.from_legacy_device('rigetti_aspen4')
        assert 'Q0' in dev.qubits and len(dev.qubits) in (16, 20)

    def test_aliases(self):
        from pygsti_tpu.extras.devices.devcore import (
            basic_device_information, get_device_specs)
        for alias, canon in [('ibm_hanoi', 'ibmq_hanoi'),
                             ('ibmqx2', 'ibmq_yorktown'),
                             ('ibmq_16_melbourne', 'ibmq_melbourne')]:
            a = basic_device_information(alias)
            c = get_device_specs(canon)
            assert len(a.qubits) == len(c.qubits)
            assert len(edgelist(a)) == len(edgelist(c))

    def test_unknown_device_raises(self):
        with pytest.raises(ValueError):
            ExperimentalDevice.from_legacy_device('ibmq_nonexistent')
