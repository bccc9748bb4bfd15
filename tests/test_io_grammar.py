"""I/O text grammar: StdInputParser features + cross-read/cross-write
round-trips against the reference oracle (reference: pygsti/io/stdinput.py,
writers.py)."""

import numpy as np
import pytest

from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.io.stdinput import StdInputParser
from pygsti_tpu.io import readers, writers
from pygsti_tpu.data import simulate_data
from pygsti_tpu.modelpacks import smq1Q_XYI as mp


class TestParserGrammar:
    def test_adjacent_gate_labels_split(self):
        """'GxGx' is two Gx gates (reference grammar G[a-z0-9_]+)."""
        c = Circuit('GxGxGy@(Q0)')
        assert len(c.layertup) == 3
        assert str(c.layertup[0]) == 'Gx'
        assert str(c.layertup[2]) == 'Gy'

    def test_fixed_column_dataline(self):
        p = StdInputParser()
        circuit, counts = p.parse_dataline('GxGy@(Q0) 90 10', expected_counts=2)
        assert counts == [90.0, 10.0]
        assert len(circuit.layertup) == 2

    def test_dataline_sentinels(self):
        p = StdInputParser()
        _, counts = p.parse_dataline('Gx@(Q0) -- 10', expected_counts=2)
        assert counts == ['--', 10.0]
        _, counts = p.parse_dataline('Gx@(Q0) BAD')
        assert counts == ['BAD']

    def test_outcome_count_dataline(self):
        p = StdInputParser()
        _, counts = p.parse_dataline('Gx@(Q0) 0:90 1:10')
        assert counts == [(('0',), 90.0), (('1',), 10.0)]

    def test_datafile_with_times_blocks(self, tmp_path):
        content = """## Outcomes = 0, 1
{}@(Q0)
times: 0.0 1.0 2.0
outcomes: 0 0 1
repetitions: 10 20 5

Gx@(Q0)
times: 0.0 1.0
outcomes: 1 0
repetitions: 7 3
"""
        path = tmp_path / 'tds.txt'
        path.write_text(content)
        ds = StdInputParser().parse_datafile(str(path))
        row = ds[Circuit('{}@(Q0)')]
        assert row.counts[('0',)] == 30
        assert row.counts[('1',)] == 5
        assert list(row.time) == [0.0, 1.0, 2.0]
        row2 = ds[Circuit('Gx@(Q0)')]
        assert row2.counts[('1',)] == 7

    def test_multidatafile(self, tmp_path):
        content = """## Columns = DS0 0 count, DS0 1 count, DS1 0 count, DS1 count total
{}@(Q0) 80 20 30 100
Gx@(Q0) 50 50 60 100
"""
        path = tmp_path / 'mds.txt'
        path.write_text(content)
        mds = StdInputParser().parse_multidatafile(str(path))
        assert set(mds.keys()) == {'DS0', 'DS1'}
        assert mds['DS0'][Circuit('{}@(Q0)')].counts[('0',)] == 80
        # DS1 '1' counts implied from total
        assert mds['DS1'][Circuit('{}@(Q0)')].counts[('1',)] == 70
        assert mds['DS1'][Circuit('Gx@(Q0)')].counts[('0',)] == 60

    def test_frequency_columns(self, tmp_path):
        content = """## Columns = DSa 1 frequency, DSa count total
{}@(Q0) 0.25 200
"""
        path = tmp_path / 'fds.txt'
        path.write_text(content)
        mds = StdInputParser().parse_multidatafile(str(path))
        assert mds['DSa'][Circuit('{}@(Q0)')].counts[('1',)] == 50
        assert mds['DSa'][Circuit('{}@(Q0)')].counts[('0',)] == 150

    def test_tddatafile(self, tmp_path):
        content = """# explicit timestamped format
0.0 Gx@(Q0) 1
1.5 Gx@(Q0) 0
0.7 {}@(Q0) 0
"""
        path = tmp_path / 'td.txt'
        path.write_text(content)
        ds = StdInputParser().parse_tddatafile(str(path))
        row = ds[Circuit('Gx@(Q0)')]
        assert row.total == 2
        assert list(row.time) == [0.0, 1.5]


class TestCrossReadWrite:
    """Round trips vs the reference oracle (SURVEY §4: write files the
    reference can read, read files the reference writes)."""

    @pytest.fixture(scope="class")
    def dataset(self):
        target = mp.target_model('full TP')
        circuits = [Circuit(s) for s in
                    ('{}@(0)', 'Gxpi2:0@(0)', 'Gxpi2:0Gxpi2:0@(0)',
                     'Gypi2:0@(0)', 'Gxpi2:0Gypi2:0@(0)')]
        datagen = target.depolarize(op_noise=0.05)
        return simulate_data(datagen, circuits, 1000, seed=11), circuits

    def test_reference_reads_our_dataset(self, dataset, ref_pygsti, tmp_path):
        ds, circuits = dataset
        path = str(tmp_path / 'ours.txt')
        writers.write_dataset(path, ds)
        ref_ds = ref_pygsti.io.read_dataset(path)
        for c in circuits:
            ref_row = ref_ds[ref_pygsti.circuits.Circuit(c.str)]
            for outcome, cnt in ds[c].counts.items():
                assert ref_row[outcome] == cnt

    def test_we_read_reference_dataset(self, dataset, ref_pygsti, tmp_path):
        ds, circuits = dataset
        ref_ds = ref_pygsti.data.DataSet(outcome_labels=[('0',), ('1',)])
        for c in circuits:
            ref_ds.add_count_dict(ref_pygsti.circuits.Circuit(c.str),
                                  dict(ds[c].counts))
        ref_ds.done_adding_data()
        path = str(tmp_path / 'ref.txt')
        ref_pygsti.io.write_dataset(path, ref_ds)
        ours = readers.read_dataset(path)
        for c in circuits:
            for outcome, cnt in ds[c].counts.items():
                assert ours[c].counts.get(outcome, 0) == cnt

    def test_circuit_list_roundtrip_vs_reference(self, dataset, ref_pygsti,
                                                 tmp_path):
        _, circuits = dataset
        path = str(tmp_path / 'circuits.txt')
        writers.write_circuit_list(path, circuits)
        ref_circuits = ref_pygsti.io.read_circuit_list(path)
        assert [c.str for c in ref_circuits] == [c.str for c in circuits]
        path2 = str(tmp_path / 'ref_circuits.txt')
        ref_pygsti.io.write_circuit_list(path2, ref_circuits)
        back = readers.read_circuit_list(path2)
        assert [c.str for c in back] == [c.str for c in circuits]

    def test_we_read_reference_timeseries(self, ref_pygsti, tmp_path):
        """Reference-written time-series (with_times) datasets parse."""
        ref_ds = ref_pygsti.data.DataSet(outcome_labels=[('0',), ('1',)])
        c = ref_pygsti.circuits.Circuit('Gxpi2:0@(0)')
        ref_ds.add_raw_series_data(c, [('0',), ('1',), ('0',)],
                                   [0.0, 1.0, 2.0], [5, 3, 2])
        ref_ds.done_adding_data()
        path = str(tmp_path / 'ref_ts.txt')
        ref_pygsti.io.write_dataset(path, ref_ds)
        ours = StdInputParser().parse_datafile(path)
        row = ours[Circuit('Gxpi2:0@(0)')]
        assert row.counts[('0',)] == 7
        assert row.counts[('1',)] == 3
