"""Text-format readers (reference: pygsti/io/readers.py:37, stdinput.py).

Dataset format (same as the reference's .txt datasets):

    ## Columns = 0 count, 1 count
    {}@(0)  95  5
    Gxpi2:0@(0)  50  50
"""

from __future__ import annotations

import re

from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.data.dataset import DataSet


def read_circuit_list(filename, read_raw_strings=False, line_labels=None):
    """Read a text file of circuit strings (one per line)."""
    out = []
    with open(filename) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            if read_raw_strings:
                out.append(line)
            else:
                out.append(Circuit(line, line_labels))
    return out


def read_dataset(filename, cache=False, collision_action="aggregate",
                 record_zero_counts=False, ignore_zero_count_lines=True,
                 with_times="auto", circuit_parse_cache=None, verbosity=1):
    """Read a text-format dataset file (full grammar: fixed/typed columns,
    outcome:count pairs, time-series blocks -- see io/stdinput.py)."""
    from pygsti_tpu.io.stdinput import StdInputParser
    return StdInputParser().parse_datafile(
        filename, collision_action=collision_action,
        record_zero_counts=record_zero_counts,
        ignore_zero_count_lines=ignore_zero_count_lines,
        with_times=with_times)


def read_multidataset(filename, cache=False, collision_action="aggregate",
                      record_zero_counts=False, verbosity=1):
    """Read a multi-dataset text file (reference: io/readers.py
    read_multidataset)."""
    from pygsti_tpu.io.stdinput import StdInputParser
    return StdInputParser().parse_multidatafile(
        filename, collision_action=collision_action,
        record_zero_counts=record_zero_counts)


def read_time_dependent_dataset(filename, record_zero_counts=True):
    """Read an explicitly timestamped dataset file (reference: io/readers.py
    read_time_dependent_dataset)."""
    from pygsti_tpu.io.stdinput import StdInputParser
    return StdInputParser().parse_tddatafile(
        filename, record_zero_counts=record_zero_counts)


# legacy aliases
load_dataset = read_dataset
load_circuit_list = read_circuit_list
load_multidataset = read_multidataset
