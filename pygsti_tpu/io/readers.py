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
    """Read a text-format dataset file."""
    outcome_labels = None
    ds = DataSet()
    with open(filename) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith('##'):
                m = re.match(r'##\s*Columns\s*=\s*(.*)', line)
                if m:
                    cols = [c.strip() for c in m.group(1).split(',')]
                    outcome_labels = []
                    for c in cols:
                        cm = re.match(r'(.*?)\s+count$', c)
                        outcome_labels.append(cm.group(1).strip() if cm else c)
                continue
            if line.startswith('#'):
                continue
            parts = line.split()
            # circuit string is the first token; counts follow
            cstr = parts[0]
            counts = [float(x) for x in parts[1:]]
            assert outcome_labels is not None, "Missing '## Columns =' header"
            cdict = {}
            for ol, cnt in zip(outcome_labels, counts):
                if cnt != 0 or record_zero_counts:
                    cdict[ol] = int(cnt) if cnt == int(cnt) else cnt
            ds.add_count_dict(Circuit(cstr), cdict,
                              record_zero_counts=record_zero_counts)
    return ds


# legacy aliases
load_dataset = read_dataset
load_circuit_list = read_circuit_list
