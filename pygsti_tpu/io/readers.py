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


def convert_strings_to_circuits(obj):
    """Inverse of writers.convert_circuits_to_strings: parse any circuit
    string (marked 'circuit/<str>') back into a Circuit (reference:
    readers.convert_strings_to_circuits:352)."""
    from pygsti_tpu.io.stdinput import StdInputParser
    parser = StdInputParser()

    def convert(x):
        if isinstance(x, (list, tuple)):
            return [convert(v) for v in x]
        if isinstance(x, dict):
            return {convert_key(k): convert(v) for k, v in x.items()}
        if isinstance(x, str) and x.startswith('circuit/'):
            return parser.parse_circuit(x[len('circuit/'):])
        return x

    def convert_key(k):
        if isinstance(k, str) and k.startswith('circuit/'):
            return parser.parse_circuit(k[len('circuit/'):])
        return k

    return convert(obj)


def read_circuit_strings(filename):
    """Load a json file written by writers.write_circuit_strings (reference:
    readers.read_circuit_strings:387)."""
    import json
    if str(filename).endswith('.json'):
        with open(filename) as f:
            return convert_strings_to_circuits(json.load(f))
    raise ValueError("Cannot determine format from extension of filename: %s"
                     % str(filename))


def read_edesign_from_dir(dirname, quick_load=False):
    """Load an ExperimentDesign from an edesign directory tree (reference:
    readers.read_edesign_from_dir)."""
    from pygsti_tpu.protocols.protocol import ExperimentDesign
    return ExperimentDesign.from_dir(dirname)


def read_data_from_dir(dirname, preferred_comm=None, quick_load=False):
    """Load a ProtocolData from a data directory tree (reference:
    readers.read_data_from_dir)."""
    from pygsti_tpu.protocols.protocol import ProtocolData
    return ProtocolData.from_dir(dirname)


def read_results_from_dir(dirname, name=None, preferred_comm=None,
                          quick_load=False):
    """Load ProtocolResults (or a results directory) from disk (reference:
    readers.read_results_from_dir)."""
    from pygsti_tpu.protocols.protocol import (ProtocolResults,
                                               ProtocolResultsDir)
    if name is None:
        return ProtocolResultsDir.from_dir(dirname)
    return ProtocolResults.from_dir(dirname, name)


def read_protocol_from_dir(dirname, quick_load=False):
    """Load a serialized Protocol object from disk (reference:
    readers.read_protocol_from_dir)."""
    from pygsti_tpu.io.metadir import _cls_from_meta_json
    cls = _cls_from_meta_json(dirname)
    return cls.from_dir(dirname)


def create_edesign_from_dir(dirname):
    """Create an ExperimentDesign from a bare directory of circuit files
    (edesign/circuits*.txt) when no serialized edesign exists (reference:
    readers.create_edesign_from_dir)."""
    import os
    from pygsti_tpu.protocols.protocol import ExperimentDesign
    edir = os.path.join(str(dirname), 'edesign')
    try:
        return ExperimentDesign.from_dir(dirname)
    except Exception:
        pass
    circuit_files = sorted(
        fn for fn in (os.listdir(edir) if os.path.isdir(edir) else [])
        if fn.startswith('circuits') and fn.endswith('.txt'))
    if not circuit_files:
        raise ValueError("No edesign found under %s" % str(dirname))
    all_circuits = []
    for fn in circuit_files:
        all_circuits.extend(read_circuit_list(os.path.join(edir, fn)))
    return ExperimentDesign(all_circuits)


# -- MongoDB wrappers (reference: readers.read_*_from_mongodb;
#    gated on pymongo, like the reference) ----------------------------------

def _mongo_read(mongodb, collection_name, doc_id):
    from pygsti_tpu.io.mongodb import read_auxtree_from_mongodb
    return read_auxtree_from_mongodb(mongodb[collection_name], doc_id)


def read_edesign_from_mongodb(mongodb, doc_id, quick_load=False, comm=None):
    """Load an ExperimentDesign from MongoDB (reference:
    readers.read_edesign_from_mongodb)."""
    return _mongo_read(mongodb, 'pygsti_experiment_designs', doc_id)


def read_data_from_mongodb(mongodb, doc_id, quick_load=False, comm=None):
    """Load a ProtocolData from MongoDB (reference:
    readers.read_data_from_mongodb)."""
    return _mongo_read(mongodb, 'pygsti_protocol_data', doc_id)


def read_results_from_mongodb(mongodb, doc_id, quick_load=False, comm=None):
    """Load ProtocolResults from MongoDB (reference:
    readers.read_results_from_mongodb)."""
    return _mongo_read(mongodb, 'pygsti_protocol_results', doc_id)


def read_resultsdir_from_mongodb(mongodb, doc_id, quick_load=False,
                                 comm=None, read_all_results_for_data=False):
    """Load a results directory tree from MongoDB (reference:
    readers.read_resultsdir_from_mongodb)."""
    return _mongo_read(mongodb, 'pygsti_protocol_results_dirs', doc_id)


def read_protocol_from_mongodb(mongodb, doc_id, quick_load=False):
    """Load a Protocol object from MongoDB (reference:
    readers.read_protocol_from_mongodb)."""
    return _mongo_read(mongodb, 'pygsti_protocols', doc_id)


def _mongo_remove(mongodb, collection_name, doc_id, session=None):
    from pygsti_tpu.io.mongodb import remove_auxtree_from_mongodb
    return remove_auxtree_from_mongodb(mongodb[collection_name], doc_id,
                                       session=session)


def remove_edesign_from_mongodb(mongodb, doc_id, session=None):
    """Remove an ExperimentDesign from MongoDB (reference:
    readers.remove_edesign_from_mongodb)."""
    return _mongo_remove(mongodb, 'pygsti_experiment_designs', doc_id,
                         session)


def remove_data_from_mongodb(mongodb, doc_id, session=None):
    return _mongo_remove(mongodb, 'pygsti_protocol_data', doc_id, session)


def remove_results_from_mongodb(mongodb, doc_id, session=None):
    return _mongo_remove(mongodb, 'pygsti_protocol_results', doc_id, session)


def remove_resultsdir_from_mongodb(mongodb, doc_id, session=None):
    return _mongo_remove(mongodb, 'pygsti_protocol_results_dirs', doc_id,
                         session)


def remove_protocol_from_mongodb(mongodb, doc_id, session=None):
    return _mongo_remove(mongodb, 'pygsti_protocols', doc_id, session)
