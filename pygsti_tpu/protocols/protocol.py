"""Protocol framework: ExperimentDesign / ProtocolData / Protocol / Results
(reference: pygsti/protocols/protocol.py:105,900,2255,2711).

Objects serialize to directory trees (edesign/ data/ results/ subdirs with
JSON files), supporting the same save/load workflow as the reference's
metadir system in simplified JSON-only form.
"""

from __future__ import annotations

import collections
import json
import os
import pathlib

import numpy as np

from pygsti_tpu.baseobjs.nicelyserializable import NicelySerializable, encode_value, decode_value
from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.circuits.circuitlist import CircuitList
from pygsti_tpu.data.dataset import DataSet


class ExperimentDesign(NicelySerializable):
    """A set of circuits to run + metadata; nestable into trees
    (reference: protocol.py:900)."""

    collection_type = "ExperimentDesign"

    def __init__(self, circuits=None, qubit_labels=None, children=None):
        self._all_circuits_needing_data = [c if isinstance(c, Circuit) else Circuit(c)
                                           for c in (circuits or [])]
        self.qubit_labels = tuple(qubit_labels) if qubit_labels is not None else None
        self._children = collections.OrderedDict(children or {})
        self.auxfile_types = {}

    @property
    def all_circuits_needing_data(self):
        if self._all_circuits_needing_data:
            return list(self._all_circuits_needing_data)
        out, seen = [], set()
        for child in self._children.values():
            for c in child.all_circuits_needing_data:
                if c not in seen:
                    seen.add(c)
                    out.append(c)
        return out

    # -- tree protocol --------------------------------------------------------
    def keys(self):
        return list(self._children.keys())

    def items(self):
        return self._children.items()

    def __getitem__(self, key):
        return self._children[key]

    def __contains__(self, key):
        return key in self._children

    # -- serialization --------------------------------------------------------
    def _to_nice_serialization(self):
        return {
            'circuits': [c.str for c in self._all_circuits_needing_data],
            'qubit_labels': list(self.qubit_labels) if self.qubit_labels else None,
            'children': {str(k): v.to_nice_serialization() for k, v in self._children.items()},
        }

    @classmethod
    def _from_nice_serialization(cls, state):
        children = {k: NicelySerializable.from_nice_serialization(v)
                    for k, v in state.get('children', {}).items()}
        return cls(circuits=[Circuit(s) for s in state['circuits']],
                   qubit_labels=state.get('qubit_labels'), children=children)

    def write(self, dirname):
        p = pathlib.Path(dirname)
        (p / 'edesign').mkdir(parents=True, exist_ok=True)
        with open(p / 'edesign' / 'edesign.json', 'w') as f:
            json.dump(encode_value(self.to_nice_serialization()), f, indent=1)

    @classmethod
    def from_dir(cls, dirname):
        p = pathlib.Path(dirname)
        with open(p / 'edesign' / 'edesign.json') as f:
            return NicelySerializable.from_nice_serialization(decode_value(json.load(f)))


class CircuitListsDesign(ExperimentDesign):
    """An experiment design with multiple circuit lists (e.g. GST iterations)
    (reference: protocol.py CircuitListsDesign)."""

    def __init__(self, circuit_lists, all_circuits_needing_data=None, qubit_labels=None,
                 nested=False):
        self.circuit_lists = [CircuitList.cast(cl) for cl in circuit_lists]
        self.nested = nested
        if all_circuits_needing_data is None:
            seen = set()
            all_c = []
            for cl in self.circuit_lists:
                for c in cl:
                    if c not in seen:
                        seen.add(c)
                        all_c.append(c)
            all_circuits_needing_data = all_c
        super().__init__(all_circuits_needing_data, qubit_labels)

    def _to_nice_serialization(self):
        state = super()._to_nice_serialization()
        state['circuit_lists'] = [[c.str for c in cl] for cl in self.circuit_lists]
        state['nested'] = self.nested
        return state

    @classmethod
    def _from_nice_serialization(cls, state):
        lists = [[Circuit(s) for s in cl] for cl in state['circuit_lists']]
        return cls(lists, [Circuit(s) for s in state['circuits']],
                   state.get('qubit_labels'), state.get('nested', False))


class CombinedExperimentDesign(ExperimentDesign):
    """Several named sub-designs run together (reference: protocol.py:1703)."""

    def __init__(self, sub_designs, qubit_labels=None):
        super().__init__(None, qubit_labels, children=sub_designs)


class SimultaneousExperimentDesign(ExperimentDesign):
    """Side-by-side designs on disjoint qubit subsets (reference:
    protocol.py:1934).  Circuits are tensored across sub-designs."""

    def __init__(self, edesigns, qubit_labels=None):
        children = collections.OrderedDict()
        for ed in edesigns:
            key = tuple(ed.qubit_labels) if ed.qubit_labels else ('*',)
            children[str(key)] = ed
        # parallel-compose circuits layer by layer
        max_len = max(len(ed.all_circuits_needing_data) for ed in edesigns)
        circuits = []
        for i in range(max_len):
            layer_groups = []
            max_depth = 0
            for ed in edesigns:
                cl = ed.all_circuits_needing_data
                c = cl[i] if i < len(cl) else Circuit((), ed.qubit_labels)
                layer_groups.append(c)
                max_depth = max(max_depth, c.depth)
            all_lines = []
            for c in layer_groups:
                all_lines.extend(c.line_labels if c.line_labels != ('*',) else [])
            layers = []
            for t in range(max_depth):
                comps = []
                for c in layer_groups:
                    if t < c.depth:
                        lbl = c[t]
                        comps.extend(lbl.components if not lbl.is_simple else (lbl,))
                from pygsti_tpu.baseobjs.label import LabelTupTup
                layers.append(LabelTupTup.init(tuple(comps)))
            circuits.append(Circuit(layers, tuple(all_lines) if all_lines else None))
        super().__init__(circuits, qubit_labels, children=children)


class FreeformDesign(ExperimentDesign):
    """Circuits with per-circuit auxiliary info (reference: protocol.py:2135)."""

    def __init__(self, circuits, qubit_labels=None):
        if isinstance(circuits, dict):
            self.aux_info = dict(circuits)
            circuits = list(circuits.keys())
        else:
            self.aux_info = {c: None for c in circuits}
        super().__init__(circuits, qubit_labels)


class ProtocolData(object):
    """An experiment design + the data taken for it (reference: protocol.py:2255)."""

    def __init__(self, edesign, dataset=None):
        self.edesign = edesign if edesign is not None else ExperimentDesign()
        self.dataset = dataset

    @property
    def passes(self):
        return {None: self}

    def is_multipass(self):
        return False

    def keys(self):
        return self.edesign.keys()

    def items(self):
        for k, sub in self.edesign.items():
            yield k, ProtocolData(sub, self.dataset)

    def __getitem__(self, key):
        return ProtocolData(self.edesign[key], self.dataset)

    def write(self, dirname):
        p = pathlib.Path(dirname)
        self.edesign.write(dirname)
        (p / 'data').mkdir(parents=True, exist_ok=True)
        if self.dataset is not None:
            with open(p / 'data' / 'dataset.json', 'w') as f:
                json.dump(encode_value(self.dataset.to_nice_serialization()), f)

    @classmethod
    def from_dir(cls, dirname):
        p = pathlib.Path(dirname)
        edesign = ExperimentDesign.from_dir(dirname)
        ds = None
        if (p / 'data' / 'dataset.json').exists():
            with open(p / 'data' / 'dataset.json') as f:
                ds = DataSet.from_nice_serialization(decode_value(json.load(f)))
        elif (p / 'data' / 'dataset.txt').exists():
            # text-format dataset (e.g. written by write_empty_protocol_data
            # and filled in -- the reference's standard user workflow)
            from pygsti_tpu.io.readers import read_dataset
            ds = read_dataset(str(p / 'data' / 'dataset.txt'))
        return cls(edesign, ds)


class Protocol(NicelySerializable):
    """Base protocol: .run(data) -> ProtocolResults (reference: protocol.py:105)."""

    def __init__(self, name=None):
        self.name = name or type(self).__name__

    def run(self, data, memlimit=None, comm=None):
        raise NotImplementedError()


class ProtocolResults(object):
    """Results of running a protocol (reference: protocol.py:2711)."""

    def __init__(self, data, protocol_instance):
        self.data = data
        self.protocol = protocol_instance

    @property
    def edesign(self):
        return self.data.edesign

    @property
    def dataset(self):
        return self.data.dataset

    def to_nice_serialization(self):
        return {'protocol_name': self.protocol.name}

    def write(self, dirname):
        p = pathlib.Path(dirname)
        self.data.write(dirname)
        rd = p / 'results'
        rd.mkdir(parents=True, exist_ok=True)
        state = self.to_nice_serialization()
        state['results_type'] = '%s.%s' % (type(self).__module__,
                                           type(self).__name__)
        with open(rd / ('%s.json' % self.protocol.name), 'w') as f:
            json.dump(encode_value(state), f, indent=1)

    @classmethod
    def from_dir(cls, dirname, name=None, preferred_comm=None,
                 quick_load=False):
        """Load results written by `write` (reference:
        protocol.ProtocolResults.from_dir).  `name` selects the protocol
        when several results live in the directory (default: the only
        one)."""
        import importlib
        p = pathlib.Path(dirname)
        rd = p / 'results'
        files = sorted(rd.glob('*.json'))
        if name is not None:
            files = [rd / ('%s.json' % name)]
        if not files:
            raise ValueError("No results found under %s" % str(rd))
        with open(files[0]) as f:
            state = decode_value(json.load(f))
        data = ProtocolData.from_dir(dirname)
        type_name = state.get('results_type')
        if type_name:
            mod, clsname = type_name.rsplit('.', 1)
            rcls = getattr(importlib.import_module(mod), clsname)
        else:
            rcls = cls
        if hasattr(rcls, '_from_nice_serialization_with_data'):
            return rcls._from_nice_serialization_with_data(state, data)
        protocol = Protocol(state.get('protocol_name'))
        return rcls(data, protocol)


class ProtocolResultsDir(object):
    """Tree of results mirroring an edesign tree (reference: protocol.py:3065)."""

    def __init__(self, data, protocol_results=None, children=None):
        self.data = data
        self.for_protocol = dict(protocol_results or {})
        self._children = dict(children or {})

    def keys(self):
        return self._children.keys()

    def __getitem__(self, key):
        return self._children[key]


class DefaultRunner(object):
    """Run a protocol over every node of a data tree (reference: protocol.py:827)."""

    def __init__(self, protocol):
        self.protocol = protocol

    def run(self, data):
        results = {self.protocol.name: self.protocol.run(data)}
        children = {k: DefaultRunner(self.protocol).run(sub) for k, sub in data.items()}
        return ProtocolResultsDir(data, results, children)


class ProtocolCheckpoint(NicelySerializable):
    """Serializable checkpoint base (reference: protocol.py:3720)."""

    def __init__(self, name, parent=None):
        self.name = name
        self.parent = parent

    def write(self, path):
        with open(path, 'w') as f:
            json.dump(encode_value(self.to_nice_serialization()), f, indent=1)

    @classmethod
    def read(cls, path):
        with open(path) as f:
            return NicelySerializable.from_nice_serialization(decode_value(json.load(f)))


def _protocol_run_mpi(self, data, dirname, num_processes=1, slurm=False,
                      **slurm_kwargs):
    """Stage this protocol + data for multi-host execution and (when
    possible) launch the generated runner (reference: protocol.py:202
    run_mpi / :395 stage_slurm — the TPU analogue uses jax.distributed
    instead of mpiexec; see tools/launchtools.py)."""
    from pygsti_tpu.tools.launchtools import stage_protocol_run
    return stage_protocol_run(self, data, dirname, slurm=slurm,
                              **slurm_kwargs)


Protocol.run_mpi = _protocol_run_mpi
Protocol.stage_slurm = lambda self, data, dirname, **kw: \
    _protocol_run_mpi(self, data, dirname, slurm=True, **kw)


class MultiPassResults(ProtocolResults):
    """Results from each pass plus the sub-protocol results (reference:
    protocol.py:2951)."""

    def __init__(self, data, protocol_instance, passes=None):
        super().__init__(data, protocol_instance)
        self.passes = collections.OrderedDict(passes or {})

    def to_nice_serialization(self):
        state = super().to_nice_serialization()
        state['pass_names'] = list(self.passes.keys())
        return state


class MultiPassProtocol(Protocol):
    """Run a sub-protocol on each pass of a multi-pass dataset (reference:
    protocol.py:573)."""

    def __init__(self, protocol, name=None):
        super().__init__(name or ('MultiPass' + protocol.name))
        self.protocol = protocol

    def run(self, data, memlimit=None, comm=None):
        from pygsti_tpu.data.multidataset import MultiDataSet
        ds = data.dataset
        passes = collections.OrderedDict()
        if isinstance(ds, MultiDataSet):
            for pass_name in ds.keys():
                sub = ProtocolData(data.edesign, ds[pass_name])
                passes[pass_name] = self.protocol.run(sub, memlimit, comm)
        else:
            passes[None] = self.protocol.run(data, memlimit, comm)
        return MultiPassResults(data, self, passes)


class ProtocolPostProcessor(object):
    """A 'protocol' that operates on RESULTS rather than data (reference:
    protocol.py:3469)."""

    def __init__(self, name=None):
        self.name = name or type(self).__name__

    def run(self, results, memlimit=None, comm=None):
        raise NotImplementedError()


class TreeRunner(object):
    """Run specified protocols on specified tree nodes (reference:
    protocol.py:682).  `protocol_dict` maps tree paths (tuples of keys)
    to Protocol objects."""

    def __init__(self, protocol_dict):
        self.protocols = dict(protocol_dict)

    def run(self, data, memlimit=None, comm=None):
        results = {}
        children = {}
        for path, proto in self.protocols.items():
            node = data
            for k in path:
                node = node[k]
            results.setdefault(path, {})[proto.name] = \
                proto.run(node, memlimit, comm)
        root_results = results.get((), {})
        for path, res in results.items():
            if path:
                children[path] = res
        return ProtocolResultsDir(data, root_results, children)


class SimpleRunner(object):
    """Run one protocol on every node that has data (reference:
    protocol.py:743)."""

    def __init__(self, protocol, protocol_can_handle_multipass_data=False,
                 edesign_type='all'):
        self.protocol = protocol
        self.edesign_type = edesign_type

    def run(self, data, memlimit=None, comm=None):
        results = {}
        if data.dataset is not None and (
                self.edesign_type == 'all'
                or isinstance(data.edesign, self.edesign_type)):
            try:
                results[self.protocol.name] = self.protocol.run(
                    data, memlimit, comm)
            except Exception:
                pass  # nodes the protocol can't handle are skipped
        children = {k: SimpleRunner(self.protocol,
                                    edesign_type=self.edesign_type).run(sub)
                    for k, sub in data.items()}
        return ProtocolResultsDir(data, results, children)


class SlurmSettings(object):
    """SLURM job settings for staged runs (reference: protocol.py:35
    SlurmSettings; consumed by tools/launchtools.build_slurm_script)."""

    def __init__(self, num_nodes=1, num_procs_per_node=1, time_limit=None,
                 partition=None, account=None, extra_sbatch_lines=()):
        self.num_nodes = num_nodes
        self.num_procs_per_node = num_procs_per_node
        self.time_limit = time_limit
        self.partition = partition
        self.account = account
        self.extra_sbatch_lines = tuple(extra_sbatch_lines)


class DataCountsSimulator(object):
    """Simulate outcome-count data from a model for an edesign (reference:
    protocol.py:3608 DataCountsSimulator)."""

    def __init__(self, model, num_samples=1000, sample_error='multinomial',
                 seed=None, alias_dict=None, collision_action='aggregate',
                 record_zero_counts=True, times=None):
        self.model = model
        self.num_samples = num_samples
        self.sample_error = sample_error
        self.seed = seed
        self.times = times

    def run(self, edesign, memlimit=None, comm=None):
        from pygsti_tpu.data.datasetconstruction import simulate_data
        ds = simulate_data(self.model,
                           list(edesign.all_circuits_needing_data),
                           self.num_samples, sample_error=self.sample_error,
                           seed=self.seed)
        return ProtocolData(edesign, ds)


class ProtocolRunner(object):
    """Base class for objects that run protocols over an entire tree of
    data, producing a ProtocolResultsDir (reference: protocol.py:647)."""

    def run(self, data, memlimit=None, comm=None):
        raise NotImplementedError("Derived classes should implement run()")


class CanCreateAllCircuitsDesign(ExperimentDesign):
    """ExperimentDesign whose all_circuits_needing_data can be regenerated
    from other attributes, so it is skipped during serialization
    (reference: protocol.py:1400)."""

    def _create_all_circuits_needing_data(self):
        raise NotImplementedError("Derived classes should implement this")


class DataSimulator(object):
    """Analysis routine run on an experiment design to produce per-circuit
    data: edesign in, ProtocolData out (reference: protocol.py:3568)."""

    def run(self, edesign, memlimit=None, comm=None):
        raise NotImplementedError("Derived classes should implement run()")


def run_default_protocols(data, memlimit=None, comm=None):
    """Run the default protocols registered on each node of the data tree
    (reference: protocol.py:3446)."""
    results = {}
    edesign = data.edesign
    for name, protocol in getattr(edesign, 'default_protocols',
                                  {}).items():
        results[name] = protocol.run(data)
    children = {k: run_default_protocols(sub)
                for k, sub in (data.items()
                               if hasattr(data, 'items') else [])}
    return ProtocolResultsDir(data, results, children)
