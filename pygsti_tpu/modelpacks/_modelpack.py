"""Model pack base machinery (reference: pygsti/modelpacks/_modelpack.py:53).

A model pack bundles a target gate set with precomputed GST ingredients
(germs, prep/meas fiducials) and convenience constructors.
"""

from __future__ import annotations

import numpy as np

from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.processors.processorspec import QubitProcessorSpec
from pygsti_tpu.models.modelconstruction import create_explicit_model


class GSTModelPack(object):
    """Base for GST model packs: subclass sets _gates, _germs, _germs_lite,
    _prep_fids, _meas_fids (as circuit strings) and _nqubits."""

    _nqubits = 1
    _gates = []            # gate names (e.g. ['Gxpi2', 'Gypi2'])
    _include_idle = True   # include the global-idle '[]' operation
    _germs = []
    _germs_lite = None
    _prep_fids = []
    _meas_fids = []
    _global_fid_pairs = None
    _pergerm_fid_pairs = None
    _availability = None   # optional {gate_name: [qubit-tuples]} restriction
    _op_order = None       # optional [(gate_name, qubit-index-tuple)] to match
    #                        the reference pack's operation ordering ('' = idle)

    @classmethod
    def _check_qubit_labels(cls, qubit_labels):
        if qubit_labels is None:
            return None
        qubit_labels = tuple(qubit_labels)
        assert len(qubit_labels) == cls._nqubits, \
            "Expected %d qubit labels and got: %s!" % (cls._nqubits, str(qubit_labels))
        return qubit_labels

    @classmethod
    def _relabel(cls, circuits, qubit_labels):
        """Relabel default integer qubit labels 0..n-1 to `qubit_labels`
        (reference: _modelpack.py _indexed_circuits / qubit_labels args)."""
        qubit_labels = cls._check_qubit_labels(qubit_labels)
        if qubit_labels is None or qubit_labels == tuple(range(cls._nqubits)):
            return circuits
        mapper = dict(enumerate(qubit_labels))
        return [c.map_state_space_labels(mapper) for c in circuits]

    @classmethod
    def processor_spec(cls, qubit_labels=None):
        names = list(cls._gates)
        if cls._include_idle:
            names = ['{idle}'] + names
        return QubitProcessorSpec(cls._nqubits, names, geometry='line',
                                  availability=cls._availability,
                                  qubit_labels=cls._check_qubit_labels(qubit_labels))

    @classmethod
    def target_model(cls, gate_type='full', prep_type='auto', povm_type='auto',
                     simulator='auto', basis='pp', qubit_labels=None):
        ideal_spam = 'auto'
        if prep_type == 'auto' and povm_type == 'auto':
            if gate_type in ('full TP', 'TP'):
                ideal_spam = 'full TP'
            elif gate_type in ('full', 'full arbitrary'):
                ideal_spam = 'full'
            elif gate_type in ('static',):
                ideal_spam = 'computational'
            elif gate_type in ('CPTP', 'CPTPLND', 'GLND', 'H+S', 'H+s'):
                ideal_spam = gate_type
        mdl = create_explicit_model(
            cls.processor_spec(qubit_labels), basis=basis, ideal_gate_type=gate_type,
            ideal_spam_type=ideal_spam,
            ideal_prep_type=prep_type, ideal_povm_type=povm_type,
            simulator=simulator)
        if cls._op_order is not None:
            from pygsti_tpu.baseobjs.label import Label
            qlbls = cls._check_qubit_labels(qubit_labels) or tuple(range(cls._nqubits))
            order = [Label(()) if name == '' else
                     Label((name,) + tuple(qlbls[i] for i in idxs))
                     for name, idxs in cls._op_order]
            ops = {k: mdl.operations[k] for k in order if k in mdl.operations}
            ops.update({k: v for k, v in mdl.operations.items() if k not in ops})
            for k in list(mdl.operations.keys()):
                del mdl.operations[k]
            for k, v in ops.items():
                mdl.operations[k] = v
        return mdl

    @classmethod
    def germs(cls, lite=False, qubit_labels=None):
        strs = cls._germs_lite if (lite and cls._germs_lite is not None) else cls._germs
        return cls._relabel([Circuit(s) for s in strs], qubit_labels)

    @classmethod
    def prep_fiducials(cls, qubit_labels=None):
        return cls._relabel([Circuit(s) for s in cls._prep_fids], qubit_labels)

    @classmethod
    def meas_fiducials(cls, qubit_labels=None):
        return cls._relabel([Circuit(s) for s in cls._meas_fids], qubit_labels)

    @classmethod
    def clifford_compilation(cls, max_length=7):
        """For 1Q packs whose gates generate the Clifford group: an
        OrderedDict mapping 'Gc0'..'Gc23' to shortest label-tuple words
        implementing each Clifford (reference: smq1Q_XYI.py:43
        _clifford_compilation; computed here by breadth-first search over
        gate words instead of stored tables).  Returns None if the pack's
        gates do not reach all 24 Cliffords within `max_length`."""
        import collections
        from pygsti_tpu.tools.internalgates import standard_gatename_unitaries
        from pygsti_tpu.tools.optools import unitary_to_superop
        from pygsti_tpu.baseobjs.basis import Basis

        if cls._nqubits != 1:
            return None
        std = standard_gatename_unitaries()
        basis = Basis.cast('pp', 4)

        def superop(name):
            return np.real(unitary_to_superop(std[name], basis))

        gate_sups = {g: superop(g) for g in cls._gates if g in std}
        targets = {('Gc%d' % i): superop('Gc%d' % i).round(8)
                   for i in range(24)}

        def key(mx):
            return tuple(np.round(mx, 6).ravel())

        found = {}          # clifford name -> word (tuple of gate names)
        frontier = {key(np.eye(4)): ()}
        seen = set(frontier)
        for _ in range(max_length + 1):
            for k, word in list(frontier.items()):
                mx = np.eye(4)
                for g in word:
                    mx = gate_sups[g] @ mx
                for cname, tmx in targets.items():
                    if cname not in found and np.allclose(mx, tmx, atol=1e-6):
                        found[cname] = word
            if len(found) == 24:
                break
            new_frontier = {}
            for k, word in frontier.items():
                mx = np.eye(4)
                for g in word:
                    mx = gate_sups[g] @ mx
                for g, gs in gate_sups.items():
                    nmx = gs @ mx
                    nk = key(nmx)
                    if nk not in seen:
                        seen.add(nk)
                        new_frontier[nk] = word + (g,)
            frontier = new_frontier
        if len(found) < 24:
            return None
        out = collections.OrderedDict()
        for i in range(24):
            word = found['Gc%d' % i]
            out['Gc%d' % i] = [(g, 0) for g in word] if word else [()]
        return out

    @classmethod
    def _fidpairs_entry(cls):
        from pygsti_tpu.modelpacks._fidpairs_data import FIDPAIRS
        return FIDPAIRS.get(cls.__module__.rsplit('.', 1)[-1], {})

    @classmethod
    def pergerm_fidpair_dict(cls, qubit_labels=None, lite=True):
        """The pack's precomputed per-germ fiducial-pair-reduction dict
        {germ Circuit: [(iPrep, iMeas), ...]}, or None if the pack carries
        no FPR data (reference: _modelpack.pergerm_fidpair_dict[_lite]:290;
        data ported verbatim in modelpacks/_fidpairs_data.py)."""
        from pygsti_tpu.circuits.circuit import Circuit
        data = cls._fidpairs_entry().get('pergerm_lite' if lite else 'pergerm')
        if data is None:
            return None
        germs = {c.str: c for c in cls.germs(lite)}
        out = {}
        for gstr, pairs in data.items():
            c = germs.get(gstr, Circuit(gstr))
            if qubit_labels is not None:
                c = cls._relabel([c], qubit_labels)[0]
            out[c] = [tuple(p) for p in pairs]
        return out

    @classmethod
    def global_fidpairs(cls, lite=True):
        """The pack's precomputed global fiducial-pair list, or None
        (reference pack attribute global_fidpairs[_lite])."""
        data = cls._fidpairs_entry()
        return data.get('global_lite' if lite else 'global')

    @classmethod
    def create_gst_experiment_design(cls, max_max_length, qubit_labels=None,
                                     fpr=False, lite=True, **kwargs):
        """Standard GST experiment design up to the given max length
        (reference: _modelpack.py:331).  With ``fpr=True`` the design keeps
        only the pack's precomputed per-germ fiducial pairs (reference
        :371); packs without FPR data raise ValueError."""
        from pygsti_tpu.protocols.gst import StandardGSTDesign
        if fpr:
            fidpairs = cls.pergerm_fidpair_dict(qubit_labels, lite=lite)
            if fidpairs is None:
                raise ValueError("No FPR information for lite=%s" % lite)
            kwargs = dict(kwargs, fiducial_pairs=fidpairs)
        maxlengths = [2 ** i for i in range(int(np.log2(max_max_length)) + 1)]
        return StandardGSTDesign(cls.target_model('static', qubit_labels=qubit_labels),
                                 cls.prep_fiducials(qubit_labels),
                                 cls.meas_fiducials(qubit_labels),
                                 cls.germs(lite, qubit_labels), maxlengths,
                                 **kwargs)
