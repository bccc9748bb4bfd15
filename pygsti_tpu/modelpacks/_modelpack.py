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

    @classmethod
    def processor_spec(cls):
        names = list(cls._gates)
        if cls._include_idle:
            names = ['{idle}'] + names
        return QubitProcessorSpec(cls._nqubits, names, geometry='line',
                                  availability=cls._availability)

    @classmethod
    def target_model(cls, gate_type='full', prep_type='auto', povm_type='auto',
                     simulator='auto', basis='pp'):
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
        return create_explicit_model(
            cls.processor_spec(), basis=basis, ideal_gate_type=gate_type,
            ideal_spam_type=ideal_spam,
            ideal_prep_type=prep_type, ideal_povm_type=povm_type,
            simulator=simulator)

    @classmethod
    def germs(cls, lite=False):
        strs = cls._germs_lite if (lite and cls._germs_lite is not None) else cls._germs
        return [Circuit(s) for s in strs]

    @classmethod
    def prep_fiducials(cls):
        return [Circuit(s) for s in cls._prep_fids]

    @classmethod
    def meas_fiducials(cls):
        return [Circuit(s) for s in cls._meas_fids]

    @classmethod
    def create_gst_experiment_design(cls, max_max_length, qubit_labels=None,
                                     fpr=False, lite=True, **kwargs):
        """Standard GST experiment design up to the given max length
        (reference: _modelpack.py:331)."""
        from pygsti_tpu.protocols.gst import StandardGSTDesign
        maxlengths = [2 ** i for i in range(int(np.log2(max_max_length)) + 1)]
        return StandardGSTDesign(cls.target_model('static'), cls.prep_fiducials(),
                                 cls.meas_fiducials(), cls.germs(lite), maxlengths,
                                 **kwargs)
