"""Free-form data simulators: compute per-circuit model quantities into a
FreeformDataSet (reference: pygsti/protocols/freeformsim.py:93
ModelFreeformSimulator; protocol.py:3568 DataSimulator).
"""

from __future__ import annotations

import numpy as np

from pygsti_tpu.data.freedataset import FreeformDataSet
from pygsti_tpu.protocols.protocol import ProtocolData


class DataSimulator(object):
    """Base: run(edesign) -> ProtocolData (reference: protocol.py:3568)."""

    def run(self, edesign, memlimit=None, comm=None):
        raise NotImplementedError


class FreeformDataSimulator(DataSimulator):
    """Computes a dict of data for each circuit via compute_freeform_data
    (reference: freeformsim.py:24)."""

    def compute_freeform_data(self, circuit):
        raise NotImplementedError

    def apply(self, edesign, memlimit=None, comm=None):
        ds = FreeformDataSet(circuits=list(edesign.all_circuits_needing_data))
        for c in edesign.all_circuits_needing_data:
            ds[c] = self.compute_freeform_data(c)
        return ds

    def run(self, edesign, memlimit=None, comm=None):
        return ProtocolData(edesign, self.apply(edesign, memlimit, comm))


class ModelFreeformSimulator(FreeformDataSimulator):
    """Per-circuit quantities (probabilities, final states, process matrices)
    for a dictionary of models (reference: freeformsim.py:93)."""

    def __init__(self, models):
        self.models = dict(models or {})

    def compute_process_matrix(self, model, circuit, include_final_state=False,
                               include_probabilities=False):
        import jax.numpy as jnp
        tensors = model.tensors_fn()(jnp.asarray(model.to_vector()))
        G = np.asarray(tensors.ops)
        op_keys = model.op_keys
        dim = model.dim
        mx = np.eye(dim)
        for lbl in circuit.layertup:
            mx = G[op_keys.index(lbl)] @ mx
        if not (include_final_state or include_probabilities):
            return mx
        ret = [mx]
        rho = np.asarray(tensors.preps)[0]
        final_state = mx @ rho
        if include_final_state:
            ret.append(final_state)
        if include_probabilities:
            E = np.asarray(tensors.effects)
            ret.append(E @ final_state)
        return tuple(ret)

    def compute_final_state(self, model, circuit, include_probabilities=False):
        out = self.compute_process_matrix(model, circuit,
                                          include_final_state=True,
                                          include_probabilities=include_probabilities)
        return out[1:] if include_probabilities else out[1]

    def compute_circuit_probabilities(self, model, circuit):
        return model.probabilities(circuit)

    def compute_freeform_data(self, circuit):
        data = {}
        for lbl, model in self.models.items():
            probs = self.compute_circuit_probabilities(model, circuit)
            for outcome, p in probs.items():
                key = outcome[0] if len(outcome) == 1 else str(outcome)
                data['%s probs %s' % (lbl, key)] = float(p)
        return data


class ModelDatasetSimulator(DataSimulator):
    """Shot-sampling data simulator: produces a normal DataSet by sampling
    the model's outcome distributions (the DataSimulator counterpart of
    data.simulate_data; reference: protocol.py:3568)."""

    def __init__(self, model, num_samples=1000, seed=None, sample_error='multinomial'):
        self.model = model
        self.num_samples = num_samples
        self.seed = seed
        self.sample_error = sample_error

    def run(self, edesign, memlimit=None, comm=None):
        from pygsti_tpu.data.datasetconstruction import simulate_data
        ds = simulate_data(self.model, edesign.all_circuits_needing_data,
                           self.num_samples, sample_error=self.sample_error,
                           seed=self.seed)
        return ProtocolData(edesign, ds)
