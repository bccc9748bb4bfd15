"""ModelTest protocol: evaluate a fixed model against data
(reference: pygsti/protocols/modeltest.py:30)."""

from __future__ import annotations

import numpy as np

from pygsti_tpu.baseobjs.verbosityprinter import VerbosityPrinter
from pygsti_tpu.protocols.protocol import Protocol, ProtocolCheckpoint
from pygsti_tpu.protocols.gst import ModelEstimateResults
from pygsti_tpu.protocols.estimate import Estimate
from pygsti_tpu.objectivefns.objectivefns import (ObjectiveFunctionBuilder,
                                                  TimeIndependentMDCObjectiveFunction)


class ModelTest(Protocol):
    """Tests a model against data without optimization."""

    def __init__(self, model_to_test, target_model=None, gaugeopt_suite=None,
                 objfn_builder=None, badfit_options=None, verbosity=2, name=None):
        super().__init__(name)
        self.model_to_test = model_to_test
        self.target_model = target_model
        self.objfn_builder = ObjectiveFunctionBuilder.cast(objfn_builder or 'logl')
        self.verbosity = verbosity

    def run(self, data, memlimit=None, comm=None, checkpoint=None, checkpoint_path=None,
            disable_checkpointing=False):
        printer = VerbosityPrinter.create_printer(self.verbosity)
        edesign = data.edesign
        ds = data.dataset
        target = self.target_model if self.target_model is not None else \
            getattr(edesign, 'target_model', None)
        circuit_lists = getattr(edesign, 'circuit_lists',
                                [edesign.all_circuits_needing_data])

        # per-iteration checkpointing (reference: modeltest.py:297 +
        # run:~150): completed circuit-list evaluations are skipped on
        # resume, mirroring GateSetTomography.run's protocol
        if disable_checkpointing:
            checkpoint = None
            start = 0
        else:
            if checkpoint_path is None:
                checkpoint_path = 'gst_checkpoints/' + (self.name or 'ModelTest')
            import os as _os
            _os.makedirs(_os.path.dirname(checkpoint_path) or '.',
                         exist_ok=True)
            if checkpoint is None:
                checkpoint = ModelTestCheckpoint(name=self.name)
            elif not isinstance(checkpoint, ModelTestCheckpoint):
                raise TypeError("'checkpoint' must be a ModelTestCheckpoint")
            start = checkpoint.last_completed_iter + 1
            if start > 0:
                printer.log("Resuming ModelTest from checkpoint: %d of %d "
                            "iterations done" % (start, len(circuit_lists)))

        objfn_vals = list(checkpoint.objfn_vals[:start]) if checkpoint else []
        percircuit_by_iter = [np.asarray(pc) for pc in
                              (checkpoint.percircuit_vals[:start]
                               if checkpoint else [])]
        for i, cl in enumerate(circuit_lists):
            if i < start:
                continue
            obj = self.objfn_builder.build(self.model_to_test, ds, list(cl))
            # per-circuit terms (incl. the omitted-probability correction)
            # compile ONLY the probs graph; their sum equals fn() when no
            # penalties are configured, which skips compiling the separate
            # full-objective graph -- the dominant cost of ModelTest at
            # many-qubit dimensions (measured: 5Q cloud-noise ModelTest on
            # a single-core host halves its wall)
            pc = obj.percircuit()
            if obj.penalties:
                val = obj.chi2k_distributed_qty(obj.fn())
            else:
                val = obj.chi2k_distributed_qty(float(np.sum(pc)))
            objfn_vals.append(val)
            percircuit_by_iter.append(pc)
            if checkpoint is not None:
                checkpoint.objfn_vals = [float(v) for v in objfn_vals]
                checkpoint.percircuit_vals = [list(map(float, p))
                                              for p in percircuit_by_iter]
                checkpoint.last_completed_iter = i
                checkpoint.write("%s_iteration_%d.json"
                                 % (checkpoint_path, i))

        final_circuits = list(circuit_lists[-1])
        dof = ds.degrees_of_freedom(final_circuits)
        results = ModelEstimateResults(data, self,
                                       init_circuits=hasattr(edesign, 'circuit_lists'))
        params = {'final_objfn_value': objfn_vals[-1], 'final_dof': dof,
                  'objfn_values_by_iter': objfn_vals}
        models = {'final iteration estimate': self.model_to_test,
                  'test model': self.model_to_test}
        if target is not None:
            models['target'] = target
        est = Estimate(results, models, params)
        results.add_estimate(est, estimate_key=self.name)
        nsig = est.misfit_sigma()
        printer.log("ModelTest: 2*dlogl=%g, k=%d, Nsigma=%.2f"
                    % (objfn_vals[-1], dof, nsig if nsig is not None else np.nan))
        return results


class ModelTestCheckpoint(ProtocolCheckpoint):
    """Per-iteration ModelTest checkpoint (reference: modeltest.py:297):
    stores the objective value and per-circuit terms of each completed
    circuit-list iteration; ModelTest.run writes
    ``{path}_iteration_{i}.json`` and resumes past completed iterations."""

    def __init__(self, last_completed_iter=-1, objfn_vals=None,
                 percircuit_vals=None, name=None, parent=None):
        super().__init__(name, parent)
        self.last_completed_iter = last_completed_iter
        self.objfn_vals = objfn_vals or []
        self.percircuit_vals = percircuit_vals or []

    def _to_nice_serialization(self):
        return {
            'name': self.name,
            'last_completed_iter': self.last_completed_iter,
            'objfn_vals': [float(v) for v in self.objfn_vals],
            'percircuit_vals': [list(map(float, p))
                                for p in self.percircuit_vals],
        }

    @classmethod
    def _from_nice_serialization(cls, state):
        return cls(state.get('last_completed_iter', -1),
                   state.get('objfn_vals', []),
                   state.get('percircuit_vals', []),
                   state.get('name'))
