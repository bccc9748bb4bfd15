"""ModelTest protocol: evaluate a fixed model against data
(reference: pygsti/protocols/modeltest.py:30)."""

from __future__ import annotations

import numpy as np

from pygsti_tpu.baseobjs.verbosityprinter import VerbosityPrinter
from pygsti_tpu.protocols.protocol import Protocol
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

        objfn_vals, percircuit_by_iter = [], []
        for cl in circuit_lists:
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


class ModelTestCheckpoint(object):
    """Checkpoint for ModelTest (reference: modeltest.py:297)."""

    def __init__(self, last_completed_iter=-1, objfn_vals=None, name=None):
        self.last_completed_iter = last_completed_iter
        self.objfn_vals = objfn_vals or []
        self.name = name
