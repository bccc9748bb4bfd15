"""GST protocols: designs, GateSetTomography, StandardGST, results
(reference: pygsti/protocols/gst.py:92,156,1245,1740,2989)."""

from __future__ import annotations

import collections
import time as _time

import numpy as np

from pygsti_tpu.baseobjs.verbosityprinter import VerbosityPrinter
from pygsti_tpu.baseobjs.nicelyserializable import NicelySerializable
from pygsti_tpu.circuits.circuitlist import CircuitList
from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
from pygsti_tpu.protocols.protocol import (Protocol, ProtocolData, ProtocolResults,
                                           CircuitListsDesign, ProtocolCheckpoint)
from pygsti_tpu.protocols.estimate import Estimate
from pygsti_tpu.objectivefns.objectivefns import ObjectiveFunctionBuilder
from pygsti_tpu.optimize.simplerlm import SimplerLMOptimizer
from pygsti_tpu.algorithms import core as _alg
from pygsti_tpu.models.gaugegroup import (TPGaugeGroup, UnitaryGaugeGroup,
                                          TPSpamGaugeGroup, SpamGaugeGroup,
                                          TrivialGaugeGroup,
                                          default_gauge_group_for_model)


class GateSetTomographyDesign(CircuitListsDesign):
    """Circuit-lists design + a target model (reference: gst.py:92)."""

    def __init__(self, processorspec_or_model, circuit_lists, all_circuits_needing_data=None,
                 qubit_labels=None, nested=False):
        super().__init__(circuit_lists, all_circuits_needing_data, qubit_labels, nested)
        self.target_model = processorspec_or_model

    def _to_nice_serialization(self):
        state = super()._to_nice_serialization()
        if hasattr(self.target_model, 'to_nice_serialization'):
            state['target_model'] = self.target_model.to_nice_serialization()
        return state

    @classmethod
    def _from_nice_serialization(cls, state):
        from pygsti_tpu.models.explicitmodel import ExplicitOpModel
        from pygsti_tpu.circuits.circuit import Circuit
        lists = [[Circuit(s) for s in cl] for cl in state['circuit_lists']]
        target = ExplicitOpModel.from_nice_serialization(state['target_model']) \
            if 'target_model' in state else None
        return GateSetTomographyDesign(target, lists,
                                       [Circuit(s) for s in state['circuits']],
                                       state.get('qubit_labels'),
                                       state.get('nested', False))


class StandardGSTDesign(GateSetTomographyDesign):
    """Standard germs/fiducials/max-lengths design (reference: gst.py:156)."""

    def __init__(self, target_model, prep_fiducials, meas_fiducials, germs, max_lengths,
                 germ_length_limits=None, fiducial_pairs=None,
                 keep_fraction=1, keep_seed=None, nest=True,
                 circuit_rules=None, op_label_aliases=None, dscheck=None,
                 action_if_missing="raise", qubit_labels=None, verbosity=0,
                 add_default_protocol=False):
        self.prep_fiducials = list(prep_fiducials)
        self.meas_fiducials = list(meas_fiducials)
        self.germs = list(germs)
        self.maxlengths = list(max_lengths)
        lists = create_lsgst_circuit_lists(
            target_model, self.prep_fiducials, self.meas_fiducials, self.germs,
            self.maxlengths, fid_pairs=fiducial_pairs, nest=nest,
            germ_length_limits=germ_length_limits, op_label_aliases=op_label_aliases,
            dscheck=dscheck, action_if_missing=action_if_missing, verbosity=verbosity,
            keep_fraction=keep_fraction, keep_seed=keep_seed)
        super().__init__(target_model, lists, qubit_labels=qubit_labels, nested=nest)

    def _to_nice_serialization(self):
        state = GateSetTomographyDesign._to_nice_serialization(self)
        state['prep_fiducials'] = [c.str for c in self.prep_fiducials]
        state['meas_fiducials'] = [c.str for c in self.meas_fiducials]
        state['germs'] = [c.str for c in self.germs]
        state['maxlengths'] = list(self.maxlengths)
        return state

    @classmethod
    def _from_nice_serialization(cls, state):
        from pygsti_tpu.models.explicitmodel import ExplicitOpModel
        from pygsti_tpu.circuits.circuit import Circuit
        target = ExplicitOpModel.from_nice_serialization(state['target_model']) \
            if 'target_model' in state else None
        return cls(target, [Circuit(s) for s in state['prep_fiducials']],
                   [Circuit(s) for s in state['meas_fiducials']],
                   [Circuit(s) for s in state['germs']], state['maxlengths'],
                   qubit_labels=state.get('qubit_labels'))


class GSTInitialModel(NicelySerializable):
    """How to seed the GST optimization (reference: gst.py:402)."""

    @classmethod
    def cast(cls, obj):
        if isinstance(obj, cls):
            return obj
        if obj is None:
            return cls()
        if isinstance(obj, str):
            return cls(starting_point=obj)
        return cls(model=obj)

    def __init__(self, model=None, target_model=None, starting_point=None,
                 depolarize_start=0, randomize_start=0, lgst_gaugeopt_tol=1e-6,
                 contract_start_to_cptp=False):
        self.model = model
        self.target_model = target_model
        if starting_point is None:
            starting_point = "User-supplied-Model" if model is not None else "LGST-if-possible"
        self.starting_point = starting_point
        self.depolarize_start = depolarize_start
        self.randomize_start = randomize_start

    def retrieve_model(self, edesign, gaugeopt_target, dataset, comm=None):
        target = self.target_model if self.target_model is not None else edesign.target_model
        if self.starting_point == "User-supplied-Model":
            mdl = self.model
        elif self.starting_point in ("LGST", "LGST-if-possible"):
            mdl = None
            if hasattr(edesign, 'prep_fiducials'):
                try:
                    full_target = target.copy()
                    mdl = _alg.run_lgst(dataset, edesign.prep_fiducials,
                                        edesign.meas_fiducials, full_target)
                except Exception:
                    if self.starting_point == "LGST":
                        raise
                    mdl = None
            elif self.starting_point == "LGST":
                raise ValueError("Cannot run LGST: design has no fiducials")
            if mdl is None:
                mdl = target.copy()
        elif self.starting_point == "target":
            mdl = target.copy()
        else:
            raise ValueError("Invalid starting point %r" % self.starting_point)
        if self.depolarize_start > 0:
            mdl = mdl.depolarize(op_noise=self.depolarize_start)
        return mdl


class GSTBadFitOptions(NicelySerializable):
    """What to do when the GST fit is bad (reference: gst.py:595)."""

    @classmethod
    def cast(cls, obj):
        if isinstance(obj, cls):
            return obj
        if obj is None:
            return cls()
        if isinstance(obj, dict):
            return cls(**obj)
        raise ValueError("Cannot cast %r" % (obj,))

    def __init__(self, threshold=2.0, actions=(), wildcard_budget_includes_spam=True,
                 wildcard_smart_init=True, wildcard_methods=('neldermead',),
                 wildcard_percentile=0.05):
        self.threshold = threshold
        self.actions = tuple(actions)
        self.wildcard_budget_includes_spam = wildcard_budget_includes_spam
        # wildcard optimizer chain (reference: gst.py:686 wildcard_methods):
        # any of 'neldermead', 'barrier', 'cvxpy_noagg' (per-circuit-only LP),
        # 'none'; each entry may also be a dict {'name': ..., **options}.
        self.wildcard_methods = tuple(wildcard_methods)
        self.wildcard_percentile = wildcard_percentile


class GSTObjFnBuilders(NicelySerializable):
    """Iteration + final objective builders (reference: gst.py:749)."""

    @classmethod
    def cast(cls, obj):
        if isinstance(obj, cls):
            return obj
        if obj is None:
            return cls.create_from()
        if isinstance(obj, dict):
            return cls.create_from(**obj)
        if isinstance(obj, (list, tuple)):
            return cls(*obj)
        raise ValueError("Cannot cast %r" % (obj,))

    @classmethod
    def create_from(cls, objective='logl', freq_weighted_chi2=False,
                    always_perform_mle=False, only_perform_mle=False):
        chi2_builder = ObjectiveFunctionBuilder.create_from('chi2', freq_weighted_chi2)
        mle_builder = ObjectiveFunctionBuilder.create_from('logl')
        if objective == "chi2":
            return cls([chi2_builder], [])
        elif objective == "logl":
            if always_perform_mle:
                it = [mle_builder] if only_perform_mle else [chi2_builder, mle_builder]
                return cls(it, [])
            return cls([chi2_builder], [mle_builder])
        raise ValueError("Invalid objective: %r" % objective)

    def __init__(self, iteration_builders, final_builders=()):
        self.iteration_builders = list(iteration_builders)
        self.final_builders = list(final_builders)


class GSTGaugeOptSuite(NicelySerializable):
    """Named gauge-optimization suites (reference: gst.py:858).

    'stdgaugeopt' = 3 stages: (1) full-group frobenius gates+spam, (2)
    unitary-group gates-only, (3) spam-group spam-only (gst.py:1052-1107).
    """

    @classmethod
    def cast(cls, obj):
        if isinstance(obj, cls):
            return obj
        if obj is None:
            return cls(gaugeopt_suite_names=None)
        if isinstance(obj, str):
            return cls(gaugeopt_suite_names=(obj,))
        if isinstance(obj, (tuple, list)):
            return cls(gaugeopt_suite_names=obj)
        if isinstance(obj, dict):
            return cls(gaugeopt_argument_dicts=obj)
        raise ValueError("Cannot cast %r" % (obj,))

    def __init__(self, gaugeopt_suite_names=None, gaugeopt_argument_dicts=None,
                 gaugeopt_target=None):
        self.gaugeopt_suite_names = tuple(gaugeopt_suite_names) \
            if gaugeopt_suite_names is not None else None
        self.gaugeopt_argument_dicts = dict(gaugeopt_argument_dicts) \
            if gaugeopt_argument_dicts is not None else None
        self.gaugeopt_target = gaugeopt_target

    def is_empty(self):
        return self.gaugeopt_suite_names is None and self.gaugeopt_argument_dicts is None

    def to_dictionary(self, model, unreliable_ops=(), verbosity=0):
        """Resolve suite names into gauge-opt argument dicts."""
        out = collections.OrderedDict()
        if self.gaugeopt_argument_dicts is not None:
            out.update(self.gaugeopt_argument_dicts)
        if self.gaugeopt_suite_names is None:
            return out
        for name in self.gaugeopt_suite_names:
            if name in ('stdgaugeopt', 'stdgaugeopt-unreliable2Q'):
                gg = default_gauge_group_for_model(model)
                stages = []
                if gg.name in ("Full", "TP"):
                    stages.append({'item_weights': {'gates': 1.0, 'spam': 1.0}})
                stages.append({'gauge_group': UnitaryGaugeGroup(model.state_space, model.basis),
                               'item_weights': {'gates': 1.0, 'spam': 0.0}})
                s3gg = SpamGaugeGroup(model.state_space) if gg.name == "Full" \
                    else TPSpamGaugeGroup(model.state_space)
                stages.append({'gauge_group': s3gg,
                               'item_weights': {'gates': 0.0, 'spam': 1.0},
                               'spam_penalty_factor': 1.0})
                out[name] = {'stages': stages}
            elif name == 'TPpenalty':
                out[name] = {'item_weights': {'gates': 1.0, 'spam': 1.0}}
            elif name in ('varySpam', 'varySpamWt', 'varyValidSpamWt', 'toggleValidSpam'):
                for wt in (1e-4, 1e-1):
                    out['%s.spam%g' % (name, wt)] = {'item_weights': {'gates': 1.0, 'spam': wt}}
            elif name == 'unreliable2Q':
                out[name] = {'item_weights': {'gates': 1.0, 'spam': 1.0}}
            elif name == 'none':
                continue
            else:
                raise ValueError("Unknown gauge opt suite %r" % name)
        return out


class ModelEstimateResults(ProtocolResults):
    """GST results: dict of named Estimates (reference: gst.py:2989)."""

    def __init__(self, data, protocol_instance, init_circuits=True):
        super().__init__(data, protocol_instance)
        self.estimates = collections.OrderedDict()
        if init_circuits and isinstance(self.data.edesign, CircuitListsDesign):
            self.circuit_lists = collections.OrderedDict(
                [('iteration %d' % i, cl) for i, cl in
                 enumerate(self.data.edesign.circuit_lists)])
            self.circuit_lists['final'] = self.data.edesign.circuit_lists[-1]
        else:
            self.circuit_lists = collections.OrderedDict()

    def add_estimate(self, estimate, estimate_key='default'):
        estimate.parent = self
        self.estimates[estimate_key] = estimate

    # -- directory-tree serialization (reference: gst.py ModelEstimateResults
    #    write/from_dir via the results-dir protocol) --------------------------
    def to_nice_serialization(self):
        state = {'protocol_name': self.protocol.name,
                 'circuit_lists': {k: [c.str for c in cl]
                                   for k, cl in self.circuit_lists.items()},
                 'estimates': {}}
        for name, est in self.estimates.items():
            models = {k: m.to_nice_serialization()
                      for k, m in est.models.items()
                      if hasattr(m, 'to_nice_serialization')}
            params = {}
            for k, v in est.parameters.items():
                if isinstance(v, (int, float, str, bool, type(None))):
                    params[k] = v
            state['estimates'][name] = {
                'models': models, 'parameters': params,
                'goparameters_keys': list(est.goparameters.keys())}
        return state

    @classmethod
    def _from_nice_serialization_with_data(cls, state, data):
        from pygsti_tpu.baseobjs.nicelyserializable import NicelySerializable
        from pygsti_tpu.io.stdinput import StdInputParser
        from pygsti_tpu.protocols.protocol import Protocol
        parser = StdInputParser()
        results = cls(data, Protocol(state.get('protocol_name')),
                      init_circuits=False)
        for k, strs in state.get('circuit_lists', {}).items():
            results.circuit_lists[k] = [parser.parse_circuit(s) for s in strs]
        for name, est_state in state.get('estimates', {}).items():
            models = collections.OrderedDict(
                (k, NicelySerializable.from_nice_serialization(m))
                for k, m in est_state['models'].items())
            est = Estimate(results, models, est_state.get('parameters', {}))
            for gk in est_state.get('goparameters_keys', []):
                est.goparameters[gk] = {}
            results.estimates[name] = est
        return results

    def add_model_test(self, target_model, themodel, estimate_key='test', gaugeopt_keys="auto",
                       verbosity=0):
        """Add an estimate that is just a fixed model evaluated against the data."""
        from pygsti_tpu.protocols.modeltest import ModelTest
        final_circuits = list(self.circuit_lists.get('final',
                              self.data.edesign.all_circuits_needing_data))
        from pygsti_tpu.objectivefns.objectivefns import TimeIndependentMDCObjectiveFunction, \
            RawPoissonPicDeltaLogLFunction
        obj = TimeIndependentMDCObjectiveFunction(RawPoissonPicDeltaLogLFunction(),
                                                  themodel, self.data.dataset, final_circuits)
        params = {'final_objfn_value': 2 * obj.fn(),
                  'final_dof': self.data.dataset.degrees_of_freedom(final_circuits)}
        est = Estimate(self, {'target': target_model, 'final iteration estimate': themodel},
                       params)
        self.add_estimate(est, estimate_key)
        return est

    def __getitem__(self, key):
        return self.estimates[key]

    def keys(self):
        return self.estimates.keys()

    def __str__(self):
        return ("ModelEstimateResults with estimates: %s" % list(self.estimates.keys()))


class GateSetTomography(Protocol):
    """The main long-sequence GST protocol (reference: gst.py:1245)."""

    def __init__(self, initial_model=None, gaugeopt_suite='stdgaugeopt',
                 objfn_builders=None, optimizer=None, badfit_options=None,
                 verbosity=2, name=None):
        super().__init__(name)
        self.initial_model = GSTInitialModel.cast(initial_model)
        self.gaugeopt_suite = GSTGaugeOptSuite.cast(gaugeopt_suite)
        self.objfn_builders = GSTObjFnBuilders.cast(objfn_builders)
        if optimizer is None:
            optimizer = SimplerLMOptimizer()
        self.optimizer = SimplerLMOptimizer.cast(optimizer)
        self.badfit_options = GSTBadFitOptions.cast(badfit_options)
        self.verbosity = verbosity

    def run(self, data, memlimit=None, comm=None, checkpoint=None, checkpoint_path=None,
            disable_checkpointing=False):
        printer = VerbosityPrinter.create_printer(self.verbosity)
        edesign = data.edesign
        ds = data.dataset
        target = edesign.target_model

        circuit_lists = edesign.circuit_lists
        n_iters = len(circuit_lists)

        # -- checkpoint restore (reference: gst.py:1437-1468) ------------------
        if disable_checkpointing:
            checkpoint = None
            starting_index = 0
        else:
            if checkpoint_path is None:
                checkpoint_path = 'gst_checkpoints/' + (self.name or 'GateSetTomography')
            import os as _os
            _os.makedirs(_os.path.dirname(checkpoint_path) or '.', exist_ok=True)
            if checkpoint is None:
                checkpoint = GateSetTomographyCheckpoint(name=self.name)
            elif not isinstance(checkpoint, GateSetTomographyCheckpoint):
                raise TypeError("'checkpoint' must be a GateSetTomographyCheckpoint")
            starting_index = checkpoint.last_completed_iter + 1
            if starting_index > 0:
                printer.log("Resuming from checkpoint: %d of %d iterations done"
                            % (starting_index, n_iters))

        if checkpoint is not None and checkpoint.mdl_list:
            seed_model = checkpoint.mdl_list[-1].copy()
            models = [m.copy() for m in checkpoint.mdl_list]
        else:
            seed_model = self.initial_model.retrieve_model(edesign, None, ds)
            models = []

        # per-phase time accounting (reference: gst.py:1391-1394,
        # core.py:1008-1035 thread a Profiler through the fit)
        from pygsti_tpu.baseobjs.profiler import Profiler
        profiler = Profiler()

        # Warm the gauge-opt executables (CPU backend) in a background
        # thread while the TPU-bound LM fit runs: the seed model has the
        # same structure as the final estimate, and the compiled Adam/grad
        # executables depend only on structure (algorithms/gaugeopt.py
        # _GO_EXEC_CACHE), so the later gaugeopt_to_target calls become
        # pure cache hits -- hiding the whole gauge-opt compile cost of a
        # cold run.
        if self.gaugeopt_suite is not None and not self.gaugeopt_suite.is_empty():
            import threading

            def _precompile_go(mdl_struct=seed_model.copy(), tgt=target):
                try:
                    from pygsti_tpu.algorithms.gaugeopt import \
                        precompile_gaugeopt_suite
                    precompile_gaugeopt_suite(self.gaugeopt_suite, mdl_struct,
                                              tgt)
                except Exception:
                    pass  # best-effort: the real call compiles on miss
            threading.Thread(target=_precompile_go, daemon=True,
                             name='gaugeopt-precompile').start()

        tstart = _time.time()
        opt_results = []
        gen = _alg.iterative_gst_generator(
            ds, seed_model, circuit_lists, self.optimizer,
            self.objfn_builders.iteration_builders, self.objfn_builders.final_builders,
            starting_index=starting_index, verbosity=self.verbosity - 1,
            profiler=profiler)
        for i in range(starting_index, n_iters):
            iter_opt_results, mdl = next(gen)
            models.append(mdl)
            opt_results.append(iter_opt_results)
            if checkpoint is not None:
                # per-iteration checkpoint write (reference: gst.py:1496-1505)
                checkpoint.mdl_list = models
                checkpoint.last_completed_iter = i
                checkpoint.last_completed_circuit_list = list(circuit_lists[i])
                if i == n_iters - 1:
                    checkpoint.final_objfn = \
                        iter_opt_results[-1].chi2_k_distributed_qty
                checkpoint.write("%s_iteration_%d.json" % (checkpoint_path, i))
        fit_time = _time.time() - tstart

        results = ModelEstimateResults(data, self)
        final_circuits = list(circuit_lists[-1])
        if opt_results:
            final_objfn_value = opt_results[-1][-1].chi2_k_distributed_qty
        else:  # fully resumed from checkpoint
            final_objfn_value = checkpoint.final_objfn
            if final_objfn_value is None:
                from pygsti_tpu.objectivefns.objectivefns import (
                    RawPoissonPicDeltaLogLFunction, TimeIndependentMDCObjectiveFunction)
                obj = TimeIndependentMDCObjectiveFunction(
                    RawPoissonPicDeltaLogLFunction(), models[-1], ds, final_circuits)
                final_objfn_value = 2 * obj.fn()
        dof = ds.degrees_of_freedom(final_circuits) - models[-1].num_params
        params = {
            'protocol': self,
            'final_objfn_value': final_objfn_value,
            'final_dof': max(dof, 1),
            'fit_time': fit_time,
            'raw_objective_values': [[r.f for r in rs] for rs in opt_results],
        }
        est = Estimate.create_gst_estimate(results, target, seed_model, models, params)
        results.add_estimate(est, estimate_key=self.name)
        with profiler.timing('gauge optimization + badfit'):
            _add_gaugeopt_and_badfit(results, self.name, target, self.gaugeopt_suite,
                                     self.badfit_options, printer,
                                     optimizer=self.optimizer)
        est.parameters['profiler'] = dict(profiler.timers)
        printer.log("Phase times:\n" + profiler.format_times(), 3)
        return results


class LinearGateSetTomography(Protocol):
    """LGST protocol (reference: gst.py:1562)."""

    def __init__(self, target_model=None, gaugeopt_suite='stdgaugeopt', verbosity=2,
                 name=None):
        super().__init__(name)
        self.target_model = target_model
        self.gaugeopt_suite = GSTGaugeOptSuite.cast(gaugeopt_suite)
        self.verbosity = verbosity

    def run(self, data, memlimit=None, comm=None):
        printer = VerbosityPrinter.create_printer(self.verbosity)
        edesign = data.edesign
        target = self.target_model if self.target_model is not None else edesign.target_model
        mdl_lgst = _alg.run_lgst(data.dataset, edesign.prep_fiducials,
                                 edesign.meas_fiducials, target,
                                 verbosity=self.verbosity - 1)
        results = ModelEstimateResults(data, self, init_circuits=False)
        est = Estimate(results, {'target': target, 'seed': mdl_lgst,
                                 'final iteration estimate': mdl_lgst}, {})
        results.add_estimate(est, estimate_key=self.name)
        _add_gaugeopt_and_badfit(results, self.name, target, self.gaugeopt_suite,
                                 GSTBadFitOptions(), printer)
        return results


class StandardGST(Protocol):
    """Run GST with multiple parameterizations (reference: gst.py:1740)."""

    def __init__(self, modes=('full TP', 'CPTPLND', 'Target'), gaugeopt_suite='stdgaugeopt',
                 target_model=None, models_to_test=None, objfn_builders=None,
                 optimizer=None, badfit_options=None, verbosity=2, name=None):
        super().__init__(name)
        if isinstance(modes, str):
            modes = modes.split(',')
        self.modes = tuple(modes)
        self.gaugeopt_suite = GSTGaugeOptSuite.cast(gaugeopt_suite)
        self.target_model = target_model
        self.models_to_test = models_to_test or {}
        self.objfn_builders = objfn_builders
        self.optimizer = optimizer
        self.badfit_options = badfit_options
        self.verbosity = verbosity

    def run(self, data, memlimit=None, comm=None, checkpoint=None, checkpoint_path=None,
            disable_checkpointing=False):
        printer = VerbosityPrinter.create_printer(self.verbosity)
        edesign = data.edesign
        target = self.target_model if self.target_model is not None else edesign.target_model

        # -- nested per-mode checkpoints (reference: gst.py:3540) --------------
        if disable_checkpointing:
            checkpoint = None
        else:
            if checkpoint_path is None:
                checkpoint_path = 'gst_checkpoints/' + (self.name or 'StandardGST')
            import os as _os
            _os.makedirs(_os.path.dirname(checkpoint_path) or '.', exist_ok=True)
            if checkpoint is None:
                checkpoint = StandardGSTCheckpoint(name=self.name)
            elif not isinstance(checkpoint, StandardGSTCheckpoint):
                raise TypeError("'checkpoint' must be a StandardGSTCheckpoint")

        results = ModelEstimateResults(data, self)
        for mode in self.modes:
            printer.log("-- Performing '%s' gate set tomography --" % mode)
            if mode == "Target" or mode in self.models_to_test:
                themodel = target.copy() if mode == "Target" else self.models_to_test[mode]
                results.add_model_test(target, themodel, estimate_key=mode)
            else:
                parameterization = mode
                mode_target = _convert_target(target, parameterization)
                gst = GateSetTomography(
                    GSTInitialModel(target_model=mode_target),
                    self.gaugeopt_suite, self.objfn_builders, self.optimizer,
                    self.badfit_options, verbosity=self.verbosity - 1, name=mode)
                if checkpoint is None:
                    sub_results = gst.run(data, disable_checkpointing=True)
                else:
                    child = checkpoint.children.get(mode)
                    if child is None:
                        child = GateSetTomographyCheckpoint(name=mode)
                        checkpoint.children[mode] = child
                    sub_results = gst.run(
                        data, checkpoint=child,
                        checkpoint_path="%s_%s" % (checkpoint_path, mode))
                results.add_estimate(sub_results.estimates[mode], estimate_key=mode)
            if checkpoint is not None:
                if mode not in checkpoint.completed_modes:
                    checkpoint.completed_modes.append(mode)
                checkpoint.write("%s.json" % checkpoint_path)
        return results


def _convert_target(target, parameterization):
    """Build a target model in the given parameterization from a (likely
    static or TP) target (reference: model.convert_members_inplace)."""
    from pygsti_tpu.models.modelconstruction import _make_op, _make_prep, _make_povm
    m = target.copy()
    nq = m.state_space.num_qubits
    for lbl, op in list(m.operations.items()):
        m.operations[lbl] = _make_op(op.to_dense(), parameterization, m.basis)
    for lbl, p in list(m.preps.items()):
        m.preps[lbl] = _make_prep(p.to_dense(), parameterization, m.basis, nq)
    for lbl, povm in list(m.povms.items()):
        effects = collections.OrderedDict(povm.items())
        m.povms[lbl] = _make_povm(effects, parameterization, m.basis, nq)
    m.default_gate_type = parameterization
    m._mark_for_rebuild()
    return m


def _add_gaugeopt_and_badfit(results, estlbl, target_model, gaugeopt_suite,
                             badfit_options, printer, optimizer=None):
    """Add gauge-optimized models + badfit handling (reference: gst.py:2066)."""
    from pygsti_tpu.algorithms.gaugeopt import gaugeopt_to_target
    est = results.estimates[estlbl]
    if gaugeopt_suite is not None and not gaugeopt_suite.is_empty():
        mdl = est.models['final iteration estimate']
        godict = gaugeopt_suite.to_dictionary(mdl)
        go_target = gaugeopt_suite.gaugeopt_target \
            if gaugeopt_suite.gaugeopt_target is not None else target_model
        import time as _time
        for golbl, goparams in godict.items():
            stages = goparams.get('stages', [goparams])
            cur = mdl
            _t0 = _time.time()
            for stage in stages:
                cur = gaugeopt_to_target(cur, go_target, **dict(stage))
            est.models[golbl] = cur
            est.goparameters[golbl] = goparams
            printer.log("  -- Added gauge-optimized result '%s' (%.1fs)"
                        % (golbl, _time.time() - _t0))
    if badfit_options is not None:
        _add_badfit_estimates(results, estlbl, target_model, badfit_options, printer,
                              optimizer=optimizer, gaugeopt_suite=gaugeopt_suite)


def _add_badfit_estimates(results, estlbl, target_model, badfit_options, printer,
                          optimizer=None, gaugeopt_suite=None):
    """When the fit is bad (Nsigma > threshold), apply badfit actions
    (reference: gst.py:2178 _add_badfit_estimates):

    * 'wildcard'   -- multi-parameter per-op wildcard budget optimized with
      Nelder-Mead (reference default, gst.py:2684)
    * 'wildcard1d' -- 1-D diamond-distance-scaled budget (gst.py:2341)
    * 'robust'/'robust+' -- per-circuit data scaling stored as weights
      (gst.py:2547 _compute_robust_scaling)
    * 'Robust'/'Robust+' -- same scaling PLUS re-optimization with the scaled
      dataset, added as a new estimate (gst.py:2935 _reoptimize_with_weights)
    """
    import numpy as _np
    est = results.estimates[estlbl]
    nsigma = est.misfit_sigma()
    if nsigma is None or nsigma <= badfit_options.threshold or not badfit_options.actions:
        return
    printer.log("  -- Fit is bad (Nsigma=%.1f > %.1f): applying badfit actions %s"
                % (nsigma, badfit_options.threshold, badfit_options.actions))
    mdl = est.models['final iteration estimate']
    ds = results.dataset
    final_circuits = list(results.circuit_lists.get(
        'final', results.data.edesign.all_circuits_needing_data))

    from pygsti_tpu.objectivefns.objectivefns import (
        RawPoissonPicDeltaLogLFunction, TimeIndependentMDCObjectiveFunction)

    for action in badfit_options.actions:
        if action == 'wildcard1d':
            from pygsti_tpu.objectivefns.wildcardbudget import (
                PrimitiveOpsSingleScaleWildcardBudget, optimize_wildcard_budget_1d)
            from pygsti_tpu.tools import optools as _ot2
            import scipy.stats as _st
            op_labels = list(mdl.operations.keys())
            ref_vals = []
            for lbl in op_labels:
                try:
                    dd = 0.5 * _ot2.diamonddist(mdl.operations[lbl].to_dense(),
                                                target_model.operations[lbl].to_dense(),
                                                mdl.basis, return_x=False)
                except Exception:
                    dd = _ot2.jtracedist(mdl.operations[lbl].to_dense(),
                                         target_model.operations[lbl].to_dense(),
                                         mdl.basis)
                ref_vals.append(max(dd, 1e-6))
            if badfit_options.wildcard_budget_includes_spam:
                op_labels = op_labels + ['SPAM']
                ref_vals = ref_vals + [max(_np.mean(ref_vals), 1e-6)]
            budget = PrimitiveOpsSingleScaleWildcardBudget(op_labels, ref_vals)
            obj = TimeIndependentMDCObjectiveFunction(
                RawPoissonPicDeltaLogLFunction(), mdl, ds, final_circuits)
            k = max(ds.degrees_of_freedom(final_circuits) - mdl.num_params, 1)
            threshold = _st.chi2.ppf(1 - 0.05, k) if k > 0 else 0.0
            budget = optimize_wildcard_budget_1d(obj, budget, threshold)
            est.parameters['unmodeled_error'] = budget
            printer.log("     wildcard1d: alpha=%.4g  (%s)" % (budget.alpha, budget))

        elif action == 'wildcard':
            # multi-parameter per-op budget, optimized by the method chain in
            # badfit_options.wildcard_methods (the reference's
            # _compute_wildcard_budget dispatch, gst.py:2783-2816)
            from pygsti_tpu.objectivefns.wildcardbudget import (
                PrimitiveOpsWildcardBudget, optimize_wildcard_budget_neldermead)
            from pygsti_tpu.optimize.wildcardopt import (
                optimize_wildcard_budget_barrier,
                optimize_wildcard_budget_percircuit_only_cvxpy)
            import scipy.stats as _st
            op_labels = list(mdl.operations.keys())
            if badfit_options.wildcard_budget_includes_spam:
                op_labels = op_labels + ['SPAM']
            budget = PrimitiveOpsWildcardBudget(op_labels)
            obj = TimeIndependentMDCObjectiveFunction(
                RawPoissonPicDeltaLogLFunction(), mdl, ds, final_circuits)
            pct = badfit_options.wildcard_percentile
            k = max(ds.degrees_of_freedom(final_circuits) - mdl.num_params, 1)
            threshold = _st.chi2.ppf(1 - pct, k) if k > 0 else 0.0
            nboxes = max(len(final_circuits), 1)
            redbox_threshold = _st.chi2.ppf(1 - pct / nboxes, 1)
            L1weights = _np.ones(budget.num_params)
            for method in badfit_options.wildcard_methods:
                opts = dict(method) if isinstance(method, dict) else {}
                name = opts.pop('name', method)
                if name == 'neldermead':
                    budget = optimize_wildcard_budget_neldermead(
                        obj, budget, threshold, redbox_threshold, **opts)
                elif name == 'barrier':
                    budget = optimize_wildcard_budget_barrier(
                        budget, L1weights, obj, threshold, redbox_threshold,
                        printer, **opts)
                elif name == 'cvxpy_noagg':
                    budget = optimize_wildcard_budget_percircuit_only_cvxpy(
                        budget, L1weights, obj, redbox_threshold, printer,
                        **opts)
                elif name == 'none':
                    pass
                else:
                    raise ValueError("Invalid wildcard method name: %s" % name)
            est.parameters['unmodeled_error'] = budget
            printer.log("     wildcard: %s" % budget)

        elif action in ('robust', 'Robust', 'robust+', 'Robust+'):
            weights = _compute_robust_scaling(action, mdl, ds, final_circuits)
            printer.log("     %s scaling: %d circuits reweighted"
                        % (action, len(weights)))
            new_models = dict(est.models)
            new_params = dict(est.parameters)
            new_params['weights'] = weights
            if action in ('Robust', 'Robust+'):
                # re-optimize with the scaled dataset (reference: gst.py:2935)
                scaled_ds = _scale_dataset(ds, weights, final_circuits)
                reopt_model = mdl.copy()
                opt = SimplerLMOptimizer.cast(optimizer)
                from pygsti_tpu.objectivefns.objectivefns import ObjectiveFunctionBuilder
                builder = ObjectiveFunctionBuilder.create_from('logl')
                from pygsti_tpu.algorithms.core import run_gst_fit_simple
                _, objective = run_gst_fit_simple(scaled_ds, reopt_model,
                                                  final_circuits, opt, builder,
                                                  verbosity=0)
                new_models['final iteration estimate'] = reopt_model
                if gaugeopt_suite is not None and not gaugeopt_suite.is_empty():
                    from pygsti_tpu.algorithms.gaugeopt import gaugeopt_to_target
                    godict = gaugeopt_suite.to_dictionary(reopt_model)
                    for golbl, goparams in godict.items():
                        cur = reopt_model
                        for stage in goparams.get('stages', [goparams]):
                            cur = gaugeopt_to_target(cur, target_model, **dict(stage))
                        new_models[golbl] = cur
            new_est = Estimate(results, new_models, new_params)
            results.add_estimate(new_est, estimate_key="%s.%s" % (estlbl, action))
        else:
            raise ValueError("Invalid badfit action: %r" % (action,))


def _compute_robust_scaling(scale_typ, model, dataset, circuits):
    """Per-circuit data-scaling weights (reference: gst.py:2547).

    V1 ('robust'/'Robust'): circuits whose per-circuit 2*deltaLogL exceeds the
    Bonferroni-corrected chi2 threshold get weight expected/fitqty.
    V2 ('+'): additionally rescale so the sorted per-circuit values follow the
    expected chi2 percentile distribution without reordering.
    """
    import numpy as _np
    import scipy.stats as _st
    from pygsti_tpu.objectivefns.objectivefns import (
        RawPoissonPicDeltaLogLFunction, TimeIndependentMDCObjectiveFunction)
    obj = TimeIndependentMDCObjectiveFunction(
        RawPoissonPicDeltaLogLFunction(), model, dataset, circuits)
    fitqty = 2.0 * obj.percircuit()  # chi2_k-distributed per-circuit values
    expected = max(len(dataset.outcome_labels) - 1, 1)  # dof per circuit
    nboxes = len(circuits)
    pc = 0.05  # hardcoded 1 - confidence level (reference: gst.py:2599)
    threshold = _np.ceil(_st.chi2.ppf(1 - pc / nboxes, expected))

    weights = {}
    scaled_fitqty = fitqty.copy()
    for i, opstr in enumerate(circuits):
        if fitqty[i] > threshold:
            weights[opstr] = expected / fitqty[i]
            scaled_fitqty[i] = expected

    if scale_typ in ('robust+', 'Robust+'):
        nelements = len(fitqty)
        percentiles = [_st.chi2.ppf((i + 1) / (nelements + 1), expected)
                       for i in range(nelements)]
        for ibin, i in enumerate(_np.argsort(scaled_fitqty)):
            opstr = circuits[i]
            fit, exp_val = scaled_fitqty[i], percentiles[ibin]
            if fit > exp_val:
                if opstr in weights:
                    weights[opstr] *= exp_val / fit
                else:
                    weights[opstr] = exp_val / fit
    return weights


def _scale_dataset(dataset, circuit_weights, circuits):
    """Copy of `dataset` with each circuit's counts multiplied by its weight
    (unweighted circuits unchanged; reference: _reoptimize_with_weights
    scales via objective weights -- here the counts themselves are scaled)."""
    from pygsti_tpu.data.dataset import DataSet
    new_ds = DataSet(outcome_labels=list(dataset.outcome_labels))
    for c in circuits:
        row = dataset[c]
        w = circuit_weights.get(c, 1.0)
        new_ds.add_count_dict(c, {ol: cnt * w for ol, cnt in row.counts.items()})
    new_ds.done_adding_data()
    return new_ds


class GateSetTomographyCheckpoint(ProtocolCheckpoint):
    """Per-iteration GST checkpoint (reference: gst.py:3475).

    Written as ``{checkpoint_path}_iteration_{i}.json`` after each circuit-list
    iteration by ``GateSetTomography.run``; pass the object read back from such
    a file as ``run(..., checkpoint=)`` to warm-restart, skipping completed
    iterations (reference: gst.py:1437-1505)."""

    def __init__(self, mdl_list=None, last_completed_iter=-1, last_completed_circuit_list=None,
                 final_objfn=None, name=None, parent=None):
        super().__init__(name, parent)
        self.mdl_list = mdl_list or []
        self.last_completed_iter = last_completed_iter
        self.last_completed_circuit_list = last_completed_circuit_list
        self.final_objfn = final_objfn

    def _to_nice_serialization(self):
        return {
            'name': self.name,
            'mdl_list': [m.to_nice_serialization() for m in self.mdl_list],
            'last_completed_iter': self.last_completed_iter,
            'last_completed_circuit_list':
                [c.str for c in (self.last_completed_circuit_list or [])],
            'final_objfn': self.final_objfn,
        }

    @classmethod
    def _from_nice_serialization(cls, state):
        from pygsti_tpu.circuits.circuit import Circuit
        mdls = [NicelySerializable.from_nice_serialization(s)
                for s in state.get('mdl_list', [])]
        cl = [Circuit(s) for s in state.get('last_completed_circuit_list', [])]
        return cls(mdls, state.get('last_completed_iter', -1), cl or None,
                   state.get('final_objfn'), state.get('name'))


class StandardGSTCheckpoint(ProtocolCheckpoint):
    """Multi-mode checkpoint: one child GateSetTomographyCheckpoint (or
    completion marker) per StandardGST mode (reference: gst.py:3540)."""

    def __init__(self, children=None, completed_modes=None, name=None, parent=None):
        super().__init__(name, parent)
        self.children = children or {}
        self.completed_modes = list(completed_modes or [])

    def _to_nice_serialization(self):
        return {
            'name': self.name,
            'children': {k: v.to_nice_serialization()
                         for k, v in self.children.items()},
            'completed_modes': list(self.completed_modes),
        }

    @classmethod
    def _from_nice_serialization(cls, state):
        children = {k: NicelySerializable.from_nice_serialization(v)
                    for k, v in state.get('children', {}).items()}
        return cls(children, state.get('completed_modes', []), state.get('name'))


class HasProcessorSpec(object):
    """Mixin adding a `processor_spec` attribute to an experiment design
    (reference: protocols/gst.py:67)."""

    def __init__(self, processorspec_filename_or_obj):
        if processorspec_filename_or_obj is None:
            self.processor_spec = None
        elif isinstance(processorspec_filename_or_obj, str):
            from pygsti_tpu.io import load_processorspec
            self.processor_spec = load_processorspec(
                processorspec_filename_or_obj)
        else:
            self.processor_spec = processorspec_filename_or_obj


# reference shorthand aliases (reference: gst.py:3625-3627)
GSTDesign = GateSetTomographyDesign
GST = GateSetTomography
LGST = LinearGateSetTomography
