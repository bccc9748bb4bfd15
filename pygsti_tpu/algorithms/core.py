"""Core GST algorithms: LGST and iterative long-sequence GST
(reference: pygsti/algorithms/core.py:59,639,831)."""

from __future__ import annotations

import collections

import numpy as np

from pygsti_tpu.baseobjs.verbosityprinter import VerbosityPrinter
from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.circuits.circuitlist import CircuitList
from pygsti_tpu.objectivefns.objectivefns import (
    ObjectiveFunctionBuilder, ModelDatasetCircuitsStore)
from pygsti_tpu.optimize.simplerlm import SimplerLMOptimizer


def run_lgst(dataset, prep_fiducials, effect_fiducials, target_model,
             op_labels=None, op_label_aliases=None, guess_model_for_gauge=None,
             svd_truncate_to=None, verbosity=0):
    """Linear-inversion GST (reference: algorithms/core.py:59).

    Implements the standard LGST estimator: build the fiducial data matrix
    A~[ (meas_fid, outcome), prep_fid ] of measured probabilities, rank-d^2
    truncate via SVD, express each gate in the SVD frame and rotate into the
    target model's gauge using the target's fiducial maps.
    """
    printer = VerbosityPrinter.create_printer(verbosity)
    if op_labels is None:
        op_labels = list(target_model.operations.keys())
    d2 = target_model.dim
    trunc = svd_truncate_to if svd_truncate_to is not None else d2

    povm_lbl = target_model._default_povm_label()
    prep_lbl = target_model._default_prep_label()
    outcome_lbls = target_model.povms[povm_lbl].outcome_labels
    n_out = len(outcome_lbls)
    nP, nM = len(prep_fiducials), len(effect_fiducials)
    assert nM * n_out >= trunc and nP >= trunc, \
        "Fiducials not informationally complete (need >= %d)" % trunc

    def probs_matrix(mid_circuit):
        """[(meas_fid, outcome) x prep_fid] matrix of dataset frequencies."""
        M = np.empty((nM * n_out, nP))
        for j, f1 in enumerate(prep_fiducials):
            for i, f2 in enumerate(effect_fiducials):
                c = f1 + mid_circuit + f2 if mid_circuit is not None else f1 + f2
                row = dataset[c]
                total = row.total
                for e, ol in enumerate(outcome_lbls):
                    M[i * n_out + e, j] = row.counts.get((ol,), 0) / total
        return M

    AB = probs_matrix(None)
    U, s, Vh = np.linalg.svd(AB, full_matrices=False)
    printer.log("LGST: singular values of AB: %s" % s[:trunc + 2], 2)
    Ud = U[:, :trunc]          # [nME, d2]
    Vd = Vh[:trunc, :].T       # [nP, d2]
    T = Ud.T @ AB @ Vd         # [d2, d2] invertible
    Tinv = np.linalg.inv(T)

    # target-model fiducial maps for gauge-fixing
    tgt = target_model
    F_mats = []  # F_j rho  (column vectors)
    for f1 in prep_fiducials:
        layout_ops = [tgt.operations[l].to_dense() for l in f1.layertup]
        rho = tgt.preps[prep_lbl].to_dense()
        for g in layout_ops:
            rho = g @ rho
        F_mats.append(rho)
    E_stack = tgt.povms[povm_lbl].to_dense()  # [n_out, d2]
    A_rows = np.empty((nM * n_out, d2))
    for i, f2 in enumerate(effect_fiducials):
        H = np.eye(d2)
        for l in f2.layertup:
            H = tgt.operations[l].to_dense() @ H
        for e in range(n_out):
            A_rows[i * n_out + e] = E_stack[e] @ H
    Mt = Ud.T @ A_rows         # [d2, d2] frame map (target gauge)
    Mt_inv = np.linalg.inv(Mt)

    # build estimate model
    mdl = target_model.copy()
    from pygsti_tpu.modelmembers import operations as _opm
    from pygsti_tpu.modelmembers import states as _stm
    from pygsti_tpu.modelmembers import povms as _pvm

    for g_lbl in op_labels:
        gc = Circuit((g_lbl,), prep_fiducials[0].line_labels if prep_fiducials else None)
        PG = probs_matrix(gc)
        G_frame = (Ud.T @ PG @ Vd) @ Tinv   # = M G M^-1 in frame
        G_est = Mt_inv @ G_frame @ Mt
        old = mdl.operations[g_lbl]
        mdl.operations[g_lbl] = _relparam_op(old, G_est)

    # rho estimate: column of AB at the empty prep fiducial if present
    rho_frame = Ud.T @ AB  # [d2, nP] = M (F_j rho) cols
    j0 = _index_of_empty(prep_fiducials)
    if j0 is not None:
        rho_est = Mt_inv @ rho_frame[:, j0]
        old_p = mdl.preps[prep_lbl]
        mdl.preps[prep_lbl] = _relparam_prep(old_p, rho_est)
    i0 = _index_of_empty(effect_fiducials)
    if i0 is not None:
        E_frame = (AB @ Vd @ Tinv)  # rows: E' M^-1
        effects = collections.OrderedDict()
        for e, ol in enumerate(outcome_lbls):
            effects[ol] = E_frame[i0 * n_out + e] @ Mt
        old_povm = mdl.povms[povm_lbl]
        mdl.povms[povm_lbl] = _relparam_povm(old_povm, effects)

    mdl._mark_for_rebuild()
    return mdl


def _index_of_empty(fiducials):
    for i, f in enumerate(fiducials):
        if f.depth == 0:
            return i
    return None


def _relparam_op(old_op, mx):
    """Re-wrap a dense estimate in the same parameterization family."""
    from pygsti_tpu.modelmembers import operations as _opm
    if isinstance(old_op, _opm.FullTPOp):
        mx = np.array(mx)
        mx[0, :] = 0
        mx[0, 0] = 1.0
        return _opm.FullTPOp(mx)
    if isinstance(old_op, _opm.FullArbitraryOp):
        return _opm.FullArbitraryOp(mx)
    return _opm.FullArbitraryOp(mx)  # fallback: full parameterization


def _relparam_prep(old_p, vec):
    from pygsti_tpu.modelmembers import states as _stm
    if isinstance(old_p, _stm.TPState):
        v = np.array(vec)
        udim = int(round(np.sqrt(len(vec))))
        v[0] = 1.0 / np.sqrt(udim)
        return _stm.TPState(v)
    return _stm.FullState(vec)


def _relparam_povm(old_povm, effects):
    from pygsti_tpu.modelmembers import povms as _pvm
    if isinstance(old_povm, _pvm.TPPOVM):
        # adjust so effects sum to identity-vec
        dim = len(next(iter(effects.values())))
        udim = int(round(np.sqrt(dim)))
        id_vec = np.zeros(dim)
        id_vec[0] = np.sqrt(udim)
        keys = list(effects.keys())
        total = np.sum([effects[k] for k in keys[:-1]], axis=0)
        effects[keys[-1]] = id_vec - total
        return _pvm.TPPOVM(effects)
    return _pvm.UnconstrainedPOVM(effects)


def run_gst_fit_simple(dataset, start_model, circuits, optimizer, objective_function_builder,
                       resource_alloc=None, verbosity=0):
    """Convenience: build objective and optimize (reference: core.py:605)."""
    optimizer = SimplerLMOptimizer.cast(optimizer)
    builder = ObjectiveFunctionBuilder.cast(objective_function_builder)
    objective = builder.build(start_model, dataset, circuits, verbosity=verbosity)
    opt_result = optimizer.run(objective, printer=VerbosityPrinter.create_printer(verbosity))
    return opt_result, objective


def run_gst_fit(mdc_store, optimizer, objective_function_builder, verbosity=0):
    """Fit the store's model to its data (reference: core.py:639)."""
    optimizer = SimplerLMOptimizer.cast(optimizer)
    builder = ObjectiveFunctionBuilder.cast(objective_function_builder)
    objective = builder.build_from_store(mdc_store, verbosity)
    opt_result = optimizer.run(objective, printer=VerbosityPrinter.create_printer(verbosity))
    return opt_result, objective


def iterative_gst_generator(dataset, start_model, circuit_lists,
                            optimizer, iteration_objfn_builders, final_objfn_builders,
                            resource_alloc=None, starting_index=0, verbosity=0,
                            profiler=None):
    """Generator yielding per-iteration GST results (reference: core.py:831).

    Yields (opt_results_list, model) for each circuit list (iteration), using
    the previous iteration's model as the next seed.  The final iteration
    additionally runs `final_objfn_builders`.
    """
    printer = VerbosityPrinter.create_printer(verbosity)
    optimizer = SimplerLMOptimizer.cast(optimizer)
    iteration_objfn_builders = [ObjectiveFunctionBuilder.cast(b) for b in iteration_objfn_builders]
    final_objfn_builders = [ObjectiveFunctionBuilder.cast(b) for b in final_objfn_builders]

    mdl = start_model.copy()
    n_iters = len(circuit_lists)

    # For nested circuit lists (each a prefix of the final list -- the
    # standard GST structure), ALL iterations share ONE layout (the final
    # list's), with counts masked to the active prefix.  One layout means one
    # set of compiled device graphs for the entire fit: XLA compilation (and
    # compiled-executable loading, even from the persistent cache) costs
    # minutes per distinct shape on the TPU client, while evaluating the
    # masked full batch costs only a few extra device-seconds per early
    # iteration.  PYGSTI_TPU_LAYOUT_TIERS=paired restores the round-1
    # consecutive-pair tiers (cheaper early iterations, 4x the compiles).
    import os as _os
    lists = [list(cl) for cl in circuit_lists]
    nested = all(lists[i] == lists[-1][:len(lists[i])] for i in range(n_iters - 1))
    tier_of = {}
    tier_layouts = {}
    if nested:
        if _os.environ.get('PYGSTI_TPU_LAYOUT_TIERS', 'single') == 'paired':
            for i in range(n_iters):
                tier_of[i] = min(i + ((n_iters - 1 - i) % 2), n_iters - 1)
        else:
            for i in range(n_iters):
                tier_of[i] = n_iters - 1

    def _tier_layout(t):
        if t not in tier_layouts:
            tier_layouts[t] = mdl.sim.create_layout(lists[t], dataset)
        return tier_layouts[t]

    def make_objective(builder, i):
        raw = builder.build_raw()
        from pygsti_tpu.objectivefns.objectivefns import TimeIndependentMDCObjectiveFunction
        if nested:
            t = tier_of[i]
            return TimeIndependentMDCObjectiveFunction(
                raw, mdl, dataset, lists[t], penalties=builder.penalties,
                name=builder.name, layout=_tier_layout(t),
                num_active_circuits=len(lists[i]))
        return TimeIndependentMDCObjectiveFunction(
            raw, mdl, dataset, lists[i], penalties=builder.penalties,
            name=builder.name)

    import time as _time
    from pygsti_tpu.baseobjs.profiler import DummyProfiler
    profiler = profiler if profiler is not None else \
        getattr(resource_alloc, 'profiler', None) or DummyProfiler()
    for i in range(starting_index, n_iters):
        printer.log("--- Iterative GST: Iter %d of %d  (%d circuits) ---"
                    % (i + 1, n_iters, len(lists[i])))
        opt_results = []
        builders = list(iteration_objfn_builders)
        if i == n_iters - 1:
            builders = builders + list(final_objfn_builders)
        for builder in builders:
            t0 = _time.time()
            with profiler.timing('iteration %d: %s objective build'
                                 % (i, builder.name)):
                objective = make_objective(builder, i)
            with profiler.timing('iteration %d: %s optimize'
                                 % (i, builder.name)):
                result = optimizer.run(
                    objective, printer=VerbosityPrinter.create_printer(verbosity))
            opt_results.append(result)
            profiler.add_count('LM stages')
            printer.log("    %s stage: %.1fs (f=%.1f)"
                        % (builder.name, _time.time() - t0, result.f))
        yield (opt_results, mdl.copy())


def run_iterative_gst(dataset, start_model, circuit_lists, optimizer,
                      iteration_objfn_builders, final_objfn_builders,
                      resource_alloc=None, verbosity=0):
    """Run all iterations; returns (models, opt_results, final_store)."""
    models, results = [], []
    gen = iterative_gst_generator(dataset, start_model, circuit_lists, optimizer,
                                  iteration_objfn_builders, final_objfn_builders,
                                  resource_alloc, verbosity=verbosity)
    for opt_results, mdl in gen:
        models.append(mdl)
        results.append(opt_results)
    return models, results


def gram_rank_and_eigenvalues(dataset, prep_fiducials, effect_fiducials,
                              target_model):
    """Rank and singular values of the dataset's Gram matrix (reference:
    core.gram_rank_and_eigenvalues:536)."""
    from pygsti_tpu.algorithms.grammatrix import _gram_rank_and_evals
    return _gram_rank_and_evals(dataset, prep_fiducials, effect_fiducials,
                                target_model)


def find_closest_unitary_opmx(operation_mx, op_basis='pp'):
    """The closest (max-fidelity) unitary superoperator to `operation_mx`:
    the unitary part of the polar decomposition of the Choi matrix's
    dominant eigenvector's unitary... computed here via the dominant Choi
    eigenvector, which maximizes process fidelity among unitary channels
    (reference: core.find_closest_unitary_opmx:1200)."""
    import numpy as _np
    from pygsti_tpu.tools.jamiolkowski import jamiolkowski_iso
    from pygsti_tpu.tools.optools import unitary_to_superop
    J = _np.asarray(jamiolkowski_iso(_np.asarray(operation_mx), op_basis,
                                     'std'))
    evals, evecs = _np.linalg.eigh((J + J.conj().T) / 2)
    kraus = evecs[:, -1]                      # dominant Choi eigenvector
    d = int(round(_np.sqrt(len(kraus))))
    K = kraus.reshape(d, d) * _np.sqrt(d)
    # polar-project K onto the unitary manifold
    u_svd, _, vh = _np.linalg.svd(K)
    U = u_svd @ vh
    return _np.real_if_close(unitary_to_superop(U, op_basis))


def validate_and_extend_optimizer(optimizer, size):
    """Normalize the `optimizer` argument of iterative GST to a per-iteration
    list: a single optimizer (or settings dict, or None) is replicated `size`
    times; a list must have length 1 or `size` (reference:
    core.validate_and_extend_optimizer:791)."""
    if optimizer is None:
        optimizer = SimplerLMOptimizer.cast(None)
    if isinstance(optimizer, list) and len(optimizer) == 1:
        optimizer = optimizer * size
    if isinstance(optimizer, (SimplerLMOptimizer, dict)):
        optimizers = [optimizer] * size
    elif not isinstance(optimizer, list):
        raise ValueError("Invalid argument for optimizers of type %s; "
                         "supported types are list, Optimizer, or dict."
                         % type(optimizer))
    else:
        optimizers = optimizer
    assert len(optimizers) in (1, size), \
        "Optimizers must be length 1 or length %d" % size
    return optimizers
