"""Legacy one-call GST drivers (reference: pygsti/drivers/longsequence.py:315,690)."""

from __future__ import annotations

from pygsti_tpu.protocols.protocol import ProtocolData
from pygsti_tpu.protocols.gst import (StandardGSTDesign, GateSetTomography, StandardGST,
                                      GSTInitialModel, GSTObjFnBuilders)
from pygsti_tpu.protocols.modeltest import ModelTest




def _apply_advanced_options(advanced_options):
    """Translate the reference's legacy `advanced_options` dict (reference:
    drivers/advancedoptions.py) into protocol arguments.  Supported keys
    are honored; unknown keys raise (no silent accept-and-ignore)."""
    adv = dict(advanced_options or {})
    out = {}
    if 'objective' in adv:
        # the reference's stage structure: 'logl' = chi2 iterations + final
        # MLE, 'chi2' = chi2-only (GSTObjFnBuilders.create_from)
        out['objfn_builders'] = GSTObjFnBuilders.create_from(
            objective=adv.pop('objective'))
    opt_kw = {}
    if 'max_iterations' in adv:
        opt_kw['maxiter'] = int(adv.pop('max_iterations'))
    if 'tolerance' in adv:
        opt_kw['tol'] = adv.pop('tolerance')
    if opt_kw:
        from pygsti_tpu.optimize.simplerlm import SimplerLMOptimizer
        out['optimizer'] = SimplerLMOptimizer(**opt_kw)
    if 'starting_point' in adv:
        out['starting_point'] = adv.pop('starting_point')
    if 'bad_fit_threshold' in adv:
        from pygsti_tpu.protocols.gst import GSTBadFitOptions
        out['badfit_options'] = GSTBadFitOptions(
            threshold=adv.pop('bad_fit_threshold'))
    if 'estimate_label' in adv:
        out['name'] = adv.pop('estimate_label')
    if adv:
        raise ValueError(
            "Unsupported advanced_options keys %s; supported: objective, "
            "max_iterations, tolerance, starting_point, bad_fit_threshold, "
            "estimate_label" % sorted(adv))
    return out


def _write_output_pkl(results, output_pkl):
    """Write results to a pickle file/path (reference: longsequence.py
    _output_to_pickle)."""
    if output_pkl is None:
        return
    import pickle
    if hasattr(output_pkl, 'write'):
        pickle.dump(results, output_pkl)
    else:
        with open(output_pkl, 'wb') as f:
            pickle.dump(results, f)


def run_long_sequence_gst(data_filename_or_set, target_model, prep_fiducials,
                          meas_fiducials, germs, max_lengths, gauge_opt_params=None,
                          advanced_options=None, comm=None, mem_limit=None,
                          output_pkl=None, verbosity=2):
    """One-call long-sequence GST (reference: longsequence.py:315)."""
    from pygsti_tpu.data.dataset import DataSet
    ds = data_filename_or_set
    if isinstance(ds, str):
        from pygsti_tpu.io import read_dataset
        ds = read_dataset(ds)
    design = StandardGSTDesign(target_model, prep_fiducials, meas_fiducials, germs,
                               max_lengths)
    data = ProtocolData(design, ds)
    gaugeopt = 'stdgaugeopt' if gauge_opt_params is None else {'go0': gauge_opt_params}
    adv = _apply_advanced_options(advanced_options)
    starting_point = adv.pop('starting_point', None)
    name = adv.pop('name', 'GateSetTomography')
    init = GSTInitialModel(target_model=target_model,
                           starting_point=starting_point) \
        if starting_point is not None \
        else GSTInitialModel(target_model=target_model)
    proto = GateSetTomography(init, gaugeopt_suite=gaugeopt,
                              verbosity=verbosity, name=name, **adv)
    results = proto.run(data)
    _write_output_pkl(results, output_pkl)
    return results


def run_stdpractice_gst(data_filename_or_set, processorspec_or_model, prep_fiducials,
                        meas_fiducials, germs, max_lengths, modes=('full TP', 'CPTPLND', 'Target'),
                        gaugeopt_suite='stdgaugeopt', comm=None, mem_limit=None,
                        verbosity=2):
    """One-call StandardGST (reference: longsequence.py:690)."""
    ds = data_filename_or_set
    if isinstance(ds, str):
        from pygsti_tpu.io import read_dataset
        ds = read_dataset(ds)
    target = processorspec_or_model
    design = StandardGSTDesign(target, prep_fiducials, meas_fiducials, germs, max_lengths)
    data = ProtocolData(design, ds)
    proto = StandardGST(modes, gaugeopt_suite=gaugeopt_suite, verbosity=verbosity)
    return proto.run(data)


def run_model_test(model_to_test, data_filename_or_set, target_model, prep_fiducials,
                   meas_fiducials, germs, max_lengths, verbosity=2):
    """One-call model test (reference: longsequence.py:34)."""
    ds = data_filename_or_set
    design = StandardGSTDesign(target_model, prep_fiducials, meas_fiducials, germs,
                               max_lengths)
    data = ProtocolData(design, ds)
    proto = ModelTest(model_to_test, target_model, verbosity=verbosity)
    return proto.run(data)


def run_linear_gst(data_filename_or_set, target_model, prep_fiducials,
                   meas_fiducials, gauge_opt_params=None, advanced_options=None,
                   comm=None, mem_limit=None, output_pkl=None, verbosity=2):
    """One-call LGST analysis (reference: drivers/longsequence.py:204
    run_linear_gst): runs the LinearGateSetTomography protocol on an
    LGST-only experiment design."""
    from pygsti_tpu.protocols.gst import (StandardGSTDesign,
                                          LinearGateSetTomography)
    from pygsti_tpu.protocols.protocol import ProtocolData

    ds = data_filename_or_set
    if isinstance(ds, str):
        from pygsti_tpu.io import read_dataset
        ds = read_dataset(ds)
    # an LGST-only design: maxLengths=[1] with no germs beyond the gates
    design = StandardGSTDesign(target_model, prep_fiducials, meas_fiducials,
                               [], [1])
    data = ProtocolData(design, ds)
    if advanced_options:
        # LGST is a closed-form linear inversion: none of the iterative-GST
        # advanced options apply
        raise ValueError("run_linear_gst takes no advanced_options "
                         "(got %s)" % sorted(advanced_options))
    proto = LinearGateSetTomography(
        target_model,
        gaugeopt_suite='stdgaugeopt' if gauge_opt_params is None else
        {'go0': gauge_opt_params},
        verbosity=verbosity)
    results = proto.run(data)
    _write_output_pkl(results, output_pkl)
    return results


def run_long_sequence_gst_base(data_filename_or_set, target_model,
                               lsgst_lists, gauge_opt_params=None,
                               advanced_options=None, comm=None,
                               mem_limit=None, output_pkl=None, verbosity=2):
    """Long-sequence GST with EXPLICIT circuit lists instead of
    fiducials+germs+maxLengths (reference:
    longsequence.run_long_sequence_gst_base:530)."""
    from pygsti_tpu.protocols.gst import GateSetTomographyDesign
    ds = data_filename_or_set
    if isinstance(ds, str):
        from pygsti_tpu.io import read_dataset
        ds = read_dataset(ds)
    if lsgst_lists and not isinstance(lsgst_lists[0], (list, tuple)) \
       and not hasattr(lsgst_lists[0], '__iter__'):
        lsgst_lists = [lsgst_lists]
    design = GateSetTomographyDesign(target_model, list(lsgst_lists))
    data = ProtocolData(design, ds)
    gaugeopt = 'stdgaugeopt' if gauge_opt_params is None \
        else {'go0': gauge_opt_params}
    adv = _apply_advanced_options(advanced_options)
    starting_point = adv.pop('starting_point', None)
    name = adv.pop('name', 'GateSetTomography')
    init = GSTInitialModel(target_model=target_model,
                           starting_point=starting_point) \
        if starting_point is not None \
        else GSTInitialModel(target_model=target_model)
    proto = GateSetTomography(init, gaugeopt_suite=gaugeopt,
                              verbosity=verbosity, name=name, **adv)
    results = proto.run(data)
    _write_output_pkl(results, output_pkl)
    return results
