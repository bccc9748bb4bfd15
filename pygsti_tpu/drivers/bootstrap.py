"""Bootstrapped error bars for GST estimates
(reference: pygsti/drivers/bootstrap.py)."""

from __future__ import annotations

import numpy as np

from pygsti_tpu.data.dataset import DataSet
from pygsti_tpu.data.datasetconstruction import simulate_data


def create_bootstrap_dataset(input_dataset, generation_method, input_model=None,
                             seed=None, outcome_labels=None, verbosity=1):
    """Resample a dataset: 'nonparametric' (resample counts from observed
    frequencies) or 'parametric' (sample from input_model's probabilities)."""
    rng = np.random.RandomState(seed)
    if generation_method == 'nonparametric':
        ds = DataSet(outcome_labels=outcome_labels)
        for c in input_dataset.keys():
            row = input_dataset[c]
            N = int(round(row.total))
            outcomes = list(row.counts.keys())
            p = np.array([row.counts[o] / row.total for o in outcomes])
            p = p / p.sum()
            draws = rng.multinomial(N, p)
            ds.add_count_dict(c, {o: int(n) for o, n in zip(outcomes, draws)})
        return ds
    elif generation_method == 'parametric':
        assert input_model is not None
        circuits = list(input_dataset.keys())
        N = int(round(input_dataset[circuits[0]].total))
        ds = simulate_data(input_model, circuits, N, seed=seed)
        if outcome_labels is not None:
            # register the requested label set even when a resample never
            # observes some outcomes (mirrors the nonparametric branch)
            from pygsti_tpu.baseobjs.outcomelabeldict import OutcomeLabelDict
            for ol in outcome_labels:
                ol = OutcomeLabelDict.to_outcome(ol)
                if ol not in ds._outcome_labels:
                    ds._outcome_labels.append(ol)
        return ds
    raise ValueError("Invalid generation_method %r" % generation_method)


def create_bootstrap_models(num_models, input_data_set, generation_method,
                            prep_fiducials, meas_fiducials, germs, max_lengths,
                            input_model=None, target_model=None, start_seed=0,
                            return_data=False, verbosity=2):
    """Run GST on `num_models` resampled datasets (reference:
    bootstrap.create_bootstrap_models)."""
    from pygsti_tpu.algorithms.core import run_lgst, run_iterative_gst
    from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
    if target_model is None:
        target_model = input_model
    lists = create_lsgst_circuit_lists(target_model, prep_fiducials, meas_fiducials,
                                       germs, max_lengths)
    models, datasets = [], []
    for i in range(num_models):
        ds = create_bootstrap_dataset(input_data_set, generation_method,
                                      input_model, seed=start_seed + i)
        seed_model = target_model.copy()
        ms, _ = run_iterative_gst(ds, seed_model, lists, None, ['chi2'], ['logl'],
                                  verbosity=0)
        models.append(ms[-1])
        datasets.append(ds)
    return (models, datasets) if return_data else models


def gauge_optimize_models(models, target_model, gate_metric="frobenius",
                          spam_metric="frobenius", plot=False):
    """Gauge-optimize each bootstrap model to the target."""
    from pygsti_tpu.algorithms.gaugeopt import gaugeopt_to_target
    return [gaugeopt_to_target(m, target_model) for m in models]


def to_std_array(prop_list):
    return np.array(prop_list)


def _mean_std(values):
    arr = np.asarray(values, dtype=float)
    return float(arr.mean()), float(arr.std(ddof=1) if len(arr) > 1 else 0.0)


def bootstrap_error_bars(models, fn_of_model):
    """(mean, std) of a scalar model function over bootstrap models."""
    return _mean_std([fn_of_model(m) for m in models])
