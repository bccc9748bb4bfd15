"""Simulated data generation (reference: pygsti/data/datasetconstruction.py:26)."""

from __future__ import annotations

import numpy as np

from pygsti_tpu.data.dataset import DataSet
from pygsti_tpu.circuits.circuit import Circuit


def simulate_data(model_or_dataset, circuit_list, num_samples, sample_error='multinomial',
                  seed=None, rand_state=None, alias_dict=None, collision_action='aggregate',
                  record_zero_counts=True, comm=None, mem_limit=None, times=None):
    """Create a DataSet of simulated counts from a model's outcome probabilities.

    sample_error: 'none' (probs*N, float), 'round' (rounded), 'binomial',
    'multinomial' -- semantics matching the reference.

    `times`, when given, records TIME-SERIES data: counts are sampled
    independently at every timestamp (time-independent simulators give the
    same probabilities at each time, as in the reference) and stored with
    per-timestamp repetition counts.  `alias_dict` maps circuit-layer
    labels to replacement Circuits used for SIMULATION only; the dataset
    stays keyed on the original circuits (reference:
    datasetconstruction.py:28, circuit.replace_layers_with_aliases:2802).
    """
    if collision_action not in ('aggregate', 'keepseparate'):
        raise ValueError("Invalid collision_action %r" % (collision_action,))
    if collision_action == 'keepseparate':
        raise NotImplementedError(
            "collision_action='keepseparate' (occurrence-tagged repeated "
            "circuits) is not supported; deduplicate the circuit list or "
            "use 'aggregate'")
    circuits = [c if isinstance(c, Circuit) else Circuit(c) for c in circuit_list]
    rng = rand_state if rand_state is not None else np.random.RandomState(seed)
    sim_circuits = circuits if not alias_dict else         [c.replace_layers_with_aliases(alias_dict) for c in circuits]

    if isinstance(model_or_dataset, DataSet):
        # resample an existing dataset
        src = model_or_dataset
        all_probs = []
        for c in sim_circuits:
            row = src[c]
            t = row.total
            all_probs.append({ol: cnt / t for ol, cnt in row.items()})
    else:
        model = model_or_dataset
        prob_dicts = model.sim.bulk_probs(sim_circuits)
        all_probs = [prob_dicts[c] for c in sim_circuits]

    ds = DataSet()
    for c, probs in zip(circuits, all_probs):
        outcomes = list(probs.keys())
        p = np.array([max(float(probs[o]), 0.0) for o in outcomes])
        psum = p.sum()
        if psum > 1.0 or sample_error in ('multinomial',):
            p = p / max(psum, 1e-300)
        N = num_samples if np.isscalar(num_samples) else num_samples[circuits.index(c)]
        if sample_error == 'none':
            counts = {o: N * pi for o, pi in zip(outcomes, p)}
        elif sample_error == 'round':
            counts = {o: int(round(N * pi)) for o, pi in zip(outcomes, p)}
        elif sample_error == 'binomial':
            assert len(outcomes) == 2, "binomial sampling requires 2 outcomes"
            n0 = rng.binomial(N, min(max(p[0], 0.0), 1.0))
            counts = {outcomes[0]: n0, outcomes[1]: N - n0}
        elif sample_error == 'multinomial':
            draws = rng.multinomial(N, p)
            counts = {o: int(n) for o, n in zip(outcomes, draws)}
        else:
            raise ValueError("Invalid sample_error %r" % sample_error)
        if times is None:
            ds.add_count_dict(c, counts, record_zero_counts=record_zero_counts)
        else:
            # time-series mode: independent sample at every timestamp
            ols, ts, reps = [], [], []
            for k, t in enumerate(times):
                if k == 0:
                    tc = counts
                elif sample_error == 'multinomial':
                    tc = {o: int(n) for o, n in
                          zip(outcomes, rng.multinomial(N, p))}
                elif sample_error == 'binomial':
                    n0 = rng.binomial(N, min(max(p[0], 0.0), 1.0))
                    tc = {outcomes[0]: n0, outcomes[1]: N - n0}
                else:  # 'none' / 'round': deterministic, same every time
                    tc = counts
                for o, n in tc.items():
                    if n == 0 and not record_zero_counts:
                        continue
                    ols.append(o)
                    ts.append(float(t))
                    reps.append(n)
            ds.add_raw_series_data(c, ols, ts, reps)
    return ds


def aggregate_dataset_outcomes(dataset, label_merge_dict,
                               record_zero_counts=True):
    """Merge outcomes of a DataSet, e.g. aggregate a 2-qubit 4-outcome set
    into marginal 2-outcome data (reference:
    datasetconstruction.aggregate_dataset_outcomes:283).

    `label_merge_dict` maps each NEW outcome label to the list of OLD
    outcome labels (strings or tuples) it absorbs."""
    from pygsti_tpu.data.dataset import DataSet
    norm = {}
    for new, olds in label_merge_dict.items():
        new_t = (new,) if not isinstance(new, tuple) else new
        norm[new_t] = [(o,) if not isinstance(o, tuple) else o for o in olds]
    out = DataSet(outcome_labels=[k[0] for k in norm])
    for c in dataset.keys():
        row = dataset[c]
        counts = {}
        for new_t, olds in norm.items():
            tot = sum(row.counts.get(o, 0) for o in olds)
            if tot > 0 or record_zero_counts:
                counts[new_t[0]] = tot
        out.add_count_dict(c, counts)
    out.done_adding_data()
    return out


def _marginalize_outcome(outcome, keep_indices):
    return (''.join(outcome[0][i] for i in keep_indices),)


def filter_dataset(dataset, sectors_to_keep, sindices_to_keep=None,
                   new_sectors=None, idle=((),), record_zero_counts=True,
                   filtercircuits=True):
    """Restrict a DataSet to a subset of qubits/sectors: marginalize the
    outcome strings over the dropped sectors and keep only circuits whose
    gates act within `sectors_to_keep` (reference:
    datasetconstruction.filter_dataset:431)."""
    from pygsti_tpu.data.dataset import DataSet
    from pygsti_tpu.circuits.circuit import Circuit
    sectors = list(sectors_to_keep)
    out = None
    for c in dataset.keys():
        lls = list(c.line_labels)
        if sindices_to_keep is not None:
            keep_idx = list(sindices_to_keep)
        else:
            keep_idx = [lls.index(s) for s in sectors if s in lls]
        if filtercircuits:
            ok = True
            for layer in c.layertup:
                comps = (layer,) if layer.is_simple else tuple(layer.components)
                for comp in comps:
                    if comp.sslbls is None:
                        continue
                    if not set(comp.sslbls) <= set(sectors):
                        ok = False
                        break
                if not ok:
                    break
            if not ok:
                continue
        # rebuild the circuit on the kept lines (relabel when requested)
        if new_sectors is not None:
            mapping = {s: new_sectors[i] for i, s in enumerate(sectors)}
            new_c = c.map_state_space_labels(
                lambda x: mapping.get(x, x))
            new_c = Circuit(new_c.layertup,
                            tuple(mapping[s] for s in sectors if s in lls))
        else:
            new_c = Circuit(c.layertup,
                            tuple(s for s in sectors if s in lls))
        row = dataset[c]
        counts = {}
        for outcome, cnt in row.counts.items():
            m = _marginalize_outcome(outcome, keep_idx)
            counts[m] = counts.get(m, 0) + cnt
        if out is None:
            out = DataSet(outcome_labels=sorted({o[0] for o in counts}))
        out.add_count_dict(new_c, {k[0]: v for k, v in counts.items()})
    if out is not None:
        out.done_adding_data()
    return out


def trim_to_constant_numtimesteps(ds):
    """Trim a time-series DataSet so every circuit has the same number of
    timesteps (the minimum over circuits; reference:
    datasetconstruction.trim_to_constant_numtimesteps:520)."""
    from pygsti_tpu.data.dataset import DataSet
    n_times = []
    for c in ds.keys():
        row = ds[c]
        assert row.time is not None, \
            "trim_to_constant_numtimesteps requires time-series data"
        n_times.append(len(set(row.time)))
    min_times = min(n_times) if n_times else 0
    out = DataSet(outcome_labels=list(getattr(ds, '_outcome_labels', [])))
    for c in ds.keys():
        row = ds[c]
        unique_ts = sorted(set(row.time))[:min_times]
        keep = set(unique_ts)
        ols, ts = [], []
        for ol, t in zip(row.outcome_series, row.time):
            if t in keep:
                ols.append(ol)
                ts.append(t)
        out.add_raw_series_data(c, ols, ts)
    out.done_adding_data()
    return out
