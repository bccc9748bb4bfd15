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
    """
    circuits = [c if isinstance(c, Circuit) else Circuit(c) for c in circuit_list]
    rng = rand_state if rand_state is not None else np.random.RandomState(seed)

    if isinstance(model_or_dataset, DataSet):
        # resample an existing dataset
        src = model_or_dataset
        all_probs = []
        for c in circuits:
            row = src[c]
            t = row.total
            all_probs.append({ol: cnt / t for ol, cnt in row.items()})
    else:
        model = model_or_dataset
        prob_dicts = model.sim.bulk_probs(circuits)
        all_probs = [prob_dicts[c] for c in circuits]

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
        ds.add_count_dict(c, counts, record_zero_counts=record_zero_counts)
    return ds
