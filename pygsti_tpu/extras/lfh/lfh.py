"""Locally-fluctuating-Hamiltonian simulation: models whose (Hamiltonian)
error rates fluctuate between shots with Gaussian statistics (reference:
pygsti/extras/lfh/lfherrorgen.py:40 LFHLindbladErrorgen,
lfhforwardsims.py:42 LFHWeakForwardSimulator, :188
LFHIntegratingForwardSimulator, :529 LFHSigmaForwardSimulator).

TPU-first re-design: because every model here is a pure function of its
parameter vector, fluctuation averaging is just batched evaluation over a
grid of parameter vectors -- a vmap over the probability function, with
Gauss-Hermite weights for the integrating simulator.  No special errorgen
subclass is needed; any parameters may fluctuate.
"""

from __future__ import annotations

import itertools

import numpy as np


class GaussianParamFluctuation(object):
    """Specifies Gaussian fluctuations on selected model parameters:
    v_i ~ Normal(v_i, dev_i) for each (param_index -> dev)."""

    def __init__(self, param_devs):
        self.param_devs = dict(param_devs)

    @property
    def indices(self):
        return sorted(self.param_devs.keys())

    @property
    def devs(self):
        return np.array([self.param_devs[i] for i in self.indices])


class _LFHBase(object):
    def __init__(self, model, fluctuation):
        self.model = model
        self.fluctuation = fluctuation

    def _probs_at_offsets(self, circuit, offsets):
        """probs for each row of `offsets` [n_grid, n_fluct] added to the
        fluctuating params; returns [n_grid, n_out] + outcome labels."""
        import jax
        import jax.numpy as jnp
        model = self.model
        layout = model.sim.create_layout([circuit])
        pf = model.sim.probs_fn(layout)
        v0 = jnp.asarray(model.to_vector())
        idx = jnp.asarray(self.fluctuation.indices)

        def probs_of(offset_row):
            v = v0.at[idx].add(offset_row)
            return pf(v)

        vals = jax.vmap(probs_of)(jnp.asarray(offsets))
        sl = layout.element_slices[0]
        outcomes = layout.outcomes[0]
        return np.asarray(vals[:, sl]), outcomes


class LFHIntegratingForwardSimulator(_LFHBase):
    """Average probabilities over a Gauss-Hermite product grid of the
    fluctuating parameters (reference: lfhforwardsims.py:188)."""

    def __init__(self, model, fluctuation, order=5):
        super().__init__(model, fluctuation)
        self.order = order
        # Gauss-Hermite for weight exp(-x^2): x -> sqrt(2)*dev*x, w /= sqrt(pi)
        nodes, weights = np.polynomial.hermite.hermgauss(order)
        self._nodes = nodes
        self._weights = weights / np.sqrt(np.pi)

    def _grid(self):
        devs = self.fluctuation.devs
        n = len(devs)
        offsets, weights = [], []
        for combo in itertools.product(range(self.order), repeat=n):
            offsets.append([np.sqrt(2) * devs[k] * self._nodes[c]
                            for k, c in enumerate(combo)])
            weights.append(np.prod([self._weights[c] for c in combo]))
        return np.asarray(offsets), np.asarray(weights)

    def probs(self, circuit, clip_to=None, time=None):
        from pygsti_tpu.baseobjs.outcomelabeldict import OutcomeLabelDict
        offsets, weights = self._grid()
        vals, outcomes = self._probs_at_offsets(circuit, offsets)
        avg = weights @ vals
        if clip_to is not None:
            avg = np.clip(avg, clip_to[0], clip_to[1])
        return OutcomeLabelDict(zip(outcomes, map(float, avg)))

    def bulk_probs(self, circuits, clip_to=None):
        return {c: self.probs(c, clip_to) for c in circuits}


class LFHWeakForwardSimulator(_LFHBase):
    """Monte-Carlo fluctuation averaging: sample rate realizations and
    average the exact per-realization probabilities (reference:
    lfhforwardsims.py:42)."""

    def __init__(self, model, fluctuation, shots=100, base_seed=None):
        super().__init__(model, fluctuation)
        self.shots = shots
        self.base_seed = base_seed

    def probs(self, circuit, clip_to=None, time=None):
        from pygsti_tpu.baseobjs.outcomelabeldict import OutcomeLabelDict
        rng = np.random.RandomState(self.base_seed)
        devs = self.fluctuation.devs
        offsets = rng.randn(self.shots, len(devs)) * devs[None, :]
        vals, outcomes = self._probs_at_offsets(circuit, offsets)
        avg = vals.mean(axis=0)
        if clip_to is not None:
            avg = np.clip(avg, clip_to[0], clip_to[1])
        return OutcomeLabelDict(zip(outcomes, map(float, avg)))

    def bulk_probs(self, circuits, clip_to=None):
        return {c: self.probs(c, clip_to) for c in circuits}


class LFHSigmaForwardSimulator(_LFHBase):
    """Second-order (sigma-point) fluctuation approximation: probs at the
    mean plus 0.5 * sum_i dev_i^2 * d^2 probs / dtheta_i^2 (reference:
    lfhforwardsims.py:529)."""

    def __init__(self, model, fluctuation):
        super().__init__(model, fluctuation)

    def probs(self, circuit, clip_to=None, time=None):
        import jax
        import jax.numpy as jnp
        from pygsti_tpu.baseobjs.outcomelabeldict import OutcomeLabelDict
        model = self.model
        layout = model.sim.create_layout([circuit])
        pf = model.sim.probs_fn(layout)
        v0 = jnp.asarray(model.to_vector())
        idx = self.fluctuation.indices
        devs = self.fluctuation.devs
        p0 = np.asarray(pf(v0))
        total = p0.copy()
        for i, dev in zip(idx, devs):
            e = jnp.zeros_like(v0).at[i].set(1.0)
            # second directional derivative via double jvp
            def f(t):
                return pf(v0 + t * e)
            d2 = jax.jacfwd(jax.jacfwd(f))(0.0)
            total = total + 0.5 * dev ** 2 * np.asarray(d2)
        sl = layout.element_slices[0]
        outcomes = layout.outcomes[0]
        vals = total[sl]
        if clip_to is not None:
            vals = np.clip(vals, clip_to[0], clip_to[1])
        return OutcomeLabelDict(zip(outcomes, map(float, vals)))

    def bulk_probs(self, circuits, clip_to=None):
        return {c: self.probs(c, clip_to) for c in circuits}
