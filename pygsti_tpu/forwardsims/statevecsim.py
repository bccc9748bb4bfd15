"""Complex-amplitude (statevec) forward simulator.

TPU-native replacement for the reference's statevec evotype + simulator
backends (pygsti/evotypes/statevec/*.cpp/.pyx, ~2100 LoC;
forwardsims/termforwardsim_calc_statevec.pyx uses the same reps): pure
states evolve as a ``[B, u]`` complex batch through a ``lax.scan`` over
circuit depth with the same gather-free one-hot MXU contraction as the
density-matrix simulator -- but in the u = 2^n dimensional Hilbert space
instead of the 4^n superoperator space, making 10+ qubit unitary circuits
cheap.

Probabilities: p = Re(psi^dag E psi) with E the std-basis effect matrix
(computational-basis POVMs reduce to |psi_k|^2).  Jacobians come from
``jax.jacfwd`` end-to-end, like the dense simulator.

Requires unitary gates + pure-state preps (members exposing
``to_unitary_jax`` / ``to_statevec_jax``); a clear ValueError is raised at
layout-build time otherwise (the capability check the reference's evotype
selection performs in evotype.py:60-103).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pygsti_tpu.forwardsims.forwardsim import ForwardSimulator
from pygsti_tpu.layouts.layout import CircuitOutcomeProbabilityLayout
from pygsti_tpu.tools.jitutils import jit_fast as _jit_fast


class StateVectorForwardSimulator(ForwardSimulator):
    """Batched pure-state propagation under jit (statevec evotype path)."""

    def __init__(self, model=None, mesh=None):
        super().__init__(model)
        self.mesh = mesh
        self._cache = {}

    def create_layout(self, circuits, dataset=None, resource_alloc=None,
                      array_types=('e',), derivative_dimensions=None, verbosity=0):
        return CircuitOutcomeProbabilityLayout(circuits, self.model, dataset)

    def _compiled(self, layout):
        # cache ON the layout: id-keyed simulator caches go stale after id()
        # reuse (see SimpleForwardSimulator._compiled)
        cache = getattr(layout, '_sim_compiled_cache', None)
        if cache is None:
            cache = layout._sim_compiled_cache = {}
        hit = cache.get(id(self))
        if hit is not None:
            return hit[1]
        entry = self._build(layout)
        cache[id(self)] = (self, entry)
        return entry

    def _build(self, layout):
        model = self.model
        compute = model.statevec_tensors_fn()  # raises if not statevec-capable
        op_idx = jnp.asarray(layout.op_indices)      # [B, D]
        prep_idx = jnp.asarray(layout.prep_index)    # [B]
        elem_c = jnp.asarray(layout.elem_circuit)    # [E]
        elem_e = jnp.asarray(layout.elem_effect)     # [E]
        if self.mesh is not None:
            from pygsti_tpu.parallel.mesh import shard_circuits
            op_idx = shard_circuits(self.mesh, op_idx)
            prep_idx = shard_circuits(self.mesh, prep_idx)
            elem_c = shard_circuits(self.mesh, elem_c)
            elem_e = shard_circuits(self.mesh, elem_e)

        def probs(v):
            us, psis, emxs = compute(v)
            u = psis.shape[1]
            eye = jnp.eye(u, dtype=us.dtype)[None]
            U = jnp.concatenate([us, eye], axis=0)      # [K+1, u, u]
            psi = psis[prep_idx]                        # [B, u] complex
            if layout.max_depth > 0:
                def step(carry, idx_col):
                    # all K+1 candidate updates on the MXU, one-hot select
                    y = jnp.einsum('bj,kij->bki', carry, U)
                    oh = jax.nn.one_hot(idx_col, U.shape[0], dtype=carry.real.dtype)
                    return jnp.einsum('bki,bk->bi', y, oh.astype(carry.dtype)), None
                psi, _ = jax.lax.scan(step, psi, op_idx.T)
            E = emxs[elem_e]                            # [E, u, u]
            amp = psi[elem_c]                           # [E, u]
            return jnp.real(jnp.einsum('ei,eij,ej->e', amp.conj(), E, amp))

        use_jit = layout.num_elements >= 64
        return {'probs': _jit_fast(probs) if use_jit else probs,
                'dprobs': (_jit_fast(jax.jacfwd(probs)) if use_jit
                           else jax.jacfwd(probs)),
                'probs_raw': probs}

    def bulk_fill_probs(self, array_to_fill, layout):
        fns = self._compiled(layout)
        v = jnp.asarray(self.model.to_vector())
        p = np.asarray(fns['probs'](v))
        if array_to_fill is not None:
            array_to_fill[:] = p
        return p

    def bulk_fill_dprobs(self, array_to_fill, layout, pr_array_to_fill=None):
        fns = self._compiled(layout)
        v = jnp.asarray(self.model.to_vector())
        dp = np.asarray(fns['dprobs'](v))
        if pr_array_to_fill is not None:
            pr_array_to_fill[:] = np.asarray(fns['probs'](v))
        if array_to_fill is not None:
            array_to_fill[:] = dp
        return dp

    def probs_fn(self, layout):
        return self._compiled(layout)['probs_raw']


# evotype-style alias matching the reference's naming
SimpleMatrixForwardSimulator = StateVectorForwardSimulator
