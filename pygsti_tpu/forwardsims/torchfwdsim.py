"""Torch-backed forward simulator (reference:
pygsti/forwardsims/torchfwdsim.py).

The reference's TorchForwardSimulator was its proof-of-concept functional
simulator (stateless params -> tensors -> autodiff probs) -- the design the
whole pygsti_tpu compute core generalizes with jax.  This implementation
closes the API-parity loop: the same layout index tensors drive a torch
evaluation with `torch.autograd` Jacobians, useful for cross-framework
validation and for users embedded in torch pipelines (CPU torch build)."""

from __future__ import annotations

import numpy as np

from pygsti_tpu.forwardsims.forwardsim import ForwardSimulator

try:
    import torch
    TORCH_ENABLED = True
except ImportError:
    torch = None
    TORCH_ENABLED = False


class StatelessModel(object):
    """Pure params -> stacked-tensor bridge: evaluates the model's
    `tensors_fn` path with torch tensors (reference:
    torchfwdsim.StatelessModel:40 extracts the same pure structure from
    Torchable members)."""

    def __init__(self, model, layout):
        self.model = model
        self.layout = layout
        self.outcome_probs_dim = layout.num_elements

    def get_free_params(self, model=None):
        model = model if model is not None else self.model
        return torch.tensor(np.asarray(model.to_vector()),
                            dtype=torch.float64, requires_grad=True)

    def circuit_probs(self, free_params):
        """Outcome probabilities as a torch tensor (differentiable)."""
        import jax
        import jax.numpy as jnp
        layout = self.layout
        model = self.model
        # evaluate the model's theta -> tensors map through jax ONCE per
        # value (torch keeps the autograd graph over the final propagation;
        # the params->tensors chain is re-linearized via jax jacfwd)
        v_np = free_params.detach().numpy()
        compute = model.tensors_fn()
        t = compute(jnp.asarray(v_np))
        ops = torch.tensor(np.asarray(t.ops), dtype=torch.float64)
        preps = torch.tensor(np.asarray(t.preps), dtype=torch.float64)
        effects = torch.tensor(np.asarray(t.effects), dtype=torch.float64)
        # re-attach gradients through the (linearized) params->tensors map
        def flat(tt):
            return jnp.concatenate([tt.ops.reshape(-1), tt.preps.reshape(-1),
                                    tt.effects.reshape(-1)])
        Tv = np.asarray(jax.jacfwd(lambda v: flat(compute(v)))(jnp.asarray(v_np)))
        tf0 = np.concatenate([np.asarray(t.ops).ravel(),
                              np.asarray(t.preps).ravel(),
                              np.asarray(t.effects).ravel()])
        tf = torch.tensor(tf0, dtype=torch.float64) + \
            torch.tensor(Tv, dtype=torch.float64) @ (free_params -
                                                     free_params.detach())
        o_sz = ops.numel()
        p_sz = preps.numel()
        ops_t = tf[:o_sz].reshape(ops.shape)
        preps_t = tf[o_sz:o_sz + p_sz].reshape(preps.shape)
        eff_t = tf[o_sz + p_sz:].reshape(effects.shape)

        dim = model.dim
        eye = torch.eye(dim, dtype=torch.float64).unsqueeze(0)
        G = torch.cat([ops_t, eye], dim=0)
        rho = preps_t[np.asarray(layout.prep_index)]
        for l in range(layout.max_depth):
            idx = torch.tensor(np.asarray(layout.op_indices[:, l]),
                               dtype=torch.long)
            rho = torch.einsum('bij,bj->bi', G[idx], rho)
        E = eff_t[np.asarray(layout.elem_effect)]
        return (E * rho[np.asarray(layout.elem_circuit)]).sum(dim=1)

    # reference-name alias
    def circuit_probs_from_torch_bases(self, free_params):
        return self.circuit_probs(free_params)


class TorchForwardSimulator(ForwardSimulator):
    """Forward simulator computing probs + Jacobians with torch autograd
    (reference: torchfwdsim.TorchForwardSimulator:211)."""

    ENABLED = TORCH_ENABLED

    def __init__(self, model=None):
        if not self.ENABLED:
            raise RuntimeError("PyTorch could not be imported")
        super().__init__(model)

    def bulk_fill_probs(self, array_to_fill, layout):
        slm = StatelessModel(self.model, layout)
        p = slm.circuit_probs(slm.get_free_params()).detach().numpy()
        if array_to_fill is not None:
            array_to_fill[:] = p
        return p

    def bulk_fill_dprobs(self, array_to_fill, layout, pr_array_to_fill=None):
        slm = StatelessModel(self.model, layout)
        free = slm.get_free_params()
        J = torch.autograd.functional.jacobian(slm.circuit_probs, free)
        J = J.detach().numpy()
        if pr_array_to_fill is not None:
            pr_array_to_fill[:] = slm.circuit_probs(free).detach().numpy()
        if array_to_fill is not None:
            array_to_fill[:] = J
        return J
