"""Pallas TPU kernels for the hot Jacobian inner loop.

The per-op gradient accumulation of the Jacobian backward scan
(objectivefns._block_probs_jac's bwd_step) carries a large accumulator
A[b, n_out, n_ops+1, d, d] through a `lax.scan` over circuit depth; under
XLA this accumulator lives in HBM and is re-read/re-written every layer
(~56 GB of traffic on the 2Q maxL=64 workload).  The kernel below tiles
the circuit batch so the accumulator lives in VMEM for the whole depth
loop and is written to HBM exactly once.

Enable in the objective pipeline with PYGSTI_TPU_PALLAS_BWD=1 (off by
default: measure on your workload first -- see ops/README note in the
docstring of `bwd_jacobian_accumulate`).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _kernel(cols_ref, g_ref, e_ref, f_ref, a_ref, bfin_ref):
    """One circuit tile: run the depth loop with the accumulator in VMEM.

    cols_ref: [TB, D] int32 op indices (identity-padded)
    g_ref:    [K1, d, d] op stack (+identity)
    e_ref:    [TB, NOUT, d] effect rows
    f_ref:    [TB, D, d] state BEFORE each layer (forward-pass stash)
    a_ref:    [TB, K1, NOUT*d*d] per-op gradient accumulator (output)
    bfin_ref: [TB, NOUT, d] back-propagated effects (output)
    """
    TB, D = cols_ref.shape
    K1, d, _ = g_ref.shape
    NOUT = e_ref.shape[1]

    a_ref[:] = jnp.zeros_like(a_ref)
    g_flat = g_ref[:].reshape(K1, d * d)

    def body(t, bc):
        l = D - 1 - t
        idx = cols_ref[:, l]                        # [TB]
        f = f_ref[:, l, :]                          # [TB, d]
        # contrib[b, n, i, j] = Bc[b, n, i] * f[b, j]
        contrib = (bc[:, :, :, None] * f[:, None, None, :]).reshape(
            TB, NOUT * d * d)
        onehot = (idx[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, K1), 1)).astype(bc.dtype)  # [TB, K1]
        for k in range(K1):
            a_ref[:, k, :] += onehot[:, k:k + 1] * contrib
        # per-row selected op and Bc propagation:
        #   Ghat[b] = G[idx[b]]  via a [TB,K1]x[K1,d*d] matmul (MXU)
        ghat = jnp.dot(onehot, g_flat,
                       preferred_element_type=bc.dtype).reshape(TB, d, d)
        # Bc[b,n,j] = sum_i Bc[b,n,i] * Ghat[b,i,j]  (VPU reduce)
        bc = jnp.sum(bc[:, :, :, None] * ghat[:, None, :, :], axis=2)
        return bc

    bc_final = jax.lax.fori_loop(0, D, body, e_ref[:])
    bfin_ref[:] = bc_final


@functools.partial(jax.jit, static_argnames=('tile',))
def bwd_jacobian_accumulate(cols, G, E, F, tile=256):
    """Per-op gradient binning for the Jacobian backward pass.

    cols [B, D] int32; G [K1, d, d]; E [B, NOUT, d]; F [B, D, d] (state
    before layer l, batch-major).  Returns (A [B, NOUT, K1, d, d],
    B_final [B, NOUT, d]) identical (up to f32 summation order) to the
    lax.scan einsum formulation in objectivefns._block_probs_jac.

    The batch must be padded to a multiple of `tile` by the caller
    (identity ops / zero effects pad harmlessly).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D = cols.shape
    K1, d, _ = G.shape
    NOUT = E.shape[1]
    assert B % tile == 0, "pad the batch to a multiple of the tile size"
    nb = B // tile

    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K1, d, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, NOUT, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, K1, NOUT * d * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, NOUT, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    A_flat, B_final = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, K1, NOUT * d * d), G.dtype),
            jax.ShapeDtypeStruct((B, NOUT, d), G.dtype),
        ],
    )(cols, G, E, F)
    A = A_flat.reshape(B, K1, NOUT, d, d).transpose(0, 2, 1, 3, 4)
    return A, B_final


def bwd_jacobian_accumulate_reference(cols, G, E, F):
    """The einsum/scan formulation (for testing the kernel against)."""
    K1 = G.shape[0]

    def bwd_step(carry, xs):
        Bc, A = carry
        idx_col, f_prev = xs
        onehot = jax.nn.one_hot(idx_col, K1, dtype=G.dtype)
        A = A + jnp.einsum('bk,bni,bj->bnkij', onehot, Bc, f_prev)
        yb = jnp.einsum('bni,kij->bnkj', Bc, G)
        Bc = jnp.einsum('bnkj,bk->bnj', yb, onehot)
        return (Bc, A), None

    B, D = cols.shape
    d = G.shape[1]
    NOUT = E.shape[1]
    A0 = jnp.zeros((B, NOUT, K1, d, d), dtype=G.dtype)
    cols_T = cols.T                      # [D, B]
    F_T = jnp.transpose(F, (1, 0, 2))    # [D, B, d]
    (B_final, A), _ = jax.lax.scan(bwd_step, (E, A0),
                                   (cols_T[::-1], F_T[::-1]))
    return A, B_final
