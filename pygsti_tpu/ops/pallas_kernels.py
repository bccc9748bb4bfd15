"""Pallas TPU kernels for the hot Jacobian inner loop.

The per-op gradient accumulation of the Jacobian backward scan
(objectivefns._block_probs_jac's bwd_step) carries a large accumulator
A[b, n_out, n_ops+1, d, d] through a `lax.scan` over circuit depth; under
XLA this accumulator lives in HBM and is re-read/re-written every layer
(~56 GB of traffic on the 2Q maxL=64 workload).  The kernel below tiles
the circuit batch so the accumulator lives in VMEM for the whole depth
loop and is written to HBM exactly once.

TPU-native layout: the circuit batch is the LANE (last, 128-wide)
dimension everywhere inside the kernel -- depth/outcome/row indices are
leading dimensions, so the per-layer dynamic slice and all masked
accumulations are lane-aligned (Mosaic rejects unaligned lane-dimension
dynamic slices).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _kernel(cols_ref, g_ref, e_ref, f_ref, a_ref, bfin_ref):
    """One circuit tile, batch-last layout.

    cols_ref: [D, 1, TB] int32 op indices (identity-padded)
    g_ref:    [K1, d, d] op stack (+identity), g_ref[k][j][i] = G[k][i][j]
              (TRANSPOSED within each op so column slices give G rows)
    e_ref:    [NOUT, d, TB] effect rows
    f_ref:    [D, d, TB] state BEFORE each layer (forward-pass stash)
    a_ref:    [K1, NOUT*d*d, TB] per-op gradient accumulator (output);
              row n*d*d + i*d + j holds A[b, n, k, i, j]
    bfin_ref: [NOUT, d, TB] back-propagated effects (output)
    """
    from jax.experimental import pallas as pl

    D = cols_ref.shape[0]
    K1, d, _ = g_ref.shape
    NOUT = e_ref.shape[0]

    a_ref[:] = jnp.zeros_like(a_ref)

    def body(t, bc):
        # bc: [NOUT, d, TB].  cols/F arrive depth-REVERSED, so the loop
        # counter indexes them directly (index arithmetic on the counter
        # trips Mosaic's int32/int64 verification under jax_enable_x64)
        idx = cols_ref[pl.ds(t, 1)][0]               # [1, TB]
        f = f_ref[pl.ds(t, 1)][0]                    # [d, TB]
        # contrib rows (n*d*d + i*d + j) = Bc[n,i,:] * f[j,:]
        pieces = []
        for n in range(NOUT):
            for i in range(d):
                pieces.append(bc[n, i:i + 1, :] * f)     # [d, TB]
        contrib = jnp.concatenate(pieces, axis=0)        # [NOUT*d*d, TB]
        masks = [(idx == k).astype(bc.dtype) for k in range(K1)]  # [1, TB]
        for k in range(K1):
            a_ref[k, :, :] += masks[k] * contrib
        # Bc[n,j,:] = sum_i Bc[n,i,:] * G[idx, i, j]:
        #   ghat_i[:, j, :] = sum_k mask_k * G[k, i, j]  (g_ref holds G^T
        #   per op so g_ref[k, :, i] is the row G[k, i, :])
        bc_new = jnp.zeros_like(bc)
        for i in range(d):
            ghat_i = masks[0][None] * g_ref[0:1, :, i:i + 1]
            for k in range(1, K1):
                ghat_i = ghat_i + masks[k][None] * g_ref[k:k + 1, :, i:i + 1]
            # ghat_i: [1, d(j), TB]; bc[:, i:i+1, :]: [NOUT, 1, TB]
            bc_new = bc_new + bc[:, i:i + 1, :] * ghat_i
        return bc_new

    bc_final = jax.lax.fori_loop(jnp.int32(0), jnp.int32(D), body, e_ref[:])
    bfin_ref[:] = bc_final


@functools.partial(jax.jit, static_argnames=('tile',))
def bwd_jacobian_accumulate(cols, G, E, F, tile=256):
    """Per-op gradient binning for the Jacobian backward pass.

    cols [B, D] int32; G [K1, d, d]; E [B, NOUT, d]; F [B, D, d] (state
    before layer l, batch-major).  Returns (A [B, NOUT, K1, d, d],
    B_final [B, NOUT, d]) matching (up to f32 summation order) the
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
    X = NOUT * d * d

    cols_t = jnp.transpose(cols, (1, 0))[::-1, None, :]  # [D, 1, B] reversed
    e_t = jnp.transpose(E, (1, 2, 0))                    # [NOUT, d, B]
    f_t = jnp.transpose(F, (1, 2, 0))[::-1]              # [D, d, B] reversed
    g_t = jnp.transpose(G, (0, 2, 1))                    # G^T per op

    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((D, 1, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K1, d, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NOUT, d, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, d, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K1, X, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NOUT, d, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    A_t, Bf_t = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((K1, X, B), G.dtype),
            jax.ShapeDtypeStruct((NOUT, d, B), G.dtype),
        ],
    )(cols_t, g_t, e_t, f_t)
    A = jnp.transpose(A_t.reshape(K1, NOUT, d, d, B), (4, 1, 0, 2, 3))
    B_final = jnp.transpose(Bf_t, (2, 0, 1))
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
