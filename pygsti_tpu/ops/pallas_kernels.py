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
    """One (circuit tile, outcome) program, batch-last layout.  The grid is
    (batch tiles x outcomes): each outcome's back-propagated effect evolves
    independently, and splitting outcomes across programs keeps the unrolled
    kernel body small enough for the Mosaic compiler at production sizes
    (K1=17, d=16 crashed the compile helper when all outcomes shared one
    program body).

    cols_ref: [D, 1, TB] int32 op indices (identity-padded)
    g_ref:    [K1, d, d] op stack (+identity), g_ref[k][j][i] = G[k][i][j]
              (TRANSPOSED within each op so column slices give G rows)
    e_ref:    [1, d, TB] this outcome's effect rows
    f_ref:    [D, d, TB] state BEFORE each layer (forward-pass stash)
    a_ref:    [K1, d*d, TB] per-op gradient accumulator (output);
              row i*d + j holds A[b, n, k, i, j] for this program's n
    bfin_ref: [1, d, TB] back-propagated effect (output)
    """
    from jax.experimental import pallas as pl

    D = cols_ref.shape[0]
    K1, d, _ = g_ref.shape

    a_ref[:] = jnp.zeros_like(a_ref)

    def body(t, bc):
        # bc: [d, TB].  cols/F arrive depth-REVERSED, so the loop counter
        # indexes them directly (index arithmetic on the counter trips
        # Mosaic's int32/int64 verification under jax_enable_x64)
        idx = cols_ref[pl.ds(t, 1)][0]               # [1, TB]
        f = f_ref[pl.ds(t, 1)][0]                    # [d, TB]
        # contrib rows (i*d + j) = Bc[i,:] * f[j,:]
        pieces = [bc[i:i + 1, :] * f for i in range(d)]  # each [d, TB]
        contrib = jnp.concatenate(pieces, axis=0)        # [d*d, TB]
        # explicit int32 literals: under jax_enable_x64 a bare Python int
        # promotes the comparison to int64, which Mosaic rejects
        masks = [(idx == jnp.int32(k)).astype(bc.dtype)
                 for k in range(K1)]                     # [1, TB]
        for k in range(K1):
            a_ref[k, :, :] += masks[k] * contrib
        # Bc[j,:] = sum_i Bc[i,:] * G[idx, i, j]:
        #   ghat_i[j, :] = sum_k mask_k * G[k, i, j]  (g_ref holds G^T per
        #   op so g_ref[k, :, i] is the row G[k, i, :])
        bc_new = jnp.zeros_like(bc)
        for i in range(d):
            ghat_i = masks[0] * g_ref[0, :, i:i + 1]
            for k in range(1, K1):
                ghat_i = ghat_i + masks[k] * g_ref[k, :, i:i + 1]
            # ghat_i: [d(j), TB]; bc[i:i+1, :]: [1, TB]
            bc_new = bc_new + bc[i:i + 1, :] * ghat_i
        return bc_new

    bc_final = jax.lax.fori_loop(jnp.int32(0), jnp.int32(D), body, e_ref[0])
    bfin_ref[:] = bc_final[None]


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

    # index maps return EXPLICIT int32: under jax_enable_x64 the default
    # int64 block indices crash the TPU compile helper (constants must be
    # created inside the map -- index maps may not capture tracers)
    def _i32(x):
        return jax.lax.convert_element_type(x, jnp.int32)

    grid_spec = pl.GridSpec(
        grid=(nb, NOUT),
        in_specs=[
            pl.BlockSpec((D, 1, tile), lambda i, n: (_i32(0), _i32(0), _i32(i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K1, d, d), lambda i, n: (_i32(0), _i32(0), _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, tile), lambda i, n: (_i32(n), _i32(0), _i32(i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, d, tile), lambda i, n: (_i32(0), _i32(0), _i32(i)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K1, d * d, tile),
                         lambda i, n: (_i32(n), _i32(0), _i32(0), _i32(i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, tile), lambda i, n: (_i32(n), _i32(0), _i32(i)),
                         memory_space=pltpu.VMEM),
        ],
    )

    def _kernel_wrap(cols_ref, g_ref, e_ref, f_ref, a4_ref, bfin_ref):
        # int32 ref slice: a bare 0 under x64 lowers to an i64 memref index,
        # which Mosaic rejects
        _kernel(cols_ref, g_ref, e_ref, f_ref, a4_ref.at[jnp.int32(0)],
                bfin_ref)

    A_t, Bf_t = pl.pallas_call(
        _kernel_wrap,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NOUT, K1, d * d, B), G.dtype),
            jax.ShapeDtypeStruct((NOUT, d, B), G.dtype),
        ],
    )(cols_t, g_t, e_t, f_t)
    A = jnp.transpose(A_t.reshape(NOUT, K1, d, d, B), (4, 0, 1, 2, 3))
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
