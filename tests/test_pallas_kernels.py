"""Tests for the Pallas TPU kernels (interpret mode on CPU)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestBwdJacobianKernel:
    def test_matches_einsum_scan(self):
        from jax.experimental import pallas as pl
        import pygsti_tpu.ops.pallas_kernels as pk

        rng = np.random.RandomState(0)
        B, D, K1, d, NOUT, TB = 32, 9, 7, 16, 4, 16
        cols = jnp.asarray(rng.randint(0, K1, (B, D)), jnp.int32)
        G = jnp.asarray(rng.randn(K1, d, d) / 4, jnp.float32)
        E = jnp.asarray(rng.randn(B, NOUT, d), jnp.float32)
        F = jnp.asarray(rng.randn(B, D, d), jnp.float32)

        orig = pl.pallas_call
        pl.pallas_call = functools.partial(orig, interpret=True)
        try:
            A1, Bf1 = pk.bwd_jacobian_accumulate(cols, G, E, F, tile=TB)
        finally:
            pl.pallas_call = orig
        A2, Bf2 = pk.bwd_jacobian_accumulate_reference(cols, G, E, F)
        scale = float(jnp.abs(A2).max())
        assert float(jnp.abs(A1 - A2).max()) < 1e-5 * scale
        assert float(jnp.abs(Bf1 - Bf2).max()) < 1e-5 * float(
            jnp.abs(Bf2).max())
