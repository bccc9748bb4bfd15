"""Non-gauge / gauge parameter-space decomposition.

Replaces the reference's explicitcalc.nongauge_projector machinery
(pygsti/models/explicitcalc.py:657, explicitmodel.py:704
compute_nongauge_projector): gauge directions are obtained by AD through the
gauge group's S(v) action on the model tensors and pulled back to parameter
space through the params->tensors Jacobian.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def compute_nongauge_and_gauge_spaces(model, item_weights=None,
                                      non_gauge_mix_mx=None, tol=1e-7):
    """(nongauge_space, gauge_space): orthonormal bases (columns) of the
    model's parameter space split into gauge and non-gauge directions.

    Gauge directions: d/dv of the gauge-transformed model tensors at the
    identity gauge element, pulled back to parameter space by least squares
    through the params->tensors Jacobian (reference:
    explicitcalc.nongauge_projector, explicitcalc.py:657; model method
    compute_nongauge_and_gauge_spaces, explicitmodel.py:704).
    """
    from pygsti_tpu.models.gaugegroup import default_gauge_group_for_model
    gg = default_gauge_group_for_model(model)
    P = model.num_params
    if gg.num_params == 0:
        return np.eye(P), np.zeros((P, 0))

    compute = model.tensors_fn()

    def flat_tensors(v):
        t = compute(v)
        return jnp.concatenate([t.ops.reshape(-1), t.preps.reshape(-1),
                                t.effects.reshape(-1)])

    v_model = jnp.asarray(model.to_vector())
    dF = np.asarray(jax.jacfwd(flat_tensors)(v_model))      # [NX, P]

    t0 = compute(v_model)
    ops0, preps0, effects0 = (jnp.asarray(t0.ops), jnp.asarray(t0.preps),
                              jnp.asarray(t0.effects))

    def xformed(gv):
        S = gg.element_matrix_jax(gv)
        Sinv = jnp.linalg.inv(S)
        ops_t = jnp.einsum('ij,kjl,lm->kim', Sinv, ops0, S)
        preps_t = preps0 @ Sinv.T
        effects_t = effects0 @ S
        return jnp.concatenate([ops_t.reshape(-1), preps_t.reshape(-1),
                                effects_t.reshape(-1)])

    g0 = jnp.asarray(np.asarray(gg.initial_params(), dtype=float))
    dX = np.asarray(jax.jacfwd(xformed)(g0))                # [NX, nGaugeGen]

    # pull back to parameter space: dF @ v_k ~= dX[:, k]
    Vg, *_ = np.linalg.lstsq(dF, dX, rcond=None)            # [P, nGaugeGen]
    # keep only directions realizable by the parameterization
    realized = dF @ Vg
    keep = np.linalg.norm(realized, axis=0) > tol * max(
        np.linalg.norm(dX), 1e-12)
    Vg = Vg[:, keep]

    # orthonormal gauge basis
    if Vg.shape[1] > 0:
        U, s, _ = np.linalg.svd(Vg, full_matrices=False)
        rank = int(np.sum(s > tol * max(s[0], 1e-12)))
        gauge_space = U[:, :rank]
    else:
        gauge_space = np.zeros((P, 0))

    if non_gauge_mix_mx is not None:
        # mix gauge directions into the non-gauge space (reference:
        # explicitcalc.py:657 non_gauge_mix_mx): nongauge_i += M_ij gauge_j
        full_ng = _orth_complement(gauge_space, P, tol)
        nongauge_space = full_ng + gauge_space @ np.asarray(non_gauge_mix_mx).T
        return nongauge_space, gauge_space

    nongauge_space = _orth_complement(gauge_space, P, tol)
    return nongauge_space, gauge_space


def _orth_complement(basis, dim, tol=1e-7):
    """Orthonormal complement of column-space of `basis` in R^dim."""
    if basis.shape[1] == 0:
        return np.eye(dim)
    proj = np.eye(dim) - basis @ basis.T
    U, s, _ = np.linalg.svd(proj)
    rank = int(np.sum(s > tol))
    return U[:, :rank]


