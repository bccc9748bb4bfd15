"""Serial == sharded correctness on an 8-virtual-device CPU mesh.

The reference's core distributed contract is that every sharded computation
equals its serial counterpart (test/unit/mpi/test_mpi.py:15-62,
run_me_with_mpiexec.py).  Here the analogue: probs, dprobs, the fused
JTJ/JTf products, and a full device-LM step computed with ``sim.mesh`` set
on an 8-device mesh must equal the mesh=None results, for batch sizes both
divisible and NOT divisible by the device count (padded layouts).
"""

import os

# exact-Jacobian mode: serial-vs-sharded equality is checked at f64
# tightness (the default f32 Jacobian differs by reduction order at ~1e-4)
os.environ['PYGSTI_TPU_J_DTYPE'] = 'float64'

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
from pygsti_tpu.data import simulate_data
from pygsti_tpu.layouts.layout import CircuitOutcomeProbabilityLayout
from pygsti_tpu.parallel.mesh import circuit_mesh, replicated
from pygsti_tpu.objectivefns.objectivefns import (
    RawPoissonPicDeltaLogLFunction, RawChi2Function,
    TimeIndependentMDCObjectiveFunction)

N_DEV = 8


@pytest.fixture(scope="module")
def workload():
    jax.config.update("jax_enable_x64", True)
    target = mp.target_model('full TP')
    lists = create_lsgst_circuit_lists(target, mp.prep_fiducials(), mp.meas_fiducials(),
                                       mp.germs(), [1, 2])
    circuits = list(lists[-1])
    datagen = target.depolarize(op_noise=0.02, spam_noise=0.01)
    ds = simulate_data(datagen, circuits, 1000, seed=7)
    return target, ds, circuits


def _objective(model, ds, circuits, mesh, pad, raw=None):
    layout = CircuitOutcomeProbabilityLayout(circuits, model, ds,
                                             pad_to_multiple=pad)
    model.sim.mesh = mesh
    model.sim._cache.clear()
    obj = TimeIndependentMDCObjectiveFunction(
        raw or RawPoissonPicDeltaLogLFunction(), model, ds, circuits,
        layout=layout)
    return obj, layout


def _check_batch(workload, n_circuits):
    """Assert serial == sharded for a batch of `n_circuits` circuits."""
    target, ds, circuits = workload
    circuits = circuits[:n_circuits]
    assert jax.device_count() >= N_DEV, "conftest must provide 8 virtual devices"
    mesh = circuit_mesh(N_DEV)

    serial_model = target.copy()
    obj_s, lay_s = _objective(serial_model, ds, circuits, None, None)
    sharded_model = target.copy()
    obj_m, lay_m = _objective(sharded_model, ds, circuits, mesh, N_DEV)

    v = serial_model.to_vector()

    # probs (padded tail rows replicate circuit 0; compare the real elements)
    p_s = obj_s.probs(v)
    p_m = obj_m.probs(v)
    n_el = lay_s.num_elements
    np.testing.assert_allclose(p_m[:n_el], p_s, atol=1e-14)

    # lsvec + dlsvec (padded elements have zero counts AND zero totals, so
    # they must contribute exactly zero)
    ls_s, ls_m = obj_s.lsvec(v), obj_m.lsvec(v)
    np.testing.assert_allclose(ls_m[:len(ls_s)], ls_s, atol=1e-12)
    assert np.all(ls_m[n_el:lay_m.num_elements] == 0.0)
    dls_s, dls_m = obj_s.dlsvec(v), obj_m.dlsvec(v)
    np.testing.assert_allclose(dls_m[:n_el], dls_s, rtol=1e-9, atol=1e-9)

    # fused JTJ / JTf (the LM inputs; the mesh version psums over devices --
    # different reduction order, so exact bitwise equality is not expected)
    f_s, jtj_s, jtf_s = obj_s.jtj_jtf(v)
    f_m, jtj_m, jtf_m = obj_m.jtj_jtf(v)
    scale = np.max(np.abs(jtj_s))
    np.testing.assert_allclose(jtf_m, jtf_s, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(jtj_m, jtj_s, rtol=1e-9, atol=1e-12 * scale)

    # one full device-LM step from the same start must land on the same x
    x_s, conv_s, _, _, _, nf_s, _ = obj_s.run_device_lm(v, maxiter=3)
    x_m, conv_m, _, _, _, nf_m, _ = obj_m.run_device_lm(v, maxiter=3)
    assert conv_s and conv_m
    np.testing.assert_allclose(x_m, x_s, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(nf_m, nf_s, rtol=1e-9)


def test_serial_eq_sharded_even_batch(workload):
    _check_batch(workload, 96)   # 96 = 12 per device


def test_serial_eq_sharded_padded_batch(workload):
    _check_batch(workload, 93)   # 93 % 8 != 0: layout pads to 96


def test_sharded_chi2_and_full_gst_iteration(workload):
    """A chi2-stage LM fit on the mesh equals the serial fit."""
    target, ds, circuits = workload
    mesh = circuit_mesh(N_DEV)
    raw = RawChi2Function({'min_prob_clip_for_weighting': 1e-4})

    ms = target.copy()
    obj_s, _ = _objective(ms, ds, circuits, None, None, raw=raw)
    mm = target.copy()
    obj_m, _ = _objective(mm, ds, circuits, mesh, N_DEV, raw=raw)

    v = ms.to_vector()
    x_s, conv_s, _, _, _, nf_s, _ = obj_s.run_device_lm(v, maxiter=25)
    x_m, conv_m, _, _, _, nf_m, _ = obj_m.run_device_lm(v, maxiter=25)
    assert conv_s and conv_m
    # same objective minimum (parameter vectors may differ along gauge
    # directions after many steps; the fit quality must agree tightly)
    np.testing.assert_allclose(nf_m, nf_s, rtol=1e-6)


def test_sharded_probs_match_on_mesh_context(workload):
    """probs under an explicit mesh context manager (pjit path)."""
    target, ds, circuits = workload
    mesh = circuit_mesh(N_DEV)
    model = target.copy()
    layout = CircuitOutcomeProbabilityLayout(circuits, model, ds,
                                             pad_to_multiple=N_DEV)
    model.sim.mesh = mesh
    pf = model.sim.probs_fn(layout)
    v = replicated(mesh, jnp.asarray(model.to_vector()))
    with mesh:
        p = jax.jit(pf)(v)
    model2 = target.copy()
    layout2 = CircuitOutcomeProbabilityLayout(circuits, model2, ds)
    p2 = model2.sim.bulk_fill_probs(None, layout2)
    np.testing.assert_allclose(np.asarray(p)[:layout2.num_elements], p2, atol=1e-14)
