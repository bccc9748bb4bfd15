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


# -- 2-D ('circuits', 'params') mesh: param-dimension sharding ----------------
# (reference: distlayout.py:139-196 param1 x param2 processor grid;
#  arraysinterface.py:597 DistributedArraysInterface)

def _check_grid(workload, n_circ_dev, n_param_dev, n_circuits=96):
    from pygsti_tpu.parallel.mesh import grid_mesh
    target, ds, circuits = workload
    circuits = circuits[:n_circuits]
    mesh2d = grid_mesh(n_circ_dev, n_param_dev)

    serial_model = target.copy()
    obj_s, lay_s = _objective(serial_model, ds, circuits, None, None)
    grid_model = target.copy()
    obj_g, lay_g = _objective(grid_model, ds, circuits, mesh2d, n_circ_dev)

    v = serial_model.to_vector()
    n_el = lay_s.num_elements

    p_s, p_g = obj_s.probs(v), obj_g.probs(v)
    np.testing.assert_allclose(p_g[:n_el], p_s, atol=1e-14)

    dls_s, dls_g = obj_s.dlsvec(v), obj_g.dlsvec(v)
    np.testing.assert_allclose(dls_g[:n_el], dls_s, rtol=1e-9, atol=1e-9)

    f_s, jtj_s, jtf_s = obj_s.jtj_jtf(v)
    f_g, jtj_g, jtf_g = obj_g.jtj_jtf(v)
    scale = np.max(np.abs(jtj_s))
    np.testing.assert_allclose(jtf_g, jtf_s, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(jtj_g, jtj_s, rtol=1e-9, atol=1e-12 * scale)

    # a short device-LM run must land on the same point
    x_s, conv_s, _, _, _, nf_s, _ = obj_s.run_device_lm(v, maxiter=3)
    x_g, conv_g, _, _, _, nf_g, _ = obj_g.run_device_lm(v, maxiter=3)
    assert conv_s and conv_g
    np.testing.assert_allclose(x_g, x_s, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(nf_g, nf_s, rtol=1e-9)


def test_serial_eq_grid_4x2(workload):
    """4 circuit-devices x 2 param-devices."""
    _check_grid(workload, 4, 2)


def test_serial_eq_grid_2x4(workload):
    """2 circuit-devices x 4 param-devices (param axis does not divide P
    evenly -- GSPMD pads internally)."""
    _check_grid(workload, 2, 4)


def test_grid_jacobian_actually_param_sharded(workload):
    """The [P, E] tangent Jacobian inside the grid path is genuinely sharded
    along 'params' (not replicated): check the sharding of the jtj output."""
    from pygsti_tpu.parallel.mesh import grid_mesh, replicated
    target, ds, circuits = workload
    circuits = circuits[:64]
    mesh2d = grid_mesh(2, 4)
    model = target.copy()
    obj, lay = _objective(model, ds, circuits, mesh2d, 2)
    v = jnp.asarray(model.to_vector())
    compiled = obj._fns['jtj_jtf'].lower(
        v, obj._counts_j, obj._totals_j, obj._freqs_j,
        obj._flag_j, obj._regs_j).compile()
    txt = compiled.as_text()
    # P=43 params over 4 param-devices -> per-device tangent blocks have an
    # 11-row leading axis in the partitioned module (XLA may all-gather the
    # final [P, P] jtj, but the tangent computation itself must be sharded)
    P = len(v)
    per_dev = -(-P // 4)
    assert ("f64[%d," % per_dev) in txt, \
        "no %d-row tangent shards in the partitioned module; the param " \
        "axis appears replicated" % per_dev


def test_cg_solver_matches_cholesky_unit():
    """_solve_damped_cg == _solve_damped on random SPD systems."""
    from pygsti_tpu.optimize.device_lm import _solve_damped, _solve_damped_cg
    rng = np.random.RandomState(5)
    for P in (7, 40):
        J = rng.randn(3 * P, P)
        JTJ = jnp.asarray(J.T @ J)
        jtj_diag = jnp.diag(JTJ)
        rhs = jnp.asarray(rng.randn(P))
        for mu in (1e-3, 1.0):
            dx_c = _solve_damped(JTJ, jtj_diag, jnp.asarray(mu), rhs)
            dx_g = _solve_damped_cg(JTJ, jtj_diag, jnp.asarray(mu), rhs)
            np.testing.assert_allclose(np.asarray(dx_g), np.asarray(dx_c),
                                       rtol=1e-7, atol=1e-9)


def test_grid_lm_with_cg_solver(workload):
    """Device LM with the params-sharded CG solve (the customsolve
    analogue) lands on the same point as the serial Cholesky LM on a
    2x4 ('circuits','params') grid."""
    from pygsti_tpu.parallel.mesh import grid_mesh
    target, ds, circuits = workload
    circuits = circuits[:96]

    serial_model = target.copy()
    obj_s, _ = _objective(serial_model, ds, circuits, None, None)
    grid_model = target.copy()
    obj_g, _ = _objective(grid_model, ds, circuits, grid_mesh(2, 4), 2)

    v = serial_model.to_vector()
    x_s, conv_s, _, _, _, nf_s, _ = obj_s.run_device_lm(v, maxiter=4)
    os.environ['PYGSTI_TPU_LM_SOLVER'] = 'cg'
    try:
        x_g, conv_g, _, _, _, nf_g, _ = obj_g.run_device_lm(v, maxiter=4)
    finally:
        del os.environ['PYGSTI_TPU_LM_SOLVER']
    assert conv_s and conv_g
    np.testing.assert_allclose(nf_g, nf_s, rtol=1e-8)
    np.testing.assert_allclose(x_g, x_s, rtol=1e-6, atol=1e-8)
