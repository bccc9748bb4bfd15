"""Tests for interpolated gates."""

import numpy as np
import pytest
import scipy.linalg as spl

from pygsti_tpu.extras.interpygate import InterpolatedDenseOp
from pygsti_tpu.tools.optools import unitary_to_pauligate
from pygsti_tpu.tools.internalgates import sigmaX


def _xrot_ptm(theta):
    return np.real(unitary_to_pauligate(spl.expm(-1j * theta / 2 * sigmaX)))


class TestInterpolatedOp:
    def test_interpolation_accuracy(self):
        thetas = np.linspace(0, np.pi, 41)
        samples = np.stack([_xrot_ptm(t) for t in thetas])
        op = InterpolatedDenseOp([thetas], samples, [np.pi / 3])
        exact = _xrot_ptm(np.pi / 3)
        assert np.max(np.abs(op.to_dense() - exact)) < 1e-3

    def test_differentiable(self):
        import jax
        import jax.numpy as jnp
        thetas = np.linspace(0, np.pi, 41)
        samples = np.stack([_xrot_ptm(t) for t in thetas])
        op = InterpolatedDenseOp([thetas], samples, [1.0])
        g = jax.jacfwd(op.to_dense_jax)(jnp.asarray([1.0]))
        # dG/dtheta of an X rotation is nonzero
        assert np.linalg.norm(np.asarray(g)) > 0.1

    def test_in_model_fit(self):
        """An interpolated gate is fittable: recover the rotation angle."""
        from pygsti_tpu.modelpacks import smq1Q_XYI as mp
        from pygsti_tpu.baseobjs.label import Label
        from pygsti_tpu.circuits import Circuit
        from pygsti_tpu.data import simulate_data
        from pygsti_tpu.objectivefns.objectivefns import (
            RawChi2Function, TimeIndependentMDCObjectiveFunction)
        from pygsti_tpu.optimize.simplerlm import SimplerLMOptimizer

        thetas = np.linspace(1.0, 2.2, 61)
        samples = np.stack([_xrot_ptm(t) for t in thetas])
        true_theta = np.pi / 2 + 0.05

        model = mp.target_model('static')
        model.operations[Label('Gxpi2', 0)] = InterpolatedDenseOp(
            [thetas], samples, [1.5])  # seed near pi/2 (local minima elsewhere)

        datagen = mp.target_model('static')
        from pygsti_tpu.modelmembers.operations import StaticArbitraryOp
        datagen.operations[Label('Gxpi2', 0)] = StaticArbitraryOp(_xrot_ptm(true_theta))
        circs = [Circuit([('Gxpi2', 0)] * k, (0,)) for k in (1, 2, 3)]
        ds = simulate_data(datagen, circs, 20000, seed=4)

        obj = TimeIndependentMDCObjectiveFunction(RawChi2Function(), model, ds, circs)
        result = SimplerLMOptimizer().run(obj, printer=0)
        fit_theta = model.to_vector()[0]
        assert np.isclose(fit_theta, true_theta, atol=0.01), fit_theta


class TestProcessTomography:
    def test_recovers_unitary_channel(self):
        import numpy as np
        from pygsti_tpu.extras.interpygate.process_tomography import (
            run_process_tomography)
        from pygsti_tpu.tools.optools import unitary_to_superop
        theta = 0.37
        U = np.array([[np.cos(theta / 2), -1j * np.sin(theta / 2)],
                      [-1j * np.sin(theta / 2), np.cos(theta / 2)]])

        def channel(psi):
            out = U @ psi
            return np.outer(out, out.conj())

        P = run_process_tomography(channel, n_qubits=1, basis='pp')
        assert np.allclose(P, unitary_to_superop(U, 'pp'), atol=1e-10)

    def test_two_qubit_depolarizing(self):
        import numpy as np
        from pygsti_tpu.extras.interpygate.process_tomography import (
            run_process_tomography)
        lam = 0.1

        def channel(psi):
            rho = np.outer(psi, psi.conj())
            d = rho.shape[0]
            return (1 - lam) * rho + lam * np.eye(d) / d

        P = run_process_tomography(channel, n_qubits=2, basis='pp')
        expect = np.diag([1.0] + [1 - lam] * 15)
        assert np.allclose(P, expect, atol=1e-10)
