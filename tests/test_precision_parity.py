"""f32-vs-f64 fit parity: the TPU-default pure-float32 pipeline must reach
the same statistical optimum as the exact-f64 path.

On TPU the whole GST pipeline runs in float32 by default (no native f64 on
the MXU; XLA's double-double emulation is ~6x slower to compile and ~7x
slower to run).  This is only sound if the f32 fit converges to the same
optimum -- this test pins that contract on a small 1Q workload: an
x64-disabled subprocess fit (tests/f32_fit_worker.py) must produce a
model-vs-data misfit Nsigma within statistical slop of the in-process f64
fit.  (Measured on the full 2Q TPU bench: f32 Nsigma 1.61 vs f64 1.67,
with identical per-stage chi2 optima.)
"""

import json
import os
import subprocess
import sys

import pytest


MAXL = 8


def _f64_fit_nsigma():
    from pygsti_tpu.modelpacks import smq1Q_XYI as mp
    from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
    from pygsti_tpu.data import simulate_data
    from pygsti_tpu.protocols.protocol import ProtocolData
    from pygsti_tpu.protocols.gst import (GateSetTomographyDesign,
                                          GateSetTomography, GSTInitialModel)

    target = mp.target_model('full TP')
    maxlengths = [L for L in (1, 2, 4, 8, 16) if L <= MAXL]
    lists = create_lsgst_circuit_lists(target, mp.prep_fiducials(),
                                       mp.meas_fiducials(), mp.germs(),
                                       maxlengths)
    datagen = mp.target_model('full TP').depolarize(op_noise=0.02,
                                                    spam_noise=0.01)
    ds = simulate_data(datagen, list(lists[-1]), 1000, seed=2026)
    design = GateSetTomographyDesign(target, lists)
    data = ProtocolData(design, ds)
    gst = GateSetTomography(GSTInitialModel(model=target.copy()),
                            gaugeopt_suite=None, verbosity=0)
    results = gst.run(data)
    return float(results.estimates['GateSetTomography'].misfit_sigma())


@pytest.mark.slow
def test_f32_fit_matches_f64():
    worker = os.path.join(os.path.dirname(__file__), "f32_fit_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_ENABLE_X64="0")
    proc = subprocess.run([sys.executable, worker, str(MAXL)],
                          capture_output=True, text=True, env=env,
                          timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["dtype_bits"] == 32

    nsigma64 = _f64_fit_nsigma()
    nsigma32 = out["nsigma"]
    # both fits must sit at the statistical optimum; Nsigma ~ N(0,1)-scale
    # fluctuations around it, so parity within 1.0 sigma-units is tight
    assert abs(nsigma32 - nsigma64) < 1.0, (nsigma32, nsigma64)
    assert nsigma32 < 3.0, nsigma32
