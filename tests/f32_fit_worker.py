"""Subprocess worker: run a tiny GST fit with x64 DISABLED (pure-f32
pipeline, the TPU default precision) and print the fit summary as JSON.

Launched by tests/test_precision_parity.py; must set the x64 flag before
jax initializes, which is why this runs in its own process (the test
suite's conftest enables x64 globally).
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "0"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def main():
    maxl = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from pygsti_tpu.modelpacks import smq1Q_XYI as mp
    from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
    from pygsti_tpu.data import simulate_data
    from pygsti_tpu.protocols.protocol import ProtocolData
    from pygsti_tpu.protocols.gst import (GateSetTomographyDesign,
                                          GateSetTomography, GSTInitialModel)

    target = mp.target_model('full TP')
    maxlengths = [L for L in (1, 2, 4, 8, 16) if L <= maxl]
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
    est = results.estimates['GateSetTomography']
    mdl = est.models['final iteration estimate']
    print(json.dumps({
        "nsigma": float(est.misfit_sigma()),
        "dtype_bits": 32 if not jax.config.jax_enable_x64 else 64,
        "num_params": int(mdl.num_params),
    }))


if __name__ == "__main__":
    main()
