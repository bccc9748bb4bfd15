"""Benchmark: full 2Q GST fit (smq2Q_XYICNOT) vs the reference CPU baseline.

Reproduces the reference's performance workload
(test/performance/mpi_2D_scaling/run_me_with_mpirun.py:1-72): smq2Q_XYICNOT
max-length-64 experiment design, datagen = target.depolarize(op_noise=0.01,
spam_noise=0.01), 1000 shots seed 1234, GST seeded at the (full-param)
target with chi2 iterations + final Poisson-picture logL (MINCLIP=1e-4).
Baseline: 3113 s on 1 CPU rank (BASELINE.md, timings.json "1_1").

Prints ONE JSON line:
  {"metric": ..., "value": <wall-clock s>, "unit": "s", "vs_baseline": <speedup>}

Env knobs: BENCH_MAXL (default 64), BENCH_DTYPE (float64|float32, default
float64), BENCH_PARAM (full|full TP, default full).
"""

import json
import os
import sys
import time


def main():
    maxl = int(os.environ.get("BENCH_MAXL", "64"))
    dtype = os.environ.get("BENCH_DTYPE", "float64")
    param = os.environ.get("BENCH_PARAM", "full")

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    # Write EVERY executable to the persistent cache.  The default
    # min-compile-time gate (1s) can skip the big LM graphs when the TPU
    # client defers the heavy compile to first execution (locally measured
    # compile time then under-counts), and those graphs are exactly the ones
    # worth caching: one cold compile of the fused LM chunk costs minutes.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    import numpy as np
    from pygsti_tpu.modelpacks import smq2Q_XYICNOT as mp
    from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
    from pygsti_tpu.data import simulate_data
    from pygsti_tpu.protocols.protocol import ProtocolData
    from pygsti_tpu.protocols.gst import (GateSetTomographyDesign, GateSetTomography,
                                          GSTInitialModel, GSTObjFnBuilders)
    from pygsti_tpu.objectivefns.objectivefns import ObjectiveFunctionBuilder

    print("bench: backend=%s dtype=%s maxL=%d param=%r" %
          (jax.default_backend(), dtype, maxl, param), file=sys.stderr)

    target = mp.target_model(param)
    maxlengths = [L for L in (1, 2, 4, 8, 16, 32, 64) if L <= maxl]
    lists = create_lsgst_circuit_lists(target, mp.prep_fiducials(), mp.meas_fiducials(),
                                       mp.germs(), maxlengths)
    print("bench: %d iterations, final list %d circuits, %d params" %
          (len(lists), len(lists[-1]), target.num_params), file=sys.stderr)

    datagen = mp.target_model('full TP').depolarize(op_noise=0.01, spam_noise=0.01)
    t0 = time.time()
    ds = simulate_data(datagen, list(lists[-1]), 1000, seed=1234)
    print("bench: data simulation %.1fs" % (time.time() - t0), file=sys.stderr)

    MINCLIP = 1e-4
    builders = GSTObjFnBuilders(
        [ObjectiveFunctionBuilder('chi2',
                                  regularization={'min_prob_clip_for_weighting': MINCLIP})],
        [ObjectiveFunctionBuilder('logl',
                                  regularization={'min_prob_clip': MINCLIP,
                                                  'radius': MINCLIP})])

    design = GateSetTomographyDesign(target, lists)
    data = ProtocolData(design, ds)
    gaugeopt = os.environ.get("BENCH_GAUGEOPT", "stdgaugeopt")
    if gaugeopt in ("none", "0"):
        gaugeopt = None
    gst = GateSetTomography(GSTInitialModel(model=target.copy()),
                            gaugeopt_suite=gaugeopt,
                            objfn_builders=builders, verbosity=2)

    t0 = time.time()
    results = gst.run(data)
    wall = time.time() - t0

    est = results.estimates['GateSetTomography']
    nsigma = est.misfit_sigma()
    print("bench: fit wall-clock %.1fs, Nsigma=%.2f" % (wall, nsigma), file=sys.stderr)

    baseline = 3113.0  # reference 1-rank CPU seconds (BASELINE.md)
    scale_note = "" if maxl == 64 else " (maxL=%d, not full workload)" % maxl
    print(json.dumps({
        "metric": "2Q GST fit wall-clock (smq2Q_XYICNOT maxL=64, 1000 shots)%s" % scale_note,
        "value": round(wall, 2),
        "unit": "s",
        "vs_baseline": round(baseline / wall, 2) if maxl == 64 else 0.0,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception:
        # The tunneled-TPU backend occasionally wedges mid-run
        # (FAILED_PRECONDITION on array readback); a fresh process gets a
        # fresh client.  Re-exec once, then give up.
        import traceback
        if os.environ.get("BENCH_RETRIED") == "1":
            raise
        traceback.print_exc()
        print("bench: transient backend failure; re-executing once",
              file=sys.stderr)
        env = dict(os.environ, BENCH_RETRIED="1")
        os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
                  env)
