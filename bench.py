"""Benchmark: full 2Q GST fit (smq2Q_XYICNOT) vs the reference CPU baseline.

Reproduces the reference's performance workload
(test/performance/mpi_2D_scaling/run_me_with_mpirun.py:1-72): smq2Q_XYICNOT
max-length-64 experiment design, datagen = target.depolarize(op_noise=0.01,
spam_noise=0.01), 1000 shots seed 1234, GST seeded at the (full-param)
target with chi2 iterations + final Poisson-picture logL (MINCLIP=1e-4).
Baseline: 3113 s on 1 CPU rank (BASELINE.md, timings.json "1_1").

The fit runs TWICE in one process:
  * run 1 = COLD: every XLA executable is compiled from scratch (the
    persistent compilation cache points at a fresh temp directory, so no
    committed or pre-existing cache entries can be hit);
  * run 2 = WARM: same-process re-run with fresh model/layout objects --
    compiles hit the cache populated by run 1, measuring steady-state speed.

Prints ONE JSON line; `value` is the warm wall-clock, with the cold numbers
as extra keys:
  {"metric": ..., "value": <warm s>, "unit": "s", "vs_baseline": <speedup>,
   "cold_s": ..., "cold_vs_baseline": ...}

Precision: the default pipeline dtype on TPU is float32 end-to-end (TPU has
no native f64; XLA's double-double emulation made the fused-LM executable
~6x slower to compile AND ~7x slower to run).  Validated on this workload:
the f32 fit converges through identical per-stage chi2 values to the same
statistical optimum as f64 (Nsigma 1.61 vs 1.67), and
tests/test_gst_core.py pins f32-vs-f64 fit parity.  BENCH_DTYPE=float64
restores the exact-arithmetic path (measured: cold 330.7s/warm 67.1s vs
f32 cold 37.9s/warm 20.3s on a v5e chip).

Env knobs: BENCH_MAXL (default 64), BENCH_DTYPE (float64|float32, default
float32), BENCH_PARAM (full|full TP, default full), BENCH_CACHE_DIR
(override the fresh temp cache dir -- point it at an existing dir to skip
the cold measurement's "fresh" guarantee), BENCH_SKIP_WARM=1 (one fit only).
"""

import json
import os
import shutil
import sys
import tempfile
import time


BASELINE_S = 3113.0  # reference 1-rank CPU seconds (BASELINE.md)

# bf16 peak of one TPU v5e (v5 lite) chip; override for other hardware.
PEAK_FLOPS = float(os.environ.get("PYGSTI_TPU_PEAK_FLOPS", "197e12"))


def _clear_lm_stats():
    from pygsti_tpu.optimize.device_lm import LM_RUN_STATS
    LM_RUN_STATS.clear()


def _lm_stats_summary(tag):
    """Aggregate device-LM throughput stats (per-stage timings, achieved
    FLOPS, MFU, circuits/sec, Jacobian rows/sec -- the BASELINE.md driver
    metrics) and print them to stderr.  Returns the summary dict."""
    from pygsti_tpu.optimize.device_lm import LM_RUN_STATS
    if not LM_RUN_STATS:
        return {}
    total_iters = sum(s['iters'] for s in LM_RUN_STATS)
    lm_wall = sum(s['wall_s'] for s in LM_RUN_STATS)
    flops = sum(s['iters'] * s['flops_per_iter'] for s in LM_RUN_STATS)
    circs = sum(s['iters'] * s['num_circuits'] for s in LM_RUN_STATS)
    rows = sum(s['iters'] * s['num_elements'] for s in LM_RUN_STATS)
    for i, s in enumerate(LM_RUN_STATS):
        tf = s['iters'] * s['flops_per_iter'] / max(s['wall_s'], 1e-9) / 1e12
        print("bench[%s]: stage %d: B=%d E=%d P=%d iters=%d wall=%.1fs "
              "achieved=%.2f TFLOPS" %
              (tag, i, s['num_circuits'], s['num_elements'],
               s['num_params'], s['iters'], s['wall_s'], tf), file=sys.stderr)
    achieved = flops / max(lm_wall, 1e-9)
    jac_modes = sorted({s.get('jac_mode', '?') for s in LM_RUN_STATS})
    summary = {
        'jac_mode': "+".join(jac_modes),
        'lm_iters': total_iters,
        'lm_wall_s': round(lm_wall, 2),
        'achieved_tflops': round(achieved / 1e12, 3),
        'mfu': round(achieved / PEAK_FLOPS, 4),
        'circuits_per_sec': round(circs / max(lm_wall, 1e-9), 1),
        'jac_rows_per_sec': round(rows / max(lm_wall, 1e-9), 1),
        'lm_iters_per_sec': round(total_iters / max(lm_wall, 1e-9), 3),
    }
    print("bench[%s]: LM total: %d iters in %.1fs (%.2f it/s), "
          "%.2f TFLOPS achieved (MFU %.1f%% of %.0f TFLOPS peak), "
          "%.0f circuits/s, %.0f Jacobian rows/s" %
          (tag, total_iters, lm_wall, summary['lm_iters_per_sec'],
           summary['achieved_tflops'], 100 * summary['mfu'], PEAK_FLOPS / 1e12,
           summary['circuits_per_sec'], summary['jac_rows_per_sec']),
          file=sys.stderr)
    return summary


def run_fit(maxl, param, gaugeopt, verbosity=2):
    """One full GST fit; returns (fit_wall_seconds, nsigma, results)."""
    from pygsti_tpu.modelpacks import smq2Q_XYICNOT as mp
    from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
    from pygsti_tpu.data import simulate_data
    from pygsti_tpu.protocols.protocol import ProtocolData
    from pygsti_tpu.protocols.gst import (GateSetTomographyDesign, GateSetTomography,
                                          GSTInitialModel, GSTObjFnBuilders)
    from pygsti_tpu.objectivefns.objectivefns import ObjectiveFunctionBuilder

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
    gst = GateSetTomography(GSTInitialModel(model=target.copy()),
                            gaugeopt_suite=gaugeopt,
                            objfn_builders=builders, verbosity=verbosity)

    # The fit's VerbosityPrinter writes to stdout; keep stdout reserved for
    # the single JSON summary line the driver parses.
    import contextlib
    t0 = time.time()
    with contextlib.redirect_stdout(sys.stderr):
        results = gst.run(data)
    wall = time.time() - t0

    est = results.estimates['GateSetTomography']
    nsigma = est.misfit_sigma()
    return wall, nsigma, results


def _phase_breakdown(results, fit_wall, lm_wall, tag):
    """Aggregate the GST profiler's named timers into the driver-facing
    phase breakdown (VERDICT r3 weak#2: where do the non-LM seconds go?).
    Phases: objective/layout builds, optimizer (split device-LM vs host
    overhead), gaugeopt+badfit, and unaccounted estimate assembly."""
    est = results.estimates['GateSetTomography']
    timers = est.parameters.get('profiler', {}) or {}
    build_s = sum(v for k, v in timers.items() if 'objective build' in k)
    opt_s = sum(v for k, v in timers.items() if 'optimize' in k
                and 'gauge' not in k)
    gauge_s = sum(v for k, v in timers.items() if 'gauge' in k)
    other_s = max(fit_wall - build_s - opt_s - gauge_s, 0.0)
    phases = {
        'phase_layout_build_s': round(build_s, 2),
        'phase_opt_s': round(opt_s, 2),
        'phase_opt_host_s': round(max(opt_s - lm_wall, 0.0), 2),
        'phase_gaugeopt_badfit_s': round(gauge_s, 2),
        'phase_other_s': round(other_s, 2),
    }
    print("bench[%s]: phases: layout/objective build %.1fs | optimize %.1fs "
          "(device LM %.1fs, host %.1fs) | gaugeopt+badfit %.1fs | "
          "other (estimate assembly etc.) %.1fs" %
          (tag, build_s, opt_s, lm_wall, max(opt_s - lm_wall, 0.0), gauge_s,
           other_s), file=sys.stderr)
    return phases


def run_scale_benches():
    """Beyond-2Q evidence (BASELINE.md derived workloads; VERDICT r4 #3):

    * q3: 3-qubit direct-RB simulation -- sample direct RB circuits on a
      3-qubit line processor, bulk success probabilities of a depolarized
      crosstalk-free model on TPU (reference workload: 3Q Clifford/direct
      RB, BASELINE.json).
    * q5: 5-qubit cloud-noise bulk probs + ModelTest -- d=1024 PTMs, sparse
      observed-outcome elements auto-engaged (>8 outcomes/POVM).

    Returns a dict of extra JSON keys (warm wall + circuits/sec each).
    """
    import time as _time
    import numpy as np
    out = {}

    # ---- 3Q direct-RB simulation ------------------------------------------
    from pygsti_tpu.processors import QubitProcessorSpec
    from pygsti_tpu.models.modelconstruction import create_crosstalk_free_model
    from pygsti_tpu.algorithms.randomcircuit import create_direct_rb_circuit
    pspec3 = QubitProcessorSpec(3, ['Gxpi2', 'Gypi2', 'Gcnot'],
                                geometry='line')
    rng = np.random.RandomState(2026)
    circs3 = []
    for depth in (0, 2, 4, 8, 16, 32):
        for _ in range(10):
            c, _ideal = create_direct_rb_circuit(
                pspec3, length=depth, rand_state=rng)
            circs3.append(c)
    mdl3 = create_crosstalk_free_model(
        pspec3, depolarization_strengths={g: 0.01
                                          for g in pspec3.gate_names})
    layout3 = mdl3.sim.create_layout(circs3)
    t0 = _time.time()
    mdl3.sim.bulk_fill_probs(None, layout3)   # cold (compile included)
    cold3 = _time.time() - t0
    t0 = _time.time()
    mdl3.sim.bulk_fill_probs(None, layout3)   # warm (compiled executable)
    warm3 = _time.time() - t0
    out.update({"q3_rb_circuits": len(circs3),
                "q3_rb_wall_s": round(warm3, 3),
                "q3_rb_cold_s": round(cold3, 2),
                "q3_rb_circuits_per_sec": round(len(circs3) / max(warm3, 1e-9), 1)})
    print("bench[q3]: direct-RB sim %d circuits: cold %.1fs warm %.3fs "
          "(%.0f circuits/s)" % (len(circs3), cold3, warm3,
                                 out["q3_rb_circuits_per_sec"]),
          file=sys.stderr)

    # ---- 5Q cloud-noise probs + ModelTest ----------------------------------
    from pygsti_tpu.models.cloudnoisemodel import \
        create_cloud_crosstalk_model_from_hops_and_weights
    from pygsti_tpu.circuits.circuit import Circuit
    from pygsti_tpu.data import simulate_data
    from pygsti_tpu.protocols.protocol import ProtocolData, ExperimentDesign
    from pygsti_tpu.protocols.modeltest import ModelTest
    pspec5 = QubitProcessorSpec(5, ['Gxpi2', 'Gypi2', 'Gcnot'],
                                geometry='line')
    mdl5 = create_cloud_crosstalk_model_from_hops_and_weights(
        pspec5, maxhops=1, max_idle_weight=1, extra_gate_weight=0,
        gate_type='H+s')
    v = np.zeros(mdl5.num_params)
    v[:8] = 0.005
    mdl5.from_vector(v)
    gates1q = ['Gxpi2', 'Gypi2']
    circs5 = []
    for i in range(40):
        layers = []
        for t in range(6):
            q = rng.randint(5)
            layers.append("%s:%d" % (gates1q[rng.randint(2)], q))
            if t % 2 == 1:
                c0 = rng.randint(4)
                layers.append("Gcnot:%d:%d" % (c0, c0 + 1))
        circs5.append(Circuit(''.join(layers) + '@(0,1,2,3,4)'))
    layout5d = mdl5.sim.create_layout(circs5)
    t0 = _time.time()
    mdl5.sim.bulk_fill_probs(None, layout5d)  # cold (compile included)
    cold5 = _time.time() - t0
    t0 = _time.time()
    mdl5.sim.bulk_fill_probs(None, layout5d)  # warm (compiled executable)
    warm5 = _time.time() - t0
    # record_zero_counts=False: the dataset's recorded outcomes define the
    # chi2 degrees of freedom, which must match the sparse observed-outcome
    # elements the objective evaluates (recording 32-outcome zero rows
    # inflates dof and drives Nsigma strongly negative)
    ds5 = simulate_data(mdl5, circs5, 500, seed=77,
                        record_zero_counts=False)
    t0 = _time.time()
    data5 = ProtocolData(ExperimentDesign(circs5), ds5)
    res5 = ModelTest(mdl5, verbosity=0).run(data5)
    mt_wall = _time.time() - t0
    nsig5 = float(res5.estimates['ModelTest'].misfit_sigma())
    layout5 = mdl5.sim.create_layout(circs5, ds5)
    out.update({"q5_circuits": len(circs5),
                "q5_probs_wall_s": round(warm5, 3),
                "q5_probs_cold_s": round(cold5, 2),
                "q5_probs_circuits_per_sec": round(len(circs5) / max(warm5, 1e-9), 1),
                "q5_modeltest_wall_s": round(mt_wall, 2),
                "q5_modeltest_nsigma": round(nsig5, 2),
                "q5_sparse_elements": int(layout5.num_elements),
                "q5_dense_elements": len(circs5) * 32})
    print("bench[q5]: cloud-noise bulk probs %d circuits (d=1024): cold "
          "%.1fs warm %.3fs (%.0f circuits/s); ModelTest %.1fs Nsigma=%.2f; "
          "sparse elements %d / dense %d" %
          (len(circs5), cold5, warm5, out["q5_probs_circuits_per_sec"],
           mt_wall, nsig5, layout5.num_elements, len(circs5) * 32),
          file=sys.stderr)

    # ---- 10Q errorgen-propagation stretch ---------------------------------
    # BASELINE.md derived workload "10-qubit term/errorgen stretch": the
    # scalable noisy-Clifford path (reference: errorgenpropagation/
    # errorpropagator.py:48 + tools/errgenproptools.py -- dense would be
    # 16^10).  Propagate per-gate H/S error generators through a 10-qubit
    # random Clifford circuit (host bitmask Pauli algebra, matching the
    # reference's stim-frame architecture), then BCH-order-2-combine the
    # accumulated generator halves (the analytic commutator engine behind
    # the reference's "20-1000x" sensitivity speedup claim, CHANGELOG #687).
    from pygsti_tpu.errorgenpropagation import ErrorGeneratorPropagator
    from pygsti_tpu.tools.errgenproptools import bch_approximation
    n10 = 10
    gate_errs = {'Gxpi2': {('H', 'Z'): 0.001, ('S', 'X'): 0.0005},
                 'Gypi2': {('H', 'X'): 0.001, ('S', 'Y'): 0.0005},
                 'Gcnot': {('S', 'ZZ'): 0.002, ('H', 'XX'): 0.001}}
    prop10 = ErrorGeneratorPropagator.from_errorgen_dict(
        gate_errs, n10, tuple(range(n10)))
    rng10 = np.random.RandomState(7)
    gates10 = []
    for dpt in range(40):
        if dpt % 2 == 0:
            for q in range(n10):
                gates10.append((['Gxpi2', 'Gypi2'][rng10.randint(2)], q))
        else:
            for q in range(rng10.randint(2), n10 - 1, 2):
                gates10.append(('Gcnot', q, q + 1))
    c10 = Circuit(gates10, tuple(range(n10)))
    t0 = _time.time()
    errs10 = prop10.propagate_errorgens(c10)
    prop_wall = _time.time() - t0
    items10 = list(errs10.items())
    half10 = len(items10) // 2
    t0 = _time.time()
    bch10 = bch_approximation(dict(items10[:half10]), dict(items10[half10:]),
                              n10, bch_order=2)
    bch_wall = _time.time() - t0
    out.update({"q10_errgen_gates": len(gates10),
                "q10_errgen_prop_wall_s": round(prop_wall, 3),
                "q10_errgen_generators": len(errs10),
                "q10_errgen_gates_per_sec": round(len(gates10) / max(prop_wall, 1e-9), 1),
                "q10_bch2_wall_s": round(bch_wall, 3),
                "q10_bch2_terms": len(bch10)})
    print("bench[q10]: errorgen propagation through %d-gate 10Q Clifford "
          "circuit: %.3fs (%.0f gates/s, %d generators); BCH-order-2 "
          "combine %.2fs (%d terms)" %
          (len(gates10), prop_wall, out["q10_errgen_gates_per_sec"],
           len(errs10), bch_wall, len(bch10)), file=sys.stderr)
    return out


_F64_PARITY_SCRIPT = r'''
import json, os, sys, types
sys.path.insert(0, "/root/repo")
import numpy as np
# ours: TPU backend (inherited env), x64 enabled, f64 probs end-to-end
import jax
assert jax.config.read("jax_enable_x64")
from pygsti_tpu.modelpacks import smq2Q_XYICNOT as mp
from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
target = mp.target_model("full TP")
lists = create_lsgst_circuit_lists(target, mp.prep_fiducials(),
                                   mp.meas_fiducials(), mp.germs(), [1, 2, 4])
circuits = list(lists[-1])[::6]
model = mp.target_model("full TP").depolarize(op_noise=0.013,
                                              spam_noise=0.009)
backend = jax.default_backend()
layout = model.sim.create_layout(circuits)
p_tpu = np.asarray(model.sim.bulk_fill_probs(None, layout), np.float64)

# reference oracle (CPU, numpy evotypes)
sys.path.insert(0, "/root/reference")
if "pygsti._version" not in sys.modules:
    vm = types.ModuleType("pygsti._version")
    vm.version = "0.0.0"; vm.version_tuple = (0, 0, 0)
    sys.modules["pygsti._version"] = vm
os.environ.setdefault("PYGSTI_NO_CYTHON_WARNING", "1")
import warnings
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    import pygsti
    from pygsti.modelpacks import smq2Q_XYICNOT as rmp
rmodel = rmp.target_model("full TP").depolarize(op_noise=0.013,
                                                spam_noise=0.009)
rcircuits = [pygsti.circuits.Circuit(c.str) for c in circuits]
rprobs = rmodel.sim.bulk_probs(rcircuits)
max_dp = 0.0
for c, rc in zip(circuits, rcircuits):
    sl = layout.element_slices[layout.circuits.index(c)]
    for k, outcome in enumerate(layout.outcomes[layout.circuits.index(c)]):
        dp = abs(p_tpu[sl.start + k] - rprobs[rc][outcome])
        max_dp = max(max_dp, dp)
print(json.dumps({"f64_backend": backend, "f64_circuits": len(circuits),
                  "f64_max_dp_vs_reference": max_dp}))
'''


def run_f64_parity():
    """On-TPU f64 probability contract (VERDICT r4 #5, BASELINE.md north
    star): bulk probs computed with PYGSTI_TPU_PROBS_DTYPE=float64 and
    x64 enabled ON THE REAL CHIP (XLA f64 emulation), compared against the
    reference oracle's f64 CPU probabilities.  Runs in a subprocess because
    x64 must be set before JAX initializes.  Returns JSON keys for the
    driver; the 1e-10 bar is asserted into `f64_contract_met`."""
    import subprocess
    env = dict(os.environ, JAX_ENABLE_X64="1",
               PYGSTI_TPU_PROBS_DTYPE="float64")
    env.pop("BENCH_PLATFORM", None)
    # The tunneled axon TPU client occasionally wedges at init (first
    # client after an idle period blocks on a futex); a FRESH process
    # reliably recovers, so retry once on timeout.
    line = "{}"
    for attempt in range(2):
        try:
            res = subprocess.run([sys.executable, "-c", _F64_PARITY_SCRIPT],
                                 env=env, capture_output=True, text=True,
                                 stdin=subprocess.DEVNULL, timeout=420)
        except subprocess.TimeoutExpired:
            print("bench: f64 parity subprocess timed out (attempt %d)"
                  % (attempt + 1), file=sys.stderr)
            continue
        if res.stdout.strip():
            line = res.stdout.strip().splitlines()[-1]
            break
        print("bench: f64 parity subprocess produced no output (rc=%s)"
              % res.returncode, file=sys.stderr)
    out = json.loads(line)
    out["f64_contract_met"] = bool(
        out.get("f64_max_dp_vs_reference", 1.0) < 1e-10)
    print("bench[f64]: backend=%s circuits=%d max|dp| vs reference = %.3e "
          "(contract <1e-10: %s)" %
          (out.get("f64_backend"), out.get("f64_circuits", 0),
           out.get("f64_max_dp_vs_reference", float("nan")),
           out["f64_contract_met"]), file=sys.stderr)
    return out


def main():
    maxl = int(os.environ.get("BENCH_MAXL", "64"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    param = os.environ.get("BENCH_PARAM", "full")

    # f64-on-TPU parity runs FIRST, before this process initializes the TPU
    # client: the tunneled axon runtime serializes clients, so a subprocess
    # grabbing the chip while the parent holds it deadlocks both.
    f64_stats = {}
    if os.environ.get("BENCH_SCALE", "1") != "0" \
            and not os.environ.get("BENCH_PLATFORM"):
        try:
            f64_stats = run_f64_parity()
        except Exception:
            import traceback
            traceback.print_exc()
            print("bench: f64 parity check failed; continuing",
                  file=sys.stderr)

    import jax
    if os.environ.get("BENCH_PLATFORM"):  # e.g. "cpu" for a smoke run
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    # A FRESH persistent-cache dir: run 1 is guaranteed cold (no committed
    # or stale entries), run 2 hits the entries run 1 wrote.  Override with
    # BENCH_CACHE_DIR to reuse a warm cache across processes.
    cache_dir = os.environ.get("BENCH_CACHE_DIR")
    cleanup_cache = False
    if not cache_dir:
        cache_dir = tempfile.mkdtemp(prefix="pygsti_tpu_benchcache_")
        cleanup_cache = True
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Write EVERY executable to the cache: the default min-compile-time gate
    # (1s) can skip the big LM graphs when the TPU client defers the heavy
    # compile to first execution.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    print("bench: backend=%s dtype=%s maxL=%d param=%r cache=%s" %
          (jax.default_backend(), dtype, maxl, param, cache_dir), file=sys.stderr)

    gaugeopt = os.environ.get("BENCH_GAUGEOPT", "stdgaugeopt")
    if gaugeopt in ("none", "0"):
        gaugeopt = None

    t_all = time.time()
    _clear_lm_stats()
    cold_wall, cold_nsigma, cold_results = run_fit(maxl, param, gaugeopt)
    cold_stats = _lm_stats_summary("cold")
    cold_stats.update(_phase_breakdown(cold_results, cold_wall,
                                       cold_stats.get('lm_wall_s', 0.0),
                                       "cold"))
    print("bench: COLD fit wall-clock %.1fs, Nsigma=%.2f" %
          (cold_wall, cold_nsigma), file=sys.stderr)

    if os.environ.get("BENCH_SKIP_WARM") == "1":
        warm_wall, warm_nsigma = cold_wall, cold_nsigma
        warm_stats = cold_stats
    else:
        _clear_lm_stats()
        warm_wall, warm_nsigma, warm_results = run_fit(maxl, param, gaugeopt)
        warm_stats = _lm_stats_summary("warm")
        warm_stats.update(_phase_breakdown(warm_results, warm_wall,
                                           warm_stats.get('lm_wall_s', 0.0),
                                           "warm"))
        print("bench: WARM fit wall-clock %.1fs, Nsigma=%.2f (total %.1fs)" %
              (warm_wall, warm_nsigma, time.time() - t_all), file=sys.stderr)

    scale_stats = {}
    if os.environ.get("BENCH_SCALE", "1") != "0":
        try:
            scale_stats = run_scale_benches()
        except Exception:
            import traceback
            traceback.print_exc()
            print("bench: 3Q/5Q scale benches failed; continuing",
                  file=sys.stderr)
        scale_stats.update(f64_stats)

    if cleanup_cache:
        shutil.rmtree(cache_dir, ignore_errors=True)

    full = (maxl == 64)
    scale_note = "" if full else " (maxL=%d, not full workload)" % maxl
    out = {
        "metric": "2Q GST fit wall-clock (smq2Q_XYICNOT maxL=64, 1000 shots)%s" % scale_note,
        "value": round(warm_wall, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / warm_wall, 2) if full else 0.0,
        "cold_s": round(cold_wall, 2),
        "cold_vs_baseline": round(BASELINE_S / cold_wall, 2) if full else 0.0,
        "nsigma": round(float(warm_nsigma), 2),
    }
    out.update(warm_stats)
    out.update(scale_stats)
    print(json.dumps(out))


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
