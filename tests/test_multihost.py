"""Multi-HOST (2-process jax.distributed) smoke test.

The reference tests its MPI path by launching `mpiexec -np 4` as a
subprocess and asserting serial == parallel (test/unit/mpi/test_mpi.py:
15-62, run_me_with_mpiexec.py).  The TPU-native analogue: two OS processes,
each contributing 4 virtual CPU devices, joined by ``jax.distributed`` into
one 8-device mesh; a sharded LM step over that mesh must produce the same
scalar invariants as the same step run single-process.

The worker (tests/multihost_worker.py) uses the same env contract the
launchtools runner artifacts emit (PYGSTI_TPU_NPROC / PYGSTI_TPU_PROCID),
so this also exercises the tools/launchtools.py launch path end to end.

Skipped when process spawning or the jax.distributed service is unavailable.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    env["JAX_NUM_CPU_DEVICES"] = ""     # avoid conflicting overrides
    env.pop("JAX_NUM_CPU_DEVICES")
    return env


def _run_single():
    env = _clean_env()
    env["PYGSTI_TPU_NPROC"] = "1"
    proc = subprocess.run([sys.executable, WORKER], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    return _parse(proc.stdout)


def _parse(stdout):
    for line in stdout.splitlines():
        if line.startswith("MULTIHOST_RESULT "):
            return json.loads(line[len("MULTIHOST_RESULT "):])
    raise AssertionError("no MULTIHOST_RESULT line in worker output:\n" + stdout)


@pytest.mark.slow
def test_two_process_distributed_matches_single():
    port = _free_port()
    coord = "localhost:%d" % port
    procs = []
    for pid in range(2):
        env = _clean_env()
        env.update(PYGSTI_TPU_NPROC="2", PYGSTI_TPU_PROCID=str(pid),
                   PYGSTI_TPU_COORD=coord)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed 2-process run timed out on this host")

    for rc, out, err in outs:
        if rc != 0:
            if ("distributed" in err and "initialize" in err) or \
                    "UNAVAILABLE" in err:
                pytest.skip("jax.distributed unavailable: %s" % err[-500:])
            raise AssertionError("worker failed (rc=%d):\n%s" % (rc, err[-3000:]))

    results = [_parse(out) for _, out, _ in outs]
    assert {r["process_index"] for r in results} == {0, 1}
    for r in results:
        assert r["process_count"] == 2
        assert r["n_devices"] == 8   # 4 local devices per process, global view

    single = _run_single()
    multi = results[0]
    for key in ("norm_f", "jtf_norm", "jtj_trace", "dx_norm"):
        assert abs(multi[key] - single[key]) <= 1e-8 * max(1.0, abs(single[key])), \
            (key, multi[key], single[key])
    # both processes agree with each other exactly (same SPMD program)
    for key in ("norm_f", "jtf_norm", "jtj_trace", "dx_norm"):
        assert abs(results[0][key] - results[1][key]) < 1e-12
