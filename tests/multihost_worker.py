"""Worker for the 2-process jax.distributed smoke test (run via subprocess
from tests/test_multihost.py; env contract matches the launchtools runner
artifacts: PYGSTI_TPU_NPROC / PYGSTI_TPU_PROCID / PYGSTI_TPU_COORD).

Each process contributes 4 virtual CPU devices to an 8-device global mesh,
computes one sharded LM step (probs -> lsvec -> JTJ/JTf -> damped solve) on
the shared 1Q workload, and prints scalar invariants as one JSON line.  The
parent compares them against the single-process result (reference contract:
test/unit/mpi/test_mpi.py:15-62 serial == parallel equality).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

nproc = int(os.environ.get("PYGSTI_TPU_NPROC", "1"))
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=os.environ["PYGSTI_TPU_COORD"],
        num_processes=nproc,
        process_id=int(os.environ["PYGSTI_TPU_PROCID"]),
    )

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ['PYGSTI_TPU_J_DTYPE'] = 'float64'

from pygsti_tpu.modelpacks import smq1Q_XYI as mp
from pygsti_tpu.circuits.gstcircuits import create_lsgst_circuit_lists
from pygsti_tpu.data import simulate_data
from pygsti_tpu.layouts.layout import CircuitOutcomeProbabilityLayout
from pygsti_tpu.parallel.mesh import circuit_mesh, shard_circuits, replicated
from pygsti_tpu.objectivefns.objectivefns import RawPoissonPicDeltaLogLFunction


def main():
    n_dev = len(jax.devices())          # global device count
    target = mp.target_model('full TP')
    lists = create_lsgst_circuit_lists(target, mp.prep_fiducials(),
                                       mp.meas_fiducials(), mp.germs(), [1, 2])
    circuits = list(lists[-1])[:96]
    datagen = target.depolarize(op_noise=0.02, spam_noise=0.01)
    ds = simulate_data(datagen, circuits, 1000, seed=7)

    mesh = circuit_mesh(n_dev) if n_dev > 1 else None
    layout = CircuitOutcomeProbabilityLayout(circuits, target, ds,
                                             pad_to_multiple=n_dev or None)
    target.sim.mesh = mesh
    raw = RawPoissonPicDeltaLogLFunction()
    probs_fn = target.sim.probs_fn(layout)

    # per-element count vectors aligned with the (padded) layout
    n_el = layout.num_elements
    counts = np.zeros(n_el)
    totals = np.zeros(n_el)
    for i, c in enumerate(layout.circuits):
        row = ds[c]
        sl = layout.element_slices[i]
        for k, outcome in enumerate(layout.outcomes[i]):
            counts[sl.start + k] = row.counts.get(outcome, 0)
            totals[sl.start + k] = row.total
    freqs = np.where(totals > 0, counts / np.where(totals > 0, totals, 1.0), 0)

    if mesh is not None:
        counts = shard_circuits(mesh, jnp.asarray(counts))
        totals = shard_circuits(mesh, jnp.asarray(totals))
        freqs = shard_circuits(mesh, jnp.asarray(freqs))
        v0 = replicated(mesh, jnp.asarray(target.to_vector()))
    else:
        counts, totals, freqs = map(jnp.asarray, (counts, totals, freqs))
        v0 = jnp.asarray(target.to_vector())

    @jax.jit
    def lm_step(v, counts, totals, freqs):
        p = probs_fn(v)
        ls = raw.lsvec(p, counts, totals, freqs)
        dls = raw.dlsvec(p, counts, totals, freqs)
        J = dls[:, None] * jax.jacfwd(probs_fn)(v)
        jtj = J.T @ J
        jtf = J.T @ ls
        damp = 1e-3 * jnp.max(jnp.diag(jtj))
        dx = jax.scipy.linalg.solve(
            jtj + damp * jnp.eye(jtj.shape[0], dtype=jtj.dtype), -jtf,
            assume_a='pos')
        return (jnp.sum(ls * ls), jnp.linalg.norm(jtf), jnp.trace(jtj),
                jnp.linalg.norm(dx))

    norm_f, jtf_n, jtj_tr, dx_n = [float(x)
                                   for x in lm_step(v0, counts, totals, freqs)]
    out = {"process_index": jax.process_index(),
           "process_count": jax.process_count(),
           "n_devices": n_dev,
           "norm_f": norm_f, "jtf_norm": jtf_n,
           "jtj_trace": jtj_tr, "dx_norm": dx_n}
    print("MULTIHOST_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
