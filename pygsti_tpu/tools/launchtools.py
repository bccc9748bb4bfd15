"""Multi-host launcher artifact generation: the TPU-native analogue of the
reference's MPI/SLURM runner generation (reference: pygsti/tools/mpitools.py:
resolve_mpiexec:1097, write_mpi_runner_artifacts:1198, build_slurm_script:1291;
pygsti/protocols/protocol.py:202 run_mpi, :395 stage_slurm).

Instead of mpiexec + mpi4py, multi-host TPU jobs initialize
``jax.distributed`` and shard work over the global device mesh; these
helpers emit the runner script and (optionally) a SLURM batch script for a
TPU pod slice.
"""

from __future__ import annotations

import os
import stat
import textwrap


def write_tpu_runner_artifacts(workdir, protocol_pkl='protocol.json',
                               data_dir='data', results_dir='results',
                               num_processes=1, coordinator_address=None):
    """Write `run.py`, the distributed runner entry point, into `workdir`
    (reference: mpitools.write_mpi_runner_artifacts:1198).

    The generated script initializes jax.distributed (when
    `coordinator_address` is given or discovered from TPU metadata), loads
    the staged protocol + data, runs it, and writes results from process 0.
    """
    os.makedirs(workdir, exist_ok=True)
    runner = textwrap.dedent('''\
        #!/usr/bin/env python
        """Auto-generated TPU runner (pygsti_tpu.tools.launchtools)."""
        import os, sys

        import jax

        COORD = %(coord)r
        if COORD or int(os.environ.get("PYGSTI_TPU_NPROC", "1")) > 1:
            jax.distributed.initialize(
                coordinator_address=COORD,
                num_processes=int(os.environ.get("PYGSTI_TPU_NPROC", "1")),
                process_id=int(os.environ.get("PYGSTI_TPU_PROCID", "0")))

        from pygsti_tpu.protocols.protocol import ProtocolData
        from pygsti_tpu.baseobjs.nicelyserializable import NicelySerializable
        import json

        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, %(protocol)r)) as f:
            protocol = NicelySerializable.from_nice_serialization(json.load(f))
        data = ProtocolData.from_dir(os.path.join(here, %(data)r))
        results = protocol.run(data)
        if jax.process_index() == 0:
            os.makedirs(os.path.join(here, %(results)r), exist_ok=True)
            results.write(os.path.join(here, %(results)r))
        ''') % {'coord': coordinator_address, 'protocol': protocol_pkl,
                'data': data_dir, 'results': results_dir}
    path = os.path.join(workdir, 'run.py')
    with open(path, 'w') as f:
        f.write(runner)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    return path


def build_slurm_script(workdir, job_name='pygsti_tpu', partition=None,
                       nodes=1, time_limit='04:00:00', tpu_type=None,
                       extra_sbatch_lines=(), python='python'):
    """SLURM sbatch script launching the generated runner on each node
    (reference: mpitools.build_slurm_script:1291; protocol.stage_slurm:395)."""
    lines = ['#!/bin/bash',
             '#SBATCH --job-name=%s' % job_name,
             '#SBATCH --nodes=%d' % nodes,
             '#SBATCH --time=%s' % time_limit]
    if partition:
        lines.append('#SBATCH --partition=%s' % partition)
    if tpu_type:
        lines.append('#SBATCH --gres=tpu:%s' % tpu_type)
    lines.extend(extra_sbatch_lines)
    lines.extend([
        '',
        'export PYGSTI_TPU_NPROC=$SLURM_NNODES',
        'export PYGSTI_TPU_PROCID=$SLURM_PROCID',
        'srun %s %s' % (python, os.path.join(workdir, 'run.py')),
    ])
    path = os.path.join(workdir, 'submit.sh')
    with open(path, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    return path


def stage_protocol_run(protocol, data, workdir, slurm=False, **slurm_kwargs):
    """Stage a protocol + data + runner (and optional SLURM script) into
    `workdir` for offline/batch execution (reference: protocol.py:202/395)."""
    import json
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, 'protocol.json'), 'w') as f:
        json.dump(protocol.to_nice_serialization(), f, indent=2)
    data.write(os.path.join(workdir, 'data'))
    runner = write_tpu_runner_artifacts(workdir, data_dir='data')
    out = {'runner': runner}
    if slurm:
        out['slurm_script'] = build_slurm_script(workdir, **slurm_kwargs)
    return out
