"""Work-distribution utilities (reference: pygsti/tools/mpitools.py,
1398 LoC).

The TPU framework's on-device parallelism is jax.sharding over a device
Mesh, not MPI; these helpers exist for the reference's HOST-side work
distribution surface.  Every function has exact serial semantics with
``comm=None`` (the common case here), passes through to an mpi4py-style
communicator when one is supplied, and accepts ResourceAllocation wrappers.
"""

from __future__ import annotations

import numpy as np


def _unwrap_comm(comm):
    """(comm, ralloc): unwrap a ResourceAllocation to its raw communicator."""
    from pygsti_tpu.baseobjs.resourceallocation import ResourceAllocation
    if isinstance(comm, ResourceAllocation):
        return comm.comm, comm
    return comm, None


def _size_rank(comm):
    if comm is None:
        return 1, 0
    return comm.Get_size(), comm.Get_rank()


def mpi4py_comm():
    """mpi4py's COMM_WORLD, or None when mpi4py is unavailable (reference:
    mpitools.mpi4py_comm:972)."""
    try:
        from mpi4py import MPI
        return MPI.COMM_WORLD
    except ImportError:
        return None


def distribute_indices_base(indices, nprocs, rank, allow_split_comm=True):
    """Partition `indices` evenly among `nprocs` abstract processors;
    returns (loc_indices, owners, peer_ranks) for the given `rank`
    (reference: mpitools.distribute_indices_base:109).  With more
    processors than indices and `allow_split_comm`, several processors
    share the same single index (the first of each group "owns" it)."""
    n = len(indices)
    if n == 0:
        return [], {}, ()
    if nprocs >= n:
        if allow_split_comm:
            nloc = nprocs // n           # procs per index (base)
            extra = nprocs - nloc * n    # first `extra` indices get nloc+1
            if rank < extra * (nloc + 1):
                k = rank // (nloc + 1)
                loc_indices = [indices[k]]
                peer_ranks = tuple(range(k * (nloc + 1),
                                         (k + 1) * (nloc + 1)))
            else:
                k = (rank - extra * (nloc + 1)) // nloc
                loc_indices = [indices[extra + k]]
                base = extra * (nloc + 1)
                peer_ranks = tuple(range(base + k * nloc,
                                         base + (k + 1) * nloc))
            owners = {indices[i]: i * (nloc + 1) for i in range(extra)}
            owners.update({indices[i]: extra * (nloc + 1)
                           + (i - extra) * nloc for i in range(extra, n)})
        else:
            loc_indices = [indices[rank]] if rank < n else []
            owners = {indices[i]: i for i in range(n)}
            peer_ranks = ()
    else:
        nloc = n // nprocs
        extra = n - nloc * nprocs
        if rank < extra:
            count, start = nloc + 1, rank * (nloc + 1)
        else:
            count, start = nloc, extra * (nloc + 1) + (rank - extra) * nloc
        loc_indices = list(indices[start:start + count])
        owners = {}
        for r in range(nprocs):
            if r < extra:
                c, s = nloc + 1, r * (nloc + 1)
            else:
                c, s = nloc, extra * (nloc + 1) + (r - extra) * nloc
            for i in range(s, s + c):
                owners[indices[i]] = r
        peer_ranks = ()
    return loc_indices, owners, peer_ranks


def distribute_indices(indices, comm, allow_split_comm=True):
    """Partition `indices` among `comm`'s processors; returns
    (loc_indices, owners, loc_comm) (reference:
    mpitools.distribute_indices:27).  Serial (comm=None): everything is
    local and loc_comm is None."""
    comm, ralloc = _unwrap_comm(comm)
    nprocs, rank = _size_rank(comm)
    loc_indices, owners, peer_ranks = distribute_indices_base(
        indices, nprocs, rank, allow_split_comm)
    loc_comm = None
    if comm is not None and nprocs > len(indices) and len(indices) > 0 \
       and allow_split_comm and peer_ranks:
        color = peer_ranks[0]
        loc_comm = comm.Split(color=color, key=rank)
    return loc_indices, owners, loc_comm


def slice_up_range(n, num_slices, start=0):
    """Divide range(start, start+n) into `num_slices` contiguous slices,
    larger ones first (reference: mpitools.slice_up_range:240)."""
    base = n // num_slices
    m1 = n - base * num_slices
    out, off = [], start
    for _ in range(m1):
        out.append(slice(off, off + base + 1))
        off += base + 1
    for _ in range(num_slices - m1):
        out.append(slice(off, off + base))
        off += base
    return out


def slice_up_slice(slc, num_slices):
    """Divide slice `slc` (step 1) into `num_slices` contiguous sub-slices
    (reference: mpitools.slice_up_slice:217)."""
    assert slc.step is None or slc.step == 1
    start = 0 if slc.start is None else slc.start
    return slice_up_range(slc.stop - start, num_slices, start)


def distribute_slice(s, comm, allow_split_comm=True):
    """Partition the contiguous slice `s` among `comm`'s processors;
    returns (slices, loc_slice, owners, loc_comm) (reference:
    mpitools.distribute_slice:273)."""
    comm, ralloc = _unwrap_comm(comm)
    nprocs, rank = _size_rank(comm)
    start = 0 if s.start is None else s.start
    n = s.stop - start
    num_slices = min(nprocs, n) if n > 0 else 1
    slices = slice_up_range(n, num_slices, start)
    loc_indices, owners_by_idx, peer_ranks = distribute_indices_base(
        list(range(num_slices)), nprocs, rank, allow_split_comm)
    loc_slice = slices[loc_indices[0]] if loc_indices else slice(0, 0)
    owners = {i: owners_by_idx[i] for i in range(num_slices)}
    loc_comm = None
    if comm is not None and nprocs > num_slices and allow_split_comm \
       and peer_ranks:
        loc_comm = comm.Split(color=peer_ranks[0], key=rank)
    return slices, loc_slice, owners, loc_comm


def gather_slices(slices, slice_owners, ar_to_fill, ar_to_fill_inds,
                  axes, comm, max_buffer_size=None):
    """Gather the slices of `ar_to_fill` owned by different ranks so every
    processor holds the full array (reference: mpitools.gather_slices:363).
    Serial: all data is already in place -- a no-op."""
    comm, _ = _unwrap_comm(comm)
    if comm is None or comm.Get_size() == 1:
        return
    axes = (axes,) if isinstance(axes, int) else tuple(axes)
    rank = comm.Get_rank()
    for i, slc_or_tup in enumerate(slices):
        slcs = (slc_or_tup,) if isinstance(slc_or_tup, slice) else slc_or_tup
        owner = slice_owners[i]
        index = [slice(None)] * ar_to_fill.ndim
        for axis, slc in zip(axes, slcs):
            index[axis] = slc
        buf = np.ascontiguousarray(ar_to_fill[tuple(index)]) \
            if rank == owner else None
        buf = comm.bcast(buf, root=owner)
        if rank != owner:
            ar_to_fill[tuple(index)] = buf


def gather_slices_by_owner(current_slices, ar_to_fill, ar_to_fill_inds,
                           axes, comm, max_buffer_size=None):
    """Variant of :func:`gather_slices` where each processor enumerates the
    slices IT owns (reference: mpitools.gather_slices_by_owner:532)."""
    comm, _ = _unwrap_comm(comm)
    if comm is None or comm.Get_size() == 1:
        return
    axes = (axes,) if isinstance(axes, int) else tuple(axes)
    my_payload = []
    for slc_or_tup in current_slices:
        slcs = (slc_or_tup,) if isinstance(slc_or_tup, slice) else slc_or_tup
        index = [slice(None)] * ar_to_fill.ndim
        for axis, slc in zip(axes, slcs):
            index[axis] = slc
        my_payload.append((slcs, np.ascontiguousarray(
            ar_to_fill[tuple(index)])))
    for payload in comm.allgather(my_payload):
        for slcs, data in payload:
            index = [slice(None)] * ar_to_fill.ndim
            for axis, slc in zip(axes, slcs):
                index[axis] = slc
            ar_to_fill[tuple(index)] = data


def gather_indices(indices, index_owners, ar_to_fill, ar_to_fill_inds,
                   axes, comm, max_buffer_size=None):
    """Gather per-index (fancy-indexed) pieces of `ar_to_fill` from their
    owning ranks (reference: mpitools.gather_indices:643)."""
    comm, _ = _unwrap_comm(comm)
    if comm is None or comm.Get_size() == 1:
        return
    axes = (axes,) if isinstance(axes, int) else tuple(axes)
    rank = comm.Get_rank()
    for i, ind_or_tup in enumerate(indices):
        inds = (ind_or_tup,) if not isinstance(ind_or_tup, tuple) \
            else ind_or_tup
        owner = index_owners[i]
        index = [slice(None)] * ar_to_fill.ndim
        for axis, ind in zip(axes, inds):
            index[axis] = ind
        buf = np.ascontiguousarray(ar_to_fill[tuple(index)]) \
            if rank == owner else None
        buf = comm.bcast(buf, root=owner)
        if rank != owner:
            ar_to_fill[tuple(index)] = buf


def distribute_for_dot(a_shape, b_shape, comm):
    """Row/column slices assigning result[row, col] blocks of a distributed
    A @ B to each processor; returns (row_slice, col_slice,
    slice_tuples_by_rank) (reference: mpitools.distribute_for_dot:783)."""
    comm, _ = _unwrap_comm(comm)
    nprocs, rank = _size_rank(comm)
    if nprocs == 1:
        loc = (slice(0, a_shape[0]), slice(0, b_shape[1]))
        return loc[0], loc[1], [loc]
    # split the larger output dimension first, then the other
    nrows, ncols = a_shape[0], b_shape[1]
    ngroups_c = min(nprocs, ncols) if ncols >= nrows else \
        max(1, nprocs // max(1, min(nprocs, nrows)))
    ngroups_r = max(1, nprocs // ngroups_c)
    row_slices = slice_up_range(nrows, ngroups_r)
    col_slices = slice_up_range(ncols, ngroups_c)
    slice_tuples = []
    for r in range(nprocs):
        slice_tuples.append((row_slices[(r // ngroups_c) % ngroups_r],
                             col_slices[r % ngroups_c]))
    my_row, my_col = slice_tuples[rank]
    return my_row, my_col, slice_tuples


def mpidot(a, b, loc_row_slice, loc_col_slice, slice_tuples_by_rank, comm,
           out=None, out_shm=None):
    """Distributed matrix product: each rank computes its
    result[row_slice, col_slice] block, then blocks are gathered
    (reference: mpitools.mpidot:847).  Serial: plain `a @ b`."""
    comm, _ = _unwrap_comm(comm)
    if comm is None or comm.Get_size() == 1:
        result = np.dot(a, b)
        if out is not None:
            out[:, :] = result
            return out
        return result
    result = out if out is not None \
        else np.zeros((a.shape[0], b.shape[1]), a.dtype)
    result[loc_row_slice, loc_col_slice] = \
        np.dot(a[loc_row_slice, :], b[:, loc_col_slice])
    rank = comm.Get_rank()
    for r, (rs, cs) in enumerate(slice_tuples_by_rank):
        buf = np.ascontiguousarray(result[rs, cs]) if r == rank else None
        buf = comm.bcast(buf, root=r)
        if r != rank:
            result[rs, cs] = buf
    return result


def parallel_apply(f, l, comm):
    """Apply `f` to every element of `l`, distributing the work over
    `comm`; every rank returns the full result list (reference:
    mpitools.parallel_apply:943)."""
    comm, _ = _unwrap_comm(comm)
    if comm is None or comm.Get_size() == 1:
        return [f(x) for x in l]
    loc_indices, owners, loc_comm = distribute_indices(
        list(range(len(l))), comm)
    loc_results = {i: f(l[i]) for i in loc_indices}
    results = [None] * len(l)
    for chunk in comm.allgather(loc_results):
        for i, val in chunk.items():
            results[i] = val
    return results


def sum_across_procs(x, comm):
    """Sum a value over all processors (reference:
    mpitools.sum_across_procs:985)."""
    comm, _ = _unwrap_comm(comm)
    if comm is None or comm.Get_size() == 1:
        return x
    from mpi4py import MPI
    return comm.allreduce(x, MPI.SUM)


def sum_arrays(local_array, owners, comm):
    """Sum arrays contributed by the `owners` ranks; non-owner
    contributions are zeroed first (reference:
    mpitools.sum_arrays:1043)."""
    comm, _ = _unwrap_comm(comm)
    if comm is None or comm.Get_size() == 1:
        return local_array
    if comm.Get_rank() not in owners:
        local_array = np.zeros_like(local_array)
    from mpi4py import MPI
    result = np.empty_like(local_array)
    comm.Allreduce(local_array, result, op=MPI.SUM)
    return result


def processor_group_size(nprocs, number_of_tasks):
    """The number of processor groups for tackling `number_of_tasks`:
    the smallest multiple of `nprocs` >= tasks when tasks > procs, else
    the smallest divisor-product of `nprocs` >= tasks (reference:
    mpitools.processor_group_size:1009)."""
    from pygsti_tpu.tools.matrixtools import prime_factors
    if number_of_tasks >= nprocs:
        return nprocs * int(np.ceil(1.0 * number_of_tasks / nprocs))
    fctrs = sorted(prime_factors(nprocs))
    if int(np.ceil(number_of_tasks)) in fctrs:
        return int(np.ceil(number_of_tasks))
    i = 1
    while np.prod(fctrs[0:i]) < number_of_tasks:
        i += 1
    return int(np.prod(fctrs[0:i]))


def closest_divisor(a, b):
    """The divisor of `a` closest to `b` (reference:
    mpitools.closest_divisor:1075)."""
    divisors = [d for d in range(1, a + 1) if a % d == 0]
    return min(divisors, key=lambda d: abs(d - b))


def compute_blas_threads(num_ranks, blas_threads_per_rank):
    """Total BLAS threads when launching `num_ranks` MPI ranks with the
    given per-rank thread count (reference:
    mpitools.compute_blas_threads:1146)."""
    import os
    if blas_threads_per_rank is not None:
        return int(num_ranks) * int(blas_threads_per_rank)
    cpus = os.cpu_count() or 1
    return max(1, cpus // max(1, num_ranks)) * num_ranks


def resolve_mpiexec(mpiexec):
    """Absolute path of an MPI launcher: 'auto' searches PATH for mpiexec /
    mpirun / mpiexec.hydra; otherwise the given name is resolved
    (reference: mpitools.resolve_mpiexec:1097)."""
    import shutil
    if mpiexec == 'auto':
        for candidate in ('mpiexec', 'mpirun', 'mpiexec.hydra'):
            found = shutil.which(candidate)
            if found is not None:
                return found
        raise FileNotFoundError(
            "resolve_mpiexec: could not find an MPI launcher on PATH "
            "(tried mpiexec, mpirun, mpiexec.hydra)")
    found = shutil.which(mpiexec)
    if found is None:
        raise FileNotFoundError(
            "resolve_mpiexec: launcher %r not found on PATH" % mpiexec)
    return found


RUN_KWARGS_PICKLE_MSG = (
    "write_mpi_runner_artifacts pickles protocol.run keyword arguments "
    "into the (persistent) artifact directory; pickles are neither "
    "portable nor long-lived -- do not archive them.")


def write_mpi_runner_artifacts(protocol_obj, run_kwargs, artifact_dir,
                               artifacts_persistent):
    """Serialize a protocol run into a self-contained directory an MPI (or
    multi-host) launcher can execute: the protocol, pickled run kwargs, and
    a stand-alone runner script (reference:
    mpitools.write_mpi_runner_artifacts:1198).  Returns the runner path."""
    import pathlib
    import pickle
    import warnings
    artifact_dir = pathlib.Path(artifact_dir)
    protocol_dir = str(artifact_dir / 'protocol')
    protocol_obj.write(protocol_dir)
    if artifacts_persistent:
        warnings.warn(RUN_KWARGS_PICKLE_MSG, UserWarning)
    else:
        run_kwargs.setdefault('disable_checkpointing', True)
    kwargs_path = artifact_dir / 'volatile_run_kwargs.pkl'
    with open(kwargs_path, 'wb') as f:
        pickle.dump(run_kwargs, f)
    runner_path = str(artifact_dir / 'mpi_runner.py')
    runner_script = (
        "import pickle\n"
        "import pygsti_tpu\n"
        "try:\n"
        "    from mpi4py import MPI\n"
        "    comm = MPI.COMM_WORLD\n"
        "except ImportError:\n"
        "    comm = None\n"
        "data = pygsti_tpu.io.read_data_from_dir(%r)\n"
        "protocol = pygsti_tpu.io.read_protocol_from_dir(%r)\n"
        "with open(%r, 'rb') as _f:\n"
        "    _kwargs = pickle.load(_f)\n"
        "results = protocol.run(data, **_kwargs)\n"
        "if comm is None or comm.Get_rank() == 0:\n"
        "    results.write(%r)\n"
        % (str(artifact_dir), protocol_dir, str(kwargs_path),
           str(artifact_dir)))
    with open(runner_path, 'w') as f:
        f.write(runner_script)
    return runner_path


def build_slurm_script(*, job_name, nodes, ntasks_per_node, cpus_per_task,
                       runner_path, script_path='submit.sh', time=None,
                       partition=None, output='slurm-%j.out',
                       error='slurm-%j.err', max_host_procs=None):
    """A SLURM sbatch script launching the MPI runner, with BLAS
    thread-count env exports matching cpus_per_task (reference:
    mpitools.build_slurm_script:1291)."""
    def directive(flag, value):
        return "#SBATCH %s=%s" % (flag, value) if value is not None else "#"

    lines = [
        "#!/bin/bash",
        "#",
        "# SLURM batch script generated by pygsti_tpu",
        "# Protocol: %s" % job_name,
        "# Submit with:  sbatch %s" % script_path,
        "#",
        "#SBATCH --job-name=%s" % job_name,
        "#SBATCH --nodes=%d" % nodes,
        "#SBATCH --ntasks-per-node=%d" % ntasks_per_node,
        "#SBATCH --cpus-per-task=%d" % cpus_per_task,
        directive("--time", time),
        directive("--partition", partition),
        "#SBATCH --output=%s" % output,
        "#SBATCH --error=%s" % error,
        "",
        "export OMP_NUM_THREADS=%d" % cpus_per_task,
        "export OPENBLAS_NUM_THREADS=%d" % cpus_per_task,
        "export MKL_NUM_THREADS=%d" % cpus_per_task,
        "export NUMEXPR_NUM_THREADS=%d" % cpus_per_task,
        "",
    ]
    if max_host_procs is not None:
        lines.append("export PYGSTI_MAX_HOST_PROCS=%d" % max_host_procs)
        lines.append("")
    lines.append("srun python %s" % runner_path)
    return "\n".join(lines) + "\n"
