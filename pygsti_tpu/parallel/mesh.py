"""Device-mesh utilities.

The reference shards its (elements x params x params) computation over an
MPI processor grid with host shared memory (SURVEY.md §2.18,
pygsti/layouts/distlayout.py:110).  Here the same decomposition is expressed
with ``jax.sharding``: the circuit/element axis is sharded across a 1-D or
2-D device mesh and XLA inserts the collectives (psum for JTJ/JTf
reductions, all_gathers for element maps) inside the jitted graphs.

``ResourceAllocation`` is kept as a thin API-parity shim: single-controller
JAX has no comm object to carry around.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def circuit_mesh(n_devices=None, devices=None, axis_name='circuits'):
    """1-D mesh over the circuit/element axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def grid_mesh(n_circuit_devices, n_param_devices, devices=None):
    """2-D ('circuits', 'params') mesh: the TPU-native analogue of the
    reference's atom-procs x param-procs processor grid
    (pygsti/layouts/distlayout.py:139-196).  The circuit/element axis of
    every batch tensor is sharded over 'circuits'; Jacobian tangents and
    the JTJ/JTf rows are sharded over 'params'
    (objectivefns._compiled_objective_graphs mesh path)."""
    if devices is None:
        devices = jax.devices()
    need = n_circuit_devices * n_param_devices
    assert len(devices) >= need, \
        "grid_mesh needs %d devices, have %d" % (need, len(devices))
    grid = np.array(devices[:need]).reshape(n_circuit_devices, n_param_devices)
    return Mesh(grid, ('circuits', 'params'))


def param_axis_size(mesh):
    """Number of devices along the 'params' axis (1 for 1-D meshes)."""
    if mesh is None or 'params' not in mesh.axis_names:
        return 1
    return mesh.shape['params']


def shard_circuits(mesh, arr, axis_name='circuits'):
    """Place `arr` sharded along its leading axis."""
    spec = P(axis_name, *([None] * (np.ndim(arr) - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicated(mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))


def pad_to_multiple(n, k):
    """Smallest multiple of k that is >= n."""
    return ((n + k - 1) // k) * k


class ResourceAllocation(object):
    """API-parity shim for the reference's ResourceAllocation
    (baseobjs/resourceallocation.py:28).  Under single-controller JAX there
    is no MPI comm; this object carries an optional mesh + memory limit."""

    @classmethod
    def cast(cls, obj):
        if isinstance(obj, cls):
            return obj
        return cls()

    def __init__(self, comm=None, mem_limit=None, profiler=None, distribute_method="default",
                 mesh=None):
        self.comm = None
        self.mem_limit = mem_limit
        self.profiler = profiler
        self.mesh = mesh

    @property
    def comm_rank(self):
        return jax.process_index()

    @property
    def comm_size(self):
        return jax.process_count()

    def is_host_leader(self):
        return jax.process_index() == 0
