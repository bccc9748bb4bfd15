"""Shared-memory array helpers (reference: pygsti/tools/sharedmemtools.py).

The reference uses POSIX shared memory so many MPI ranks on one host can
share large numpy work arrays. In this framework a host runs ONE controller
process and device memory is managed by XLA, so there is nothing to share:
these helpers keep the reference's calling convention with plain ndarrays
(shared_mem_is_enabled() is always False, matching the reference when
multiprocessing.shared_memory is unavailable)."""

import numpy as _np


class LocalNumpyArray(_np.ndarray):
    """ndarray subclass carrying the host_array/shared-memory bookkeeping
    attributes the reference attaches (reference sharedmemtools.py:30); in
    this framework they are always None."""

    def __new__(cls, *args, **kwargs):
        host_array = kwargs.pop('host_array', None)
        slices_into_host_array = kwargs.pop('slices_into_host_array', None)
        shared_memory_handle = kwargs.pop('shared_memory_handle', None)
        obj = super().__new__(cls, *args, **kwargs)
        obj.host_array = host_array
        obj.slices_into_host_array = slices_into_host_array
        obj.shared_memory_handle = shared_memory_handle
        return obj

    def __array_finalize__(self, obj):
        if obj is None:
            return
        self.host_array = getattr(obj, 'host_array', None)
        self.slices_into_host_array = getattr(obj, 'slices_into_host_array',
                                              None)
        self.shared_memory_handle = getattr(obj, 'shared_memory_handle', None)


def shared_mem_is_enabled():
    """Always False: single-controller JAX has no intra-host rank sharing."""
    return False


def create_shared_ndarray(resource_alloc, shape, dtype, zero_out=False,
                          memory_tracker=None):
    """Allocate a (plain) ndarray; returns (array, shm_handle=None) like the
    reference's non-shared fallback (reference sharedmemtools.py:93)."""
    if memory_tracker is not None and hasattr(memory_tracker,
                                              'add_tracked_memory'):
        memory_tracker.add_tracked_memory(int(_np.prod(shape)))
    ar = _np.zeros(shape, dtype) if zero_out else _np.empty(shape, dtype)
    return ar, None


def cleanup_shared_ndarray(shm):
    """No-op: arrays from create_shared_ndarray carry no shm handle."""
    if shm is not None:  # parity with reference close/unlink
        try:
            shm.close(); shm.unlink()
        except Exception:
            pass
