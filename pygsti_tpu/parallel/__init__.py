"""Parallelism: device meshes and sharding helpers (the TPU-native
replacement for the reference's MPI ResourceAllocation / distlayout stack)."""

from pygsti_tpu.parallel.mesh import (circuit_mesh, shard_circuits, replicated,
                                      pad_to_multiple, ResourceAllocation)
