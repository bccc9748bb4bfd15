"""ResourceAllocation import-path parity (reference:
pygsti/baseobjs/resourceallocation.py).

Under single-controller JAX there is no MPI communicator to allocate; the
working object (mesh + memory limit + profiler container) lives in
pygsti_tpu/parallel/mesh.py and is re-exported here under the reference's
module path.
"""

from pygsti_tpu.parallel.mesh import ResourceAllocation
