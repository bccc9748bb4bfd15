"""Forward simulators."""

from pygsti_tpu.forwardsims.forwardsim import (
    ForwardSimulator, SimpleForwardSimulator, MatrixForwardSimulator,
    MapForwardSimulator, create_forward_simulator,
)
