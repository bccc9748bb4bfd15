"""Forward simulators."""

from pygsti_tpu.forwardsims.forwardsim import (
    ForwardSimulator, SimpleForwardSimulator, MatrixForwardSimulator,
    MapForwardSimulator, create_forward_simulator,
)
from pygsti_tpu.forwardsims.statevecsim import StateVectorForwardSimulator
from pygsti_tpu.forwardsims.torchfwdsim import TorchForwardSimulator
