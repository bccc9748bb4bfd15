"""MatrixForwardSimulator import-path parity (reference:
pygsti/forwardsims/matrixforwardsim.py).  On TPU the matrix- and
map-style simulators collapse into one scanned-propagation kernel
(forwardsims/forwardsim.py); this module provides the reference path."""

from pygsti_tpu.forwardsims.forwardsim import (MatrixForwardSimulator,
                                               SimpleForwardSimulator)
