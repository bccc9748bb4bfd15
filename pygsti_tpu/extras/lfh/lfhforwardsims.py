"""Module-path parity for the reference's LFH forward simulators
(reference: pygsti/extras/lfh/lfhforwardsims.py).  The TPU implementations
(vmapped parameter-grid evaluation) live in lfh.py."""

from pygsti_tpu.extras.lfh.lfh import (LFHIntegratingForwardSimulator,
                                       LFHWeakForwardSimulator,
                                       LFHSigmaForwardSimulator,
                                       GaussianParamFluctuation)
