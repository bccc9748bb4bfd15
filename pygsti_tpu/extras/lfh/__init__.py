"""Locally-fluctuating-Hamiltonian (LFH) models (reference:
pygsti/extras/lfh/)."""

from pygsti_tpu.extras.lfh.lfh import (GaussianParamFluctuation,
                                       LFHIntegratingForwardSimulator,
                                       LFHWeakForwardSimulator,
                                       LFHSigmaForwardSimulator)
