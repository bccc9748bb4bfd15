"""MapForwardSimulator import-path parity (reference:
pygsti/forwardsims/mapforwardsim.py)."""

from pygsti_tpu.forwardsims.forwardsim import (MapForwardSimulator,
                                               SimpleForwardSimulator)
