"""DistributableForwardSimulator import-path parity (reference:
pygsti/forwardsims/distforwardsim.py).  Distribution is a
jax.sharding.Mesh on the simulator (`sim.mesh`)."""

from pygsti_tpu.forwardsims.forwardsim import DistributableForwardSimulator
