"""RPE circuit construction import-path parity (reference:
pygsti/circuits/rpecircuits.py); implementations in
extras/rpe/rpeconstruction."""

from pygsti_tpu.extras.rpe.rpeconstruction import (
    create_rpe_angle_circuit_lists, create_rpe_angle_circuits_dict)
