"""RPE model construction import-path parity (reference:
pygsti/models/rpemodel.py); implementations in extras/rpe."""

from pygsti_tpu.extras.rpe.rpeconstruction import (create_parameterized_rpe_model,
                                                   create_rpe_angle_circuit_lists)
