"""FOGI store import-path parity (reference: pygsti/models/fogistore.py).
The implementation lives in pygsti_tpu/tools/fogitools.py."""

from pygsti_tpu.tools.fogitools import (FOGIStore, compute_fogi_directions,
                                        compute_gauge_action_matrix)

FirstOrderGaugeInvariantStore = FOGIStore  # reference class name
