"""Leakage-aware modeling: qutrit (2+1 level) models and leakage metrics
(reference: pygsti/leakage/)."""

from pygsti_tpu.leakage.models import (to_3level_unitary, create_3level_model,
                                       create_leakage_model)
from pygsti_tpu.leakage.metrics import gate_leakage_rate, gate_seepage_rate
