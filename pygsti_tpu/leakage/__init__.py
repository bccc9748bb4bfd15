"""Leakage-aware modeling: qutrit (2+1 level) models and leakage metrics
(reference: pygsti/leakage/)."""

from pygsti_tpu.leakage.models import (to_3level_unitary, create_3level_model,
                                       create_leakage_model)
from pygsti_tpu.leakage.metrics import gate_leakage_rate, gate_seepage_rate
from pygsti_tpu.leakage.gaugeopt import (DirectSumUnitaryGaugeGroup,
                                         std_lago_gopsuite, add_lago_models)
from pygsti_tpu.leakage.metrics import (subspace_entanglement_fidelity,
                                        subspace_jtracedist,
                                        subspace_superop_fro_dist,
                                        subspace_diamonddist,
                                        subspace_restriction)
from pygsti_tpu.leakage.core import (computational_effect,
                                     computational_superkets,
                                     computational_projector,
                                     augment_for_leakage_modeling)
