"""Device connectivity specs and device-derived models (reference:
pygsti/extras/devices/)."""

from pygsti_tpu.extras.devices.experimentaldevice import (ExperimentalDevice,
                                                          DEVICE_EDGELISTS)
from pygsti_tpu.extras.devices.devcore import (create_processor_spec,
                                               create_error_rates_model,
                                               create_local_depolarizing_model,
                                               edgelist)
