"""One-call convenience drivers."""

from pygsti_tpu.drivers.longsequence import (run_long_sequence_gst, run_stdpractice_gst,
                                             run_model_test)
