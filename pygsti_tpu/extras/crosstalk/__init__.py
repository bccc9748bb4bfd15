"""Crosstalk detection via conditional-independence tests
(reference: pygsti/extras/crosstalk/, 1.6k LoC)."""

from pygsti_tpu.extras.crosstalk.core import (do_basic_crosstalk_detection,
                                              CrosstalkResults)
