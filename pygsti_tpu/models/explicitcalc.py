"""Explicit-model gauge calculations import-path parity (reference:
pygsti/models/explicitcalc.py).  The non-gauge/gauge space machinery is in
pygsti_tpu/models/nongauge.py (AD through the gauge action instead of the
reference's analytic derivative assembly)."""

from pygsti_tpu.models.nongauge import compute_nongauge_and_gauge_spaces
