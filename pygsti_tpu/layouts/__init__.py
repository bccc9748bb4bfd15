"""Layouts: compiled circuit index tensors + (circuit,outcome)->element maps."""

from pygsti_tpu.layouts.layout import CircuitOutcomeProbabilityLayout
