"""Layer rules import-path parity (reference: pygsti/models/layerrules.py).

Implicit models build layer operators from per-gate recipes registered at
layout time (LocalNoiseModel.register_layer / CloudNoiseModel's cloud
extension) instead of a separate LayerRules object; this module documents
the correspondence and provides the base name."""


class LayerRules(object):
    """Base layer-rules marker (reference: layerrules.LayerRules).  See
    LocalNoiseModel._layer_recipes for the working mechanism."""
