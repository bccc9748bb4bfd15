"""Error-generator propagation through Clifford circuits
(reference: pygsti/errorgenpropagation/, tools/errgenproptools.py)."""

from pygsti_tpu.errorgenpropagation.errorpropagator import (
    ErrorGeneratorPropagator, PauliLabel, ElementaryErrorgenLabel)
