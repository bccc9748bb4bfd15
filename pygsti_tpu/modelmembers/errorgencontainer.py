"""Error-generator-container mixin path parity (reference:
pygsti/modelmembers/errorgencontainer.py).

The errorgen_coefficients access surface is implemented directly on the
Lindblad-parameterized operations (modelmembers/operations.py:
LindbladErrorgen.errorgen_coefficients etc.); this module provides the
reference's mixin names for isinstance-style checks."""

from __future__ import annotations


class ErrorGeneratorContainer(object):
    """Marker/mixin: object exposing errorgen_coefficients() (reference:
    errorgencontainer.ErrorGeneratorContainer:18)."""

    def has_errorgen(self):
        return hasattr(self, 'errorgen_coefficients')


class ErrorMapContainer(ErrorGeneratorContainer):
    """Marker for error-MAP containers (reference:
    errorgencontainer.ErrorMapContainer:243)."""


class NoErrorGeneratorInterface(object):
    """Marker for members with no errorgen interface (reference:
    errorgencontainer.NoErrorGeneratorInterface:392)."""
