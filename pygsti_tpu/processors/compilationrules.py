"""Compilation rules for processor specs (reference:
pygsti/processors/compilationrules.py).

The working implementation lives in ``pygsti_tpu.algorithms.compilers``
(symplectic Clifford compilation onto native gates); this module provides
the reference's module path and class names.
"""

from __future__ import annotations

from pygsti_tpu.algorithms.compilers import CompilationRules


class CompilationError(Exception):
    """Raised when a compilation cannot be found (reference:
    compilationrules.CompilationError:27)."""


class CliffordCompilationRules(CompilationRules):
    """Clifford-group compilation rules (reference:
    compilationrules.CliffordCompilationRules:369).  The reference
    distinguishes 'absolute' (exact) and 'paulieq' (equal up to Pauli)
    compilation types; the symplectic compiler here produces exact
    compilations, which satisfy both contracts."""

    @classmethod
    def create_standard(cls, processor_spec, compile_type="absolute",
                        what_to_compile=("1Qcliffords",), verbosity=0):
        assert compile_type in ("absolute", "paulieq")
        return cls(processor_spec)
