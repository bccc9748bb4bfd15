"""Processor specifications."""

from pygsti_tpu.processors.processorspec import QubitProcessorSpec
from pygsti_tpu.processors.compilationrules import (CompilationRules,
                                                    CliffordCompilationRules,
                                                    CompilationError)
from pygsti_tpu.processors.random_compilation import pauli_randomize_circuit
