"""Processor specifications."""

from pygsti_tpu.processors.processorspec import QubitProcessorSpec
