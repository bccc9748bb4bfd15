"""Circuits: Circuit objects, circuit lists, GST circuit construction."""

from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.circuits.circuitlist import CircuitList
from pygsti_tpu.circuits.circuitparser import parse_circuit_str, parse_label_str
