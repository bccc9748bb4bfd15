"""Base objects: labels, state spaces, bases, outcome dicts, qubit graphs."""

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.baseobjs.statespace import StateSpace, QubitSpace, ExplicitStateSpace
from pygsti_tpu.baseobjs.basis import Basis, BuiltinBasis, TensorProdBasis, DirectSumBasis
from pygsti_tpu.baseobjs.outcomelabeldict import OutcomeLabelDict
from pygsti_tpu.baseobjs.qubitgraph import QubitGraph
from pygsti_tpu.baseobjs.nicelyserializable import NicelySerializable
from pygsti_tpu.baseobjs.verbosityprinter import VerbosityPrinter
