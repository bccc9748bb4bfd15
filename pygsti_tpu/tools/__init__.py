"""Numerical tools: basis changes, superoperator conversions, metrics."""

from pygsti_tpu.tools import basistools
from pygsti_tpu.tools import matrixtools
from pygsti_tpu.tools import optools
from pygsti_tpu.tools import internalgates
from pygsti_tpu.tools import lindbladtools
from pygsti_tpu.tools import jamiolkowski

from pygsti_tpu.tools.basistools import change_basis, stdmx_to_vec, vec_to_stdmx
from pygsti_tpu.tools.optools import (
    unitary_to_superop, unitary_to_pauligate, unitary_to_std_process_mx,
    fidelity, entanglement_fidelity, average_gate_fidelity, frobeniusdist,
    jtracedist, process_fidelity, state_to_dmvec, dmvec_to_state,
)
