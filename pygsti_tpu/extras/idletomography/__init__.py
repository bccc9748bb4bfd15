"""Idle tomography: Pauli-basis characterization of idle errors
(reference: pygsti/extras/idletomography/, 3.5k LoC)."""

from pygsti_tpu.extras.idletomography.idtcore import (IdleTomographyDesign,
                                                      IdleTomography,
                                                      IdleTomographyResults)
from pygsti_tpu.extras.idletomography.pauliobjs import (NQOutcome, NQPauliState, NQPauliOp)
from pygsti_tpu.extras.idletomography import idttools
from pygsti_tpu.report.idtreport import create_idletomography_report
