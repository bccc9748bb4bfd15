"""Import-path parity for the GST exceptions (reference:
pygsti/baseobjs/exceptions.py); canonical home is tools/exceptions."""

from pygsti_tpu.tools.exceptions import GSTRuntimeError, GSTValueError
