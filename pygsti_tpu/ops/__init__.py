"""Native (C++) kernels and their build/loading logic.

Currently: `_fastcircuitparser`, the native circuit-string parser (the
counterpart of the reference's Cython fastcircuitparser).  Build on demand
with ``python -m pygsti_tpu.ops.build`` or automatically on first import
attempt; all users fall back to the pure-Python implementations when the
extension is unavailable.
"""

import os


def load_fastparser():
    """Return the native parser module or None."""
    try:
        from pygsti_tpu.ops import _fastcircuitparser
        return _fastcircuitparser
    except ImportError:
        pass
    # try to build it once (quietly)
    try:
        from pygsti_tpu.ops.build import build_extension
        if build_extension(quiet=True):
            from pygsti_tpu.ops import _fastcircuitparser
            return _fastcircuitparser
    except Exception:
        pass
    return None
