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


def load_fastopcalc():
    """Return a numpy-friendly wrapper over the native opcalc module, or None."""
    import numpy as _np
    mod = None
    try:
        from pygsti_tpu.ops import _fastopcalc
        mod = _fastopcalc
    except ImportError:
        try:
            from pygsti_tpu.ops.build import build_extension
            if build_extension(quiet=True, name="fastopcalc"):
                from pygsti_tpu.ops import _fastopcalc
                mod = _fastopcalc
        except Exception:
            return None
    if mod is None:
        return None

    class _Wrapper:
        @staticmethod
        def bulk_eval_real(vtape, ctape, paramvec):
            raw, count, code = mod.bulk_eval_real_raw(vtape, ctape, paramvec)
            return _np.frombuffer(raw, dtype=_np.float64, count=count)

        @staticmethod
        def bulk_eval_complex(vtape, ctape, paramvec):
            raw, count, code = mod.bulk_eval_complex_raw(vtape, ctape, paramvec)
            return _np.frombuffer(raw, dtype=_np.complex128, count=count)

        abs_sum_bulk_eval_complex = staticmethod(mod.abs_sum_bulk_eval_complex)

    return _Wrapper
