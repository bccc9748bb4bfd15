"""JSON-dict round-trip serialization base class.

Mirrors the reference's NicelySerializable protocol
(pygsti/baseobjs/nicelyserializable.py:24): objects write a state dict with a
'module'/'class' pair and reload via dynamic import.
"""

from __future__ import annotations

import importlib
import json

import numpy as np


def _encode_value(v):
    if isinstance(v, np.ndarray):
        if np.iscomplexobj(v):
            return {'__ndarray_complex__': True, 'real': v.real.tolist(),
                    'imag': v.imag.tolist(), 'dtype': str(v.real.dtype)}
        return {'__ndarray__': True, 'data': v.tolist(), 'dtype': str(v.dtype)}
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, dict):
        return {k: _encode_value(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        enc = [_encode_value(x) for x in v]
        return {'__tuple__': True, 'items': enc} if isinstance(v, tuple) else enc
    return v


def _decode_value(v):
    if isinstance(v, dict):
        if v.get('__ndarray__'):
            return np.array(v['data'], dtype=v['dtype'])
        if v.get('__ndarray_complex__'):
            return np.array(v['real'], dtype=v['dtype']) + 1j * np.array(v['imag'], dtype=v['dtype'])
        if v.get('__tuple__'):
            return tuple(_decode_value(x) for x in v['items'])
        return {k: _decode_value(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_decode_value(x) for x in v]
    return v


class NicelySerializable(object):
    """Base class providing to/from nice-serialization (JSON-able dicts)."""

    def to_nice_serialization(self):
        state = self._to_nice_serialization()
        state['module'] = type(self).__module__
        state['class'] = type(self).__name__
        return state

    @classmethod
    def from_nice_serialization(cls, state):
        mod = importlib.import_module(state['module'])
        klass = getattr(mod, state['class'])
        # some classes override the public method directly instead of the
        # underscore hook; dispatch to whichever the class provides
        base_fn = NicelySerializable.from_nice_serialization.__func__
        if getattr(klass.from_nice_serialization, '__func__', None) is not base_fn:
            return klass.from_nice_serialization(state)
        return klass._from_nice_serialization(state)

    def _to_nice_serialization(self):
        return {}

    @classmethod
    def _from_nice_serialization(cls, state):
        raise NotImplementedError("%s does not implement _from_nice_serialization" % cls.__name__)

    # -- json file helpers --------------------------------------------------
    def write(self, path):
        with open(path, 'w') as f:
            json.dump(_encode_value(self.to_nice_serialization()), f, indent=1)

    @classmethod
    def read(cls, path):
        with open(path) as f:
            state = _decode_value(json.load(f))
        return cls.from_nice_serialization(state)

    def dumps(self):
        return json.dumps(_encode_value(self.to_nice_serialization()))

    @classmethod
    def loads(cls, s):
        return cls.from_nice_serialization(_decode_value(json.loads(s)))


encode_value = _encode_value
decode_value = _decode_value
