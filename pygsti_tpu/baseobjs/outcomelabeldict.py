"""Outcome-label dictionary: keys are outcome tuples like ('0',), ('01',).

Mirrors reference OutcomeLabelDict (pygsti/baseobjs/outcomelabeldict.py:16):
string keys are auto-converted to 1-tuples, preserving insertion order.
"""

from __future__ import annotations

import collections


class OutcomeLabelDict(collections.OrderedDict):
    """An ordered dict whose keys are canonicalized outcome tuples."""

    @staticmethod
    def to_outcome(val):
        """Canonicalize: strings become 1-tuples; tuples of strings pass through."""
        if isinstance(val, str):
            return (val,)
        if isinstance(val, tuple):
            return tuple(str(v) if not isinstance(v, str) else v for v in val)
        return (str(val),)

    def __getitem__(self, key):
        return super().__getitem__(OutcomeLabelDict.to_outcome(key))

    def __setitem__(self, key, val):
        super().__setitem__(OutcomeLabelDict.to_outcome(key), val)

    def __contains__(self, key):
        return super().__contains__(OutcomeLabelDict.to_outcome(key))

    def get(self, key, default=None):
        k = OutcomeLabelDict.to_outcome(key)
        return super().get(k, default)

    def copy(self):
        out = OutcomeLabelDict()
        for k, v in self.items():
            out[k] = v
        return out

    def __repr__(self):
        return "OutcomeLabelDict(%s)" % str(list(self.items()))
