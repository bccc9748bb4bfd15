"""RPEconfig: declares the gate-set conventions an RPE analysis fits
(reference: pygsti/extras/rpe/rpeconfig.py:18)."""


class RPEconfig(object):
    """Attribute container built from a convention dictionary."""

    def __init__(self, input_dict):
        for k, v in input_dict.items():
            setattr(self, k, v)
        self._dict = dict(input_dict)

    def to_dict(self):
        return dict(self._dict)
