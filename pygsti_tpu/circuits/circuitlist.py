"""CircuitList: a list of circuits with metadata (reference:
pygsti/circuits/circuitlist.py:23)."""

from __future__ import annotations

from pygsti_tpu.circuits.circuit import Circuit


class CircuitList(object):
    """A named, immutable list of circuits, optionally with per-circuit weights
    and op-label aliases (used to expand dataset lookups)."""

    @classmethod
    def cast(cls, circuits):
        if isinstance(circuits, CircuitList):
            return circuits
        return cls(circuits)

    def __init__(self, circuits, op_label_aliases=None, circuit_weights=None, name=None):
        self._list = [c if isinstance(c, Circuit) else Circuit(c) for c in circuits]
        self.op_label_aliases = op_label_aliases
        self.circuit_weights = circuit_weights
        self.name = name

    def __len__(self):
        return len(self._list)

    def __iter__(self):
        return iter(self._list)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return CircuitList(self._list[i], self.op_label_aliases,
                               None if self.circuit_weights is None else self.circuit_weights[i],
                               self.name)
        return self._list[i]

    def __contains__(self, c):
        return c in self._list

    def apply_aliases(self):
        """Expand alias labels within all circuits; returns plain list."""
        if not self.op_label_aliases:
            return list(self._list)
        out = []
        for c in self._list:
            layers = []
            for l in c.layertup:
                if l in self.op_label_aliases:
                    expansion = self.op_label_aliases[l]
                    layers.extend(expansion.layertup if isinstance(expansion, Circuit)
                                  else expansion)
                else:
                    layers.append(l)
            out.append(Circuit(layers, c.line_labels))
        return out

    def __eq__(self, other):
        if isinstance(other, CircuitList):
            return self._list == other._list
        return self._list == list(other)

    def __hash__(self):
        return hash(tuple(self._list))

    def __repr__(self):
        return "CircuitList(%d circuits)" % len(self._list)
