"""Circuits: immutable sequences of layer labels.

Mirrors the reference Circuit's user surface (pygsti/circuits/circuit.py:223)
in immutable ("editable=False") form: a tuple of layer Labels plus line
labels, with pyGSTi-compatible string syntax:

  ``Gxpi2:0Gypi2:0@(0)``  -- sequence of simple labels, line-label suffix
  ``[Gxpi2:0Gypi2:1]``    -- a layer of parallel gates
  ``[]``                  -- an empty layer (global idle)
  ``(Gxpi2:0Gypi2:0)^2``  -- repetition
  ``{}``                  -- the empty circuit

Parsing is in circuits/circuitparser.py (reference grammar:
pygsti/circuits/circuitparser/__init__.py:47).
"""

from __future__ import annotations

from pygsti_tpu.baseobjs.label import Label, LabelTupTup


def _to_layer_label(layer):
    """Canonicalize one layer spec to a Label."""
    lbl = Label(layer) if not isinstance(layer, (LabelTupTup,)) else layer
    return lbl


class Circuit(object):
    """An immutable circuit: ordered tuple of layer labels + line labels."""

    __slots__ = ('_layers', '_line_labels', '_str', '_hash')

    def __init__(self, layer_labels=(), line_labels=None, stringrep=None,
                 editable=False, check=True):
        if isinstance(layer_labels, Circuit):
            layers = layer_labels._layers
            if line_labels is None:
                line_labels = layer_labels._line_labels
        elif isinstance(layer_labels, str):
            from pygsti_tpu.circuits.circuitparser import parse_circuit_str
            layers, parsed_lls = parse_circuit_str(layer_labels)
            if line_labels is None:
                line_labels = parsed_lls
            if stringrep is None:
                stringrep = layer_labels
        else:
            layers = tuple(_to_layer_label(l) for l in layer_labels)

        if line_labels is None:
            # infer from the labels themselves ('auto' lines)
            seen = []
            for l in layers:
                ss = l.sslbls
                if ss is not None:
                    for s in ss:
                        if s not in seen:
                            seen.append(s)
            line_labels = tuple(seen) if seen else ('*',)
        elif isinstance(line_labels, (int, str)) and line_labels != '*':
            line_labels = (line_labels,)
        else:
            line_labels = tuple(line_labels)

        self._layers = layers
        self._line_labels = line_labels
        self._str = stringrep
        self._hash = hash((layers, line_labels))

    # -- core properties -----------------------------------------------------
    @property
    def layertup(self):
        return self._layers

    @property
    def tup(self):
        if self._line_labels in (('*',), ()):
            return self._layers
        return self._layers + ('@',) + self._line_labels

    @property
    def line_labels(self):
        return self._line_labels

    @property
    def num_lines(self):
        return len(self._line_labels)

    @property
    def depth(self):
        return len(self._layers)

    @property
    def num_layers(self):
        return len(self._layers)

    @property
    def width(self):
        return len(self._line_labels)

    @property
    def str(self):
        if self._str is None:
            self._str = self._compute_str()
        return self._str

    def _compute_str(self):
        if len(self._layers) == 0:
            s = "{}"
        else:
            parts = []
            for l in self._layers:
                if isinstance(l, LabelTupTup):
                    parts.append(str(l))  # includes brackets / "[]"
                else:
                    parts.append(str(l))
            s = "".join(parts)
        if self._line_labels not in (('*',), ()):
            s += "@(" + ",".join(str(x) for x in self._line_labels) + ")"
        return s

    # -- container protocol ---------------------------------------------------
    def __len__(self):
        return len(self._layers)

    def __iter__(self):
        return iter(self._layers)

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            return Circuit(self._layers[idx], self._line_labels)
        return self._layers[idx]

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        if isinstance(other, Circuit):
            return self.tup == other.tup
        if isinstance(other, tuple):
            return self.tup == other or self._layers == other
        if isinstance(other, str):
            return self.str == other
        return NotImplemented

    def __lt__(self, other):
        return self.tup < (other.tup if isinstance(other, Circuit) else other)

    def __gt__(self, other):
        return self.tup > (other.tup if isinstance(other, Circuit) else other)

    # -- composition ----------------------------------------------------------
    def _merged_line_labels(self, other):
        if self._line_labels == ('*',):
            return other.line_labels
        if other.line_labels == ('*',):
            return self._line_labels
        merged = list(self._line_labels)
        for x in other.line_labels:
            if x not in merged:
                merged.append(x)
        return tuple(merged)

    def _bare_str(self):
        s = self.str
        at = s.rfind('@')
        s = s[:at] if at >= 0 else s
        return '' if s == '{}' else s

    def __add__(self, other):
        if isinstance(other, Circuit):
            lls = self._merged_line_labels(other)
            sr = self._bare_str() + other._bare_str()
            if sr == '':
                sr = '{}'
            if lls not in (('*',), ()):
                sr += '@(' + ','.join(str(x) for x in lls) + ')'
            return Circuit(self._layers + other._layers, lls, stringrep=sr)
        if isinstance(other, (tuple, list)):
            return Circuit(self._layers + tuple(_to_layer_label(l) for l in other),
                           self._line_labels)
        return NotImplemented

    def __radd__(self, other):
        if isinstance(other, (tuple, list)):
            return Circuit(tuple(_to_layer_label(l) for l in other) + self._layers,
                           self._line_labels)
        return NotImplemented

    def __mul__(self, n):
        return self.repeat(n)

    def __pow__(self, n):
        return self.repeat(n)

    def repeat(self, ntimes, expand=True):
        assert int(ntimes) == ntimes and ntimes >= 0
        ntimes = int(ntimes)
        bare = self._bare_str()
        if ntimes == 0 or bare == '':
            sr = '{}'
        elif ntimes == 1:
            sr = bare
        elif len(self._layers) == 1 and not isinstance(self._layers[0], LabelTupTup):
            sr = '%s^%d' % (bare, ntimes)
        else:
            sr = '(%s)^%d' % (bare, ntimes)
        if self._line_labels not in (('*',), ()):
            sr += '@(' + ','.join(str(x) for x in self._line_labels) + ')'
        return Circuit(self._layers * ntimes, self._line_labels, stringrep=sr)

    # -- misc -----------------------------------------------------------------
    def copy(self, editable=False):
        return self

    def to_pythonstr(self, op_labels=None):
        return self.str

    def map_state_space_labels(self, mapper):
        new_layers = tuple(l.map_state_space_labels(mapper) for l in self._layers)
        m = mapper.__getitem__ if hasattr(mapper, '__getitem__') else mapper
        new_lls = tuple(m(x) for x in self._line_labels) if self._line_labels != ('*',) \
            else ('*',)
        return Circuit(new_layers, new_lls)

    def serialize(self):
        """Expand each multi-gate layer into sequential single-gate layers."""
        out = []
        for l in self._layers:
            comps = l.components
            if len(comps) <= 1:
                out.append(l)
            else:
                out.extend(comps)
        return Circuit(tuple(out), self._line_labels)

    def expand_subcircuits(self):
        return self  # subcircuit (CircuitLabel) support: none in layers yet

    def __str__(self):
        return self.str

    def __repr__(self):
        return "Circuit(%s)" % self.str
