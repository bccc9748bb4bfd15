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

    def replace_layers_with_aliases(self, alias_dict):
        """Substitute each layer label found in `alias_dict` with the layers
        of the Circuit it maps to (reference: circuit.py:2802).  Labels may
        be keyed as Label objects or bare gate-name strings."""
        if not alias_dict:
            return self
        layers = []
        for layer in self.layertup:
            repl = alias_dict.get(layer)
            if repl is None and getattr(layer, 'name', None) is not None:
                repl = alias_dict.get(layer.name)
            if repl is not None:
                layers.extend(repl.layertup)
            else:
                layers.append(layer)
        return Circuit(layers, self._line_labels)

    def repeat(self, ntimes, expand=True):
        # `expand` is accepted for reference API parity: compact
        # CircuitLabel sub-circuit layers are not supported in this
        # representation, so the expanded form (semantically identical,
        # reference circuit.py repeat) is returned for both settings.
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


# -- manipulation / analysis methods (immutable: each returns a new Circuit;
#    reference: pygsti/circuits/circuit.py editing API) ------------------------

def _simple_components(layer):
    """The simple labels within one layer label."""
    if layer.is_simple:
        return (layer,)
    return tuple(layer.components)


def _circuit_methods():
    """(Installed below -- keeps the class block above compact.)"""


def _num_gates(self):
    """Total number of (simple) gate labels, idles excluded (reference:
    Circuit.num_gates)."""
    n = 0
    for layer in self._layers:
        n += sum(1 for c in _simple_components(layer) if len(c) > 0)
    return n


def _num_nq_gates(self, nq):
    """Number of gates acting on exactly nq qubits (reference:
    Circuit.num_nq_gates)."""
    n = 0
    for layer in self._layers:
        for c in _simple_components(layer):
            if c.sslbls is not None and len(c.sslbls) == nq:
                n += 1
    return n


def _two_q_gate_count(self):
    """Number of 2-qubit gates (reference: Circuit.two_q_gate_count) --
    the circuit-cost metric of the Clifford compilers' '2QGC' cost
    function (reference: algorithms/compilers.py:27)."""
    return self.num_nq_gates(2)


def _num_multiq_gates(self):
    """Number of gates on 2+ qubits (reference: Circuit.num_multiq_gates)."""
    n = 0
    for layer in self._layers:
        for c in _simple_components(layer):
            if c.sslbls is not None and len(c.sslbls) >= 2:
                n += 1
    return n


def _append_circuit(self, other):
    """self followed by other (reference: Circuit.append_circuit)."""
    return self + other


def _prefix_circuit(self, other):
    """other followed by self (reference: Circuit.prefix_circuit)."""
    return other + self


def _insert_layer(self, layer_lbl, j):
    """A copy with `layer_lbl` inserted at layer index j (reference:
    Circuit.insert_layer)."""
    lay = _to_layer_label(layer_lbl)
    return Circuit(self._layers[:j] + (lay,) + self._layers[j:],
                   self._line_labels)


def _delete_layers(self, layers_to_delete):
    """A copy with the given layer indices removed (reference:
    Circuit.delete_layers)."""
    if isinstance(layers_to_delete, int):
        layers_to_delete = (layers_to_delete,)
    drop = set(layers_to_delete)
    return Circuit(tuple(l for i, l in enumerate(self._layers)
                         if i not in drop), self._line_labels)


def _delete_idle_layers(self):
    """A copy without empty (global-idle) layers (reference:
    Circuit.delete_idle_layers_inplace)."""
    return Circuit(tuple(l for l in self._layers if len(l) > 0),
                   self._line_labels)


def _replace_gatename(self, old_gatename, new_gatename):
    """A copy with every gate named `old_gatename` renamed (state-space
    labels preserved; reference: Circuit.replace_gatename)."""
    def repl(lbl):
        comps = _simple_components(lbl)
        new = tuple(Label(new_gatename, c.sslbls) if c.name == old_gatename
                    else c for c in comps)
        if len(new) == 1:
            return new[0]
        return LabelTupTup.init(new)
    return Circuit(tuple(repl(l) for l in self._layers), self._line_labels)


def _replace_layer(self, old_layer, new_layer):
    """A copy with every layer equal to old_layer replaced (reference:
    Circuit.replace_layer)."""
    old = _to_layer_label(old_layer)
    new = _to_layer_label(new_layer)
    return Circuit(tuple(new if l == old else l for l in self._layers),
                   self._line_labels)


def _layer(self, j):
    """The j-th layer label (reference: Circuit.layer)."""
    return self._layers[j]


def _layer_label(self, j):
    return self._layers[j]


def _idling_lines(self):
    """Line labels that no gate acts on (reference: Circuit.idling_lines)."""
    used = set()
    for l in self._layers:
        for c in _simple_components(l):
            if c.sslbls:
                used.update(c.sslbls)
    return tuple(ll for ll in self._line_labels if ll not in used)


def _delete_idling_lines(self):
    """A copy without idling lines (reference:
    Circuit.delete_idling_lines)."""
    idle = set(self.idling_lines())
    keep = tuple(ll for ll in self._line_labels if ll not in idle)
    return Circuit(self._layers, keep if keep else None)


def _reorder_lines(self, order):
    """A copy with line labels in the given order (reference:
    Circuit.reorder_lines).  The gates themselves are untouched (labels
    are absolute)."""
    assert set(order) == set(self._line_labels)
    return Circuit(self._layers, tuple(order))


def _parallelize(self):
    """Compress into as few layers as possible, moving gates earlier when
    their qubits are free (reference: Circuit.parallelize)."""
    new_layers = []   # list of lists of simple labels
    busy = []         # per new layer: set of occupied lines
    for l in self._layers:
        for c in _simple_components(l):
            if len(c) == 0:
                continue
            qubits = set(c.sslbls or self._line_labels)
            # find the latest layer whose successors are all free
            pos = len(new_layers)
            while pos > 0 and not (busy[pos - 1] & qubits):
                pos -= 1
            if pos == len(new_layers):
                new_layers.append([c])
                busy.append(set(qubits))
            else:
                new_layers[pos].append(c)
                busy[pos].update(qubits)
    final = tuple(lay[0] if len(lay) == 1 else LabelTupTup.init(tuple(lay))
                  for lay in new_layers)
    return Circuit(final, self._line_labels)


def _convert_to_openqasm(self, num_qubits=None, standard_gates_version='u3'):
    """OpenQASM 2.0 program text for this circuit (reference:
    Circuit.convert_to_openqasm)."""
    from pygsti_tpu.tools.internalgates import (
        standard_gatenames_openqasm_conversions)
    names, param_fns = standard_gatenames_openqasm_conversions(
        standard_gates_version)
    lls = [ll for ll in self._line_labels if ll != '*']
    if num_qubits is None:
        num_qubits = len(lls) if lls else 1
    qindex = {ll: i for i, ll in enumerate(lls)}
    lines = ['OPENQASM 2.0;', 'include "qelib1.inc";',
             'qreg q[%d];' % num_qubits, 'creg cr[%d];' % num_qubits]
    for layer in self._layers:
        for c in _simple_components(layer):
            if len(c) == 0:
                continue
            qs = ', '.join('q[%d]' % qindex.get(s, s) for s in (c.sslbls or ()))
            if c.name in param_fns and getattr(c, 'args', None):
                lines.append('%s %s;' % (param_fns[c.name](c.args), qs))
            elif c.name in names:
                for g in names[c.name]:
                    lines.append('%s %s;' % (g, qs))
            else:
                raise ValueError("No OpenQASM conversion for gate %r" % c.name)
    lines.append('measure q -> cr;')
    return '\n'.join(lines)


for _nm, _fn in [('num_gates', property(_num_gates)),
                 ('num_multiq_gates', property(_num_multiq_gates)),
                 ('num_nq_gates', _num_nq_gates),
                 ('two_q_gate_count', _two_q_gate_count),
                 ('append_circuit', _append_circuit),
                 ('prefix_circuit', _prefix_circuit),
                 ('insert_layer', _insert_layer),
                 ('delete_layers', _delete_layers),
                 ('delete_idle_layers', _delete_idle_layers),
                 ('replace_gatename', _replace_gatename),
                 ('replace_layer', _replace_layer),
                 ('layer', _layer),
                 ('layer_label', _layer_label),
                 ('idling_lines', _idling_lines),
                 ('delete_idling_lines', _delete_idling_lines),
                 ('reorder_lines', _reorder_lines),
                 ('parallelize', _parallelize),
                 ('convert_to_openqasm', _convert_to_openqasm)]:
    setattr(Circuit, _nm, _fn)


def validate_line_labels(linelabels):
    """Check that each line label round-trips through the circuit-string
    parser, so circuits over these lines can be serialized (reference:
    circuit.validate_line_labels:211)."""
    from pygsti_tpu.io.stdinput import StdInputParser
    parser = StdInputParser()
    for line_lbl in linelabels:
        if line_lbl == '*':
            continue
        test_str = 'Gi:%s' % line_lbl
        try:
            parsed = parser.parse_circuit(test_str)
            ok = str(parsed.layertup[0]) == test_str
        except Exception:
            ok = False
        if not ok:
            raise ValueError("Line label %r could not round-trip through "
                             "the circuit parser." % (line_lbl,))


class CompressedCircuit(object):
    """A Circuit compressed by factoring out periodic structure of its
    layer tuple -- useful for pickling large circuit lists; NOT usable in
    place of a Circuit (reference: circuit.CompressedCircuit:5106)."""

    def __init__(self, circuit, min_len_to_compress=20,
                 max_period_to_look_for=20):
        self._line_labels = circuit.line_labels
        self._str = circuit.str
        self._tup = CompressedCircuit.compress_op_label_tuple(
            circuit.layertup, min_len_to_compress, max_period_to_look_for)

    @staticmethod
    def compress_op_label_tuple(tup, min_len_to_compress=20,
                                max_period=20):
        """Compress a layer tuple by replacing maximal periodic runs with
        ('*REP*', block, reps) markers."""
        tup = tuple(tup)
        if len(tup) < min_len_to_compress:
            return tup
        out = []
        i = 0
        n = len(tup)
        while i < n:
            best = None  # (saved, period, reps)
            for p in range(1, min(max_period, (n - i) // 2) + 1):
                block = tup[i:i + p]
                reps = 1
                while tup[i + reps * p:i + (reps + 1) * p] == block:
                    reps += 1
                if reps > 1:
                    saved = p * (reps - 1)
                    if best is None or saved > best[0]:
                        best = (saved, p, reps)
            if best is not None and best[0] > 2:
                _, p, reps = best
                out.append(('*REP*', tup[i:i + p], reps))
                i += p * reps
            else:
                out.append(tup[i])
                i += 1
        return tuple(out)

    @staticmethod
    def expand_op_label_tuple(compressed_tup):
        """Inverse of :meth:`compress_op_label_tuple`."""
        out = []
        for item in compressed_tup:
            if isinstance(item, tuple) and len(item) == 3 \
               and item[0] == '*REP*':
                out.extend(item[1] * item[2])
            else:
                out.append(item)
        return tuple(out)

    def expand(self):
        """The original Circuit."""
        return Circuit(list(CompressedCircuit.expand_op_label_tuple(
            self._tup)), self._line_labels)


class SeparatePOVMCircuit(object):
    """A POVM-less circuit held together with its POVM label and effect
    labels -- the "expanded" form used when instrument/POVM labels are
    resolved to members (reference: circuit.SeparatePOVMCircuit:5281)."""

    def __init__(self, circuit_without_povm, povm_label, effect_labels):
        self.circuit_without_povm = circuit_without_povm
        self._povm_label = povm_label
        self._effect_labels = tuple(effect_labels)
        self._full_effect_labels = tuple(
            "%s_%s" % (povm_label, el) for el in self._effect_labels)

    @property
    def povm_label(self):
        return self._povm_label

    @property
    def effect_labels(self):
        return self._effect_labels

    @property
    def full_effect_labels(self):
        return self._full_effect_labels

    def __len__(self):
        return len(self.circuit_without_povm)

    def __str__(self):
        return "%s POVM=%s" % (self.circuit_without_povm.str,
                               self._povm_label)
