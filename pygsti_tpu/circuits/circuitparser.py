"""Parser for pyGSTi circuit-string syntax.

Grammar (subset of the reference's circuitparser,
pygsti/circuits/circuitparser/__init__.py:47, covering all strings produced
by the framework itself and the standard modelpacks):

  circuit   := '{}' [lineslbls] | seq [lineslbls]
  lineslbls := '@(' lbl (',' lbl)* ')' | '@*'
  seq       := item+
  item      := '(' seq ')' ['^' int] | '[' layer ']' ['^' int]
             | simple ['^' int]
  layer     := simple*                (possibly empty => global idle '[]')
  simple    := name (';' arg)* (':' sslbl)* ['!' time]
  name      := [a-zA-Z_][a-zA-Z0-9_]*  (e.g. Gxpi2, rho0, Mdefault, Gc12)
  sslbl     := int | ident
"""

from __future__ import annotations

import re

from pygsti_tpu.baseobjs.label import Label, LabelTupTup

_NAME_RE = re.compile(r'[a-zA-Z_][a-zA-Z0-9_]*')
# reference grammar (circuitparser): gates 'G[a-z0-9_]+', preps 'rho...',
# povms 'M[a-z0-9_]*', instruments 'I[a-z0-9_]*' -- an upper-case letter
# terminates the name so adjacent labels need no separator
_GATE_NAME_RE = re.compile(r'G[a-z0-9_]+|rho[a-z0-9_]*|M[a-z0-9_]*|I[a-z0-9_]*')
_INT_RE = re.compile(r'[0-9]+')
# state-space labels: an upper-case letter TERMINATES the label (it starts
# the next gate name), so 'Gxpi2:Q0Gxpi2:Q0' parses as two gates on Q0
_SSLBL_RE = re.compile(r'[a-zA-Z_][a-z0-9_]*')


class _Parser:
    def __init__(self, s):
        self.s = s
        self.i = 0
        self.n = len(s)

    def peek(self):
        return self.s[self.i] if self.i < self.n else ''

    def error(self, msg):
        raise ValueError("Circuit parse error at pos %d of %r: %s" % (self.i, self.s, msg))

    def parse_int(self):
        m = _INT_RE.match(self.s, self.i)
        if not m:
            self.error("expected integer")
        self.i = m.end()
        return int(m.group())

    def parse_name(self):
        # gate names follow the reference grammar 'G[a-z0-9_]+' (a capital
        # letter starts a NEW label, so 'GxGx' parses as two Gx gates;
        # reference: circuits/circuitparser docstring).  Similar prefixes:
        # rho<...> preps, M<...> povms, I<...> instruments.
        m = _GATE_NAME_RE.match(self.s, self.i)
        if not m:
            m = _NAME_RE.match(self.s, self.i)
        if not m:
            self.error("expected name")
        self.i = m.end()
        return m.group()

    def parse_sslbl(self):
        m = _INT_RE.match(self.s, self.i)
        if m:
            self.i = m.end()
            return int(m.group())
        m = _SSLBL_RE.match(self.s, self.i)
        if m:
            self.i = m.end()
            return m.group()
        self.error("expected state-space label")

    def parse_simple(self):
        name = self.parse_name()
        args = []
        sslbls = []
        while self.peek() == ';':
            self.i += 1
            # args may be numbers or names
            m = re.match(r'[-+0-9.eE]+|[a-zA-Z_][a-zA-Z0-9_]*', self.s[self.i:])
            if not m:
                self.error("expected label arg")
            args.append(m.group())
            self.i += m.end()
        while self.peek() == ':':
            self.i += 1
            sslbls.append(self.parse_sslbl())
        if self.peek() == '!':  # time suffix: parse and ignore (time-tagged labels)
            self.i += 1
            m = re.match(r'[-+0-9.eE]+', self.s[self.i:])
            self.i += m.end()
        if args:
            return Label(name, tuple(sslbls), args=tuple(args))
        if sslbls:
            return Label(name, tuple(sslbls))
        return Label(name)

    def parse_layer_contents(self):
        comps = []
        while self.peek() not in (']', ''):
            comps.append(self.parse_simple())
        return comps

    def parse_item(self):
        """Returns a list of layer labels."""
        c = self.peek()
        if c == '{':
            # '{}' = the empty circuit (no layers); appears bare or inside
            # parens, e.g. '({})@(0)' (reference: circuitparser grammar)
            if self.s[self.i:self.i + 2] != '{}':
                self.error("expected '{}'")
            self.i += 2
            return []
        if c == '(':
            self.i += 1
            layers = self.parse_seq(stop=')')
            if self.peek() != ')':
                self.error("expected ')'")
            self.i += 1
            reps = self.parse_reps()
            return layers * reps
        if c == '[':
            self.i += 1
            comps = self.parse_layer_contents()
            if self.peek() != ']':
                self.error("expected ']'")
            self.i += 1
            reps = self.parse_reps()
            if len(comps) == 1:
                layer = comps[0]
            else:
                layer = LabelTupTup.init(tuple(comps))
            return [layer] * reps
        # simple label
        lbl = self.parse_simple()
        reps = self.parse_reps()
        return [lbl] * reps

    def parse_reps(self):
        if self.peek() == '^':
            self.i += 1
            return self.parse_int()
        return 1

    def parse_seq(self, stop=None):
        layers = []
        while True:
            c = self.peek()
            if c == '' or c == '@' or (stop and c == stop):
                break
            layers.extend(self.parse_item())
        return layers

    def parse_line_labels(self):
        assert self.peek() == '@'
        self.i += 1
        if self.peek() == '*':
            self.i += 1
            return ('*',)
        if self.peek() != '(':
            self.error("expected '(' after '@'")
        self.i += 1
        lbls = []
        while self.peek() != ')':
            lbls.append(self.parse_sslbl())
            if self.peek() == ',':
                self.i += 1
        self.i += 1
        return tuple(lbls)


_native = None
_native_checked = False


def _get_native():
    global _native, _native_checked
    if not _native_checked:
        _native_checked = True
        from pygsti_tpu.ops import load_fastparser
        _native = load_fastparser()
    return _native


def _native_layers_to_labels(raw_layers):
    out = []
    for item in raw_layers:
        if len(item) > 0 and isinstance(item[0], str):
            out.append(Label(item[0], tuple(item[1:])) if len(item) > 1
                       else Label(item[0]))
        else:  # composite layer (tuple of simple tuples) or empty-layer ()
            comps = tuple(Label(c[0], tuple(c[1:])) if len(c) > 1 else Label(c[0])
                          for c in item)
            out.append(LabelTupTup.init(comps))
    return tuple(out)


import functools


@functools.lru_cache(maxsize=262144)
def parse_circuit_str(s):
    """Parse a circuit string -> (tuple_of_layer_labels, line_labels_or_None).

    Results are memoized (circuit strings repeat heavily across designs and
    datasets).  A native C++ parser (pygsti_tpu/ops/fastcircuitparser.cpp)
    is available via `_get_native()` and used by bulk-IO paths; the default
    path is the pure-Python parser, whose interned-label construction is
    faster for typical short strings."""
    s = s.strip()
    p = _Parser(s)
    if p.s.startswith('{}'):
        p.i = 2
        layers = []
    else:
        layers = p.parse_seq()
    line_labels = None
    if p.peek() == '@':
        line_labels = p.parse_line_labels()
    if p.i != p.n:
        p.error("trailing characters")
    return tuple(layers), line_labels


def parse_label_str(s):
    """Parse a single label string like 'Gxpi2:0' or '[Gxpi2:0Gypi2:1]'."""
    layers, _ = parse_circuit_str(s)
    if len(layers) != 1:
        raise ValueError("Expected a single label, got %d layers from %r" % (len(layers), s))
    return layers[0]
