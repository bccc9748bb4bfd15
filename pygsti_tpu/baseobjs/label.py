"""Circuit-layer labels.

A ``Label`` identifies one operation (or one layer of parallel operations)
within a circuit.  This mirrors the polymorphic label system of the reference
(pygsti/baseobjs/label.py:163) but with a deliberately smaller surface:

* ``LabelTup``   -- a gate name plus the state-space (qubit) labels it acts on,
                    e.g. ``Label('Gxpi2', 0)`` <-> ``"Gxpi2:0"``.
* ``LabelStr``   -- a bare name with no state-space labels, e.g. ``Label('rho0')``.
* ``LabelTupTup``-- a layer of parallel simple labels, e.g.
                    ``Label([('Gxpi2',0), ('Gypi2',1)])``; the empty layer
                    ``Label(())`` is the global idle, printed ``"[]"``.

Labels are immutable, hashable, compare equal to equivalent plain
tuples/strings (like the reference's tuple-subclass design), and are usable
as dict keys in models.
"""

from __future__ import annotations


class Label(object):
    """Factory: dispatches to LabelTup / LabelStr / LabelTupTup.

    Accepts the same core input shapes as the reference Label factory
    (pygsti/baseobjs/label.py:163): a name string with optional state-space
    labels, a (name, *sslbls) tuple, a list/tuple of sub-labels (a layer),
    or an existing Label (returned unchanged).
    """

    def __new__(cls, name, state_space_labels=None, time=None, args=None):
        if isinstance(name, (LabelTup, LabelStr, LabelTupTup)):
            return name

        if state_space_labels is not None:
            if isinstance(state_space_labels, (int, str)):
                state_space_labels = (state_space_labels,)
            return LabelTup.init(name, tuple(state_space_labels), args)

        if isinstance(name, str):
            return LabelStr(name)

        if isinstance(name, (tuple, list)):
            if len(name) == 0:
                return LabelTupTup.init(())
            first = name[0]
            if isinstance(first, str):
                # (name, sslbl0, sslbl1, ...) form
                return LabelTup.init(first, tuple(name[1:]), args)
            # iterable of sub-labels => layer label
            return LabelTupTup.init(tuple(Label(sub) for sub in name))

        raise ValueError("Cannot create Label from %r" % (name,))


def _sslbl_str(sslbl):
    return str(sslbl)


_label_intern = {}


class LabelTup(tuple):
    """A simple label: (name, *state_space_labels). Compares equal to the raw
    tuple.  Simple labels are interned: circuits repeat the same few labels
    millions of times, so construction hits a dict instead of allocating."""

    __slots__ = ()

    @classmethod
    def init(cls, name, sslbls, args=None):
        if args:
            return LabelTupWithArgs.init(name, sslbls, args)
        if len(sslbls) == 0:
            return LabelStr(name)
        key = (name,) + tuple(sslbls)
        cached = _label_intern.get(key)
        if cached is None:
            cached = cls.__new__(cls, key)
            _label_intern[key] = cached
        return cached

    def __new__(cls, tup):
        return tuple.__new__(cls, tup)

    @property
    def name(self):
        return self[0]

    @property
    def sslbls(self):
        return tuple(self[1:])

    @property
    def qubits(self):
        return self.sslbls

    @property
    def args(self):
        return ()

    @property
    def components(self):
        return (self,)

    @property
    def is_simple(self):
        return True

    @property
    def num_qubits(self):
        return len(self.sslbls)

    @property
    def depth(self):
        return 1

    def map_state_space_labels(self, mapper):
        m = mapper.__getitem__ if hasattr(mapper, '__getitem__') else mapper
        return LabelTup.init(self.name, tuple(m(s) for s in self.sslbls))

    def __str__(self):
        return self.name + ":" + ":".join(_sslbl_str(s) for s in self.sslbls)

    def __repr__(self):
        return "Label(%s)" % str(tuple(self))

    def __add__(self, other):
        raise TypeError("Cannot add Labels")

    def __reduce__(self):
        return (LabelTup, (tuple(self),))


class LabelTupWithArgs(LabelTup):
    """A simple label carrying extra (non-state-space) arguments.

    Stored as (name, ';', arg0, ..., *sslbls) marker form is avoided; instead
    we store (name, *sslbls) and keep args out-of-band is impossible for a
    tuple subclass, so we store ('@ARGS', name, args_tuple, sslbls_tuple).
    """

    __slots__ = ()

    @classmethod
    def init(cls, name, sslbls, args):
        return cls.__new__(cls, ('@ARGS', name, tuple(args), tuple(sslbls)))

    @property
    def name(self):
        return self[1]

    @property
    def args(self):
        return self[2]

    @property
    def sslbls(self):
        return self[3]

    def __str__(self):
        s = self.name + ";" + ";".join(str(a) for a in self.args)
        if self.sslbls:
            s += ":" + ":".join(_sslbl_str(x) for x in self.sslbls)
        return s

    def __repr__(self):
        return "Label(%s, args=%s)" % (str((self.name,) + self.sslbls), self.args)

    def __reduce__(self):
        return (LabelTupWithArgs.init, (self.name, self.sslbls, self.args))


class LabelStr(str):
    """A label that is just a name (no state-space labels), e.g. 'rho0'."""

    __slots__ = ()

    @property
    def name(self):
        return str(self)

    @property
    def sslbls(self):
        return None

    @property
    def qubits(self):
        return None

    @property
    def args(self):
        return ()

    @property
    def components(self):
        return (self,)

    @property
    def is_simple(self):
        return True

    @property
    def depth(self):
        return 1

    def map_state_space_labels(self, mapper):
        return self

    def __repr__(self):
        return "Label('%s')" % str(self)

    def __reduce__(self):
        return (LabelStr, (str(self),))


class LabelTupTup(tuple):
    """A layer label: a tuple of parallel simple labels. ``Label(())`` is the
    empty layer (global idle), printed as ``[]``."""

    __slots__ = ()

    @classmethod
    def init(cls, component_labels):
        return cls.__new__(cls, tuple(component_labels))

    def __new__(cls, tup):
        return tuple.__new__(cls, tup)

    @property
    def name(self):
        return "COMPOUND"

    @property
    def sslbls(self):
        if len(self) == 0:
            return None
        s = []
        for comp in self:
            if comp.sslbls is None:
                return None
            s.extend(comp.sslbls)
        return tuple(s)

    @property
    def qubits(self):
        return self.sslbls

    @property
    def args(self):
        return ()

    @property
    def components(self):
        return tuple(self)

    @property
    def is_simple(self):
        return False

    @property
    def depth(self):
        return 1

    def map_state_space_labels(self, mapper):
        return LabelTupTup.init(tuple(c.map_state_space_labels(mapper) for c in self))

    def __str__(self):
        if len(self) == 0:
            return "[]"
        return "[" + "".join(str(c) for c in self) + "]"

    def __repr__(self):
        return "Label(%s)" % str(self)

    def __reduce__(self):
        return (LabelTupTup, (tuple(self),))


class LabelTupWithTime(LabelTup):
    """A simple label with a (relative) start time (reference:
    label.LabelTupWithTime:?).  Stored as ('@TIME', name, time, sslbls)."""

    __slots__ = ()

    @classmethod
    def init(cls, name, sslbls, time=0.0):
        return cls.__new__(cls, ('@TIME', name, float(time), tuple(sslbls)))

    @property
    def name(self):
        return self[1]

    @property
    def time(self):
        return self[2]

    @property
    def sslbls(self):
        return self[3]

    @property
    def args(self):
        return ()

    def __str__(self):
        s = self.name
        if self.sslbls:
            s += ":" + ":".join(_sslbl_str(x) for x in self.sslbls)
        if self.time != 0.0:
            s += "!%g" % self.time
        return s

    def __repr__(self):
        return "Label(%s, time=%g)" % (str((self.name,) + self.sslbls),
                                       self.time)

    def __reduce__(self):
        return (LabelTupWithTime.init, (self.name, self.sslbls, self.time))


class LabelTupTupWithTime(LabelTupTup):
    """A layer label with a start time (reference:
    label.LabelTupTupWithTime).  Stored as (('@TTIME', time), *components)."""

    __slots__ = ()

    @classmethod
    def init(cls, component_labels, time=0.0):
        return cls.__new__(cls, (('@TTIME', float(time)),)
                           + tuple(component_labels))

    @property
    def time(self):
        return self[0][1]

    @property
    def components(self):
        return tuple(self[1:])

    @property
    def sslbls(self):
        s = []
        for comp in self.components:
            if comp.sslbls is None:
                return None
            s.extend(comp.sslbls)
        return tuple(s) if s else None

    def __str__(self):
        if len(self.components) == 0:
            return "[]"
        return "[" + "".join(str(c) for c in self.components) + "]"

    def __reduce__(self):
        return (LabelTupTupWithTime.init, (self.components, self.time))


class LabelTupTupWithArgs(LabelTupTup):
    """A layer label that itself carries arguments, in addition to any
    arguments of its component labels (reference:
    label.LabelTupTupWithArgs:?).  Stored as ('@LARGS', args, *components)."""

    __slots__ = ()

    @classmethod
    def init(cls, component_labels, args):
        return cls.__new__(cls, (('@LARGS',) + tuple(args),)
                           + tuple(component_labels))

    @property
    def args(self):
        return tuple(self[0][1:])

    @property
    def components(self):
        return tuple(self[1:])

    @property
    def sslbls(self):
        s = []
        for comp in self.components:
            if comp.sslbls is None:
                return None
            s.extend(comp.sslbls)
        return tuple(s) if s else None

    def __str__(self):
        return "[" + "".join(str(c) for c in self.components) + ";" + \
            ";".join(str(a) for a in self.args) + "]"

    def __reduce__(self):
        return (LabelTupTupWithArgs.init, (self.components, self.args))


class CircuitLabel(tuple):
    """A sub-circuit as a single (repeatable) layer label: a named box
    around a tuple of layer labels, optionally exponentiated (reference:
    label.CircuitLabel:1419).  Stored as (name, sslbls, reps, *layers)."""

    __slots__ = ()
    IS_SIMPLE = True

    def __new__(cls, name, tup_of_layers, state_space_labels, reps=1,
                time=None):
        sslbls = tuple(state_space_labels) \
            if state_space_labels is not None else None
        return tuple.__new__(cls, (str(name), sslbls, int(reps))
                             + tuple(tup_of_layers))

    @property
    def name(self):
        return self[0]

    @property
    def sslbls(self):
        return self[1]

    @property
    def reps(self):
        return self[2]

    @property
    def components(self):
        return self[3:]

    @property
    def args(self):
        return ()

    @property
    def time(self):
        return 0.0

    @property
    def qubits(self):
        return self.sslbls

    @property
    def is_simple(self):
        return True

    @property
    def depth(self):
        return sum(getattr(layer, 'depth', 1)
                   for layer in self.components) * self.reps

    def expand_subcircuits(self):
        """The tuple of layer labels this circuit label represents."""
        return self.components * self.reps

    def map_state_space_labels(self, mapper):
        return CircuitLabel(
            self.name,
            tuple(c.map_state_space_labels(mapper) for c in self.components),
            tuple(mapper[x] if not callable(mapper) else mapper(x)
                  for x in self.sslbls) if self.sslbls else None,
            self.reps)

    def __str__(self):
        body = "".join(str(c) for c in self.components)
        s = (self.name if self.name else "") + "(" + body + ")"
        if self.reps != 1:
            s += "^%d" % self.reps
        return s

    def __repr__(self):
        return "CircuitLabel(%r, %s, %s, %d)" % (
            self.name, self.components, self.sslbls, self.reps)

    def __reduce__(self):
        return (CircuitLabel, (self.name, self.components, self.sslbls,
                               self.reps))
