"""Elementary error-generator labels: local and global string conventions
(reference: pygsti/baseobjs/errorgenlabel.py).

Two interchangeable spellings of "an H/S/C/A elementary error generator":

* ``LocalElementaryErrorgenLabel('S', ('XI',))`` -- basis-element labels are
  full-width Pauli strings over an implicit qubit ordering.
* ``GlobalElementaryErrorgenLabel('S', ('X',), (0,))`` -- basis-element
  labels cover only the support, named explicitly by state-space labels.
"""

from __future__ import annotations


class ElementaryErrorgenLabel(object):
    """Base class for elementary errorgen labels."""


class LocalElementaryErrorgenLabel(ElementaryErrorgenLabel):
    """Label with full-width basis-element strings (reference:
    errorgenlabel.LocalElementaryErrorgenLabel:25)."""

    @classmethod
    def cast(cls, obj, sslbls=None, identity_label='I'):
        if isinstance(obj, cls):
            return obj
        if isinstance(obj, GlobalElementaryErrorgenLabel):
            assert sslbls is not None, \
                "sslbls needed to convert a global label to a local one"
            return cls(obj.errorgen_type,
                       obj.padded_basis_element_labels(sslbls, identity_label))
        if isinstance(obj, (tuple, list)):
            return cls(obj[0], tuple(obj[1:]) if not isinstance(obj[1], (tuple, list))
                       else tuple(obj[1]))
        if isinstance(obj, str):
            typ, rest = obj[0], obj[1:].strip('()')
            return cls(typ, tuple(p for p in rest.split(',') if p))
        raise ValueError("Cannot cast %r to %s" % (obj, cls.__name__))

    def __init__(self, errorgen_type, basis_element_labels):
        self.errorgen_type = str(errorgen_type)
        self.basis_element_labels = tuple(basis_element_labels)

    def __hash__(self):
        return hash((self.errorgen_type, self.basis_element_labels))

    def __eq__(self, other):
        return isinstance(other, LocalElementaryErrorgenLabel) \
            and self.errorgen_type == other.errorgen_type \
            and self.basis_element_labels == other.basis_element_labels

    def __str__(self):
        return "%s(%s)" % (self.errorgen_type,
                           ",".join(map(str, self.basis_element_labels)))

    def __repr__(self):
        return str(self)

    def support_indices(self, identity_label='I'):
        """Indices where any basis-element label is non-identity."""
        out = []
        n = len(self.basis_element_labels[0])
        for i in range(n):
            if any(bel[i] != identity_label
                   for bel in self.basis_element_labels):
                out.append(i)
        return tuple(out)


class GlobalElementaryErrorgenLabel(ElementaryErrorgenLabel):
    """Label with support-only basis elements + explicit state-space labels
    (reference: errorgenlabel.GlobalElementaryErrorgenLabel:152)."""

    @classmethod
    def cast(cls, obj, sslbls=None, identity_label='I'):
        if isinstance(obj, cls):
            return obj
        if isinstance(obj, LocalElementaryErrorgenLabel):
            assert sslbls is not None, \
                "sslbls needed to convert a local label to a global one"
            support = obj.support_indices(identity_label)
            if not support:
                support = (0,)
            bels = tuple(''.join(bel[i] for i in support)
                         for bel in obj.basis_element_labels)
            return cls(obj.errorgen_type, bels,
                       tuple(sslbls[i] for i in support))
        if isinstance(obj, (tuple, list)):
            return cls(obj[0], tuple(obj[1]), tuple(obj[2]))
        raise ValueError("Cannot cast %r to %s" % (obj, cls.__name__))

    def __init__(self, errorgen_type, basis_element_labels, sslbls, sort=True):
        self.errorgen_type = str(errorgen_type)
        bels = tuple(basis_element_labels)
        sslbls = tuple(sslbls)
        if sort and len(sslbls) > 1:
            order = sorted(range(len(sslbls)), key=lambda i: str(sslbls[i]))
            sslbls = tuple(sslbls[i] for i in order)
            bels = tuple(''.join(b[i] for i in order) for b in bels)
        self.basis_element_labels = bels
        self.sslbls = sslbls

    def __hash__(self):
        return hash((self.errorgen_type, self.basis_element_labels, self.sslbls))

    def __eq__(self, other):
        return isinstance(other, GlobalElementaryErrorgenLabel) \
            and self.errorgen_type == other.errorgen_type \
            and self.basis_element_labels == other.basis_element_labels \
            and self.sslbls == other.sslbls

    def __str__(self):
        return "%s(%s:%s)" % (self.errorgen_type,
                              ",".join(map(str, self.basis_element_labels)),
                              ",".join(map(str, self.sslbls)))

    def __repr__(self):
        return str(self)

    @property
    def support(self):
        return self.sslbls

    def padded_basis_element_labels(self, all_sslbls, identity_label='I'):
        """Full-width basis-element strings over `all_sslbls`."""
        idx = {s: i for i, s in enumerate(all_sslbls)}
        out = []
        for bel in self.basis_element_labels:
            chars = [identity_label] * len(all_sslbls)
            for ch, s in zip(bel, self.sslbls):
                chars[idx[s]] = ch
            out.append(''.join(chars))
        return tuple(out)

    def map_state_space_labels(self, mapper):
        m = mapper if callable(mapper) else (lambda s: mapper[s])
        return GlobalElementaryErrorgenLabel(
            self.errorgen_type, self.basis_element_labels,
            tuple(m(s) for s in self.sslbls))
