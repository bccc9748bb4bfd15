"""Operation factories: families of operations indexed by circuit-label
arguments (reference: pygsti/modelmembers/operations/opfactory.py:81
OpFactory, :253 EmbeddedOpFactory, :409 EmbeddingOpFactory, :587
ComposedOpFactory, :771 UnitaryOpFactory).

A factory maps label args (e.g. the ``0.347`` in ``Gzr;0.347:0``) to a
concrete operation.  Created operations are static (0-parameter) members, so
they stack into the model's tensors like any other leaf; continuously
parameterized *model* parameters should instead use a parameterized op class.
"""

from __future__ import annotations

import numpy as np

from pygsti_tpu.modelmembers.modelmember import ModelMember
from pygsti_tpu.modelmembers.operations import (StaticArbitraryOp,
                                                ComposedOp, EmbeddedOp)
from pygsti_tpu.tools import optools as _ot


class OpFactory(ModelMember):
    """Base class: subclasses implement ``create_object(args, sslbls)``."""

    def __init__(self, dim):
        super().__init__(np.empty(0))
        self._dim = dim

    @property
    def dim(self):
        return self._dim

    def create_object(self, args=None, sslbls=None):
        raise NotImplementedError("Derived classes should implement this!")

    def create_op(self, args=None, sslbls=None):
        """Create the operation for `args` (list of label arguments)."""
        return self.create_object(args, sslbls)


class UnitaryOpFactory(OpFactory):
    """Factory from a function ``f(args) -> unitary`` (reference:
    opfactory.py:771)."""

    def __init__(self, fn, udim, superop_basis='pp'):
        super().__init__(udim ** 2)
        self.fn = fn
        self.basis = superop_basis

    def create_object(self, args=None, sslbls=None):
        U = np.asarray(self.fn(args), complex)
        return StaticArbitraryOp(_ot.unitary_to_superop(U, self.basis))


class EmbeddedOpFactory(OpFactory):
    """Factory whose created ops are embedded into a larger state space
    (reference: opfactory.py:253)."""

    def __init__(self, state_space, target_labels, factory_to_embed):
        from pygsti_tpu.baseobjs.statespace import StateSpace
        self.state_space = state_space
        self.target_labels = tuple(target_labels)
        self.embedded_factory = factory_to_embed
        super().__init__(state_space.dim)

    def create_object(self, args=None, sslbls=None):
        op = self.embedded_factory.create_object(args, None)
        return EmbeddedOp(self.state_space, self.target_labels, op)


class EmbeddingOpFactory(OpFactory):
    """Factory that embeds on whatever target labels the *label* specifies
    (the sslbls come from the circuit layer, not construction time;
    reference: opfactory.py:409)."""

    def __init__(self, state_space, factory_or_op_to_embed):
        self.state_space = state_space
        self.embedded = factory_or_op_to_embed
        super().__init__(state_space.dim)

    def create_object(self, args=None, sslbls=None):
        assert sslbls is not None, \
            "EmbeddingOpFactory requires the layer label to supply sslbls"
        if isinstance(self.embedded, OpFactory):
            op = self.embedded.create_object(args, None)
        else:
            op = self.embedded
        return EmbeddedOp(self.state_space, tuple(sslbls), op)


class ComposedOpFactory(OpFactory):
    """Factory composing fixed ops and/or factories (reference:
    opfactory.py:587)."""

    def __init__(self, factories_or_ops, dim=None):
        self.factors = list(factories_or_ops)
        if dim is None:
            dim = next(f.dim for f in self.factors)
        super().__init__(dim)

    def create_object(self, args=None, sslbls=None):
        ops = [f.create_object(args, sslbls) if isinstance(f, OpFactory) else f
               for f in self.factors]
        return ComposedOp(ops)
