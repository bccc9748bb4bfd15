"""Instruments (mid-circuit measurements): named collections of CP maps
summing to a TP map (reference: pygsti/modelmembers/instruments/)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from pygsti_tpu.modelmembers.modelmember import ModelMember


class Instrument(ModelMember):
    """An instrument: ordered dict of member operations (one per outcome).
    Dense rep: stack [n_members, dim, dim]."""

    def __init__(self, member_ops):
        items = list(member_ops.items() if isinstance(member_ops, dict) else member_ops)
        self.member_labels = [str(k) for k, _ in items]
        self.members = [v for _, v in items]
        self._dim = self.members[0].dim
        super().__init__(np.empty(0))

    @property
    def dim(self):
        return self._dim

    @property
    def num_members(self):
        return len(self.members)

    @property
    def num_params(self):
        return sum(m.num_params for m in self.members)

    def to_vector(self):
        vecs = [m.to_vector() for m in self.members]
        return np.concatenate(vecs) if vecs else np.empty(0)

    def from_vector(self, v, close=False, dirty_value=True):
        off = 0
        for m in self.members:
            n = m.num_params
            m.from_vector(v[off:off + n])
            off += n

    def to_dense_jax(self, v):
        mats = []
        off = 0
        for m in self.members:
            n = m.num_params
            mats.append(m.to_dense_jax(v[off:off + n]))
            off += n
        return jnp.stack(mats)

    def keys(self):
        return list(self.member_labels)

    def items(self):
        return list(zip(self.member_labels, self.members))

    def __getitem__(self, lbl):
        return self.members[self.member_labels.index(str(lbl))]

    def __len__(self):
        return len(self.members)


class TPInstrument(Instrument):
    """An instrument whose members sum to a trace-preserving map, enforced by
    construction (reference: instruments/tpinstrument.py:27 TPInstrument,
    tpinstrumentop.py).

    Parameterization: the TOTAL map M_T = sum_i M_i is a FullTPOp (first row
    fixed) and members 1..n-1 are fully parameterized; member 0 is the
    derived quantity M_T - sum_{i>0} M_i, so the TP-sum constraint holds for
    every parameter value."""

    def __init__(self, member_ops):
        from pygsti_tpu.modelmembers.operations import (FullTPOp,
                                                        FullArbitraryOp)
        items = list(member_ops.items() if isinstance(member_ops, dict)
                     else member_ops)
        self.member_labels = [str(k) for k, _ in items]
        dense = [np.asarray(v.to_dense() if hasattr(v, 'to_dense') else v,
                            float) for _, v in items]
        total = np.sum(dense, axis=0)
        d = total.shape[0]
        assert np.allclose(total[0], np.eye(d)[0], atol=1e-6), \
            "TPInstrument members must sum to a TP map"
        self._total_op = FullTPOp(total)
        self._free_members = [FullArbitraryOp(m) for m in dense[1:]]
        self.members = [None] + self._free_members  # member 0 is derived
        self._dim = d
        ModelMember.__init__(self, np.empty(0))

    @property
    def num_params(self):
        return self._total_op.num_params + sum(m.num_params
                                               for m in self._free_members)

    def to_vector(self):
        vecs = [self._total_op.to_vector()] + [m.to_vector()
                                               for m in self._free_members]
        return np.concatenate(vecs)

    def from_vector(self, v, close=False, dirty_value=True):
        off = self._total_op.num_params
        self._total_op.from_vector(v[:off])
        for m in self._free_members:
            n = m.num_params
            m.from_vector(v[off:off + n])
            off += n

    def to_dense_jax(self, v):
        off = self._total_op.num_params
        total = self._total_op.to_dense_jax(v[:off])
        mats = []
        for m in self._free_members:
            n = m.num_params
            mats.append(m.to_dense_jax(v[off:off + n]))
            off += n
        m0 = total - (jnp.sum(jnp.stack(mats), axis=0) if mats else 0.0)
        return jnp.stack([m0] + mats)

    def __getitem__(self, lbl):
        i = self.member_labels.index(str(lbl))
        import jax.numpy as _jnp
        dense = np.asarray(self.to_dense_jax(_jnp.asarray(self.to_vector())))
        from pygsti_tpu.modelmembers.operations import StaticArbitraryOp
        return StaticArbitraryOp(dense[i])
