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
    """An instrument whose members sum to a TP map.  Parameterized like the
    reference's TPInstrument (tpinstrument.py:27): all members free except the
    constraint is enforced at construction; the TP-sum constraint is enforced
    by parameterizing member_0 = TP_total - sum(others).

    Simplified: we parameterize members directly and rely on construction
    for the constraint; full constraint enforcement comes with GST support
    for instruments."""
    pass
