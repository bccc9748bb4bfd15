"""Model base classes: flat parameter vector + pure tensor-compute function.

The reference Model/OpModel (pygsti/models/model.py:46,397) owns a flat
``_paramvec`` with each member claiming a slice via ``gpindices``; the same
contract holds here, but the compute path is inverted: instead of lazily
mutating member objects, a Model compiles a *pure function*
``tensors_fn: v -> {'ops': [K,d,d], 'preps': [R,d], 'effects': [E,d]}``
that forward simulators trace under jit (so d(probs)/d(theta) is one jacfwd).
"""

from __future__ import annotations

import collections

import numpy as np

from pygsti_tpu.baseobjs.statespace import StateSpace
from pygsti_tpu.baseobjs.basis import Basis
from pygsti_tpu.baseobjs.label import Label


class Model(object):
    """Base model: parameter-vector owner."""

    def __init__(self, state_space):
        self.state_space = StateSpace.cast(state_space)
        self._paramvec = np.empty(0)
        self._need_rebuild = True

    @property
    def dim(self):
        return self.state_space.dim

    @property
    def num_params(self):
        self._rebuild_paramvec_if_needed()
        return len(self._paramvec)

    def to_vector(self):
        self._rebuild_paramvec_if_needed()
        return self._paramvec.copy()

    def from_vector(self, v, close=False):
        self._rebuild_paramvec_if_needed()
        v = np.asarray(v, dtype=float)
        assert len(v) == len(self._paramvec), \
            "Wrong vector length: %d != %d" % (len(v), len(self._paramvec))
        self._paramvec = v.copy()
        self._push_paramvec_to_members()

    def _rebuild_paramvec_if_needed(self):
        if self._need_rebuild:
            self._rebuild_paramvec()
            self._need_rebuild = False

    def _rebuild_paramvec(self):
        raise NotImplementedError()

    def _push_paramvec_to_members(self):
        raise NotImplementedError()

    def probabilities(self, circuit, clip_to=None):
        raise NotImplementedError()

    def copy(self):
        import copy
        return copy.deepcopy(self)

    def create_modelmember_graph(self):
        """Dependency graph of this model's members, for structural
        comparison via is_similar/is_equivalent (reference:
        model.create_modelmember_graph)."""
        from pygsti_tpu.modelmembers.modelmembergraph import ModelMemberGraph
        return ModelMemberGraph.from_model(self)


class OpModel(Model):
    """A model with member dicts (preps/povms/operations/instruments)."""

    def __init__(self, state_space, basis='pp', simulator='auto'):
        super().__init__(state_space)
        self.basis = Basis.cast(basis, self.state_space.dim) if isinstance(basis, str) else basis
        self._sim = None
        self._sim_type = simulator
        # optional linear map model-params -> member-params (reference:
        # model.param_interposer / modelparaminterposer.LinearInterposer),
        # used by FOGI reparameterization
        self.param_interposer = None

    # -- simulator pairing (reference: forwardsim.py:141-152) ----------------
    @property
    def sim(self):
        if self._sim is None:
            from pygsti_tpu.forwardsims.forwardsim import create_forward_simulator
            self._sim = create_forward_simulator(self._sim_type, self)
        return self._sim

    @sim.setter
    def sim(self, new_sim):
        new_sim.model = self
        self._sim = new_sim

    # -- member iteration (order defines paramvec layout; matches reference
    #    ExplicitOpModel: preps, povms, operations, instruments) -------------
    def _iter_parameterized_objs(self):
        raise NotImplementedError()

    def _rebuild_paramvec(self):
        off = 0
        vecs = []
        for _, obj in self._iter_parameterized_objs():
            n = obj.num_params
            obj.gpindices = slice(off, off + n)
            vecs.append(obj.to_vector())
            off += n
        w = np.concatenate(vecs) if vecs else np.empty(0)
        ip = getattr(self, 'param_interposer', None)
        self._paramvec = w if ip is None \
            else ip.ops_paramvec_to_model_paramvec(w)

    def _push_paramvec_to_members(self):
        ip = getattr(self, 'param_interposer', None)
        w = self._paramvec if ip is None \
            else ip.model_paramvec_to_ops_paramvec(self._paramvec)
        for _, obj in self._iter_parameterized_objs():
            obj.from_vector(w[obj.gpindices])

    def _mark_for_rebuild(self):
        self._need_rebuild = True
        self._clear_compiled()

    def _clear_compiled(self):
        pass
