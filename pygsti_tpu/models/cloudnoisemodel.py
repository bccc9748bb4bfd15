"""Cloud-noise implicit models (reference: pygsti/models/cloudnoisemodel.py:46).

Each gate's noise acts on a "cloud" of qubits within `maxhops` of its
targets, parameterized by Lindblad error generators restricted to low-weight
terms.  Built on the LocalNoiseModel leaf/recipe machinery: each gate gets
an extra cloud-noise leaf (an exp-errorgen on the cloud qubits) appended to
its layer recipe, and the empty layer gets a global idle errorgen.
"""

from __future__ import annotations

import collections

import numpy as np

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.baseobjs.basis import Basis
from pygsti_tpu.models.localnoisemodel import LocalNoiseModel
from pygsti_tpu.modelmembers import operations as _op
from pygsti_tpu.modelmembers import states as _st
from pygsti_tpu.modelmembers import povms as _pv
from pygsti_tpu.tools import optools as _ot


class CloudNoiseModel(LocalNoiseModel):
    """Implicit model with per-gate cloud-noise exp-errorgen factors."""

    def __init__(self, processor_spec, gate_members, prep_member, povm_member,
                 cloud_members_by_targets, cloud_members_blk, basis='pp',
                 simulator='auto', idle_member=None):
        # cloud_members_by_targets: {(gate_leaf_key, targets):
        #                            (cloud_leaf_key, cloud_qubits)}
        self._cloud_map_by_targets = dict(cloud_members_by_targets)
        self._pending_cloud_blk = collections.OrderedDict(cloud_members_blk)
        super().__init__(processor_spec, gate_members, prep_member, povm_member,
                         basis, simulator, idle_member)
        self.operation_blks['cloudnoise'] = self._pending_cloud_blk
        del self._pending_cloud_blk

    def _iter_parameterized_objs(self):
        yield from super()._iter_parameterized_objs()
        blk = self.operation_blks.get('cloudnoise',
                                      getattr(self, '_pending_cloud_blk', {}))
        for key, obj in blk.items():
            yield key, obj

    def register_layer(self, layer_lbl):
        if layer_lbl in self._layer_index:
            return self._layer_index[layer_lbl]
        idx = super().register_layer(layer_lbl)
        # append cloud-noise factors for each component gate
        recipe = self._layer_recipes[idx]
        comps = layer_lbl.components if not layer_lbl.is_simple else (layer_lbl,)
        extra = []
        for comp in comps:
            try:
                leaf = self._leaf_for(comp)
            except KeyError:
                continue
            tkey = (leaf, tuple(comp.sslbls or ()))
            if tkey in self._cloud_map_by_targets:
                cloud_key, cloud_targets = self._cloud_map_by_targets[tkey]
                extra.append((('__cloud__', cloud_key), cloud_targets))
        recipe.extend(extra)
        return idx

    def tensors_fn(self):
        # extend the leaf table with cloud members, then delegate
        self._rebuild_paramvec_if_needed()
        base_compute = None  # built inline below (mirror of LocalNoiseModel)
        import jax.numpy as jnp
        from pygsti_tpu.models.localnoisemodel import _embed_info
        from pygsti_tpu.models.explicitmodel import ModelTensors

        gates = self.operation_blks['gates']
        leaf_items = {k: (o.gpindices, o) for k, o in gates.items()}
        for k, o in self.operation_blks['cloudnoise'].items():
            leaf_items[('__cloud__', k)] = (o.gpindices, o)
        if self.idle_member is not None:
            leaf_items['__idle__'] = (self.idle_member.gpindices, self.idle_member)
        prep_items = [(p.gpindices, p) for p in self.prep_blks['layers'].values()]
        povm_items = [(p.gpindices, p) for p in self.povm_blks['layers'].values()]

        state_space = self.state_space
        dim = self.dim
        recipes = [list(r) for r in self._layer_recipes]
        embed_cache = {}
        for recipe in recipes:
            for (_, targets) in recipe:
                if targets and targets != tuple(state_space.qubit_labels):
                    if targets not in embed_cache:
                        embed_cache[targets] = _embed_info(state_space, targets)

        def embed(mat, targets):
            if not targets or targets == tuple(state_space.qubit_labels):
                return mat
            rest_dim, src_dims, axes = embed_cache[targets]
            full = jnp.kron(mat, jnp.eye(rest_dim, dtype=mat.dtype))
            full = full.reshape(src_dims + src_dims)
            full = jnp.transpose(full, axes)
            return full.reshape(dim, dim)

        def compute(v):
            leaf_mats = {k: o.to_dense_jax(v[sl]) for k, (sl, o) in leaf_items.items()}
            layer_mats = []
            for recipe in recipes:
                m = None
                for (leaf_key, targets) in recipe:
                    g = embed(leaf_mats[leaf_key], targets)
                    m = g if m is None else g @ m
                if m is None:
                    m = jnp.eye(dim)
                layer_mats.append(m)
            ops = jnp.stack(layer_mats) if layer_mats else jnp.zeros((0, dim, dim))
            preps = jnp.stack([p.to_dense_jax(v[sl]) for sl, p in prep_items])
            effects = jnp.concatenate([p.to_dense_jax(v[sl]) for sl, p in povm_items],
                                      axis=0)
            return ModelTensors(ops, preps, effects, None)

        return compute

    def copy(self):
        import copy as _copy
        m = super().copy()
        m.__class__ = CloudNoiseModel
        m._cloud_map_by_targets = dict(self._cloud_map_by_targets)
        m.operation_blks['cloudnoise'] = collections.OrderedDict(
            (k, _copy.deepcopy(o)) for k, o in self.operation_blks['cloudnoise'].items())
        return m


def create_cloud_crosstalk_model_from_hops_and_weights(
        processor_spec, custom_gates=None, max_idle_weight=1, max_spam_weight=1,
        maxhops=0, extra_weight_1_hops=0, extra_gate_weight=0,
        simulator='auto', evotype=None, gate_type='H+s', spam_type='computational',
        implicit_idle_mode='none', errcomp_type='gates', independent_clouds=True,
        connected_highweight_errors=False, basis='pp', verbosity=0):
    """Build a cloud-noise model from hop/weight specs (reference:
    modelconstruction.create_cloud_crosstalk_model_from_hops_and_weights).

    Each gate gets an exp(Lindblad) noise factor on its cloud = qubits within
    `maxhops` of its targets, with error terms restricted to weight
    <= (gate_weight + extra_gate_weight); the global idle gets weight
    <= max_idle_weight terms on all qubits.

    Honesty notes: each cloud has INDEPENDENT parameters
    (independent_clouds=False raises); high-weight error terms are NOT
    restricted to connected qubit subsets (connected_highweight_errors=True
    raises -- the default here is False, diverging from the reference's
    default to match what is implemented); extra_weight_1_hops != 0,
    non-'gates' errcomp_type, non-'none' implicit_idle_mode and
    non-densitymx evotypes raise.
    """
    if evotype not in (None, 'default', 'densitymx'):
        raise NotImplementedError(
            "evotype=%r: only dense superoperator (densitymx) semantics are "
            "implemented" % (evotype,))
    if errcomp_type != 'gates':
        raise NotImplementedError(
            "errcomp_type=%r is not implemented (only 'gates')"
            % (errcomp_type,))
    if implicit_idle_mode != 'none':
        raise NotImplementedError(
            "implicit_idle_mode=%r is not supported (only 'none')"
            % (implicit_idle_mode,))
    if not independent_clouds:
        raise NotImplementedError(
            "independent_clouds=False (shared cloud parameters) is not "
            "implemented")
    if connected_highweight_errors:
        raise NotImplementedError(
            "connected_highweight_errors=True (restrict high-weight error "
            "terms to connected qubit subsets) is not implemented; weight-"
            "limited terms span the whole cloud")
    if extra_weight_1_hops:
        raise NotImplementedError(
            "extra_weight_1_hops != 0 (longer-range weight-1 terms) is not "
            "implemented")
    pspec = processor_spec
    nq = pspec.num_qubits
    qlbls = tuple(pspec.qubit_labels)
    graph = pspec.qubit_graph

    gate_members = collections.OrderedDict()
    cloud_members_blk = collections.OrderedDict()
    cloud_map = {}

    for name in pspec.gate_names:
        if name in ('{idle}', '(idle)'):
            continue
        u = pspec.gate_unitaries[name]
        udim = u.shape[0]
        d2 = udim * udim
        ideal = _op.StaticArbitraryOp(
            np.real(_ot.unitary_to_superop(u, Basis.cast(basis, d2))))
        gate_nq = int(round(np.log2(udim)))
        gate_members[Label(name)] = custom_gates.get(name, ideal) \
            if custom_gates else ideal

        if gate_nq == 1:
            # clouds depend on target qubit => per-availability leaves
            for (q,) in pspec.resolved_availability(name):
                cloud = tuple(sorted(graph.radius([q], maxhops),
                                     key=lambda x: qlbls.index(x)))
                w = 1 + extra_gate_weight
                key = ('cloud', name, (q,))
                eg = _op.build_lindblad_errorgen(
                    Basis.cast(basis, 4 ** len(cloud)), gate_type,
                    max_weight=w)
                cloud_members_blk[key] = _op.ExpErrorgenOp(eg)
                cloud_map[(Label(name), (q,))] = (key, cloud)
        else:
            for targets in pspec.resolved_availability(name):
                cloud = tuple(sorted(graph.radius(list(targets), maxhops),
                                     key=lambda x: qlbls.index(x)))
                w = 2 + extra_gate_weight
                key = ('cloud', name, tuple(targets))
                eg = _op.build_lindblad_errorgen(
                    Basis.cast(basis, 4 ** len(cloud)), gate_type,
                    max_weight=w)
                cloud_members_blk[key] = _op.ExpErrorgenOp(eg)
                cloud_map[(Label(name), tuple(targets))] = (key, cloud)

    # global idle errorgen (weight-limited, all qubits)
    idle_member = None
    if max_idle_weight > 0:
        eg = _op.build_lindblad_errorgen(Basis.cast(basis, 4 ** nq), gate_type,
                                         max_weight=max_idle_weight)
        idle_member = _op.ExpErrorgenOp(eg)

    # SPAM
    prep_member = _st.ComputationalBasisState([0] * nq, basis)
    povm_member = _pv.ComputationalBasisPOVM(nq, basis)
    if spam_type not in ('computational', 'static') and max_spam_weight > 0:
        eg_p = _op.build_lindblad_errorgen(Basis.cast(basis, 4 ** nq), spam_type,
                                           max_weight=max_spam_weight)
        prep_member = _st.ComposedState(prep_member, _op.ExpErrorgenOp(eg_p))
        eg_m = _op.build_lindblad_errorgen(Basis.cast(basis, 4 ** nq), spam_type,
                                           max_weight=max_spam_weight)
        povm_member = _pv.ComposedPOVM(_op.ExpErrorgenOp(eg_m), povm_member)

    mdl = CloudNoiseModel(pspec, gate_members, prep_member, povm_member,
                          cloud_map, cloud_members_blk, basis, simulator,
                          idle_member)
    return mdl


from pygsti_tpu.models.layerrules import LayerRules as _LayerRulesBase


class CloudNoiseLayerRules(_LayerRulesBase):
    """Layer rules for cloud-noise models: compose the target layer with
    cloud error generators per the errcomp_type ('gates' composes error
    maps; 'errorgens' sums error generators in a single exp) (reference:
    cloudnoisemodel.CloudNoiseLayerRules:422).  Our CloudNoiseModel builds
    these compositions at layout time; this records the configuration."""

    def __init__(self, errcomp_type='gates', qubit_labels=None,
                 implicit_idle_mode='none', singleq_idle_layer_labels=None,
                 implied_global_idle_label=None):
        self.errcomp_type = errcomp_type
        self.qubit_labels = qubit_labels
        self.implicit_idle_mode = implicit_idle_mode
        self.single_qubit_idle_layer_labels = singleq_idle_layer_labels
        self.implied_global_idle_label = implied_global_idle_label
