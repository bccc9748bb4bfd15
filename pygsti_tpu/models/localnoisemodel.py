"""Implicit models with local (crosstalk-free) noise
(reference: pygsti/models/localnoisemodel.py:42, implicitmodel.py:30).

TPU-first design: instead of the reference's lazy per-layer operator
construction (LayerRules), the model keeps *leaf* members (one per primitive
gate, acting on that gate's qubits) and a registry of unique circuit layers.
``tensors_fn`` computes every leaf's small matrix from the parameter vector,
then builds each registered layer's full-space superoperator by
embed-and-multiply -- all inside the same traced function, so layers stay
differentiable and the scanned-propagation simulator works unchanged.
"""

from __future__ import annotations

import collections

import numpy as np

from pygsti_tpu.baseobjs.label import Label, LabelTupTup
from pygsti_tpu.baseobjs.statespace import QubitSpace
from pygsti_tpu.baseobjs.basis import Basis
from pygsti_tpu.models.model import OpModel
from pygsti_tpu.models.explicitmodel import ModelTensors
from pygsti_tpu.modelmembers import operations as _op
from pygsti_tpu.modelmembers import states as _st
from pygsti_tpu.modelmembers import povms as _pv


def _embed_info(state_space, target_labels):
    """Static embedding info: permutation axes for kron-embed."""
    labels = list(state_space.tensor_product_block_labels)
    factor_dims = [d * d for d in state_space.tensor_product_block_dims]
    tgt_pos = [labels.index(t) for t in target_labels]
    other_pos = [i for i in range(len(labels)) if i not in tgt_pos]
    rest_dim = int(np.prod([factor_dims[i] for i in other_pos])) if other_pos else 1
    nf = len(labels)
    src_order = tgt_pos + other_pos
    inv = [0] * nf
    for newpos, srcpos in enumerate(src_order):
        inv[srcpos] = newpos
    src_dims = [factor_dims[i] for i in src_order]
    axes = inv + [p + nf for p in inv]
    return rest_dim, src_dims, axes


class LocalNoiseModel(OpModel):
    """Implicit model: each gate's noise acts only on its target qubits."""

    def __init__(self, processor_spec, gate_members, prep_member, povm_member,
                 basis='pp', simulator='auto', idle_member=None):
        state_space = QubitSpace(processor_spec.qubit_labels)
        super().__init__(state_space, basis, simulator)
        self.processor_spec = processor_spec
        # leaf members: {(gate_name, targets): member acting on len(targets) qubits}
        self.operation_blks = {'gates': collections.OrderedDict(gate_members)}
        self.prep_blks = {'layers': collections.OrderedDict([(Label('rho0'), prep_member)])}
        self.povm_blks = {'layers': collections.OrderedDict([(Label('Mdefault'), povm_member)])}
        self.idle_member = idle_member  # optional full-space or 1q idle leaf
        # op factories: {gate_name: OpFactory} for arg-carrying labels like
        # Gzr;0.5:0 (reference: localnoisemodel.py:186 factories['gates'])
        self.factories = {'gates': collections.OrderedDict()}
        # layer registry: Label -> recipe [(leaf_key, targets), ...]
        self._layer_keys = []
        self._layer_recipes = []
        self._layer_index = {}
        # always register the empty (global idle) layer
        self.register_layer(Label(()))

    # -- member iteration (leaves only) --------------------------------------
    def _iter_parameterized_objs(self):
        for lbl, obj in self.prep_blks['layers'].items():
            yield lbl, obj
        for lbl, obj in self.povm_blks['layers'].items():
            yield lbl, obj
        for lbl, obj in self.operation_blks['gates'].items():
            yield lbl, obj
        if self.idle_member is not None:
            yield Label('{idle}'), self.idle_member

    def _clear_compiled(self):
        self._sim = None

    # -- layer registry -------------------------------------------------------
    def _leaf_for(self, comp):
        """Find the leaf member key for a simple gate label."""
        gates = self.operation_blks['gates']
        args = getattr(comp, 'args', None)
        if args:
            # factory-created op, cached under the full arged label
            if comp in gates:
                return comp
            factory = self.factories['gates'].get(comp.name, None) \
                or self.factories['gates'].get(Label(comp.name), None)
            if factory is None:
                raise KeyError("No op factory for arged layer component %s"
                               % str(comp))
            fargs = tuple(float(a) if isinstance(a, str) else a for a in args)
            gates[comp] = factory.create_op(fargs, comp.sslbls)
            self._need_rebuild = True
            return comp
        key = Label(comp.name, comp.sslbls) if comp.sslbls else Label(comp.name)
        if key in gates:
            return key
        if Label(comp.name) in gates:
            return Label(comp.name)
        raise KeyError("No gate member for layer component %s" % str(comp))

    def register_layer(self, layer_lbl):
        if layer_lbl in self._layer_index:
            return self._layer_index[layer_lbl]
        comps = layer_lbl.components if not layer_lbl.is_simple else (layer_lbl,)
        recipe = []
        if len(comps) == 0:
            if self.idle_member is not None:
                recipe.append(('__idle__', tuple(self.state_space.qubit_labels)))
        else:
            for comp in comps:
                recipe.append((self._leaf_for(comp), tuple(comp.sslbls or ())))
        idx = len(self._layer_keys)
        self._layer_keys.append(layer_lbl)
        self._layer_recipes.append(recipe)
        self._layer_index[layer_lbl] = idx
        self._clear_compiled()
        return idx

    def register_circuit_layers(self, circuits):
        """Called by layout construction to pre-register all unique layers."""
        for c in circuits:
            for layer in c.layertup:
                self.register_layer(layer)

    # -- layout interface -----------------------------------------------------
    @property
    def op_keys(self):
        return list(self._layer_keys)

    @property
    def prep_keys(self):
        return list(self.prep_blks['layers'].keys())

    @property
    def povm_keys(self):
        return list(self.povm_blks['layers'].keys())

    @property
    def povms(self):
        return self.povm_blks['layers']

    @property
    def preps(self):
        return self.prep_blks['layers']

    def povm_effect_rows(self):
        out = {}
        off = 0
        for lbl, povm in self.povm_blks['layers'].items():
            n = povm.num_outcomes
            out[lbl] = (slice(off, off + n), povm.outcome_labels)
            off += n
        return out

    def _default_prep_label(self):
        return self.prep_keys[0]

    def _default_povm_label(self):
        return self.povm_keys[0]

    # -- pure compute function ------------------------------------------------
    def tensors_fn(self):
        self._rebuild_paramvec_if_needed()
        import jax.numpy as jnp

        gates = self.operation_blks['gates']
        leaf_items = {k: (o.gpindices, o) for k, o in gates.items()}
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

    # -- convenience ----------------------------------------------------------
    def probabilities(self, circuit, clip_to=None):
        return self.sim.probs(circuit, clip_to=clip_to)

    def copy(self):
        import copy as _copy
        m = LocalNoiseModel.__new__(LocalNoiseModel)
        OpModel.__init__(m, self.state_space, self.basis, self._sim_type)
        m.processor_spec = self.processor_spec
        m.operation_blks = {'gates': collections.OrderedDict(
            (k, _copy.deepcopy(v)) for k, v in self.operation_blks['gates'].items())}
        m.prep_blks = {'layers': collections.OrderedDict(
            (k, _copy.deepcopy(v)) for k, v in self.prep_blks['layers'].items())}
        m.povm_blks = {'layers': collections.OrderedDict(
            (k, _copy.deepcopy(v)) for k, v in self.povm_blks['layers'].items())}
        m.idle_member = _copy.deepcopy(self.idle_member)
        m._layer_keys = list(self._layer_keys)
        m._layer_recipes = [list(r) for r in self._layer_recipes]
        m._layer_index = dict(self._layer_index)
        m._need_rebuild = True
        return m
