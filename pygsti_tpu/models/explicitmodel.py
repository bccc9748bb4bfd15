"""ExplicitOpModel: dict-style model with explicit per-layer operations
(reference: pygsti/models/explicitmodel.py:60).

The model's compiled compute path is ``tensors_fn()``: a pure function
``v -> ModelTensors`` (stacked op matrices / prep vectors / effect rows)
that forward simulators close over; rebuilding is only needed when the
member *structure* changes, not the parameter values.
"""

from __future__ import annotations

import collections
from typing import NamedTuple, Any

import numpy as np

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.models.model import OpModel
from pygsti_tpu.modelmembers.modelmember import ModelMember
from pygsti_tpu.modelmembers import operations as _op
from pygsti_tpu.modelmembers import states as _st
from pygsti_tpu.modelmembers import povms as _pv
from pygsti_tpu.modelmembers.instruments import Instrument


class ModelTensors(NamedTuple):
    """Stacked dense representations (jnp arrays) produced by tensors_fn."""
    ops: Any        # [n_ops, dim, dim]
    preps: Any      # [n_preps, dim]
    effects: Any    # [n_effect_rows, dim]  (all POVMs' effects, concatenated)
    instruments: Any  # [n_instrument_members, dim, dim] or None


class _MemberDict(collections.OrderedDict):
    """Ordered member dict that auto-casts raw arrays and invalidates the
    parent model's paramvec on modification (reference:
    models/memberdict.py:389)."""

    def __init__(self, parent, cast_fn):
        super().__init__()
        self._parent = parent
        self._cast = cast_fn

    def __reduce__(self):
        # picklability (legacy drivers' output_pkl): rebuild empty, insert
        # items, then restore _parent/_cast via the state dict.  pickle
        # applies dict-items BEFORE the state, so __setitem__ must tolerate
        # the attributes being absent mid-unpickle (see getattr below).
        return (_MemberDict.__new__, (_MemberDict,),
                {'_parent': self._parent, '_cast': self._cast},
                None, iter(self.items()))

    def __setitem__(self, key, val):
        key = Label(key)
        cast = getattr(self, '_cast', None)
        if not isinstance(val, ModelMember) and cast is not None:
            val = cast(self._parent, val)
        super().__setitem__(key, val)
        parent = getattr(self, '_parent', None)
        if parent is not None:
            parent._mark_for_rebuild()

    def __getitem__(self, key):
        return super().__getitem__(Label(key))

    def __contains__(self, key):
        return super().__contains__(Label(key))

    def __delitem__(self, key):
        super().__delitem__(Label(key))
        self._parent._mark_for_rebuild()


def _cast_operation(model, val):
    val = np.asarray(val)
    t = model.default_gate_type
    if t in ('full', 'full arbitrary'):
        return _op.FullArbitraryOp(val)
    if t in ('full TP', 'TP'):
        return _op.FullTPOp(val)
    if t in ('static', 'static arbitrary'):
        return _op.StaticArbitraryOp(val)
    raise ValueError("Cannot auto-cast operation for gate type %r" % t)


def _cast_prep(model, val):
    t = model.default_prep_type
    if t in ('full', 'full arbitrary'):
        return _st.FullState(val)
    if t in ('full TP', 'TP'):
        return _st.TPState(val)
    if t in ('static',):
        return _st.StaticState(val)
    raise ValueError("Cannot auto-cast prep for type %r" % t)


def _cast_povm(model, val):
    # val: dict of effect vectors
    t = model.default_povm_type
    if t in ('full', 'full arbitrary'):
        return _pv.UnconstrainedPOVM(val)
    if t in ('full TP', 'TP'):
        return _pv.TPPOVM(val)
    raise ValueError("Cannot auto-cast povm for type %r" % t)


def _cast_identity(model, val):
    """No-op member cast (instruments are passed through).  A module-level
    function rather than a lambda so models (and results containing them)
    stay picklable -- the legacy drivers' output_pkl path requires it."""
    return val


class ExplicitOpModel(OpModel):
    """Model with explicit .operations/.preps/.povms/.instruments dicts."""

    def __init__(self, state_space, basis='pp', default_gate_type='full',
                 default_prep_type=None, default_povm_type=None, simulator='auto'):
        super().__init__(state_space, basis, simulator)
        self.default_gate_type = default_gate_type
        self.default_prep_type = default_prep_type or default_gate_type
        self.default_povm_type = default_povm_type or default_gate_type
        self.preps = _MemberDict(self, _cast_prep)
        self.povms = _MemberDict(self, _cast_povm)
        self.operations = _MemberDict(self, _cast_operation)
        self.instruments = _MemberDict(self, _cast_identity)
        self._compiled = None
        # composite circuit layers built as products of existing operations
        # (the reference's ExplicitLayerRules behavior, explicitmodel.py:1952)
        self._derived_layers = collections.OrderedDict()

    # -- paramvec layout (reference order: preps, povms, ops, instruments) ---
    def _iter_parameterized_objs(self):
        for lbl, obj in self.preps.items():
            yield lbl, obj
        for lbl, obj in self.povms.items():
            yield lbl, obj
        for lbl, obj in self.operations.items():
            yield lbl, obj
        for lbl, obj in self.instruments.items():
            yield lbl, obj

    def _clear_compiled(self):
        self._compiled = None
        self._sim = None  # simulator caches layouts/compiled fns

    def __getitem__(self, label):
        label = Label(label)
        for d in (self.operations, self.preps, self.povms, self.instruments):
            if label in d:
                return d[label]
        raise KeyError(label)

    def __setitem__(self, label, value):
        label = Label(label)
        name = str(label.name) if label.sslbls is None else str(label.name)
        if name.startswith('rho'):
            self.preps[label] = value
        elif name.startswith('M'):
            self.povms[label] = value
        else:
            self.operations[label] = value

    # -- structure tables -----------------------------------------------------
    def register_circuit_layers(self, circuits):
        """Register composite layers (e.g. [Gxpi2:0Gypi2:1]) not directly in
        .operations as derived products of their component operations."""
        for c in circuits:
            for layer in c.layertup:
                if layer in self.operations or layer in self._derived_layers:
                    continue
                comps = layer.components
                if len(comps) > 1 and all(comp in self.operations for comp in comps):
                    self._derived_layers[layer] = [Label(comp) for comp in comps]
                    self._clear_compiled()

    @property
    def op_keys(self):
        """Operation keys for layout compilation: real operations, derived
        composite layers, then instrument members (pseudo-ops keyed
        ('INSTRUMENT', inst_label, member_label))."""
        keys = list(self.operations.keys()) + list(self._derived_layers.keys())
        for ilbl, inst in self.instruments.items():
            for mlbl in inst.member_labels:
                keys.append(('INSTRUMENT', ilbl, mlbl))
        return keys

    @property
    def prep_keys(self):
        return list(self.preps.keys())

    @property
    def povm_keys(self):
        return list(self.povms.keys())

    def copy(self):
        """Deep copy (members copied; compiled caches dropped)."""
        import copy as _copy
        m = ExplicitOpModel(self.state_space, self.basis, self.default_gate_type,
                            self.default_prep_type, self.default_povm_type,
                            self._sim_type)
        m._derived_layers = collections.OrderedDict(self._derived_layers)
        for lbl, obj in self.preps.items():
            m.preps[lbl] = _copy.deepcopy(obj)
        for lbl, obj in self.povms.items():
            m.povms[lbl] = _copy.deepcopy(obj)
        for lbl, obj in self.operations.items():
            m.operations[lbl] = _copy.deepcopy(obj)
        for lbl, obj in self.instruments.items():
            m.instruments[lbl] = _copy.deepcopy(obj)
        m._mark_for_rebuild()
        return m

    def povm_effect_rows(self):
        """Mapping povm_label -> (row_slice, outcome_labels) into the stacked
        effects tensor."""
        out = {}
        off = 0
        for lbl, povm in self.povms.items():
            n = povm.num_outcomes
            out[lbl] = (slice(off, off + n), povm.outcome_labels)
            off += n
        return out

    # -- pure compute function ------------------------------------------------
    def tensors_fn(self):
        """Returns a pure function v -> ModelTensors (jit/vmap/jacfwd-safe).

        The closure captures only static structure (member objects' shapes
        and constants); all parameter dependence flows through ``v``.
        """
        self._rebuild_paramvec_if_needed()
        import jax.numpy as jnp

        op_items = [(o.gpindices, o) for o in self.operations.values()]
        prep_items = [(p.gpindices, p) for p in self.preps.values()]
        povm_items = [(p.gpindices, p) for p in self.povms.values()]
        inst_items = [(i.gpindices, i) for i in self.instruments.values()]

        base_op_keys = list(self.operations.keys())
        derived = [[base_op_keys.index(k) for k in comps]
                   for comps in self._derived_layers.values()]

        ip_mx = None if self.param_interposer is None \
            else jnp.asarray(self.param_interposer.transform_matrix)

        def compute(v):
            if ip_mx is not None:  # model params -> member params
                v = ip_mx @ v
            base = [o.to_dense_jax(v[sl]) for sl, o in op_items]
            for comp_idxs in derived:
                m = base[comp_idxs[0]]
                for i in comp_idxs[1:]:
                    m = base[i] @ m
                base.append(m)
            for sl, inst in inst_items:
                mats = inst.to_dense_jax(v[sl])   # [n_members, d, d]
                for k in range(mats.shape[0]):
                    base.append(mats[k])
            ops = jnp.stack(base) \
                if base else jnp.zeros((0, self.dim, self.dim))
            preps = jnp.stack([p.to_dense_jax(v[sl]) for sl, p in prep_items]) \
                if prep_items else jnp.zeros((0, self.dim))
            effects = jnp.concatenate([p.to_dense_jax(v[sl]) for sl, p in povm_items],
                                      axis=0) if povm_items else jnp.zeros((0, self.dim))
            insts = jnp.concatenate([i.to_dense_jax(v[sl]) for sl, i in inst_items],
                                    axis=0) if inst_items else None
            return ModelTensors(ops, preps, effects, insts)

        return compute

    def statevec_tensors_fn(self):
        """Pure function v -> (unitaries [K,u,u] complex, statevecs
        [n_preps,u] complex, effect_stdmxs [n_eff,u,u] complex) for the
        complex-amplitude (statevec) simulation path (reference:
        pygsti/evotypes/statevec/*.cpp state/op/effect reps).

        Raises ValueError with a clear message when a member has no pure-state
        representation (non-unitary gate, mixed state, ...)."""
        self._rebuild_paramvec_if_needed()
        import jax.numpy as jnp
        from pygsti_tpu.tools.basistools import vec_to_stdmx

        op_items = []
        for lbl, o in self.operations.items():
            if not hasattr(o, 'to_unitary_jax'):
                raise ValueError(
                    "Operation %s (%s) has no unitary (statevec) representation;"
                    " the statevec simulator requires unitary gates -- use the"
                    " density-matrix simulator for noisy models" %
                    (lbl, type(o).__name__))
            op_items.append((o.gpindices, o))
        prep_items = []
        for lbl, p in self.preps.items():
            if not hasattr(p, 'to_statevec_jax'):
                raise ValueError(
                    "Prep %s (%s) has no pure-state representation" %
                    (lbl, type(p).__name__))
            prep_items.append((p.gpindices, p))

        # effects: std-basis Hermitian matrices (probability = psi^dag E psi)
        basis = self.basis
        effect_mxs = []
        for lbl, povm in self.povms.items():
            dense = povm.to_dense()  # [n_out, dim] superkets
            for row in dense:
                effect_mxs.append(vec_to_stdmx(np.asarray(row), basis))
        effect_mxs = np.stack(effect_mxs) if effect_mxs else \
            np.zeros((0, 0, 0), complex)

        def compute(v):
            us = jnp.stack([o.to_unitary_jax(v[sl]) for sl, o in op_items]) \
                if op_items else jnp.zeros((0, 2, 2), complex)
            psis = jnp.stack([p.to_statevec_jax(v[sl]) for sl, p in prep_items])
            return us, psis, jnp.asarray(effect_mxs)

        return compute

    def tensors_fn_t(self):
        """Like tensors_fn but time-dependent: returns compute(v, t) where
        members with a ``to_dense_jax_t`` method receive the time."""
        self._rebuild_paramvec_if_needed()
        import jax.numpy as jnp

        op_items = [(o.gpindices, o) for o in self.operations.values()]
        prep_items = [(p.gpindices, p) for p in self.preps.values()]
        povm_items = [(p.gpindices, p) for p in self.povms.values()]

        def dense_at(o, v, t):
            if hasattr(o, 'to_dense_jax_t'):
                return o.to_dense_jax_t(v, t)
            return o.to_dense_jax(v)

        ip_mx = None if self.param_interposer is None \
            else jnp.asarray(self.param_interposer.transform_matrix)

        def compute(v, t):
            if ip_mx is not None:
                v = ip_mx @ v
            ops = jnp.stack([dense_at(o, v[sl], t) for sl, o in op_items]) \
                if op_items else jnp.zeros((0, self.dim, self.dim))
            preps = jnp.stack([dense_at(p, v[sl], t) for sl, p in prep_items])
            effects = jnp.concatenate([dense_at(p, v[sl], t)
                                       for sl, p in povm_items], axis=0)
            return ModelTensors(ops, preps, effects, None)

        return compute

    # -- gauge structure -------------------------------------------------------
    def compute_nongauge_and_gauge_spaces(self, item_weights=None,
                                          non_gauge_mix_mx=None):
        """Orthonormal (nongauge, gauge) parameter-space bases (reference:
        explicitmodel.py:704 compute_nongauge_projector /
        explicitcalc.py:657 nongauge_projector)."""
        from pygsti_tpu.models.nongauge import compute_nongauge_and_gauge_spaces
        return compute_nongauge_and_gauge_spaces(self, item_weights,
                                                 non_gauge_mix_mx)

    def compute_nongauge_projector(self, item_weights=None, non_gauge_mix_mx=None):
        ng, _ = self.compute_nongauge_and_gauge_spaces(item_weights,
                                                       non_gauge_mix_mx)
        return ng @ ng.T

    # -- convenience ----------------------------------------------------------
    def probabilities(self, circuit, clip_to=None):
        return self.sim.probs(circuit, clip_to=clip_to)

    def bulk_probabilities(self, circuits, clip_to=None):
        return self.sim.bulk_probs(circuits)

    def circuit_outcomes(self, circuit):
        """Outcome labels this circuit yields (from its POVM)."""
        povm_lbl = self._default_povm_label()
        return [(ol,) for ol in self.povms[povm_lbl].outcome_labels]

    def _default_prep_label(self):
        keys = self.prep_keys
        assert len(keys) == 1, "Model has %d preps; circuit must specify one" % len(keys)
        return keys[0]

    def _default_povm_label(self):
        keys = self.povm_keys
        assert len(keys) == 1, "Model has %d povms; circuit must specify one" % len(keys)
        return keys[0]

    # -- FOGI (first-order gauge-invariant) analysis ---------------------------
    # (reference: models/model.py:2516 setup_fogi, :2681-:2776 fogi_* API)
    def _fogi_sslbls(self):
        qlbls = getattr(self.state_space, 'qubit_labels', None)
        return tuple(qlbls) if qlbls else tuple(range(
            getattr(self.state_space, 'num_qubits', 1)))

    def _fogi_member(self, lbl):
        """Member for a primitive op/prep/povm label."""
        if lbl in self.operations:
            return self.operations[lbl]
        if lbl in self.preps:
            return self.preps[lbl]
        if lbl in self.povms:
            return self.povms[lbl]
        raise KeyError(lbl)

    @staticmethod
    def _extract_ideal_superop(op):
        """The ideal (target) superoperator factor of an op (reference
        model.py extract_std_target_mx: Composed(ideal, ExpErrorgen) or a
        bare ExpErrorgen == identity target)."""
        from pygsti_tpu.modelmembers.operations import (ComposedOp,
                                                        ExpErrorgenOp,
                                                        IdentityPlusErrorgenOp)
        if isinstance(op, (ExpErrorgenOp, IdentityPlusErrorgenOp)):
            return np.identity(op.dim)
        if isinstance(op, ComposedOp):
            ideal = None
            for f in op.factors:
                if not hasattr(f, 'errorgen_coefficient_labels'):
                    fm = np.asarray(f.to_dense())
                    ideal = fm if ideal is None else fm @ ideal
            return ideal if ideal is not None else np.identity(op.dim)
        return np.asarray(op.to_dense())

    def setup_fogi(self, initial_gauge_basis=None, create_complete_basis_fn=None,
                   op_label_abbrevs=None, reparameterize=False,
                   reduce_to_model_space=True, dependent_fogi_action='drop',
                   include_spam=True, primitive_op_labels=None):
        """Set up the first-order-gauge-invariant decomposition of this
        model's error generators (reference: model.py:2516 setup_fogi).

        Builds per-op gauge-action matrices over `initial_gauge_basis`
        (default: the complete H+S elementary-errorgen basis), reduces them
        to the model-allowed errorgen space, and constructs a
        FirstOrderGaugeInvariantStore with intrinsic + relational FOGI
        directions.  With reparameterize=True the model's parameters become
        [untouched params..., FOGI components] via a LinearInterposer
        (reference model.py _add_reparameterization)."""
        from pygsti_tpu.baseobjs.errorgenbasis import (
            CompleteElementaryErrorgenBasis, ExplicitElementaryErrorgenBasis)
        from pygsti_tpu.baseobjs.errorgenlabel import (
            GlobalElementaryErrorgenLabel, LocalElementaryErrorgenLabel)
        from pygsti_tpu.baseobjs.errorgenspace import ErrorgenSpace
        from pygsti_tpu.tools import fogitools as _fogit
        from pygsti_tpu.models.fogistore import FirstOrderGaugeInvariantStore

        self._rebuild_paramvec_if_needed()
        sslbls = self._fogi_sslbls()
        if initial_gauge_basis is None:
            initial_gauge_basis = CompleteElementaryErrorgenBasis(
                'PP', self.state_space, elementary_errorgen_types=('H', 'S'),
                num_qubits=len(sslbls))
        if primitive_op_labels is None:
            primitive_op_labels = list(self.operations.keys())
        primitive_prep_labels = list(self.preps.keys()) if include_spam else []
        primitive_povm_labels = list(self.povms.keys()) if include_spam else []

        gauge_local_labels = list(initial_gauge_basis.labels)
        to_global = {l: GlobalElementaryErrorgenLabel.cast(l, sslbls)
                     for l in gauge_local_labels}
        gauge_global = [to_global[l] for l in gauge_local_labels]
        gauge_basis_global = ExplicitElementaryErrorgenBasis(
            self.state_space, gauge_global)
        gens = initial_gauge_basis.elemgen_matrices(self.basis)
        duals = initial_gauge_basis.elemgen_dual_matrices(self.basis)

        def _reduce(mx, row_global_labels, member):
            """_format_gauge_action_matrix (reference model.py:2393):
            restrict rows to the member's allowed errorgen coefficients and
            shrink the gauge space so disallowed rows vanish."""
            allowed_local = member.errorgen_coefficient_labels() \
                if hasattr(member, 'errorgen_coefficient_labels') else None
            if allowed_local is None or not reduce_to_model_space:
                allowed_global = row_global_labels
                op_gauge_space = ErrorgenSpace(
                    np.identity(len(gauge_global)), gauge_basis_global)
                return mx, allowed_global, op_gauge_space
            allowed_global = [GlobalElementaryErrorgenLabel.cast(l, sslbls)
                              for l in allowed_local]
            allowed_set = set(allowed_global)
            disallowed = [i for i, l in enumerate(row_global_labels)
                          if l not in allowed_set]
            if disallowed:
                from pygsti_tpu.tools import matrixtools as _mt
                combos = _mt.nice_nullspace(mx[disallowed, :], tol=1e-4)
                mx = mx @ combos
                op_gauge_space = ErrorgenSpace(combos, gauge_basis_global)
            else:
                op_gauge_space = ErrorgenSpace(
                    np.identity(len(gauge_global)), gauge_basis_global)
            # reshape rows into the member's allowed-label order
            row_index = {l: i for i, l in enumerate(row_global_labels)}
            out = np.zeros((len(allowed_global), mx.shape[1]), mx.dtype)
            for new_i, lbl in enumerate(allowed_global):
                i = row_index.get(lbl)
                if i is not None:
                    out[new_i, :] = mx[i, :]
            return out, allowed_global, op_gauge_space

        gauge_action_matrices = collections.OrderedDict()
        gauge_action_gauge_spaces = collections.OrderedDict()
        errorgen_coefficient_labels = collections.OrderedDict()

        for op_label in primitive_op_labels:
            op = self.operations[op_label]
            U = self._extract_ideal_superop(op)
            mx = _fogit.first_order_gauge_action_matrix(U, gens, duals)
            keep = [i for i in range(mx.shape[0])
                    if np.linalg.norm(mx[i, :]) > 1e-12]
            mx2, allowed_global, op_gauge_space = _reduce(
                mx[keep, :], [gauge_global[i] for i in keep], op)
            errorgen_coefficient_labels[op_label] = allowed_global
            gauge_action_matrices[op_label] = mx2
            gauge_action_gauge_spaces[op_label] = op_gauge_space

        for prep_label in primitive_prep_labels:
            prep = self.preps[prep_label]
            v = np.asarray(prep.to_dense())
            mx = _fogit.first_order_gauge_action_matrix_for_prep(v, gens)
            keep = [i for i in range(mx.shape[0])
                    if np.linalg.norm(mx[i, :]) > 1e-8]
            mx2, allowed_global, op_gauge_space = _reduce(
                mx[keep, :], [gauge_global[i] for i in keep], prep)
            errorgen_coefficient_labels[prep_label] = allowed_global
            gauge_action_matrices[prep_label] = mx2
            gauge_action_gauge_spaces[prep_label] = op_gauge_space

        for povm_label in primitive_povm_labels:
            povm = self.povms[povm_label]
            effects = np.asarray(povm.to_dense())  # [n_effects, d2]
            mx = _fogit.first_order_gauge_action_matrix_for_povm(
                list(effects), gens)
            keep = [i for i in range(mx.shape[0])
                    if np.linalg.norm(mx[i, :]) > 1e-8]
            mx2, allowed_global, op_gauge_space = _reduce(
                mx[keep, :], [gauge_global[i] for i in keep], povm)
            errorgen_coefficient_labels[povm_label] = allowed_global
            gauge_action_matrices[povm_label] = mx2
            gauge_action_gauge_spaces[povm_label] = op_gauge_space

        self.fogi_store = FirstOrderGaugeInvariantStore.from_gauge_action_matrices(
            gauge_action_matrices, gauge_action_gauge_spaces,
            errorgen_coefficient_labels, op_label_abbrevs,
            dependent_fogi_action, norm_order='auto')

        if reparameterize:
            self.param_interposer = self._add_reparameterization(
                list(primitive_op_labels) + primitive_prep_labels
                + primitive_povm_labels,
                self.fogi_store.fogi_directions,
                self.fogi_store.errorgen_space_op_elem_labels)
            self._mark_for_rebuild()
        return self.fogi_store

    def _add_reparameterization(self, primitive_op_labels, fogi_dirs,
                                errgenset_space_labels):
        """LinearInterposer mapping [untouched params..., FOGI components] to
        member params (reference: model.py _add_reparameterization).
        Requires each involved member's errorgen-coefficient derivative
        w.r.t. its params to be the identity (simple H+s-style blocks)."""
        from pygsti_tpu.models.modelparaminterposer import LinearInterposer
        from pygsti_tpu.baseobjs.errorgenlabel import GlobalElementaryErrorgenLabel
        sslbls = self._fogi_sslbls()
        nOpParams = self.num_params
        idx_of = {pair: i for i, pair in enumerate(errgenset_space_labels)}
        invDeriv = np.zeros((nOpParams, len(errgenset_space_labels)))
        used = set()
        for op_label in primitive_op_labels:
            member = self._fogi_member(op_label)
            lbls = [GlobalElementaryErrorgenLabel.cast(l, sslbls)
                    for l in member.errorgen_coefficient_labels()]
            gp = member.gpindices
            param_indices = list(range(gp.start, gp.stop))
            assert len(param_indices) == len(lbls), \
                ("FOGI reparameterization requires op params == errorgen "
                 "coefficients (op %s has %d params, %d coefficients)"
                 % (op_label, len(param_indices), len(lbls)))
            used.update(param_indices)
            for i, lbl in enumerate(lbls):
                invDeriv[param_indices[i], idx_of[(op_label, lbl)]] = 1.0
        unused = sorted(set(range(nOpParams)) - used)
        prefix_mx = np.zeros((nOpParams, len(unused)))
        for j, indx in enumerate(unused):
            prefix_mx[indx, j] = 1.0
        fogi_vecs = np.linalg.pinv(np.asarray(fogi_dirs).T)
        F = invDeriv @ fogi_vecs
        return LinearInterposer(np.concatenate([prefix_mx, F], axis=1))

    def _require_fogi(self):
        store = getattr(self, 'fogi_store', None)
        assert store is not None, "Call setup_fogi(...) first"
        return store

    def errorgen_coefficients(self, normalized_elem_gens=True):
        """Per-primitive-op errorgen coefficient dicts keyed by GLOBAL
        elementary-errorgen labels (reference: model.errorgen_coefficients).
        normalized_elem_gens=False rescales H coefficients by 1/d."""
        from pygsti_tpu.baseobjs.errorgenlabel import GlobalElementaryErrorgenLabel
        sslbls = self._fogi_sslbls()
        d2 = np.sqrt(self.dim)  # superop dim = d2^2
        d = np.sqrt(d2)
        out = {}
        members = list(self.operations.items()) + list(self.preps.items()) \
            + list(self.povms.items())
        for lbl, member in members:
            if not hasattr(member, 'errorgen_coefficients'):
                continue
            coeffs = {}
            for l, v in member.errorgen_coefficients().items():
                g = GlobalElementaryErrorgenLabel.cast(l, sslbls)
                if not normalized_elem_gens and g.errorgen_type == 'H':
                    v = v / d
                coeffs[g] = v
            out[lbl] = coeffs
        return out

    def fogi_errorgen_component_labels(self, include_fogv=False, typ='normal'):
        labels = self._require_fogi().fogi_errorgen_direction_labels(typ)
        if include_fogv:
            labels += self._require_fogi().fogv_errorgen_direction_labels(typ)
        return labels

    def fogi_errorgen_components_array(self, include_fogv=False,
                                       normalized_elem_gens=True):
        store = self._require_fogi()
        op_coeffs = self.errorgen_coefficients(normalized_elem_gens)
        if include_fogv:
            fogi, fogv = store.opcoeffs_to_fogiv_components_array(op_coeffs)
            return np.concatenate([fogi, fogv])
        return store.opcoeffs_to_fogi_components_array(op_coeffs)

    def set_fogi_errorgen_components_array(self, components, include_fogv=False,
                                           normalized_elem_gens=True,
                                           truncate=False):
        """Set model errors from FOGI (+FOGV) components (reference:
        model.set_fogi_errorgen_components_array)."""
        store = self._require_fogi()
        fogi, fogv = store.num_fogi_directions, store.num_fogv_directions
        components = np.asarray(components)
        if include_fogv:
            op_coeffs = store.fogiv_components_array_to_opcoeffs(
                components[0:fogi], components[fogi:fogi + fogv])
        else:
            op_coeffs = store.fogi_components_array_to_opcoeffs(
                components[0:fogi])
        from pygsti_tpu.baseobjs.errorgenlabel import (
            GlobalElementaryErrorgenLabel, LocalElementaryErrorgenLabel)
        sslbls = self._fogi_sslbls()
        d2 = np.sqrt(self.dim)
        d = np.sqrt(d2)
        for op_label, coeff_dict in op_coeffs.items():
            member = self._fogi_member(op_label)
            local = {}
            for l, v in coeff_dict.items():
                if isinstance(l, GlobalElementaryErrorgenLabel):
                    l = LocalElementaryErrorgenLabel.cast(l, sslbls)
                if not normalized_elem_gens and l.errorgen_type == 'H':
                    v = v * d
                local[l] = v
            member.set_errorgen_coefficients(local, truncate=truncate)
        self._mark_for_rebuild()

    def fogi_errorgen_vector(self, normalized_elem_gens=False):
        """Stacked errorgen-coefficient vector in the FOGI store's row order
        (reference: model.fogi_errorgen_vector)."""
        store = self._require_fogi()
        d = self.errorgen_coefficients(normalized_elem_gens=normalized_elem_gens)
        errvec = np.zeros(store.fogi_directions.shape[0], 'd')
        for op_lbl in store.primitive_op_labels:
            errdict = d[op_lbl]
            lbls = store.elem_errorgen_labels_by_op[op_lbl]
            s = store.op_errorgen_indices[op_lbl]
            for lbl, i in zip(lbls, range(s.start, s.stop)):
                errvec[i] = errdict.get(lbl, 0.0)
        return errvec

    def _fogi_errorgen_vector_projection(self, space,
                                         normalized_elem_gens=False):
        errvec = self.fogi_errorgen_vector(normalized_elem_gens)
        Pspace = space @ np.linalg.pinv(space)
        return Pspace @ errvec

    def fogi_contribution(self, op_label, error_type='H',
                          intrinsic_or_relational='intrinsic', target='all',
                          **_kwargs):
        """Aggregate FOGI error contribution for one op (reference:
        model.fogi_contribution, model.py:2776): project the model's
        errorgen vector onto the chosen FOGI subspace; H errors add in
        quadrature, S errors linearly."""
        store = self._require_fogi()
        if error_type in ('H', 'S'):
            space = store.create_fogi_aggregate_single_op_space(
                op_label, error_type, intrinsic_or_relational, target)
            proj = self._fogi_errorgen_vector_projection(space)
            if error_type == 'H':
                return float(np.linalg.norm(proj))
            return float(np.sum(np.abs(proj)))
        elif error_type in ('fogi_total_error', 'fogi_infidelity'):
            Hspace = store.create_fogi_aggregate_single_op_space(
                op_label, 'H', intrinsic_or_relational, target)
            Sspace = store.create_fogi_aggregate_single_op_space(
                op_label, 'S', intrinsic_or_relational, target)
            Hval = np.linalg.norm(self._fogi_errorgen_vector_projection(Hspace))
            Sval = np.sum(np.abs(self._fogi_errorgen_vector_projection(Sspace)))
            if error_type == 'fogi_total_error':
                return float(2 * Hval + Sval)
            return float(Hval ** 2 + Sval)
        raise ValueError("Invalid error_type: %s" % str(error_type))

    # -- gauge ----------------------------------------------------------------
    def set_all_parameterizations(self, gate_type, prep_type='auto',
                                  povm_type='auto', extra=None):
        """Convert all operations/preps/POVMs to the given parameterization
        in place (reference: model.set_all_parameterizations)."""
        import collections as _collections
        from pygsti_tpu.models.modelconstruction import (_make_op, _make_prep,
                                                         _make_povm)
        try:
            nq = self.state_space.num_qubits
        except ValueError:
            nq = None  # qudit space: only valid for parameterizations that
            # keep the dense SPAM vectors (full / full TP / static dense)
        ptype = prep_type if prep_type != 'auto' else gate_type
        etype = povm_type if povm_type != 'auto' else gate_type
        for lbl, op in list(self.operations.items()):
            self.operations[lbl] = _make_op(op.to_dense(), gate_type, self.basis)
        for lbl, p in list(self.preps.items()):
            self.preps[lbl] = _make_prep(p.to_dense(), ptype, self.basis, nq)
        for lbl, povm in list(self.povms.items()):
            effects = _collections.OrderedDict(povm.items())
            self.povms[lbl] = _make_povm(effects, etype, self.basis, nq)
        self.default_gate_type = gate_type
        self._mark_for_rebuild()

    def create_processor_spec(self, qudit_labels=None):
        """A QubitProcessorSpec whose gates are this model's (unitary)
        operations (reference: model.create_processor_spec)."""
        from pygsti_tpu.processors.processorspec import QubitProcessorSpec
        from pygsti_tpu.tools import optools as _got
        from pygsti_tpu.tools import basistools as _bt
        nq = self.state_space.num_qubits
        names, nonstd, avail = [], {}, {}
        for lbl, op in self.operations.items():
            name = lbl.name if hasattr(lbl, 'name') else str(lbl)
            if name in ('[]', ''):
                continue
            sup = _bt.change_basis(np.asarray(op.to_dense()), self.basis, 'std')
            nonstd[name] = _got.std_process_mx_to_unitary(sup)
            names.append(name)
            sslbls = getattr(lbl, 'sslbls', None)
            avail[name] = [tuple(sslbls)] if sslbls else [None]
        qlbls = qudit_labels if qudit_labels is not None \
            else self.state_space.qubit_labels
        return QubitProcessorSpec(nq, names, nonstd_gate_unitaries=nonstd,
                                  availability={n: a for n, a in avail.items()
                                                if a != [None]},
                                  qubit_labels=qlbls)

    def transform_inplace(self, s):
        """Apply gauge transformation with element `s` (has .transform_matrix
        and .transform_matrix_inverse): rho -> Sinv rho, E -> E S,
        G -> Sinv G S (reference: explicitmodel.transform_inplace)."""
        smx = s.transform_matrix if hasattr(s, 'transform_matrix') else np.asarray(s)
        sinv = s.transform_matrix_inverse if hasattr(s, 'transform_matrix_inverse') \
            else np.linalg.inv(smx)
        for obj in self.preps.values():
            obj.transform_inplace(smx, sinv)
        for obj in self.povms.values():
            obj.transform_inplace(smx, sinv)
        for obj in self.operations.values():
            obj.transform_inplace(smx, sinv)
        for obj in self.instruments.values():
            obj.transform_inplace(smx, sinv)
        self._need_rebuild = True
        self._clear_compiled()

    def depolarize(self, op_noise=None, spam_noise=None, max_op_noise=None,
                   max_spam_noise=None, seed=None):
        """Return a depolarized copy (reference: explicitmodel.depolarize)."""
        m = self.copy()
        rng = np.random.default_rng(seed)
        d = self.dim
        if max_op_noise is not None:
            op_noises = rng.uniform(0, max_op_noise, len(m.operations))
        elif op_noise is not None:
            op_noises = [op_noise] * len(m.operations)
        else:
            op_noises = None
        if op_noises is not None:
            for (lbl, op), noise in zip(list(m.operations.items()), op_noises):
                D = np.diag([1.0] + [1.0 - noise] * (d - 1))
                new_mx = D @ op.to_dense()
                m.operations[lbl] = type(op)(new_mx) if not isinstance(op, _op.StaticArbitraryOp) \
                    else _op.StaticArbitraryOp(new_mx)
        if max_spam_noise is not None:
            spam_noises = rng.uniform(0, max_spam_noise, len(m.preps))
            for (lbl, p), noise in zip(list(m.preps.items()), spam_noises):
                D = np.diag([1.0] + [1.0 - noise] * (d - 1))
                m.preps[lbl] = type(p)(D @ p.to_dense())
        elif spam_noise is not None:
            # uniform spam_noise depolarizes ONLY the preps -- POVMs are left
            # alone, matching the reference exactly (explicitmodel.py:1139
            # "Just depolarize the preps - leave POVMs alone")
            D = np.diag([1.0] + [1.0 - spam_noise] * (d - 1))
            for lbl, p in list(m.preps.items()):
                m.preps[lbl] = type(p)(D @ p.to_dense())
        m._mark_for_rebuild()
        return m

    def rotate(self, rotate=None, max_rotate=None, seed=None):
        """Return a copy with small unitary rotations applied to gates
        (reference: explicitmodel.rotate).  `rotate` is a tuple of Pauli
        rotation half-angles (length d-1 Lie coords for 1 qubit: (rx,ry,rz))."""
        from pygsti_tpu.tools.internalgates import sigmaX, sigmaY, sigmaZ
        from pygsti_tpu.tools.optools import unitary_to_superop
        import scipy.linalg as spl
        m = self.copy()
        rng = np.random.default_rng(seed)
        nq = self.state_space.num_qubits
        assert nq == 1, "rotate() currently supports 1-qubit models"
        for lbl, op in list(m.operations.items()):
            if max_rotate is not None:
                rx, ry, rz = rng.uniform(0, max_rotate, 3)
            else:
                rx, ry, rz = rotate
            u = spl.expm(-1j / 2.0 * (rx * sigmaX + ry * sigmaY + rz * sigmaZ))
            rot = np.real(unitary_to_superop(u, self.basis))
            new_mx = rot @ op.to_dense()
            m.operations[lbl] = type(op)(new_mx) if not isinstance(op, _op.StaticArbitraryOp) \
                else _op.StaticArbitraryOp(new_mx)
        m._mark_for_rebuild()
        return m

    def strdiff(self, other):
        """Summary of Frobenius distances between corresponding members."""
        lines = []
        for lbl in self.operations:
            if lbl in other.operations:
                d = np.linalg.norm(self.operations[lbl].to_dense()
                                   - other.operations[lbl].to_dense())
                lines.append("op %s: %.6g" % (lbl, d))
        return "\n".join(lines)

    def frobeniusdist(self, other):
        """RMS Frobenius distance over corresponding members (simplified
        version of reference explicitcalc.frobeniusdist)."""
        total, count = 0.0, 0
        for lbl in self.operations:
            diff = self.operations[lbl].to_dense() - other.operations[lbl].to_dense()
            total += np.sum(diff ** 2)
            count += diff.size
        for lbl in self.preps:
            diff = self.preps[lbl].to_dense() - other.preps[lbl].to_dense()
            total += np.sum(diff ** 2)
            count += diff.size
        for lbl in self.povms:
            diff = self.povms[lbl].to_dense() - other.povms[lbl].to_dense()
            total += np.sum(diff ** 2)
            count += diff.size
        return np.sqrt(total / count) if count else 0.0

    # -- serialization --------------------------------------------------------
    def to_nice_serialization(self):
        from pygsti_tpu.baseobjs.nicelyserializable import NicelySerializable
        def ser(obj):
            return obj.to_nice_serialization()
        return {
            'module': type(self).__module__, 'class': type(self).__name__,
            'state_space_labels': list(self.state_space.tensor_product_block_labels),
            'state_space_udims': list(self.state_space.tensor_product_block_dims),
            'basis': getattr(self.basis, 'name', 'pp'),
            'default_gate_type': self.default_gate_type,
            'default_prep_type': self.default_prep_type,
            'default_povm_type': self.default_povm_type,
            'preps': [[lbl.name if hasattr(lbl, 'name') else str(lbl), ser(o)]
                      for lbl, o in self.preps.items()],
            'povms': [[str(lbl), ser(o)] for lbl, o in self.povms.items()],
            'operations': [[list(lbl) if isinstance(lbl, tuple) else str(lbl), ser(o)]
                           for lbl, o in self.operations.items()],
        }

    @classmethod
    def from_nice_serialization(cls, state):
        from pygsti_tpu.baseobjs.nicelyserializable import NicelySerializable
        from pygsti_tpu.baseobjs.statespace import QuditSpace, QubitSpace
        from pygsti_tpu.baseobjs.label import Label
        lbls = [tuple(l) if isinstance(l, list) else l
                for l in state['state_space_labels']]
        udims = state['state_space_udims']
        ss = QubitSpace(lbls) if all(d == 2 for d in udims) else QuditSpace(lbls, udims)
        m = cls(ss, state['basis'], state['default_gate_type'],
                state['default_prep_type'], state['default_povm_type'])
        for lbl, s in state['preps']:
            m.preps[Label(lbl)] = NicelySerializable.from_nice_serialization(s)
        for lbl, s in state['povms']:
            m.povms[Label(lbl)] = NicelySerializable.from_nice_serialization(s)
        for lbl, s in state['operations']:
            key = Label(tuple(lbl)) if isinstance(lbl, list) else Label(lbl)
            m.operations[key] = NicelySerializable.from_nice_serialization(s)
        m._mark_for_rebuild()
        return m

    def __str__(self):
        lines = ["ExplicitOpModel (dim=%d, %d params):" % (self.dim, self.num_params)]
        for lbl in self.preps:
            lines.append("  prep %s" % str(lbl))
        for lbl in self.povms:
            lines.append("  povm %s" % str(lbl))
        for lbl in self.operations:
            lines.append("  op %s" % str(lbl))
        return "\n".join(lines)


from pygsti_tpu.models.layerrules import LayerRules as _ExplicitLayerRulesBase


class ExplicitLayerRules(_ExplicitLayerRulesBase):
    """Layer rules for explicit models: each circuit layer label IS an
    operations-dict key (reference: explicitmodel.ExplicitLayerRules:1952).
    Kept for API parity -- our explicit models look layers up directly."""

    def prep_layer_operator(self, model, layerlbl, caches):
        return model.preps[layerlbl]

    def povm_layer_operator(self, model, layerlbl, caches):
        return model.povms[layerlbl]

    def operation_layer_operator(self, model, layerlbl, caches):
        return model.operations[layerlbl]


def transform_composed_model(mdl, s):
    """A gauge-transformed copy of `mdl` that RETAINS its parameterization
    by composing the transform into each member rather than absorbing it
    into the dense matrices (reference:
    explicitmodel.transform_composed_model:1871).  In the TPU member
    design the parameterization is a pure function of the parameter
    vector, so transform_inplace already preserves it; this returns a
    transformed copy."""
    out = mdl.copy()
    out.transform_inplace(s)
    return out
