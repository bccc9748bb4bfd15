"""Forward simulators: batched circuit evaluation under jit.

Replaces the reference's simulator zoo (pygsti/forwardsims/forwardsim.py:31,
matrixforwardsim.py, mapforwardsim.py + their Cython kernels) with one
TPU-native design: gather dense op tensors from the model's pure
``tensors_fn``, propagate a batch of state vectors through a ``lax.scan``
over circuit depth, and contract with effect rows.  Jacobians are
``jax.jacfwd`` of the whole probs function -- replacing the reference's
product caches, dproduct caches and finite differences at once
(matrixforwardsim.py:675-794, mapforwardsim_calc_densitymx.pyx:149-290).

``MatrixForwardSimulator`` and ``MapForwardSimulator`` are thin aliases kept
for API parity; on TPU both use the same scanned-propagation kernel.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pygsti_tpu.tools.jitutils import jit_fast as _jit_fast

from pygsti_tpu.baseobjs.outcomelabeldict import OutcomeLabelDict
from pygsti_tpu.circuits.circuit import Circuit
from pygsti_tpu.layouts.layout import CircuitOutcomeProbabilityLayout


def create_forward_simulator(sim_type, model):
    if sim_type in ('auto', 'map', 'matrix', 'dense'):
        return SimpleForwardSimulator(model)
    if isinstance(sim_type, ForwardSimulator):
        sim_type.model = model
        return sim_type
    raise ValueError("Unknown simulator type %r" % (sim_type,))


class ForwardSimulator(object):
    """Base class defining the bulk_* API (reference: forwardsim.py:31)."""

    def __init__(self, model=None):
        self.model = model

    def create_layout(self, circuits, dataset=None, resource_alloc=None,
                      array_types=('e',), derivative_dimensions=None, verbosity=0,
                      observed_outcomes_only=None):
        if observed_outcomes_only is None:
            import os
            env = os.environ.get('PYGSTI_TPU_SPARSE_OUTCOMES')
            if env is not None:
                observed_outcomes_only = env == '1'
            else:
                # auto: restrict to observed outcomes when the dense
                # all-outcomes element count would blow up exponentially
                # (> 8 outcomes/POVM, i.e. > 3 qubits).  The objective adds
                # the omitted-probability correction (reference:
                # objectivefns.py:1015 add_omitted_freqs, :4562).
                n_out = 0
                povms = getattr(self.model, 'povms', None)
                if dataset is not None and povms:
                    try:
                        n_out = max(p.num_outcomes for p in povms.values())
                    except Exception:
                        n_out = 0
                observed_outcomes_only = n_out > 8
        return CircuitOutcomeProbabilityLayout(
            circuits, self.model, dataset,
            observed_outcomes_only=observed_outcomes_only)

    # -- single circuit --------------------------------------------------------
    def probs(self, circuit, outcomes=None, time=None, clip_to=None):
        """Outcome probabilities of one circuit; `outcomes` restricts the
        returned dict.  This simulator is time-independent: a non-None
        `time` raises (time-dependent members route through the
        timestamped fills instead)."""
        if time is not None:
            raise NotImplementedError(
                "time-dependent probabilities are not supported by this "
                "simulator's probs(); use the time-dependent objective "
                "fills (bulk_fill_timedep_*) instead")
        layout = self.create_layout([circuit])
        p = self.bulk_fill_probs(None, layout)
        if clip_to is not None:
            p = np.clip(p, clip_to[0], clip_to[1])
        if outcomes is not None:
            keep = {OutcomeLabelDict.to_outcome(o) for o in outcomes}
        out = OutcomeLabelDict()
        for outcome, val in zip(layout.outcomes[0], p):
            if outcomes is not None and outcome not in keep:
                continue
            out[outcome] = float(val)
        return out

    def dprobs(self, circuit):
        layout = self.create_layout([circuit])
        dp = self.bulk_fill_dprobs(None, layout)
        out = {}
        for k, outcome in enumerate(layout.outcomes[0]):
            out[outcome] = dp[k]
        return out

    # -- bulk ------------------------------------------------------------------
    def bulk_probs(self, circuits, clip_to=None, resource_alloc=None, smartc=None):
        layout = self.create_layout(circuits)
        p = self.bulk_fill_probs(None, layout)
        if clip_to is not None:
            p = np.clip(p, clip_to[0], clip_to[1])
        out = {}
        for i, c in enumerate(layout.circuits):
            sl = layout.element_slices[i]
            d = OutcomeLabelDict()
            for k, outcome in enumerate(layout.outcomes[i]):
                d[outcome] = float(p[sl.start + k])
            out[c] = d
        return out

    def bulk_dprobs(self, circuits):
        layout = self.create_layout(circuits)
        dp = self.bulk_fill_dprobs(None, layout)
        out = {}
        for i, c in enumerate(layout.circuits):
            sl = layout.element_slices[i]
            d = {}
            for k, outcome in enumerate(layout.outcomes[i]):
                d[outcome] = dp[sl.start + k]
            out[c] = d
        return out

    def hprobs(self, circuit):
        """{outcome: [P, P] Hessian} of the circuit's outcome probabilities
        (reference: forwardsim.py:757 -- finite-difference there; exact
        second-order AD here)."""
        import jax
        import jax.numpy as jnp
        layout = self.create_layout([circuit])
        pf = self.probs_fn(layout)
        v = jnp.asarray(self.model.to_vector())
        H = np.asarray(jax.jacfwd(jax.jacrev(pf))(v))    # [n_el, P, P]
        out = {}
        for k, outcome in enumerate(layout.outcomes[0]):
            out[outcome] = H[k]
        return out

    def bulk_hprobs(self, circuits):
        """{circuit: {outcome: Hessian}} via one batched evaluation."""
        import jax
        import jax.numpy as jnp
        layout = self.create_layout(circuits)
        pf = self.probs_fn(layout)
        v = jnp.asarray(self.model.to_vector())
        H = np.asarray(jax.jacfwd(jax.jacrev(pf))(v))
        out = {}
        for i, c in enumerate(layout.circuits):
            sl = layout.element_slices[i]
            out[c] = {outcome: H[sl.start + k]
                      for k, outcome in enumerate(layout.outcomes[i])}
        return out

    def bulk_fill_hprobs(self, array_to_fill, layout,
                         pr_array_to_fill=None, deriv1_array_to_fill=None,
                         deriv2_array_to_fill=None):
        """Fill [n_elements, P, P] Hessian array (reference:
        forwardsim.py:958 bulk_fill_hprobs)."""
        import jax
        import jax.numpy as jnp
        pf = self.probs_fn(layout)
        v = jnp.asarray(self.model.to_vector())
        if pr_array_to_fill is not None:
            pr_array_to_fill[:] = np.asarray(pf(v))
        if deriv1_array_to_fill is not None or deriv2_array_to_fill is not None:
            J = np.asarray(jax.jacfwd(pf)(v))
            if deriv1_array_to_fill is not None:
                deriv1_array_to_fill[:] = J
            if deriv2_array_to_fill is not None:
                deriv2_array_to_fill[:] = J
        H = np.asarray(jax.jacfwd(jax.jacrev(pf))(v))
        if array_to_fill is not None:
            array_to_fill[:] = H
        return H

    def bulk_fill_probs(self, array_to_fill, layout):
        raise NotImplementedError()

    def bulk_fill_dprobs(self, array_to_fill, layout, pr_array_to_fill=None):
        raise NotImplementedError()


class SimpleForwardSimulator(ForwardSimulator):
    """Dense scanned-propagation simulator (the TPU workhorse).

    Compiled artifacts are cached per layout id; the jitted functions close
    over the layout's static index tensors and the model's tensors_fn.
    """

    def __init__(self, model=None, param_blk_size=None, mesh=None):
        super().__init__(model)
        self.param_blk_size = param_blk_size  # param chunking for jacfwd memory
        self.mesh = mesh  # jax.sharding.Mesh: shard the circuit/element axis
        self._cache = {}

    # -- compiled function factory --------------------------------------------
    def _compiled(self, layout):
        # The cache lives ON the layout (not keyed by id(layout) in the
        # simulator): id() values are reused once a layout is garbage
        # collected, so a simulator-held id-keyed cache can serve STALE
        # compiled graphs -- wrong probabilities -- for a fresh layout that
        # happens to land at the same address.
        cache = getattr(layout, '_sim_compiled_cache', None)
        if cache is None:
            cache = layout._sim_compiled_cache = {}
        key = id(self)
        hit = cache.get(key)
        if hit is not None:
            return hit[1]
        entry = self._build(layout)
        cache[key] = (self, entry)   # hold the sim alive so ITS id stays valid
        return entry

    def _build(self, layout):
        model = self.model
        compute = model.tensors_fn()
        dim = model.dim
        op_idx = jnp.asarray(layout.op_indices)      # [B, D]
        prep_idx = jnp.asarray(layout.prep_index)    # [B]
        elem_c = jnp.asarray(layout.elem_circuit)    # [E]
        elem_e = jnp.asarray(layout.elem_effect)     # [E]
        mesh = self.mesh
        if mesh is not None:
            # Shard the batch axis across the mesh.  The constraint is
            # applied INSIDE the traced function (not via device_put at
            # build time): jitted functions may not close over jax.Arrays
            # spanning non-addressable devices, so under multi-process
            # jax.distributed the index tensors must enter as host constants
            # that the partitioner shards (XLA then inserts the collectives
            # for the element gathers and JTJ reductions).
            from jax.sharding import NamedSharding, PartitionSpec as _P

            def _shard(a):
                spec = _P('circuits', *([None] * (a.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    a, NamedSharding(mesh, spec))
        else:
            def _shard(a):
                return a

        # Reduced-precision propagation: the scan's matmuls run at this dtype
        # and the result is cast back to the model dtype.  On TPU f64 is
        # software-emulated, so float32 propagation trades ~1e-7 probability
        # error (far below shot noise) for a ~5x faster residual evaluation
        # (measured: full 2Q GST bench 60.1s -> 43.3s warm with final Nsigma
        # unchanged at the statistical optimum).  Defaults: float32 on TPU,
        # exact (model dtype) elsewhere; override with
        # PYGSTI_TPU_PROBS_DTYPE=float32|float64|none.
        import os as _os
        _probs_dtype = _os.environ.get('PYGSTI_TPU_PROBS_DTYPE')
        if _probs_dtype is None and jax.default_backend() == 'tpu':
            _probs_dtype = 'float32'
        if _probs_dtype in ('none', '', 'float64'):
            _probs_dtype = None

        # Probs kernel selection (PYGSTI_TPU_PROBS_KERNEL=scan|fact).
        # Default: the sequential one-hot SCAN.  Measured on the 2Q maxL=64
        # bench (r5): the germ-power factorized kernel is only ~8% faster
        # per lsvec (4.06 vs 4.40 ms) but its reassociated f32 products are
        # ~6x noisier (max|dp| 6.9e-7 vs 1.1e-7 vs the f64 oracle), which
        # raises the LM's noise floor enough to stall the fit at a slightly
        # worse optimum (final Nsigma 2.02 vs 1.61).  The factorization
        # still powers the 'prodjac' Jacobian mode and remains available
        # here via PYGSTI_TPU_PROBS_KERNEL=fact (e.g. for very deep
        # circuits, where the ~log(depth) level count wins outright).
        _kernel = _os.environ.get('PYGSTI_TPU_PROBS_KERNEL', 'scan')
        fact = layout.factorization if _kernel == 'fact' else None

        def _scan_probs(v):
            op_idx_s, prep_idx_s = _shard(op_idx), _shard(prep_idx)
            elem_c_s, elem_e_s = _shard(elem_c), _shard(elem_e)
            t = compute(v)
            out_dtype = t.preps.dtype
            if _probs_dtype:
                t = t._replace(ops=t.ops.astype(_probs_dtype),
                               preps=t.preps.astype(_probs_dtype),
                               effects=t.effects.astype(_probs_dtype))
            eye = jnp.eye(dim, dtype=t.ops.dtype)[None]
            G = jnp.concatenate([t.ops, eye], axis=0)      # [K+1, d, d]
            rho = t.preps[prep_idx_s]                      # [B, d]
            if layout.max_depth > 0:
                def step(carry, idx_col):
                    # one-hot contraction instead of gather: TPU gathers of
                    # [B, d, d] blocks are memory-bound and slow; computing
                    # all K+1 candidate updates on the MXU and selecting is
                    # ~4x faster despite the extra FLOPs
                    y = jnp.einsum('bj,kij->bki', carry, G)
                    onehot = jax.nn.one_hot(idx_col, G.shape[0],
                                            dtype=carry.dtype)
                    return jnp.einsum('bki,bk->bi', y, onehot), None
                rho, _ = jax.lax.scan(step, rho, op_idx_s.T)
            E = t.effects[elem_e_s]                        # [E, d]
            p = jnp.sum(E * rho[elem_c_s], axis=1)         # [E]
            return p.astype(out_dtype) if _probs_dtype else p

        if fact is not None:
            # Germ-power product-cache evaluation (layouts/prodcache.py; the
            # EvalTree analog, reference matrixforwardsim.py:675-729): build
            # shared subproducts as ~log(depth) LEVELS of batched matmuls,
            # then contract tiny per-circuit pieces.  Replaces the depth-D
            # sequential scan -- the dominant latency of the scan kernel.
            # NOTE: close over HOST numpy constants -- eager jnp.asarray here
            # would commit these to the (possibly remote/tunneled) device and
            # MLIR constant embedding would then read each back, which is
            # pathologically slow on tunneled TPU runtimes.
            lv = tuple((np.asarray(l), np.asarray(r)) for l, r in fact.levels)
            a_pfx = np.asarray(fact.a_pfx_cache)     # [n_pfx] ext-table rows
            e_sfx = np.asarray(fact.e_sfx_cache)     # [n_sfx] ext-table rows
            n_preps, n_eff = int(fact.n_preps), int(fact.n_effects)
            pair_g = np.asarray(fact.pair_g)
            pair_a = np.asarray(fact.pair_a)
            elem_pair = np.asarray(fact.elem_pair)
            elem_erow = np.asarray(fact.elem_erow)

            # Cache-level matmul precision: repeated-squaring product chains
            # amplify low-precision matmul error ~6x over the sequential scan
            # (measured max|dp| 6.9e-7 vs 1.1e-7 at f32 on the 2Q bench
            # workload), enough to push the LM to a slightly worse optimum
            # (final Nsigma 2.02 vs 1.61).  The cache levels + grids are a
            # small fraction of the kernel's FLOPs (element gathers/dots
            # dominate), so they always run at HIGHEST MXU precision.
            _hi = jax.lax.Precision.HIGHEST

            def probs(v):
                elem_pair_s, elem_erow_s = _shard(elem_pair), _shard(elem_erow)
                t = compute(v)
                out_dtype = t.preps.dtype
                if _probs_dtype:
                    t = t._replace(ops=t.ops.astype(_probs_dtype),
                                   preps=t.preps.astype(_probs_dtype),
                                   effects=t.effects.astype(_probs_dtype))
                eye = jnp.eye(dim, dtype=t.ops.dtype)[None]
                G = jnp.concatenate([t.ops, eye], axis=0)    # [K+1, d, d]
                T = G
                for lefts, rights in lv:                     # cache levels
                    T = jnp.concatenate(
                        [T, jnp.matmul(T[lefts], T[rights], precision=_hi)],
                        axis=0)
                # a-grid [n_pfx, n_preps, d]: every prefix product applied to
                # every prep -- one batched matmul (no scan; its forward-mode
                # tangents stay dense grid matmuls too)
                a = jnp.einsum('mij,rj->mri', T[a_pfx], t.preps[:n_preps],
                               precision=_hi)
                a = a.reshape(-1, dim)                       # flat (pfx, prep)
                # e-grid [n_sfx, n_eff, d]: every effect pushed back through
                # every suffix product
                e = jnp.einsum('oi,mij->moj', t.effects[:n_eff], T[e_sfx],
                               precision=_hi)
                e = e.reshape(-1, dim)                       # flat (sfx, eff)
                X = jnp.einsum('qij,qj->qi', T[pair_g], a[pair_a],
                               precision=_hi)                # [Q, d]
                p = jnp.sum(e[elem_erow_s] * X[elem_pair_s], axis=1)
                return p.astype(out_dtype) if _probs_dtype else p
        else:
            probs = _scan_probs

        # jit pays off only for large batches; small/one-off layouts (e.g.
        # single-circuit .probabilities() queries) run eagerly.
        use_jit = layout.num_elements >= 64
        from pygsti_tpu.tools.jitutils import big_dim_effort
        _eff = big_dim_effort(dim)
        probs_c = _jit_fast(probs, effort_default=_eff) if use_jit else probs
        dprobs_c = _jit_fast(jax.jacfwd(probs), effort_default=_eff) \
            if use_jit else jax.jacfwd(probs)

        return {'probs': probs_c, 'dprobs': dprobs_c, 'probs_raw': probs}

    # -- API -------------------------------------------------------------------
    def bulk_fill_probs(self, array_to_fill, layout):
        fns = self._compiled(layout)
        v = jnp.asarray(self.model.to_vector())
        p = np.asarray(fns['probs'](v))
        if array_to_fill is not None:
            array_to_fill[:] = p
        return p

    def bulk_fill_dprobs(self, array_to_fill, layout, pr_array_to_fill=None):
        fns = self._compiled(layout)
        v = jnp.asarray(self.model.to_vector())
        dp = np.asarray(fns['dprobs'](v))
        if pr_array_to_fill is not None:
            pr_array_to_fill[:] = np.asarray(fns['probs'](v))
        if array_to_fill is not None:
            array_to_fill[:] = dp
        return dp

    # -- jit-native access (used by objective functions) -----------------------
    def probs_fn(self, layout):
        """The pure jnp probs function v -> [n_elements] (not yet jitted)."""
        return self._compiled(layout)['probs_raw']


# API-parity aliases (the reference's two dense simulators collapse into one
# scanned-propagation kernel on TPU: matrixforwardsim.py / mapforwardsim.py).
class MatrixForwardSimulator(SimpleForwardSimulator):
    pass


class MapForwardSimulator(SimpleForwardSimulator):
    _tuning_warned = False

    def __init__(self, model=None, max_cache_size=None, num_atoms=None, param_blk_size=None):
        super().__init__(model, param_blk_size)
        self.max_cache_size = max_cache_size
        self.num_atoms = num_atoms
        if (max_cache_size is not None or num_atoms is not None) \
                and not MapForwardSimulator._tuning_warned:
            import warnings
            warnings.warn(
                "MapForwardSimulator accepts num_atoms/max_cache_size for API "
                "parity only; the TPU scanned-propagation kernel has no prefix "
                "cache or atom decomposition, so these arguments are ignored. "
                "(Work decomposition is controlled by the device mesh instead; "
                "see parallel/mesh.py.)")
            MapForwardSimulator._tuning_warned = True


class DistributableForwardSimulator(SimpleForwardSimulator):
    """Name-parity alias (reference: forwardsims/distforwardsim.py:
    DistributableForwardSimulator).  Distribution here is a
    ``jax.sharding.Mesh`` over the circuit-batch axis (set ``sim.mesh``);
    XLA inserts the collectives the reference implements with MPI atoms and
    parameter blocks."""

    def __init__(self, model=None, mesh=None, num_atoms=None,
                 processor_grid=None, param_blk_sizes=None):
        super().__init__(model)
        if mesh is not None:
            self.mesh = mesh


class CacheForwardSimulator(SimpleForwardSimulator):
    """Forward simulator carrying a persistent per-layout cache passed to
    compute routines (reference: forwardsim.CacheForwardSimulator:884).
    In the TPU design, compiled-executable caching is handled by the jax
    persistent compilation cache; this class adds the reference's explicit
    per-circuit cache hook for custom derived simulators."""

    def create_layout(self, circuits, dataset=None, resource_alloc=None,
                      array_types=(), derivative_dimensions=None,
                      verbosity=0):
        layout = super().create_layout(circuits, dataset, resource_alloc,
                                       array_types, derivative_dimensions,
                                       verbosity)
        layout.cache = {c: None for c in circuits}  # CachedCOPALayout analog
        return layout
