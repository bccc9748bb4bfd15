"""ModelMember base: a parameterization = static structure + pure function.

The reference's ModelMember (pygsti/modelmembers/modelmember.py:166) couples
parameter bookkeeping with mutable object state.  Here a member is a *pure
parameterization*: it owns

* ``num_params`` and an initial parameter vector,
* ``to_dense_jax(v)`` -- a pure, differentiable jnp function mapping the
  member's own parameter slice to its dense representation (superoperator
  matrix, state vector, or stack of effect vectors),
* ``gpindices`` -- the slice of the parent model's flat parameter vector
  this member reads (assigned by the model).

Current parameter values live in the *model's* flat vector; members keep a
cached copy (``paramvals``) only for host-side convenience (``to_dense()``).
"""

from __future__ import annotations

import numpy as np

from pygsti_tpu.baseobjs.nicelyserializable import NicelySerializable


class ModelMember(NicelySerializable):
    """Base class for operations / states / POVMs / instruments."""

    def __init__(self, initial_paramvals=None):
        self._paramvals = np.asarray(initial_paramvals, dtype=float) \
            if initial_paramvals is not None else np.empty(0)
        self.gpindices = None  # slice into parent model's paramvec

    # -- parameterization protocol ------------------------------------------
    @property
    def num_params(self):
        return len(self._paramvals)

    def to_vector(self):
        return self._paramvals.copy()

    def from_vector(self, v, close=False, dirty_value=True):
        self._paramvals = np.asarray(v, dtype=float).copy()

    def to_dense_jax(self, v):
        """Pure jnp function: own-params vector -> dense jnp array."""
        raise NotImplementedError()

    def to_dense(self, on_space='minimal'):
        """Dense numpy representation at the current parameter values.
        Uses to_vector() (not _paramvals) so wrapper members whose params
        live in child members (ExpErrorgenOp, RepeatedOp, ...) work too.

        Evaluated on the HOST (CPU) backend: these convenience calls happen
        in host-side loops (gauge opt setup, reportables, depolarize, ...)
        and a per-call transfer + readback through a remote-TPU tunnel costs
        hundreds of ms each -- measured 196s of a profiled bench run before
        this pin."""
        import jax
        import jax.numpy as jnp
        with jax.default_device(jax.local_devices(backend='cpu')[0]):
            return np.array(self.to_dense_jax(jnp.asarray(self.to_vector())))

    def deriv_wrt_params(self, wrt_filter=None):
        """Jacobian d(vec(dense))/d(params), shape (dense_size, num_params).
        Computed with jax.jacfwd (replaces the reference's hand-written
        derivatives).  Host-pinned like to_dense()."""
        import jax
        import jax.numpy as jnp
        with jax.default_device(jax.local_devices(backend='cpu')[0]):
            jac = jax.jacfwd(lambda v: self.to_dense_jax(v).reshape(-1))(
                jnp.asarray(self.to_vector()))
        jac = np.asarray(jac).reshape(-1, self.num_params)
        if wrt_filter is not None:
            jac = jac[:, wrt_filter]
        return jac

    # -- misc ----------------------------------------------------------------
    @property
    def dim(self):
        raise NotImplementedError()

    def copy(self):
        import copy
        return copy.deepcopy(self)

    def transform_inplace(self, s_matrix, s_inverse):
        """Apply a gauge transformation (subclasses that support it override)."""
        raise NotImplementedError("%s does not support gauge transforms" % type(self).__name__)

    def __str__(self):
        return "%s with %d params" % (type(self).__name__, self.num_params)
