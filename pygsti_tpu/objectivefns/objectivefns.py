"""Objective functions: raw per-element functions + model-dataset stores.

The raw functions reproduce the reference's formulas exactly
(pygsti/objectivefns/objectivefns.py: RawChi2Function:1750,
RawPoissonPicDeltaLogLFunction:2829, RawDeltaLogLFunction:3231,
RawFreqWeightedChi2Function:2405, RawTVDFunction:4042) but in jnp, so the
whole probs -> lsvec -> JTJ pipeline is one jitted graph.

The MDC ("model-dataset-circuits") objective compiles three device
functions per (model-structure, layout):
  fn(v)       -> objective value  (sum of terms)
  lsvec(v)    -> least-squares residual vector  [n_elements + n_penalty]
  jtj_jtf(v)  -> (f, JTJ, JTf)  -- what the LM optimizer consumes
with d(lsvec) computed as raw.dlsvec * jacfwd(probs) (the reference's chain
rule, objectivefns.py:1128-1749), keeping regularization kinks out of AD.
"""

from __future__ import annotations

import collections
import os

import numpy as np

import jax
import jax.numpy as jnp

from pygsti_tpu.tools.jitutils import jit_fast as _jit_fast

DEFAULT_MIN_PROB_CLIP = 1e-4
DEFAULT_RADIUS = 1e-4
DEFAULT_MIN_PROB_CLIP_FOR_WEIGHTING = 1e-4


class RawObjectiveFunction(object):
    """Base: per-element objective f(p; counts, total, freqs)."""

    def lsvec(self, probs, counts, total_counts, freqs):
        return jnp.sqrt(self.terms(probs, counts, total_counts, freqs))

    def dlsvec(self, probs, counts, total_counts, freqs):
        lsvec = self.lsvec(probs, counts, total_counts, freqs)
        pt5_over = jnp.where(lsvec < 1e-100, 0.0, 0.5 / jnp.maximum(lsvec, 1e-100))
        return pt5_over * self.dterms(probs, counts, total_counts, freqs)

    def terms(self, probs, counts, total_counts, freqs):
        raise NotImplementedError()

    def dterms(self, probs, counts, total_counts, freqs):
        raise NotImplementedError()

    def fn(self, probs, counts, total_counts, freqs):
        return jnp.sum(self.terms(probs, counts, total_counts, freqs))

    def chi2k_distributed_qty(self, objective_function_value):
        return objective_function_value

    def set_regularization(self, **kwargs):
        pass

    # Zero-frequency terms (reference: objectivefns.py:839,1964): used for
    # elements with count == 0 AND for the omitted-probability correction of
    # sparse observed-outcome layouts (terms[firsts] += zero_freq_terms(N,
    # omitted_prob), reference objectivefns.py:4562).
    def zero_freq_terms(self, total_counts, probs):
        if hasattr(self, '_zero_freq_terms'):
            return self._zero_freq_terms(total_counts, probs)
        raise NotImplementedError("Derived classes must implement this!")

    def zero_freq_dterms(self, total_counts, probs):
        if hasattr(self, '_zero_freq_dterms'):
            return self._zero_freq_dterms(total_counts, probs)
        raise NotImplementedError("Derived classes must implement this!")


class RawChi2Function(RawObjectiveFunction):
    """N(p-f)^2 / max(p, minp) with its signed square-root lsvec."""

    def __init__(self, regularization=None, name='chi2'):
        self.name = name
        self.min_prob_clip_for_weighting = DEFAULT_MIN_PROB_CLIP_FOR_WEIGHTING
        if regularization:
            self.set_regularization(**regularization)

    def set_regularization(self, min_prob_clip_for_weighting=None):
        self.min_prob_clip_for_weighting = (
            min_prob_clip_for_weighting if min_prob_clip_for_weighting is not None
            else DEFAULT_MIN_PROB_CLIP_FOR_WEIGHTING)

    def _weights(self, p, f, n):
        cp = jnp.clip(p, self.min_prob_clip_for_weighting, None)
        return jnp.sqrt(n / cp)

    def _dweights(self, p, f, n):
        minp = self.min_prob_clip_for_weighting
        cp = jnp.clip(p, minp, None)
        return jnp.where(p > minp, -0.5 * jnp.sqrt(n) / cp ** 1.5, 0.0)

    def lsvec(self, probs, counts, total_counts, freqs):
        return (probs - freqs) * self._weights(probs, freqs, total_counts)

    def dlsvec(self, probs, counts, total_counts, freqs):
        w = self._weights(probs, freqs, total_counts)
        dw = self._dweights(probs, freqs, total_counts)
        return w + (probs - freqs) * dw

    def terms(self, probs, counts, total_counts, freqs):
        return self.lsvec(probs, counts, total_counts, freqs) ** 2

    def dterms(self, probs, counts, total_counts, freqs):
        ls = self.lsvec(probs, counts, total_counts, freqs)
        return 2 * ls * self.dlsvec(probs, counts, total_counts, freqs)

    def zero_freq_terms(self, total_counts, probs):
        # reference: objectivefns.py RawChi2Function.zero_freq_terms
        cp = jnp.clip(probs, self.min_prob_clip_for_weighting, None)
        return total_counts * probs ** 2 / cp

    def zero_freq_dterms(self, total_counts, probs):
        cp = jnp.clip(probs, self.min_prob_clip_for_weighting, None)
        return jnp.where(probs >= self.min_prob_clip_for_weighting,
                         total_counts, 2 * total_counts * probs / cp)


class RawFreqWeightedChi2Function(RawChi2Function):
    """N(p-f)^2 / max(f, minf): frequency-weighted chi2
    (reference: objectivefns.py:2405)."""

    def __init__(self, regularization=None, name='fwchi2'):
        self.name = name
        self.min_freq_clip_for_weighting = 1e-4
        if regularization:
            self.set_regularization(**regularization)

    def set_regularization(self, min_freq_clip_for_weighting=None):
        if min_freq_clip_for_weighting is not None:
            self.min_freq_clip_for_weighting = min_freq_clip_for_weighting

    def _weights(self, p, f, n):
        return jnp.sqrt(n / jnp.clip(f, self.min_freq_clip_for_weighting, None))

    def _dweights(self, p, f, n):
        return jnp.zeros_like(p)

    def zero_freq_terms(self, total_counts, probs):
        return total_counts * probs ** 2 / self.min_freq_clip_for_weighting

    def zero_freq_dterms(self, total_counts, probs):
        return 2 * total_counts * probs / self.min_freq_clip_for_weighting


class RawPoissonPicDeltaLogLFunction(RawObjectiveFunction):
    """The GST workhorse: 2*Delta(logL) in the Poisson picture,
    N*f*log(f/p) - N*(f-p), with 'minp' Taylor-patch regularization and
    'harsh' (cubic) zero-frequency terms (reference: objectivefns.py:2829)."""

    def __init__(self, regularization=None, name='dlogl'):
        self.name = name
        self.min_p = DEFAULT_MIN_PROB_CLIP
        self.radius = DEFAULT_RADIUS
        if regularization:
            self.set_regularization(**regularization)

    def set_regularization(self, min_prob_clip=DEFAULT_MIN_PROB_CLIP,
                           radius=DEFAULT_RADIUS, pfratio_stitchpt=None,
                           pfratio_derivpt=None, fmin=None):
        assert pfratio_stitchpt is None, "only 'minp' regularization implemented"
        self.min_p = min_prob_clip
        self.radius = radius

    def chi2k_distributed_qty(self, objective_function_value):
        return 2 * objective_function_value

    def _zero_freq_terms(self, n, probs):
        a = self.radius
        return n * jnp.where(probs >= a, probs,
                             (-1.0 / (3 * a ** 2)) * probs ** 3 + probs ** 2 / a + a / 3.0)

    def _zero_freq_dterms(self, n, probs):
        a = self.radius
        return n * jnp.where(probs >= a, 1.0,
                             (-1.0 / a ** 2) * probs ** 2 + 2 * probs / a)

    def terms(self, probs, counts, total_counts, freqs):
        freqs_nozeros = jnp.where(counts == 0, 1.0, freqs)
        freq_term = counts * (jnp.log(freqs_nozeros) - 1.0)
        pos_probs = jnp.where(probs < self.min_p, self.min_p, probs)
        c0 = total_counts - counts / self.min_p
        c1 = 0.5 * counts / (self.min_p ** 2)
        terms = freq_term - counts * jnp.log(pos_probs) + total_counts * pos_probs
        # clamp roundoff-negative values to 0.  NOT jnp.maximum(terms, 0):
        # at the per-element minimum terms == 0 exactly and maximum()'s
        # tie-break sends AD through the constant branch, zeroing the
        # curvature (breaks AD Hessians); where(terms < 0, ...) keeps the
        # live branch at the tie.
        terms = jnp.where(terms < 0, jnp.zeros_like(terms), terms)
        # quadratic extrapolation of logl below min_p
        terms = jnp.where(probs < self.min_p,
                          terms + c0 * (probs - self.min_p) + c1 * (probs - self.min_p) ** 2,
                          terms)
        terms = jnp.where(counts == 0, self._zero_freq_terms(total_counts, probs), terms)
        return terms

    def dterms(self, probs, counts, total_counts, freqs):
        pos_probs = jnp.where(probs < self.min_p, self.min_p, probs)
        c0 = total_counts - counts / self.min_p
        c1 = 0.5 * counts / (self.min_p ** 2)
        dterms = total_counts - counts / pos_probs
        dterms_taylor = c0 + 2 * c1 * (probs - self.min_p)
        dterms = jnp.where(probs < self.min_p, dterms_taylor, dterms)
        dterms = jnp.where(counts == 0, self._zero_freq_dterms(total_counts, probs), dterms)
        return dterms

    def hterms(self, probs, counts, total_counts, freqs):
        pos_probs = jnp.where(probs < self.min_p, self.min_p, probs)
        c1 = 0.5 * counts / (self.min_p ** 2)
        d2 = jnp.where(probs < self.min_p, 2 * c1, counts / pos_probs ** 2)
        a = self.radius
        zfc = jnp.where(probs >= a, 0.0,
                        total_counts * ((-2.0 / a ** 2) * probs + 2.0 / a))
        return jnp.where(counts == 0, zfc, d2)

    def dlsvec(self, probs, counts, total_counts, freqs):
        """Numerically-stable d(sqrt(terms))/dp.

        Near the per-element minimum (p ~= f) the direct 0.5*dterms/
        sqrt(terms) form divides cancellation noise by cancellation noise
        (terms is computed by subtracting O(N log) quantities); below the
        roundoff floor we switch to the exact quadratic-regime limit
        d(sqrt(0.5*h*(p-f)^2))/dp = sqrt(h/2)*sign(p-f), which is both
        stable and more accurate than the reference's guarded division
        (objectivefns.py:671)."""
        terms = self.terms(probs, counts, total_counts, freqs)
        dterms = self.dterms(probs, counts, total_counts, freqs)
        h = self.hterms(probs, counts, total_counts, freqs)
        eps = jnp.finfo(probs.dtype).eps
        noise_floor = 100.0 * eps * jnp.maximum(total_counts, 1.0)
        lsvec = jnp.sqrt(jnp.maximum(terms, 1e-300))
        std = 0.5 * dterms / jnp.maximum(lsvec, 1e-150)
        quad = jnp.sqrt(jnp.maximum(h, 0.0) / 2.0) * jnp.sign(dterms)
        return jnp.where(terms < noise_floor, quad, std)


class RawDeltaLogLFunction(RawObjectiveFunction):
    """Non-Poisson-picture delta log likelihood: N*f*log(f/p)
    (reference: objectivefns.py:3231)."""

    def __init__(self, regularization=None, name='dlogl-nonpoisson'):
        self.name = name
        self.min_p = DEFAULT_MIN_PROB_CLIP
        if regularization:
            self.set_regularization(**regularization)

    def set_regularization(self, min_prob_clip=DEFAULT_MIN_PROB_CLIP):
        self.min_p = min_prob_clip

    def chi2k_distributed_qty(self, objective_function_value):
        return 2 * objective_function_value

    def terms(self, probs, counts, total_counts, freqs):
        freqs_nozeros = jnp.where(counts == 0, 1.0, freqs)
        pos_probs = jnp.where(probs < self.min_p, self.min_p, probs)
        c0 = -counts / self.min_p
        c1 = 0.5 * counts / (self.min_p ** 2)
        terms = counts * (jnp.log(freqs_nozeros) - jnp.log(pos_probs))
        terms = jnp.where(probs < self.min_p,
                          terms + c0 * (probs - self.min_p) + c1 * (probs - self.min_p) ** 2,
                          terms)
        # NOTE: unlike the Poisson-picture divergence, per-outcome
        # non-Poisson terms N*f*log(f/p) are legitimately negative when
        # p > f, so no nonnegativity clamp is applied (reference:
        # objectivefns.py:3231 RawDeltaLogLFunction.terms)
        return jnp.where(counts == 0, jnp.zeros_like(probs), terms)

    def lsvec(self, probs, counts, total_counts, freqs):
        # least-squares use requires nonnegative terms (the reference raises
        # here); clamp inside the sqrt so LM remains usable, without
        # affecting fn()/terms() values
        t = self.terms(probs, counts, total_counts, freqs)
        return jnp.sqrt(jnp.where(t < 0, jnp.zeros_like(t), t))

    def dterms(self, probs, counts, total_counts, freqs):
        pos_probs = jnp.where(probs < self.min_p, self.min_p, probs)
        c0 = -counts / self.min_p
        c1 = 0.5 * counts / (self.min_p ** 2)
        dterms = -counts / pos_probs
        dterms = jnp.where(probs < self.min_p, c0 + 2 * c1 * (probs - self.min_p), dterms)
        return jnp.where(counts == 0, jnp.zeros_like(probs), dterms)

    def zero_freq_terms(self, total_counts, probs):
        return jnp.zeros_like(probs)

    def zero_freq_dterms(self, total_counts, probs):
        return jnp.zeros_like(probs)


class RawTVDFunction(RawObjectiveFunction):
    """Total variation distance terms: 0.5 * N * |p - f|
    (reference: objectivefns.py:4042)."""

    def __init__(self, regularization=None, name='tvd'):
        self.name = name

    def terms(self, probs, counts, total_counts, freqs):
        return 0.5 * total_counts * jnp.abs(probs - freqs)

    def dterms(self, probs, counts, total_counts, freqs):
        return 0.5 * total_counts * jnp.sign(probs - freqs)

    def zero_freq_terms(self, total_counts, probs):
        # reference RawTVDFunction.zero_freq_terms: 0.5*|p| (no N factor)
        return 0.5 * jnp.abs(probs)

    def zero_freq_dterms(self, total_counts, probs):
        return 0.5 * jnp.sign(probs)


class RawChiAlphaFunction(RawObjectiveFunction):
    """N[x + 1/(alpha x^alpha) - (1 + 1/alpha)] with x = p/f; interpolates
    logL (alpha->0) <-> chi2 (alpha=1) (reference: objectivefns.py:2112).

    Below the stitch point ``x0`` the function is replaced by its Taylor
    expansion with derivatives evaluated at ``x1``; zero-count terms use a
    'harsh' cubic (radius) or 'relaxed' quadratic (fmin) regularization.
    """

    def __init__(self, regularization=None, name='chialpha', alpha=1):
        self.name = name
        self.alpha = alpha
        self.x0 = 0.01
        self.x1 = 0.01
        self.radius = 1e-4
        self.fmin = None
        if regularization:
            self.set_regularization(**regularization)

    def set_regularization(self, pfratio_stitchpt=0.01, pfratio_derivpt=0.01,
                           radius=None, fmin=None):
        self.x0 = pfratio_stitchpt
        self.x1 = pfratio_derivpt
        if radius is None and fmin is None:
            radius = 1e-4  # sensible default (reference requires one of them)
        self.radius = radius
        self.fmin = fmin

    def _zero_freq_terms(self, total_counts, probs):
        if self.radius is not None:
            a = self.radius
            return total_counts * jnp.where(
                probs >= a, probs,
                (-1.0 / (3 * a ** 2)) * probs ** 3 + probs ** 2 / a + a / 3.0)
        c1 = (0.5 / self.fmin) * (1. + self.alpha) / (self.x1 ** (2 + self.alpha))
        p0 = 1.0 / c1
        return total_counts * jnp.where(probs > p0, probs, c1 * probs ** 2)

    def _zero_freq_dterms(self, total_counts, probs):
        if self.radius is not None:
            a = self.radius
            return total_counts * jnp.where(
                probs >= a, 1.0, (-1.0 / a ** 2) * probs ** 2 + 2 * probs / a)
        c1 = (0.5 / self.fmin) * (1. + self.alpha) / (self.x1 ** (2 + self.alpha))
        p0 = 1.0 / c1
        return total_counts * jnp.where(probs > p0, 1.0, 2 * c1 * probs)

    def terms(self, probs, counts, total_counts, freqs):
        alpha, x0 = self.alpha, self.x0
        freqs_nozeros = jnp.where(counts == 0, 1.0, freqs)
        x = probs / freqs_nozeros
        itaylor = x < x0
        c0 = 1. - 1. / (self.x1 ** (1 + alpha))
        c1 = 0.5 * (1. + alpha) / self.x1 ** (2 + alpha)
        xt = jnp.where(itaylor, x0, x)
        t = counts * (xt + 1.0 / (alpha * xt ** alpha) - (1.0 + 1.0 / alpha))
        t = jnp.where(itaylor,
                      t + c0 * counts * (x - x0) + c1 * counts * (x - x0) ** 2, t)
        return jnp.where(counts == 0, self._zero_freq_terms(total_counts, probs), t)

    def dterms(self, probs, counts, total_counts, freqs):
        alpha, x0 = self.alpha, self.x0
        freqs_nozeros = jnp.where(counts == 0, 1.0, freqs)
        x = probs / freqs_nozeros
        itaylor = x < x0
        c0 = 1. - 1. / (self.x1 ** (1 + alpha))
        c1 = 0.5 * (1. + alpha) / self.x1 ** (2 + alpha)
        x_safe = jnp.where(x <= 0, x0, x)  # guard x**(1+alpha) at x<=0
        d = total_counts * (1 - 1. / x_safe ** (1. + alpha))
        d = jnp.where(itaylor, total_counts * (c0 + 2 * c1 * (x - x0)), d)
        return jnp.where(counts == 0,
                         self._zero_freq_dterms(total_counts, probs), d)


class RawCustomWeightedChi2Function(RawObjectiveFunction):
    """custom_weight^2 (p-f)^2 with user-supplied per-element weights
    (default 1) (reference: objectivefns.py:2606)."""

    def __init__(self, regularization=None, name='cwchi2', custom_weights=None):
        self.name = name
        self.custom_weights = custom_weights

    def _w(self, probs):
        if self.custom_weights is None:
            return jnp.ones_like(probs)
        return jnp.asarray(self.custom_weights)

    def lsvec(self, probs, counts, total_counts, freqs):
        return self._w(probs) * (probs - freqs)

    def dlsvec(self, probs, counts, total_counts, freqs):
        return self._w(probs)

    def terms(self, probs, counts, total_counts, freqs):
        return self.lsvec(probs, counts, total_counts, freqs) ** 2

    def dterms(self, probs, counts, total_counts, freqs):
        w = self._w(probs)
        return 2 * w * w * (probs - freqs)


class RawMaxLogLFunction(RawObjectiveFunction):
    """N*f*log(f) (independent of p) — the max-model log-likelihood terms
    (reference: objectivefns.py:3698)."""

    def __init__(self, regularization=None, name='maxlogl', poisson_picture=True):
        self.name = name
        self.poisson_picture = poisson_picture

    def terms(self, probs, counts, total_counts, freqs):
        freqs_nozeros = jnp.where(counts == 0, 1.0, freqs)
        if self.poisson_picture:
            return counts * (jnp.log(freqs_nozeros) - 1.0)
        return counts * jnp.log(freqs_nozeros)

    def dterms(self, probs, counts, total_counts, freqs):
        return jnp.zeros_like(probs)


class RawAbsPower(RawObjectiveFunction):
    """|p - f|^power elementwise (reference: objectivefns.py:4254)."""

    def __init__(self, power, regularization=None, name='Lp^p'):
        assert power >= 1
        self.name = name
        self.power = power

    def chi2k_distributed_qty(self, objective_function_value):
        return -1

    def terms(self, probs, counts, total_counts, freqs):
        return jnp.abs(probs - freqs) ** self.power

    def dterms(self, probs, counts, total_counts, freqs):
        t = probs - freqs
        return self.power * jnp.sign(t) * jnp.abs(t) ** (self.power - 1)


_RAW_CLASSES = {
    'chi2': RawChi2Function,
    'fwchi2': RawFreqWeightedChi2Function,
    'freq-weighted-chi2': RawFreqWeightedChi2Function,
    'logl': RawPoissonPicDeltaLogLFunction,
    'dlogl': RawPoissonPicDeltaLogLFunction,
    'dlogl-nonpoisson': RawDeltaLogLFunction,
    'tvd': RawTVDFunction,
    'chialpha': RawChiAlphaFunction,
    'cwchi2': RawCustomWeightedChi2Function,
    'maxlogl': RawMaxLogLFunction,
}


class ObjectiveFunctionBuilder(object):
    """Serializable recipe for building an MDC objective (reference:
    objectivefns.py:129)."""

    @classmethod
    def cast(cls, obj):
        if isinstance(obj, cls):
            return obj
        if obj is None:
            return cls.create_from('logl')
        if isinstance(obj, str):
            return cls.create_from(obj)
        if isinstance(obj, dict):
            return cls.create_from(**obj)
        raise ValueError("Cannot cast %r to ObjectiveFunctionBuilder" % (obj,))

    @classmethod
    def create_from(cls, objective='logl', freq_weighted_chi2=False, **kwargs):
        if objective == 'chi2' and freq_weighted_chi2:
            objective = 'fwchi2'
        return cls(objective, **kwargs)

    def __init__(self, name='logl', description=None, regularization=None, penalties=None):
        self.name = name
        self.description = description
        self.regularization = regularization or {}
        self.penalties = penalties or {}

    def build_raw(self):
        return _RAW_CLASSES[self.name](self.regularization)

    def build(self, model, dataset, circuits, resource_alloc=None, verbosity=0):
        return TimeIndependentMDCObjectiveFunction(
            self.build_raw(), model, dataset, circuits, penalties=self.penalties,
            name=self.name)

    def build_from_store(self, mdc_store, verbosity=0):
        return TimeIndependentMDCObjectiveFunction(
            self.build_raw(), mdc_store.model, mdc_store.dataset, mdc_store.circuits,
            penalties=self.penalties, name=self.name, layout=mdc_store.layout)


class ModelDatasetCircuitsStore(object):
    """Bundles model + dataset + circuits + layout (reference:
    objectivefns.py:912)."""

    def __init__(self, model, dataset, circuits=None, resource_alloc=None,
                 array_types=(), precomp_layout=None, verbosity=0):
        self.model = model
        self.dataset = dataset
        self.circuits = list(circuits) if circuits is not None else list(dataset.keys())
        self.layout = precomp_layout if precomp_layout is not None else \
            model.sim.create_layout(self.circuits, dataset)

    @property
    def num_elements(self):
        return self.layout.num_elements

    def num_data_params(self):
        return self.dataset.degrees_of_freedom(self.circuits)


class TimeIndependentMDCObjectiveFunction(object):
    """Model+dataset+circuits objective with compiled device functions
    (reference: objectivefns.py:4299).

    Compiled graphs take the count arrays as *runtime arguments* and are
    cached per (layout, objective-config) on the model's simulator, so GST
    iterations over nested circuit lists share one compilation: iteration i
    evaluates the full final-list layout with counts masked (total_counts=0)
    for circuits beyond its list (zero-total elements contribute nothing to
    any objective or Jacobian row).
    """

    def __init__(self, raw_objfn, model, dataset, circuits, penalties=None,
                 name=None, layout=None, verbosity=0, num_active_circuits=None):
        self.raw_objfn = raw_objfn
        self.model = model
        self.dataset = dataset
        self.circuits = list(circuits)
        self.name = name or raw_objfn.name
        self.layout = layout if layout is not None else \
            model.sim.create_layout(self.circuits, dataset)
        self.penalties = penalties or {}
        counts, totals = self.layout.counts_arrays(dataset)
        if num_active_circuits is not None:
            # mask out elements of circuits beyond the active prefix
            cutoff = self.layout.element_slices[num_active_circuits - 1].stop \
                if num_active_circuits > 0 else 0
            counts = counts.copy()
            totals = totals.copy()
            counts[cutoff:] = 0
            totals[cutoff:] = 0
            self.num_active_elements = cutoff
        else:
            self.num_active_elements = self.layout.num_elements
        self.counts = counts
        self.total_counts = totals
        with np.errstate(invalid='ignore', divide='ignore'):
            freqs = np.where(totals > 0, counts / np.where(totals > 0, totals, 1.0), 0.0)
        self.freqs = freqs
        self._counts_j = jnp.asarray(counts)
        self._totals_j = jnp.asarray(totals)
        self._freqs_j = jnp.asarray(freqs)
        _, flag, regs = _switch_config(raw_objfn)
        self._flag_j = jnp.asarray(flag, dtype=jnp.int32)
        self._regs_j = jnp.asarray(regs)
        self._fns = _compiled_objective_graphs(model, self.layout, raw_objfn,
                                               self.penalties)

    # -- API -----------------------------------------------------------------
    def _v(self, paramvec):
        return jnp.asarray(paramvec if paramvec is not None else self.model.to_vector())

    def fn(self, paramvec=None):
        return float(self._fns['fn'](self._v(paramvec), self._counts_j,
                                     self._totals_j, self._freqs_j,
                                     self._flag_j, self._regs_j))

    def lsvec(self, paramvec=None, oob_check=False):
        return np.asarray(self._fns['lsvec'](self._v(paramvec), self._counts_j,
                                             self._totals_j, self._freqs_j,
                                             self._flag_j, self._regs_j))

    def dlsvec(self, paramvec=None):
        return np.asarray(self._fns['dlsvec'](self._v(paramvec), self._counts_j,
                                              self._totals_j, self._freqs_j,
                                              self._flag_j, self._regs_j))

    def terms(self, paramvec=None):
        p = self._fns['probs'](self._v(paramvec))
        return np.asarray(self.raw_objfn.terms(p, self._counts_j, self._totals_j,
                                               self._freqs_j))

    def percircuit(self, paramvec=None):
        """Per-circuit objective contributions.  For sparse observed-outcome
        layouts the omitted-probability correction is added at each omitted
        circuit (reference: percircuit includes add_omitted_freqs terms), so
        sum(percircuit()) == fn() when no penalties are configured."""
        terms = self.terms(paramvec)
        lay = self.layout
        if getattr(lay, 'has_omitted', False):
            p = np.asarray(self._fns['probs'](self._v(paramvec)))
            firsts = np.asarray(lay.omitted_firsts)
            seg = np.asarray(lay.elem_to_circuit)
            psum = np.zeros(len(lay.circuits))
            np.add.at(psum, seg, p)
            omitted_p = 1.0 - psum[np.asarray(lay.omitted_circuits)]
            zf = np.asarray(self.raw_objfn.zero_freq_terms(
                jnp.asarray(self.total_counts[firsts]), jnp.asarray(omitted_p)))
            terms = terms.copy()
            terms[firsts] += zf
        out = np.empty(len(lay.circuits))
        for i, sl in enumerate(lay.element_slices):
            out[i] = np.sum(terms[sl])
        return out

    def probs(self, paramvec=None):
        return np.asarray(self._fns['probs'](self._v(paramvec)))

    def jtj_jtf(self, paramvec):
        """Device-fused (lsvec, JTJ, J^T f) for the LM optimizer."""
        ls, jtj, jtf = self._fns['jtj_jtf'](self._v(paramvec), self._counts_j,
                                            self._totals_j, self._freqs_j,
                                            self._flag_j, self._regs_j)
        return np.asarray(ls), np.asarray(jtj), np.asarray(jtf)

    # Jittable out-of-bounds predicate (v, counts, totals, freqs, flag,
    # regs) -> bool for the device LM's OOB protocol.  None for the dense
    # objective: obj_fn(oob_check=True) never raises in the reference either
    # (OOB is a term-simulator/termgap concept, reference
    # objectivefns.py:4551), so the device loop's constantly-in-bounds
    # predicate reproduces the host semantics exactly.  Subclasses with a
    # real bounds condition override this with a traced predicate.
    device_oob_fn = None

    def run_device_lm(self, x0, maxiter=100, tol=None, linesearch=None,
                      oob_check_interval=0):
        """Run the ENTIRE Levenberg-Marquardt loop on device as one jitted
        while_loop (optimize/device_lm.py) -- no per-iteration host round
        trips.  Returns (x, converged, msg, mu, nu, norm_f, f)."""
        from pygsti_tpu.optimize.device_lm import make_device_lm, EXIT_MESSAGES
        tol = tol or {}
        linesearch = linesearch or {}
        sim = self.model.sim
        # tolerances / maxiter / oob interval are runtime args: one compiled
        # executable serves every GST stage (chi2 iterations AND the final
        # logL stage, safe and unsafe OOB modes)
        # solver: Cholesky by default; conjugate-gradient ('cg') when the
        # parameter count is large or a params-sharded mesh is active, so
        # the damped solve never gathers the [P, P] Gram matrix onto one
        # device (the reference's "fine" LM-vector distribution +
        # custom_solve, customsolve.py:30).  PYGSTI_TPU_LM_SOLVER overrides;
        # PYGSTI_TPU_LM_CG_THRESHOLD sets the P cutoff (default 8192).
        solver = os.environ.get('PYGSTI_TPU_LM_SOLVER')
        if solver is None:
            mesh = getattr(sim, 'mesh', None)
            cg_thresh = int(os.environ.get('PYGSTI_TPU_LM_CG_THRESHOLD',
                                           '8192'))
            param_sharded = mesh is not None and 'params' in getattr(
                mesh, 'axis_names', ())
            solver = 'cg' if (len(x0) >= cg_thresh
                              or (param_sharded and len(x0) >= 1024)) \
                else 'cholesky'
        # cached ON the layout: id-keyed simulator caches can serve stale
        # graphs after id() reuse (see SimpleForwardSimulator._compiled).
        # A second, content-keyed global cache shares the compiled LM
        # executables across structurally identical fits (fresh layouts of
        # the same design: warm re-runs, bootstrap loops) -- keyed on the
        # objective graphs' content identity, which pins layout + model
        # structure + env config (see _compiled_objective_graphs).
        cache = getattr(self.layout, '_obj_graph_cache', None)
        if cache is None:
            cache = self.layout._obj_graph_cache = {}
        key = ('device_lm', id(sim),
               tuple(sorted((self.penalties or {}).items())),
               tuple(sorted(linesearch.items())), solver,
               'switched' if _switch_config(self.raw_objfn)[0]
               else _raw_objfn_key(self.raw_objfn))
        # content-keyed reuse only with the constantly-in-bounds predicate (a
        # real device_oob_fn is a per-instance closure we cannot fingerprint)
        # and only when the objective graphs themselves were cacheable (an
        # uncacheable content_key is a unique object(): storing those would
        # flush real entries out of the LRU without ever matching)
        gkey = None
        _ck = self._fns.get('content_key')
        if self.device_oob_fn is None and isinstance(_ck, tuple):
            gkey = ('device_lm', _ck, key[2], key[3], solver, key[5])
            if key not in cache and gkey in _DEVICE_LM_GLOBAL_CACHE:
                _, init_g, chunk_g, fin_g = _DEVICE_LM_GLOBAL_CACHE[gkey]
                # pin the CURRENT sim (the layout-local key contains id(sim))
                cache[key] = (sim, init_g, chunk_g, fin_g)
                _DEVICE_LM_GLOBAL_CACHE.move_to_end(gkey)
        if key not in cache:
            init_fn, chunk_fn, fin_fn = make_device_lm(
                self._fns['jtj_jtf_raw'], self._fns['lsvec_raw'],
                num_params=len(x0),
                ls_beta=linesearch.get('beta', 0.25),
                ls_max_evals=linesearch.get('max_evals', 6),
                ls_kappa=linesearch.get('kappa', 1.0),
                oob_fn=self.device_oob_fn, solver=solver)
            # LM chunk executable: reduced XLA optimization effort on TPU.
            # Measured on the f32 2Q bench graphs (r5): compile 15-19s ->
            # 6-12s while the compiled chunk runs ~45 -> ~53 ms/iteration --
            # ~+0.6s over a 70-iteration fit for ~-9s of cold start.  (The
            # old f64-emulation graphs measured the OPPOSITE trade, so this
            # applies only to the LM chunk, only on TPU, and stays
            # env-overridable: PYGSTI_TPU_LM_COMPILE_EFFORT=""/float.)
            _eff = os.environ.get('PYGSTI_TPU_LM_COMPILE_EFFORT')
            if _eff is None:
                _eff = '-1.0' if jax.default_backend() == 'tpu' else ''
            chunk_jit = None
            if _eff.strip():
                try:
                    chunk_jit = jax.jit(chunk_fn, compiler_options={
                        'exec_time_optimization_effort': float(_eff)})
                except (TypeError, ValueError):
                    # older jax without compiler_options, or a non-numeric
                    # env value -- fall back to the default-effort jit
                    chunk_jit = None
            if chunk_jit is None:
                chunk_jit = _jit_fast(chunk_fn)
            # fin_fn is pure-host numpy (not jitted: see device_lm.lm_finalize)
            cache[key] = (sim, _jit_fast(init_fn), chunk_jit, fin_fn)
            if gkey is not None:
                _DEVICE_LM_GLOBAL_CACHE[gkey] = cache[key]
                while len(_DEVICE_LM_GLOBAL_CACHE) > _OBJ_GRAPH_GLOBAL_MAX:
                    _DEVICE_LM_GLOBAL_CACHE.popitem(last=False)
        _, init_jit, chunk_jit, fin_jit = cache[key]
        data = (self._counts_j, self._totals_j, self._freqs_j,
                self._flag_j, self._regs_j)
        maxdx = tol.get('maxdx', 1.0)
        tols_j = jnp.asarray([tol.get('f', 1.0), tol.get('jac', 1e-6),
                              tol.get('relf', 1e-6), tol.get('relx', 1e-8),
                              (maxdx ** 2) * len(x0) if maxdx else np.inf])
        # bounded-iterations chunks: each device program stays well under the
        # TPU runtime's single-execution watchdog (a full-GST LM pass can run
        # many minutes, which kills the worker if submitted as one program).
        # Small layouts are latency-dominated, so they take bigger chunks.
        env_chunk = os.environ.get('PYGSTI_TPU_LM_CHUNK')
        if env_chunk is not None:
            chunk = int(env_chunk)
        else:
            B = self.layout.op_indices.shape[0]
            # measured r5 (2Q bench shapes): ~50-65 ms/iteration, so 16
            # iterations per program is ~1s -- far under the runtime
            # watchdog -- and most GST stages converge within one dispatch
            # (the while_loop exits early on convergence, so an oversized
            # chunk wastes nothing).  Very large layouts keep the smaller
            # chunk: at many seconds per iteration, 16 non-converged
            # iterations in one program could hit the execution watchdog.
            chunk = 16 if B < 20000 else 8
        import time as _time
        _t0 = _time.time()
        state = init_jit(jnp.asarray(x0), *data,
                         oob_interval=int(oob_check_interval))
        while True:
            k_now = int(state.k)
            if int(state.exit_code) != 0 or k_now >= maxiter:
                break
            state = chunk_jit(state, jnp.asarray(min(k_now + chunk, maxiter)),
                              tols_j, *data)
        x, f, norm_f, mu, nu, code, k = fin_jit(state, maxiter)
        # record per-run throughput stats for bench instrumentation
        from pygsti_tpu.optimize.device_lm import LM_RUN_STATS
        LM_RUN_STATS.append({
            'iters': int(k), 'wall_s': _time.time() - _t0,
            'flops_per_iter': self._fns.get('flops_per_jtj', 0.0),
            'num_circuits': int(self.layout.op_indices.shape[0]),
            'num_elements': int(self.layout.num_elements),
            'num_params': int(len(x0)),
            'jac_mode': self._fns.get('jac_mode', '?'),
        })
        code = int(code)
        converged = code in (1, 2, 3, 4, 5)
        msg = EXIT_MESSAGES.get(code, "exit code %d" % code)
        return (np.asarray(x), converged, msg, float(mu), float(nu),
                float(norm_f), np.asarray(f))

    def chi2k_distributed_qty(self, objective_function_value):
        return self.raw_objfn.chi2k_distributed_qty(objective_function_value)

    @property
    def num_elements(self):
        return self.layout.num_elements

    def num_data_params(self):
        return self.dataset.degrees_of_freedom(self.circuits)



# ---------------------------------------------------------------------------
# Switched raw objectives: chi2 and Poisson-logL share ONE compiled graph,
# selected by a traced integer flag with regularization constants as traced
# scalars.  This halves the number of (expensive) device compilations in
# iterative GST, where chi2 iterations hand off to a final logL stage.
# Formulas mirror RawChi2Function / RawPoissonPicDeltaLogLFunction above.
# ---------------------------------------------------------------------------

def _sw_chi2_lsvec(p, c, t, f, mpc):
    cp = jnp.clip(p, mpc, None)
    return (p - f) * jnp.sqrt(t / cp)


def _sw_chi2_dlsvec(p, c, t, f, mpc):
    cp = jnp.clip(p, mpc, None)
    w = jnp.sqrt(t / cp)
    dw = jnp.where(p > mpc, -0.5 * jnp.sqrt(t) / cp ** 1.5, 0.0)
    return w + (p - f) * dw


def _sw_logl_terms(p, c, t, f, minp, radius):
    fnz = jnp.where(c == 0, 1.0, f)
    freq_term = c * (jnp.log(fnz) - 1.0)
    pos = jnp.where(p < minp, minp, p)
    c0 = t - c / minp
    c1 = 0.5 * c / (minp ** 2)
    terms = freq_term - c * jnp.log(pos) + t * pos
    terms = jnp.where(terms < 0, jnp.zeros_like(terms), terms)  # AD-safe clamp
    terms = jnp.where(p < minp, terms + c0 * (p - minp) + c1 * (p - minp) ** 2, terms)
    zf = t * jnp.where(p >= radius, p,
                       (-1.0 / (3 * radius ** 2)) * p ** 3 + p ** 2 / radius
                       + radius / 3.0)
    return jnp.where(c == 0, zf, terms)


def _sw_logl_dterms(p, c, t, f, minp, radius):
    pos = jnp.where(p < minp, minp, p)
    c0 = t - c / minp
    c1 = 0.5 * c / (minp ** 2)
    d = t - c / pos
    d = jnp.where(p < minp, c0 + 2 * c1 * (p - minp), d)
    zf = t * jnp.where(p >= radius, 1.0, (-1.0 / radius ** 2) * p ** 2 + 2 * p / radius)
    return jnp.where(c == 0, zf, d)


def _sw_logl_hterms(p, c, t, f, minp, radius):
    pos = jnp.where(p < minp, minp, p)
    c1 = 0.5 * c / (minp ** 2)
    d2 = jnp.where(p < minp, 2 * c1, c / pos ** 2)
    zf = jnp.where(p >= radius, 0.0, t * ((-2.0 / radius ** 2) * p + 2.0 / radius))
    return jnp.where(c == 0, zf, d2)


def _sw_logl_lsvec(p, c, t, f, minp, radius):
    return jnp.sqrt(_sw_logl_terms(p, c, t, f, minp, radius))


def _sw_logl_dlsvec(p, c, t, f, minp, radius):
    # numerically-stable form (see RawPoissonPicDeltaLogLFunction.dlsvec)
    terms = _sw_logl_terms(p, c, t, f, minp, radius)
    dterms = _sw_logl_dterms(p, c, t, f, minp, radius)
    h = _sw_logl_hterms(p, c, t, f, minp, radius)
    eps = jnp.finfo(p.dtype).eps
    noise_floor = 100.0 * eps * jnp.maximum(t, 1.0)
    lsvec = jnp.sqrt(jnp.maximum(terms, 1e-300))
    std = 0.5 * dterms / jnp.maximum(lsvec, 1e-150)
    quad = jnp.sqrt(jnp.maximum(h, 0.0) / 2.0) * jnp.sign(dterms)
    return jnp.where(terms < noise_floor, quad, std)


class _SwitchedRaw(object):
    """flag 0 = chi2 (regs[0] = min_prob_clip_for_weighting);
    flag 1 = Poisson logL (regs[1] = min_prob_clip, regs[2] = radius)."""

    def lsvec(self, p, c, t, f, flag, regs):
        return jnp.where(flag == 0,
                         _sw_chi2_lsvec(p, c, t, f, regs[0]),
                         _sw_logl_lsvec(p, c, t, f, regs[1], regs[2]))

    def dlsvec(self, p, c, t, f, flag, regs):
        return jnp.where(flag == 0,
                         _sw_chi2_dlsvec(p, c, t, f, regs[0]),
                         _sw_logl_dlsvec(p, c, t, f, regs[1], regs[2]))

    def terms(self, p, c, t, f, flag, regs):
        return jnp.where(flag == 0,
                         _sw_chi2_lsvec(p, c, t, f, regs[0]) ** 2,
                         _sw_logl_terms(p, c, t, f, regs[1], regs[2]))

    def dterms(self, p, c, t, f, flag, regs):
        chi2_d = 2 * _sw_chi2_lsvec(p, c, t, f, regs[0]) \
            * _sw_chi2_dlsvec(p, c, t, f, regs[0])
        return jnp.where(flag == 0, chi2_d,
                         _sw_logl_dterms(p, c, t, f, regs[1], regs[2]))

    def zero_freq_terms(self, n, p, flag, regs):
        cp = jnp.clip(p, regs[0], None)
        a = regs[2]
        logl_zf = n * jnp.where(p >= a, p,
                                (-1.0 / (3 * a ** 2)) * p ** 3
                                + p ** 2 / a + a / 3.0)
        return jnp.where(flag == 0, n * p ** 2 / cp, logl_zf)

    def zero_freq_dterms(self, n, p, flag, regs):
        cp = jnp.clip(p, regs[0], None)
        chi2_zfd = jnp.where(p >= regs[0], n, 2 * n * p / cp)
        a = regs[2]
        logl_zfd = n * jnp.where(p >= a, 1.0,
                                 (-1.0 / a ** 2) * p ** 2 + 2 * p / a)
        return jnp.where(flag == 0, chi2_zfd, logl_zfd)


class _PassthroughRaw(object):
    """Adapter giving any raw objective the 6-arg switched signature."""

    def __init__(self, raw):
        self._raw = raw

    def lsvec(self, p, c, t, f, flag, regs):
        return self._raw.lsvec(p, c, t, f)

    def dlsvec(self, p, c, t, f, flag, regs):
        return self._raw.dlsvec(p, c, t, f)

    def terms(self, p, c, t, f, flag, regs):
        return self._raw.terms(p, c, t, f)

    def dterms(self, p, c, t, f, flag, regs):
        return self._raw.dterms(p, c, t, f)

    def zero_freq_terms(self, n, p, flag, regs):
        return self._raw.zero_freq_terms(n, p)

    def zero_freq_dterms(self, n, p, flag, regs):
        return self._raw.zero_freq_dterms(n, p)


def _switch_config(raw):
    """(use_switched, flag, regs) for a raw objective instance."""
    if type(raw) is RawChi2Function:
        return True, 0, np.array([raw.min_prob_clip_for_weighting, 1e-4, 1e-4])
    if type(raw) is RawPoissonPicDeltaLogLFunction:
        return True, 1, np.array([1e-4, raw.min_p, raw.radius])
    return False, 0, np.zeros(3)


def _raw_objfn_key(raw):
    if isinstance(raw, RawChi2Function) and not isinstance(raw, RawFreqWeightedChi2Function):
        return ('chi2', raw.min_prob_clip_for_weighting)
    if isinstance(raw, RawFreqWeightedChi2Function):
        return ('fwchi2', raw.min_freq_clip_for_weighting)
    if isinstance(raw, RawPoissonPicDeltaLogLFunction):
        return ('logl', raw.min_p, raw.radius)
    if isinstance(raw, RawDeltaLogLFunction):
        return ('dlogl-np', raw.min_p)
    if isinstance(raw, RawTVDFunction):
        return ('tvd',)
    return (type(raw).__name__, id(raw))


# -- CPTP / SPAM penalties (reference: objectivefns.py:5785 _cptp_penalty,
#    :5806 _spam_penalty; NEG_EIG_PENALTY_USE_SQRT=True, SQRT_SHIFT=1e-6) ----
_NEG_EIG_SQRT_SHIFT = 1e-6


@jax.custom_jvp
def _sum_neg_evals(A):
    """-sum of negative eigenvalues of a Hermitian matrix.  Custom JVP avoids
    the NaN gradients jax's eigh JVP produces at degenerate eigenvalues
    (common at GST target seeds where Choi matrices are rank-deficient)."""
    ev = jnp.linalg.eigvalsh(A)
    return -jnp.sum(jnp.minimum(ev, 0.0))


@_sum_neg_evals.defjvp
def _sum_neg_evals_jvp(primals, tangents):
    A, = primals
    dA, = tangents
    ev, U = jnp.linalg.eigh(A)
    val = -jnp.sum(jnp.minimum(ev, 0.0))
    mask = (ev < 0).astype(ev.dtype)
    inner = jnp.einsum('ji,jk,ki->i', U.conj(), dA, U)
    return val, -jnp.sum(mask * jnp.real(inner)).astype(val.dtype)


def _make_penalty_fn(model, penalties):
    """Extra lsvec rows for cptp_penalty_factor / spam_penalty_factor, as a
    pure function of the parameter vector (None when inactive)."""
    cptp_factor = (penalties or {}).get('cptp_penalty_factor', 0)
    spam_factor = (penalties or {}).get('spam_penalty_factor', 0)
    if not (cptp_factor or spam_factor):
        return None
    from pygsti_tpu.baseobjs.basis import Basis
    dim = model.dim
    udim = int(round(np.sqrt(dim)))
    basis = getattr(model, 'basis', 'pp')
    b = Basis.cast(basis, dim) if isinstance(basis, str) else basis
    M = np.asarray(b.create_transform_matrix('std'))
    Minv = np.linalg.inv(M)
    # numpy constants: eager complex device_put hangs remote TPU runtimes
    M_j, Minv_j = M.astype(complex), Minv.astype(complex)
    els_j = np.asarray(b.elements).astype(complex)  # [dim, u, u]
    compute = model.tensors_fn()
    # penalize only primary operations (not derived layers / instrument rows)
    if hasattr(model, 'operations'):
        op_pen_idx = [model.op_keys.index(k) for k in model.operations.keys()
                      if k in model.op_keys]
    else:
        op_pen_idx = list(range(len(model.op_keys)))
    op_pen_idx = np.asarray(op_pen_idx, np.int32)

    def choi_std(G):
        s_std = (M_j @ G.astype(M_j.dtype)) @ Minv_j
        return s_std.reshape(udim, udim, udim, udim).transpose(
            0, 2, 1, 3).reshape(dim, dim) / udim

    def pen_fn(v):
        t = compute(v)
        rows = []
        if cptp_factor:
            for i in op_pen_idx:
                c = choi_std(t.ops[int(i)])
                rows.append(cptp_factor * jnp.sqrt(
                    _NEG_EIG_SQRT_SHIFT + _sum_neg_evals((c + c.conj().T) / 2)))
        if spam_factor:
            vecs = jnp.concatenate([t.preps, t.effects], axis=0)
            for i in range(vecs.shape[0]):
                mx = jnp.tensordot(vecs[i].astype(els_j.dtype), els_j, axes=1)
                rows.append(spam_factor * jnp.sqrt(
                    _NEG_EIG_SQRT_SHIFT + _sum_neg_evals((mx + mx.conj().T) / 2)))
        return jnp.stack(rows)

    return pen_fn


# -- content-keyed global graph cache ---------------------------------------
# A fresh fit of the SAME design (same circuits, same model structure, same
# objective) re-traces and re-loads every executable if the cache lives only
# on the layout object: the warm bench run, bootstrap loops, and StandardGST
# re-fits all pay ~2.5s of stage-0 re-tracing for graphs that already exist.
# This cache keys on CONTENT -- sha1 of the layout's index tensors + a jaxpr
# fingerprint of the model's theta->tensors computation (structure AND
# constants) + objective/env config -- so structurally identical fits share
# the jitted graph objects process-wide.  Entries hold the sim alive (id
# stability) and are LRU-bounded.
_OBJ_GRAPH_GLOBAL_CACHE = collections.OrderedDict()
_DEVICE_LM_GLOBAL_CACHE = collections.OrderedDict()
_OBJ_GRAPH_GLOBAL_MAX = 6

_GRAPH_ENV_KNOBS = ('PYGSTI_TPU_PROBS_KERNEL', 'PYGSTI_TPU_PROBS_DTYPE',
                    'PYGSTI_TPU_JAC_MODE', 'PYGSTI_TPU_FACTORIZED',
                    'PYGSTI_TPU_J_DTYPE', 'PYGSTI_TPU_PALLAS_BWD',
                    'PYGSTI_TPU_DEPTH_BUCKETS', 'PYGSTI_TPU_JAC_CARRY_BYTES',
                    'PYGSTI_TPU_GRAM_PRECISION', 'PYGSTI_TPU_COMPILE_EFFORT',
                    'PYGSTI_TPU_TANGENT_CHUNK', 'PYGSTI_TPU_SPARSE_OUTCOMES')


def _graph_env_key():
    return tuple(os.environ.get(k) for k in _GRAPH_ENV_KNOBS)


def _layout_content_key(layout):
    """sha1 fingerprint of everything the compiled graphs read from the
    layout (index tensors; the factorization/prodcache is derived
    deterministically from these, so hashing them suffices)."""
    cached = getattr(layout, '_content_hash', None)
    if cached is not None:
        return cached
    import hashlib
    h = hashlib.sha1()
    for name in ('op_indices', 'prep_index', 'elem_effect', 'elem_circuit',
                 'depths', 'elem_to_circuit'):
        a = getattr(layout, name, None)
        if a is not None:
            a = np.asarray(a)
            h.update(name.encode())
            h.update(str(a.shape).encode())
            h.update(a.tobytes())
    h.update(str(int(getattr(layout, 'identity_index', -1))).encode())
    h.update(str(int(layout.num_elements)).encode())
    if getattr(layout, 'has_omitted', False):
        for name in ('omitted_firsts', 'omitted_circuits'):
            h.update(np.asarray(getattr(layout, name)).tobytes())
    layout._content_hash = h.hexdigest()
    return layout._content_hash


def _model_graph_fingerprint(model):
    """sha1 of the model's theta->tensors jaxpr INCLUDING its constants:
    two models with equal fingerprints produce identical compiled graphs
    (the parameter VECTOR is a runtime argument, so it is excluded).

    Deliberately NOT cached on the model: tensors_fn() rebuilds its closure
    from the current member structure each call, and a cached fingerprint
    would go stale (-> wrong cache hits) after structural edits.  One trace
    per objective build is cheap relative to building the graphs."""
    import hashlib
    compute = model.tensors_fn()
    closed = jax.make_jaxpr(compute)(np.zeros(model.num_params))
    h = hashlib.sha1(str(closed.jaxpr).encode())
    for c in closed.consts:
        a = np.asarray(c)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def _compiled_objective_graphs(model, layout, raw, penalties):
    """Build (or fetch cached) jitted objective graphs for a (layout, raw
    objective) pair.  Graphs take (v, counts, totals, freqs) as arguments."""
    sim = model.sim
    # cached ON the layout (id-keyed simulator caches go stale after id()
    # reuse; see SimpleForwardSimulator._compiled)
    cache = getattr(layout, '_obj_graph_cache', None)
    if cache is None:
        cache = layout._obj_graph_cache = {}
    use_switched, _, _ = _switch_config(raw)
    key = (id(sim), 'switched' if use_switched else _raw_objfn_key(raw),
           tuple(sorted((penalties or {}).items())))
    if key in cache:
        return cache[key][1]

    # content-keyed global lookup (single-device graphs only: mesh identity
    # is not content-hashable; op_indices required -- without the index
    # tensors the content hash could collide across different circuit sets)
    gkey = None
    if getattr(sim, 'mesh', None) is None \
            and getattr(layout, 'op_indices', None) is not None:
        try:
            gkey = (_layout_content_key(layout),
                    _model_graph_fingerprint(model), key[1], key[2],
                    _graph_env_key(), jax.default_backend(),
                    bool(jax.config.read('jax_enable_x64')))
        except Exception:
            gkey = None
        if gkey is not None and gkey in _OBJ_GRAPH_GLOBAL_CACHE:
            _, fns = _OBJ_GRAPH_GLOBAL_CACHE[gkey]
            _OBJ_GRAPH_GLOBAL_CACHE.move_to_end(gkey)
            # store the CURRENT sim: the layout-local key contains id(sim),
            # so the entry must pin THIS sim alive or a recycled id() could
            # match the stale key later (the keep-alive invariant below)
            cache[key] = (sim, fns)
            return fns

    raw = _SwitchedRaw() if use_switched else _PassthroughRaw(raw)
    probs_fn = sim.probs_fn(layout)
    regularize_factor = (penalties or {}).get('regularize_factor', 0)

    # -- omitted-probability correction for sparse observed-outcome layouts
    #    (reference: objectivefns.py:1015 add_omitted_freqs, :4562 terms,
    #    :4620 dterms): each circuit with unobserved outcomes gets
    #    zero_freq_terms(N, 1 - sum(observed p)) added at its FIRST element,
    #    and the Jacobian rows of all its elements enter that element's
    #    dterms with weight -zero_freq_dterms.
    has_omitted = getattr(layout, 'has_omitted', False)
    if has_omitted:
        _om_firsts = np.asarray(layout.omitted_firsts)
        _om_circs = np.asarray(layout.omitted_circuits)
        _om_seg = np.asarray(layout.elem_to_circuit)
        _om_nseg = len(layout.circuits)

        def _omitted_probs(p):
            psum = jax.ops.segment_sum(p, _om_seg, num_segments=_om_nseg)
            return 1.0 - psum[_om_circs]

        def _terms_of_p(p, counts, totals, freqs, flag, regs):
            t = raw.terms(p, counts, totals, freqs, flag, regs)
            zf = raw.zero_freq_terms(totals[_om_firsts], _omitted_probs(p),
                                     flag, regs)
            return t.at[_om_firsts].add(zf)

        def _lsvec_of_p(p, counts, totals, freqs, flag, regs):
            t = _terms_of_p(p, counts, totals, freqs, flag, regs)
            ls = jnp.sqrt(jnp.maximum(t, 0.0))
            # keep the raw objective's sign convention (signed-sqrt lsvecs
            # like chi2; reference lsvec raw_objfn_lsvec_signs=True)
            raw_ls = raw.lsvec(p, counts, totals, freqs, flag, regs)
            return jnp.where(raw_ls < 0, -ls, ls)

        def _weighted_jac_t(Jt, p, ls, counts, totals, freqs, flag, regs):
            """Jw [P, E] = d lsvec / dv given Jt = dp/dv [P, E].

            Non-first elements use the raw objective's hand-stabilized
            dlsvec directly (the dterms/(2 lsvec) form is singular in the
            terms -> 0 signed-sqrt limit, where raw.dlsvec returns the
            correct analytic limit).  Each omitted circuit's FIRST element
            row is rebuilt from the corrected sqrt(terms + zero_freq) form
            (reference dlsvec, objectivefns.py:4633)."""
            Jw = Jt * raw.dlsvec(p, counts, totals, freqs, flag, regs)[None, :]
            dterms_f = raw.dterms(p, counts, totals, freqs,
                                  flag, regs)[_om_firsts]
            zfd = raw.zero_freq_dterms(totals[_om_firsts], _omitted_probs(p),
                                       flag, regs)
            rowsum = jax.ops.segment_sum(Jt.T, _om_seg,
                                         num_segments=_om_nseg)  # [C, P]
            ls_f = ls[_om_firsts]
            w = jnp.where(jnp.abs(ls_f) < 1e-100, 0.0,
                          0.5 / jnp.where(jnp.abs(ls_f) < 1e-100, 1.0, ls_f))
            row = (Jt[:, _om_firsts] * dterms_f[None, :]
                   - zfd[None, :] * rowsum[_om_circs].T) * w[None, :]
            return Jw.at[:, _om_firsts].set(row)
    else:
        def _terms_of_p(p, counts, totals, freqs, flag, regs):
            return raw.terms(p, counts, totals, freqs, flag, regs)

        def _lsvec_of_p(p, counts, totals, freqs, flag, regs):
            return raw.lsvec(p, counts, totals, freqs, flag, regs)

        def _weighted_jac_t(Jt, p, ls, counts, totals, freqs, flag, regs):
            return Jt * raw.dlsvec(p, counts, totals, freqs,
                                   flag, regs)[None, :]

    def lsvec_fn(v, counts, totals, freqs, flag, regs):
        p = probs_fn(v)
        ls = _lsvec_of_p(p, counts, totals, freqs, flag, regs)
        if regularize_factor > 0:
            ls = jnp.concatenate([ls, regularize_factor * jnp.abs(v)])
        return ls

    def fn_fn(v, counts, totals, freqs, flag, regs):
        p = probs_fn(v)
        val = jnp.sum(_terms_of_p(p, counts, totals, freqs, flag, regs))
        if regularize_factor > 0:
            val = val + jnp.sum((regularize_factor * jnp.abs(v)) ** 2)
        return val

    # -- Jacobian products.  Three modes:
    #    'linearize' (default when the layout factorizes): one jax.linearize
    #      of lsvec(v) + a vmapped basis of forward tangents -- exact J, with
    #      the cheap factorized probs graph (layouts/prodcache.py) making
    #      per-tangent cost ~2x a probs evaluation.  The TPU-native
    #      replacement for the reference's dproduct caches
    #      (matrixforwardsim.py:729) with germ-power product reuse.
    #    'blocked' (non-factorized uniform-outcome layouts): per-circuit
    #      reverse mode w.r.t. stacked model tensors + chain through the
    #      small params->tensors jacobian.
    #    'fwd' (mesh / non-uniform fallbacks): param-sharded jvp tangents.
    B = layout.op_indices.shape[0]  # number of expanded rows
    # the blocked mode's per-block Gram cannot apply the cross-element
    # omitted-probability correction (it couples a circuit's elements
    # through a segment sum), so layouts with omitted outcomes always use
    # the linearize/fwd paths
    n_out_uniform = (B > 0 and layout.num_elements % B == 0
                     and getattr(layout, 'rows_uniform_n_out', False)
                     and not has_omitted)
    dim = model.dim
    compute = model.tensors_fn()
    mesh = getattr(sim, 'mesh', None)
    param_sharded = mesh is not None and 'params' in getattr(
        mesh, 'axis_names', ())
    # MXU precision of the Gram matmuls (see the blocked path's notes).
    _gram_precision = os.environ.get('PYGSTI_TPU_GRAM_PRECISION', 'default')
    jac_mode = os.environ.get('PYGSTI_TPU_JAC_MODE')
    if jac_mode is None:
        # Default = the MEASURED winner on the driver TPU bench (r5
        # mode-comparison, PARITY.md "Jacobian-mode comparison"): the
        # blocked reverse-scan Jacobian (now depth-bucketed) beats vmapped
        # linearize tangents through the factorized probs graph by ~2.2x
        # warm LM wall (9.6s vs 20.9s, same workload/day) and the explicit
        # dproduct-cache 'prodjac' by ~2.2x as well (52.6 vs 117.6 ms/eval)
        # -- tangent chains of tiny 16x16 matmuls are latency-bound on the
        # MXU.  'linearize' remains the exact-AD path for non-uniform
        # layouts (sparse outcomes, instruments) where the blocked
        # per-bucket Gram doesn't apply.
        if n_out_uniform and mesh is None:
            jac_mode = 'blocked'
        elif layout.factorization is not None:
            jac_mode = 'linearize'
        else:
            jac_mode = 'fwd'
    # the factorization plan is only built when a mode consumes it
    fact = layout.factorization if jac_mode in ('prodjac', 'linearize') \
        else None

    if jac_mode == 'linearize':
        from jax.sharding import NamedSharding, PartitionSpec as _Pspec
        tangent_chunk = int(os.environ.get('PYGSTI_TPU_TANGENT_CHUNK', '0'))

        def _probs_and_jac_t(v):
            """(p [E], Jt [P, E]): one primal evaluation + P forward tangents
            through the linearized PROBS graph.  The raw objective's chain
            rule is applied afterwards with the hand-stabilized dlsvec
            (sqrt-of-terms has an unstable AD derivative at terms ~ 0)."""
            def p_of_v(vv):
                return probs_fn(vv).astype(v.dtype)
            p, lin = jax.linearize(p_of_v, v)
            P = v.shape[0]
            basis = jnp.eye(P, dtype=v.dtype)
            if param_sharded:
                basis = jax.lax.with_sharding_constraint(
                    basis, NamedSharding(mesh, _Pspec('params', None)))
            if tangent_chunk and P % tangent_chunk == 0:
                Jt = jax.lax.map(jax.vmap(lin),
                                 basis.reshape(P // tangent_chunk,
                                               tangent_chunk, P))
                Jt = Jt.reshape(P, -1)
            else:
                Jt = jax.vmap(lin)(basis)
            if param_sharded:
                Jt = jax.lax.with_sharding_constraint(
                    Jt, NamedSharding(mesh, _Pspec('params', None)))
            return p, Jt

        def jtj_jtf_fn(v, counts, totals, freqs, flag, regs):
            P = v.shape[0]
            p, Jt = _probs_and_jac_t(v)
            # _lsvec_of_p/_weighted_jac_t apply the sparse-layout omitted-
            # probability correction when the layout has omitted outcomes
            # (identical to raw.lsvec / Jt*raw.dlsvec otherwise)
            ls = _lsvec_of_p(p, counts, totals, freqs, flag, regs)
            Jw = _weighted_jac_t(Jt, p, ls, counts, totals, freqs, flag, regs)
            jtj = jnp.matmul(Jw, Jw.T, precision=_gram_precision)
            jtf = jnp.matmul(Jw, ls, precision=_gram_precision)
            if param_sharded:
                jtj = jax.lax.with_sharding_constraint(
                    jtj, NamedSharding(mesh, _Pspec('params', None)))
            if regularize_factor > 0:
                pen = regularize_factor * jnp.abs(v)
                ls = jnp.concatenate([ls, pen])
                jtj = jtj + (regularize_factor ** 2) * jnp.eye(P, dtype=v.dtype)
                jtf = jtf + regularize_factor * jnp.sign(v) * pen
            return ls, jtj, jtf

        def dlsvec_fn(v, counts, totals, freqs, flag, regs):
            p, Jt = _probs_and_jac_t(v)
            ls = _lsvec_of_p(p, counts, totals, freqs, flag, regs)
            J = _weighted_jac_t(Jt, p, ls, counts, totals, freqs,
                                flag, regs).T
            if regularize_factor > 0:
                J = jnp.concatenate(
                    [J, regularize_factor * jnp.diag(jnp.sign(v))], axis=0)
            return J

    elif jac_mode == 'prodjac':
        # dproduct-cache Jacobian (VERDICT r4 #1; the reference's
        # _compute_dproduct_cache reborn -- matrixforwardsim.py:729):
        # propagate the op-entry tangent basis through the germ-power
        # product-cache LEVELS as batched GEMMs (7 levels instead of a
        # depth-70 sequential scan), assemble J^T w.r.t. the stacked tensor
        # entries via erow/pair-grouped matmuls (layouts/prodcache.py
        # ElementGroupTables), and chain through the small params->tensors
        # Jacobian.  Prep/effect tensor rows have closed forms
        # (dp/drho = e^T T_g T_pfx,  dp/dE = T_sfx X).  Works for sparse
        # (omitted-outcome) layouts too -- the element axis is arbitrary.
        assert fact is not None, \
            "jac_mode='prodjac' requires a factorized layout " \
            "(PYGSTI_TPU_FACTORIZED=1)"
        from pygsti_tpu.layouts.prodcache import build_element_group_tables
        n_ops = len(model.op_keys)
        n_preps = len(model.prep_keys)
        n_eff = sum(model.povms[k].num_outcomes for k in model.povm_keys)
        NT = n_ops * dim * dim + n_preps * dim + n_eff * dim
        o_sz = n_ops * dim * dim
        p_sz = n_preps * dim

        def compute_flat(v):
            t = compute(v)
            return jnp.concatenate([t.ops.reshape(-1), t.preps.reshape(-1),
                                    t.effects.reshape(-1)])

        def unflatten(tf):
            ops = tf[:o_sz].reshape(n_ops, dim, dim)
            preps = tf[o_sz:o_sz + p_sz].reshape(n_preps, dim)
            effects = tf[o_sz + p_sz:].reshape(n_eff, dim)
            return ops, preps, effects

        _default_j = 'float32' if jax.default_backend() == 'tpu' else 'float64'
        j_dtype = jnp.dtype(os.environ.get('PYGSTI_TPU_J_DTYPE', _default_j))
        _gram_precision = os.environ.get('PYGSTI_TPU_GRAM_PRECISION',
                                         'default')
        _hi = jax.lax.Precision.HIGHEST

        lv = tuple((np.asarray(l), np.asarray(r)) for l, r in fact.levels)
        a_pfx = np.asarray(fact.a_pfx_cache)
        e_sfx = np.asarray(fact.e_sfx_cache)
        nf_preps, nf_eff = int(fact.n_preps), int(fact.n_effects)
        pair_g = np.asarray(fact.pair_g)
        pair_a = np.asarray(fact.pair_a)
        elem_pair = np.asarray(fact.elem_pair)
        elem_erow = np.asarray(fact.elem_erow)
        g_of_e = pair_g[elem_pair]                      # [E] ext-table idx
        m_of_e = a_pfx[pair_a[elem_pair] // nf_preps]   # [E] ext-table idx
        sfx_of_e = e_sfx[elem_erow // nf_eff]           # [E] ext-table idx
        gt = build_element_group_tables(
            fact, chunk=int(os.environ.get('PYGSTI_TPU_PRODJAC_GROUP', '64')))
        C_total = n_ops * dim * dim
        c_chunk = int(os.environ.get('PYGSTI_TPU_PRODJAC_CHUNK', '0')) \
            or C_total
        # one-hot op-entry tangent basis, host-side constant
        _basis = np.eye(C_total, dtype=np.float32).reshape(
            C_total, n_ops, dim, dim)

        def _jac_t_tensor(tf):
            """(p [E], Jt [NT, E]): probs + transposed Jacobian w.r.t. the
            flat tensor vector, at j_dtype."""
            ops, preps, effects = unflatten(tf)
            ops = ops.astype(j_dtype)
            preps = preps.astype(j_dtype)
            effects = effects.astype(j_dtype)
            eye = jnp.eye(dim, dtype=ops.dtype)[None]
            G = jnp.concatenate([ops, eye], axis=0)
            T = G
            for lefts, rights in lv:
                T = jnp.concatenate(
                    [T, jnp.matmul(T[lefts], T[rights], precision=_hi)],
                    axis=0)
            a = jnp.einsum('mij,rj->mri', T[a_pfx], preps[:nf_preps],
                           precision=_hi).reshape(-1, dim)
            e = jnp.einsum('oi,mij->moj', effects[:nf_eff], T[e_sfx],
                           precision=_hi).reshape(-1, dim)
            X = jnp.einsum('qij,qj->qi', T[pair_g], a[pair_a],
                           precision=_hi)
            p = jnp.sum(e[elem_erow] * X[elem_pair], axis=1)

            # -- op-entry rows: dT through the cache levels ------------------
            op_rows = []
            for cs in range(0, C_total, c_chunk):
                basis_c = jnp.asarray(_basis[cs:cs + c_chunk]).astype(j_dtype)
                Cc = basis_c.shape[0]
                dT = jnp.concatenate(
                    [basis_c, jnp.zeros((Cc, 1, dim, dim), j_dtype)], axis=1)
                for lefts, rights in lv:
                    dnew = (jnp.einsum('cnij,njk->cnik', dT[:, lefts],
                                       T[rights], precision=_hi)
                            + jnp.einsum('nij,cnjk->cnik', T[lefts],
                                         dT[:, rights], precision=_hi))
                    dT = jnp.concatenate([dT, dnew], axis=1)
                da = jnp.einsum('cmij,rj->cmri', dT[:, a_pfx],
                                preps[:nf_preps],
                                precision=_hi).reshape(Cc, -1, dim)
                de = jnp.einsum('oi,cmij->cmoj', effects[:nf_eff],
                                dT[:, e_sfx],
                                precision=_hi).reshape(Cc, -1, dim)
                dX = (jnp.einsum('cqij,qj->cqi', dT[:, pair_g], a[pair_a],
                                 precision=_hi)
                      + jnp.einsum('qij,cqj->cqi', T[pair_g],
                                   da[:, pair_a], precision=_hi))
                # grouped element assembly (one matmul per shared row)
                t1 = jnp.einsum('cgi,gli->cgl', de[:, gt.erow_chunk_row],
                                X[gt.erow_chunk_pair], precision=_hi)
                t2 = jnp.einsum('cgi,gli->cgl', dX[:, gt.pair_chunk_q],
                                e[gt.pair_chunk_erow], precision=_hi)
                op_rows.append(t1.reshape(Cc, -1)[:, gt.erow_perm]
                               + t2.reshape(Cc, -1)[:, gt.pair_perm])
            Jt_ops = op_rows[0] if len(op_rows) == 1 \
                else jnp.concatenate(op_rows, axis=0)

            # -- prep rows: dp/drho_{r,:} = (e_row^T T_g) T_pfx -------------
            u = jnp.einsum('ei,eij->ej', e[elem_erow], T[g_of_e],
                           precision=_hi)
            Arow = jnp.einsum('ej,ejk->ek', u, T[m_of_e], precision=_hi)
            prep_oh = jax.nn.one_hot(pair_a[elem_pair] % nf_preps,
                                     n_preps, dtype=j_dtype)     # [E, n_preps]
            Jt_preps = jnp.einsum('er,ej->rje', prep_oh, Arow,
                                  precision=_hi).reshape(n_preps * dim, -1)

            # -- effect rows: dp/dE_{o,:} = T_sfx @ X ------------------------
            w = jnp.einsum('eti,ei->et', T[sfx_of_e], X[elem_pair],
                           precision=_hi)
            eff_oh = jax.nn.one_hot(elem_erow % nf_eff, n_eff, dtype=j_dtype)
            Jt_effs = jnp.einsum('eo,et->ote', eff_oh, w,
                                 precision=_hi).reshape(n_eff * dim, -1)

            Jt = jnp.concatenate([Jt_ops, Jt_preps, Jt_effs], axis=0)
            return p, Jt

        def jtj_jtf_fn(v, counts, totals, freqs, flag, regs):
            P = v.shape[0]
            tf = compute_flat(v)
            Tv = jax.jacfwd(compute_flat)(v)       # [NT, P]
            p, Jt = _jac_t_tensor(tf)
            p_v = p.astype(v.dtype)
            ls = _lsvec_of_p(p_v, counts, totals, freqs, flag, regs)
            Jw = _weighted_jac_t(Jt, p_v, ls, counts, totals, freqs,
                                 flag, regs)        # [NT, E]
            Jw = Jw.astype(j_dtype)
            M = jnp.matmul(Jw, Jw.T, precision=_gram_precision)
            q = jnp.matmul(Jw, ls.astype(j_dtype),
                           precision=_gram_precision)
            Tvj = Tv.astype(j_dtype)
            jtj = (Tvj.T @ (M @ Tvj)).astype(v.dtype)
            jtf = (Tvj.T @ q).astype(v.dtype)
            if regularize_factor > 0:
                pen = regularize_factor * jnp.abs(v)
                ls = jnp.concatenate([ls, pen])
                jtj = jtj + (regularize_factor ** 2) * jnp.eye(P, dtype=v.dtype)
                jtf = jtf + regularize_factor * jnp.sign(v) * pen
            return ls, jtj, jtf

        def dlsvec_fn(v, counts, totals, freqs, flag, regs):
            tf = compute_flat(v)
            Tv = jax.jacfwd(compute_flat)(v)
            p, Jt = _jac_t_tensor(tf)
            p_v = p.astype(v.dtype)
            ls = _lsvec_of_p(p_v, counts, totals, freqs, flag, regs)
            Jw = _weighted_jac_t(Jt, p_v, ls, counts, totals, freqs,
                                 flag, regs)
            J = (Jw.astype(j_dtype).T @ Tv.astype(j_dtype)).astype(v.dtype)
            if regularize_factor > 0:
                J = jnp.concatenate(
                    [J, regularize_factor * jnp.diag(jnp.sign(v))], axis=0)
            return J

    elif jac_mode == 'blocked' and n_out_uniform and mesh is None:
        n_out = layout.num_elements // B
        n_ops = len(model.op_keys)
        n_preps = len(model.prep_keys)
        n_eff = sum(model.povms[k].num_outcomes for k in model.povm_keys)
        NT = n_ops * dim * dim + n_preps * dim + n_eff * dim
        # Jacobian block size.  Smaller (VMEM-sized) blocks make the
        # backward scan's per-op gradient accumulator ~3.5x faster in
        # isolation, but on TPU the many-block f32 Gram pipeline measurably
        # degrades LM convergence (bf16-dominant default matmul precision;
        # final Nsigma 500 -> 820 on the 2Q bench), so the default stays at
        # the large proven block size.  Override with
        # PYGSTI_TPU_JAC_CARRY_BYTES (bytes of jacobian block, old formula)
        # for experimentation.
        # Jacobian/Gram arithmetic dtype: f32 by default on TPU (the Jacobian
        # only steers LM steps -- convergence checks always use the
        # simulator-precision lsvec -- and f32 halves HBM traffic and runs
        # matmuls at full MXU rate; f64 emulation would dominate otherwise).
        # Override with PYGSTI_TPU_J_DTYPE=float64 for exact-Jacobian runs.
        _default_j = 'float32' if jax.default_backend() == 'tpu' else 'float64'
        j_dtype = jnp.dtype(os.environ.get('PYGSTI_TPU_J_DTYPE', _default_j))
        _blk_budget = int(os.environ.get('PYGSTI_TPU_JAC_CARRY_BYTES',
                                         str(256 * 1024 * 1024)))
        blk = max(64, int(_blk_budget
                          // (max(n_out, 1) * NT * j_dtype.itemsize)))
        blk = min(blk, B)  # never pad the batch beyond one block
        # Pallas backward-accumulation kernel (ops/pallas_kernels.py): keeps
        # the per-op gradient accumulator VMEM-resident across the whole
        # depth loop (28x faster than the einsum scan standalone: 34ms vs
        # 975ms at the 2Q maxL=64 shapes) and legalizes inside the fused
        # device-LM while_loop on the current Mosaic toolchain.  DEFAULT on
        # TPU with an f32/bf16 Jacobian (Mosaic has no f64); opt out with
        # PYGSTI_TPU_PALLAS_BWD=0.
        _pallas_env = os.environ.get('PYGSTI_TPU_PALLAS_BWD')
        if _pallas_env is None:
            _use_pallas_bwd = (jax.default_backend() == 'tpu'
                               and j_dtype != jnp.dtype('float64'))
        else:
            _use_pallas_bwd = _pallas_env == '1'
        if _use_pallas_bwd:
            blk = max(128, (blk // 128) * 128)  # kernel tiles are 128 lanes
        D = layout.op_indices.shape[1]
        # -- depth-bucketed blocks (r5): rows sorted by depth, partitioned
        #    at depth quantiles, each bucket scanned at its OWN padded depth.
        #    GST circuit depths are heavily skewed (2Q maxL=64 bench: mean
        #    26 vs max 70), so one flat [B, Dmax] scan wastes ~2.3x
        #    forward+backward work on identity padding.  The residual vector
        #    is permuted back to layout element order after assembly.
        depths_np = np.asarray(layout.depths)
        order = np.argsort(depths_np, kind='stable')
        if os.environ.get('PYGSTI_TPU_DEPTH_BUCKETS', '1') == '0' or B < 256:
            edges = [D]
        else:
            qs = sorted({int(np.ceil(np.percentile(depths_np, p)))
                         for p in (50, 75, 90)})
            edges = [e for e in qs if 0 < e < D] + [D]
        align = 128 if _use_pallas_bwd else 64
        eff_rows_all = layout.elem_effect.reshape(B, n_out)
        bucket_tensors = []  # (op_j, prep_j, eff_j, elem_idx np, nk, nk_pad)
        elem_sorted = []
        lo = -1
        for e in edges:
            sel = order[(depths_np[order] > lo) & (depths_np[order] <= e)]
            lo = e
            Dk = max(int(e), 1)
            for s in range(0, len(sel), max(blk, align)):
                rows = sel[s:s + max(blk, align)]
                nk = len(rows)
                if nk == 0:
                    continue
                nk_pad = -(-nk // align) * align
                op_b = np.full((nk_pad, Dk), layout.identity_index, np.int32)
                op_b[:nk] = layout.op_indices[rows][:, :Dk]
                prep_b = np.zeros(nk_pad, np.int32)
                prep_b[:nk] = layout.prep_index[rows]
                eff_b = np.zeros((nk_pad, n_out), np.int32)
                eff_b[:nk] = eff_rows_all[rows]
                elem_idx = (rows[:, None] * n_out
                            + np.arange(n_out)).ravel().astype(np.int32)
                elem_sorted.append(elem_idx)
                bucket_tensors.append((jnp.asarray(op_b), jnp.asarray(prep_b),
                                       jnp.asarray(eff_b), elem_idx, nk,
                                       nk_pad))
        elem_sorted_idx = np.concatenate(elem_sorted)
        inv_perm = np.argsort(elem_sorted_idx).astype(np.int32)
        n_real_elements = layout.num_elements
        Bp = sum(t[5] for t in bucket_tensors)
        bucket_scan_work = sum(t[5] * t[0].shape[1] for t in bucket_tensors)

        o_sz = n_ops * dim * dim
        p_sz = n_preps * dim

        def compute_flat(v):
            t = compute(v)
            return jnp.concatenate([t.ops.reshape(-1), t.preps.reshape(-1),
                                    t.effects.reshape(-1)])

        def unflatten(tf):
            ops = tf[:o_sz].reshape(n_ops, dim, dim)
            preps = tf[o_sz:o_sz + p_sz].reshape(n_preps, dim)
            effects = tf[o_sz + p_sz:].reshape(n_eff, dim)
            return ops, preps, effects

        K1 = n_ops + 1   # op stack + identity padding slot
        # MXU precision of the per-block Gram matmuls.  The global default is
        # 'highest' (3-pass bf16 for f32 operands); the Gram of an f32
        # Jacobian steering a damped LM step tolerates single-pass precision
        # (validated: full 2Q bench converges to the same Nsigma) --
        # override with PYGSTI_TPU_GRAM_PRECISION=default|high|highest.
        _gram_precision = os.environ.get('PYGSTI_TPU_GRAM_PRECISION',
                                         'default')

        def _block_probs_jac(tf, op_b, prep_b, eff_b):
            """(probs [blk*n_out], Jt [blk*n_out, NT]) for one circuit block.

            Scatter-free Jacobian: per-position outer products are binned
            into per-op gradients with a ONE-HOT einsum contraction (an MXU
            matmul) instead of reverse-mode scatter-adds, which are
            pathologically slow on TPU.  Replaces the reference's
            _compute_dproduct_cache (matrixforwardsim.py:729).
            """
            ops, preps, effects = unflatten(tf)
            ops = ops.astype(j_dtype)
            preps = preps.astype(j_dtype)
            effects = effects.astype(j_dtype)
            eye = jnp.eye(dim, dtype=ops.dtype)[None]
            G = jnp.concatenate([ops, eye], axis=0)      # [K+1, d, d]
            rho0 = preps[prep_b]                          # [blk, d]
            E = effects[eff_b]                            # [blk, n_out, d]
            cols = op_b.T                                 # [D, blk]

            def fwd_step(S, idx_col):
                # gather-free: compute all K+1 candidate updates on the MXU,
                # then select with a one-hot contraction
                y = jnp.einsum('bj,kij->bki', S, G)
                oh = jax.nn.one_hot(idx_col, K1, dtype=S.dtype)
                return jnp.einsum('bki,bk->bi', y, oh), S
            S_final, F_prev = jax.lax.scan(fwd_step, rho0, cols)
            # F_prev[l] = state BEFORE layer l, [D, blk, d]

            if _use_pallas_bwd:
                # Pallas kernel: the A accumulator stays in VMEM for the
                # whole depth loop instead of round-tripping HBM every
                # layer (measured 28x faster than the einsum scan at the
                # 2Q maxL=64 shapes; ops/pallas_kernels.py)
                from pygsti_tpu.ops.pallas_kernels import bwd_jacobian_accumulate
                A, B_final = bwd_jacobian_accumulate(
                    op_b, G, E, jnp.transpose(F_prev, (1, 0, 2)), tile=128)
            else:
                def bwd_step(carry, xs):
                    Bc, A = carry
                    idx_col, f_prev = xs
                    onehot = jax.nn.one_hot(idx_col, K1, dtype=G.dtype)
                    A = A + jnp.einsum('bk,bni,bj->bnkij', onehot, Bc, f_prev)
                    yb = jnp.einsum('bni,kij->bnkj', Bc, G)
                    Bc = jnp.einsum('bnkj,bk->bnj', yb, onehot)
                    return (Bc, A), None

                A0 = jnp.zeros((op_b.shape[0], n_out, K1, dim, dim),
                               dtype=G.dtype)
                (B_final, A), _ = jax.lax.scan(
                    bwd_step, (E, A0), (cols[::-1], F_prev[::-1]))

            p = jnp.einsum('bni,bi->bn', E, S_final)
            nblk = op_b.shape[0]
            J_ops = A[:, :, :n_ops].reshape(nblk, n_out, n_ops * dim * dim)
            prep_oh = jax.nn.one_hot(prep_b, n_preps, dtype=G.dtype)
            J_preps = jnp.einsum('br,bnj->bnrj', prep_oh, B_final).reshape(
                nblk, n_out, n_preps * dim)
            eff_oh = jax.nn.one_hot(eff_b, n_eff, dtype=G.dtype)
            J_eff = jnp.einsum('bne,bj->bnej', eff_oh, S_final).reshape(
                nblk, n_out, n_eff * dim)
            Jt = jnp.concatenate([J_ops, J_preps, J_eff], axis=2)
            return p.reshape(-1), Jt.reshape(nblk * n_out, NT)

        def _bucket_data(elem_idx, nk, nk_pad, counts, totals, freqs):
            pad_el_k = (nk_pad - nk) * n_out
            cb = jnp.pad(counts[elem_idx], (0, pad_el_k))
            tb = jnp.pad(totals[elem_idx], (0, pad_el_k))
            fb = jnp.pad(freqs[elem_idx], (0, pad_el_k))
            return cb, tb, fb

        def jtj_jtf_fn(v, counts, totals, freqs, flag, regs):
            P = v.shape[0]
            tf = compute_flat(v)
            Tv = jax.jacfwd(compute_flat)(v)       # [NT, P]
            M = jnp.zeros((NT, NT), dtype=v.dtype)
            q = jnp.zeros(NT, dtype=v.dtype)
            ls_parts = []
            for op_b, prep_b, eff_b, elem_idx, nk, nk_pad in bucket_tensors:
                cb, tb, fb = _bucket_data(elem_idx, nk, nk_pad,
                                          counts, totals, freqs)
                p, Jt = _block_probs_jac(tf, op_b, prep_b, eff_b)
                p64 = p.astype(v.dtype)
                ls = raw.lsvec(p64, cb, tb, fb, flag, regs)
                dls = raw.dlsvec(p64, cb, tb, fb, flag, regs)
                Jw = dls.astype(j_dtype)[:, None] * Jt
                # per-bucket Gram matmul runs at the Jacobian dtype (MXU
                # rate) but the ACCUMULATION across buckets is the model
                # dtype (f64 under x64): f32 accumulation of ~1e8-scale
                # partial Grams loses enough precision to visibly degrade LM
                # convergence (measured Nsigma 500 -> 1039 on the 2Q bench)
                gram = jnp.matmul(Jw.T, Jw, precision=_gram_precision)
                gvec = jnp.matmul(Jw.T, ls.astype(j_dtype),
                                  precision=_gram_precision)
                M = M + gram.astype(v.dtype)
                q = q + gvec.astype(v.dtype)
                ls_parts.append(ls[:nk * n_out])
            ls = jnp.concatenate(ls_parts)[inv_perm]
            jtj = Tv.T @ (M @ Tv)
            jtf = Tv.T @ q
            if regularize_factor > 0:
                pen = regularize_factor * jnp.abs(v)
                ls = jnp.concatenate([ls, pen])
                jtj = jtj + (regularize_factor ** 2) * jnp.eye(P, dtype=v.dtype)
                jtf = jtf + regularize_factor * jnp.sign(v) * pen
            return ls, jtj, jtf

        def dlsvec_fn(v, counts, totals, freqs, flag, regs):
            tf = compute_flat(v)
            Tv = jax.jacfwd(compute_flat)(v)
            J_parts = []
            for op_b, prep_b, eff_b, elem_idx, nk, nk_pad in bucket_tensors:
                cb, tb, fb = _bucket_data(elem_idx, nk, nk_pad,
                                          counts, totals, freqs)
                p, Jt = _block_probs_jac(tf, op_b, prep_b, eff_b)
                dls = raw.dlsvec(p.astype(v.dtype), cb, tb, fb, flag, regs)
                Jb = ((dls.astype(j_dtype)[:, None] * Jt)
                      @ Tv.astype(j_dtype)).astype(v.dtype)
                J_parts.append(Jb[:nk * n_out])
            J = jnp.concatenate(J_parts, axis=0)[inv_perm]
            if regularize_factor > 0:
                J = jnp.concatenate([J, regularize_factor * jnp.diag(jnp.sign(v))],
                                    axis=0)
            return J
    else:
        # Mesh / non-uniform-outcome path.  On a 2-D ('circuits','params')
        # mesh the Jacobian tangent basis is sharded along 'params' (each
        # param-device column pushes its slice of jvp tangents through the
        # circuit-sharded probs graph) and the resulting [P, E] transposed
        # Jacobian is sharded along BOTH axes, so the JTJ Gram contraction
        # psums over 'circuits' while its [P, P] rows stay 'params'-sharded
        # -- the TPU-native analogue of the reference's param1 x param2
        # processor-grid distribution (distlayout.py:139-196,
        # arraysinterface.py:597).
        mesh = getattr(sim, 'mesh', None)
        param_sharded = mesh is not None and 'params' in mesh.axis_names
        from jax.sharding import NamedSharding, PartitionSpec as _P

        def _jac_t(v):
            """[P, E] transposed Jacobian of probs, params-sharded on a 2-D
            mesh."""
            if not param_sharded:
                return jax.jacfwd(probs_fn)(v).T
            basis = jnp.eye(v.shape[0], dtype=v.dtype)
            basis = jax.lax.with_sharding_constraint(
                basis, NamedSharding(mesh, _P('params', None)))
            Jt = jax.vmap(lambda t: jax.jvp(probs_fn, (v,), (t,))[1])(basis)
            return jax.lax.with_sharding_constraint(
                Jt, NamedSharding(mesh, _P('params', 'circuits')))

        def jtj_jtf_fn(v, counts, totals, freqs, flag, regs):
            p = probs_fn(v)
            ls = _lsvec_of_p(p, counts, totals, freqs, flag, regs)
            Jw = _weighted_jac_t(_jac_t(v), p, ls, counts, totals,
                                 freqs, flag, regs)    # [P, E]
            jtj = Jw @ Jw.T                        # psum over 'circuits'
            jtf = Jw @ ls
            if param_sharded:
                jtj = jax.lax.with_sharding_constraint(
                    jtj, NamedSharding(mesh, _P('params', None)))
            if regularize_factor > 0:
                pen = regularize_factor * jnp.abs(v)
                ls = jnp.concatenate([ls, pen])
                jtj = jtj + (regularize_factor ** 2) * jnp.eye(
                    v.shape[0], dtype=v.dtype)
                jtf = jtf + regularize_factor * jnp.sign(v) * pen
            return ls, jtj, jtf

        def dlsvec_fn(v, counts, totals, freqs, flag, regs):
            p = probs_fn(v)
            ls = _lsvec_of_p(p, counts, totals, freqs, flag, regs)
            J = _weighted_jac_t(_jac_t(v), p, ls, counts, totals, freqs,
                                flag, regs).T
            if regularize_factor > 0:
                J = jnp.concatenate([J, regularize_factor * jnp.diag(jnp.sign(v))],
                                    axis=0)
            return J

    pen_fn = _make_penalty_fn(model, penalties)
    if pen_fn is not None:
        base_lsvec, base_fnfn = lsvec_fn, fn_fn
        base_jtj, base_dls = jtj_jtf_fn, dlsvec_fn

        def lsvec_fn(v, counts, totals, freqs, flag, regs):
            return jnp.concatenate(
                [base_lsvec(v, counts, totals, freqs, flag, regs), pen_fn(v)])

        def fn_fn(v, counts, totals, freqs, flag, regs):
            return base_fnfn(v, counts, totals, freqs, flag, regs) \
                + jnp.sum(pen_fn(v) ** 2)

        def jtj_jtf_fn(v, counts, totals, freqs, flag, regs):
            ls, jtj, jtf = base_jtj(v, counts, totals, freqs, flag, regs)
            pen = pen_fn(v)
            Jp = jax.jacrev(pen_fn)(v)
            return (jnp.concatenate([ls, pen]), jtj + Jp.T @ Jp,
                    jtf + Jp.T @ pen)

        def dlsvec_fn(v, counts, totals, freqs, flag, regs):
            return jnp.concatenate(
                [base_dls(v, counts, totals, freqs, flag, regs),
                 jax.jacrev(pen_fn)(v)], axis=0)

    # Analytic FLOP count of one jtj_jtf evaluation (dominant terms), for
    # the bench's achieved-FLOPS / MFU instrumentation (BASELINE.md driver
    # metric: circuits/sec + Jacobian rows/sec).
    P_est = model.num_params
    E_est = layout.num_elements
    D_est = layout.op_indices.shape[1]
    d_est = model.dim
    if jac_mode == 'linearize':
        probs_fl = fact.flops_probs if fact is not None else \
            2 * D_est * B * (len(model.op_keys) + 1) * d_est * d_est
        flops_per_jtj = (
            2 * P_est * probs_fl          # P forward tangents (~2x probs each)
            + 2 * E_est * P_est * P_est   # Gram  J^T J
            + 2 * E_est * P_est)          # J^T f
    elif jac_mode == 'blocked' and n_out_uniform and mesh is None:
        flops_per_jtj = (
            2 * bucket_scan_work * K1 * d_est * d_est           # fwd scans
            + 4 * bucket_scan_work * n_out * K1 * d_est * d_est  # bwd accum
            + 2 * Bp * n_out * NT * NT                     # per-bucket Gram
            + 2 * NT * NT * P_est + 2 * NT * P_est * P_est  # chain via Tv
        )
    elif jac_mode == 'prodjac':
        n_lvl = sum(len(l) for l, _ in fact.levels)
        flops_per_jtj = (
            4 * (len(model.op_keys) * d_est * d_est) * n_lvl * d_est ** 3
            + 2 * E_est * NT * NT                           # Gram
            + 2 * NT * NT * P_est + 2 * NT * P_est * P_est)
    else:
        K1_est = len(model.op_keys) + 1
        B_est = layout.op_indices.shape[0]
        flops_per_jtj = (2 * D_est * B_est * K1_est * d_est * d_est
                         * (P_est + 1)                     # jacfwd tangents
                         + 2 * P_est * P_est * E_est)      # Gram

    from pygsti_tpu.tools.jitutils import big_dim_effort
    _bde = big_dim_effort(dim)
    fns = {
        'lsvec': _jit_fast(lsvec_fn, effort_default=_bde),
        'fn': _jit_fast(fn_fn, effort_default=_bde),
        'jtj_jtf': _jit_fast(jtj_jtf_fn, effort_default=_bde),
        'dlsvec': _jit_fast(dlsvec_fn, effort_default=_bde),
        'probs': _jit_fast(probs_fn, effort_default=_bde),
        'lsvec_raw': lsvec_fn,
        'jtj_jtf_raw': jtj_jtf_fn,
        'flops_per_jtj': float(flops_per_jtj),
        'jac_mode': jac_mode,
        # content identity for cross-layout executable reuse (run_device_lm's
        # global cache); a fresh object() when uncacheable so it never matches
        'content_key': gkey if gkey is not None else object(),
    }
    cache[key] = (sim, fns)   # hold the sim alive so its id stays valid
    if gkey is not None:
        _OBJ_GRAPH_GLOBAL_CACHE[gkey] = (sim, fns)
        while len(_OBJ_GRAPH_GLOBAL_CACHE) > _OBJ_GRAPH_GLOBAL_MAX:
            _OBJ_GRAPH_GLOBAL_CACHE.popitem(last=False)
    return fns


# -- standalone convenience fns (reference: tools/likelihoodfns.py, chi2fns.py)

def logl(model, dataset, circuits=None, min_prob_clip=1e-6,
         radius=DEFAULT_RADIUS, poisson_picture=True):
    # Note: the tools-level default min_prob_clip is 1e-6 (reference:
    # tools/likelihoodfns.py:115), NOT the GST objective default of 1e-4.
    """Log-likelihood of the model (up to the data-dependent constant used by
    the reference: returns logL = max_logl - delta_logl)."""
    circuits = list(circuits) if circuits is not None else list(dataset.keys())
    if poisson_picture:
        raw = RawPoissonPicDeltaLogLFunction({'min_prob_clip': min_prob_clip,
                                              'radius': radius})
    else:
        raw = RawDeltaLogLFunction({'min_prob_clip': min_prob_clip})
    obj = TimeIndependentMDCObjectiveFunction(raw, model, dataset, circuits)
    return logl_max(model, dataset, circuits, poisson_picture) - obj.fn()


def logl_max(model, dataset, circuits=None, poisson_picture=True):
    """Maximum achievable log-likelihood (model-independent)."""
    circuits = list(circuits) if circuits is not None else list(dataset.keys())
    total = 0.0
    for c in circuits:
        row = dataset[c]
        N = row.total
        for outcome, cnt in row.items():
            if cnt > 0:
                f = cnt / N
                total += cnt * np.log(f)
        if poisson_picture:
            total -= N  # sum_outcomes N*f = N
    return total


def two_delta_logl(model, dataset, circuits=None, min_prob_clip=1e-6,
                   radius=DEFAULT_RADIUS, poisson_picture=True):
    circuits = list(circuits) if circuits is not None else list(dataset.keys())
    if poisson_picture:
        raw = RawPoissonPicDeltaLogLFunction({'min_prob_clip': min_prob_clip,
                                              'radius': radius})
    else:
        raw = RawDeltaLogLFunction({'min_prob_clip': min_prob_clip})
    obj = TimeIndependentMDCObjectiveFunction(raw, model, dataset, circuits)
    return 2 * obj.fn()


def chi2(model, dataset, circuits=None, min_prob_clip_for_weighting=1e-4):
    circuits = list(circuits) if circuits is not None else list(dataset.keys())
    raw = RawChi2Function({'min_prob_clip_for_weighting': min_prob_clip_for_weighting})
    obj = TimeIndependentMDCObjectiveFunction(raw, model, dataset, circuits)
    return obj.fn()


class CachedObjectiveFunction(object):
    """Serializable snapshot of an objective function's values at a point
    (reference: objectivefns.py:6160 CachedObjectiveFunction)."""

    collection_name = "pygsti_cached_objective_fns"

    def __init__(self, objective_function):
        objfn = objective_function
        self.name = getattr(objfn, 'name', 'objfn')
        self.description = getattr(objfn, 'description', None)
        self.circuits = list(objfn.circuits)
        v = objfn.model.to_vector()
        self.model_paramvec = np.array(v)
        self.fn = float(objfn.fn())
        ls = objfn.lsvec()
        self.chi2k_distributed_fn = float(
            objfn.chi2k_distributed_qty(self.fn))
        self.num_elements = len(ls)
        self.lsvec_norm2 = float(np.dot(ls, ls))
        # per-circuit aggregated values
        layout = objfn.layout
        terms = np.asarray(ls) ** 2
        self.percircuit = np.array([
            float(np.sum(terms[layout.element_slices[i]]))
            for i in range(len(self.circuits))])
        self.chi2k_distributed_percircuit = np.array(
            [objfn.chi2k_distributed_qty(x) for x in self.percircuit])

    def write(self, dirname):
        import json
        import pathlib
        p = pathlib.Path(dirname)
        p.mkdir(parents=True, exist_ok=True)
        with open(p / 'cached_objfn.json', 'w') as f:
            json.dump({'name': self.name, 'fn': self.fn,
                       'chi2k_distributed_fn': self.chi2k_distributed_fn,
                       'num_elements': self.num_elements,
                       'lsvec_norm2': self.lsvec_norm2,
                       'circuits': [c.str for c in self.circuits],
                       'model_paramvec': self.model_paramvec.tolist(),
                       'percircuit': self.percircuit.tolist()}, f)

    @classmethod
    def from_dir(cls, dirname, quick_load=False):
        import json
        import pathlib
        with open(pathlib.Path(dirname) / 'cached_objfn.json') as f:
            state = json.load(f)
        obj = cls.__new__(cls)
        obj.name = state['name']
        obj.description = None
        obj.fn = state['fn']
        obj.chi2k_distributed_fn = state['chi2k_distributed_fn']
        obj.num_elements = state['num_elements']
        obj.lsvec_norm2 = state['lsvec_norm2']
        from pygsti_tpu.circuits.circuit import Circuit
        from pygsti_tpu.circuits.circuitparser import parse_circuit_str
        def _parse(cs):
            layers, lls = parse_circuit_str(cs)
            return Circuit(list(layers), lls if lls is not None else None)
        obj.circuits = [_parse(s) for s in state['circuits']]
        obj.model_paramvec = np.array(state['model_paramvec'])
        obj.percircuit = np.array(state['percircuit'])
        obj.chi2k_distributed_percircuit = obj.percircuit.copy()
        return obj


# ---------------------------------------------------------------------------
# Reference class-name surface (reference: objectivefns.py:1092-6100).
# The compiled TimeIndependentMDCObjectiveFunction above is the one engine;
# these bind each raw objective to it under the reference's class names.
# ---------------------------------------------------------------------------

ObjectiveFunction = RawObjectiveFunction      # reference base-class name
MDCObjectiveFunction = TimeIndependentMDCObjectiveFunction
LpNormToPowerP = RawAbsPower                  # reference name for |x|^p


def _bound_objective(raw_cls, default_name):
    class _Bound(TimeIndependentMDCObjectiveFunction):
        def __init__(self, model, dataset, circuits, regularization=None,
                     penalties=None, name=None, **kwargs):
            super().__init__(raw_cls(regularization), model, dataset,
                             circuits, penalties=penalties,
                             name=name or default_name, **kwargs)

        @classmethod
        def create_from(cls, model, dataset, circuits, regularization=None,
                        penalties=None, **kwargs):
            return cls(model, dataset, circuits, regularization, penalties,
                       **kwargs)

    return _Bound


class Chi2Function(_bound_objective(RawChi2Function, 'chi2')):
    """chi-squared objective bound to a model/dataset/circuits store
    (reference: objectivefns.Chi2Function)."""


class FreqWeightedChi2Function(_bound_objective(RawFreqWeightedChi2Function,
                                                'fwchi2')):
    """Frequency-weighted chi2 (reference:
    objectivefns.FreqWeightedChi2Function)."""


class ChiAlphaFunction(_bound_objective(RawChiAlphaFunction, 'chialpha')):
    """chi-alpha objective (reference: objectivefns.ChiAlphaFunction)."""


class CustomWeightedChi2Function(_bound_objective(RawCustomWeightedChi2Function,
                                                  'cwchi2')):
    """Custom-weighted chi2 (reference:
    objectivefns.CustomWeightedChi2Function)."""


class PoissonPicDeltaLogLFunction(_bound_objective(
        RawPoissonPicDeltaLogLFunction, 'dlogl')):
    """Poisson-picture delta-log-likelihood (reference:
    objectivefns.PoissonPicDeltaLogLFunction)."""


class DeltaLogLFunction(_bound_objective(RawDeltaLogLFunction,
                                         'dlogl-nonpoisson')):
    """Non-Poisson-picture delta-logl (reference:
    objectivefns.DeltaLogLFunction)."""


class MaxLogLFunction(_bound_objective(RawMaxLogLFunction, 'maxlogl')):
    """Maximum achievable log-likelihood (reference:
    objectivefns.MaxLogLFunction)."""


class TVDFunction(_bound_objective(RawTVDFunction, 'tvd')):
    """Total-variation-distance objective (reference:
    objectivefns.TVDFunction)."""


class EvaluatedModelDatasetCircuitsStore(ModelDatasetCircuitsStore):
    """ModelDatasetCircuitsStore that additionally caches the outcome
    probabilities at the model's current parameter point (reference:
    objectivefns.EvaluatedModelDatasetCircuitsStore:1092)."""

    def __init__(self, mdc_store, verbosity=0):
        super().__init__(mdc_store.model, mdc_store.dataset,
                         mdc_store.circuits,
                         precomp_layout=mdc_store.layout,
                         verbosity=verbosity)
        probs_by_circuit = self.model.sim.bulk_probs(self.circuits)
        self.probs = np.concatenate([
            np.array([probs_by_circuit[c][ol]
                      for ol in self.layout.outcomes[i]])
            for i, c in enumerate(self.circuits)]) \
            if self.circuits else np.empty(0)


class TermWeighted(TimeIndependentMDCObjectiveFunction):
    """Objective whose per-element terms are scaled by a constant weight
    vector w: f(params) = sum_i w_i * g_i(params) (reference:
    objectivefns.TermWeighted:5108)."""

    def __init__(self, raw_objfn, model, dataset, circuits, penalties=None,
                 name=None, **kwargs):
        super().__init__(raw_objfn, model, dataset, circuits,
                         penalties=penalties, name=name, **kwargs)
        self.terms_weights = np.ones(self.layout.num_elements)

    def terms(self, paramvec=None):
        return self.terms_weights * np.asarray(super().terms(paramvec))

    def fn(self, paramvec=None):
        return float(np.sum(self.terms(paramvec)))

    def lsvec(self, paramvec=None):
        return np.sqrt(np.clip(self.terms(paramvec), 0.0, None))


class TimeDependentMDCObjectiveFunction(object):
    """Objective over TIME-RESOLVED data: each element is a (circuit,
    outcome, timestamp) triple and probabilities are evaluated with the
    model's operations advanced to that timestamp via their ``set_time``
    method (reference: objectivefns.TimeDependentMDCObjectiveFunction:5217,
    whose forward simulators call op.set_time during propagation).

    Works with any model whose operations either implement ``set_time(t)``
    (time-aware error models) or ignore time entirely (static models, for
    which this reduces exactly to the time-independent objective evaluated
    per-timestamp).  This is a host-side path -- time-resolved datasets are
    small (drift/stability experiments), so there is no TPU batching here.
    """

    def __init__(self, raw_objfn, model, dataset, circuits, penalties=None,
                 name=None, verbosity=0):
        self.raw_objfn = raw_objfn
        self.model = model
        self.dataset = dataset
        self.circuits = list(circuits) if circuits is not None \
            else list(dataset.keys())
        self.name = name or raw_objfn.name
        # flatten the time series: one element per (circuit, time, outcome)
        self._elements = []  # (circuit, time, outcome, count, total_at_t)
        for c in self.circuits:
            row = dataset[c]
            if row.time is not None and len(row.time) > 0:
                times = np.asarray(row.time)
                series = row.outcome_series if row.outcome_series is not None \
                    else list(row.counts.keys())
                reps = row.reps if row.reps is not None \
                    else np.ones(len(times))
                for t in np.unique(times):
                    sel = np.where(times == t)[0]
                    tot = float(np.sum(np.asarray(reps)[sel]))
                    by_outcome = {}
                    for i in sel:
                        ol = series[i]
                        by_outcome[ol] = by_outcome.get(ol, 0.0) \
                            + float(reps[i])
                    for ol, cnt in by_outcome.items():
                        self._elements.append((c, float(t), ol, cnt, tot))
            else:
                tot = float(row.total)
                for ol, cnt in row.counts.items():
                    self._elements.append((c, 0.0, ol, float(cnt), tot))
        self.counts = np.array([e[3] for e in self._elements])
        self.total_counts = np.array([e[4] for e in self._elements])
        with np.errstate(invalid='ignore', divide='ignore'):
            self.freqs = np.where(self.total_counts > 0,
                                  self.counts / np.where(
                                      self.total_counts > 0,
                                      self.total_counts, 1.0), 0.0)

    @property
    def num_elements(self):
        return len(self._elements)

    def _set_model_time(self, t):
        for lbl in getattr(self.model, 'operations', {}):
            op = self.model.operations[lbl]
            if hasattr(op, 'set_time'):
                op.set_time(t)

    def probs_vector(self, paramvec=None):
        if paramvec is not None:
            self.model.from_vector(np.asarray(paramvec))
        probs = np.empty(self.num_elements)
        cache = {}
        for i, (c, t, ol, _, _) in enumerate(self._elements):
            key = (c, t)
            if key not in cache:
                self._set_model_time(t)
                cache[key] = self.model.probabilities(c)
            probs[i] = cache[key].get(ol, 0.0)
        return probs

    def terms(self, paramvec=None):
        p = self.probs_vector(paramvec)
        return np.asarray(self.raw_objfn.terms(
            jnp.asarray(p), jnp.asarray(self.counts),
            jnp.asarray(self.total_counts), jnp.asarray(self.freqs)))

    def lsvec(self, paramvec=None):
        return np.sqrt(np.clip(self.terms(paramvec), 0.0, None))

    def fn(self, paramvec=None):
        return float(np.sum(self.terms(paramvec)))

    def dterms(self, paramvec=None, eps=1e-7):
        """Finite-difference Jacobian of terms (host path; time-resolved
        datasets are small)."""
        v0 = np.asarray(paramvec if paramvec is not None
                        else self.model.to_vector(), float)
        t0 = self.terms(v0)
        jac = np.empty((len(t0), len(v0)))
        for k in range(len(v0)):
            v = v0.copy()
            v[k] += eps
            jac[:, k] = (self.terms(v) - t0) / eps
        self.model.from_vector(v0)
        return jac


class TimeDependentChi2Function(TimeDependentMDCObjectiveFunction):
    """Time-resolved chi2 (reference:
    objectivefns.TimeDependentChi2Function:5379)."""

    def __init__(self, model, dataset, circuits, regularization=None,
                 penalties=None, name='time-dep chi2', **kwargs):
        super().__init__(RawChi2Function(regularization), model, dataset,
                         circuits, penalties, name, **kwargs)


class TimeDependentPoissonPicLogLFunction(TimeDependentMDCObjectiveFunction):
    """Time-resolved Poisson-picture delta-logl (reference:
    objectivefns.TimeDependentPoissonPicLogLFunction:5541)."""

    def __init__(self, model, dataset, circuits, regularization=None,
                 penalties=None, name='time-dep logl', **kwargs):
        super().__init__(RawPoissonPicDeltaLogLFunction(regularization),
                         model, dataset, circuits, penalties, name, **kwargs)


class LogLWildcardFunction(object):
    """Wildcard-budget bolt-on over a log-likelihood objective: an
    objective over wildcard-budget parameter vectors that moves the bare
    probabilities within the per-circuit TVD budget before evaluating
    (reference: objectivefns.LogLWildcardFunction:6017)."""

    def __init__(self, logl_objective_fn, base_pt, wildcard):
        self.logl_objfn = logl_objective_fn
        self.basept = base_pt
        self.wildcard_budget = wildcard
        self.description = getattr(logl_objective_fn, 'name', 'logl') \
            + " + wildcard budget"
        self.probs = np.asarray(logl_objective_fn.probs())

    def __getattr__(self, attr):
        return getattr(self.__dict__['logl_objfn'], attr)

    def chi2k_distributed_qty(self, objective_function_value):
        return self.logl_objfn.chi2k_distributed_qty(
            objective_function_value)

    def fn(self, wvec=None):
        return float(np.sum(self.terms(wvec)))

    def terms(self, wvec=None):
        if wvec is not None:
            self.wildcard_budget.from_vector(np.asarray(wvec))
        objfn = self.logl_objfn
        new_probs = self.wildcard_budget.update_probs(
            self.probs, objfn.freqs, objfn.counts, objfn.total_counts,
            objfn.layout.element_slices, objfn.circuits)
        raw = objfn.raw_objfn
        return np.asarray(raw.terms(
            jnp.asarray(new_probs), jnp.asarray(objfn.counts),
            jnp.asarray(objfn.total_counts), jnp.asarray(objfn.freqs)))

    def lsvec(self, wvec=None):
        return np.sqrt(np.clip(self.terms(wvec), 0.0, None))
