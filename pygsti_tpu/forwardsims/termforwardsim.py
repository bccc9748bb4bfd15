"""Taylor-term forward simulator: circuit outcome probabilities as sparse
multivariate POLYNOMIALS in the model's error-generator rates (reference:
pygsti/forwardsims/termforwardsim.py:40 TermForwardSimulator, 'taylor-order'
mode; path values assembled into compact Polynomials evaluated by opcalc).

TPU-first re-design: instead of the reference's per-path C enumeration over
rank-one state-vector terms, paths are organized per *layer insertion*:

    prob(theta) = E^T  prod_l exp(sum_j theta_j L_{l,j}) G0_l  rho
               ~= [order 0]   E^T prod_l G0_l rho
                + [order 1]   sum_{l,j} theta_j   * b_{l+1}^T L_{l,j} f_l
                + [order 2]   same-layer 1/2 pairs + cross-layer pairs

where f_l / b_l are forward/backward partial products of the *base* (noise-
free) channels -- all dense batched matvecs that map directly onto the MXU.
The resulting Polynomial objects are compiled to compact tapes; evaluation
and differentiation at any parameter vector use baseobjs.opcalc (native C++
kernel when built).

Requirements: each circuit layer must decompose as static factors plus
ExpErrorgenOp factors whose error generator is linear in its parameters
(e.g. 'H', 'H+s', 'elements'-mode blocks).  SPAM may be Composed with such
error maps.  Models outside this family should use the dense simulators.
"""

from __future__ import annotations

import collections

import numpy as np

import jax
import jax.numpy as jnp

from pygsti_tpu.baseobjs.label import Label
from pygsti_tpu.baseobjs.outcomelabeldict import OutcomeLabelDict
from pygsti_tpu.baseobjs.polynomial import Polynomial, compact_polynomial_list
from pygsti_tpu.baseobjs import opcalc as _opcalc


def _accum(d, key, state, mag):
    """Accumulate (state, magnitude) into a monomial-key dict."""
    if key in d:
        s0, m0 = d[key]
        d[key] = (s0 + state, m0 + mag)
    else:
        d[key] = (state, mag)


class _LayerTerms(object):
    """base matrix G0 plus [(param_index, L_j), ...] linear generators."""

    __slots__ = ('base', 'pidx', 'gens')

    def __init__(self, base, pidx, gens):
        self.base = base              # [d, d] ndarray
        self.pidx = pidx              # [nj] int param indices (model-level)
        self.gens = gens              # [nj, d, d] ndarray


def _slice_indices(sl):
    if isinstance(sl, slice):
        return list(range(sl.start or 0, sl.stop or 0))
    return list(sl)


def _decompose_errormap(op, gp_offset):
    """Decompose an operation into an ordered list of _LayerTerms SUB-LAYERS.

    Static factors become pure-base sub-layers; each ExpErrorgenOp factor
    becomes an identity-base sub-layer carrying its generators.  Because each
    exponential is its own sub-layer, the path-insertion machinery reproduces
    the order-2 Taylor expansion of exp(sum theta_j L_j) exactly (the 1/2
    L_j L_k same-sub-layer terms), and cross-factor terms are exact products.
    gp_offset: model param index of op's first parameter.
    """
    from pygsti_tpu.modelmembers import operations as _op
    d = op.dim

    if op.num_params == 0:
        return [_LayerTerms(np.asarray(op.to_dense()), [], np.zeros((0, d, d)))]

    if isinstance(op, _op.ComposedOp):
        out = []
        off = gp_offset
        for f in op.factors:
            out.extend(_decompose_errormap(f, off))
            off += f.num_params
        return out

    if isinstance(op, _op.ExpErrorgenOp):
        eg = op.errorgen
        n = eg.num_params
        theta0 = np.zeros(n)
        L0 = np.asarray(eg.to_dense_jax(jnp.asarray(theta0)))
        if np.abs(L0).max() > 1e-12:
            raise ValueError("Term simulator requires errorgen(0) == 0")
        Lj = np.asarray(jax.jacfwd(
            lambda t: eg.to_dense_jax(t))(jnp.asarray(theta0)))  # [d,d,n]
        Lj = np.moveaxis(Lj, -1, 0)                              # [n,d,d]
        # verify param-linearity at a random test point
        rng = np.random.RandomState(0)
        tt = rng.randn(n) * 0.01
        L_test = np.asarray(eg.to_dense_jax(jnp.asarray(tt)))
        if np.abs(L_test - np.tensordot(tt, Lj, axes=1)).max() > 1e-9:
            raise ValueError(
                "Term simulator requires a param-linear error generator "
                "(e.g. 'H', 'H+s', or elements-mode blocks); got a nonlinear "
                "parameterization -- use a dense simulator instead.")
        return [_LayerTerms(np.eye(d), list(range(gp_offset, gp_offset + n)),
                            Lj)]

    raise ValueError("Term simulator cannot decompose operation of type %s"
                     % type(op).__name__)


class TermForwardSimulator(object):
    """Polynomial-probability simulator: Taylor path expansion to ANY
    ``max_order`` (reference: forwardsims/termforwardsim.py:40-161), with a
    'pruned' mode that keeps only paths above a magnitude threshold and
    adapts the threshold until the achieved-vs-maximum sum-of-path-magnitudes
    (SOPM) gap criterion is met (reference: termforwardsim.py:416-941
    pruned-path machinery + find_minimal_paths / SOPM gap control).

    Modes:
      'taylor-order' -- exact expansion to max_order (all paths kept)
      'pruned'       -- paths with magnitude below ``min_term_mag`` are
                        dropped; bulk evaluation adapts the threshold until
                        1 - achieved/max SOPM <= ``allowed_perr``
      'direct'       -- alias of 'taylor-order' with polynomials evaluated
                        immediately (no cache reuse across param vectors)
    """

    def __init__(self, model=None, max_order=2, mode='taylor-order',
                 min_term_mag=1e-10, allowed_perr=1e-4, max_paths_per_outcome=None,
                 perr_heuristic='none', max_term_stages=5):
        assert mode in ('taylor-order', 'direct', 'pruned'), \
            "mode must be 'taylor-order', 'direct' or 'pruned'"
        self.model = model
        self.max_order = max_order
        self.mode = mode
        self.min_term_mag = min_term_mag
        self.allowed_perr = allowed_perr
        self.max_paths_per_outcome = max_paths_per_outcome
        self.perr_heuristic = perr_heuristic
        self.max_term_stages = max_term_stages
        self._poly_cache = {}

    # -- model decomposition -------------------------------------------------

    def _gp_offset(self, member):
        gp = getattr(member, 'gpindices', None)
        if gp is None:
            return 0
        if isinstance(gp, slice):
            return gp.start or 0
        return int(gp[0]) if len(gp) else 0

    def _layer_terms(self, lbl):
        """Ordered sub-layer list for one circuit layer."""
        model = self.model
        ops = model.operations
        if lbl in ops:
            return _decompose_errormap(ops[lbl], self._gp_offset(ops[lbl]))
        if not lbl.is_simple:
            out = []
            for comp in lbl.components:
                op_c = ops[comp]
                out.extend(_decompose_errormap(op_c, self._gp_offset(op_c)))
            return out
        raise KeyError("No operation for layer %s" % str(lbl))

    def _spam_terms(self, prep_lbl, povm_lbl):
        from pygsti_tpu.modelmembers.states import ComposedState
        from pygsti_tpu.modelmembers.povms import ComposedPOVM
        model = self.model
        prep = model.preps[prep_lbl]
        povm = model.povms[povm_lbl]
        d = model.dim

        prep_layers = []
        if isinstance(prep, ComposedState):
            prep_layers = _decompose_errormap(prep.error_map,
                                              self._gp_offset(prep))
            rho = np.asarray(prep.state_vec.to_dense())
        else:
            rho = np.asarray(prep.to_dense())

        povm_layers = []
        if isinstance(povm, ComposedPOVM):
            povm_layers = _decompose_errormap(povm.error_map,
                                              self._gp_offset(povm))
            E = np.asarray(povm.base_povm.to_dense())
            outcomes = povm.base_povm.outcome_labels
        else:
            E = np.asarray(povm.to_dense())
            outcomes = povm.outcome_labels
        return rho, prep_layers, E, outcomes, povm_layers

    # -- polynomial construction ---------------------------------------------

    def _build_layers(self, circuit):
        """(rho, E, outcomes, ordered sub-layer list) for a circuit."""
        model = self.model
        prep_lbl = model._default_prep_label()
        povm_lbl = model._default_povm_label()
        rho, prep_layers, E, outcomes, povm_layers = \
            self._spam_terms(prep_lbl, povm_lbl)
        layers = list(prep_layers)
        for lbl in circuit.layertup:
            layers.extend(self._layer_terms(Label(lbl)))
        layers.extend(povm_layers)
        return rho, E, outcomes, layers

    def prob_polynomials_general(self, circuit, max_order=None,
                                 min_term_mag=0.0):
        """Arbitrary-order Taylor expansion with optional path pruning.

        Returns (polys, outcomes, achieved_sopm, max_sopm).  Paths are
        accumulated layer-by-layer as {monomial-key: (state, magnitude)}
        with the within-layer recursion A_m = (1/m) sum_j theta_j L_j A_{m-1}
        (== (sum_j theta_j L_j)^m / m!), replacing the reference's rank-one
        C path enumeration (termforwardsim_calc_*.pyx k-best-path loops).
        Path magnitude = prod |theta_j| * ||L_j||_2 / (multiplicity factors);
        max_sopm = prod_l exp(sum_j |theta_j| ||L_j||_2) (base channels
        assumed norm <= 1, i.e. near-CPTP)."""
        max_order = max_order if max_order is not None else self.max_order
        rho, E, outcomes, layers = self._build_layers(circuit)
        nE = E.shape[0]
        mags = np.abs(np.asarray(self.model.to_vector()))

        max_sopm = 1.0
        opnorms = []
        for lt in layers:
            norms = [np.linalg.norm(g, 2) for g in lt.gens]
            opnorms.append(norms)
            tot = sum(mags[p] * nrm for p, nrm in zip(lt.pidx, norms))
            max_sopm *= float(np.exp(tot))

        carry = {(): (rho.astype(float), 1.0)}
        for l, lt in enumerate(layers):
            new_carry = {}
            for key, (s, mag) in carry.items():
                s0 = lt.base @ s
                _accum(new_carry, key, s0, mag)
                room = max_order - len(key)
                prev = {key: (s0, mag)}
                for m in range(1, room + 1):
                    nxt = {}
                    for k2, (s2, mg2) in prev.items():
                        for j, p in enumerate(lt.pidx):
                            newkey = tuple(sorted(k2 + (p,)))
                            contrib = (lt.gens[j] @ s2) / m
                            mg = mg2 * mags[p] * opnorms[l][j] / m
                            _accum(nxt, newkey, contrib, mg)
                    if min_term_mag > 0:
                        nxt = {k: v for k, v in nxt.items()
                               if v[1] >= min_term_mag}
                    for k2, (s2, mg2) in nxt.items():
                        _accum(new_carry, k2, s2, mg2)
                    prev = nxt
                    if not prev:
                        break
            carry = new_carry

        achieved_sopm = float(sum(mag for _, mag in carry.values()))
        polys = [Polynomial() for _ in range(nE)]
        for key, (s, _mag) in carry.items():
            vals = E @ s
            for e in range(nE):
                polys[e][key] = polys[e].get(key, 0) + float(vals[e])
        return polys, outcomes, achieved_sopm, min(max_sopm, np.inf)

    def prob_polynomials(self, circuit):
        """List of Polynomial (one per outcome) for `circuit`, in the model's
        parameter variables, Taylor-expanded around zero error rates."""
        if self.mode == 'pruned':
            return self._pruned_polynomials(circuit)
        if self.max_order > 2:
            polys, outcomes, _, _ = self.prob_polynomials_general(circuit)
            return polys, outcomes
        key = (circuit, self.max_order)
        if key in self._poly_cache:
            return self._poly_cache[key]
        model = self.model
        prep_lbl = model._default_prep_label()
        povm_lbl = model._default_povm_label()
        rho, prep_layers, E, outcomes, povm_layers = \
            self._spam_terms(prep_lbl, povm_lbl)

        layers = list(prep_layers)
        for lbl in circuit.layertup:
            layers.extend(self._layer_terms(Label(lbl)))
        layers.extend(povm_layers)

        D = len(layers)
        nE = E.shape[0]

        # forward states f_l = G0_l ... G0_0 rho   (f[-1] = rho)
        f = [rho]
        for lt in layers:
            f.append(lt.base @ f[-1])
        # backward effects b_l = E G0_{D-1} ... G0_l   (b[D] = E)
        b = [None] * (D + 1)
        b[D] = E
        for l in range(D - 1, -1, -1):
            b[l] = b[l + 1] @ layers[l].base

        # constant term: f[D] includes all base layers
        polys = [Polynomial({(): float(E[e] @ f[D])}) for e in range(nE)]

        if self.max_order >= 1:
            for l, lt in enumerate(layers):
                if len(lt.pidx) == 0:
                    continue
                Lf = np.einsum('jab,b->ja', lt.gens, f[l])     # insert AFTER base_l
                vals = b[l + 1] @ Lf.T                          # [nE, nj]
                for e in range(nE):
                    for j, p in enumerate(lt.pidx):
                        polys[e][(p,)] = polys[e].get((p,), 0) + vals[e, j]

        if self.max_order >= 2:
            # same-layer: 1/2 * sum_{j,k} theta_j theta_k L_j L_k
            for l, lt in enumerate(layers):
                nj = len(lt.pidx)
                if nj == 0:
                    continue
                Lf = np.einsum('jab,b->ja', lt.gens, f[l])      # [nj, d]
                LLf = np.einsum('jab,kb->jka', lt.gens, Lf)     # [nj(outer),nk,d]
                vals = np.einsum('ea,jka->ejk', b[l + 1], LLf)  # [nE,nj,nk]
                for e in range(nE):
                    for j in range(nj):
                        for k in range(nj):
                            key2 = tuple(sorted((lt.pidx[j], lt.pidx[k])))
                            polys[e][key2] = polys[e].get(key2, 0) \
                                + 0.5 * vals[e, j, k]
            # cross-layer pairs l < m
            for l, lt in enumerate(layers):
                nj = len(lt.pidx)
                if nj == 0:
                    continue
                S = np.einsum('jab,b->ja', lt.gens, f[l])       # [nj, d]
                for m in range(l + 1, D):
                    mt = layers[m]
                    # insertion at layer m happens AFTER its base channel
                    S = np.einsum('ab,jb->ja', mt.base, S)
                    if len(mt.pidx):
                        LS = np.einsum('kab,jb->kja', mt.gens, S)   # [nk,nj,d]
                        vals = np.einsum('ea,kja->ekj', b[m + 1], LS)
                        for e in range(nE):
                            for k in range(len(mt.pidx)):
                                for j in range(nj):
                                    key2 = tuple(sorted((lt.pidx[j],
                                                         mt.pidx[k])))
                                    polys[e][key2] = polys[e].get(key2, 0) \
                                        + vals[e, k, j]

        out = (polys, outcomes)
        self._poly_cache[key] = out
        return out

    def _pruned_polynomials(self, circuit):
        """Pruned-path polynomials with SOPM gap control (reference:
        termforwardsim.py:416-941): lower min_term_mag by 10x per stage until
        the relative SOPM gap 1 - achieved/max is <= allowed_perr, up to
        max_term_stages refinements."""
        mags_hash = hash(np.abs(np.asarray(
            self.model.to_vector())).round(12).tobytes())
        key = (circuit, self.max_order, 'pruned', mags_hash)
        if key in self._poly_cache:
            return self._poly_cache[key]
        mag = self.min_term_mag
        polys = outcomes = None
        for stage in range(self.max_term_stages):
            polys, outcomes, achieved, max_sopm = \
                self.prob_polynomials_general(circuit, min_term_mag=mag)
            gap = 1.0 - achieved / max_sopm if max_sopm > 0 else 0.0
            if gap <= self.allowed_perr:
                break
            mag /= 10.0
        out = (polys, outcomes)
        self._poly_cache[key] = out
        return out

    def sopm_gap(self, circuit):
        """(achieved_sopm, max_sopm) for the current parameters -- the
        pruned-path quality diagnostic (reference: bulk_sopm / 'meanscaled'
        achieved-vs-max gap machinery)."""
        _, _, achieved, max_sopm = self.prob_polynomials_general(
            circuit, min_term_mag=self.min_term_mag
            if self.mode == 'pruned' else 0.0)
        return achieved, max_sopm

    # -- evaluation ----------------------------------------------------------

    def probs(self, circuit, clip_to=None, time=None):
        if time is not None:
            raise NotImplementedError(
                "the Taylor-term simulator evaluates time-independent "
                "polynomials; time-dependent probabilities are unsupported")
        polys, outcomes = self.prob_polynomials(circuit)
        v = np.asarray(self.model.to_vector())
        vt, ct = compact_polynomial_list(polys)
        vals = np.real(_opcalc.bulk_eval_compact_polynomials_complex(
            vt, ct, v.astype(complex), (len(polys),)))
        if clip_to is not None:
            vals = np.clip(vals, clip_to[0], clip_to[1])
        return OutcomeLabelDict([((o,) if not isinstance(o, tuple) else o, float(p))
                                 for o, p in zip(outcomes, vals)])

    def bulk_probs(self, circuits, clip_to=None):
        return {c: self.probs(c, clip_to) for c in circuits}

    def dprobs(self, circuit):
        """Outcome-prob derivatives via compact_deriv + opcalc evaluation."""
        polys, outcomes = self.prob_polynomials(circuit)
        v = np.asarray(self.model.to_vector())
        P = len(v)
        vt, ct = compact_polynomial_list(polys)
        dmat = np.real(_opcalc.bulk_eval_compact_polynomials_derivs_complex(
            vt, ct, np.arange(P), v.astype(complex), (len(polys), P)))
        return OutcomeLabelDict([((o,) if not isinstance(o, tuple) else o,
                                  dmat[i]) for i, o in enumerate(outcomes)])
