"""Device-resident Levenberg-Marquardt: the whole LM loop as ONE jitted
graph (lax.while_loop), eliminating per-iteration host round trips.

Mirrors the update semantics of simplish_leastsq (see optimize/simplerlm.py
and the reference pygsti/optimize/simplerlm.py:391): identity damping on the
JTJ diagonal, (mu, nu) schedule with gain-ratio factor 1-(2 dF/dL-1)^3,
guarded backtracking line search, and the same convergence criteria.

Out-of-bounds protocol (reference simplerlm.py:500-546, 590-640): the
runtime ``oob_interval`` argument enables OOB checking every
``oob_interval`` outer iterations against a jittable ``oob_fn(x, *data) ->
bool`` predicate (True = out of bounds).  OOB candidates are rejected with
the standard damping update (oob_action="reject"); best-x tracking only
records known-in-bounds points; and a convergence exit reached while
``oob_interval > 1`` REVERTS to the best known in-bounds point with the
interval reset to 1 (the reference's revert_to_best_x) instead of
terminating -- so the returned optimum is always OOB-validated when
checking is on.  With ``oob_fn=None`` the predicate is constantly
in-bounds, which makes intervals 0/1 exactly equivalent (matching the
reference's behavior for dense objectives, where obj_fn(oob_check=True)
never raises).

Exit codes: 0 = running, 1 = f_norm2_tol, 2 = jac_norm_tol, 3 = rel_xtol,
4 = rel_ftol, 5 = max_iter, 6 = nu overflow, 7 = singular, 8 = non-finite.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Any

import numpy as np

import jax
import jax.numpy as jnp

# Per-run throughput stats appended by MDCObjectiveFunction.run_device_lm
# (iters, wall_s, flops_per_iter, num_circuits/elements/params); consumed by
# bench.py for achieved-FLOPS / MFU / circuits-per-sec instrumentation.
LM_RUN_STATS = []


class _LMState(NamedTuple):
    k: Any
    x: Any
    f: Any
    norm_f: Any
    mu: Any
    nu: Any
    best_x: Any
    best_norm_f: Any
    best_f: Any
    best_mu: Any
    best_nu: Any
    exit_code: Any
    oob_interval: Any


def _solve_damped(JTJ, jtj_diag, mu, minus_JTf):
    """Solve (JTJ + mu*I) dx = -JTf via Cholesky; NaNs signal failure."""
    A = JTJ.at[jnp.diag_indices_from(JTJ)].set(jtj_diag + mu)
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, minus_JTf, lower=True)
    dx = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return dx


def _solve_damped_cg(JTJ, jtj_diag, mu, minus_JTf, maxiter=250, tol=1e-12):
    """Solve (JTJ + mu*I) dx = -JTf with Jacobi-preconditioned conjugate
    gradient.  Every operation is a matvec / elementwise op, so when JTJ is
    params-sharded on a device mesh the solve stays FULLY SHARDED (XLA
    inserts psums for the matvec) -- the TPU-native analogue of the
    reference's distributed `custom_solve` / "fine" LM-vector distribution
    (pygsti/optimize/customsolve.py:30, arraysinterface.py:597), replacing
    its hand-rolled distributed Gaussian elimination.  Cholesky, by
    contrast, forces XLA to gather the full [P, P] matrix onto every
    device."""
    diag = jtj_diag + mu  # A's diagonal (A = JTJ off-diag + this diag)

    def matvec(x):
        # A @ x where A is JTJ with its diagonal replaced by jtj_diag + mu
        return JTJ @ x + (diag - jtj_diag) * x

    inv_diag = 1.0 / jnp.maximum(diag, 1e-300)
    dx, _ = jax.scipy.sparse.linalg.cg(
        matvec, minus_JTf, tol=tol, maxiter=maxiter,
        M=lambda r: inv_diag * r)
    return dx


def make_device_lm(jtj_jtf_fn, lsvec_fn, num_params,
                   ls_beta=0.25, ls_max_evals=6, ls_kappa=1.0,
                   max_inner=16, oob_fn=None, solver='cholesky'):
    """Build the jitted LM driver.

    jtj_jtf_fn(x, *data) -> (f, JTJ, JTf);  lsvec_fn(x, *data) -> f;
    oob_fn(x, *data) -> bool (True = out of bounds), or None for a
    constantly-in-bounds predicate.
    Returns (lm_init, lm_chunk, lm_finalize).  Convergence tolerances, the
    iteration cap, AND the OOB check interval are RUNTIME arguments (a
    5-vector `tols` = [f_norm2_tol, jac_norm_tol, rel_ftol, rel_xtol,
    max_norm_dx], the integers k_stop / max_iter, and lm_init's
    oob_interval), so every GST stage -- chi2 iterations, the final logL
    stage, different maxiters, safe/unsafe OOB modes -- shares one compiled
    executable.
    """
    tau = 1e-3
    half_max_nu = 2.0 ** 62
    if oob_fn is None:
        def oob_fn(x, *data):
            return jnp.asarray(False)
    # 'cholesky' (exact, gathers [P,P] per device) or 'cg' (matvec-only --
    # stays params-sharded on a mesh; the customsolve.py analogue)
    solve_damped = _solve_damped if solver == 'cholesky' else _solve_damped_cg

    def lm_init(x0, *data, oob_interval=0):
        f0 = lsvec_fn(x0, *data)
        norm_f0 = jnp.dot(f0, f0)
        return _LMState(jnp.asarray(0), x0, f0, norm_f0,
                        jnp.asarray(1.0, x0.dtype), jnp.asarray(2.0, x0.dtype),
                        x0, norm_f0, f0,
                        jnp.asarray(1.0, x0.dtype), jnp.asarray(2.0, x0.dtype),
                        jnp.asarray(0), jnp.asarray(oob_interval, jnp.int32))

    def lm_chunk(state, k_stop, tols, *data):
        """Advance the LM loop until exit or `k_stop` iterations (bounded
        per-call work keeps single TPU programs under the runtime's
        execution watchdog; state stays on device between calls)."""
        f_norm2_tol, jac_norm_tol, rel_ftol, rel_xtol, max_norm_dx = \
            tols[0], tols[1], tols[2], tols[3], tols[4]

        def cond(st):
            return (st.exit_code == 0) & (st.k < k_stop)

        def body(st):
            # use the carried residual (lsvec evaluations at the simulator's
            # propagation precision) rather than the Jacobian pass's f, which
            # is computed at the (possibly lower) Jacobian dtype
            _, JTJ, JTf = jtj_jtf_fn(st.x, *data)
            f = st.f
            norm_f = st.norm_f
            minus_JTf = -JTf
            jtj_diag = jnp.diag(JTJ)
            norm_JTf = jnp.max(jnp.abs(minus_JTf))
            norm_x = jnp.dot(st.x, st.x)
            finite_jtj = jnp.all(jnp.isfinite(JTJ))

            mu0 = jnp.where(st.k == 0, tau * jnp.max(jtj_diag), st.mu)
            nu0 = jnp.where(st.k == 0, 2.0, st.nu)

            interval = st.oob_interval
            do_oob_k = (interval > 0) & \
                (jnp.mod(st.k, jnp.maximum(interval, 1)) == 0)

            # ---- inner damping loop -------------------------------------
            # One residual (lsvec) evaluation per inner iteration: the solve /
            # full-step trial / backtracking line search are folded into a
            # two-phase state machine so the big probs graph is inlined into
            # the compiled program exactly ONCE (three separate inlined
            # instances made the cold XLA compile of this executable take
            # minutes).  Bounded at max_evals lsvec evaluations per body call:
            # an unbounded ladder inside one device program can exceed the TPU
            # runtime's execution watchdog (which kills the worker).  On
            # hitting the bound the (mu, nu) ladder state carries into the
            # next outer iteration, which recomputes the same JTJ at the
            # unchanged x and continues the ladder.
            max_evals = 3 * max_inner
            zero_t = jnp.asarray(0.0, st.x.dtype)
            one_t = jnp.asarray(1.0, st.x.dtype)

            def pack(mu, nu, done, accepted, new_x, new_f, nnf, code, k,
                     phase, dx, solve_ok, clip, norm_dx, t_cur, best_t,
                     best_norm, ls_stop):
                return (mu, nu, done, accepted, new_x, new_f, nnf, code, k,
                        phase, dx, solve_ok, clip, norm_dx, t_cur, best_t,
                        best_norm, ls_stop)

            def inner_cond(c):
                done, k = c[2], c[8]
                return jnp.logical_not(done) & (k < max_evals)

            def inner_body(c):
                (mu, nu, done, accepted, bx, bf, bnf, code, k,
                 phase, dx_prev, sok_prev, clip_prev, ndx_prev, t_cur,
                 best_t, best_norm, ls_stop) = c

                # phase 0: new damped solve (full step, t=1); phase 1: reuse
                # the carried dx and try the next backtracked t.
                def new_solve(_):
                    dx = solve_damped(JTJ, jtj_diag, mu, minus_JTf)
                    solve_ok = jnp.all(jnp.isfinite(dx))
                    norm_dx = jnp.dot(dx, dx)
                    clip = norm_dx > max_norm_dx
                    scale = jnp.where(
                        clip,
                        jnp.sqrt(max_norm_dx / jnp.maximum(norm_dx, 1e-300)),
                        1.0)
                    dx = dx * scale
                    return dx, solve_ok, clip, jnp.dot(dx, dx), one_t

                def keep_dx(_):
                    return dx_prev, sok_prev, clip_prev, ndx_prev, t_cur

                dx, solve_ok, clip, norm_dx, t = jax.lax.cond(
                    phase == 0, new_solve, keep_dx, None)

                # THE single inlined residual evaluation
                trial_x = st.x + t * dx
                trial_f = lsvec_fn(trial_x, *data)
                trial_norm = jnp.dot(trial_f, trial_f)

                xtol_conv = norm_dx < (rel_xtol ** 2) * norm_x
                # guarded backtracking line search trigger (full step only)
                do_ls = clip | (norm_dx > (ls_kappa ** 2) * norm_x) \
                    | jnp.logical_not(jnp.isfinite(trial_norm))
                start_ls = (phase == 0) & do_ls

                # -- line-search bookkeeping (phase 1, incl. the entering eval)
                better = jnp.isfinite(trial_norm) & (trial_norm < best_norm) \
                    & ~ls_stop
                nbest_t = jnp.where(better, t, best_t)
                nbest_norm = jnp.where(better, trial_norm, best_norm)
                nbest_f = jnp.where(better, trial_f, bf)
                nls_stop = ls_stop | ~better
                # trials run at t = beta^1 .. beta^ls_max_evals; stop early at
                # the first non-improving trial (matching the reference's
                # guarded backtracking, simplerlm.py:500-546)
                ls_done = nls_stop | (t <= (ls_beta ** ls_max_evals) * 1.0001)

                # does this iteration CONCLUDE an attempt?
                conclude = jnp.where(phase == 0, ~do_ls, ls_done)

                # concluded-attempt quantities
                att_t = jnp.where(phase == 0, one_t, nbest_t)
                att_f = jnp.where(phase == 0, trial_f, nbest_f)
                att_norm = jnp.where(phase == 0, trial_norm, nbest_norm)
                shrunk = att_t < 1.0
                dx2 = dx * att_t
                new_x = st.x + dx2
                norm_dx2 = jnp.dot(dx2, dx2)

                dL = jnp.dot(dx2, mu * dx2 + minus_JTf)
                dF = norm_f - att_norm

                ftol_conv = (dL / norm_f < rel_ftol) & (dF >= 0) \
                    & (dF / norm_f < rel_ftol) & (dF / jnp.maximum(dL, 1e-300) < 2.0)

                # OOB check of the concluded candidate (reference
                # eval_candidate + oob_action="reject": an out-of-bounds
                # candidate is rejected with the standard damping update)
                oob_att = do_oob_k & oob_fn(new_x, *data)

                accept = solve_ok & jnp.isfinite(att_norm) & (dL > 0) & (dF > 0) \
                    & ~xtol_conv & ~ftol_conv & ~oob_att

                # damping update on accept
                t_gain = 1.0 - (2 * dF / jnp.maximum(dL, 1e-300) - 1.0) ** 3
                mu_factor = jnp.where(norm_dx2 > 1e-8, jnp.maximum(t_gain, 1.0 / 3.0), 0.3)
                mu_factor = jnp.where(shrunk, jnp.maximum(mu_factor, 1.0), mu_factor)
                mu_acc = mu * mu_factor
                nu_acc = jnp.asarray(2.0, st.x.dtype)

                # reject: mu *= nu; nu *= 2  (exit on nu overflow)
                mu_rej = mu * nu
                nu_rej = 2 * nu
                overflow = nu > half_max_nu

                code_att = jnp.where(xtol_conv, 3,
                            jnp.where(ftol_conv, 4,
                             jnp.where(accept, 0,
                              jnp.where(overflow, 6,
                               jnp.where(~jnp.isfinite(att_norm) & ~solve_ok, 8, 0)))))
                done_att = accept | xtol_conv | ftol_conv | overflow
                mu_att = jnp.where(accept, mu_acc, jnp.where(done_att, mu, mu_rej))
                nu_att = jnp.where(accept, nu_acc, jnp.where(done_att, nu, nu_rej))

                # -- merge: start linesearch / continue linesearch / conclude
                init_norm = jnp.where(jnp.isfinite(trial_norm), trial_norm,
                                      jnp.asarray(jnp.inf, st.x.dtype))
                phase_n = jnp.where(conclude, 0, jnp.where(start_ls, 1, phase))
                t_next = jnp.where(start_ls, jnp.asarray(ls_beta, st.x.dtype),
                                   t * ls_beta)
                best_t_n = jnp.where(start_ls, one_t, nbest_t)
                best_norm_n = jnp.where(start_ls, init_norm, nbest_norm)
                best_f_n = jnp.where(start_ls, trial_f, nbest_f)
                ls_stop_n = jnp.where(start_ls, False, nls_stop)

                mu_n = jnp.where(conclude, mu_att, mu)
                nu_n = jnp.where(conclude, nu_att, nu)
                done_n = jnp.where(conclude, done_att, False)
                acc_n = jnp.where(conclude, accept, False)
                code_n = jnp.where(conclude, code_att, 0)
                out_x = jnp.where(conclude & accept, new_x, bx)
                out_f = jnp.where(conclude & accept, att_f, best_f_n)
                out_nf = jnp.where(conclude & accept, att_norm, bnf)

                return pack(mu_n, nu_n, done_n, acc_n, out_x, out_f, out_nf,
                            code_n, k + 1, phase_n, dx, solve_ok, clip,
                            norm_dx, t_next, best_t_n, best_norm_n, ls_stop_n)

            init_c = pack(mu0, nu0, jnp.asarray(False), jnp.asarray(False),
                          st.x, f, norm_f, jnp.asarray(0), jnp.asarray(0),
                          jnp.asarray(0), jnp.zeros_like(st.x),
                          jnp.asarray(True), jnp.asarray(False), zero_t,
                          one_t, one_t,
                          jnp.asarray(jnp.inf, st.x.dtype), jnp.asarray(False))
            final_c = jax.lax.while_loop(inner_cond, inner_body, init_c)
            (mu_f, nu_f, _, accepted, new_x, new_f, norm_new_f, inner_code,
             _ik) = final_c[:9]

            x1 = jnp.where(accepted, new_x, st.x)
            f1 = jnp.where(accepted, new_f, f)
            norm_f1 = jnp.where(accepted, norm_new_f, norm_f)

            # best-x tracking records only KNOWN-IN-BOUNDS points (reference
            # simplerlm.py:881-894: post-accept oob check before updating
            # best_x).  When this iteration ran the periodic check, an
            # accepted point already passed it; otherwise check it now.
            inbounds = (interval == 0) | do_oob_k | ~oob_fn(x1, *data)
            improved = accepted & (norm_f1 < st.best_norm_f) & inbounds
            best_x = jnp.where(improved, x1, st.best_x)
            best_norm_f = jnp.where(improved, norm_f1, st.best_norm_f)
            best_f = jnp.where(improved, f1, st.best_f)
            best_mu = jnp.where(improved, mu_f, st.best_mu)
            best_nu = jnp.where(improved, nu_f, st.best_nu)

            exit_code = jnp.where(norm_f < f_norm2_tol, 1,
                         jnp.where(norm_JTf < jac_norm_tol, 2,
                          jnp.where(~finite_jtj, 8, inner_code)))

            # revert_to_best_x (reference simplerlm.py:598-604): a
            # convergence exit (codes 1-4) reached while oob_interval > 1
            # reverts to the last known in-bounds point and drops the
            # interval to 1 instead of terminating, so the final optimum is
            # OOB-validated.
            conv_exit = (exit_code >= 1) & (exit_code <= 4)
            do_revert = conv_exit & (interval > 1)
            x1 = jnp.where(do_revert, best_x, x1)
            f1 = jnp.where(do_revert, best_f, f1)
            norm_f1 = jnp.where(do_revert, best_norm_f, norm_f1)
            mu_f = jnp.where(do_revert, best_mu, mu_f)
            nu_f = jnp.where(do_revert, best_nu, nu_f)
            exit_code = jnp.where(do_revert, 0, exit_code)
            new_interval = jnp.where(do_revert, 1, interval)

            return _LMState(st.k + 1, x1, f1, norm_f1, mu_f, nu_f,
                            best_x, best_norm_f, best_f, best_mu, best_nu,
                            exit_code, new_interval)

        return jax.lax.while_loop(cond, body, state)

    def lm_finalize(final, max_iter):
        # pure-host numpy: a jitted version of this trivial select cost ~10s
        # of cold XLA compile (f64 emulation passes over the [E]-sized state
        # arrays) for microseconds of device work
        k = int(final.k)
        exit_code = int(final.exit_code)
        if exit_code == 0 and k >= int(max_iter):
            exit_code = 5
        norm_f = float(final.norm_f)
        best_norm_f = float(final.best_norm_f)
        # return the best known point (matching the host loop / reference)
        if best_norm_f <= norm_f:
            x_out, f_out, norm_out = final.best_x, final.best_f, best_norm_f
        else:
            x_out, f_out, norm_out = final.x, final.f, norm_f
        return (np.asarray(x_out), np.asarray(f_out), norm_out,
                float(final.mu), float(final.nu), exit_code, k)

    return lm_init, lm_chunk, lm_finalize


EXIT_MESSAGES = {
    1: "Sum of squares is at most tolerance",
    2: "norm(J'f) is at most tolerance",
    3: "Relative change, |dx|/|x|, is at most rel_xtol",
    4: "Both actual and predicted relative reductions are at most rel_ftol",
    5: "Maximum iterations exceeded (treated as converged)",
    6: "Stopping after nu overflow",
    7: "(near-)singular linear system",
    8: "Non-finite values encountered",
}
