"""Rank-K blocked simplex driver: amortize tableau traffic over K pivots.

The rank-1 driver (``driver.py``) is HBM-bound: every pivot reads and writes
the whole (m+2)x(n+1) tableau (~268MB per pivot at 4096x8192 f32). This
driver uses the product-form-of-inverse idea reshaped for TPU:

* K consecutive pivots run WITHOUT touching the tableau. Pivot t appends an
  eta pair: ``U[t, :] = (e_r - u)/piv`` (the elimination vector, ``u`` = the
  CURRENT entering column) and ``V[t, :] = current pivot row``; the tableau
  after t pivots is implicitly ``T0 + U^T V`` (eta index on the MAJOR axis
  of both factors: a minor-axis dynamic_update_slice costs ~0.5ms/iter on
  TPU vs ~1us for a row update — measured, an 8x whole-loop difference).
* Every decision is reconstructed cheaply:
    - reduced-cost rows (both phases) and the RHS column are maintained
      incrementally (O(n)/O(m) vector updates per pivot),
    - the entering column is ``T0[:, j] + einsum(V[:, j], U)`` (one tableau
      column + small contractions),
    - the pivot row is ``T0[r, :] + einsum(U[:, r], V)``.
* The FULL state machine lives inside the blocked iteration — phase-1 to
  phase-2 transition, basic-artificial cleanup pivots (their reconstruction
  row is fetched under a cond over an (n+1)-vector, cheap), dependent-row
  retirement, and optimal/unbounded/infeasible termination — so a block is
  K uniform iterations plus ONE rank-K MXU flush (``T += U^T V``), a single
  read+write of the tableau per K pivots.

Net HBM traffic per pivot: ~(2 m n)/K + K n (the V read), >20x below the
rank-1 driver for K=64.

The decision logic (Dantzig/Bland pricing, ratio-test tie-breaks, stall
detection keyed on the current objective) is IDENTICAL to the rank-1 driver,
so both walk the same pivot path modulo float roundoff; tests pin equal
basis sequences.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.state import (RULE_BLAND, RULE_DEVEX, TIE_MAXPIV, SimplexState,
                          SolverOptions, Status)

__all__ = ["run_simplex_blocked", "run_simplex_blocked_batch"]


class _BlockCarry(NamedTuple):
    s: SimplexState      # s.T is the STALE block-start tableau T0
    U: jax.Array         # (K, m+2) eta vectors as rows (zero beyond t)
    V: jax.Array         # (K, n+1) pivot rows (zero beyond t)
    t: jax.Array         # () int32: etas accumulated this block
    row0: jax.Array      # (n+1,) current phase-2 objective row
    row1: jax.Array      # (n+1,) current phase-1 objective row
    bvec: jax.Array      # (m+2,) current RHS column
    gamma: jax.Array     # (n,) devex weights (all-ones unless RULE_DEVEX)


def _blocked_pivot(carry: _BlockCarry, opts: SolverOptions,
                   stall_limit: int, max_iters) -> _BlockCarry:
    s = carry.s
    # bf16-STORAGE experiment (VERDICT r3 item 4): when the tableau is
    # stored bf16, all per-pivot arithmetic (etas, maintained vectors,
    # decisions) runs in f32 — only the big T array pays bf16 traffic.
    # For f32/f64 storage every astype below is the identity and XLA
    # elides it, so the production paths are unchanged.
    dtype = jnp.float32 if s.T.dtype == jnp.bfloat16 else s.T.dtype
    n = s.n
    inf = jnp.asarray(jnp.inf, dtype)
    running = s.status == Status.RUNNING
    in_phase2 = s.phase == 2

    # ---- cleanup scan: basic artificials left from phase 1 ----------------
    art_basic = s.art_cols[s.basis]
    cleanup = jnp.any(art_basic) & in_phase2 & running
    r_d = jnp.argmax(art_basic).astype(jnp.int32)
    # the cleanup row is only materialized when needed (cond over an
    # (n+1)-vector is cheap; computing it every pivot would double V reads)
    row_d = lax.cond(
        cleanup,
        lambda: carry.s.T[2 + r_d, :].astype(dtype) + jnp.einsum(
            'k,kn->n', carry.U[:, 2 + r_d], carry.V,
            precision=lax.Precision.HIGHEST),
        lambda: jnp.zeros((n + 1,), dtype),
    )
    elig = s.col_active & ~s.art_cols & (jnp.abs(row_d[:-1]) > opts.piv_tol)
    has_elig = jnp.any(elig)
    col_ids = jnp.arange(n, dtype=jnp.int32)
    j_d = jnp.min(jnp.where(elig, col_ids, n - 1)).astype(jnp.int32)
    # dependent row: retire its artificial so the scan never re-selects it
    retire = cleanup & ~has_elig
    art_cols = jnp.where(
        retire, s.art_cols.at[s.basis[r_d]].set(False), s.art_cols)

    # ---- pricing on the maintained objective rows -------------------------
    crow = jnp.where(s.phase == 1, carry.row1[:-1], carry.row0[:-1])
    c_eff = jnp.where(s.col_active, crow, inf)
    improving = c_eff < -opts.opt_tol
    has_improving = jnp.any(improving)
    use_bland = s.bland | (opts.rule == RULE_BLAND)
    if opts.rule == RULE_DEVEX:
        # devex reference-framework pricing: argmax c^2 / gamma over
        # improving columns (opts.rule is static — other rules never pay)
        score = jnp.where(improving, (crow * crow) / carry.gamma,
                          -jnp.asarray(jnp.inf, dtype))
        j_best = jnp.argmax(score).astype(jnp.int32)
    else:
        j_best = jnp.argmin(c_eff).astype(jnp.int32)
    j_bland = jnp.min(jnp.where(improving, col_ids, n - 1)).astype(jnp.int32)
    j_price = jnp.where(use_bland, j_bland, j_best)

    # ---- phase bookkeeping scalars ----------------------------------------
    z1 = -carry.row1[-1]
    phase1_done = (s.phase == 1) & ~has_improving & running
    became_infeasible = phase1_done & (z1 > opts.infeas_tol)
    to_phase2 = phase1_done & ~became_infeasible
    pricing_pivot = has_improving & ~cleanup & (s.phase != 0) & running

    # ---- entering column + ratio test -------------------------------------
    j = jnp.where(cleanup, j_d, j_price)
    colj = s.T[:, j].astype(dtype) + jnp.einsum(
        'k,km->m', carry.V[:, j], carry.U, precision=lax.Precision.HIGHEST)
    col = colj[2:]
    b = carry.bvec[2:]
    pos = col > opts.piv_tol
    has_ratio = jnp.any(pos)
    ratios = jnp.where(pos, b / jnp.where(pos, col, 1.0), inf)
    min_ratio = jnp.min(ratios)
    tie = ratios <= min_ratio
    if opts.tie_break == TIE_MAXPIV:
        # stabilized tie resolution (same contract as driver.py): largest
        # pivot element among min-ratio ties bounds the 1/piv growth factor
        r_first = jnp.argmax(jnp.where(tie, col, -inf)).astype(jnp.int32)
    else:
        r_first = jnp.argmax(tie).astype(jnp.int32)
    r_bland = jnp.argmin(
        jnp.where(tie, s.basis, jnp.int32(2**30))).astype(jnp.int32)
    r_price = jnp.where(use_bland, r_bland, r_first)

    became_unbounded = pricing_pivot & ~has_ratio & in_phase2
    # phase 1 is bounded below by 0: no-ratio means numerical failure
    became_failed1 = pricing_pivot & ~has_ratio & ~in_phase2

    # ---- the one (possibly zero) eta pivot --------------------------------
    do_cleanup = cleanup & has_elig
    do_pricing = pricing_pivot & has_ratio
    act = (do_cleanup | do_pricing) & (s.niter < max_iters)
    actf = act.astype(dtype)
    r = jnp.where(do_cleanup, r_d, r_price)
    rg = r + 2
    piv = colj[rg]
    safe_piv = jnp.where(act, piv, 1.0)
    w = ((jnp.arange(s.T.shape[0]) == rg).astype(dtype) - colj) / safe_piv
    w = w * actf
    vrow = lax.cond(
        do_cleanup,
        lambda: row_d,
        lambda: s.T[rg, :].astype(dtype) + jnp.einsum(
            'k,kn->n', carry.U[:, rg], carry.V,
            precision=lax.Precision.HIGHEST),
    ) * actf
    zero = jnp.zeros((), jnp.int32)
    U = lax.dynamic_update_slice(carry.U, w[None, :], (carry.t, zero))
    V = lax.dynamic_update_slice(carry.V, vrow[None, :], (carry.t, zero))

    # ---- maintain running vectors -----------------------------------------
    row0 = carry.row0 + w[0] * vrow
    row1 = carry.row1 + w[1] * vrow
    bvec = carry.bvec + w * vrow[-1]

    leaving = s.basis[r]
    basis = jnp.where(act, s.basis.at[r].set(j), s.basis)

    # ---- devex weight update (post-pivot row r = vrow / piv) --------------
    if opts.rule == RULE_DEVEX:
        gamma_q = carry.gamma[j]
        alpha = vrow[:-1] / safe_piv
        cand = (alpha * alpha) * gamma_q
        upd = do_pricing & act
        gamma = jnp.where(upd, jnp.maximum(carry.gamma, cand), carry.gamma)
        gamma = jnp.where(
            upd,
            gamma.at[leaving].set(
                jnp.maximum(gamma_q / (safe_piv * safe_piv), 1.0)),
            gamma)
        gamma = jnp.where(jnp.max(gamma) > 1e8, jnp.ones_like(gamma), gamma)
    else:
        gamma = carry.gamma

    # ---- stall / Bland switch (fix of SURVEY §2.7-2: current objective) ---
    z = jnp.where(s.phase == 1, -row1[-1], -row0[-1])
    improved = (s.last_z.astype(dtype) - z) > opts.degen_tol
    stuck = jnp.where(
        do_pricing & act,
        jnp.where(improved, 0, s.stuck + 1),
        s.stuck).astype(jnp.int32)
    last_z = jnp.where(do_pricing & act, z, s.last_z)
    bland = s.bland | (stuck >= stall_limit)

    # ---- phase transition + termination (all scalar selects) --------------
    phase = jnp.where(to_phase2, 2, s.phase).astype(jnp.int32)
    col_active = jnp.where(to_phase2, s.col_active & ~art_cols, s.col_active)
    stuck = jnp.where(to_phase2, 0, stuck)
    last_z = jnp.where(to_phase2, inf, last_z)
    if opts.rule == RULE_DEVEX:
        # phase transition re-anchors the reference framework
        gamma = jnp.where(to_phase2, jnp.ones_like(gamma), gamma)

    finished_opt = in_phase2 & ~has_improving & ~cleanup & running
    # Non-finite guard (same contract as driver.py): NaN poisons pricing into
    # a bogus OPTIMAL; detect on the step's own pricing row + post-pivot
    # objective/RHS and report NUMERIC instead.
    finite_ok = (
        jnp.isfinite(z)
        & jnp.isfinite(jnp.sum(jnp.abs(bvec[2:])))
        & jnp.isfinite(jnp.sum(jnp.where(s.col_active, jnp.abs(crow), 0.0)))
    )
    new_status = jnp.where(
        ~finite_ok, jnp.int32(Status.NUMERIC),
        jnp.where(
            became_infeasible | became_failed1, jnp.int32(Status.INFEASIBLE),
            jnp.where(became_unbounded, jnp.int32(Status.UNBOUNDED),
                      jnp.where(finished_opt, jnp.int32(Status.OPTIMAL),
                                jnp.int32(Status.RUNNING)))))
    status = jnp.where(running, new_status, s.status)

    s = SimplexState(
        T=s.T,
        basis=basis,
        col_active=col_active,
        art_cols=art_cols,
        phase=phase,
        status=status,
        niter=s.niter + act.astype(jnp.int32),
        stuck=stuck,
        bland=bland,
        last_z=last_z.astype(s.last_z.dtype),
    )
    return _BlockCarry(
        s=s, U=U, V=V, t=carry.t + act.astype(jnp.int32),
        row0=row0, row1=row1, bvec=bvec, gamma=gamma)


@functools.lru_cache(maxsize=32)
def _compiled_blocked_driver(opts: SolverOptions, stall_limit: int, K: int):
    @jax.jit
    def driver(state: SimplexState, max_iters: jax.Array) -> SimplexState:
        M = state.T.shape[0]
        N = state.T.shape[1]
        sdtype = state.T.dtype              # storage dtype (T only)
        dtype = jnp.float32 if sdtype == jnp.bfloat16 else sdtype

        def fresh_carry(s: SimplexState, gamma=None) -> _BlockCarry:
            return _BlockCarry(
                s=s,
                U=jnp.zeros((K, M), dtype=dtype),
                V=jnp.zeros((K, N), dtype=dtype),
                t=jnp.asarray(0, jnp.int32),
                row0=s.T[0, :].astype(dtype),
                row1=s.T[1, :].astype(dtype),
                bvec=s.T[:, -1].astype(dtype),
                gamma=jnp.ones((N - 1,), dtype) if gamma is None else gamma,
            )

        def outer_cond(carry):
            s = carry.s
            return (s.status == Status.RUNNING) & (s.niter < max_iters)

        def outer_body(carry):
            # K uniform eta pivots, tableau untouched
            carry = lax.fori_loop(
                0, K,
                lambda _, c: _blocked_pivot(c, opts, stall_limit, max_iters),
                carry)
            # ONE rank-K MXU flush: T += U^T V (einsum contracts the leading
            # eta axis of both factors without materializing a transpose)
            # HIGHEST: the TPU default matmul precision truncates f32 MXU
            # inputs to bf16, which corrupts long eta-flush chains (verified
            # on-chip: a 326-pivot walk claimed a below-optimal objective)
            T = (carry.s.T.astype(dtype) + jnp.einsum(
                'km,kn->mn', carry.U, carry.V, preferred_element_type=dtype,
                precision=lax.Precision.HIGHEST)).astype(sdtype)
            s = carry.s._replace(T=T)
            # per-block RAY SCAN (round 4): devex pricing can circle an
            # unbounded ray for thousands of pivots (argmax c^2/gamma keeps
            # finding other improving columns; measured 10k+ budget-outs
            # where Dantzig detected unboundedness in ~900). The flush just
            # materialized the CURRENT tableau, so one O(mn) pass per K
            # pivots settles it: any improving active phase-2 column with
            # no entry above piv_tol certifies unboundedness outright.
            Tf = T.astype(dtype)
            improving = s.col_active & (Tf[0, :-1] < -opts.opt_tol)
            blocked_col = jnp.any(Tf[2:, :-1] > opts.piv_tol, axis=0)
            # gate on no basic artificials: with a zero-valued artificial
            # still basic the tableau is a RELAXATION, and a ray through an
            # artificial row is not a certificate for the original (r5
            # soundness tightening; the cleanup pivots clear this in a few
            # iterations, after which the scan arms)
            ray = (jnp.any(improving & ~blocked_col)
                   & ~jnp.any(s.art_cols[s.basis])
                   & (s.phase == 2) & (s.status == Status.RUNNING))
            s = s._replace(status=jnp.where(
                ray, jnp.int32(Status.UNBOUNDED), s.status))
            # devex weights persist across the flush boundary
            return fresh_carry(s, carry.gamma)

        out = lax.while_loop(outer_cond, outer_body, fresh_carry(state)).s
        return out._replace(status=jnp.where(
            out.status == Status.RUNNING,
            jnp.int32(Status.ITERATION_LIMIT), out.status))

    return driver


def run_simplex_blocked(
    state: SimplexState,
    opts: SolverOptions | None = None,
    block: int = 64,
) -> SimplexState:
    """Run the rank-K blocked driver to termination (single problem)."""
    from ..core.state import eta_scaled_options

    if opts is None:
        opts = SolverOptions.for_dtype(state.T.dtype)
    opts = eta_scaled_options(opts, state.T.dtype)
    stall_limit = opts.resolved_stall_limit(state.m, state.n)
    from .driver import _budget_key

    driver = _compiled_blocked_driver(_budget_key(opts), stall_limit, block)
    return driver(state, jnp.asarray(opts.max_iters, jnp.int32))


@functools.lru_cache(maxsize=16)
def _compiled_blocked_batch(opts: SolverOptions, stall_limit: int, K: int):
    single = _compiled_blocked_driver.__wrapped__(opts, stall_limit, K)
    return jax.jit(jax.vmap(single, in_axes=(0, None)))


def run_simplex_blocked_batch(
    batched: SimplexState,
    opts: SolverOptions | None = None,
    block: int = 64,
) -> SimplexState:
    """Batched (vmapped) rank-K blocked driver: many independent LPs whose
    per-lane tableaus are too large for the rank-1 batched driver's
    full-tableau-per-pivot traffic (BASELINE config 3 at REAL shapes —
    VERDICT r2 weak #3 named the 64-cap; each lane's traffic drops by ~K).
    The state machine freezes terminated lanes exactly like the rank-1
    batched driver, so divergent pivot counts coexist in one while_loop."""
    from ..core.state import eta_scaled_options

    if opts is None:
        opts = SolverOptions.for_dtype(batched.T.dtype)
    opts = eta_scaled_options(opts, batched.T.dtype)
    m = batched.T.shape[1] - 2
    n = batched.T.shape[2] - 1
    stall_limit = opts.resolved_stall_limit(m, n)
    from .driver import _budget_key

    driver = _compiled_blocked_batch(_budget_key(opts), stall_limit, block)
    return driver(batched, jnp.asarray(opts.max_iters, jnp.int32))
