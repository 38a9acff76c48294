"""Sharded rank-K blocked simplex: eta blocks on the column-partitioned path.

The explicit shard_map driver in ``sharded.py`` is rank-1: every pivot does a
full pass over each shard's local (m+2, n/P) tableau block, i.e. the ~2k
pivots/s class per chip (BENCH.md step 2) — 80% scaling of a slow base. This
driver brings the product-form eta scheme of ``solve/blocked.py`` to the
sharded layout so the per-pivot work drops to O(n/P + m) vector updates and
the tableau is touched once per K pivots:

* eta factors are SPLIT like the tableau: the elimination vectors ``U``
  (K, m+2) are replicated (they live on the row axis), the pivot-row slices
  ``Vl`` (K, n/P) are column-sharded, and the pivot rows' RHS entries ``vr``
  (K,) are replicated (they update the replicated RHS column).
* per pivot, communication is ONE fused psum of an (m+2+K+1)-vector — the
  owner shard contributes the entering column's stale-tableau slice, its
  eta-column ``Vl[:, j_local]``, AND the column's artificial flag in the
  same reduction — plus the same tiny pricing all_gather / pmin as the
  rank-1 sharded driver. The rank-1 driver already paid the (m+2) psum;
  the eta scheme adds only K+1 lanes to it.
* round 5 (VERDICT r4 item 4) cut the dependent collective rounds per
  pivot from 4 to 2: the former per-pivot m-elem cleanup-scan psum became
  a REPLICATED ``art_basic`` vector seeded once per K-block and updated
  exactly per pivot from the fused psum's artificial-flag lane (zero
  staleness), and the sharded non-finite guard moved to the flush
  boundary, riding the ray scan's scalar psum (a bogus mid-block terminal
  status is corrected at the boundary before the loop can exit). What
  remains per pivot: the pricing gathers/pmins (one latency round, they
  are mutually independent) and the fused column fetch that depends on
  them.
* the flush is purely local: ``T_local += U^T Vl`` (a rank-K MXU update of
  each shard's block) and ``rhs += U^T vr``, once per K pivots.

Decision logic (pricing, ratio test, stall/Bland switch, phase transitions,
non-finite guard) is IDENTICAL to ``solve/blocked.py``, so both walk the same
pivot sequence modulo float roundoff; tests pin equal basis sequences against
the single-device blocked driver (VERDICT round-1 item 3; BASELINE.json
config 5). Reference seed for the hot kernel being amortized:
/root/reference/lpsol/tableau.py:295-308 (rank-1 pivot).

Devex pricing (``opts.rule == RULE_DEVEX``, round 4): the weight vector is
column-sharded like the tableau; per-shard argmax of c^2/gamma feeds the
same tiny all_gather the Dantzig rule uses, the owner's gamma_q rides the
fused per-pivot psum as one extra lane, and the update is a local VPU pass
over the shard's pivot-row slice plus one scalar pmax for the global frame
reset. Tests pin exact walk parity vs the single-device RULE_DEVEX blocked
driver on the 8-device fake cluster.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..core.state import RULE_BLAND, RULE_DEVEX, SolverOptions, Status
from .sharded import ShardedState

__all__ = ["run_simplex_sharded_blocked"]

DEVEX_RESET = 1e8  # re-anchor the devex reference framework past this weight


class _ShardedBlockCarry(NamedTuple):
    s: ShardedState      # s.T is the STALE block-start local block; s.rhs stale
    U: jax.Array         # (K, m+2) replicated eta elimination vectors
    Vl: jax.Array        # (K, n_local) sharded pivot-row slices
    vr: jax.Array        # (K,) replicated pivot-row RHS entries
    t: jax.Array         # () int32: etas accumulated this block
    row0: jax.Array      # (n_local,) current phase-2 objective row slice
    row1: jax.Array      # (n_local,) current phase-1 objective row slice
    bvec: jax.Array      # (m+2,) current RHS column, replicated
    gamma: jax.Array     # (n_local,) sharded devex weights (ones unless devex)
    # (m,) bool, REPLICATED: whether each basis column is artificial.
    # Round 5 (VERDICT r4 item 4): maintaining this incrementally — seeded
    # by one psum per K-block, updated per pivot from the entering column's
    # artificial flag riding the fused psum as one extra lane — deletes the
    # per-pivot m-elem i32 cleanup-scan psum with ZERO staleness.
    art_basic: jax.Array


def _fetch_col_and_eta(T_local, Vl, j, axis: str, art_cols=None, gamma=None):
    """Entering column (stale tableau slice) AND its eta column in ONE psum:
    owner shard contributes the concatenated (m+2+K)-vector, psum broadcasts.
    The owner's artificial flag for column j rides the same reduction as one
    extra lane (the incremental cleanup-scan input, round 5), and under
    devex the owner's weight gamma_j adds one more — never an additional
    collective."""
    n_local = T_local.shape[1]
    K = Vl.shape[0]
    ax = lax.axis_index(axis)
    owner = (j // n_local) == ax
    j_local = j % n_local
    parts = [T_local[:, j_local], Vl[:, j_local]]
    n_extra = 0
    if art_cols is not None:
        parts.append(art_cols[j_local].astype(T_local.dtype)[None])
        n_extra += 1
    if gamma is not None:
        parts.append(gamma[j_local][None])
        n_extra += 1
    contrib = jnp.where(owner, jnp.concatenate(parts), 0.0)
    out = lax.psum(contrib, axis)
    nrows = T_local.shape[0]
    pos = nrows + K
    enter_art = None
    if art_cols is not None:
        enter_art = out[pos] > 0.5
        pos += 1
    gamma_j = out[pos] if gamma is not None else None
    return out[:nrows], out[nrows:nrows + K], owner, j_local, enter_art, \
        gamma_j


def _sharded_blocked_pivot(carry: _ShardedBlockCarry, opts: SolverOptions,
                           stall_limit: int, n_global: int, max_iters,
                           axis: str) -> _ShardedBlockCarry:
    s = carry.s
    dtype = s.T.dtype
    n_local = s.T.shape[1]
    nrows = s.T.shape[0]
    ax = lax.axis_index(axis)
    inf = jnp.asarray(jnp.inf, dtype)
    running = s.status == Status.RUNNING
    in_phase2 = s.phase == 2
    local_ids = (jnp.arange(n_local, dtype=jnp.int32) + ax * n_local)
    BIG = jnp.int32(2**30)

    # ---- cleanup scan: basic artificials left from phase 1 -----------------
    # round 5 (VERDICT r4 item 4): carry.art_basic is the replicated,
    # incrementally-exact artificial-basis vector — no per-pivot psum here
    art_basic = carry.art_basic
    cleanup = jnp.any(art_basic) & in_phase2 & running
    r_d = jnp.argmax(art_basic).astype(jnp.int32)
    # the cleanup row's local slice is reconstructed only when needed
    row_d = lax.cond(
        cleanup,
        lambda: s.T[2 + r_d, :] + jnp.einsum(
            'k,kn->n', carry.U[:, 2 + r_d], carry.Vl,
            precision=lax.Precision.HIGHEST),
        lambda: jnp.zeros((n_local,), dtype),
    )
    elig = s.col_active & ~s.art_cols & (jnp.abs(row_d) > opts.piv_tol)
    l_first_elig = jnp.min(jnp.where(elig, local_ids, BIG))
    j_d = lax.pmin(l_first_elig, axis)
    has_elig = j_d < BIG
    j_d = jnp.minimum(j_d, n_global - 1)
    # dependent row: retire its artificial (owner shard clears the bit)
    retire = cleanup & ~has_elig
    basis_rd = s.basis[r_d]
    owner_rd = (basis_rd // n_local) == ax
    art_cols = jnp.where(
        retire & owner_rd,
        s.art_cols.at[basis_rd % n_local].set(False),
        s.art_cols)

    # ---- pricing on the maintained objective-row slices ---------------------
    use_devex = opts.rule == RULE_DEVEX
    crow = jnp.where(s.phase == 1, carry.row1, carry.row0)
    c_eff = jnp.where(s.col_active, crow, inf)
    improving_l = c_eff < -opts.opt_tol
    l_first = jnp.min(jnp.where(improving_l, local_ids, n_global))
    j_bland = lax.pmin(l_first, axis)
    if use_devex:
        # devex reference-framework pricing (mirrors solve.blocked
        # RULE_DEVEX): per-shard argmax of c^2/gamma, then a global argmax
        # over the gathered per-shard winners — first shard wins ties, which
        # matches the single-device jnp.argmax first-index rule
        score = jnp.where(improving_l, (crow * crow) / carry.gamma, -inf)
        g_vals = lax.all_gather(jnp.max(score), axis)
        g_idxs = lax.all_gather(
            (jnp.argmax(score) + ax * n_local).astype(jnp.int32), axis)
        j_best = g_idxs[jnp.argmax(g_vals)]
        has_improving = j_bland < n_global
    else:
        l_min = jnp.min(c_eff)
        l_arg = (jnp.argmin(c_eff) + ax * n_local).astype(jnp.int32)
        g_vals = lax.all_gather(l_min, axis)
        g_idxs = lax.all_gather(l_arg, axis)
        k = jnp.argmin(g_vals)
        j_best = g_idxs[k]
        has_improving = g_vals[k] < -opts.opt_tol
    use_bland = s.bland | (opts.rule == RULE_BLAND)
    j_price = jnp.where(
        use_bland, jnp.minimum(j_bland, n_global - 1), j_best)

    # ---- phase bookkeeping scalars ------------------------------------------
    z1 = -carry.bvec[1]
    phase1_done = (s.phase == 1) & ~has_improving & running
    became_infeasible = phase1_done & (z1 > opts.infeas_tol)
    to_phase2 = phase1_done & ~became_infeasible
    pricing_pivot = has_improving & ~cleanup & ~phase1_done & running

    # ---- entering column reconstruction + replicated ratio test -------------
    j = jnp.where(cleanup, j_d, j_price)
    tcol, vj, owner, j_local, enter_art, gamma_j = _fetch_col_and_eta(
        s.T, carry.Vl, j, axis, art_cols=s.art_cols,
        gamma=carry.gamma if use_devex else None)
    colj = tcol + jnp.einsum('k,km->m', vj, carry.U,
                             precision=lax.Precision.HIGHEST)
    col = colj[2:]
    b = carry.bvec[2:]
    pos = col > opts.piv_tol
    has_ratio = jnp.any(pos)
    ratios = jnp.where(pos, b / jnp.where(pos, col, 1.0), inf)
    min_ratio = jnp.min(ratios)
    tie = ratios <= min_ratio
    r_first = jnp.argmax(tie).astype(jnp.int32)
    r_bland = jnp.argmin(jnp.where(tie, s.basis, BIG)).astype(jnp.int32)
    r_price = jnp.where(use_bland, r_bland, r_first)

    became_unbounded = pricing_pivot & ~has_ratio & in_phase2
    became_failed1 = pricing_pivot & ~has_ratio & ~in_phase2

    # ---- the one (possibly zero) eta pivot -----------------------------------
    do_cleanup = cleanup & has_elig
    do_pricing = pricing_pivot & has_ratio
    act = (do_cleanup | do_pricing) & (s.niter < max_iters)
    actf = act.astype(dtype)
    r = jnp.where(do_cleanup, r_d, r_price)
    rg = r + 2
    piv = colj[rg]
    safe_piv = jnp.where(act, piv, 1.0)
    w = jnp.where(
        act, ((jnp.arange(nrows) == rg).astype(dtype) - colj) / safe_piv, 0.0)
    # pivot row reconstruction: one psum-free local einsum per shard (for the
    # cleanup case this equals row_d since rg == 2 + r_d)
    vrow = (s.T[rg, :] + jnp.einsum(
        'k,kn->n', carry.U[:, rg], carry.Vl,
        precision=lax.Precision.HIGHEST)) * actf
    vrow_rhs = (s.rhs[rg] + jnp.dot(carry.U[:, rg], carry.vr,
                                    precision=lax.Precision.HIGHEST)) * actf
    zero = jnp.zeros((), jnp.int32)
    U = lax.dynamic_update_slice(carry.U, w[None, :], (carry.t, zero))
    Vl = lax.dynamic_update_slice(carry.Vl, vrow[None, :], (carry.t, zero))
    vr = lax.dynamic_update_slice(carry.vr, vrow_rhs[None], (carry.t,))

    # ---- maintain running vectors --------------------------------------------
    row0 = carry.row0 + w[0] * vrow
    row1 = carry.row1 + w[1] * vrow
    bvec = carry.bvec + w * vrow_rhs

    basis = jnp.where(act, s.basis.at[r].set(j), s.basis)
    # incremental replicated cleanup-scan state: retirement clears its row;
    # a pivot installs the entering column's artificial flag (the fused-psum
    # lane) at row r — exact, no staleness
    art_basic_n = jnp.where(retire, art_basic.at[r_d].set(False), art_basic)
    art_basic_n = jnp.where(act, art_basic_n.at[r].set(enter_art),
                            art_basic_n)

    # ---- devex weight update (post-pivot row r = vrow / piv, local slice) ----
    if use_devex:
        alpha = vrow / safe_piv           # local columns only (RHS is vr)
        cand = (alpha * alpha) * gamma_j
        upd = do_pricing & act
        gamma = jnp.where(upd, jnp.maximum(carry.gamma, cand), carry.gamma)
        leaving = s.basis[r]              # pre-update basis, replicated
        owner_lv = (leaving // n_local) == ax
        leave_val = jnp.maximum(gamma_j / (safe_piv * safe_piv), 1.0)
        gamma = jnp.where(
            upd & owner_lv,
            gamma.at[leaving % n_local].set(leave_val), gamma)
        # re-anchor the frame on global overflow or phase transition (pmax
        # keeps every shard's reset decision consistent)
        gmax = lax.pmax(jnp.max(gamma), axis)
        reset = (gmax > DEVEX_RESET) | to_phase2
        gamma = jnp.where(reset, jnp.ones_like(gamma), gamma)
    else:
        gamma = carry.gamma

    # ---- stall / Bland switch (current-objective stall detection) ------------
    z = jnp.where(s.phase == 1, -bvec[1], -bvec[0])
    improved = (s.last_z - z) > opts.degen_tol
    stuck = jnp.where(
        do_pricing & act,
        jnp.where(improved, 0, s.stuck + 1),
        s.stuck).astype(jnp.int32)
    last_z = jnp.where(do_pricing & act, z, s.last_z)
    bland = s.bland | (stuck >= stall_limit)

    # ---- phase transition + termination ---------------------------------------
    phase = jnp.where(to_phase2, 2, s.phase).astype(jnp.int32)
    col_active = jnp.where(to_phase2, s.col_active & ~art_cols, s.col_active)
    stuck = jnp.where(to_phase2, 0, stuck)
    last_z = jnp.where(to_phase2, inf, last_z)

    finished_opt = in_phase2 & ~has_improving & ~cleanup & running
    # Non-finite guard, REPLICATED quantities only (round 5, VERDICT r4
    # item 4): z and the RHS are replicated, so checking them costs no
    # collective. The sharded pricing-row check moved to the flush
    # boundary (one scalar psum per K pivots) — a mid-block blowup that
    # slips a bogus terminal status is corrected there before the loop
    # can exit (the boundary guard runs inside the same while-loop body).
    finite_ok = (
        jnp.isfinite(z)
        & jnp.isfinite(jnp.sum(jnp.abs(bvec[2:])))
    )
    new_status = jnp.where(
        ~finite_ok, jnp.int32(Status.NUMERIC),
        jnp.where(
            became_infeasible | became_failed1, jnp.int32(Status.INFEASIBLE),
            jnp.where(became_unbounded, jnp.int32(Status.UNBOUNDED),
                      jnp.where(finished_opt, jnp.int32(Status.OPTIMAL),
                                jnp.int32(Status.RUNNING)))))
    status = jnp.where(running, new_status, s.status)

    s = ShardedState(
        T=s.T,
        rhs=s.rhs,
        basis=basis,
        col_active=col_active,
        art_cols=art_cols,
        phase=phase,
        status=status,
        niter=s.niter + act.astype(jnp.int32),
        stuck=stuck,
        bland=bland,
        last_z=last_z,
    )
    return _ShardedBlockCarry(
        s=s, U=U, Vl=Vl, vr=vr, t=carry.t + act.astype(jnp.int32),
        row0=row0, row1=row1, bvec=bvec, gamma=gamma,
        art_basic=art_basic_n)


@functools.lru_cache(maxsize=16)
def _sharded_blocked_driver(opts: SolverOptions, stall_limit: int,
                            n_global: int, K: int, axis: str, mesh: Mesh):
    from jax import shard_map

    specs = ShardedState(
        T=P(None, axis),
        rhs=P(),
        basis=P(),
        col_active=P(axis),
        art_cols=P(axis),
        phase=P(),
        status=P(),
        niter=P(),
        stuck=P(),
        bland=P(),
        last_z=P(),
    )

    def solve_local(sh: ShardedState, max_iters) -> ShardedState:
        M = sh.T.shape[0]
        n_local = sh.T.shape[1]
        dtype = sh.T.dtype

        def fresh_carry(s: ShardedState, gamma=None) -> _ShardedBlockCarry:
            # seed the replicated artificial-basis vector: ONE m-elem psum
            # per K-block (amortized Kx vs the former per-pivot scan); the
            # per-pivot updates keep it exact between flushes
            ax = lax.axis_index(axis)
            owner_b = (s.basis // n_local) == ax
            art_basic = lax.psum(
                jnp.where(owner_b,
                          s.art_cols[s.basis % n_local].astype(jnp.int32),
                          0), axis) > 0
            return _ShardedBlockCarry(
                s=s,
                U=jnp.zeros((K, M), dtype=dtype),
                Vl=jnp.zeros((K, n_local), dtype=dtype),
                vr=jnp.zeros((K,), dtype=dtype),
                t=jnp.asarray(0, jnp.int32),
                row0=s.T[0, :],
                row1=s.T[1, :],
                bvec=s.rhs,
                gamma=jnp.ones((n_local,), dtype) if gamma is None else gamma,
                art_basic=art_basic,
            )

        def outer_cond(carry):
            s = carry.s
            return (s.status == Status.RUNNING) & (s.niter < max_iters)

        def outer_body(carry):
            carry = lax.fori_loop(
                0, K,
                lambda _, c: _sharded_blocked_pivot(
                    c, opts, stall_limit, n_global, max_iters, axis),
                carry)
            # rank-K flush: purely local on each shard's column block
            # HIGHEST: TPU f32 matmuls default to bf16 MXU inputs, which
            # corrupts the eta flush (see tpulp.solve.blocked)
            T = carry.s.T + jnp.einsum(
                'km,kn->mn', carry.U, carry.Vl, preferred_element_type=dtype,
                precision=lax.Precision.HIGHEST)
            rhs = carry.s.rhs + jnp.einsum('km,k->m', carry.U, carry.vr,
                                           precision=lax.Precision.HIGHEST)
            s = carry.s._replace(T=T, rhs=rhs)
            # per-block RAY SCAN (round 4, mirrors solve.blocked): local
            # column test on each shard's freshly-flushed block + one
            # scalar psum-any per K pivots
            improving = s.col_active & (T[0, :] < -opts.opt_tol)
            blocked_col = jnp.any(T[2:, :] > opts.piv_tol, axis=0)
            ray_local = jnp.any(improving & ~blocked_col)
            # boundary guard rides the SAME scalar psum as the ray scan
            # (round 5, VERDICT r4 item 4): the per-pivot sharded
            # pricing-row finiteness check moved here — pack (ray, bad)
            # into one i32 so fusing them costs no extra collective
            bad_local = ~jnp.isfinite(
                jnp.sum(jnp.where(s.col_active, jnp.abs(T[0, :]), 0.0)))
            packed = lax.psum(
                jnp.stack([ray_local.astype(jnp.int32),
                           bad_local.astype(jnp.int32)]), axis)
            no_art = ~jnp.any(carry.art_basic)
            ray = (packed[0] > 0) & no_art \
                & (s.phase == 2) & (s.status == Status.RUNNING)
            bad = packed[1] > 0
            s = s._replace(status=jnp.where(
                bad, jnp.int32(Status.NUMERIC),
                jnp.where(ray, jnp.int32(Status.UNBOUNDED), s.status)))
            # devex weights persist across the flush boundary
            return fresh_carry(s, carry.gamma)

        out = lax.while_loop(outer_cond, outer_body, fresh_carry(sh)).s
        return out._replace(status=jnp.where(
            out.status == Status.RUNNING,
            jnp.int32(Status.ITERATION_LIMIT), out.status))

    return jax.jit(shard_map(
        solve_local, mesh=mesh, in_specs=(specs, P()), out_specs=specs,
        check_vma=False))


def run_simplex_sharded_blocked(
    sh: ShardedState,
    mesh: Mesh,
    opts: SolverOptions | None = None,
    block: int = 64,
    axis: str = "cols",
) -> ShardedState:
    """Run the sharded rank-K eta-block driver to termination."""
    from ..core.state import eta_scaled_options

    if opts is None:
        opts = SolverOptions.for_dtype(sh.T.dtype)
    opts = eta_scaled_options(opts, sh.T.dtype)
    m = sh.basis.shape[0]
    n_global = sh.T.shape[1]
    stall_limit = opts.resolved_stall_limit(m, n_global)
    from ..solve.driver import _budget_key

    driver = _sharded_blocked_driver(
        _budget_key(opts), stall_limit, n_global, block, axis, mesh)
    return driver(sh, jnp.asarray(opts.max_iters, jnp.int32))
