"""Dual simplex: reoptimize from a dual-feasible basis after the RHS moved.

The production warm-start engine the reference never had (its only B&B
primitive is LinVar bound tightening, /root/reference/lpsol/linprog.py:338-356;
every algorithmic layer above it is ours). A branch-and-bound child differs
from its parent ONLY in ``b`` (tpulp.milp encodes nodes as b-rewrites of one
shared root tableau), so the parent's optimal basis stays DUAL feasible
(reduced costs >= 0) while a handful of basic values may go negative — the
exact situation the dual simplex resolves in a few pivots instead of a full
two-phase re-solve from artificials.

TPU-first design mirrors ``tpulp.solve.driver``: one branchless
``lax.while_loop`` state machine over the same ``SimplexState`` pytree, so
``vmap`` gives the batched warm-start wave solver for free and the terminal
state feeds the existing extraction/refinement/certificate pipeline
unchanged.

Algorithm per iteration (all scalar control flow, one unconditional
``pivot_update``):

* termination: ``min_i b_i >= -feas_tol`` -> OPTIMAL (primal feasible and
  dual feasibility is maintained by the ratio test);
* leaving row: most-negative ``b_r`` (Dantzig-style), switching to the
  first-negative row after ``stall_limit`` non-improving pivots (the dual
  analogue of the primal driver's Bland fallback; ties in the entering
  column are always broken by smallest index);
* entering column: among active columns with ``T[r, j] < -piv_tol``,
  minimize ``c_j / -T[r, j]`` (keeps every reduced cost nonnegative);
* no eligible column -> the row proves INFEASIBLE (dual unboundedness);
* non-finite iterates -> NUMERIC (same guard as the primal driver).

``warm_state_from_basis`` reconstructs the tableau frame of an arbitrary
basis on device — ``B^{-1} [A | b]`` by batched linear solve plus the priced
objective row — so a warm start needs only (basis indices, new b), not the
parent's full tableau.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core.state import SimplexState, SolverOptions, Status
from .driver import _budget_key, pivot_update

__all__ = [
    "dual_simplex_step",
    "run_dual_simplex",
    "warm_state_from_basis",
    "run_warm_batch",
    "run_warm_carry_batch",
    "run_warm_wave",
    "run_expand_generation",
    "pool_write",
    "pack_wave_summary",
]


def dual_simplex_step(state: SimplexState, opts: SolverOptions,
                      stall_limit: int) -> SimplexState:
    """One dual-simplex transition — fully branchless (see module doc)."""
    T = state.T
    dtype = T.dtype
    n = state.n
    inf = jnp.asarray(jnp.inf, dtype)
    running = state.status == Status.RUNNING

    b = T[2:, -1]
    m = b.shape[0]
    neg = b < -opts.feas_tol
    feasible = ~jnp.any(neg)

    # ---- leaving row: most-negative b; first-negative after stall ----------
    row_ids = jnp.arange(m, dtype=jnp.int32)
    r_most = jnp.argmin(b).astype(jnp.int32)
    r_first = jnp.min(jnp.where(neg, row_ids, m - 1)).astype(jnp.int32)
    use_bland = state.bland
    r = jnp.where(use_bland, r_first, r_most)

    # ---- entering column: dual ratio test on the leaving row ---------------
    row = T[2 + r, :-1]
    crow = T[0, :-1]
    elig = state.col_active & (row < -opts.piv_tol)
    has_elig = jnp.any(elig)
    ratios = jnp.where(elig, crow / jnp.where(elig, -row, 1.0), inf)
    min_ratio = jnp.min(ratios)
    tie = elig & (ratios <= min_ratio)
    # argmax of the tie mask = smallest tied column index (dual Bland tiebreak)
    j = jnp.argmax(tie).astype(jnp.int32)

    became_optimal = running & feasible
    do_pivot = running & ~feasible & has_elig
    became_infeasible = running & ~feasible & ~has_elig

    # ---- the one pivot (no-op redirected to an exact unit pivot) -----------
    r_eff = jnp.where(do_pivot, r + 2, 2)
    j_eff = jnp.where(do_pivot, j, state.basis[0])
    Tn = pivot_update(T, r_eff, j_eff)
    basis = jnp.where(do_pivot, state.basis.at[r].set(j), state.basis)

    # ---- stall detection: dual objective is non-decreasing toward optimum --
    z = -Tn[0, -1]
    improved = (z - state.last_z) > opts.degen_tol
    stuck = jnp.where(
        do_pivot,
        jnp.where(improved, 0, state.stuck + 1),
        state.stuck,
    ).astype(jnp.int32)
    last_z = jnp.where(do_pivot, z, state.last_z)
    bland = state.bland | (stuck >= stall_limit)

    finite_ok = (
        jnp.isfinite(z)
        & jnp.isfinite(jnp.sum(jnp.abs(Tn[2:, -1])))
        & jnp.isfinite(jnp.sum(jnp.where(state.col_active, jnp.abs(crow),
                                         0.0)))
    )
    new_status = jnp.where(
        ~finite_ok, jnp.int32(Status.NUMERIC),
        jnp.where(
            became_infeasible, jnp.int32(Status.INFEASIBLE),
            jnp.where(became_optimal, jnp.int32(Status.OPTIMAL),
                      jnp.int32(Status.RUNNING))))
    status = jnp.where(running, new_status, state.status)

    return SimplexState(
        T=Tn,
        basis=basis,
        col_active=state.col_active,
        art_cols=state.art_cols,
        phase=state.phase,
        status=status,
        niter=state.niter + do_pivot.astype(jnp.int32),
        stuck=stuck,
        bland=bland,
        last_z=last_z,
    )


@functools.lru_cache(maxsize=64)
def _compiled_dual_driver(opts: SolverOptions, stall_limit: int):
    @jax.jit
    def driver(state: SimplexState, max_iters: jax.Array) -> SimplexState:
        def cond(s):
            return (s.status == Status.RUNNING) & (s.niter < max_iters)

        def body(s):
            return dual_simplex_step(s, opts, stall_limit)

        out = lax.while_loop(cond, body, state)
        hit_limit = (out.status == Status.RUNNING)
        return out._replace(
            status=jnp.where(
                hit_limit, jnp.int32(Status.ITERATION_LIMIT), out.status))

    return driver


def run_dual_simplex(state: SimplexState, opts: SolverOptions | None = None
                     ) -> SimplexState:
    """Run the jitted dual-simplex driver to termination (single problem)."""
    if opts is None:
        opts = SolverOptions.for_dtype(state.T.dtype)
    stall_limit = opts.resolved_stall_limit(state.m, state.n)
    driver = _compiled_dual_driver(_budget_key(opts), stall_limit)
    return driver(state, jnp.asarray(opts.max_iters, jnp.int32))


@functools.partial(jax.jit, static_argnames=())
def _reconstruct(A_aug, c_full, col_active, art_cols, basis, b):
    """Tableau frame of ``basis`` for RHS ``b`` (single problem).

    ``A_aug`` is the root's (m, n) constraint block INCLUDING artificial
    unit columns; the frame is ``B^{-1} [A | b]`` with the objective row
    priced over the basis (``c - c_B B^{-1} A``), i.e. exactly the state a
    primal solve that ended in this basis would hold.
    """
    dtype = A_aug.dtype
    m, n = A_aug.shape
    Bmat = jnp.take(A_aug, basis, axis=1)                 # (m, m)
    aug = jnp.concatenate([A_aug, b[:, None]], axis=1)    # (m, n + 1)
    rows = jnp.linalg.solve(Bmat, aug)                    # B^-1 [A | b]
    cb = jnp.take(c_full, basis)                          # (m,)
    red = jnp.concatenate([c_full, jnp.zeros((1,), dtype)]) \
        - cb @ rows                                       # (n + 1,)
    # snap basic columns to exact unit vectors and their reduced costs to 0
    # (linalg.solve leaves ~eps residue which the pricing/ratio masks would
    # otherwise see as pivotable mass — same snap the pivot kernel applies)
    unit_cols = jnp.zeros((m, n), dtype).at[
        jnp.arange(m), basis].set(jnp.asarray(1.0, dtype))
    is_basic = jnp.zeros((n,), jnp.bool_).at[basis].set(True)
    rows = rows.at[:, :n].set(
        jnp.where(is_basic[None, :], unit_cols, rows[:, :n]))
    red = red.at[basis].set(jnp.asarray(0.0, dtype))
    T = jnp.zeros((m + 2, n + 1), dtype)
    T = T.at[0, :].set(red)
    T = T.at[2:, :].set(rows)
    return SimplexState(
        T=T,
        basis=basis.astype(jnp.int32),
        col_active=col_active,
        art_cols=art_cols,
        phase=jnp.asarray(2, jnp.int32),
        status=jnp.asarray(Status.RUNNING, jnp.int32),
        niter=jnp.asarray(0, jnp.int32),
        stuck=jnp.asarray(0, jnp.int32),
        bland=jnp.asarray(False),
        last_z=jnp.asarray(-jnp.inf, dtype),
    )


def warm_state_from_basis(A_aug, c_full, col_active, art_cols, basis, b
                          ) -> SimplexState:
    """Public single-problem reconstruction (see ``_reconstruct``)."""
    return _reconstruct(A_aug, c_full, col_active, art_cols,
                        jnp.asarray(basis, jnp.int32), jnp.asarray(b))


@functools.lru_cache(maxsize=32)
def _compiled_warm_carry(opts: SolverOptions, stall_limit: int):
    """Batched state-carry warm start: parent terminal tableaus + one sparse
    RHS rewrite + dual simplex + primal cleanup, one compiled executable.

    The child's RHS differs from the parent's in ONE row ``i`` by ``delta``;
    in the parent's basis frame that is the rank-0 update
    ``T[:, -1] += delta * s_i * T[:, col_i]`` where ``col_i`` is row i's
    slack/surplus column (its original column is ``±e_i``, so its current
    column IS ``±B^{-1} e_i`` — valid for ANY basis, objective rows
    included). No refactorization, no linear solve: this is what keeps the
    executable Mosaic-friendly (the LU-expander route in ``_reconstruct``
    compiles pathologically slowly on TPU)."""
    from .driver import simplex_step

    @jax.jit
    def run(pool_T, pool_basis, col_active, art_cols, idx, cols, deltas,
            max_iters):
        def one(slot, col, delta):
            # gather INSIDE the executable: the pool stays device-resident
            # and every wave runs the same fixed-shape program (eager
            # variable-length gathers cost a remote mini-compile per wave)
            T = pool_T[slot]
            basis = pool_basis[slot]
            T = T.at[:, -1].add(delta * T[:, col])
            st = SimplexState(
                T=T,
                basis=basis.astype(jnp.int32),
                col_active=col_active,
                art_cols=art_cols,
                phase=jnp.asarray(2, jnp.int32),
                status=jnp.asarray(Status.RUNNING, jnp.int32),
                niter=jnp.asarray(0, jnp.int32),
                stuck=jnp.asarray(0, jnp.int32),
                bland=jnp.asarray(False),
                last_z=jnp.asarray(-jnp.inf, T.dtype),
            )

            def cond(s):
                return (s.status == Status.RUNNING) & (s.niter < max_iters)

            st = lax.while_loop(
                cond, lambda s: dual_simplex_step(s, opts, stall_limit), st)
            # primal cleanup: f32 drift can leave slightly negative reduced
            # costs; re-open OPTIMAL lanes for the primal driver (terminates
            # immediately when already optimal)
            st = st._replace(status=jnp.where(
                st.status == Status.OPTIMAL,
                jnp.int32(Status.RUNNING), st.status))
            st = lax.while_loop(
                cond, lambda s: simplex_step(s, opts, stall_limit), st)
            return st._replace(status=jnp.where(
                st.status == Status.RUNNING,
                jnp.int32(Status.ITERATION_LIMIT), st.status))

        return jax.vmap(one)(idx, cols, deltas)

    return run


def run_warm_carry_batch(pool_T, pool_basis, col_active, art_cols, idx,
                         cols, deltas,
                         opts: SolverOptions | None = None) -> SimplexState:
    """Solve a wave of children from their parents' terminal frames.

    ``pool_T`` (C, m+2, n+1) / ``pool_basis`` (C, m) is the device-resident
    parent-state pool (see ``pool_write``); ``idx`` (B,) selects each
    child's parent slot; ``cols``/``deltas`` (B,) encode the signed sparse
    RHS rewrite per child: row i's b moves by ``delta`` through that row's
    slack (+delta) or surplus (-delta, sign folded into deltas by the
    caller) column."""
    if opts is None:
        opts = SolverOptions.for_dtype(pool_T.dtype)
    m = pool_T.shape[1] - 2
    n = pool_T.shape[2] - 1
    stall_limit = opts.resolved_stall_limit(m, n)
    run = _compiled_warm_carry(_budget_key(opts), stall_limit)
    return run(pool_T, pool_basis, col_active, art_cols,
               jnp.asarray(idx, jnp.int32),
               jnp.asarray(cols, jnp.int32),
               jnp.asarray(deltas, pool_T.dtype),
               jnp.asarray(opts.max_iters, jnp.int32))


@jax.jit
def pool_write(pool_T, pool_basis, slots, T_wave, basis_wave, lanes):
    """Scatter branched lanes of a wave's terminal state into the pool.

    ``slots``/``lanes`` are (B,) fixed-width; entries with ``slot >= C``
    are dropped (the host pads unused positions with an out-of-range slot),
    so every wave runs this one fixed-shape executable."""
    T_sel = jnp.take(T_wave, lanes, axis=0)
    b_sel = jnp.take(basis_wave, lanes, axis=0)
    return (pool_T.at[slots].set(T_sel, mode="drop"),
            pool_basis.at[slots].set(b_sel, mode="drop"))


def _wave_summaries(out: SimplexState, R, const):
    """Pack everything the B&B host loop reads into ONE array, so a wave
    costs ONE device->host fetch instead of six (each separate fetch is a
    full tunnel roundtrip — the dominant wave cost once warm starts shrank
    the solves themselves).

    Layout (B, m+6+n_int) in the tableau dtype:
    [corner, maxdist, branch-value, status, niter, argmax-fractional,
    basis..., int-var values...] — the int fields are exact in f32 (all <
    2^24). The integrality check is the device reduction recover
    ``R @ x + const`` per lane, reduced to the max distance-to-integer, the
    most-fractional variable index, and that variable's value; the FULL
    per-lane integer-variable value vector rides at the tail (a few KB per
    wave — round 4, so pseudocost branching can select among all
    fractional variables in float64 bounding mode, not just the argmax)."""

    def one(T1, basis1):
        x = jnp.zeros((T1.shape[1] - 1,), T1.dtype)
        x = x.at[basis1].set(T1[2:, -1])
        vals = R @ x + const
        dist = jnp.abs(vals - jnp.round(vals))
        am1 = jnp.argmax(dist)
        return jnp.max(dist), am1.astype(jnp.int32), vals[am1], vals

    md, am, bval, vals = jax.vmap(one)(out.T, out.basis)
    dtype = out.T.dtype
    return jnp.concatenate(
        [out.T[:, 0, -1:], md[:, None].astype(dtype), bval[:, None],
         out.status[:, None].astype(dtype), out.niter[:, None].astype(dtype),
         am[:, None].astype(dtype), out.basis.astype(dtype),
         vals.astype(dtype)], axis=1)


@jax.jit
def pack_wave_summary(out: SimplexState, R, const):
    """Standalone summary packer for the cold-wave path."""
    return _wave_summaries(out, R, const)


@functools.lru_cache(maxsize=32)
def _compiled_warm_wave(opts: SolverOptions, stall_limit: int):
    """The ENTIRE warm wave as one executable: apply the previous wave's
    deferred pool writes, gather each child's parent frame, sparse-RHS
    rewrite, dual simplex, primal cleanup, integrality check, summary pack.
    One dispatch + one bundled fetch per wave."""
    from .driver import simplex_step

    @jax.jit
    def run(pool_T, pool_basis, col_active, art_cols,
            prev_T, prev_basis, ipack, R, const, max_iters):
        # ipack (B, 5) int32 = [parent slot, rewrite column, deferred-write
        # slot, deferred-write lane, rhs delta] — ONE host->device upload
        # per wave (deltas are exact integers: integral bounds are snapped)
        idx = ipack[:, 0]
        cols = ipack[:, 1]
        wslots = ipack[:, 2]
        wlanes = ipack[:, 3]
        deltas = ipack[:, 4].astype(pool_T.dtype)
        # deferred writes from the wave that produced prev_T (before the
        # gather below, so same-wave children see their parents)
        pool_T = pool_T.at[wslots].set(
            jnp.take(prev_T, wlanes, axis=0), mode="drop")
        pool_basis = pool_basis.at[wslots].set(
            jnp.take(prev_basis, wlanes, axis=0), mode="drop")

        def one(slot, col, delta):
            T = pool_T[slot]
            basis = pool_basis[slot]
            T = T.at[:, -1].add(delta * T[:, col])
            st = SimplexState(
                T=T,
                basis=basis.astype(jnp.int32),
                col_active=col_active,
                art_cols=art_cols,
                phase=jnp.asarray(2, jnp.int32),
                status=jnp.asarray(Status.RUNNING, jnp.int32),
                niter=jnp.asarray(0, jnp.int32),
                stuck=jnp.asarray(0, jnp.int32),
                bland=jnp.asarray(False),
                last_z=jnp.asarray(-jnp.inf, T.dtype),
            )

            def cond(s):
                return (s.status == Status.RUNNING) & (s.niter < max_iters)

            st = lax.while_loop(
                cond, lambda s: dual_simplex_step(s, opts, stall_limit), st)
            st = st._replace(status=jnp.where(
                st.status == Status.OPTIMAL,
                jnp.int32(Status.RUNNING), st.status))
            st = lax.while_loop(
                cond, lambda s: simplex_step(s, opts, stall_limit), st)
            return st._replace(status=jnp.where(
                st.status == Status.RUNNING,
                jnp.int32(Status.ITERATION_LIMIT), st.status))

        out = jax.vmap(one)(idx, cols, deltas)
        summary = _wave_summaries(out, R, const)
        return pool_T, pool_basis, out, summary

    return run


def run_warm_wave(pool_T, pool_basis, col_active, art_cols,
                  prev_T, prev_basis, ipack, R, const, max_iters_dev,
                  opts: SolverOptions | None = None):
    """Full fused warm wave (see ``_compiled_warm_wave``). Returns
    ``(pool_T, pool_basis, out_state, summary)``; ``ipack`` is the (B, 5)
    int32 upload [slot, col, wslot, wlane, delta], ``max_iters_dev`` a
    device scalar the caller uploads once per solve."""
    if opts is None:
        opts = SolverOptions.for_dtype(pool_T.dtype)
    m = pool_T.shape[1] - 2
    n = pool_T.shape[2] - 1
    stall_limit = opts.resolved_stall_limit(m, n)
    run = _compiled_warm_wave(_budget_key(opts), stall_limit)
    return run(pool_T, pool_basis, col_active, art_cols,
               prev_T, prev_basis, jnp.asarray(ipack, jnp.int32),
               R, const, max_iters_dev)


@functools.lru_cache(maxsize=32)
def _compiled_expand_generation(opts: SolverOptions, stall_limit: int):
    """One DEVICE-SIDE branch-and-bound generation (round 5, VERDICT r4
    item 5): from a solved wave's terminal states + summary, construct the
    branched children ON DEVICE (floor/ceil bound split of each lane's
    most-fractional variable, applied as the sparse b-rewrite the warm
    path uses) and re-optimize them with the dual simplex — NO host round
    trip. Chaining G of these turns G B&B generations into ONE blocking
    device->host fetch; over the tunneled TPU (~35-70 ms per fetch,
    measured) the fetch chain WAS the MILP scheduler's dominant cost.

    Expansion predicate per parent lane: solved optimal, fractional
    (maxdist > int_tol), active, and bound below ``corner_cut`` (the
    host-computed prune threshold from the exact incumbent at chain
    start — mid-chain integral lanes stop expanding but do NOT tighten
    the cut, so pruning never depends on an unverified float incumbent).
    Children are placed at lanes ``2*cumsum_excl(expand)``/+1; lanes past
    the batch width are DROPPED and the host re-queues them as cold nodes
    (the genealogy + expansion mask returned make the drop detectable).
    """
    from .driver import simplex_step

    @jax.jit
    def run(prev_T, prev_basis, summ_prev, active, lbmat, ubmat,
            col_active, art_cols, le_col, le_sign, ge_col, ge_sign,
            corner_cut, int_tol, max_iters, R, const):
        B = prev_T.shape[0]
        dtype = prev_T.dtype
        corner = summ_prev[:, 0]
        maxdist = summ_prev[:, 1]
        bval = summ_prev[:, 2]
        statuses = summ_prev[:, 3].astype(jnp.int32)
        am = summ_prev[:, 5].astype(jnp.int32)
        # expansion predicate (see docstring); corner = -z_rel, so the cut
        # is an upper bound: expand only strictly ABOVE it
        expand = (active & (statuses == Status.OPTIMAL)
                  & (maxdist > int_tol) & (corner > corner_cut))
        base = 2 * (jnp.cumsum(expand.astype(jnp.int32)) - expand)
        lane_ids = jnp.arange(B, dtype=jnp.int32)
        scat = jnp.where(expand, base, B)
        parent_of = jnp.full((B,), -1, jnp.int32)
        parent_of = parent_of.at[scat].set(lane_ids, mode="drop")
        parent_of = parent_of.at[scat + 1].set(lane_ids, mode="drop")
        is_up = jnp.zeros((B,), jnp.int32)
        is_up = is_up.at[scat + 1].set(1, mode="drop")

        def one(p, up):
            valid = p >= 0
            pp = jnp.maximum(p, 0)
            T = prev_T[pp]
            basis = prev_basis[pp]
            v = am[pp]
            f = jnp.floor(bval[pp])
            lb_p = lbmat[pp]
            ub_p = ubmat[pp]
            upb = up > 0
            delta_b = jnp.where(upb, (f + 1) - lb_p[v], f - ub_p[v])
            col = jnp.where(upb, ge_col[v], le_col[v])
            sgn = jnp.where(upb, ge_sign[v], le_sign[v])
            T = T.at[:, -1].add(
                jnp.where(valid, sgn * delta_b, 0.0) * T[:, col])
            lb_c = jnp.where(upb, lb_p.at[v].set(f + 1), lb_p)
            ub_c = jnp.where(upb, ub_p, ub_p.at[v].set(f))
            st = SimplexState(
                T=T,
                basis=basis.astype(jnp.int32),
                col_active=col_active,
                art_cols=art_cols,
                phase=jnp.asarray(2, jnp.int32),
                status=jnp.where(valid, jnp.int32(Status.RUNNING),
                                 jnp.int32(Status.INFEASIBLE)),
                niter=jnp.asarray(0, jnp.int32),
                stuck=jnp.asarray(0, jnp.int32),
                bland=jnp.asarray(False),
                last_z=jnp.asarray(-jnp.inf, dtype),
            )

            def cond(s):
                return (s.status == Status.RUNNING) & (s.niter < max_iters)

            st = lax.while_loop(
                cond, lambda s: dual_simplex_step(s, opts, stall_limit), st)
            st = st._replace(status=jnp.where(
                st.status == Status.OPTIMAL,
                jnp.int32(Status.RUNNING), st.status))
            st = lax.while_loop(
                cond, lambda s: simplex_step(s, opts, stall_limit), st)
            st = st._replace(status=jnp.where(
                st.status == Status.RUNNING,
                jnp.int32(Status.ITERATION_LIMIT), st.status))
            return st, lb_c, ub_c

        out, lb_next, ub_next = jax.vmap(one)(parent_of, is_up)
        summary = _wave_summaries(out, R, const)
        dt = summary.dtype
        summary = jnp.concatenate(
            [summary, parent_of[:, None].astype(dt),
             is_up[:, None].astype(dt)], axis=1)
        return (out, summary, parent_of >= 0, lb_next, ub_next,
                expand.astype(jnp.int32))

    return run


def run_expand_generation(prev_T, prev_basis, summ_prev, active, lbmat,
                          ubmat, col_active, art_cols, le_col, le_sign,
                          ge_col, ge_sign, corner_cut, int_tol,
                          max_iters_dev, R, const,
                          opts: SolverOptions | None = None):
    """Dispatch one device-side B&B generation (see
    ``_compiled_expand_generation``). Returns ``(out_state, summary_aug,
    next_active, lbmat, ubmat, expand_mask)`` — all device arrays; the
    summary gains two genealogy columns (parent lane, is_up)."""
    if opts is None:
        opts = SolverOptions.for_dtype(prev_T.dtype)
    m = prev_T.shape[1] - 2
    n = prev_T.shape[2] - 1
    stall_limit = opts.resolved_stall_limit(m, n)
    run = _compiled_expand_generation(_budget_key(opts), stall_limit)
    return run(prev_T, prev_basis, summ_prev, active, lbmat, ubmat,
               col_active, art_cols, le_col, le_sign, ge_col, ge_sign,
               corner_cut, int_tol, max_iters_dev, R, const)


@functools.lru_cache(maxsize=32)
def _compiled_warm_batch(opts: SolverOptions, stall_limit: int):
    """Batched warm-start wave: reconstruct + dual simplex + primal cleanup,
    one compiled executable."""
    from .driver import simplex_step

    @jax.jit
    def run(A_aug, c_full, col_active, art_cols, basis_mat, b_mat,
            max_iters):
        def one(basis, b):
            st = _reconstruct(A_aug, c_full, col_active, art_cols, basis, b)

            def cond_d(s):
                return (s.status == Status.RUNNING) & (s.niter < max_iters)

            st = lax.while_loop(
                cond_d, lambda s: dual_simplex_step(s, opts, stall_limit), st)
            # primal cleanup pass: the dual loop ends when b >= -tol, but
            # f32 reconstruction can leave slightly negative reduced costs;
            # re-open OPTIMAL lanes and let the primal driver finish (it
            # terminates immediately when already optimal)
            st = st._replace(status=jnp.where(
                st.status == Status.OPTIMAL,
                jnp.int32(Status.RUNNING), st.status))

            def cond_p(s):
                return (s.status == Status.RUNNING) & (s.niter < max_iters)

            st = lax.while_loop(
                cond_p, lambda s: simplex_step(s, opts, stall_limit), st)
            return st._replace(status=jnp.where(
                st.status == Status.RUNNING,
                jnp.int32(Status.ITERATION_LIMIT), st.status))

        return jax.vmap(one)(basis_mat, b_mat)

    return run


def run_warm_batch(A_aug, c_full, col_active, art_cols, basis_mat, b_mat,
                   opts: SolverOptions | None = None) -> SimplexState:
    """Solve a wave of b-rewritten nodes warm-started from per-lane bases.

    Inputs are the shared root frame (``A_aug`` (m, n) WITH artificial unit
    columns, ``c_full`` (n,), masks) plus per-lane ``basis_mat`` (B, m) and
    ``b_mat`` (B, m). Returns the terminal batched ``SimplexState`` —
    status per lane is OPTIMAL / INFEASIBLE / ITERATION_LIMIT / NUMERIC.
    """
    if opts is None:
        opts = SolverOptions.for_dtype(A_aug.dtype)
    m, n = A_aug.shape
    stall_limit = opts.resolved_stall_limit(m, n)
    run = _compiled_warm_batch(_budget_key(opts), stall_limit)
    return run(A_aug, c_full, col_active, art_cols,
               jnp.asarray(basis_mat, jnp.int32), jnp.asarray(b_mat),
               jnp.asarray(opts.max_iters, jnp.int32))
