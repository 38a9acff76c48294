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
