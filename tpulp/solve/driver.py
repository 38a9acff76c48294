"""Jitted two-phase simplex driver: one ``lax.while_loop`` state machine.

TPU-first redesign of the reference's solver loop (simplex.py:110-148) and
phase-1 orchestration (simplex.py:36-108). The entire two-phase algorithm —
pricing, ratio test, pivot, Bland anti-cycling switch, phase transition,
termination — is a single compiled loop over a static-shape
``SimplexState``; there is no host round-trip per pivot. ``vmap`` of
``simplex_step``/``run_simplex`` over a leading axis is the batched solver
(``tpulp.batch``), and the same step logic re-appears column-sharded in
``tpulp.shard``.

Algorithmic contract (matching the reference's observable behavior, with its
bugs fixed — SURVEY.md §2.7):

* Dantzig pricing (most-negative reduced cost, first index on ties) with a
  PERMANENT switch to Bland's rule after ``stall_limit`` consecutive pivots
  that fail to improve the CURRENT objective value.
* Bland mode: first improving column; smallest basic-variable index among
  min-ratio tie rows (the combination with termination guarantee).
* Status reporting, never asserts: optimal / unbounded / infeasible /
  iteration_limit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core.state import (
    RULE_BLAND,
    SimplexState,
    SolverOptions,
    Status,
)

__all__ = [
    "simplex_step",
    "run_simplex",
    "extract_solution",
    "choose_pivot",
    "pivot_update",
]


def _pricing_row(state: SimplexState) -> jax.Array:
    """Reduced costs driving the current phase (phase 1 -> row 1)."""
    return jnp.where(state.phase == 1, state.T[1, :-1], state.T[0, :-1])


def choose_pivot(state: SimplexState, opts: SolverOptions):
    """Select (row, col) under the active rule.

    Returns ``(has_improving, has_ratio, r, j)`` where ``r`` indexes
    constraint rows (0..m-1) and ``j`` columns; ``r``/``j`` are only
    meaningful when the respective flags are True.
    """
    n = state.n
    dtype = state.T.dtype
    crow = _pricing_row(state)
    c_eff = jnp.where(state.col_active, crow, jnp.asarray(jnp.inf, dtype))
    improving = c_eff < -opts.opt_tol
    has_improving = jnp.any(improving)

    use_bland = state.bland | (opts.rule == RULE_BLAND)
    col_ids = jnp.arange(n, dtype=jnp.int32)
    j_dantzig = jnp.argmin(c_eff).astype(jnp.int32)
    j_bland = jnp.min(jnp.where(improving, col_ids, n)).astype(jnp.int32)
    j = jnp.where(use_bland, jnp.minimum(j_bland, n - 1), j_dantzig)

    # ratio test on the entering column
    col = state.T[2:, j]
    b = state.T[2:, -1]
    pos = col > opts.piv_tol
    has_ratio = jnp.any(pos)
    big = jnp.asarray(jnp.inf, dtype)
    ratios = jnp.where(pos, b / jnp.where(pos, col, 1.0), big)
    min_ratio = jnp.min(ratios)
    # tie rows: Bland breaks ties by smallest basic-variable index (the
    # anti-cycling guarantee); Dantzig mode takes the first row
    tie = ratios <= min_ratio
    m = state.m
    row_ids = jnp.arange(m, dtype=jnp.int32)
    r_first = jnp.argmax(tie).astype(jnp.int32)
    r_bland = jnp.argmin(jnp.where(tie, state.basis, jnp.int32(2**30))).astype(
        jnp.int32)
    r = jnp.where(use_bland, r_bland, r_first)
    del row_ids
    return has_improving, has_ratio, r, j


def pivot_update(T: jax.Array, r_glob: jax.Array, j: jax.Array) -> jax.Array:
    """Gauss-Jordan rank-1 pivot on global row ``r_glob``, column ``j``.

    ``T <- T - T[:, j] (x) (T[r]/piv)``; the pivot row is the normalized
    original and column ``j`` is snapped to an exact unit vector to stop
    float drift (the device analogue of exact cancellation in the rational
    reference, tableau.py:295-308).
    """
    piv = T[r_glob, j]
    prow = T[r_glob, :] / piv
    colv = T[:, j]
    Tn = T - colv[:, None] * prow[None, :]
    Tn = Tn.at[r_glob, :].set(prow)
    nrows = T.shape[0]
    unit = (jnp.arange(nrows) == r_glob).astype(T.dtype)
    Tn = Tn.at[:, j].set(unit)
    return Tn


def _do_pivot(state: SimplexState, opts: SolverOptions,
              stall_limit: int, r: jax.Array, j: jax.Array) -> SimplexState:
    T = pivot_update(state.T, r + 2, j)
    basis = state.basis.at[r].set(j)
    # stall detection against the CURRENT phase objective (fix of
    # SURVEY.md §2.7-2: the reference compared against a stale value)
    z = jnp.where(state.phase == 1, -T[1, -1], -T[0, -1])
    improved = (state.last_z - z) > opts.degen_tol
    stuck = jnp.where(improved, 0, state.stuck + 1).astype(jnp.int32)
    bland = state.bland | (stuck >= stall_limit)
    return state._replace(
        T=T,
        basis=basis,
        niter=state.niter + 1,
        stuck=stuck,
        bland=bland,
        last_z=z,
    )


def _drive_out_artificials(state: SimplexState, opts: SolverOptions
                           ) -> SimplexState:
    """Pivot every basic artificial out of the basis at the end of phase 1.

    A basic artificial at value 0 is NOT inert: a later pivot whose entering
    column has a negative entry in its row makes it grow, silently breaking
    primal feasibility (empirically reproduced; the rational reference
    performs the same drive-out at simplex.py:69-84). Pivoting on ANY nonzero
    original-column entry in the row is feasibility-preserving because the
    row's RHS is 0. Rows with no eligible entry are linearly dependent: their
    artificial stays basic, and since every active entry of the row is ~0 the
    row can no longer interact with future pivots."""
    m = state.m

    def body(i, s):
        is_art = s.art_cols[s.basis[i]]
        row = s.T[2 + i, :-1]
        elig = s.col_active & ~s.art_cols & (jnp.abs(row) > opts.piv_tol)
        has = jnp.any(elig)
        j = jnp.argmax(elig).astype(jnp.int32)

        def do(s2):
            T = pivot_update(s2.T, i + 2, j)
            return s2._replace(T=T, basis=s2.basis.at[i].set(j))

        return lax.cond(is_art & has, do, lambda s2: s2, s)

    return lax.fori_loop(0, m, body, state)


def _on_phase_optimal(state: SimplexState, opts: SolverOptions) -> SimplexState:
    """No improving column: finish phase 2, or transition phase 1 -> 2."""
    z1 = -state.T[1, -1]

    def finish_phase2(s):
        return s._replace(status=jnp.asarray(Status.OPTIMAL, jnp.int32))

    def finish_phase1(s):
        infeasible = z1 > opts.infeas_tol

        def to_infeasible(s2):
            return s2._replace(status=jnp.asarray(Status.INFEASIBLE, jnp.int32))

        def to_phase2(s2):
            dtype = s2.T.dtype
            s2 = _drive_out_artificials(s2, opts)
            return s2._replace(
                phase=jnp.asarray(2, jnp.int32),
                col_active=s2.col_active & ~s2.art_cols,
                stuck=jnp.asarray(0, jnp.int32),
                last_z=jnp.asarray(jnp.inf, dtype),
            )

        return lax.cond(infeasible, to_infeasible, to_phase2, s)

    return lax.cond(state.phase == 1, finish_phase1, finish_phase2, state)


def simplex_step(state: SimplexState, opts: SolverOptions,
                 stall_limit: int) -> SimplexState:
    """One transition of the solver state machine (a no-op once terminal)."""
    has_improving, has_ratio, r, j = choose_pivot(state, opts)

    def when_improving(s):
        def unbounded(s2):
            # phase 1 is bounded below by 0; a no-positive-entry column there
            # means numerical failure — report infeasible conservatively
            code = jnp.where(
                s2.phase == 1,
                jnp.int32(Status.INFEASIBLE),
                jnp.int32(Status.UNBOUNDED),
            )
            return s2._replace(status=code)

        return lax.cond(
            has_ratio,
            lambda s2: _do_pivot(s2, opts, stall_limit, r, j),
            unbounded,
            s,
        )

    return lax.cond(
        has_improving,
        when_improving,
        lambda s: _on_phase_optimal(s, opts),
        state,
    )


@functools.lru_cache(maxsize=64)
def _compiled_driver(opts: SolverOptions, stall_limit: int):
    @jax.jit
    def driver(state: SimplexState) -> SimplexState:
        def cond(s):
            return (s.status == Status.RUNNING) & (s.niter < opts.max_iters)

        def body(s):
            # freeze terminal lanes: under vmap the loop runs until EVERY
            # lane terminates, and finished lanes must not keep pivoting
            s_new = simplex_step(s, opts, stall_limit)
            running = s.status == Status.RUNNING
            return jax.tree.map(
                lambda new, old: jnp.where(running, new, old), s_new, s)

        out = lax.while_loop(cond, body, state)
        hit_limit = (out.status == Status.RUNNING)
        return out._replace(
            status=jnp.where(
                hit_limit, jnp.int32(Status.ITERATION_LIMIT), out.status))

    return driver


def run_simplex(state: SimplexState, opts: SolverOptions | None = None
                ) -> SimplexState:
    """Run the jitted driver to termination (single problem)."""
    if opts is None:
        opts = SolverOptions.for_dtype(state.T.dtype)
    stall_limit = opts.resolved_stall_limit(state.m, state.n)
    return _compiled_driver(opts, stall_limit)(state)


def extract_solution(state: SimplexState):
    """(x, z): primal column values and phase-2 objective (min sense).

    ``x`` scatters the RHS through the basis; nonbasic columns are 0."""
    n = state.n
    b = state.T[2:, -1]
    x = jnp.zeros((n,), dtype=state.T.dtype).at[state.basis].set(b)
    return x, state.objective()
