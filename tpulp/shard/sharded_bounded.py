"""Sharded bounded-variable simplex: spans in the ratio test, multi-chip.

Completes the simple_bounds x mesh cell for real (round 4): the solo
bounded driver (``tpulp.solve.bounded``) enforces finite upper bounds via
the complement representation — flips instead of bound rows; this driver
is the same state machine over the column-partitioned layout of
``shard/sharded.py``:

* ``upper`` / ``at_upper`` are sharded like the tableau columns;
* the basic-span vector ``u_B = upper[basis]`` is assembled with ONE extra
  (m,)-psum per pivot (owner shards contribute their entries), and the
  entering column fetch carries ``upper[j]`` as one extra psum lane —
  no other collectives beyond the plain rank-1 sharded driver's set;
* the three-way ratio test (basic-hits-lower / basic-hits-ITS-upper /
  entering-flip) runs on replicated vectors;
* flips need no new collective: an entering-flip's column is the one just
  fetched, and a leave-at-upper flip's POST-pivot column is derivable in
  closed form because the leaving column is an exact unit vector
  pre-pivot (``post = e_rg - u/piv`` off-row, ``1/piv`` on-row); the owner
  shard negates its local column slice, every shard applies the
  replicated RHS fold.

Decision logic mirrors ``bounded_simplex_step`` exactly, so tests pin the
same pivot/flip walk as the solo driver on the fake cluster.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import RULE_BLAND, SolverOptions, Status
from ..solve.bounded import BoundedState
from .sharded import ShardedState, _axis_size, from_sharded_state, \
    to_sharded_state

__all__ = ["ShardedBoundedState", "to_sharded_bounded_state",
           "from_sharded_bounded_state", "run_simplex_sharded_bounded"]


class ShardedBoundedState(NamedTuple):
    s: ShardedState
    upper: jax.Array     # (n_local,) sharded: finite span or +inf
    at_upper: jax.Array  # (n_local,) sharded bool


def to_sharded_bounded_state(bs: BoundedState, mesh: Mesh,
                             axis: str = "cols") -> ShardedBoundedState:
    """Split a solo BoundedState onto the mesh (pads spans with +inf)."""
    sh = to_sharded_state(bs.s, mesh, axis=axis)
    p = _axis_size(mesh, axis)
    n = bs.s.n
    pad = (-n) % p
    upper = bs.upper
    at_upper = bs.at_upper
    if pad:
        upper = jnp.concatenate(
            [upper, jnp.full((pad,), jnp.inf, upper.dtype)])
        at_upper = jnp.concatenate(
            [at_upper, jnp.zeros((pad,), jnp.bool_)])

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    return ShardedBoundedState(
        s=sh,
        upper=jax.device_put(upper, ns(axis)),
        at_upper=jax.device_put(at_upper, ns(axis)),
    )


def from_sharded_bounded_state(sb: ShardedBoundedState, n: int
                               ) -> BoundedState:
    """Reassemble the solo BoundedState (drops column padding)."""
    return BoundedState(
        s=from_sharded_state(sb.s, n),
        upper=sb.upper[:n],
        at_upper=sb.at_upper[:n],
    )


def _fetch_column_and_span(T_local, upper, j, axis: str):
    """Entering column + its span in ONE psum ((m+3)-vector: coefficients,
    span, at-upper unused — spans of nonbasic complemented columns are the
    flip distances)."""
    n_local = T_local.shape[1]
    ax = lax.axis_index(axis)
    owner = (j // n_local) == ax
    j_local = j % n_local
    contrib = jnp.where(
        owner,
        jnp.concatenate([T_local[:, j_local], upper[j_local][None]]), 0.0)
    out = lax.psum(contrib, axis)
    return out[:-1], out[-1], owner, j_local


def _sharded_bounded_step(sb: ShardedBoundedState, opts: SolverOptions,
                          stall_limit: int, n_global: int,
                          axis: str) -> ShardedBoundedState:
    """One branchless transition; mirrors solve.bounded.bounded_simplex_step
    over the sharded layout."""
    s = sb.s
    dtype = s.T.dtype
    n_local = s.T.shape[1]
    nrows = s.T.shape[0]
    m = s.basis.shape[0]
    ax = lax.axis_index(axis)
    inf = jnp.asarray(jnp.inf, dtype)
    running = s.status == Status.RUNNING
    in_phase2 = s.phase == 2
    local_ids = (jnp.arange(n_local, dtype=jnp.int32) + ax * n_local)
    BIG = jnp.int32(2**30)

    # ---- cleanup scan (identical to the plain sharded driver) --------------
    owner_b = (s.basis // n_local) == ax
    art_at_basis = s.art_cols[s.basis % n_local]
    art_basic = lax.psum(
        jnp.where(owner_b, art_at_basis.astype(jnp.int32), 0), axis) > 0
    cleanup = jnp.any(art_basic) & in_phase2 & running
    r_d = jnp.argmax(art_basic).astype(jnp.int32)
    row_d = s.T[2 + r_d, :]
    elig = s.col_active & ~s.art_cols & (jnp.abs(row_d) > opts.piv_tol)
    l_first_elig = jnp.min(jnp.where(elig, local_ids, BIG))
    j_d = lax.pmin(l_first_elig, axis)
    has_elig = j_d < BIG
    j_d = jnp.minimum(j_d, n_global - 1)
    retire = cleanup & ~has_elig
    basis_rd = s.basis[r_d]
    owner_rd = (basis_rd // n_local) == ax
    art_cols = jnp.where(
        retire & owner_rd,
        s.art_cols.at[basis_rd % n_local].set(False),
        s.art_cols)

    # ---- pricing (uniform under the complement representation) -------------
    crow = jnp.where(s.phase == 1, s.T[1], s.T[0])
    c_eff = jnp.where(s.col_active, crow, inf)
    l_min = jnp.min(c_eff)
    l_arg = (jnp.argmin(c_eff) + ax * n_local).astype(jnp.int32)
    g_vals = lax.all_gather(l_min, axis)
    g_idxs = lax.all_gather(l_arg, axis)
    k = jnp.argmin(g_vals)
    j_dantzig = g_idxs[k]
    c_min = g_vals[k]
    improving_l = c_eff < -opts.opt_tol
    l_first = jnp.min(jnp.where(improving_l, local_ids, n_global))
    j_bland = lax.pmin(l_first, axis)
    has_improving = c_min < -opts.opt_tol
    use_bland = s.bland | (opts.rule == RULE_BLAND)
    j_price = jnp.where(
        use_bland, jnp.minimum(j_bland, n_global - 1), j_dantzig)

    # ---- phase bookkeeping -------------------------------------------------
    z1 = -s.rhs[1]
    phase1_done = (s.phase == 1) & ~has_improving & running
    became_infeasible = phase1_done & (z1 > opts.infeas_tol)
    to_phase2 = phase1_done & ~became_infeasible
    pricing_pivot = has_improving & ~cleanup & ~phase1_done

    # ---- basic spans: ONE (m,)-psum (owners contribute their entries) ------
    ub_local = jnp.where(owner_b, sb.upper[s.basis % n_local], 0.0)
    u_basic = lax.psum(ub_local, axis)                        # (m,)

    # ---- entering column + span via the fused psum -------------------------
    j = jnp.where(cleanup, j_d, j_price)
    u, upper_j, owner, j_local = _fetch_column_and_span(
        s.T, sb.upper, j, axis)
    col = u[2:]
    b = s.rhs[2:]
    # (a) basic hits lower 0
    pos = col > opts.piv_tol
    t_lo = jnp.where(pos, b / jnp.where(pos, col, 1.0), inf)
    t_lo_min = jnp.min(t_lo)
    # (b) basic hits ITS upper
    neg = (col < -opts.piv_tol) & jnp.isfinite(u_basic)
    t_up = jnp.where(neg, (u_basic - b) / jnp.where(neg, -col, 1.0), inf)
    t_up_min = jnp.min(t_up)
    # (c) entering traverses its whole span
    t_flip = upper_j
    t_star = jnp.minimum(jnp.minimum(t_lo_min, t_up_min), t_flip)
    has_ratio = jnp.isfinite(t_star)
    kind_lo = t_lo_min <= t_star
    kind_up = ~kind_lo & (t_up_min <= t_star)
    kind_flip = ~kind_lo & ~kind_up

    tie_lo = t_lo <= t_star
    tie_up = neg & (t_up <= t_star)
    tie = jnp.where(kind_lo, tie_lo, tie_up)
    r_first = jnp.argmax(tie).astype(jnp.int32)
    r_bland = jnp.argmin(jnp.where(tie, s.basis, BIG)).astype(jnp.int32)
    r_price = jnp.where(use_bland, r_bland, r_first)

    became_unbounded = pricing_pivot & ~has_ratio & in_phase2 & running
    became_failed1 = pricing_pivot & ~has_ratio & ~in_phase2 & running

    # ---- the one (possibly no-op) pivot ------------------------------------
    do_cleanup = cleanup & has_elig
    do_price = pricing_pivot & has_ratio & running
    do_pivot = do_cleanup | (do_price & ~kind_flip)
    do_flip_enter = do_price & kind_flip
    r = jnp.where(do_cleanup, r_d, r_price)
    leaving = s.basis[r]
    rg = jnp.where(do_pivot, r + 2, 2)
    j_eff = jnp.where(do_pivot, j, s.basis[0])
    u_eff, _ue_span, owner_eff, j_local_eff = lax.cond(
        do_pivot,
        lambda: (u, upper_j, owner, j_local),
        lambda: _fetch_column_and_span(s.T, sb.upper, s.basis[0], axis),
    )
    piv = u_eff[rg]
    invp = 1.0 / piv
    prow = s.T[rg, :] * invp
    Tn = s.T - u_eff[:, None] * prow[None, :]
    is_rg = (jnp.arange(nrows) == rg)[:, None]
    Tn = jnp.where(is_rg, prow[None, :], Tn)
    unit = is_rg[:, 0].astype(dtype)
    is_j = owner_eff & (jnp.arange(n_local) == j_local_eff)
    Tn = jnp.where(is_j[None, :], unit[:, None], Tn)
    rhs_piv = s.rhs[rg] * invp
    rhsn = s.rhs - u_eff * rhs_piv
    rhsn = rhsn.at[rg].set(rhs_piv)
    # no-op redirect leaves everything unchanged when neither pivot nor
    # flip acts this step
    Tn = jnp.where(do_pivot, Tn, s.T)
    rhsn = jnp.where(do_pivot, rhsn, s.rhs)
    basis = jnp.where(do_pivot, s.basis.at[r].set(j), s.basis)

    # ---- the one (possibly no-op) column flip ------------------------------
    # entering-flip: column j, value = the fetched pre-pivot column u;
    # leave-at-upper: column `leaving`, whose POST-pivot value is closed
    # form (pre-pivot it is the exact unit e_rg):
    #   post[i != rg] = -u_eff[i] / piv,  post[rg] = 1 / piv
    do_flip = (do_price & kind_up & ~cleanup) | do_flip_enter
    fcol = jnp.where(do_flip_enter, j, leaving)
    uf_flip = jnp.where(do_flip_enter, upper_j, u_basic[r])
    uf = jnp.where(do_flip, uf_flip, jnp.asarray(0.0, dtype))
    colv_leave = jnp.where(
        (jnp.arange(nrows) == rg), invp, -u_eff * invp)
    colv = jnp.where(do_flip_enter, u, colv_leave)            # (m+2,)
    rhsn = rhsn - uf * colv
    owner_f = (fcol // n_local) == ax
    is_fcol = owner_f & (jnp.arange(n_local) == (fcol % n_local)) & do_flip
    Tn = jnp.where(is_fcol[None, :], -Tn, Tn)
    at_upper = jnp.where(
        is_fcol, ~sb.at_upper, sb.at_upper)

    # ---- stall / Bland switch ----------------------------------------------
    act = do_pivot | do_flip_enter
    z = jnp.where(s.phase == 1, -rhsn[1], -rhsn[0])
    improved = (s.last_z - z) > opts.degen_tol
    stuck = jnp.where(
        do_price & act,
        jnp.where(improved, 0, s.stuck + 1),
        s.stuck).astype(jnp.int32)
    last_z = jnp.where(do_price & act, z, s.last_z)
    bland = s.bland | (stuck >= stall_limit)

    phase = jnp.where(to_phase2, 2, s.phase).astype(jnp.int32)
    col_active = jnp.where(to_phase2, s.col_active & ~art_cols,
                           s.col_active)
    stuck = jnp.where(to_phase2, 0, stuck)
    last_z = jnp.where(to_phase2, inf, last_z)

    finished_opt = in_phase2 & ~has_improving & ~cleanup & running
    finite_ok = (
        jnp.isfinite(z)
        & jnp.isfinite(jnp.sum(jnp.abs(rhsn[2:])))
        & jnp.isfinite(lax.psum(
            jnp.sum(jnp.where(s.col_active, jnp.abs(crow), 0.0)), axis))
    )
    new_status = jnp.where(
        ~finite_ok, jnp.int32(Status.NUMERIC),
        jnp.where(
            became_infeasible | became_failed1, jnp.int32(Status.INFEASIBLE),
            jnp.where(became_unbounded, jnp.int32(Status.UNBOUNDED),
                      jnp.where(finished_opt, jnp.int32(Status.OPTIMAL),
                                jnp.int32(Status.RUNNING)))))
    status = jnp.where(running, new_status, s.status)

    return ShardedBoundedState(
        s=ShardedState(
            T=Tn,
            rhs=rhsn,
            basis=basis,
            col_active=col_active,
            art_cols=art_cols,
            phase=phase,
            status=status,
            niter=s.niter + act.astype(jnp.int32),
            stuck=stuck,
            bland=bland,
            last_z=last_z,
        ),
        upper=sb.upper,
        at_upper=at_upper,
    )


@functools.lru_cache(maxsize=16)
def _sharded_bounded_driver(opts: SolverOptions, stall_limit: int,
                            n_global: int, axis: str, mesh: Mesh):
    from jax import shard_map

    sspecs = ShardedState(
        T=P(None, axis), rhs=P(), basis=P(),
        col_active=P(axis), art_cols=P(axis),
        phase=P(), status=P(), niter=P(), stuck=P(), bland=P(), last_z=P())
    specs = ShardedBoundedState(s=sspecs, upper=P(axis), at_upper=P(axis))

    def solve_local(sb: ShardedBoundedState, max_iters
                    ) -> ShardedBoundedState:
        def cond(c):
            return (c.s.status == Status.RUNNING) & (c.s.niter < max_iters)

        out = lax.while_loop(
            cond,
            lambda c: _sharded_bounded_step(c, opts, stall_limit, n_global,
                                            axis),
            sb)
        return out._replace(s=out.s._replace(status=jnp.where(
            out.s.status == Status.RUNNING,
            jnp.int32(Status.ITERATION_LIMIT), out.s.status)))

    return jax.jit(shard_map(
        solve_local, mesh=mesh, in_specs=(specs, P()), out_specs=specs,
        check_vma=False))


def run_simplex_sharded_bounded(
    sb: ShardedBoundedState,
    mesh: Mesh,
    opts: SolverOptions | None = None,
    axis: str = "cols",
) -> ShardedBoundedState:
    """Run the sharded bounded-variable driver to termination."""
    if opts is None:
        opts = SolverOptions.for_dtype(sb.s.T.dtype)
    m = sb.s.basis.shape[0]
    n_global = sb.s.T.shape[1]
    stall_limit = opts.resolved_stall_limit(m, n_global)
    from ..solve.driver import _budget_key

    driver = _sharded_bounded_driver(
        _budget_key(opts), stall_limit, n_global, axis, mesh)
    return driver(sb, jnp.asarray(opts.max_iters, jnp.int32))
