"""Column-partitioned multi-chip simplex (SPMD over a device mesh).

The domain's "big axis" is tableau width n (SURVEY.md §5: the LP analogue of
sequence parallelism), so the tableau is sharded along columns over a mesh
axis (``"cols"``), optionally combined with a batch axis (``"batch"``) for
data-parallel batches of LPs — the 2D mesh (batch, cols) is this framework's
(dp, tp) layout. Per BASELINE.json config 5.

Communication pattern per pivot (rides ICI within a slice, DCN across):

1. pricing: each shard reduces its local reduced costs to a (value, index)
   candidate; an ``all_gather`` of P pairs + replicated argmin picks the
   global entering column (Dantzig) or global first-improving (Bland, a pmin)
2. entering-column fetch: the owner shard contributes its column, everyone
   else zeros — one ``psum`` of an (m+2)-vector broadcasts it
3. ratio test: fully replicated (b is replicated)
4. rank-1 update: purely local on each shard's column block

This module provides BOTH multi-chip paths:

* ``shard_state`` + the ordinary driver under jit with NamedShardings — the
  "annotate and let GSPMD insert collectives" path (scaling-book recipe);
* ``run_simplex_sharded`` — the explicit shard_map driver above, with
  hand-placed collectives (the performance path; same SimplexState layout
  split into a sharded column block and a replicated RHS column).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import RULE_BLAND, SimplexState, SolverOptions, Status
from ..solve.driver import _compiled_driver

__all__ = [
    "shard_state",
    "run_simplex_gspmd",
    "ShardedState",
    "to_sharded_state",
    "from_sharded_state",
    "run_simplex_sharded",
    "make_mesh",
]


# ---------------------------------------------------------------------------
# Path A: GSPMD auto-partitioning of the single-chip driver
# ---------------------------------------------------------------------------

def make_mesh(n_devices: Optional[int] = None, axis: str = "cols") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def state_sharding(mesh: Mesh, axis: str = "cols") -> SimplexState:
    """NamedShardings for each SimplexState leaf: the tableau is sharded on
    the column axis; the (n,)-bool masks stay replicated (their width n and
    the tableau's n+1 cannot both divide the mesh, and they are tiny —
    GSPMD handles the mixed layout)."""
    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    return SimplexState(
        T=ns(None, axis),
        basis=ns(None),
        col_active=ns(None),
        art_cols=ns(None),
        phase=ns(),
        status=ns(),
        niter=ns(),
        stuck=ns(),
        bland=ns(),
        last_z=ns(),
    )


def shard_state(state: SimplexState, mesh: Mesh, axis: str = "cols"
                ) -> SimplexState:
    """Place a state on the mesh, column-sharded.

    Pads the column count to a multiple of the axis size (padded columns are
    zero, costless and inactive, so they never enter pricing)."""
    p = mesh.shape[axis]
    n = state.n
    # T's trailing RHS column makes the padded width n+1+pad; sharding evenly
    # requires (n+1+pad) % p == 0
    pad = (-(n + 1)) % p
    if pad:
        zcol = jnp.zeros((state.T.shape[0], pad), dtype=state.T.dtype)
        # insert padding BEFORE the RHS column so the RHS stays last
        T = jnp.concatenate([state.T[:, :-1], zcol, state.T[:, -1:]], axis=1)
        fmask = jnp.zeros((pad,), dtype=bool)
        state = state._replace(
            T=T,
            col_active=jnp.concatenate([state.col_active, fmask]),
            art_cols=jnp.concatenate([state.art_cols, fmask]),
        )
    shardings = state_sharding(mesh, axis)
    return jax.tree.map(jax.device_put, state, shardings)


def run_simplex_gspmd(
    state: SimplexState,
    mesh: Mesh,
    opts: SolverOptions | None = None,
    axis: str = "cols",
) -> SimplexState:
    """Run the standard driver under GSPMD: shardings annotated, collectives
    inserted by XLA. ``state`` should come from ``shard_state``."""
    if opts is None:
        opts = SolverOptions.for_dtype(state.T.dtype)
    stall_limit = opts.resolved_stall_limit(state.m, state.n)
    driver = _compiled_driver.__wrapped__(opts, stall_limit)
    shardings = state_sharding(mesh, axis)
    fn = jax.jit(driver, in_shardings=(shardings,), out_shardings=shardings)
    return fn(state)


# ---------------------------------------------------------------------------
# Path B: explicit shard_map driver with hand-placed collectives
# ---------------------------------------------------------------------------

class ShardedState(NamedTuple):
    """SimplexState split for explicit SPMD: the (m+2, n) coefficient block
    is column-sharded; the RHS column (objective corners + b) is replicated
    and updated identically on every shard."""

    T: jax.Array           # (m+2, n) sharded on axis 1
    rhs: jax.Array         # (m+2,) replicated: [-z2, -z1, b...]
    basis: jax.Array       # (m,) int32, replicated
    col_active: jax.Array  # (n,) sharded
    art_cols: jax.Array    # (n,) sharded
    phase: jax.Array
    status: jax.Array
    niter: jax.Array
    stuck: jax.Array
    bland: jax.Array
    last_z: jax.Array


def to_sharded_state(state: SimplexState, mesh: Mesh, axis: str = "cols"
                     ) -> ShardedState:
    """Split a SimplexState and place it on the mesh (pads columns to a
    multiple of the axis size)."""
    p = mesh.shape[axis]
    n = state.n
    pad = (-n) % p
    T = state.T[:, :-1]
    rhs = state.T[:, -1]
    col_active = state.col_active
    art_cols = state.art_cols
    if pad:
        T = jnp.concatenate(
            [T, jnp.zeros((T.shape[0], pad), dtype=T.dtype)], axis=1)
        fmask = jnp.zeros((pad,), dtype=bool)
        col_active = jnp.concatenate([col_active, fmask])
        art_cols = jnp.concatenate([art_cols, fmask])

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    return ShardedState(
        T=jax.device_put(T, ns(None, axis)),
        rhs=jax.device_put(rhs, ns(None)),
        basis=jax.device_put(state.basis, ns(None)),
        col_active=jax.device_put(col_active, ns(axis)),
        art_cols=jax.device_put(art_cols, ns(axis)),
        phase=state.phase,
        status=state.status,
        niter=state.niter,
        stuck=state.stuck,
        bland=state.bland,
        last_z=state.last_z,
    )


def from_sharded_state(sh: ShardedState, n: int) -> SimplexState:
    """Reassemble a SimplexState (dropping column padding)."""
    T = jnp.concatenate([sh.T[:, :n], sh.rhs[:, None]], axis=1)
    return SimplexState(
        T=T,
        basis=sh.basis,
        col_active=sh.col_active[:n],
        art_cols=sh.art_cols[:n],
        phase=sh.phase,
        status=sh.status,
        niter=sh.niter,
        stuck=sh.stuck,
        bland=sh.bland,
        last_z=sh.last_z,
    )


def _fetch_column(T_local, j, axis: str):
    """Entering column as a replicated (m+2,) vector: owner shard contributes,
    psum broadcasts (one m-vector collective per pivot)."""
    n_local = T_local.shape[1]
    ax = lax.axis_index(axis)
    owner = (j // n_local) == ax
    j_local = j % n_local
    u = jnp.where(owner, T_local[:, j_local], 0.0)
    return lax.psum(u, axis), owner, j_local


def _sharded_step(s: ShardedState, opts: SolverOptions, stall_limit: int,
                  n_global: int, axis: str) -> ShardedState:
    dtype = s.T.dtype
    n_local = s.T.shape[1]
    m = s.basis.shape[0]
    ax = lax.axis_index(axis)
    inf = jnp.asarray(jnp.inf, dtype)

    # ---- pricing: per-shard candidate + tiny all_gather reduction ----------
    crow = jnp.where(s.phase == 1, s.T[1], s.T[0])
    c_eff = jnp.where(s.col_active, crow, inf)
    l_min = jnp.min(c_eff)
    l_arg = (jnp.argmin(c_eff) + ax * n_local).astype(jnp.int32)
    g_vals = lax.all_gather(l_min, axis)     # (P,)
    g_idxs = lax.all_gather(l_arg, axis)     # (P,)
    k = jnp.argmin(g_vals)
    j_dantzig = g_idxs[k]
    c_min = g_vals[k]

    local_ids = (jnp.arange(n_local, dtype=jnp.int32) + ax * n_local)
    improving_l = c_eff < -opts.opt_tol
    l_first = jnp.min(jnp.where(improving_l, local_ids, n_global))
    j_bland = lax.pmin(l_first, axis)

    has_improving = c_min < -opts.opt_tol
    use_bland = s.bland | (opts.rule == RULE_BLAND)
    j = jnp.where(use_bland, jnp.minimum(j_bland, n_global - 1), j_dantzig)

    # ---- entering column via psum broadcast --------------------------------
    u, owner, j_local = _fetch_column(s.T, j, axis)

    # ---- replicated ratio test ---------------------------------------------
    col = u[2:]
    b = s.rhs[2:]
    pos = col > opts.piv_tol
    has_ratio = jnp.any(pos)
    ratios = jnp.where(pos, b / jnp.where(pos, col, 1.0), inf)
    min_ratio = jnp.min(ratios)
    tie = ratios <= min_ratio
    r_first = jnp.argmax(tie).astype(jnp.int32)
    r_bland = jnp.argmin(
        jnp.where(tie, s.basis, jnp.int32(2**30))).astype(jnp.int32)
    r = jnp.where(use_bland, r_bland, r_first)

    def do_pivot(s2: ShardedState) -> ShardedState:
        rg = r + 2
        piv = u[rg]
        inv = 1.0 / piv
        prow = s2.T[rg, :] * inv                       # local slice
        Tn = s2.T - u[:, None] * prow[None, :]
        Tn = Tn.at[rg, :].set(prow)
        # owner snaps the entering column to an exact unit vector
        unit = (jnp.arange(s2.T.shape[0]) == rg).astype(dtype)
        is_j = owner & (jnp.arange(n_local) == j_local)
        Tn = jnp.where(is_j[None, :], unit[:, None], Tn)
        rhs_piv = s2.rhs[rg] * inv
        rhsn = s2.rhs - u * rhs_piv
        rhsn = rhsn.at[rg].set(rhs_piv)
        basis = s2.basis.at[r].set(j)
        z = jnp.where(s2.phase == 1, -rhsn[1], -rhsn[0])
        improved = (s2.last_z - z) > opts.degen_tol
        stuck = jnp.where(improved, 0, s2.stuck + 1).astype(jnp.int32)
        return s2._replace(
            T=Tn, rhs=rhsn, basis=basis, niter=s2.niter + 1, stuck=stuck,
            bland=s2.bland | (stuck >= stall_limit), last_z=z)

    def when_improving(s2):
        def unbounded(s3):
            code = jnp.where(s3.phase == 1, jnp.int32(Status.INFEASIBLE),
                             jnp.int32(Status.UNBOUNDED))
            return s3._replace(status=code)

        return lax.cond(has_ratio, do_pivot, unbounded, s2)

    def on_optimal(s2):
        z1 = -s2.rhs[1]

        def finish2(s3):
            return s3._replace(status=jnp.asarray(Status.OPTIMAL, jnp.int32))

        def finish1(s3):
            def to_infeas(s4):
                return s4._replace(
                    status=jnp.asarray(Status.INFEASIBLE, jnp.int32))

            def to_phase2(s4):
                s4 = _drive_out_sharded(s4, opts, axis)
                return s4._replace(
                    phase=jnp.asarray(2, jnp.int32),
                    col_active=s4.col_active & ~s4.art_cols,
                    stuck=jnp.asarray(0, jnp.int32),
                    last_z=inf,
                )

            return lax.cond(z1 > opts.infeas_tol, to_infeas, to_phase2, s3)

        return lax.cond(s2.phase == 1, finish1, finish2, s2)

    return lax.cond(has_improving, when_improving, on_optimal, s)


def _drive_out_sharded(s: ShardedState, opts: SolverOptions, axis: str
                       ) -> ShardedState:
    """Sharded version of the end-of-phase-1 artificial drive-out (see
    tpulp.solve.driver._drive_out_artificials)."""
    m = s.basis.shape[0]
    n_local = s.T.shape[1]
    dtype = s.T.dtype

    # replicated knowledge of which columns are artificial, by basis index:
    # fetch per-row basis artificial-ness via psum of local masks
    def body(i, s2):
        ax = lax.axis_index(axis)
        jb = s2.basis[i]
        owner_b = (jb // n_local) == ax
        is_art = lax.psum(
            jnp.where(owner_b, s2.art_cols[jb % n_local].astype(jnp.int32), 0),
            axis) > 0
        row = s2.T[2 + i, :]
        elig = s2.col_active & ~s2.art_cols & (jnp.abs(row) > opts.piv_tol)
        local_ids = (jnp.arange(n_local, dtype=jnp.int32) + ax * n_local)
        l_first = jnp.min(jnp.where(elig, local_ids, jnp.int32(2**30)))
        j = lax.pmin(l_first, axis)
        has = j < jnp.int32(2**30)

        def do(s3):
            u, owner, j_local = _fetch_column(s3.T, j, axis)
            rg = i + 2
            inv = 1.0 / u[rg]
            prow = s3.T[rg, :] * inv
            Tn = s3.T - u[:, None] * prow[None, :]
            Tn = Tn.at[rg, :].set(prow)
            unit = (jnp.arange(s3.T.shape[0]) == rg).astype(dtype)
            is_j = owner & (jnp.arange(n_local) == j_local)
            Tn = jnp.where(is_j[None, :], unit[:, None], Tn)
            rhs_piv = s3.rhs[rg] * inv
            rhsn = s3.rhs - u * rhs_piv
            rhsn = rhsn.at[rg].set(rhs_piv)
            return s3._replace(T=Tn, rhs=rhsn, basis=s3.basis.at[i].set(j))

        return lax.cond(is_art & has, do, lambda s3: s3, s2)

    return lax.fori_loop(0, m, body, s)


@functools.lru_cache(maxsize=16)
def _sharded_driver(opts: SolverOptions, stall_limit: int, n_global: int,
                    axis: str, mesh_key):
    mesh = mesh_key  # Mesh is hashable in recent jax
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

    def solve_local(s: ShardedState) -> ShardedState:
        def cond(st):
            return (st.status == Status.RUNNING) & (st.niter < opts.max_iters)

        def body(st):
            return _sharded_step(st, opts, stall_limit, n_global, axis)

        out = lax.while_loop(cond, body, s)
        return out._replace(status=jnp.where(
            out.status == Status.RUNNING,
            jnp.int32(Status.ITERATION_LIMIT), out.status))

    return jax.jit(shard_map(
        solve_local, mesh=mesh, in_specs=(specs,), out_specs=specs,
        check_vma=False))


def run_simplex_sharded(
    sh: ShardedState,
    mesh: Mesh,
    opts: SolverOptions | None = None,
    axis: str = "cols",
) -> ShardedState:
    """Run the explicit-collective sharded driver to termination."""
    if opts is None:
        opts = SolverOptions.for_dtype(sh.T.dtype)
    m = sh.basis.shape[0]
    n_global = sh.T.shape[1]
    stall_limit = opts.resolved_stall_limit(m, n_global)
    driver = _sharded_driver(opts, stall_limit, n_global, axis, mesh)
    return driver(sh)
