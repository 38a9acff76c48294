"""Pallas TPU kernels for the simplex hot path.

The rank-1 pivot update is the reference's hot kernel (tableau.py:295-308:
one O(m.n) elimination per pivot — SURVEY.md §3.3). Here it is a single
fused Pallas pass over the HBM-resident tableau that ALSO produces the
pricing reduction for the NEXT iteration, so one HBM read serves both the
update and the next entering-column choice:

    grid: column tiles of the (m+2, n+1) tableau
    per tile:  Tn = T - u (x) prow          (VPU elementwise)
               Tn[r, :] = prow              (pivot row overwrite)
               Tn[:, j] = e_r               (unit-column snap, owner tile)
               tile-local min/argmin of the updated objective row
    epilogue:  tiny argmin over the per-tile candidates (host-side jnp)

Inputs ``u`` (current entering column) and ``prow`` (normalized pivot row)
are precomputed by the caller — they are O(m)/O(n) slices, negligible next
to the tableau pass.

``fused_pivot_update`` is a drop-in alternative to
``tpulp.solve.driver.pivot_update`` that additionally returns the next
Dantzig candidate; correctness is pinned against the jnp path in
tests/test_kernels.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_pivot_update", "pallas_pivot_update"]


def _pivot_kernel(r_ref, j_ref, u_ref, prow_ref, T_ref, out_ref, cmin_ref,
                  carg_ref):
    """One column-tile of the fused pivot + next-pricing pass."""
    tile = pl.program_id(0)
    tile_n = T_ref.shape[1]
    nrows = T_ref.shape[0]
    r = r_ref[0]
    j = j_ref[0]

    u = u_ref[:, 0]                      # (m+2,)
    prow_t = prow_ref[0, :]              # (tile_n,) this tile's pivot-row slice

    # rank-1 elimination + pivot-row overwrite (one VPU pass over the tile)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (nrows, tile_n), 0)
    is_r = row_ids == r
    Tn = T_ref[:, :] - u[:, None] * prow_t[None, :]
    Tn = jnp.where(is_r, prow_t[None, :], Tn)

    # unit-column snap if column j lives in this tile
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (nrows, tile_n), 1)
    global_col = col_ids + tile * tile_n
    is_j = global_col == j
    Tn = jnp.where(is_j, is_r.astype(Tn.dtype), Tn)

    out_ref[:, :] = Tn

    # next-iteration Dantzig pricing over the UPDATED objective row (row 0)
    obj = Tn[0, :]
    local_arg = jnp.argmin(obj).astype(jnp.int32)
    cmin_ref[0] = obj[local_arg]
    carg_ref[0] = local_arg + tile * tile_n


@functools.partial(jax.jit, static_argnames=("tile_n",))
def pallas_pivot_update(T, r_glob, j, tile_n: int = 512):
    """Fused pivot update via Pallas.

    Returns ``(T_new, cmin_tiles, carg_tiles)`` where the tile candidate
    arrays reduce to the next Dantzig column. T's width must be a multiple
    of ``tile_n`` (callers pad; the bench tableau width 8192+1 uses
    tile_n=513 divisors — pick tile_n dividing n+1)."""
    nrows, ncols = T.shape
    assert ncols % tile_n == 0, (ncols, tile_n)
    ntiles = ncols // tile_n
    piv = T[r_glob, j]
    u = T[:, j][:, None]                   # raw entering column
    prow = (T[r_glob, :] / piv)[None, :]   # normalized pivot row
    grid_spec = pl.GridSpec(
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # r
            pl.BlockSpec(memory_space=pltpu.SMEM),          # j
            pl.BlockSpec((nrows, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),           # u
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),           # prow tile
            pl.BlockSpec((nrows, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),           # T tile
        ],
        out_specs=[
            pl.BlockSpec((nrows, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),           # T_new tile
            pl.BlockSpec((1,), lambda i: (i,),
                         memory_space=pltpu.SMEM),           # cmin per tile
            pl.BlockSpec((1,), lambda i: (i,),
                         memory_space=pltpu.SMEM),           # carg per tile
        ],
    )
    T_new, cmins, cargs = pl.pallas_call(
        _pivot_kernel,
        grid_spec=grid_spec,
        # CPU (tests / fake-cluster) only supports the interpreter
        interpret=jax.default_backend() == "cpu",
        out_shape=[
            jax.ShapeDtypeStruct((nrows, ncols), T.dtype),
            jax.ShapeDtypeStruct((ntiles,), T.dtype),
            jax.ShapeDtypeStruct((ntiles,), jnp.int32),
        ],
    )(
        jnp.asarray([r_glob], jnp.int32),
        jnp.asarray([j], jnp.int32),
        u,
        prow,
        T,
    )
    return T_new, cmins, cargs


def fused_pivot_update(T, r_glob, j, tile_n: int = 512):
    """Pivot update + next Dantzig candidate: ``(T_new, j_next, cmin)``."""
    T_new, cmins, cargs = pallas_pivot_update(T, r_glob, j, tile_n=tile_n)
    k = jnp.argmin(cmins)
    return T_new, cargs[k], cmins[k]
