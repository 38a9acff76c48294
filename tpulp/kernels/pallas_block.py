"""Pallas kernel: the ENTIRE rank-K inner pivot loop on-chip.

The jnp blocked driver (tpulp.solve.blocked) re-reads the eta factors U
(K x M) and V (K x N) from HBM on every pivot (~6MB/pivot at K=128) and pays
XLA op-dispatch overhead for ~15 small ops per pivot. This kernel runs all K
pivots of a block in ONE Pallas program:

* U and V live in VMEM for the whole block (6.3MB at K=128 / 4096x8192 f32),
* per pivot the only HBM traffic is two 8-row window DMAs: one window of the
  transposed tableau Tt containing the entering COLUMN of T, and one window
  of T containing the pivot row (~400KB total; Mosaic requires dynamic HBM
  slices to be 8-row tile aligned, so single rows cannot be DMA'd directly),
* pricing, ratio test, eta construction, and the running objective/RHS
  vector updates are VPU ops over VMEM-resident data.

The caller (tpulp.solve.blocked_pallas) zero-pads T to 8-aligned shape
(M8, N8) so every aligned window stays in bounds, maintains T and its
transpose Tt in HBM, and flushes ``T += U^T V`` / ``Tt += V^T U`` once per
block with two MXU matmuls. Padding invariants: pad rows/cols of T are zero
and stay zero (etas are zero there), the col-active mask is zero at the RHS
column and all pads, so padded entries never win pricing or the ratio test.

Decision logic replicates tpulp.solve.blocked._blocked_pivot EXACTLY
(Dantzig/Bland pricing, first-index tie-breaking via min-of-masked-iota,
basic-index Bland row rule, stall detection, in-block phase transition and
artificial cleanup) so the Pallas and jnp paths walk identical pivot
sequences — pinned by tests in interpret mode.

Scalar state is packed into two small vectors:
  iscal: [phase, status, niter, stuck, bland, t, 0, 0]        (int32, SMEM)
  fscal: [last_z, 0]                                          (dtype,  SMEM)

Round-5 profile-driven optimizations (real Mosaic trace, decoded by
tools/xplane.py; breakdown in BENCH.md):
* eta-column selects (``V[:, j]``, ``U[:, rg]``) go through ONE 128-lane
  dynamic window instead of a full (K, N8)/(K, M8) onehot pass — the
  onehots were ~1/3 of in-kernel VPU time at K=256;
* the block flush is ``fused_flush``: one tiled Pallas pass computes
  ``T + U^T V`` on the MXU and writes BOTH the result and its bit-exact
  transpose, replacing the two full-tableau layout copies that ``T.T``
  lowered to (~24% of wall time).
K is VMEM-bound at 256 for the 4096x8192 baseline shape: U+V =
K*(M8+N8)*4B must fit the 16 MB scoped-VMEM stack limit (K=384 fails to
compile with a scoped-vmem OOM — measured, not estimated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.state import RULE_BLAND, RULE_DEVEX, SolverOptions, Status

__all__ = ["blocked_inner_block"]

BIG_I = 2**30  # python int: jnp constants captured by kernels are rejected
ROWW = 8       # HBM window height = the sublane tile size
DEVEX_RESET = 1e8  # re-anchor the reference framework past this weight


def _first_true_index(mask_2d, n, big=BIG_I):
    """Smallest index with mask true, else >= n (mask shape (1, n))."""
    ids = lax.broadcasted_iota(jnp.int32, mask_2d.shape, 1)
    return jnp.min(jnp.where(mask_2d, ids, big))


def _argmin_first(vals_2d):
    """First index achieving the minimum of a (1, n) vector."""
    v = jnp.min(vals_2d)
    return _first_true_index(vals_2d <= v, vals_2d.shape[1]), v


def _select_row(win, off, dtype):
    """Pick row ``off`` of an (8, n) window as a (1, n) vector."""
    oh = (lax.broadcasted_iota(jnp.int32, win.shape, 0) == off).astype(dtype)
    return jnp.sum(win * oh, axis=0, keepdims=True)


def _make_kernel(opts: SolverOptions, stall_limit: int, K: int, M8: int,
                 N8: int, Nr: int, m: int, dtype):
    """M8/N8: padded tableau shape; Nr: real column count (RHS at Nr-1);
    m: real constraint-row count (rows 2..m+1 of T are constraints)."""
    inf = float("inf")  # python float: avoids captured-constant rejection
    use_bland_static = opts.rule == RULE_BLAND
    use_devex_static = opts.rule == RULE_DEVEX
    m8 = M8 - 2

    def kernel(T_hbm, Tt_hbm,
               row0_in, row1_in, bvec_in, ca_in, ac_in, basis_in, ab_in,
               gamma_in, iscal_in, fscal_in,
               U, V,
               row0, row1, bvec, ca, ac, basis, ab, gamma, iscal, fscal,
               colj_s, vrow_s, rowd_s, rowdv_s, sem_c, sem_r, sem_d):
        # Inputs are copied into the outputs up front and all further reads
        # and writes go through the output refs. (input_output_aliases is NOT
        # used: aliased SMEM outputs read garbage on the axon TPU backend —
        # verified empirically — so the copies are explicit; they are tiny
        # next to a K-pivot block.) U/V are fresh outputs that persist in
        # VMEM across the block.
        row0[...] = row0_in[...]
        row1[...] = row1_in[...]
        bvec[...] = bvec_in[...]
        ca[...] = ca_in[...]
        ac[...] = ac_in[...]
        basis[...] = basis_in[...]
        ab[...] = ab_in[...]
        gamma[...] = gamma_in[...]
        for _i in range(8):
            iscal[_i] = iscal_in[_i]
        for _i in range(2):
            fscal[_i] = fscal_in[_i]
        U[...] = jnp.zeros((K, M8), dtype)
        V[...] = jnp.zeros((K, N8), dtype)

        def body(_, carry):
            # scalar state lives in SMEM (iscal/fscal); once the solver
            # terminates, the whole iteration is skipped — no DMAs, no U/V
            # traffic for the rest of the block.
            running = iscal[1] == Status.RUNNING

            @pl.when(running)
            def _():
                phase = iscal[0]
                stuck = iscal[3]
                bland = iscal[4]
                t = iscal[5]
                last_z = fscal[0]
                in_phase2 = phase == 2

                # ---- cleanup scan (basic artificials, maintained mask) ----
                ab_v = ab[...]                     # (1, m8) int32; pads 0
                any_art = jnp.max(ab_v) > 0
                cleanup = any_art & in_phase2
                r_d = _first_true_index(ab_v > 0, m8)
                r_d = jnp.minimum(r_d, m - 1)
                rg_d = r_d + 2
                base_d = (rg_d // ROWW) * ROWW

                # reconstruct the cleanup row only when needed (its full U/V
                # pass is ~1/3 of per-pivot VMEM traffic); DMA overlaps the
                # eta-correction compute
                @pl.when(cleanup)
                def _():
                    cp = pltpu.make_async_copy(
                        T_hbm.at[pl.ds(base_d, ROWW), :], rowd_s, sem_d)
                    cp.start()
                    # r5 window select (see the entering-column comment):
                    # one 128-lane window of U instead of a (K, M8) onehot
                    rd128 = pl.multiple_of((rg_d // 128) * 128, 128)
                    Uw = U[:, pl.ds(rd128, 128)]
                    onehot_rd = (lax.broadcasted_iota(jnp.int32, (K, 128), 1)
                                 == rg_d - rd128).astype(dtype)
                    u_rd = jnp.sum(Uw * onehot_rd, axis=1, keepdims=True)
                    corr = jnp.sum(u_rd * V[...], axis=0, keepdims=True)
                    cp.wait()
                    rowdv_s[...] = _select_row(rowd_s[...], rg_d - base_d,
                                               dtype) + corr

                @pl.when(~cleanup)
                def _():
                    rowdv_s[...] = jnp.zeros((1, N8), dtype)

                row_d = rowdv_s[...]

                ca_v = ca[...] > 0                 # (1, N8); RHS+pads are 0
                ac_v = ac[...] > 0
                elig = ca_v & ~ac_v & (jnp.abs(row_d) > opts.piv_tol)
                j_d = _first_true_index(elig, N8)
                has_elig = j_d < BIG_I
                j_d = jnp.minimum(j_d, Nr - 2)
                retire = cleanup & ~has_elig

                # ---- pricing ----------------------------------------------
                crow = jnp.where(phase == 1, row1[...], row0[...])  # (1, N8)
                c_eff = jnp.where(ca_v, crow, inf)
                improving = c_eff < -opts.opt_tol
                has_improving = jnp.any(improving)
                use_bland = (bland > 0) | use_bland_static
                if use_devex_static:
                    # devex reference-framework pricing (mirrors
                    # solve.blocked RULE_DEVEX): argmax c^2 / gamma over
                    # improving columns, first index on ties like jnp.argmax
                    gamma_v = gamma[...]
                    score = jnp.where(improving, (crow * crow) / gamma_v,
                                      -inf)
                    j_dz = jnp.minimum(
                        _first_true_index(score >= jnp.max(score), N8),
                        Nr - 2)
                else:
                    j_dz, _cmin = _argmin_first(c_eff)
                j_bl = jnp.minimum(_first_true_index(improving, N8), Nr - 2)
                j_price = jnp.where(use_bland, j_bl, j_dz)

                # ---- phase bookkeeping ------------------------------------
                z1 = -row1[0, Nr - 1]
                phase1_done = (phase == 1) & ~has_improving
                became_infeasible = phase1_done & (z1 > opts.infeas_tol)
                to_phase2 = phase1_done & ~became_infeasible
                pricing_pivot = has_improving & ~cleanup & ~phase1_done

                # ---- entering column: window DMA of Tt, overlapped with the
                # eta-correction compute (both only need U/V) ----------------
                j = jnp.where(cleanup, j_d, j_price)
                base_j = (j // ROWW) * ROWW
                cp = pltpu.make_async_copy(Tt_hbm.at[pl.ds(base_j, ROWW), :],
                                           colj_s, sem_c)
                cp.start()
                # r5 profiling fix (BENCH.md trace breakdown): selecting
                # V[:, j] through a full (K, N8) onehot was ~1/3 of the
                # kernel's VPU time at K=256 — the iota/compare/multiply/
                # reduce pass touches every eta element. The caller pads
                # both tableau dims to multiples of 128, so a 128-aligned
                # dynamic LANE window is always legal: slice the single
                # (K, 128) window containing column j and reduce only that
                # (64x fewer elements; same first-index semantics).
                j128 = pl.multiple_of((j // 128) * 128, 128)
                Vw = V[:, pl.ds(j128, 128)]
                onehot_j = (lax.broadcasted_iota(jnp.int32, (K, 128), 1)
                            == j - j128).astype(dtype)
                v_j = jnp.sum(Vw * onehot_j, axis=1,
                              keepdims=True)       # (K, 1)
                corr_c = jnp.sum(v_j * U[...], axis=0,
                                 keepdims=True)    # (1, M8)
                cp.wait()
                colj = _select_row(colj_s[...], j - base_j, dtype) + corr_c

                # ---- ratio test --------------------------------------------
                col = colj[:, 2:]                  # (1, m8); pads are 0
                b = bvec[:, 2:]
                pos = col > opts.piv_tol
                has_ratio = jnp.any(pos)
                ratios = jnp.where(pos, b / jnp.where(pos, col, 1.0), inf)
                min_ratio = jnp.min(ratios)
                tie = ratios <= min_ratio
                r_first = _first_true_index(tie, m8)
                basis_v = basis[...]               # (1, m8); pads BIG
                r_bland_key = jnp.where(tie, basis_v, BIG_I)
                bmin = jnp.min(r_bland_key)
                r_bland = _first_true_index(r_bland_key <= bmin, m8)
                r_price = jnp.where(use_bland, r_bland, r_first)
                r_price = jnp.minimum(r_price, m - 1)

                became_unbounded = pricing_pivot & ~has_ratio & in_phase2
                became_failed1 = pricing_pivot & ~has_ratio & ~in_phase2

                # ---- the eta pivot -----------------------------------------
                do_cleanup = cleanup & has_elig
                do_pricing = pricing_pivot & has_ratio
                act = do_cleanup | do_pricing
                actf = act.astype(dtype)
                r = jnp.where(do_cleanup, r_d, r_price)
                rg = r + 2
                onehot_rg_M = (lax.broadcasted_iota(jnp.int32, (1, M8), 1)
                               == rg)
                piv = jnp.sum(jnp.where(onehot_rg_M, colj, 0.0))
                safe_piv = jnp.where(act, piv, 1.0)
                w = (onehot_rg_M.astype(dtype) - colj) / safe_piv * actf

                # pivot row: window DMA of T, again overlapped with the
                # eta-correction compute
                base_rg = (rg // ROWW) * ROWW
                cp2 = pltpu.make_async_copy(
                    T_hbm.at[pl.ds(base_rg, ROWW), :], vrow_s, sem_r)
                cp2.start()
                # same r5 window select as the entering column: one
                # (K, 128) window of U instead of a (K, M8) onehot pass
                rg128 = pl.multiple_of((rg // 128) * 128, 128)
                Uw2 = U[:, pl.ds(rg128, 128)]
                onehot_rg_KM = (lax.broadcasted_iota(jnp.int32, (K, 128), 1)
                                == rg - rg128)
                u_rg = jnp.sum(Uw2 * onehot_rg_KM.astype(dtype), axis=1,
                               keepdims=True)      # (K, 1)
                corr_r = jnp.sum(u_rg * V[...], axis=0, keepdims=True)
                cp2.wait()
                vrow_price = _select_row(vrow_s[...], rg - base_rg,
                                         dtype) + corr_r
                vrow = jnp.where(do_cleanup, row_d, vrow_price) * actf

                # append eta pair at slot t (row writes)
                U[pl.ds(t, 1), :] = w
                V[pl.ds(t, 1), :] = vrow

                # ---- running vectors ---------------------------------------
                w0 = jnp.sum(jnp.where(
                    lax.broadcasted_iota(jnp.int32, (1, M8), 1) == 0, w, 0.0))
                w1 = jnp.sum(jnp.where(
                    lax.broadcasted_iota(jnp.int32, (1, M8), 1) == 1, w, 0.0))
                row0[...] = row0[...] + w0 * vrow
                row1[...] = row1[...] + w1 * vrow
                v_last = jnp.sum(jnp.where(
                    lax.broadcasted_iota(jnp.int32, (1, N8), 1) == Nr - 1,
                    vrow, 0.0))
                bvec[...] = bvec[...] + w.reshape(1, M8) * v_last

                # basis / artificial-basic maintenance (only when acting)
                is_r_row = (lax.broadcasted_iota(jnp.int32, (1, m8), 1) == r)
                basis[...] = jnp.where(act & is_r_row, j, basis_v)
                onehot_jn = (lax.broadcasted_iota(jnp.int32, (1, N8), 1) == j)
                j_is_art = jnp.any(onehot_jn & ac_v)
                ab[...] = jnp.where(act & is_r_row,
                                    j_is_art.astype(jnp.int32), ab_v)
                # retire a dependent row's artificial flag + mask its column
                @pl.when(retire)
                def _():
                    is_rd_row = (lax.broadcasted_iota(jnp.int32, (1, m8), 1)
                                 == r_d)
                    ab[...] = jnp.where(is_rd_row, 0, ab[...])

                # ---- devex weight update (mirrors solve.blocked) -----------
                if use_devex_static:
                    # post-pivot row r = vrow / piv; weights live on the real
                    # pricing columns only (RHS + pads masked so a spurious
                    # pad weight can never trigger a frame reset)
                    gamma_q = jnp.sum(jnp.where(onehot_jn, gamma_v, 0.0))
                    alpha = vrow / safe_piv
                    real_cols = (lax.broadcasted_iota(jnp.int32, (1, N8), 1)
                                 < Nr - 1)
                    cand = jnp.where(real_cols, (alpha * alpha) * gamma_q,
                                     0.0)
                    upd = do_pricing
                    g_new = jnp.where(upd, jnp.maximum(gamma_v, cand),
                                      gamma_v)
                    leaving = jnp.sum(jnp.where(
                        lax.broadcasted_iota(jnp.int32, (1, m8), 1) == r,
                        basis_v, 0))
                    onehot_leave = (
                        lax.broadcasted_iota(jnp.int32, (1, N8), 1)
                        == leaving)
                    leave_val = jnp.maximum(
                        gamma_q / (safe_piv * safe_piv), 1.0)
                    g_new = jnp.where(upd & onehot_leave, leave_val, g_new)
                    # re-anchor the frame on overflow or phase transition
                    reset = (jnp.max(g_new) > DEVEX_RESET) | to_phase2
                    gamma[...] = jnp.where(reset, jnp.ones_like(g_new),
                                           g_new)

                # ---- stall / Bland switch ----------------------------------
                z = jnp.where(phase == 1, -row1[0, Nr - 1], -row0[0, Nr - 1])
                improved = (last_z - z) > opts.degen_tol
                stuck = jnp.where(
                    do_pricing & act,
                    jnp.where(improved, 0, stuck + 1),
                    stuck).astype(jnp.int32)
                last_z = jnp.where(do_pricing & act, z, last_z)
                bland = (bland > 0) | (stuck >= stall_limit)

                # ---- phase transition + termination ------------------------
                phase = jnp.where(to_phase2, 2, phase).astype(jnp.int32)

                @pl.when(to_phase2)
                def _():
                    ca[...] = jnp.where(ac[...] > 0, 0, ca[...])

                stuck = jnp.where(to_phase2, 0, stuck)
                last_z = jnp.where(to_phase2, inf, last_z)

                finished_opt = in_phase2 & ~has_improving & ~cleanup
                # Non-finite guard (same contract as the jnp drivers): NaN in
                # the pricing row reads as "no improving column" -> bogus
                # OPTIMAL; report NUMERIC instead. Pads are zero / masked so
                # full-width sums are safe.
                finite_ok = (
                    jnp.isfinite(z)
                    & jnp.isfinite(jnp.sum(jnp.abs(bvec[...])))
                    & jnp.isfinite(jnp.sum(
                        jnp.where(ca_v, jnp.abs(crow), 0.0)))
                )
                status = jnp.where(
                    ~finite_ok,
                    jnp.int32(Status.NUMERIC),
                    jnp.where(
                        became_infeasible | became_failed1,
                        jnp.int32(Status.INFEASIBLE),
                        jnp.where(became_unbounded,
                                  jnp.int32(Status.UNBOUNDED),
                                  jnp.where(finished_opt,
                                            jnp.int32(Status.OPTIMAL),
                                            jnp.int32(Status.RUNNING)))))

                iscal[0] = phase
                iscal[1] = status
                iscal[2] = iscal[2] + act.astype(jnp.int32)
                iscal[3] = stuck
                iscal[4] = bland.astype(jnp.int32)
                iscal[5] = t + act.astype(jnp.int32)
                fscal[0] = last_z

            return carry

        lax.fori_loop(0, K, body, 0)

    return kernel


def _make_flush_kernel(TM: int, opt_tol: float, piv_tol: float):
    def _flush_kernel(T_in, U_in, V_in, ca_in, T_out, Tt_out, scan_out):
        """One (TM, TN) tile of the fused flush: ``Tn = T + U^T V`` written
        to T_out at (i, j) AND its EXACT transpose written to Tt_out at
        (j, i). Both outputs come from the same in-VMEM ``Tn`` value, so
        ``Tt == T^T`` bit-for-bit by construction — the consistency the
        walk depends on (see run_simplex_blocked_pallas: two separately-
        accumulated matmuls round differently and corrupt the walk).

        U arrives FULL (VMEM-resident across the whole grid — its
        BlockSpec index is invariant, so the pipeline loads it once; U is
        the SMALLER eta factor, K x M8) and is sliced per tile here; V's
        (K, TN) stripe is invariant along the inner grid axis, so each
        stripe loads once. This keeps the eta factors' HBM traffic at
        ~one read total instead of one read per tile (the first 2D-tiled
        attempt RE-READ a U/V stripe for every tile — ~550 MB/block of
        redundant traffic, measured slower than the XLA transpose it
        replaced)."""
        i = pl.program_id(1)
        U_sl = U_in[:, pl.ds(pl.multiple_of(i * TM, 128), TM)]
        D = lax.dot_general(
            U_sl, V_in[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=T_in.dtype,
            precision=lax.Precision.HIGHEST)
        Tn = T_in[...] + D
        T_out[...] = Tn
        Tt_out[...] = Tn.T
        # per-block RAY-SCAN inputs, fused into the flush (r5: the
        # standalone XLA scan re-read the whole tableau — 189 us/block).
        # scan_out (2, TN) per column stripe accumulates across row tiles:
        # row 0 = improving (active & negative reduced cost, from the tile
        # holding the objective rows), row 1 = has-positive-entry among
        # constraint rows. The caller reduces any(imp & ~blocked) outside
        # (a (1, N8) op). Constraint rows start at global row 2; tile i
        # holds rows [i*TM, (i+1)*TM), so only tile 0 masks its first two.
        rows = lax.broadcasted_iota(jnp.int32, Tn.shape, 0)
        crow_mask = (rows >= jnp.where(i == 0, 2, 0)).astype(jnp.int32)
        pos_any = jnp.max((Tn > piv_tol).astype(jnp.int32) * crow_mask,
                          axis=0)[None, :]

        @pl.when(i == 0)
        def _():
            imp = ((ca_in[...] > 0)
                   & (Tn[0:1, :] < -opt_tol)).astype(jnp.int32)
            scan_out[0:1, :] = imp
            scan_out[1:2, :] = pos_any

        @pl.when(i != 0)
        def _():
            scan_out[1:2, :] = jnp.maximum(scan_out[1:2, :], pos_any)

    return _flush_kernel


@functools.partial(jax.jit,
                   static_argnames=("opt_tol", "piv_tol", "interpret"))
def fused_flush(T, U, V, ca, opt_tol: float, piv_tol: float,
                interpret: bool = False):
    """Rank-K flush + exact-transpose maintenance + ray-scan inputs in ONE
    tiled pass: returns ``(Tn, Tn^T, scan)`` with ``Tn = T + U^T V`` and
    ``scan`` a (2, N8) int32 pair (improving-mask, has-positive-entry) the
    caller reduces to the per-block unboundedness certificate.

    r5 profiling motivation (BENCH.md trace breakdown): the XLA
    formulation (einsum flush, then ``T.T``) lowered to the matmul PLUS
    two full-tableau layout copies — 852 us/block of pure copy traffic at
    4096x8192/K=256, ~24% of wall time. Here each tile is read once,
    updated on the MXU, and written twice (natural + transposed
    coordinates); the transpose costs one extra tile WRITE instead of a
    separate read+write pass over the whole tableau."""
    M8, N8 = T.shape
    K = U.shape[0]
    dsize = T.dtype.itemsize

    # tile chooser: the largest (TM, TN) dividing the (128-padded) dims
    # whose working set — U resident in full, double-buffered V stripe and
    # three T/Tt tiles — fits the 16 MB scoped-VMEM stack with headroom.
    # Bigger tiles = fewer grid steps and better MXU shapes (128x128 tiles
    # measured ~2.6x slower than the XLA matmul they replaced).
    def _fits(tm, tn):
        vmem = (K * M8 + 2 * K * tn + 6 * tm * tn) * dsize
        return vmem < 14 * 2 ** 20

    TN = next((t for t in (640, 512, 384, 256, 128) if N8 % t == 0), 128)
    TM = next((t for t in (512, 384, 256, 128)
               if M8 % t == 0 and _fits(t, TN)), 128)
    # grid is (columns, rows) with ROWS innermost: the V stripe's index is
    # then invariant along the inner axis (loads once per stripe), U's is
    # fully invariant (loads once)
    grid = (N8 // TN, M8 // TM)
    return pl.pallas_call(
        _make_flush_kernel(TM, opt_tol, piv_tol),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TN), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, M8), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, TN), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TM), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, TN), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M8, N8), T.dtype),
            jax.ShapeDtypeStruct((N8, M8), T.dtype),
            jax.ShapeDtypeStruct((2, N8), jnp.int32),
        ],
        # donate T into the updated T: each (i, j) tile is read before it
        # is overwritten (same index map), and the in-place carry saves a
        # full-tableau copy per block (423 us/block measured in the trace)
        input_output_aliases={0: 0},
        interpret=interpret,
    )(T, U, V, ca)


@functools.partial(
    jax.jit,
    static_argnames=("opts", "stall_limit", "K", "n_real", "m_real",
                     "interpret"))
def blocked_inner_block(T, Tt, row0, row1, bvec, col_active, art_cols,
                        basis, art_basic, gamma, iscal, fscal,
                        opts: SolverOptions, stall_limit: int, K: int,
                        n_real: int, m_real: int,
                        interpret: bool = False):
    """Run K eta pivots in one Pallas program.

    Shapes (8-aligned padded; see tpulp.solve.blocked_pallas for the padding
    contract): T (M8, N8); Tt (N8, M8); row0/row1 (1, N8); bvec (1, M8);
    col_active/art_cols (1, N8) int32 (zero at the RHS column n_real-1 and
    all pads); basis/art_basic (1, M8-2) int32 (basis pads BIG, art pads 0);
    gamma (1, N8) dtype devex weights (ones when unused; only read/updated
    under RULE_DEVEX); iscal (8,) int32 [phase, status, niter, stuck, bland,
    t, -, -]; fscal (2,) dtype [last_z, -]. n_real/m_real are the logical
    column/row counts.

    Returns (U, V, row0, row1, bvec, col_active, art_cols, basis,
    art_basic, gamma, iscal, fscal) — max_iters is enforced by the caller
    between blocks (a block may overshoot by at most K pivots)."""
    M8, N8 = T.shape
    m8 = M8 - 2
    dtype = T.dtype
    kernel = _make_kernel(opts, stall_limit, K, M8, N8, n_real, m_real,
                          dtype)

    outs = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # T (HBM)
            pl.BlockSpec(memory_space=pl.ANY),      # Tt (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # row0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # row1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bvec
            pl.BlockSpec(memory_space=pltpu.VMEM),  # col_active
            pl.BlockSpec(memory_space=pltpu.VMEM),  # art_cols
            pl.BlockSpec(memory_space=pltpu.VMEM),  # basis
            pl.BlockSpec(memory_space=pltpu.VMEM),  # art_basic
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gamma
            pl.BlockSpec(memory_space=pltpu.SMEM),  # iscal
            pl.BlockSpec(memory_space=pltpu.SMEM),  # fscal
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # U
            pl.BlockSpec(memory_space=pltpu.VMEM),  # V
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gamma
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, M8), dtype),
            jax.ShapeDtypeStruct((K, N8), dtype),
            jax.ShapeDtypeStruct((1, N8), dtype),
            jax.ShapeDtypeStruct((1, N8), dtype),
            jax.ShapeDtypeStruct((1, M8), dtype),
            jax.ShapeDtypeStruct((1, N8), jnp.int32),
            jax.ShapeDtypeStruct((1, N8), jnp.int32),
            jax.ShapeDtypeStruct((1, m8), jnp.int32),
            jax.ShapeDtypeStruct((1, m8), jnp.int32),
            jax.ShapeDtypeStruct((1, N8), dtype),
            jax.ShapeDtypeStruct((8,), jnp.int32),
            jax.ShapeDtypeStruct((2,), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, M8), dtype),     # colj window (Tt rows)
            pltpu.VMEM((8, N8), dtype),     # pivot-row window (T rows)
            pltpu.VMEM((8, N8), dtype),     # cleanup-row window (T rows)
            pltpu.VMEM((1, N8), dtype),     # reconstructed cleanup row
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(T, Tt, row0, row1, bvec, col_active, art_cols, basis, art_basic,
      gamma, iscal, fscal)
    return outs
