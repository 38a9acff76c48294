"""Branch-and-bound MILP solver over batched LP relaxations.

The reference *promised* MILP ("(mixed) integer linear programs", README.md:2)
but only implemented the bound-tightening primitive (``LinVar``,
linprog.py:311-381, SURVEY.md §2.6). This module supplies the missing layer,
designed TPU-first:

* The root problem is lowered ONCE with ``integer_bound_rows=True``
  (``tpulp.model.lower``): every integer variable owns a dedicated <=-row and
  >=-row, so a B&B node differs from the root ONLY in the RHS vector ``b``.
  Every node therefore shares one static tableau shape — a frontier wave of
  nodes is ONE batched (vmapped) device solve, which is what makes B&B
  throughput scale with chip batch capacity (BASELINE.json config 4).
* Host side keeps a best-first frontier (priority queue on the parent LP
  bound) and applies LinVar-style integral bound tightening when branching
  (floor/ceil, the device-facing analogue of linprog.py:338-352).
* The per-wave integrality check runs ON DEVICE: one vmapped call recovers
  each lane's original integer-variable values from (basis, b) and reduces
  them to (max fractional distance, most-fractional variable) — the host
  never loops over variables per node.
* Refinement precision is laddered (``refine='auto'``): nodes are bounded
  with EXACT rational objectives at small m (incumbent comparisons and
  pruning are then exact), and with f64 refinement above ``exact_max_m`` —
  where pruning uses a safety margin and every INCUMBENT candidate is still
  verified by an exact basis solve, so the reported optimum is exact in both
  modes; only the pruning margin is precision-limited at large m.
"""

from __future__ import annotations

import dataclasses
import functools
import heapq
import itertools
import math
from fractions import Fraction
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SolverOptions
from ..model.lower import StandardForm, lower_to_standard_form
from ..model.prog import LinProg
from ..solve.api import Solution, solve_standard_form
from ..solve.refine import exact_basis_solve
from ..batch.vmap_driver import (
    extract_batch_solutions,
    make_batched_states,
    run_simplex_batch,
)

__all__ = ["solve_milp", "BnbStats"]


@dataclasses.dataclass
class BnbStats:
    nodes_solved: int = 0
    waves: int = 0
    nodes_pruned_bound: int = 0
    nodes_pruned_infeasible: int = 0
    incumbent_updates: int = 0
    solo_resolves: int = 0  # numerical_error / iteration_limit lanes re-run
    warm_nodes: int = 0     # nodes solved by dual-simplex warm start
    warm_pivots: int = 0    # total pivots across warm-started nodes


Bounds = Dict[str, Tuple[Fraction, Fraction]]


def _node_standard_form(root_sf: StandardForm, bounds: Bounds) -> StandardForm:
    """The node's StandardForm: the root with only ``b`` rewritten."""
    b = list(root_sf.b)
    for name, (lb, ub) in bounds.items():
        le_row, ge_row = root_sf.int_bound_rows[name]
        shift = root_sf.int_shift[name]
        b[le_row] = ub - shift
        b[ge_row] = lb - shift
    return dataclasses.replace(root_sf, b=b)


def _most_fractional(values: Dict[str, Fraction]) -> Optional[str]:
    """Branching rule: the integer var whose value is farthest from integral."""
    best, best_frac = None, Fraction(0)
    for name, val in values.items():
        frac = val - Fraction(math.floor(val))
        dist = min(frac, 1 - frac)
        if dist > best_frac:
            best, best_frac = name, dist
    return best


@jax.jit
def _refresh_template(template, b_mat, art_row_mask):
    """Rewrite a device-resident batched template with per-lane RHS vectors.

    B&B nodes share the root's ENTIRE tableau except the b column (and the
    phase-1 objective corner, which is -sum of b over artificial rows) — so
    a wave upload is the (B, m) b matrix (~KBs) instead of the full batched
    state (~MBs, which over the tunneled TPU dominated wave time)."""
    T = template.T.at[:, 2:, -1].set(b_mat)
    z1 = -(b_mat * art_row_mask[None, :]).sum(axis=1)
    T = T.at[:, 1, -1].set(z1)
    return template._replace(T=T)


@jax.jit
def _wave_int_check(T, basis, R, const):
    """Device integrality check, one vmapped pass over the wave.

    Per lane: scatter the basic values (the RHS column) into a column-value
    vector, map to original integer-variable values (``R @ x + const``, the
    dense form of StandardForm.recover restricted to the branchable vars),
    and reduce to the max distance-to-integer and its argmax (the
    most-fractional branching variable)."""
    def one(T1, basis1):
        x = jnp.zeros((T1.shape[1] - 1,), T1.dtype)
        x = x.at[basis1].set(T1[2:, -1])
        vals = R @ x + const
        dist = jnp.abs(vals - jnp.round(vals))
        return jnp.max(dist), jnp.argmax(dist)

    return jax.vmap(one)(T, basis)


def _int_recover_matrix(sf: StandardForm, names: List[str], n_batched: int,
                        np_dtype) -> Tuple[np.ndarray, np.ndarray]:
    """(R, const): dense recover map for the branchable integer vars, padded
    to the batched column width."""
    R = np.zeros((len(names), n_batched), dtype=np_dtype)
    const = np.zeros((len(names),), dtype=np_dtype)
    for i, name in enumerate(names):
        terms, c = sf.recover[name]
        const[i] = float(c)
        for col, coeff in terms:
            R[i, col] = float(coeff)
    return R, const


def solve_milp(
    prog: Union[LinProg, StandardForm],
    options: Optional[SolverOptions] = None,
    dtype=jnp.float64,
    batch_size: int = 64,
    max_nodes: int = 100_000,
    refine: str = "auto",
    exact_max_m: int = 32,
    int_tol: float = 1e-6,
    return_stats: bool = False,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
    resume_from: Optional[str] = None,
    **opt_overrides,
):
    """Solve a mixed-integer LinProg by branch-and-bound.

    ``checkpoint_path`` persists the frontier + incumbent after every
    ``checkpoint_every`` waves (exact 'p/q' JSON, tpulp.io.checkpoint);
    ``resume_from`` restarts from such a file — the device analogue of the
    reference's load-then-construct resume (SURVEY §5 checkpoint/resume).

    Returns a Solution (status optimal / infeasible / unbounded / node_limit)
    in the original sense/variables; with ``return_stats=True`` returns
    ``(Solution, BnbStats)``.

    ``refine``: 'exact' refines every node's objective in rationals (O(m^3)
    rational Gauss per node — measured ~0.1 s/node at m=57, i.e. it walls at
    modest m); 'float64' bounds nodes in f64 with a pruning safety margin;
    'auto' picks exact for ``m <= exact_max_m`` else float64 (measured 19x
    total speedup on a 28-var knapsack). Incumbents are ALWAYS verified by
    an exact basis solve, so the reported optimum is exact in every mode.
    """
    if options is None:
        options = SolverOptions.for_dtype(dtype)
    if opt_overrides:
        options = dataclasses.replace(options, **opt_overrides)
    if isinstance(prog, StandardForm):
        raise TypeError("solve_milp needs the LinProg (it re-bounds integer "
                        "variables); pass the program, not a StandardForm")

    int_vars = {name: v for name, v in prog.vars.items() if v.isint}
    stats = BnbStats()
    if not int_vars:
        from ..solve.api import solve_lp

        sol = solve_lp(prog, options=options, dtype=dtype, refine="exact")
        return (sol, stats) if return_stats else sol

    root_sf = lower_to_standard_form(prog, integer_bound_rows=True)
    if root_sf.trivially_infeasible:
        sol = Solution(status="infeasible")
        return (sol, stats) if return_stats else sol

    if refine == "auto":
        refine = "exact" if root_sf.m <= exact_max_m else "float64"
    if refine not in ("exact", "float64"):
        raise ValueError(f"unknown refine mode {refine!r}")
    exact_mode = refine == "exact"

    root_bounds: Bounds = {}
    for name, v in int_vars.items():
        if name not in root_sf.int_bound_rows:
            continue  # fixed var: nothing to branch on
        root_bounds[name] = (v.lb, v.ub)
    branch_names = list(root_bounds)

    # frontier: (parent LP bound as float, tiebreak, exact bound, bounds
    # dict, parent terminal basis in BATCHED column space or None). A node
    # with a parent basis is re-optimized by the device dual simplex from
    # that basis (nodes differ from the parent only in b, so the basis is
    # dual feasible — tpulp.solve.dual); None means a cold two-phase solve.
    counter = itertools.count()
    frontier: List[Tuple[float, int, Fraction, Bounds, Optional[np.ndarray]]] = []
    incumbent: Optional[Solution] = None
    incumbent_z: Optional[Fraction] = None  # minimization value, EXACT

    if resume_from is not None:
        from ..io.checkpoint import load_bnb_frontier

        loaded, incumbent_z, ck_meta = load_bnb_frontier(resume_from)
        counter = itertools.count(
            start=1 + max((tb for _, tb, _, _ in loaded), default=0))
        for bound, tb, bounds, pbasis in loaded:
            heapq.heappush(frontier, (float(bound), tb, bound, bounds,
                                      pbasis))
        inc = ck_meta.get("incumbent")
        if inc is not None:
            incumbent = Solution(
                status="optimal",
                objective=Fraction(inc["objective"]),
                x={k: Fraction(v) for k, v in inc["x"].items()},
                objective_min=Fraction(inc["objective_min"]))
    else:
        heapq.heappush(
            frontier,
            (-1e18, next(counter), Fraction(-10**18), root_bounds, None))

    def _checkpoint():
        from ..io.checkpoint import save_bnb_frontier

        meta = {"nodes_solved": stats.nodes_solved}
        if incumbent is not None:
            meta["incumbent"] = {
                "objective": str(Fraction(incumbent.objective)),
                "objective_min": str(Fraction(incumbent.objective_min)),
                "x": {k: str(Fraction(v)) for k, v in incumbent.x.items()},
            }
        save_bnb_frontier(
            checkpoint_path,
            [(bound, tb, bounds, pbasis)
             for _, tb, bound, bounds, pbasis in frontier],
            incumbent_z, meta=meta)
    root_unbounded = False
    R = const = None  # device recover map, built once shapes are known
    template = art_row_mask = None  # device-resident batched wave template
    warm_frame = None  # (A_aug, c_full, col_active, art_cols) of the root
    art_start_batched = None  # first artificial column in batched space
    art_cols_host = None  # cached host copy (identical every wave)

    def _to_batched_basis(basis, sf_n: int) -> np.ndarray:
        """sf-space basis (artificials at sf.n+k) -> batched column space."""
        out = np.empty(len(basis), np.int32)
        for i, j in enumerate(basis):
            j = int(j)
            out[i] = j if j < sf_n else art_start_batched + (j - sf_n)
        return out

    def prune_margin() -> float:
        """Safety margin for float-mode pruning: only prune when the f64
        bound certifies the node cannot beat the incumbent."""
        if exact_mode or incumbent_z is None:
            return 0.0
        return 1e-7 * (1.0 + abs(float(incumbent_z)))

    def cannot_improve(bound) -> bool:
        if incumbent_z is None:
            return False
        if exact_mode:
            return bound >= incumbent_z
        return float(bound) >= float(incumbent_z) + prune_margin()

    def exact_incumbent_check(node_sf: StandardForm, basis
                              ) -> Tuple[Optional[Solution], Dict[str, Fraction]]:
        """Exact verification of a candidate incumbent basis: returns
        (Solution, {}) if truly integral, else (None, exact int values)."""
        col_values, z_min = exact_basis_solve(node_sf, basis)
        xc = [col_values.get(j, Fraction(0)) for j in range(node_sf.n)]
        x = node_sf.recover_solution(xc)
        fractional = {name: x[name] for name in branch_names
                      if Fraction(x[name]).denominator != 1}
        if fractional:
            return None, {name: Fraction(x[name]) for name in branch_names}
        obj = node_sf.objective_value(xc)
        return Solution(status="optimal", objective=obj, x=x,
                        objective_min=z_min,
                        col_values=dict(col_values), basis=list(basis)), {}

    while frontier and stats.nodes_solved < max_nodes:
        wave: List[Tuple[Fraction, Bounds, Optional[np.ndarray]]] = []
        while frontier and len(wave) < batch_size:
            _, _, bound, bounds, pbasis = heapq.heappop(frontier)
            # prune by parent bound against current incumbent
            if cannot_improve(bound):
                stats.nodes_pruned_bound += 1
                continue
            wave.append((bound, bounds, pbasis))
        if not wave:
            break

        sfs = [_node_standard_form(root_sf, bounds) for _, bounds, _ in wave]
        # device-resident template: nodes differ from the root ONLY in b, so
        # a wave uploads just the (B, m) RHS matrix and a jitted refresh
        # rewrites the batched state in place on device
        if template is None:
            template = make_batched_states([sfs[0]] * batch_size, dtype=dtype)
            art_row_mask = jnp.asarray(
                np.array([1.0 if h < 0 else 0.0
                          for h in root_sf.basis_hint]), template.T.dtype)
            # root warm-start frame: constraint block INCLUDING artificial
            # unit columns + phase-2 masks (tpulp.solve.dual reconstruction)
            art0 = template.art_cols[0]
            warm_frame = (
                template.T[0, 2:, :-1],            # A_aug (m, n_batched)
                template.T[0, 0, :-1],             # c_full
                template.col_active[0] & ~art0,    # phase-2 active columns
                art0,
            )
            art_np = np.asarray(art0)
            art_start_batched = int(art_np.argmax()) if art_np.any() \
                else art_np.shape[0]
        n_wave = len(wave)
        m_rows = root_sf.m
        b_all = np.empty((n_wave, m_rows), dtype=np.float64)
        for k, sf in enumerate(sfs):
            b_all[k] = [float(v) for v in sf.b]
        cold_idx = [k for k in range(n_wave) if wave[k][2] is None]
        warm_idx = [k for k in range(n_wave) if wave[k][2] is not None]

        outs = []  # (wave indices, terminal batched SimplexState)
        if cold_idx:
            b_mat = np.empty((batch_size, m_rows), dtype=np.float64)
            b_mat[:len(cold_idx)] = b_all[cold_idx]
            b_mat[len(cold_idx):] = b_all[cold_idx[0]]
            batched = _refresh_template(
                template, jnp.asarray(b_mat, dtype=template.T.dtype),
                art_row_mask)
            outs.append((cold_idx, run_simplex_batch(batched, options)))
        if warm_idx:
            from ..solve.dual import run_warm_batch

            basis_mat = np.empty((batch_size, m_rows), dtype=np.int32)
            bw = np.empty((batch_size, m_rows), dtype=np.float64)
            for lane, k in enumerate(warm_idx):
                basis_mat[lane] = wave[k][2]
                bw[lane] = b_all[k]
            basis_mat[len(warm_idx):] = basis_mat[0]
            bw[len(warm_idx):] = bw[0]
            wout = run_warm_batch(
                *warm_frame, basis_mat,
                jnp.asarray(bw, dtype=template.T.dtype), options)
            outs.append((warm_idx, wout))
            stats.warm_nodes += len(warm_idx)
            stats.warm_pivots += int(
                np.asarray(wout.niter)[:len(warm_idx)].sum())
        stats.nodes_solved += n_wave
        stats.waves += 1

        # ---- merge sub-wave results + device integrality check ------------
        sols: List[Optional[Solution]] = [None] * n_wave
        maxdist = np.zeros(n_wave) if branch_names else None
        argmax = np.zeros(n_wave, dtype=np.int64) if branch_names else None
        bases_raw: List[Optional[np.ndarray]] = [None] * n_wave
        for idxs, out in outs:
            # queue the integrality check, then ONE bundled device read for
            # everything the host loop needs (each separate np.asarray costs
            # a full tunnel roundtrip; this was the dominant wave cost once
            # warm starts shrank the solve itself)
            if branch_names:
                if R is None:
                    np_dtype = np.dtype(str(out.T.dtype))
                    R, const = _int_recover_matrix(
                        root_sf, branch_names, out.T.shape[2] - 1, np_dtype)
                md_d, am_d = _wave_int_check(
                    out.T, out.basis, jnp.asarray(R), jnp.asarray(const))
            else:
                md_d = am_d = out.niter
            if art_cols_host is None:
                art_cols_host = np.asarray(template.art_cols)
            statuses, niters, braw, corners, md, am = jax.device_get(
                (out.status, out.niter, out.basis, out.T[:, 0, -1],
                 md_d, am_d))
            sub = extract_batch_solutions(
                [sfs[i] for i in idxs], out, refine,
                prefetched=(statuses, niters, braw, corners,
                            art_cols_host))
            for lane, i in enumerate(idxs):
                sols[i] = sub[lane]
                if branch_names:
                    maxdist[i] = md[lane]
                    argmax[i] = am[lane]
                bases_raw[i] = braw[lane].copy()

        for k, ((parent_bound, bounds, _), sol) in enumerate(zip(wave, sols)):
            if sol.status in ("numerical_error", "iteration_limit"):
                # a failed lane must not be silently dropped (it may hold the
                # optimum): re-solve solo through the full precision ladder
                stats.solo_resolves += 1
                sol = solve_standard_form(
                    sfs[k], options=options, dtype=dtype, refine="exact")
                if sol.status == "optimal" and sol.basis is not None:
                    # replace the failed lane's artifacts with the solo
                    # solve's: children warm-start from the good basis, and
                    # integrality comes from the exact x values
                    bases_raw[k] = _to_batched_basis(sol.basis, sfs[k].n)
                    if branch_names:
                        dists = [
                            abs(v - round(v))
                            for v in (float(sol.x[nm])
                                      for nm in branch_names)]
                        maxdist[k] = max(dists)
                        argmax[k] = int(np.argmax(dists))
            if sol.status == "infeasible":
                stats.nodes_pruned_infeasible += 1
                continue
            if sol.status == "unbounded":
                # with integer bound rows, unboundedness comes from the
                # continuous part: the MILP is unbounded if any node is
                root_unbounded = True
                frontier.clear()
                break
            if sol.status != "optimal":
                continue
            z = sol.objective_min  # exact Fraction iff exact_mode
            if cannot_improve(z):
                stats.nodes_pruned_bound += 1
                continue

            looks_integral = (
                not branch_names or float(maxdist[k]) <= int_tol)
            if looks_integral:
                # candidate incumbent: ALWAYS verify exactly (float iterates
                # within int_tol of integers can still be exactly fractional)
                try:
                    verified, exact_vals = exact_incumbent_check(
                        sfs[k], sol.basis)
                except (ZeroDivisionError, np.linalg.LinAlgError):
                    stats.solo_resolves += 1
                    sol2 = solve_standard_form(
                        sfs[k], options=options, dtype=dtype, refine="exact")
                    if sol2.status != "optimal":
                        continue
                    verified, exact_vals = exact_incumbent_check(
                        sfs[k], sol2.basis)
                if verified is not None:
                    z_exact = verified.objective_min
                    if incumbent_z is None or z_exact < incumbent_z:
                        incumbent = dataclasses.replace(
                            verified, niter=sol.niter)
                        incumbent_z = z_exact
                        stats.incumbent_updates += 1
                    continue
                # exactly fractional after all: branch on the exact values
                frac_name = _most_fractional(
                    {n: v for n, v in exact_vals.items()
                     if v.denominator != 1})
                val = exact_vals[frac_name]
            else:
                frac_name = branch_names[int(argmax[k])]
                val = Fraction(sol.x[frac_name]) if exact_mode else \
                    Fraction(float(sol.x[frac_name])).limit_denominator(10**9)

            # branch: children inherit this node's terminal basis for the
            # dual-simplex warm start (they differ from it only in b)
            lb, ub = bounds[frac_name]
            lo = Fraction(math.floor(val))
            hi = lo + 1
            zf = float(z)
            for child_lb, child_ub in (((lb, lo)), ((hi, ub))):
                if child_lb > child_ub:
                    continue
                child = dict(bounds)
                child[frac_name] = (child_lb, child_ub)
                heapq.heappush(
                    frontier,
                    (zf, next(counter),
                     z if exact_mode else Fraction(zf).limit_denominator(10**12),
                     child, bases_raw[k]))

        if checkpoint_path is not None and \
                stats.waves % max(checkpoint_every, 1) == 0:
            _checkpoint()

    if root_unbounded:
        sol = Solution(status="unbounded")
    elif incumbent is not None:
        # a nonempty frontier means we stopped on max_nodes: the incumbent
        # is feasible but not proven optimal
        status = "node_limit" if frontier else "optimal"
        sol = dataclasses.replace(incumbent, status=status)
    elif stats.nodes_solved >= max_nodes:
        sol = Solution(status="node_limit")
    else:
        sol = Solution(status="infeasible")
    return (sol, stats) if return_stats else sol
