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
import heapq
import itertools
import math
import time
from fractions import Fraction
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SolverOptions, Status
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

# hard ceiling on the warm-start state pool (slots of (m+2, n+1) parent
# frames in HBM); when the frontier outgrows the pool, overflow children
# simply solve cold — correctness never depends on a slot being available.
# Module-level so tests can shrink it to exercise the overflow path.
POOL_CAP_MAX = 2048

# enable the per-wave pool-invariant audit (VERDICT r3 weak #4: the
# deferred-write/slot-refcount protocol is aliasing-sensitive host
# bookkeeping; the audit turns a silent wrong-basis warm start into a loud
# assertion). Tests flip this on; it is O(pool_cap) python per wave.
POOL_DEBUG = False

# branch values above this magnitude are recomputed EXACTLY from the node's
# terminal basis before the floor/ceil split (VERDICT r3 weak #5:
# Fraction(float).limit_denominator can misplace the split for ill-scaled
# values; the child bounds re-check keeps correctness either way, but a
# misplaced split wastes whole subtrees)
EXACT_BRANCH_ABOVE = 2.0 ** 20


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
    pseudocost_updates: int = 0  # learned (var, direction) degradation obs
    # wall-time attribution per wave phase (seconds) — the observability
    # the r5 wave-engineering work runs on (VERDICT r4 item 5)
    t_assemble: float = 0.0  # frontier pop + node forms + upload packing
    t_device: float = 0.0    # device dispatch + blocking summary fetch
    t_process: float = 0.0   # summary unpack, branching, child push
    t_verify: float = 0.0    # exact incumbent verification
    # device-side generation chaining (round 5): generations expanded on
    # device without a host round trip, and the nodes they solved
    gen_waves: int = 0
    gen_nodes: int = 0


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


class _Pseudocosts:
    """Per-variable pseudocosts: average LP-bound degradation per unit of
    fractional distance, learned from solved children (VERDICT r3 item 8).
    Selection uses the product rule ``max(down_est, eps) * max(up_est,
    eps)``; unobserved directions fall back to the global average (the
    standard initialization), and with NO observations anywhere the rule
    degenerates to most-fractional."""

    EPS = 1e-6

    def __init__(self):
        self.up: Dict[str, Tuple[float, int]] = {}
        self.down: Dict[str, Tuple[float, int]] = {}
        self.updates = 0

    def record(self, name: str, direction: str, degradation: float,
               dist: float):
        if dist <= 0:
            return
        store = self.up if direction == "up" else self.down
        s, c = store.get(name, (0.0, 0))
        store[name] = (s + max(degradation, 0.0) / dist, c + 1)
        self.updates += 1

    def _avg(self, store, name):
        s, c = store.get(name, (0.0, 0))
        return (s / c) if c else None

    def _global_avg(self):
        tot, cnt = 0.0, 0
        for store in (self.up, self.down):
            for s, c in store.values():
                tot += s
                cnt += c
        return (tot / cnt) if cnt else None

    def select(self, values: Dict[str, Fraction]) -> Optional[str]:
        fallback = self._global_avg()
        if fallback is None:
            return _most_fractional(values)
        best, best_score = None, -1.0
        for name, val in values.items():
            f = float(val - Fraction(math.floor(val)))
            dist = min(f, 1 - f)
            if dist == 0:
                continue
            dn = self._avg(self.down, name)
            up = self._avg(self.up, name)
            dn = fallback if dn is None else dn
            up = fallback if up is None else up
            score = max(dn * f, self.EPS) * max(up * (1 - f), self.EPS)
            if score > best_score:
                best, best_score = name, score
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


# the per-wave device integrality check now lives inside the fused wave
# executables (tpulp.solve.dual._wave_summaries): status/niter/argmax/basis
# and corner/maxdist come back as two packed arrays, one bundled fetch


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
    time_limit: Optional[float] = None,
    gap_tol: float = 0.0,
    refine: str = "auto",
    exact_max_m: int = 32,
    int_tol: float = 1e-6,
    return_stats: bool = False,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
    resume_from: Optional[str] = None,
    presolve: bool = True,
    branching: str = "most_fractional",
    node_encoding: str = "rows",
    mesh=None,
    batch_axis: str = "batch",
    cols_axis: str = "cols",
    device_generations: int = 6,
    **opt_overrides,
):
    """Solve a mixed-integer LinProg by branch-and-bound.

    ``device_generations`` (round 5, VERDICT r4 item 5): when > 1, each
    host round trip expands up to this many B&B GENERATIONS on device —
    children are constructed (floor/ceil bound split as the warm path's
    sparse b-rewrite) and dual-simplex re-optimized without fetching
    results back, and the whole chain's summaries come home in ONE
    blocking read. Measured motivation: over the tunneled TPU a
    device->host fetch costs ~35-70 ms regardless of size, and the fetch
    chain was ~78% of MILP wall time (cProfile, BENCH.md r5). Exactness
    is unchanged: pruning inside a chain only ever uses the exact
    incumbent from the chain's start (never an unverified float one), and
    incumbent candidates are exact-verified on the host as always.
    Automatically disabled where its preconditions fail (exact refine
    mode, pseudocost branching, integer bounds beyond +-2^20); set to
    0/1 to disable explicitly. Mesh waves chain too — the expansion
    executable is plain batched jax ops, so GSPMD compiles it over the
    sharded template like every other wave executable.

    ``mesh`` (round 5, VERDICT r4 item 3) runs every B&B wave MULTI-CHIP:
    the batched node states (device template, cold/warm/resume waves) are
    sharded batch-outermost over ``batch_axis`` — SCALING.md §3.3's
    scalable cross-host dimension, since lanes are independent LPs with
    zero per-pivot cross-lane traffic — with optional per-lane column
    sharding over ``cols_axis`` when the mesh has one. ``batch_size`` must
    divide the batch-axis size. The scheduler, pool bookkeeping, pruning,
    and exact incumbent verification are unchanged — only the wave
    executables compile under GSPMD.

    ``checkpoint_path`` persists the frontier + incumbent after every
    ``checkpoint_every`` waves (exact 'p/q' JSON, tpulp.io.checkpoint);
    ``resume_from`` restarts from such a file — the device analogue of the
    reference's load-then-construct resume (SURVEY §5 checkpoint/resume).

    Returns a Solution (status optimal / infeasible / unbounded /
    node_limit / time_limit / gap_limit) in the original sense/variables;
    with ``return_stats=True`` returns ``(Solution, BnbStats)``.

    ``time_limit`` (seconds of wall clock, checked at wave boundaries —
    a single in-flight wave may overrun it) and ``gap_tol`` (stop once
    the PROVEN relative optimality gap between the exact incumbent and
    the best open node bound is <= this) are the standard production
    early-exit controls. Both return the incumbent with ``mip_gap`` set
    to the proven gap and a status that SAYS the solve stopped early
    ('time_limit' / 'gap_limit') — 'optimal' remains reserved for
    gap-zero proofs, unlike solvers that report OPTIMAL within MIPGap.

    ``refine``: 'exact' refines every node's objective in rationals (O(m^3)
    rational Gauss per node — measured ~0.1 s/node at m=57, i.e. it walls at
    modest m); 'float64' bounds nodes in f64 with a pruning safety margin;
    'auto' picks exact for ``m <= exact_max_m`` else float64 (measured 19x
    total speedup on a 28-var knapsack). Incumbents are ALWAYS verified by
    an exact basis solve, so the reported optimum is exact in every mode.

    ``branching``: 'most_fractional' (default) or 'pseudocost' — learned
    per-variable bound-degradation rates with the product selection rule.
    Pseudocost selection needs the node's full fractional-value vector,
    which only the exact-refinement path materializes; in float64 bounding
    mode the per-node device summary ships just the argmax-fractional
    variable (a bandwidth choice), so waves there keep most-fractional
    selection while pseudocost LEARNING still runs from node bounds.
    """
    _t_solve0 = time.perf_counter()

    def _time_left():
        """Remaining wall budget to pass into recursive sub-solves."""
        if time_limit is None:
            return None
        return max(0.0, time_limit - (time.perf_counter() - _t_solve0))

    if options is None:
        options = SolverOptions.for_dtype(dtype)
    if opt_overrides:
        options = dataclasses.replace(options, **opt_overrides)
    if isinstance(prog, StandardForm):
        raise TypeError("solve_milp needs the LinProg (it re-bounds integer "
                        "variables); pass the program, not a StandardForm")

    if presolve:
        # exact root presolve (MILP-safe: integral bounds only ever snap
        # tighter): every removed row/column shrinks EVERY node's tableau.
        # Presolve is a deterministic function of ``prog``, so it also runs
        # on RESUME: a checkpoint written by the inner (reduced-space) solve
        # is resumed against the same reduced program, and the recover map
        # is re-derived — the checkpoint meta's branch-variable list is
        # validated below to catch presolve-setting mismatches.
        from ..model.presolve import presolve as _presolve

        res = _presolve(prog)
        if res.status is not None:
            sol = Solution(status=res.status)
            return (sol, BnbStats()) if return_stats else sol
        if res.unbounded_if_feasible:
            feas = solve_milp(res.prog, options=options, dtype=dtype,
                              batch_size=batch_size, max_nodes=max_nodes,
                              time_limit=_time_left(),
                              refine=refine, exact_max_m=exact_max_m,
                              int_tol=int_tol, presolve=False)
            if feas.status == "infeasible":
                sol = Solution(status="infeasible")
            elif feas.status == "optimal" or feas.x is not None:
                # feasibility proven (optimum or an incumbent on node_limit)
                sol = Solution(status="unbounded")
            else:
                # node_limit with no incumbent / numerical_error: feasibility
                # unproven — propagate the indeterminate status unchanged
                sol = Solution(status=feas.status)
            return (sol, BnbStats()) if return_stats else sol
        if not res.prog.allVarNames():   # fully solved by presolve
            obj = res.prog.objective.expr.getConstant()
            sol = Solution(status="optimal", objective=obj,
                           x=res.recover({}))
            return (sol, BnbStats()) if return_stats else sol
        if res.fixed or res.removed_rows or res.removed_vars:
            out = solve_milp(res.prog, options=options, dtype=dtype,
                             batch_size=batch_size, max_nodes=max_nodes,
                             time_limit=_time_left(), gap_tol=gap_tol,
                             refine=refine, exact_max_m=exact_max_m,
                             int_tol=int_tol, return_stats=return_stats,
                             checkpoint_path=checkpoint_path,
                             checkpoint_every=checkpoint_every,
                             resume_from=resume_from,
                             presolve=False, branching=branching,
                             node_encoding=node_encoding, mesh=mesh,
                             batch_axis=batch_axis, cols_axis=cols_axis,
                             device_generations=device_generations,
                             **opt_overrides)
            sol, st = out if return_stats else (out, None)
            if sol.x is not None:
                sol = dataclasses.replace(
                    sol, x=res.recover(sol.x), basis=None, col_values=None)
            return (sol, st) if return_stats else sol
        prog = res.prog  # no reductions: fall through (names unchanged)

    int_vars = {name: v for name, v in prog.vars.items() if v.isint}
    stats = BnbStats()
    if not int_vars:
        from ..solve.api import solve_lp

        sol = solve_lp(prog, options=options, dtype=dtype, refine="exact")
        return (sol, stats) if return_stats else sol

    if mesh is not None:
        if node_encoding != "rows":
            raise ValueError("mesh MILP solving supports node_encoding="
                             "'rows' only")
        bsz = dict(mesh.shape)[batch_axis]
        if batch_size % bsz:
            raise ValueError(
                f"batch_size ({batch_size}) must be a multiple of the "
                f"'{batch_axis}' mesh axis size ({bsz})")
    if node_encoding == "spans":
        # bound-vector node encoding over the batched bounded driver
        # (tpulp.milp.spans): no bound rows in any node tableau; cold waves.
        # EXPERIMENTAL: measured ~58x slower than 'rows' on the set-cover
        # bench (BENCH.md spans post-mortem) — its win condition (a
        # bounded-state dual simplex + device node templates) is analyzed
        # but not built. Kept as a documented mode, not a recommendation.
        if checkpoint_path is not None or resume_from is not None:
            raise ValueError("node_encoding='spans' does not support "
                             "checkpoint/resume yet; use 'rows'")
        if time_limit is not None or gap_tol > 0.0:
            raise ValueError("node_encoding='spans' does not support "
                             "time_limit/gap_tol; use 'rows'")
        from .spans import solve_milp_spans

        return solve_milp_spans(
            prog, options=options, dtype=dtype, batch_size=batch_size,
            max_nodes=max_nodes, refine=refine, int_tol=int_tol,
            return_stats=return_stats)
    if node_encoding != "rows":
        raise ValueError(f"unknown node_encoding {node_encoding!r}")

    root_sf = lower_to_standard_form(prog, integer_bound_rows=True)
    if root_sf.trivially_infeasible:
        sol = Solution(status="infeasible")
        return (sol, stats) if return_stats else sol

    if refine == "auto":
        refine = "exact" if root_sf.m <= exact_max_m else "float64"
    if refine not in ("exact", "float64"):
        raise ValueError(f"unknown refine mode {refine!r}")
    exact_mode = refine == "exact"

    if branching not in ("most_fractional", "pseudocost"):
        raise ValueError(f"unknown branching rule {branching!r}")
    pc = _Pseudocosts() if branching == "pseudocost" else None

    root_bounds: Bounds = {}
    for name, v in int_vars.items():
        if name not in root_sf.int_bound_rows:
            continue  # fixed var: nothing to branch on
        root_bounds[name] = (v.lb, v.ub)
    branch_names = list(root_bounds)

    # device-generation chaining eligibility (see the docstring): float
    # bounding mode, most-fractional branching, single-device waves, and
    # branch values guaranteed f32-exact (bounds within +-2^20 — the same
    # EXACT_BRANCH_ABOVE threshold the host path trusts floats below)
    # mesh waves chain too (r5 late): the expansion executable is plain
    # batched jax ops, so GSPMD compiles it over the sharded template like
    # every other wave executable (parity pinned on the fake cluster)
    gen_ok = (device_generations > 1 and not exact_mode and pc is None
              and bool(branch_names)
              and all(abs(lb) <= 2**20 and abs(ub) <= 2**20
                      for lb, ub in root_bounds.values()))
    gen_meta = None  # (le_col, le_sign, ge_col, ge_sign) device arrays

    # frontier: (parent LP bound as float, tiebreak, exact bound, bounds
    # dict, warm_ref or None). ``warm_ref = (slot, col, delta)`` names the
    # parent's terminal frame in the device-resident STATE POOL: the child
    # is derived by the sparse RHS rewrite ``T[:, -1] += delta * T[:, col]``
    # in the parent's basis frame and re-optimized by the device dual
    # simplex (tpulp.solve.dual) — no refactorization, no tableau re-upload,
    # and every wave runs the same fixed-shape executables (pool gather is
    # inside the jit; variable-shape eager gathers cost a remote mini-compile
    # per wave on the tunneled TPU). None means a cold two-phase solve
    # (root, resumed nodes, children of solo-resolved lanes, pool overflow).
    counter = itertools.count()
    frontier: List[Tuple] = []
    incumbent: Optional[Solution] = None
    incumbent_z: Optional[Fraction] = None  # minimization value, EXACT

    if resume_from is not None:
        from ..io.checkpoint import load_bnb_frontier

        loaded, incumbent_z, ck_meta = load_bnb_frontier(resume_from)
        # the checkpoint was written in THIS solve's variable space (after
        # any presolve reductions — presolve re-runs deterministically on
        # resume). A mismatch means the program changed or the presolve
        # setting differs from the writing run: fail loudly instead of
        # KeyError-ing later at branch time.
        ck_vars = ck_meta.get("branch_vars")
        if ck_vars is not None and sorted(ck_vars) != sorted(branch_names):
            raise ValueError(
                "checkpoint branch variables do not match this program's "
                f"(checkpoint: {sorted(ck_vars)}, program: "
                f"{sorted(branch_names)}); resume with the same program and "
                "presolve setting that wrote the checkpoint")
        counter = itertools.count(
            start=1 + max((tb for _, tb, _, _ in loaded), default=0))
        for bound, tb, bounds, _pbasis in loaded:
            # nodes checkpointed WITH a parent basis warm-start right from
            # the resumed first wave (frame reconstruction + dual simplex);
            # legacy/basis-less nodes re-solve cold
            pb = None
            if _pbasis is not None and len(_pbasis) == root_sf.m:
                pb = np.asarray(_pbasis, dtype=np.int32)
            heapq.heappush(frontier,
                           (float(bound), tb, bound, bounds, None, None,
                            pb))
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
            (-1e18, next(counter), Fraction(-10**18), root_bounds, None,
             None, None))

    def _checkpoint():
        from ..io.checkpoint import save_bnb_frontier

        meta = {"nodes_solved": stats.nodes_solved,
                "branch_vars": sorted(branch_names)}
        if incumbent is not None:
            meta["incumbent"] = {
                "objective": str(Fraction(incumbent.objective)),
                "objective_min": str(Fraction(incumbent.objective_min)),
                "x": {k: str(Fraction(v)) for k, v in incumbent.x.items()},
            }
        # persist each warm node's PARENT basis (one pool fetch per
        # checkpoint): a resumed run reconstructs the parent frame from it
        # and re-optimizes with the dual simplex instead of solving cold
        pool_np = None
        entries = []
        for _, tb, bound, bounds, ref, _pc, pb in frontier:
            basis_out = None if pb is None else pb
            if ref is not None:
                if pool_np is None:
                    pool_np = np.asarray(pool_basis)
                basis_out = pool_np[ref[0]]
            entries.append((bound, tb, bounds, basis_out))
        save_bnb_frontier(checkpoint_path, entries, incumbent_z, meta=meta)
    root_unbounded = False
    R_dev = const_dev = None  # device recover map for the integrality check
    template = art_row_mask = None  # device-resident batched wave template
    deferred = None   # (out, slots, lanes): pool writes riding the next wave
    last_out = None   # previous wave's terminal state (deferred-write source)
    warm_masks = None  # (col_active, art_cols) phase-2 masks of the root
    art_cols_host = None  # cached host copy (identical every wave)
    art_start_batched = 0  # first artificial column in batched space

    def _remap_basis_col(j: int, sf_n: int) -> int:
        """Batched column space -> sf space (artificials at sf.n + k)."""
        return j if j < sf_n else sf_n + (j - art_start_batched)

    # ---- device state pool (parent terminal frames for warm starts) -------
    pool_T = pool_basis = None
    pool_cap = 0
    free_slots: List[int] = []
    slot_refs: Dict[int, int] = {}

    def _pool_init():
        nonlocal pool_T, pool_basis, pool_cap, free_slots
        bytes_per = ((root_sf.m + 2)
                     * (template.T.shape[2]) * template.T.dtype.itemsize)
        pool_cap = int(min(POOL_CAP_MAX, max(4 * batch_size, 64),
                           max(64, 512_000_000 // max(bytes_per, 1))))
        pool_T = jnp.zeros((pool_cap,) + template.T.shape[1:],
                           template.T.dtype)
        pool_basis = jnp.zeros((pool_cap, root_sf.m), jnp.int32)
        free_slots = list(range(pool_cap))

    def _slot_release(slot: int):
        slot_refs[slot] -= 1
        if slot_refs[slot] == 0:
            del slot_refs[slot]
            free_slots.append(slot)

    def _pool_check():
        """Audit the slot-accounting invariants (POOL_DEBUG only):
        * no slot is simultaneously free and referenced;
        * the free list holds no duplicates and only in-range slots;
        * every refcount is positive and every referenced slot is claimed
          by exactly the frontier entries + staged deferred writes that
          name it."""
        free = list(free_slots)
        assert len(free) == len(set(free)), "duplicate free slot"
        assert all(0 <= s < pool_cap for s in free), "out-of-range free slot"
        assert not (set(free) & set(slot_refs)), (
            "slot both free and referenced", free, dict(slot_refs))
        assert all(cnt > 0 for cnt in slot_refs.values()), dict(slot_refs)
        claimed: Dict[int, int] = {}
        for entry in frontier:
            ref = entry[4]
            if ref is not None:
                claimed[ref[0]] = claimed.get(ref[0], 0) + 1
        assert claimed == dict(slot_refs), (
            "refcounts drifted from frontier claims", claimed,
            dict(slot_refs))

    # per-row slack/surplus column + sign: the sparse child-RHS rewrite uses
    # row i's slack column (+1, original column e_i) or surplus (-1, -e_i)
    row_adj: Dict[int, Tuple[int, int]] = {}
    for j, nm in enumerate(root_sf.col_names):
        if j < root_sf.n_struct:
            continue  # structural columns; user names may mimic _s/_e
        if nm.startswith("_s"):
            row_adj[int(nm[2:])] = (j, 1)
        elif nm.startswith("_e"):
            row_adj[int(nm[2:])] = (j, -1)

    from ..core.state import canonical_dtype

    _is_f32 = canonical_dtype(dtype) == jnp.dtype(np.float32)

    def prune_margin() -> float:
        """Safety margin for float-mode pruning: only prune when the float
        bound certifies the node cannot beat the incumbent. With f32
        iterates the bound comes straight from the tableau corner (no f64
        re-solve per lane), so the margin is scaled to f32 drift — a larger
        margin only errs toward exploring more, never toward wrong prunes;
        incumbents are exact-verified regardless."""
        if exact_mode or incumbent_z is None:
            return 0.0
        eps = 3e-5 if _is_f32 else 1e-7
        return eps * (1.0 + abs(float(incumbent_z)))

    # Integral-objective bound rounding (r5): when EVERY objective term is
    # an integer coefficient on an integer variable (and the constant is
    # integral), every integer-feasible point has an INTEGRAL objective —
    # so a node's float bound rounds UP to the next integer before the
    # prune test. Without this, a subtree whose LP bound EQUALS the
    # incumbent optimum can never prune in float mode (bound reads
    # optimum-1e-6, margin pushes the threshold above it) and the tree
    # explodes: measured on an 18x30 set cover, 8,000 nodes without proof
    # vs 3 nodes with rounding — the exact-mode tree. Standard MIP
    # technique (objective cutoff tightening).
    def _objective_is_integral() -> bool:
        try:
            terms = prog.objective.expr.terms()
            if Fraction(prog.objective.expr.getConstant()
                        ).denominator != 1:
                return False
            for nm, cf in terms.items():
                v = prog.getVariable(nm)
                if v is None or not v.isint:
                    return False
                if Fraction(cf).denominator != 1:
                    return False
            return True
        except Exception:
            return False

    obj_integral = _objective_is_integral()

    def cannot_improve(bound) -> bool:
        if incumbent_z is None:
            return False
        if exact_mode:
            return bound >= incumbent_z
        if obj_integral:
            b_eff = math.ceil(float(bound) - prune_margin() - 1e-9)
            return b_eff >= incumbent_z
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

    def _chain_wave(wave, sub) -> bool:
        """Device-side generation chain for one wave (round 5, VERDICT r4
        item 5 — see the ``device_generations`` docstring). Dispatches
        ``device_generations - 1`` on-device expansions from the solved
        sub-wave, fetches the WHOLE chain's summaries in one read, and
        reconciles on host: exact incumbent verification, pruning against
        the exact incumbent, frontier pushes (final-generation children
        warm-started from pool-parked frames; overflow-dropped children
        re-queued cold). Returns False to make this wave fall back to the
        normal single-generation processing (never — kept for symmetry).
        """
        nonlocal incumbent, incumbent_z, last_out, deferred, \
            root_unbounded, pool_T, pool_basis
        from ..solve.dual import pool_write, run_expand_generation

        idxs0, out0, _is_warm0, summ0 = sub
        if deferred is not None:
            # an older deferral was never consumed by a warm executable
            # (this wave was cold-only): flush it before the chain writes
            d_out, d_slots, d_lanes = deferred
            s_arr = np.full((batch_size,), pool_cap, np.int32)
            l_arr = np.zeros((batch_size,), np.int32)
            s_arr[:len(d_slots)] = d_slots
            l_arr[:len(d_lanes)] = d_lanes
            pool_T, pool_basis = pool_write(
                pool_T, pool_basis, jnp.asarray(s_arr), d_out.T,
                d_out.basis, jnp.asarray(l_arr))
            deferred = None
        B = batch_size
        n_int = len(branch_names)
        _ta0 = time.perf_counter()
        lbm = np.zeros((B, n_int), np.float64)
        ubm = np.zeros((B, n_int), np.float64)
        for lane, k in enumerate(idxs0):
            bd = wave[k][1]
            for jj, nm in enumerate(branch_names):
                lb, ub = bd.get(nm, root_bounds[nm])
                lbm[lane, jj] = float(lb)
                ubm[lane, jj] = float(ub)
        active0 = np.zeros((B,), bool)
        active0[:len(idxs0)] = True
        # prune threshold on the tableau CORNER (-z_rel): expand only lanes
        # strictly above it. Computed ONCE from the exact incumbent at
        # chain start — device pruning never trusts an unverified bound.
        # With an integral objective the threshold tightens by ~1 (bound
        # rounding: a subtree at z > inc - 1 + margin cannot beat inc);
        # imprecision here only wastes expansion — the host re-checks
        # every node with cannot_improve when reconciling.
        if incumbent_z is None:
            cut = -np.inf
        else:
            thr = float(incumbent_z) + prune_margin()
            if obj_integral:
                thr = float(incumbent_z) - 1.0 + prune_margin() + 1e-6
            cut = float(root_sf.obj_const) - thr
        gdt = template.T.dtype
        le_c, le_s, ge_c, ge_s = gen_meta
        Ws = summ0.shape[1]
        summs = [jnp.concatenate(
            [summ0, jnp.full((B, 2), -1.0, summ0.dtype)], axis=1)]
        gen_states = [out0]
        expands = []
        cur_T, cur_b, cur_summ = out0.T, out0.basis, summ0
        cur_act = jnp.asarray(active0)
        cur_lb = jnp.asarray(lbm, gdt)
        cur_ub = jnp.asarray(ubm, gdt)
        cut_dev = jnp.asarray(cut, gdt)
        tol_dev = jnp.asarray(int_tol, gdt)
        for _g in range(device_generations - 1):
            outg, summg, actg, lbg, ubg, eg = run_expand_generation(
                cur_T, cur_b, cur_summ, cur_act, cur_lb, cur_ub,
                warm_masks[0], warm_masks[1], le_c, le_s, ge_c, ge_s,
                cut_dev, tol_dev,
                max_iters_dev, R_dev, const_dev, opts=options)
            gen_states.append(outg)
            summs.append(summg)
            expands.append(eg)
            cur_T, cur_b, cur_act, cur_lb, cur_ub = (
                outg.T, outg.basis, actg, lbg, ubg)
            cur_summ = summg[:, :Ws]
        stats.gen_waves += len(expands)
        _tf0 = time.perf_counter()
        stats.t_assemble += _tf0 - _ta0
        # ONE flat fetch for the whole chain (summaries + expansion masks):
        # each separate np.asarray costs a full tunnel RTT (~35-100 ms
        # measured; copy_to_host_async does not overlap on this backend)
        summ_stack = jnp.stack(summs)
        Gn = len(summs)
        W2 = summ_stack.shape[2]
        parts = [summ_stack.reshape(-1)]
        if expands:
            parts.append(jnp.stack(expands).reshape(-1)
                         .astype(summ_stack.dtype))
        buf = np.asarray(jnp.concatenate(parts))
        summ_all = buf[:Gn * B * W2].reshape(Gn, B, W2)
        e_all = buf[Gn * B * W2:].reshape(len(expands), B).astype(np.int32) \
            if expands else np.zeros((0, B), np.int32)
        _tp1 = time.perf_counter()
        stats.t_device += _tp1 - _tf0

        G = len(summs)
        m_r = root_sf.m
        # genealogy index per generation: child lane -> (parent, is_up)
        kids_of: List[Dict[int, List[Tuple[int, int]]]] = []
        for g in range(G):
            km: Dict[int, List[Tuple[int, int]]] = {}
            if g > 0:
                pa = summ_all[g][:, Ws].astype(np.int64)
                iu = summ_all[g][:, Ws + 1].astype(np.int64)
                n_real = int((pa >= 0).sum())
                stats.nodes_solved += n_real
                stats.gen_nodes += n_real
                stats.warm_nodes += n_real
                for cl in range(B):
                    if pa[cl] >= 0:
                        km.setdefault(int(pa[cl]), []).append(
                            (cl, int(iu[cl])))
            kids_of.append(km)

        pool_pending: List[Tuple[int, int, int]] = []  # (gen, lane, slot)

        def _push_cold(child_bounds, zf, z):
            heapq.heappush(frontier, (zf, next(counter), z, child_bounds,
                                      None, None, None))

        def _push_warm(bounds_g, frac_name, lo, zf, z, gen_idx, lane):
            lb, ub = bounds_g.get(frac_name, root_bounds[frac_name])
            hi = lo + 1
            le_row, ge_row = root_sf.int_bound_rows[frac_name]
            slot = free_slots.pop() if free_slots else None
            warm_children = 0
            for child_lb, child_ub in ((lb, lo), (hi, ub)):
                if child_lb > child_ub:
                    continue
                child = dict(bounds_g)
                child[frac_name] = (child_lb, child_ub)
                warm_ref = None
                if slot is not None:
                    if child_ub != ub:
                        row_, delta_b = le_row, child_ub - ub
                    else:
                        row_, delta_b = ge_row, child_lb - lb
                    adj = row_adj.get(row_)
                    if (adj is not None and delta_b.denominator == 1
                            and abs(delta_b) < 2 ** 31):
                        col, sign = adj
                        warm_ref = (slot, col, int(sign * delta_b))
                        warm_children += 1
                heapq.heappush(frontier, (zf, next(counter), z, child,
                                          warm_ref, None, None))
            if slot is not None:
                if warm_children:
                    slot_refs[slot] = warm_children
                    pool_pending.append((gen_idx, lane, slot))
                else:
                    free_slots.append(slot)

        nodes: Dict[int, Bounds] = {
            lane: dict(wave[k][1]) for lane, k in enumerate(idxs0)}
        for g in range(G):
            S = summ_all[g]
            if g > 0:
                stats.warm_pivots += int(
                    S[:, 4][summ_all[g][:, Ws] >= 0].sum())
            nxt: Dict[int, Bounds] = {}
            for lane in sorted(nodes):
                bounds_g = nodes[lane]
                row = S[lane]
                status = Status.NAMES.get(int(row[3]), "unknown")
                niter = int(row[4])
                if status in ("numerical_error", "iteration_limit"):
                    # untrusted lane: solo exact re-solve; any device-built
                    # children of it are poisoned (simply not visited —
                    # replaced by this node's own cold children)
                    stats.solo_resolves += 1
                    sf_node = _node_standard_form(root_sf, bounds_g)
                    sol = solve_standard_form(sf_node, options=options,
                                              dtype=dtype, refine="exact")
                    if sol.status == "infeasible":
                        stats.nodes_pruned_infeasible += 1
                        continue
                    if sol.status == "unbounded":
                        root_unbounded = True
                        frontier.clear()
                        return True
                    if sol.status != "optimal":
                        continue
                    z = sol.objective_min
                    if cannot_improve(z):
                        stats.nodes_pruned_bound += 1
                        continue
                    verified, exact_vals = exact_incumbent_check(
                        sf_node, sol.basis)
                    if verified is not None:
                        if incumbent_z is None or \
                                verified.objective_min < incumbent_z:
                            incumbent = dataclasses.replace(
                                verified, niter=sol.niter)
                            incumbent_z = verified.objective_min
                            stats.incumbent_updates += 1
                        continue
                    fr = {n2: v for n2, v in exact_vals.items()
                          if v.denominator != 1}
                    fn2 = _most_fractional(fr)
                    val = exact_vals[fn2]
                    lbv, ubv = bounds_g.get(fn2, root_bounds[fn2])
                    lo = Fraction(math.floor(val))
                    zf = float(z)
                    for child_lb, child_ub in ((lbv, lo), (lo + 1, ubv)):
                        if child_lb > child_ub:
                            continue
                        child = dict(bounds_g)
                        child[fn2] = (child_lb, child_ub)
                        _push_cold(child, zf, z)
                    continue
                if status == "infeasible":
                    stats.nodes_pruned_infeasible += 1
                    continue
                if status == "unbounded":
                    root_unbounded = True
                    frontier.clear()
                    return True
                if status != "optimal":
                    continue
                zf = float(-row[0]) + float(root_sf.obj_const)
                z = Fraction(zf).limit_denominator(10 ** 12)
                if cannot_improve(z):
                    stats.nodes_pruned_bound += 1
                    continue
                maxdist = float(row[1])
                if maxdist <= int_tol:
                    basis = [_remap_basis_col(int(v2), root_sf.n)
                             for v2 in row[6:6 + m_r].astype(np.int64)]
                    sf_node = _node_standard_form(root_sf, bounds_g)
                    _tv0 = time.perf_counter()
                    try:
                        verified, exact_vals = exact_incumbent_check(
                            sf_node, basis)
                    except (ZeroDivisionError, np.linalg.LinAlgError):
                        stats.solo_resolves += 1
                        sol2 = solve_standard_form(
                            sf_node, options=options, dtype=dtype,
                            refine="exact")
                        if sol2.status != "optimal":
                            stats.t_verify += time.perf_counter() - _tv0
                            continue
                        verified, exact_vals = exact_incumbent_check(
                            sf_node, sol2.basis)
                    stats.t_verify += time.perf_counter() - _tv0
                    if verified is not None:
                        z_exact = verified.objective_min
                        if incumbent_z is None or z_exact < incumbent_z:
                            incumbent = dataclasses.replace(
                                verified, niter=niter)
                            incumbent_z = z_exact
                            stats.incumbent_updates += 1
                        continue
                    # exactly fractional after all: branch on exact values
                    fr = {n2: v for n2, v in exact_vals.items()
                          if v.denominator != 1}
                    fn2 = _most_fractional(fr)
                    val = exact_vals[fn2]
                    lbv, ubv = bounds_g.get(fn2, root_bounds[fn2])
                    lo = Fraction(math.floor(val))
                    for child_lb, child_ub in ((lbv, lo), (lo + 1, ubv)):
                        if child_lb > child_ub:
                            continue
                        child = dict(bounds_g)
                        child[fn2] = (child_lb, child_ub)
                        _push_cold(child, zf, z)
                    continue
                # fractional node
                v_idx = int(row[5])
                frac_name = branch_names[v_idx]
                f = Fraction(math.floor(float(row[2])))
                expanded = g < G - 1 and bool(e_all[g][lane])
                if expanded:
                    kids = kids_of[g + 1].get(lane, [])
                    have = set()
                    lbv, ubv = bounds_g.get(frac_name,
                                            root_bounds[frac_name])
                    for cl, up in kids:
                        have.add(up)
                        child = dict(bounds_g)
                        child[frac_name] = (f + 1, ubv) if up else (lbv, f)
                        nxt[cl] = child
                    for up in (0, 1):
                        if up not in have:
                            # overflow-dropped child: re-queue cold
                            child = dict(bounds_g)
                            child[frac_name] = (f + 1, ubv) if up \
                                else (lbv, f)
                            if child[frac_name][0] <= child[frac_name][1]:
                                _push_cold(child, zf, z)
                else:
                    # last generation (or device declined under a stale
                    # cut): branch on host with a pool-parked warm frame
                    _push_warm(bounds_g, frac_name, f, zf, z, g, lane)
            nodes = nxt

        # park the branched final-generation frames in the pool (grouped
        # per generation state: one fixed-shape pool_write dispatch each)
        groups: Dict[int, Tuple[int, List[int], List[int]]] = {}
        for gen_idx, lane, slot in pool_pending:
            gg = groups.setdefault(gen_idx, (gen_idx, [], []))
            gg[1].append(slot)
            gg[2].append(lane)
        for gen_idx, slots, lanes in groups.values():
            out_g = gen_states[gen_idx]
            s_arr = np.full((batch_size,), pool_cap, np.int32)
            l_arr = np.zeros((batch_size,), np.int32)
            s_arr[:len(slots)] = slots
            l_arr[:len(lanes)] = lanes
            pool_T, pool_basis = pool_write(
                pool_T, pool_basis, jnp.asarray(s_arr), out_g.T,
                out_g.basis, jnp.asarray(l_arr))
        last_out = gen_states[-1]
        stats.t_process += time.perf_counter() - _tp1
        return True

    stop_reason: Optional[str] = None
    while frontier and stats.nodes_solved < max_nodes:
        if time_limit is not None and \
                time.perf_counter() - _t_solve0 >= time_limit:
            stop_reason = "time_limit"
            break
        if gap_tol > 0.0 and incumbent is not None:
            best_open = min(zf for zf, *_ in frontier)
            inc_f = float(incumbent_z)
            if max(0.0, (inc_f - best_open) / max(abs(inc_f), 1.0)) \
                    <= gap_tol:
                stop_reason = "gap_limit"
                break
        _tw0 = time.perf_counter()
        wave: List[Tuple] = []
        while frontier and len(wave) < batch_size:
            (_, _, bound, bounds, warm_ref, pc_tag,
             pbasis) = heapq.heappop(frontier)
            if warm_ref is not None:
                # this child's claim on its parent's pool slot ends once it
                # is consumed here (functional pool updates make same-cycle
                # slot reuse safe: the wave reads the pre-write pool value)
                _slot_release(warm_ref[0])
            # prune by parent bound against current incumbent
            if cannot_improve(bound):
                stats.nodes_pruned_bound += 1
                continue
            wave.append((bound, bounds, warm_ref, pc_tag, pbasis))
        if not wave:
            break

        sfs = [_node_standard_form(root_sf, bounds)
               for _, bounds, *_ in wave]
        # device-resident template: nodes differ from the root ONLY in b, so
        # a cold wave uploads just the (B, m) RHS matrix and a jitted refresh
        # rewrites the batched state in place on device
        if template is None:
            template, art_cols_host = make_batched_states(
                [sfs[0]] * batch_size, dtype=dtype, return_host_art=True)
            if mesh is not None:
                # multi-chip waves: shard the node template batch-outermost
                # (and columns when the mesh has a cols axis); every jitted
                # wave executable then compiles under GSPMD with lanes
                # distributed across chips. Done ONCE — refreshes, warm
                # waves, and pools inherit the placement from operands.
                from ..batch.vmap_driver import pad_batched_columns
                from ..shard.sharded import batch_state_sharding

                csz = dict(mesh.shape).get(cols_axis, 1)
                template = pad_batched_columns(template, csz)
                template = jax.device_put(
                    template,
                    batch_state_sharding(mesh, batch_axis, cols_axis))
            art_row_mask = jnp.asarray(
                np.array([1.0 if h < 0 else 0.0
                          for h in root_sf.basis_hint]), template.T.dtype)
            art0 = template.art_cols[0]
            warm_masks = (template.col_active[0] & ~art0, art0)
            if mesh is not None and art_cols_host.shape[1] != \
                    template.art_cols.shape[1]:
                # column padding changed the width: re-fetch once
                art_cols_host = np.asarray(template.art_cols)
            art_start_batched = int(art_cols_host[0].argmax()) \
                if art_cols_host[0].any() else art_cols_host.shape[1]
            _pool_init()
            np_dtype = np.dtype(str(template.T.dtype))
            n_batched = template.T.shape[2] - 1
            if branch_names:
                R_np, const_np = _int_recover_matrix(
                    root_sf, branch_names, n_batched, np_dtype)
            else:  # no integer vars to check: harmless 1-row placeholder
                R_np = np.zeros((1, n_batched), dtype=np_dtype)
                const_np = np.zeros((1,), dtype=np_dtype)
            R_dev = jnp.asarray(R_np)
            const_dev = jnp.asarray(const_np)
            max_iters_dev = jnp.asarray(options.max_iters, jnp.int32)
            if gen_ok:
                # per-branch-var rewrite metadata for on-device children:
                # the bound rows' slack/surplus columns and signs (the same
                # (col, sign) pairs the warm ipack path uses)
                _lec, _les, _gec, _ges = [], [], [], []
                for nm in branch_names:
                    le_row, ge_row = root_sf.int_bound_rows[nm]
                    a1 = row_adj.get(le_row)
                    a2 = row_adj.get(ge_row)
                    if a1 is None or a2 is None:
                        gen_ok = False
                        break
                    _lec.append(a1[0])
                    _les.append(float(a1[1]))
                    _gec.append(a2[0])
                    _ges.append(float(a2[1]))
                if gen_ok:
                    _gdt = template.T.dtype
                    gen_meta = (jnp.asarray(_lec, jnp.int32),
                                jnp.asarray(_les, _gdt),
                                jnp.asarray(_gec, jnp.int32),
                                jnp.asarray(_ges, _gdt))
        n_wave = len(wave)
        m_rows = root_sf.m
        ck_idx = [k for k in range(n_wave)
                  if wave[k][2] is None and wave[k][4] is not None]
        cold_idx = [k for k in range(n_wave)
                    if wave[k][2] is None and wave[k][4] is None]
        warm_idx = [k for k in range(n_wave) if wave[k][2] is not None]

        # each sub-wave returns ONE packed summary array so the host pays a
        # single fetch (tunnel roundtrips dominated wave time)
        outs = []  # (wave indices, out_state, is_warm, summary)
        if cold_idx:
            from ..solve.dual import pack_wave_summary

            b_mat = np.empty((batch_size, m_rows), dtype=np.float64)
            for lane, k in enumerate(cold_idx):
                b_mat[lane] = [float(v) for v in sfs[k].b]
            b_mat[len(cold_idx):] = b_mat[0]
            batched = _refresh_template(
                template, jnp.asarray(b_mat, dtype=template.T.dtype),
                art_row_mask)
            cout = run_simplex_batch(batched, options)
            outs.append((cold_idx, cout, False,
                         pack_wave_summary(cout, R_dev, const_dev)))
        if ck_idx:
            # resumed nodes with a CHECKPOINTED parent basis: reconstruct
            # the parent frame from (basis, b) and re-optimize with the
            # dual simplex — the resume analogue of the pool warm start
            # (io/checkpoint.py format field, now an active fast path)
            from ..solve.dual import pack_wave_summary, run_warm_batch

            T0 = template.T[0]
            basis_mat = np.zeros((len(ck_idx), m_rows), np.int32)
            b_ck = np.zeros((len(ck_idx), m_rows), np.float64)
            for lane, k in enumerate(ck_idx):
                basis_mat[lane] = wave[k][4]
                b_ck[lane] = [float(v) for v in sfs[k].b]
            ckout = run_warm_batch(
                T0[2:, :-1], T0[0, :-1], warm_masks[0],
                template.art_cols[0], basis_mat,
                jnp.asarray(b_ck, dtype=template.T.dtype), options)
            outs.append((ck_idx, ckout, True,
                         pack_wave_summary(ckout, R_dev, const_dev)))
            stats.warm_nodes += len(ck_idx)
        if warm_idx:
            from ..solve.dual import run_warm_wave

            # ONE (B, 5) int32 upload: [parent slot, rewrite col, deferred
            # write slot, deferred write lane, integral rhs delta]
            ipack = np.zeros((batch_size, 5), np.int32)
            ipack[:, 2] = pool_cap          # default: dropped write
            for lane, k in enumerate(warm_idx):
                slot, col, delta = wave[k][2]
                ipack[lane, 0] = slot
                ipack[lane, 1] = col
                ipack[lane, 4] = delta
            ipack[len(warm_idx):, 0] = ipack[0, 0]  # padded: repeat lane 0
            ipack[len(warm_idx):, 1] = ipack[0, 1]
            ipack[len(warm_idx):, 4] = ipack[0, 4]
            # the previous wave's branched frames ride into the pool inside
            # this same executable (deferred writes)
            if deferred is not None:
                prev_out, wslots, wlanes = deferred
            else:
                prev_out, wslots, wlanes = last_out, [], []
            ipack[:len(wslots), 2] = wslots
            ipack[:len(wlanes), 3] = wlanes
            deferred = None
            pool_T, pool_basis, wout, summ_w = run_warm_wave(
                pool_T, pool_basis, *warm_masks,
                prev_out.T, prev_out.basis, ipack,
                R_dev, const_dev, max_iters_dev, options)
            outs.append((warm_idx, wout, True, summ_w))
            stats.warm_nodes += len(warm_idx)
        stats.nodes_solved += n_wave
        stats.waves += 1
        # dispatch is async: everything up to here is host assembly work;
        # the blocking summary fetch below is device compute + tunnel RTT
        _td0 = time.perf_counter()
        stats.t_assemble += _td0 - _tw0
        if gen_ok and gen_meta is not None and outs and not ck_idx:
            # device-side generation chain: expand G generations before
            # the one blocking fetch per sub-wave, then reconcile on host
            # — replaces the single-generation processing below. Mixed
            # cold+warm waves chain each sub-wave independently (their
            # lanes partition the wave); only resume (ck) sub-waves fall
            # back (variable batch shape).
            for _sub in outs:
                if root_unbounded:
                    break  # frontier was cleared; nothing may repopulate it
                _chain_wave(wave, _sub)
            if POOL_DEBUG:
                _pool_check()
            if checkpoint_path is not None and \
                    stats.waves % max(checkpoint_every, 1) == 0:
                _checkpoint()
            continue
        outs = [(idxs, out, w, np.asarray(summ))
                for idxs, out, w, summ in outs]
        _tp0 = time.perf_counter()
        stats.t_device += _tp0 - _td0

        # ---- merge sub-wave results + device integrality check ------------
        sols: List[Optional[Solution]] = [None] * n_wave
        maxdist = np.zeros(n_wave) if branch_names else None
        intvals = (np.zeros((n_wave, len(branch_names)))
                   if branch_names else None)
        argmax = np.zeros(n_wave, dtype=np.int64) if branch_names else None
        branchval = np.zeros(n_wave) if branch_names else None
        state_ref: List[Optional[Tuple]] = [None] * n_wave
        pending_writes: List[Tuple[Tuple, int]] = []  # ((out, lane), slot)
        if art_cols_host is None:
            art_cols_host = np.asarray(template.art_cols)
        for idxs, out, is_warm, summ in outs:
            # ONE device read per sub-wave (already fetched above, timed as
            # t_device): [corner, maxdist, branch-value, status, niter,
            # argmax, basis...] — each separate fetch costs a full tunnel
            # roundtrip (int fields are exact in the float dtype)
            corners = summ[:, 0]
            md = summ[:, 1]
            bval = summ[:, 2]
            statuses = summ[:, 3].astype(np.int32)
            niters = summ[:, 4].astype(np.int32)
            am = summ[:, 5].astype(np.int32)
            braw = summ[:, 6:6 + m_rows].astype(np.int32)
            ivals = summ[:, 6 + m_rows:]
            if is_warm:
                stats.warm_pivots += int(niters[:len(idxs)].sum())
            if exact_mode:
                # exact bounds contract: per-lane exact refinement
                sub = extract_batch_solutions(
                    [sfs[i] for i in idxs], out, refine,
                    prefetched=(statuses, niters, braw, corners,
                                art_cols_host))
            else:
                # float64 bounding mode: the summary IS the per-node result
                # (bound from the tableau corner with a dtype-aware pruning
                # margin; incumbent candidates get the exact basis check
                # below regardless) — skips 3 host linear solves per lane
                sub = []
                for lane, i in enumerate(idxs):
                    status = Status.NAMES.get(int(statuses[lane]), "unknown")
                    if status != "optimal":
                        sub.append(Solution(status=status,
                                            niter=int(niters[lane])))
                        continue
                    zmin = float(-corners[lane]) + float(sfs[i].obj_const)
                    basis = [_remap_basis_col(int(j), sfs[i].n)
                             for j in braw[lane][:m_rows]]
                    sub.append(Solution(
                        status="optimal", objective_min=zmin,
                        basis=basis, niter=int(niters[lane])))
            for lane, i in enumerate(idxs):
                sols[i] = sub[lane]
                if branch_names:
                    maxdist[i] = md[lane]
                    argmax[i] = am[lane]
                    branchval[i] = bval[lane]
                    if ivals.shape[1] >= len(branch_names):
                        intvals[i] = ivals[lane][:len(branch_names)]
                state_ref[i] = (out, lane)

        for k, ((parent_bound, bounds, _, pc_tag, _pb),
                sol) in enumerate(zip(wave, sols)):
            if sol.status in ("numerical_error", "iteration_limit"):
                # a failed lane must not be silently dropped (it may hold the
                # optimum): re-solve solo through the full precision ladder
                stats.solo_resolves += 1
                sol = solve_standard_form(
                    sfs[k], options=options, dtype=dtype, refine="exact")
                # the failed lane's device state is untrustworthy: children
                # of this node re-solve cold, and integrality comes from the
                # solo solve's exact x values
                state_ref[k] = None
                if sol.status == "optimal" and branch_names:
                    dists = [
                        abs(v - round(v))
                        for v in (float(sol.x[nm]) for nm in branch_names)]
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
            if pc is not None and pc_tag is not None:
                # learn from EVERY solved child, including ones about to be
                # pruned: bound degradation per unit of fractional distance
                var, direction, dist = pc_tag
                pc.record(var, direction,
                          float(z) - float(parent_bound), dist)
            if cannot_improve(z):
                stats.nodes_pruned_bound += 1
                continue

            looks_integral = (
                not branch_names or float(maxdist[k]) <= int_tol)
            if looks_integral:
                # candidate incumbent: ALWAYS verify exactly (float iterates
                # within int_tol of integers can still be exactly fractional)
                _tv0 = time.perf_counter()
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
                stats.t_verify += time.perf_counter() - _tv0
                if verified is not None:
                    z_exact = verified.objective_min
                    if incumbent_z is None or z_exact < incumbent_z:
                        incumbent = dataclasses.replace(
                            verified, niter=sol.niter)
                        incumbent_z = z_exact
                        stats.incumbent_updates += 1
                    continue
                # exactly fractional after all: branch on the exact values
                fr = {n: v for n, v in exact_vals.items()
                      if v.denominator != 1}
                frac_name = pc.select(fr) if pc is not None \
                    else _most_fractional(fr)
                val = exact_vals[frac_name]
            else:
                frac_name = None
                if pc is not None:
                    if sol.x is not None:   # exact mode or solo re-solve
                        fr = {nm: Fraction(sol.x[nm]) for nm in branch_names
                              if Fraction(sol.x[nm]).denominator != 1}
                    else:  # float64 waves: full value vector off the
                           # device summary tail (round 4)
                        fr = {}
                        for jj, nm in enumerate(branch_names):
                            v = float(intvals[k][jj])
                            if abs(v - round(v)) > int_tol:
                                fr[nm] = Fraction(v).limit_denominator(10**9)
                    if fr:
                        frac_name = pc.select(fr)
                if frac_name is None:
                    frac_name = branch_names[int(argmax[k])]
                if exact_mode:
                    val = Fraction(sol.x[frac_name])
                elif sol.x is not None:  # solo-resolved lane: exact x
                    val = Fraction(
                        float(sol.x[frac_name])).limit_denominator(10**9)
                else:  # device-computed branch value from the wave summary
                    bf = (float(intvals[k][branch_names.index(frac_name)])
                          if frac_name != branch_names[int(argmax[k])]
                          else float(branchval[k]))
                    val = None
                    if abs(bf) > EXACT_BRANCH_ABOVE and sol.basis is not None:
                        # above the threshold limit_denominator's granularity
                        # could misplace the floor/ceil split: one exact
                        # basis solve recovers the precise value
                        try:
                            cv, _ = exact_basis_solve(sfs[k], sol.basis)
                            xc = [cv.get(jj, Fraction(0))
                                  for jj in range(sfs[k].n)]
                            val = Fraction(
                                sfs[k].recover_solution(xc)[frac_name])
                        except (ZeroDivisionError, np.linalg.LinAlgError):
                            val = None
                    if val is None:
                        val = Fraction(bf).limit_denominator(10**9)

            # branch: each child differs from THIS node in one bound row's
            # b — park this node's terminal frame in the pool and encode the
            # sparse rewrite for the dual-simplex warm start
            lb, ub = bounds[frac_name]
            lo = Fraction(math.floor(val))
            hi = lo + 1
            zf = float(z)
            f_dist = float(val - lo)
            le_row, ge_row = root_sf.int_bound_rows[frac_name]
            slot = None
            if state_ref[k] is not None and free_slots:
                slot = free_slots.pop()
            warm_children = 0
            for child_lb, child_ub in (((lb, lo)), ((hi, ub))):
                if child_lb > child_ub:
                    continue
                child = dict(bounds)
                child[frac_name] = (child_lb, child_ub)
                warm_ref = None
                if slot is not None:
                    if child_ub != ub:       # down child: le row moves
                        row, delta_b = le_row, child_ub - ub
                    else:                    # up child: ge row moves
                        row, delta_b = ge_row, child_lb - lb
                    adj = row_adj.get(row)
                    # the delta rides in the int32 upload pack: integral
                    # bounds are snapped so it is always an exact integer
                    # (guarded anyway for exotic magnitudes)
                    if (adj is not None and delta_b.denominator == 1
                            and abs(delta_b) < 2 ** 31):
                        col, sign = adj
                        warm_ref = (slot, col, int(sign * delta_b))
                        warm_children += 1
                child_pc = None
                if pc is not None:
                    child_pc = ((frac_name, "down", f_dist)
                                if child_ub != ub
                                else (frac_name, "up", 1.0 - f_dist))
                heapq.heappush(
                    frontier,
                    (zf, next(counter),
                     z if exact_mode else Fraction(zf).limit_denominator(10**12),
                     child, warm_ref, child_pc, None))
            if slot is not None:
                if warm_children:
                    slot_refs[slot] = warm_children
                    pending_writes.append((state_ref[k], slot))
                else:
                    free_slots.append(slot)

        if outs:
            last_out = outs[-1][1]
        if pending_writes:
            # park every branched node's terminal frame in the pool. The
            # writes of ONE source state (the warm out when present) are
            # DEFERRED: they ride inside the next warm executable instead of
            # paying their own dispatch; any other group (mixed cold+warm
            # waves, or a still-unconsumed older deferral) flushes now via
            # the fixed-shape pool_write (padded slots are out-of-range and
            # dropped).
            from ..solve.dual import pool_write

            def _flush(out, slots, lanes):
                nonlocal pool_T, pool_basis
                s_arr = np.full((batch_size,), pool_cap, np.int32)
                l_arr = np.zeros((batch_size,), np.int32)
                s_arr[:len(slots)] = slots
                l_arr[:len(lanes)] = lanes
                pool_T, pool_basis = pool_write(
                    pool_T, pool_basis, jnp.asarray(s_arr),
                    out.T, out.basis, jnp.asarray(l_arr))

            if deferred is not None:
                # an older deferral was never consumed (no warm lanes in
                # this wave): flush it before staging a new one
                _flush(*deferred)
                deferred = None
            wgroups: Dict[int, Tuple[SimplexState, List[int], List[int]]] = {}
            for (out, lane), slot in pending_writes:
                g = wgroups.setdefault(id(out.T), (out, [], []))
                g[1].append(slot)
                g[2].append(lane)
            defer_key = None
            for idxs, out, is_warm, _ in outs:
                if id(out.T) in wgroups:
                    defer_key = id(out.T)  # later entry = warm out preferred
            for key, (out, slots, lanes) in wgroups.items():
                if key == defer_key:
                    deferred = (out, slots, lanes)
                else:
                    _flush(out, slots, lanes)

        if pc is not None:
            stats.pseudocost_updates = pc.updates
        if POOL_DEBUG:
            _pool_check()
        if checkpoint_path is not None and \
                stats.waves % max(checkpoint_every, 1) == 0:
            _checkpoint()
        stats.t_process += time.perf_counter() - _tp0

    if root_unbounded:
        sol = Solution(status="unbounded")
    elif incumbent is not None:
        # a nonempty frontier means the solve stopped early (max_nodes /
        # time_limit / gap_tol): the incumbent is feasible but not proven
        # optimal — report the PROVEN optimality gap against the best
        # open node bound (min sense), under the status naming the reason
        if frontier:
            best_open = min(zf for zf, *_ in frontier)
            inc_f = float(incumbent_z)
            gap = max(0.0, (inc_f - best_open) / max(abs(inc_f), 1.0))
            sol = dataclasses.replace(incumbent,
                                      status=stop_reason or "node_limit",
                                      mip_gap=gap)
        else:
            sol = dataclasses.replace(incumbent, status="optimal",
                                      mip_gap=0.0)
    elif stop_reason is not None:
        sol = Solution(status=stop_reason)
    elif stats.nodes_solved >= max_nodes:
        sol = Solution(status="node_limit")
    else:
        sol = Solution(status="infeasible")
    return (sol, stats) if return_stats else sol
