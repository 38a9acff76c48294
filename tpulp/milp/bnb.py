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
* All bounding/pruning decisions use EXACT rational objectives from
  final-basis refinement, so incumbent comparisons and integrality checks
  never suffer float ambiguity.
"""

from __future__ import annotations

import dataclasses
import heapq
import itertools
import math
from fractions import Fraction
from typing import Dict, List, Optional, Tuple, Union

import jax.numpy as jnp

from ..core.state import SolverOptions
from ..model.lower import StandardForm, lower_to_standard_form
from ..model.prog import MAX, LinProg
from ..solve.api import Solution
from ..batch.vmap_driver import solve_lp_batch

__all__ = ["solve_milp", "BnbStats"]


@dataclasses.dataclass
class BnbStats:
    nodes_solved: int = 0
    waves: int = 0
    nodes_pruned_bound: int = 0
    nodes_pruned_infeasible: int = 0
    incumbent_updates: int = 0


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


def solve_milp(
    prog: Union[LinProg, StandardForm],
    options: Optional[SolverOptions] = None,
    dtype=jnp.float64,
    batch_size: int = 64,
    max_nodes: int = 100_000,
    return_stats: bool = False,
    **opt_overrides,
):
    """Solve a mixed-integer LinProg by branch-and-bound.

    Returns a Solution (status optimal / infeasible / unbounded / node_limit)
    in the original sense/variables; with ``return_stats=True`` returns
    ``(Solution, BnbStats)``."""
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

    root_bounds: Bounds = {}
    for name, v in int_vars.items():
        if name not in root_sf.int_bound_rows:
            continue  # fixed var: nothing to branch on
        root_bounds[name] = (v.lb, v.ub)

    # frontier: (parent LP bound, tiebreak, bounds dict)
    counter = itertools.count()
    frontier: List[Tuple[Fraction, int, Bounds]] = []
    heapq.heappush(frontier, (Fraction(-10**18), next(counter), root_bounds))

    incumbent: Optional[Solution] = None
    incumbent_z: Optional[Fraction] = None  # minimization value (z_min)
    root_unbounded = False

    while frontier and stats.nodes_solved < max_nodes:
        wave: List[Tuple[Fraction, Bounds]] = []
        while frontier and len(wave) < batch_size:
            bound, _, bounds = heapq.heappop(frontier)
            # prune by parent bound against current incumbent
            if incumbent_z is not None and bound >= incumbent_z:
                stats.nodes_pruned_bound += 1
                continue
            wave.append((bound, bounds))
        if not wave:
            break

        sfs = [_node_standard_form(root_sf, bounds) for _, bounds in wave]
        sols = solve_lp_batch(sfs, options=options, dtype=dtype,
                              refine="exact")
        stats.nodes_solved += len(wave)
        stats.waves += 1

        for (parent_bound, bounds), sol in zip(wave, sols):
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
                continue  # iteration-limit node: drop (conservative)
            z = sol.objective_min  # exact Fraction (refine="exact")
            if incumbent_z is not None and z >= incumbent_z:
                stats.nodes_pruned_bound += 1
                continue
            int_values = {name: sol.x[name] for name in root_bounds}
            frac_name = _most_fractional(
                {k: v for k, v in int_values.items()
                 if Fraction(v).denominator != 1})
            if frac_name is None:
                # integral: new incumbent
                incumbent = sol
                incumbent_z = z
                stats.incumbent_updates += 1
                continue
            # branch
            val = Fraction(int_values[frac_name])
            lb, ub = bounds[frac_name]
            lo = Fraction(math.floor(val))
            hi = lo + 1
            if lo >= lb:
                down = dict(bounds)
                down[frac_name] = (lb, lo)
                heapq.heappush(frontier, (z, next(counter), down))
            if hi <= ub:
                up = dict(bounds)
                up[frac_name] = (hi, ub)
                heapq.heappush(frontier, (z, next(counter), up))

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
