"""IIS: an Irreducible Infeasible Subsystem of an infeasible program.

When a model is infeasible, the actionable question is *which constraints
conflict*. An IIS is a subset of the constraints that is (a) infeasible and
(b) irreducible — removing ANY single member makes the remainder feasible.
The reference stops at reporting infeasibility (its phase-1 either raises
or returns a status, /root/reference/lpsol/simplex.py:190-214); this is the
production-diagnostic layer on top.

Algorithm: the classic DELETION FILTER. Starting from all constraints,
tentatively drop each one in turn; if the rest is still infeasible the
drop becomes permanent, otherwise the constraint is provably part of every
remaining conflict and is kept. One pass over m constraints yields an IIS
— correctness needs only a sound feasibility oracle, which here is the
device solver's certified status ladder (f32 → f64 → refreshed → exact
host confirmation; ``solve/api.py``): every 'infeasible' verdict the
filter relies on is re-derived, and at refinable sizes exactly confirmed,
before this module sees it.

Scope: the filter searches over the program's CONSTRAINTS; variable
bounds are treated as hard (kept in every subproblem). A conflict living
entirely inside one variable's bounds (lb > ub) is reported by lowering
as trivially infeasible before any solve. Integrality is ignored — an IIS
is an LP-relaxation notion (a model whose LP relaxation is feasible but
whose integer lattice is empty has no IIS in this sense; ``find_iis``
raises ValueError there rather than fabricating one).
"""

from __future__ import annotations

from typing import Callable, List, Optional

from ..model.prog import LinProg

__all__ = ["find_iis"]


def _sub_program(prog: LinProg, keep: List[int]) -> LinProg:
    sub = LinProg(prog.name)
    sub.objective = prog.objective.copy()
    for v in prog.vars.values():
        sub.addVariable(v.copy())
    for ci in keep:
        sub.addConstraint(prog.constraints[ci].copy(),
                          name=prog.con_names[ci])
    return sub


def find_iis(prog: LinProg, solve: Optional[Callable] = None,
             **solve_kwargs) -> List:
    """Deletion-filter IIS of an infeasible ``LinProg``.

    Returns the IIS as a list of constraint indices (a name replaces the
    index where the constraint was named). Raises ValueError if the
    program is feasible (or unbounded — both mean there is no IIS).

    ``solve`` overrides the feasibility oracle; it must accept a
    ``LinProg`` and return an object with a ``status`` attribute. The
    default oracle is the EXACT host simplex up to ``host_max_m=192``
    rows (milliseconds per subproblem, rational-exact verdicts — the
    filter's soundness requirement) and the device ladder
    (``solve_lp(**solve_kwargs)``) above it; note the ladder re-confirms
    infeasible verdicts across rungs, which costs a few compiles per
    subproblem. Integrality is ignored — see the module docstring. Cost:
    at most ``len(prog.constraints)`` solves of shrinking subproblems.
    """
    host_max_m = solve_kwargs.pop("host_max_m", 192)
    if solve is None:
        from ..model.lower import lower_to_standard_form
        from .api import Solution, solve_lp, solve_standard_form_host

        def solve(p):
            sf = lower_to_standard_form(p)
            if sf.trivially_infeasible:
                return Solution(status="infeasible")
            if sf.m <= host_max_m:
                return solve_standard_form_host(sf)
            return solve_lp(sf, **solve_kwargs)
    elif solve_kwargs:
        raise ValueError("solve_kwargs apply to the default oracle only")

    def feasible(keep: List[int]) -> bool:
        # feasibility only: the objective is irrelevant to an IIS, and a
        # constant objective makes 'unbounded' impossible in subproblems
        sub = _sub_program(prog, keep)
        from ..model.expr import LinExpr

        sub.objective.expr = LinExpr()
        st = solve(sub).status
        if st not in ("optimal", "infeasible", "unbounded"):
            raise RuntimeError(
                f"IIS oracle returned non-terminal status {st!r}")
        return st != "infeasible"

    m = len(prog.constraints)
    if feasible(list(range(m))):
        # distinguish 'feasible' from 'LP-feasible MILP' for the caller
        tag = "feasible"
        if prog.isMixedInteger():
            tag = ("LP-relaxation-feasible (an IIS is an LP notion; "
                   "integer infeasibility has no IIS)")
        raise ValueError(f"program is {tag}: no IIS exists")

    members = list(range(m))
    for ci in list(members):
        trial = [c for c in members if c != ci]
        if not feasible(trial):
            members = trial  # ci is redundant to the conflict: drop it
        # else: every remaining conflict needs ci — keep it
    return [prog.con_names[ci] if prog.con_names[ci] is not None else ci
            for ci in members]
