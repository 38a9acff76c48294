"""IIS (irreducible infeasible subsystem) via the deletion filter.

The defining property IS the oracle: the returned set must be (a)
infeasible and (b) irreducible — removing any single member leaves a
feasible system. Both halves are re-checked with the exact host solver
on every randomized instance, so the test validates itself without
hand-derived answers.
"""

from fractions import Fraction as F

import numpy as np
import pytest

from tpulp import LinExpr, LinProg
from tpulp.model.lower import lower_to_standard_form
from tpulp.solve import find_iis
from tpulp.solve.api import solve_standard_form_host


def _feasible(prog, keep):
    sub = LinProg()
    for v in prog.vars.values():
        sub.addVariable(v.copy())
    sub.minimize(LinExpr())
    for ci in keep:
        sub.addConstraint(prog.constraints[ci].copy())
    sf = lower_to_standard_form(sub)
    if sf.trivially_infeasible:
        return False
    return solve_standard_form_host(sf).status != "infeasible"


def _indices(prog, iis):
    out = []
    for tag in iis:
        out.append(prog.con_names.index(tag) if isinstance(tag, str)
                   else tag)
    return out


class TestKnownConflicts:
    def test_two_constraint_conflict_with_noise(self):
        lp = LinProg()
        lp.addVar("x")
        lp.addVar("y")
        lp.minimize(LinExpr(1, "x"))
        lp.addConstraint(LinExpr(1, "x").constraintGeq(3), name="xhi")
        lp.addConstraint(LinExpr(1, "x").constraintLeq(1), name="xlo")
        lp.addConstraint(LinExpr(1, "y").constraintLeq(5))
        lp.addConstraint(LinExpr(1, "x", 1, "y").constraintLeq(99))
        assert sorted(find_iis(lp)) == ["xhi", "xlo"]

    def test_three_way_cycle(self):
        # x <= y - 1 <= z - 2 <= x - 3: every pair is satisfiable, all
        # three conflict -> the IIS must be exactly the full cycle
        lp = LinProg()
        for v in ("x", "y", "z"):
            lp.addVar(v, lb=None)
        lp.minimize(LinExpr())
        lp.addConstraint(
            (LinExpr(1, "x") - LinExpr(1, "y")).constraintLeq(-1), name="a")
        lp.addConstraint(
            (LinExpr(1, "y") - LinExpr(1, "z")).constraintLeq(-1), name="b")
        lp.addConstraint(
            (LinExpr(1, "z") - LinExpr(1, "x")).constraintLeq(-1), name="c")
        assert sorted(find_iis(lp)) == ["a", "b", "c"]

    def test_feasible_raises(self):
        lp = LinProg()
        lp.addVar("x")
        lp.minimize(LinExpr(1, "x"))
        lp.addConstraint(LinExpr(1, "x").constraintLeq(9))
        with pytest.raises(ValueError, match="no IIS"):
            find_iis(lp)

    def test_bound_conflict_vs_constraints(self):
        # the conflict is between a CONSTRAINT and a variable's hard ub:
        # the IIS over constraints is that single constraint
        lp = LinProg()
        lp.addVar("x", lb=0, ub=2)
        lp.minimize(LinExpr())
        lp.addConstraint(LinExpr(1, "x").constraintGeq(5), name="needs5")
        lp.addConstraint(LinExpr(1, "x").constraintLeq(8))
        assert find_iis(lp) == ["needs5"]


def _random_infeasible(seed):
    rng = np.random.default_rng(seed)
    nv = int(rng.integers(2, 5))
    lp = LinProg(f"iis{seed}")
    for j in range(nv):
        lp.addVar(f"v{j}")
    lp.minimize(LinExpr())
    for _ in range(int(rng.integers(3, 9))):
        e = LinExpr()
        nz = 0
        for j in range(nv):
            cc = int(rng.integers(-4, 5))
            if cc:
                e += LinExpr(F(cc), f"v{j}")
                nz += 1
        if not nz:
            continue
        comp = ["constraintLeq", "constraintGeq",
                "constraintEq"][int(rng.integers(0, 3))]
        lp.addConstraint(getattr(e, comp)(F(int(rng.integers(-10, 11)))))
    return lp


@pytest.mark.parametrize("trial", range(20))
def test_irreducibility_property(trial):
    """On random infeasible systems: the IIS is infeasible, and removing
    ANY single member makes it feasible — checked with the exact host."""
    lp = _random_infeasible(3100 + trial)
    if _feasible(lp, list(range(len(lp.constraints)))):
        pytest.skip("instance feasible")
    iis = _indices(lp, find_iis(lp))
    assert iis, "empty IIS from an infeasible system"
    assert not _feasible(lp, iis), "reported IIS is feasible"
    for drop in iis:
        rest = [c for c in iis if c != drop]
        assert _feasible(lp, rest), \
            f"IIS not irreducible: still infeasible without {drop}"
