"""Host exact Simplex: two-phase driver, pivot rules, status reporting,
fixed reference bugs (redundant rows, stall detection, unbounded status).

This is the coverage the reference left empty (test_simplex.py was a stub)."""

from fractions import Fraction as F

import pytest

from tpulp import LinExpr, LinProg, Simplex, SolveStatus, Tableau
from tpulp.io import parse_grid

TEXTBOOK = """
  x1    x2    _s0   _s1  | z
  -40   -30   0     0    | 0
  1     1     1     0    | 12
  2     1     0     1    | 16
"""


def lp_tableau(lp):
    sf = lp.lower()
    return Tableau.fromArrays(sf.c, sf.A, sf.b, names=sf.col_names), sf


def beale_tableau():
    """Beale's classic cycling example; optimum -1/20."""
    lp = LinProg()
    for v in ["x4", "x5", "x6", "x7"]:
        lp.addVar(v)
    lp.minimize(LinExpr("-3/4", "x4", 150, "x5", "-1/50", "x6", 6, "x7"))
    lp.addConstraint(
        LinExpr("1/4", "x4", -60, "x5", "-1/25", "x6", 9, "x7").constraintLeq(0))
    lp.addConstraint(
        LinExpr("1/2", "x4", -90, "x5", "-1/50", "x6", 3, "x7").constraintLeq(0))
    lp.addConstraint(LinExpr(1, "x6").constraintLeq(1))
    return lp_tableau(lp)[0]


class TestPhase1:
    def test_canonical_fast_path(self):
        t = parse_grid(TEXTBOOK)
        sx = Simplex(t)
        assert sx.getBasicSequence() == [2, 3]
        assert sx.num_pivots == 0
        assert t.getVarMarks() == [False, False, True, True]

    def test_negative_b_normalized(self):
        t = parse_grid(TEXTBOOK)
        t.rowMult(0, -1)  # same constraint, flipped signs
        sx = Simplex(t)
        assert t.getBi(0) == 12

    def test_artificials_for_geq_rows(self):
        lp = LinProg()
        lp.addVar("x")
        lp.addVar("y")
        lp.minimize(LinExpr(2, "x", 3, "y"))
        lp.addConstraint(LinExpr(1, "x", 1, "y").constraintGeq(4))
        lp.addConstraint(LinExpr(1, "x", -1, "y").constraintEq(0))
        t, sf = lp_tableau(lp)
        n_before = t.getNumVars()
        sx = Simplex(t)
        # artificial columns removed again after phase 1
        assert t.getNumVars() == n_before
        assert sx.solve() is SolveStatus.OPTIMAL
        assert sx.getObjValue() == 10  # x=y=2

    def test_infeasible_raises_with_artificial_opt(self):
        lp = LinProg()
        lp.addVar("x")
        lp.minimize(LinExpr(1, "x"))
        lp.addConstraint(LinExpr(1, "x").constraintLeq(1))
        lp.addConstraint(LinExpr(1, "x").constraintGeq(3))
        t, _ = lp_tableau(lp)
        with pytest.raises(ValueError, match="infeasible"):
            Simplex(t)

    def test_infeasible_status_mode(self):
        lp = LinProg()
        lp.addVar("x")
        lp.minimize(LinExpr(1, "x"))
        lp.addConstraint(LinExpr(1, "x").constraintLeq(1))
        lp.addConstraint(LinExpr(1, "x").constraintGeq(3))
        t, _ = lp_tableau(lp)
        sx = Simplex(t, on_infeasible="status")
        assert sx.getStatus() is SolveStatus.INFEASIBLE

    def test_redundant_constraints_fixed(self):
        # reference bug #1: duplicate constraint corrupted the row count
        lp = LinProg()
        lp.addVar("x")
        lp.addVar("y")
        lp.maximize(LinExpr(1, "x", 1, "y"))
        lp.addConstraint(LinExpr(1, "x", 1, "y").constraintLeq(4))
        lp.addConstraint(LinExpr(1, "x", 1, "y").constraintEq(4))
        lp.addConstraint(LinExpr(2, "x", 2, "y").constraintEq(8))
        t, _ = lp_tableau(lp)
        sx = Simplex(t)
        assert sx.solve() is SolveStatus.OPTIMAL
        assert sx.getObjValue() == -4
        # dependent row was removed
        assert t.getNumCons() < 3


class TestSolve:
    def test_textbook_optimum(self):
        sx = Simplex(parse_grid(TEXTBOOK))
        assert sx.solve() is SolveStatus.OPTIMAL
        assert sx.getObjValue() == -400
        assert sx.getBFSNames() == {"x1": 4, "x2": 8}

    def test_all_rules_same_objective(self):
        for rule in ["dantzig", "bland", "max_increase"]:
            sx = Simplex(parse_grid(TEXTBOOK))
            assert sx.solve(rule=rule) is SolveStatus.OPTIMAL, rule
            assert sx.getObjValue() == -400, rule

    def test_unknown_rule(self):
        with pytest.raises(ValueError):
            Simplex(parse_grid(TEXTBOOK)).solve(rule="nope")

    def test_beale_anticycling(self):
        sx = Simplex(beale_tableau())
        assert sx.solve() is SolveStatus.OPTIMAL
        assert sx.getObjValue() == F(-1, 20)

    def test_beale_bland_direct(self):
        sx = Simplex(beale_tableau())
        assert sx.solve(rule="bland") is SolveStatus.OPTIMAL
        assert sx.getObjValue() == F(-1, 20)

    def test_unbounded_returns_status(self):
        # reference bug #4: crashed with AssertionError
        lp = LinProg()
        lp.addVar("x")
        lp.minimize(LinExpr(-1, "x"))
        lp.addConstraint(LinExpr(1, "x").constraintGeq(1))
        t, _ = lp_tableau(lp)
        sx = Simplex(t)
        assert sx.solve() is SolveStatus.UNBOUNDED

    def test_iteration_limit(self):
        sx = Simplex(parse_grid(TEXTBOOK))
        assert sx.solve(max_pivots=1) is SolveStatus.ITERATION_LIMIT

    def test_degenerate_lp(self):
        lp = LinProg()
        lp.addVar("x")
        lp.addVar("y")
        lp.maximize(LinExpr(1, "x", 1, "y"))
        lp.addConstraint(LinExpr(1, "x").constraintLeq(0))
        lp.addConstraint(LinExpr(1, "x", 1, "y").constraintLeq(2))
        t, _ = lp_tableau(lp)
        sx = Simplex(t)
        assert sx.solve() is SolveStatus.OPTIMAL
        assert sx.getObjValue() == -2


class TestPivotRules:
    def test_standard_most_negative_first_tie(self):
        sx = Simplex(parse_grid(TEXTBOOK))
        res = sx.findPivotStandard()
        # most negative cost is -40 (col 0); min ratio rows: 12/1=12, 16/2=8 -> row 1
        assert res == (1, 0)
        assert sx.num_pivots == 0  # do_pivot defaulted off

    def test_min_index_first_negative(self):
        sx = Simplex(parse_grid(TEXTBOOK))
        assert sx.findPivotMinIndex() == (1, 0)

    def test_max_increase(self):
        sx = Simplex(parse_grid(TEXTBOOK))
        # col0: ratio 8, dec 320; col1: ratio 12, dec 360 -> picks col 1
        assert sx.findPivotMaxIncrease() == (0, 1)

    def test_find_all_enumerates_min_ratio_sets(self):
        sx = Simplex(parse_grid(TEXTBOOK))
        allp = sx.findPivotAll()
        assert (1, 0) in allp and (0, 1) in allp
        assert (0, 0) not in allp  # fails min ratio for col 0

    def test_optimal_and_unbounded_returns(self):
        t = parse_grid(TEXTBOOK)
        sx = Simplex(t)
        sx.solve()
        assert sx.findPivotStandard() == "optimal"
        lp = LinProg()
        lp.addVar("x")
        lp.minimize(LinExpr(-1, "x"))
        lp.addConstraint(LinExpr(-1, "x").constraintLeq(1))
        t2, _ = lp_tableau(lp)
        sx2 = Simplex(t2)
        assert sx2.findPivotStandard() == "unbounded"

    def test_do_pivot_applies(self):
        sx = Simplex(parse_grid(TEXTBOOK))
        res = sx.findPivotStandard(do_pivot=True)
        assert res == (1, 0)
        assert sx.num_pivots == 1
        assert sx.getBasicSequence()[1] == 0


class TestCheckedPivot:
    def test_valid_pivot(self):
        sx = Simplex(parse_grid(TEXTBOOK))
        sx.pivot(1, 0)
        assert sx.getBasicSequence() == [2, 0]

    def test_ratio_violating_pivot_refused(self):
        sx = Simplex(parse_grid(TEXTBOOK))
        with pytest.raises(ValueError, match="min ratio"):
            sx.pivot(0, 0)  # row 0 ratio 12 > min 8

    def test_nonpositive_entry_refused(self):
        sx = Simplex(parse_grid(TEXTBOOK))
        t = sx.getTableau()
        t.setAij(0, 1, -1)
        with pytest.raises(ValueError):
            sx.pivot(0, 1)


class TestAccessors:
    def test_bfs_and_names(self):
        sx = Simplex(parse_grid(TEXTBOOK))
        sx.solve()
        assert sx.getBFS() == {1: 8, 0: 4}
        assert sx.getBasicSequenceNames() == ["x2", "x1"]
        assert sx.getBFSNames() == {"x2": 8, "x1": 4}
        # basic sequence is a copy (reference leaked the live list)
        sx.getBasicSequence()[0] = 99
        assert sx.getBasicSequence()[0] != 99

    def test_str_contains_bfs(self):
        sx = Simplex(parse_grid(TEXTBOOK))
        sx.solve()
        s = str(sx)
        assert "BFS" in s and "x1" in s

    def test_copy_mode_detaches(self):
        t = parse_grid(TEXTBOOK)
        sx = Simplex(t, copy=True)
        sx.solve()
        assert t.getZ() == 0  # original untouched
