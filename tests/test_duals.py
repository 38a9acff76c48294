"""Row duals (shadow prices): y = B^-T c_B reported via solve_lp(duals=True).

Oracle: the textbook LP's known duals, plus the strong-duality identity
y . b == z_min on every corpus case (exact Fractions both sides)."""

from fractions import Fraction as F

import pytest

from tpulp import LinExpr, LinProg
from tpulp.solve import solve_lp


def textbook_lp():
    lp = LinProg()
    lp.addVar("x1")
    lp.addVar("x2")
    lp.maximize(LinExpr(40, "x1", 30, "x2"))
    lp.addConstraint(LinExpr(1, "x1", 1, "x2").constraintLeq(12))
    lp.addConstraint(LinExpr(2, "x1", 1, "x2").constraintLeq(16))
    return lp


class TestDuals:
    def test_textbook_shadow_prices(self):
        sol = solve_lp(textbook_lp(), duals=True)
        assert sol.status == "optimal" and sol.y is not None
        # min form: z = -40x1 - 30x2; duals of the two <= rows are -20, -10
        # (raising capacity 1 by 1 changes max profit by +20 -> min obj -20)
        assert sol.y == [F(-20), F(-10)]

    def test_strong_duality_identity_on_corpus(self):
        from tpulp.corpus import CASES

        checked = 0
        for c in CASES:
            if c.status != "optimal":
                continue
            sf = c.lp().lower()
            if sf.m > 64:
                continue  # keep the exact identity check quick
            sol = solve_lp(sf, duals=True)
            assert sol.status == "optimal", c.name
            # y . b + obj_const == z_min, exactly
            zdual = sf.obj_const + sum(
                (yi * bi for yi, bi in zip(sol.y, sf.b)), F(0))
            assert zdual == sol.objective_min, c.name
            checked += 1
        assert checked >= 8

    def test_duals_off_by_default(self):
        sol = solve_lp(textbook_lp())
        assert sol.y is None


class TestOriginalSensitivity:
    """Duals/reduced costs mapped to the USER's problem (VERDICT r2 item 8):
    original sense, original constraint identities, original variables."""

    def test_textbook_original_sense_shadow_prices(self):
        lp = LinProg()
        lp.addVar("x1")
        lp.addVar("x2")
        lp.maximize(LinExpr(40, "x1", 30, "x2"))
        lp.addConstraint(
            LinExpr(1, "x1", 1, "x2").constraintLeq(12), name="cap1")
        lp.addConstraint(
            LinExpr(2, "x1", 1, "x2").constraintLeq(16), name="cap2")
        sol = solve_lp(lp, duals=True)
        assert sol.status == "optimal"
        # MAX sense: one more unit of cap1 is worth +20 profit, cap2 +10
        assert sol.duals["cap1"] == F(20)
        assert sol.duals["cap2"] == F(10)
        assert sol.duals[0] == F(20) and sol.duals[1] == F(10)
        # both variables basic at the optimum -> reduced cost exactly 0
        assert sol.reduced_costs == {"x1": F(0), "x2": F(0)}

    def test_nonbasic_variable_prices_out(self):
        lp = LinProg()
        lp.addVar("x1")
        lp.addVar("x2")
        lp.addVar("x3")                      # too cheap to enter
        lp.maximize(LinExpr(40, "x1", 30, "x2", 5, "x3"))
        lp.addConstraint(
            LinExpr(1, "x1", 1, "x2", 1, "x3").constraintLeq(12), name="c1")
        lp.addConstraint(
            LinExpr(2, "x1", 1, "x2", 1, "x3").constraintLeq(16), name="c2")
        sol = solve_lp(lp, duals=True)
        assert sol.status == "optimal" and sol.objective == 400
        assert sol.x["x3"] == 0
        # MAX sense: nonbasic x3's reduced cost is 5 - (20 + 10) = -25 <= 0
        assert sol.reduced_costs["x3"] == F(-25)
        assert sol.reduced_costs["x1"] == 0 and sol.reduced_costs["x2"] == 0

    def test_negated_row_sign_corrected(self):
        # a >= row with positive rhs written as <= with negative rhs: the
        # lowering negates it for b >= 0; the mapped dual must negate back
        lp = LinProg()
        lp.addVar("x")
        lp.addVar("y")
        lp.minimize(LinExpr(3, "x", 2, "y"))
        lp.addConstraint(
            LinExpr(-1, "x", -1, "y").constraintLeq(-10), name="need")
        sol = solve_lp(lp, duals=True)
        assert sol.status == "optimal" and sol.objective == 20
        # canonical form: -x - y <= -10; raising the rhs by 1 (to -9)
        # relaxes the requirement to x + y >= 9 -> objective drops by 2
        assert sol.duals["need"] == F(-2)
        assert sol.reduced_costs["y"] == 0        # basic
        assert sol.reduced_costs["x"] == F(1)     # 3 - (-1)(-2) = 1 >= 0

    def test_min_sense_transport_duals(self):
        # balanced 2x2 transportation: duals satisfy u_i + v_j = c_ij on
        # basic cells (complementary slackness pin)
        lp = LinProg()
        for i in range(2):
            for j in range(2):
                lp.addVar(f"t{i}{j}", lb=0)
        lp.minimize(LinExpr(4, "t00", 6, "t01", 5, "t10", 3, "t11"))
        lp.addConstraint(
            LinExpr(1, "t00", 1, "t01").constrantEq(10), name="s0")
        lp.addConstraint(
            LinExpr(1, "t10", 1, "t11").constrantEq(15), name="s1")
        lp.addConstraint(
            LinExpr(1, "t00", 1, "t10").constrantEq(12), name="d0")
        lp.addConstraint(
            LinExpr(1, "t01", 1, "t11").constrantEq(13), name="d1")
        sol = solve_lp(lp, duals=True)
        assert sol.status == "optimal"
        assert sol.objective == 4 * 10 + 5 * 2 + 3 * 13  # x00=10,x10=2,x11=13
        u0, u1 = sol.duals["s0"], sol.duals["s1"]
        v0, v1 = sol.duals["d0"], sol.duals["d1"]
        # basic cells price exactly
        assert u0 + v0 == 4 and u1 + v0 == 5 and u1 + v1 == 3
        # nonbasic t01 has nonnegative reduced cost 6 - (u0 + v1)
        assert sol.reduced_costs["t01"] == 6 - (u0 + v1)
        assert sol.reduced_costs["t01"] >= 0

    def test_mps_row_names_key_duals(self):
        import os

        from tpulp.io.mps import read_mps

        data = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data", "mps")
        lp = read_mps(os.path.join(data, "transp45.mps"))
        sol = solve_lp(lp, duals=True)
        assert sol.status == "optimal"
        # every MPS row name keys a dual value
        for nm in lp.mps_row_names:
            assert nm in sol.duals
        # strong duality over the named duals: sum(dual * rhs) == objective
        tot = F(0)
        for ci, con in enumerate(lp.constraints):
            tot += sol.duals[ci] * con.simplify().right.getConstant()
        assert tot == sol.objective
