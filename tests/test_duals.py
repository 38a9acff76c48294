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


def _kkt_verify(prog, sol):
    """Full KKT + strong-duality verification of original-space sensitivity
    output (exact rationals). ``sol.duals`` follows the
    original_sensitivity convention: {row index: d(objective)/d(rhs)} of
    the canonical 'vars comp const' form, ORIGINAL sense."""
    from tpulp.model.prog import MAX

    sense = F(-1) if prog.objective.sense == MAX else F(1)
    x = {k: F(v) for k, v in sol.x.items()}
    obj_expr = prog.objective.expr
    # stationarity residual in the min frame must equal sense * reduced_cost
    for name in prog.allVarNames():
        d_min = sense * obj_expr.getCoefficient(name)
        for i, con in enumerate(prog.constraints):
            s = con.simplify()
            a = s.left.getCoefficient(name)
            if a:
                d_min -= sense * F(sol.duals[i]) * a
        assert d_min == sense * F(sol.reduced_costs[name]), name
        # interior variables have zero reduced cost; at-bound signs
        v = prog.vars.get(name)
        lb = v.lb if v is not None else F(0)
        ub = v.ub if v is not None else None
        x_j = x.get(name, F(0))
        at_lb = lb is not None and x_j == lb
        at_ub = ub is not None and x_j == ub
        if not at_lb and not at_ub:
            assert d_min == 0, (name, d_min)
        elif d_min != 0:
            assert (at_lb and d_min > 0) or (at_ub and d_min < 0), (
                name, d_min, at_lb, at_ub)
    # per-row: sign feasibility + complementary slackness (min frame:
    # '<=' rows have y_min <= 0, '>=' rows >= 0; slack rows y = 0)
    for i, con in enumerate(prog.constraints):
        s = con.simplify()
        y_min = sense * F(sol.duals[i])
        lhs = s.left.evaluate(x)
        rhs = s.right.getConstant()
        if s.comp == "<=":
            assert y_min <= 0, i
            if lhs != rhs:
                assert y_min == 0, i
        elif s.comp == ">=":
            assert y_min >= 0, i
            if lhs != rhs:
                assert y_min == 0, i
    # strong duality: obj = sum y_min rhs_i + sum d_min_j x_j + const
    z_min = sense * F(sol.objective)
    total = sense * obj_expr.getConstant()
    for i, con in enumerate(prog.constraints):
        s = con.simplify()
        total += sense * F(sol.duals[i]) * s.right.getConstant()
    for name in prog.allVarNames():
        total += sense * F(sol.reduced_costs[name]) * x.get(name, F(0))
    assert total == z_min, (total, z_min)


class TestDualsThroughPresolve:
    """VERDICT r3 item 7: presolve=True + duals=True compose — reduced-row
    duals are mapped back to ORIGINAL rows and verified by exact KKT."""

    def _reducible(self):
        """max 3x + 2y + 5f: fixed f (singleton == row), a redundant
        duplicate row, and a singleton <= row that binds x."""
        lp = LinProg()
        lp.addVar("x", lb=0)
        lp.addVar("y", lb=0)
        lp.addVar("f", lb=0, ub=10)
        lp.maximize(LinExpr(3, "x", 2, "y", 5, "f"))
        lp.addConstraint(LinExpr(1, "x", 1, "y").constraintLeq(8))    # 0
        lp.addConstraint(LinExpr(2, "x", 2, "y").constraintLeq(30))   # 1 dup/slack
        lp.addConstraint(LinExpr(1, "f").constraintEq(2))             # 2 fixes f
        lp.addConstraint(LinExpr(1, "x").constraintLeq(3))            # 3 binds x
        return lp

    def test_reducible_program_kkt(self):
        lp = self._reducible()
        plain = lp.solve(duals=True)
        pre = lp.solve(presolve=True, duals=True)
        assert pre.status == plain.status == "optimal"
        assert pre.objective == plain.objective == 3 * 3 + 2 * 5 + 5 * 2
        assert pre.duals is not None and pre.reduced_costs is not None
        _kkt_verify(lp, pre)
        # the fixed variable's constraint carries its shadow price: raising
        # the f == 2 rhs by 1 adds 5 to the max objective
        assert pre.duals[2] == 5
        # the binding singleton row on x absorbs x's residual: c_x - y_0
        assert pre.duals[3] == 3 - pre.duals[0]

    def test_presolve_duals_match_no_presolve_on_fixture(self):
        import os

        from tpulp.io.mps import read_mps

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data", "mps", "redund.mps")
        lp = read_mps(path)
        pre = lp.solve(presolve=True, duals=True)
        assert pre.status == "optimal" and pre.objective == -169
        _kkt_verify(lp, pre)

    def test_corpus_presolve_duals_kkt(self):
        from tpulp.corpus import CASES

        checked = 0
        for c in CASES:
            if c.status != "optimal" or c.size_hint > 24:
                continue
            lp = c.lp()
            pre = lp.solve(presolve=True, duals=True)
            assert pre.status == "optimal", c.name
            assert pre.objective == c.objective, c.name
            if pre.duals is None:
                continue  # pure-LP fallthrough without sensitivity
            _kkt_verify(lp, pre)
            checked += 1
        assert checked >= 5

    def test_fully_presolved_program_still_reports_duals(self):
        lp = LinProg()
        lp.addVar("a", lb=0, ub=4)
        lp.maximize(LinExpr(2, "a"))
        lp.addConstraint(LinExpr(1, "a").constraintEq(3))
        sol = lp.solve(presolve=True, duals=True)
        assert sol.status == "optimal" and sol.objective == 6
        assert sol.duals[0] == 2  # d(obj)/d(rhs) of a == 3
        _kkt_verify(lp, sol)
