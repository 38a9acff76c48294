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
