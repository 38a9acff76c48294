"""LinProg container + standard-form lowering.

The reference never implemented either (LinProg stub, linprog.py:383-394);
these tests pin down the new design: every bound pattern, sense flip, slack /
surplus insertion, sign normalization, recovery maps, and the fixed-shape
integer bound rows used by batched branch-and-bound."""

from fractions import Fraction as F

import pytest

from tpulp import LinCon, LinExpr, LinProg, LinVar, lower_to_standard_form
from tpulp.model.lower import LoweringError


def _solve_exact(sf):
    """Host-oracle solve of a StandardForm; returns (status, obj, var dict)."""
    from tpulp import Simplex, Tableau

    tab = Tableau.fromArrays(sf.c, sf.A, sf.b, names=sf.col_names)
    sx = Simplex(tab, on_infeasible="status")
    if sx.getStatus() is not None:
        return sx.getStatus().value, None, None
    status = sx.solve()
    xc = [sx.getBFS().get(j, F(0)) for j in range(sf.n)]
    return status.value, sf.objective_value(xc), sf.recover_solution(xc)


def test_textbook_max_lp():
    lp = LinProg()
    lp.addVar("x1")
    lp.addVar("x2")
    lp.maximize(LinExpr(40, "x1", 30, "x2"))
    lp.addConstraint(LinExpr(1, "x1", 1, "x2").constraintLeq(12))
    lp.addConstraint(LinExpr(2, "x1", 1, "x2").constraintLeq(16))
    sf = lp.lower()
    assert sf.n_struct == 2
    assert sf.basis_hint == [2, 3]  # both <= rows got identity slacks
    status, obj, sol = _solve_exact(sf)
    assert status == "optimal"
    assert obj == 400
    assert sol == {"x1": 4, "x2": 8}


def test_sense_preserved_min():
    lp = LinProg()
    lp.addVar("x", lb=1)
    lp.minimize(LinExpr(3, "x", 7))
    sf = lp.lower()
    status, obj, sol = _solve_exact(sf)
    assert status == "optimal"
    assert obj == 10  # 3*1 + 7, via the lb shift constant
    assert sol["x"] == 1


def test_free_variable_split():
    lp = LinProg()
    lp.addVariable(LinVar("x"))  # free
    lp.minimize(LinExpr(1, "x"))
    lp.addConstraint(LinExpr(1, "x").constraintGeq(-5))
    sf = lp.lower()
    assert "x+" in sf.col_names and "x-" in sf.col_names
    status, obj, sol = _solve_exact(sf)
    assert status == "optimal"
    assert obj == -5
    assert sol["x"] == -5


def test_upper_bounded_only_var():
    # x <= 3, free below: substitution x = 3 - t
    lp = LinProg()
    lp.addVariable(LinVar("x", False, None, 3))
    lp.maximize(LinExpr(2, "x"))
    sf = lp.lower()
    status, obj, sol = _solve_exact(sf)
    assert status == "optimal"
    assert obj == 6
    assert sol["x"] == 3


def test_boxed_var_bound_row():
    lp = LinProg()
    lp.addVar("x", lb=1, ub=4)
    lp.maximize(LinExpr(1, "x"))
    sf = lp.lower()
    status, obj, sol = _solve_exact(sf)
    assert status == "optimal"
    assert obj == 4
    assert sol["x"] == 4


def test_fixed_var_substituted():
    lp = LinProg()
    lp.addVar("x", lb=2, ub=2)
    lp.addVar("y")
    lp.minimize(LinExpr(1, "x", 1, "y"))
    lp.addConstraint(LinExpr(1, "y").constraintGeq(LinExpr(1, "x")))
    sf = lp.lower()
    assert "x" not in sf.col_names  # eliminated
    status, obj, sol = _solve_exact(sf)
    assert status == "optimal"
    assert obj == 4
    assert sol["x"] == 2 and sol["y"] == 2


def test_negative_rhs_sign_normalized():
    lp = LinProg()
    lp.addVar("x")
    lp.minimize(LinExpr(1, "x"))
    # -x <= -3  ==  x >= 3
    lp.addConstraint(LinExpr(-1, "x").constraintLeq(-3))
    sf = lp.lower()
    assert all(v >= 0 for v in sf.b)
    status, obj, sol = _solve_exact(sf)
    assert status == "optimal"
    assert obj == 3


def test_equality_constraint():
    lp = LinProg()
    lp.addVar("x")
    lp.addVar("y")
    lp.minimize(LinExpr(1, "x", 2, "y"))
    lp.addConstraint(LinExpr(1, "x", 1, "y").constraintEq(10))
    sf = lp.lower()
    status, obj, sol = _solve_exact(sf)
    assert status == "optimal"
    assert obj == 10
    assert sol["x"] == 10 and sol["y"] == 0


def test_trivially_infeasible_bounds():
    lp = LinProg()
    lp.addVar("x", lb=5, ub=2)
    lp.minimize(LinExpr(1, "x"))
    sf = lp.lower()
    assert sf.trivially_infeasible


def test_constant_constraint_infeasible():
    lp = LinProg()
    lp.addVar("x")
    lp.minimize(LinExpr(1, "x"))
    lp.addConstraint(LinCon(LinExpr(1), "==", LinExpr(2)))
    sf = lp.lower()
    assert sf.trivially_infeasible


def test_constant_constraint_satisfied_dropped():
    lp = LinProg()
    lp.addVar("x")
    lp.minimize(LinExpr(1, "x"))
    lp.addConstraint(LinCon(LinExpr(1), "<=", LinExpr(2)))
    lp.addConstraint(LinExpr(1, "x").constraintGeq(1))
    sf = lp.lower()
    assert not sf.trivially_infeasible
    assert sf.m == 1


def test_undeclared_vars_default_free():
    lp = LinProg()
    lp.minimize(LinExpr(1, "x"))
    lp.addConstraint(LinExpr(1, "x").constraintGeq(-7))
    sf = lp.lower()
    status, obj, _ = _solve_exact(sf)
    assert status == "optimal"
    assert obj == -7


def test_rational_coefficients_exact():
    lp = LinProg()
    lp.addVar("x")
    lp.maximize(LinExpr("1/3", "x"))
    lp.addConstraint(LinExpr("2/7", "x").constraintLeq("5/11"))
    sf = lp.lower()
    status, obj, sol = _solve_exact(sf)
    assert status == "optimal"
    assert sol["x"] == F(35, 22)
    assert obj == F(35, 66)


def test_integer_bound_rows_shape_invariance():
    lp = LinProg()
    lp.addVar("n", integral=True, lb=0, ub=9)
    lp.addVar("x")
    lp.maximize(LinExpr(1, "n", 1, "x"))
    lp.addConstraint(LinExpr(1, "n", 1, "x").constraintLeq(7))
    sf = lp.lower(integer_bound_rows=True) if hasattr(lp, "lower") else None
    sf = lower_to_standard_form(lp, integer_bound_rows=True)
    assert "n" in sf.int_bound_rows
    le_row, ge_row = sf.int_bound_rows["n"]
    # node data lives only in b: rows fixed, b = bound - shift
    assert sf.b[le_row] == 9
    assert sf.b[ge_row] == 0
    status, obj, sol = _solve_exact(sf)
    assert status == "optimal"
    assert obj == 7


def test_integer_without_finite_bounds_raises():
    lp = LinProg()
    lp.addVariable(LinVar("n", True, 0, None))
    lp.minimize(LinExpr(1, "n"))
    with pytest.raises(LoweringError):
        lower_to_standard_form(lp, integer_bound_rows=True)


def test_to_dense_dtypes():
    import numpy as np

    lp = LinProg()
    lp.addVar("x")
    lp.minimize(LinExpr("1/3", "x"))
    lp.addConstraint(LinExpr(1, "x").constraintLeq(1))
    sf = lp.lower()
    c, a, b = sf.to_dense(np.float64)
    assert c.dtype == np.float64
    assert a.shape == (1, 2)
    assert abs(c[0] - 1 / 3) < 1e-15


def test_prog_validation_and_str():
    lp = LinProg("p")
    lp.addVar("x")
    with pytest.raises(ValueError):
        lp.addVar("x")
    with pytest.raises(TypeError):
        lp.addConstraint("not a con")
    with pytest.raises(ValueError):
        lp.setObjective(LinExpr(1, "x"), "maximize!")
    lp.maximize(LinExpr(1, "x"))
    lp.addConstraint(LinExpr(1, "x").constraintLeq(1))
    assert "max" in str(lp)
    assert lp.isFeasiblePoint({"x": 1})
    assert not lp.isFeasiblePoint({"x": 2})


def test_prog_copy_independent():
    lp = LinProg()
    lp.addVar("x", integral=True, lb=0, ub=5)
    lp.maximize(LinExpr(1, "x"))
    lp.addConstraint(LinExpr(1, "x").constraintLeq(3))
    cp = lp.copy()
    cp.vars["x"].boundAbove(1)
    cp.addConstraint(LinExpr(1, "x").constraintGeq(0))
    assert lp.vars["x"].ub == 5
    assert len(lp.constraints) == 1
    assert lp.isMixedInteger() and cp.isMixedInteger()
