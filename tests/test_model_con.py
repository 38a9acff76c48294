"""LinCon: coercion (both sides — reference bug #3 fixed), reverse, simplify,
evaluate, side editors."""

from fractions import Fraction as F

import pytest

from tpulp import LinCon, LinExpr


def test_both_sides_coerced():
    # the reference left .right as a raw str here (linprog.py:235-238)
    c = LinCon(LinExpr(1, "x"), "<=", "5")
    assert isinstance(c.right, LinExpr)
    assert c.right == 5
    c2 = LinCon("3", ">=", LinExpr(1, "y"))
    assert isinstance(c2.left, LinExpr)
    assert c2.left == 3


def test_bad_comparator():
    with pytest.raises(ValueError):
        LinCon(LinExpr(1, "x"), "<", 5)


def test_eq_and_copy():
    a = LinCon(LinExpr(1, "x"), "<=", 5)
    b = LinCon(LinExpr(1, "x"), "<=", 5)
    assert a == b
    assert a != LinCon(LinExpr(1, "x"), ">=", 5)
    c = a.copy()
    c.addLeft(1)
    assert a.left == LinExpr(1, "x")


def test_reverse():
    c = LinCon(LinExpr(1, "x"), "<=", LinExpr(1, "y", 2))
    r = c.reverse()
    assert r.comp == ">="
    assert r.left == LinExpr(1, "y", 2)
    assert r.right == LinExpr(1, "x")
    assert LinCon(1, "==", 1).reverse().comp == "=="


def test_simplify_vars_left_const_right():
    c = LinCon(LinExpr(2, "x", 3), "<=", LinExpr(1, "y", 10))
    s = c.simplify()
    assert s.left == LinExpr(2, "x", -1, "y")
    assert s.comp == "<="
    assert s.right == LinExpr(7)
    assert s.left.getConstant() == 0


def test_evaluate_truth_table():
    c = LinCon(LinExpr(1, "x"), "<=", 5)
    assert c.evaluate({"x": 5})
    assert c.evaluate({"x": "9/2"})
    assert not c.evaluate({"x": 6})
    e = LinCon(LinExpr(1, "x"), "==", LinExpr(1, "y"))
    assert e.evaluate({"x": F(1, 3), "y": "1/3"})
    assert not e.evaluate({"x": 1, "y": 2})
    g = LinCon(LinExpr(1, "x"), ">=", 0)
    assert g.evaluate({"x": 0})
    assert not g.evaluate({"x": -1})


def test_side_editors():
    c = LinCon(LinExpr(1, "x"), "<=", 5)
    c.addLeft(LinExpr(1, "y"))
    c.addRight(2)
    c.subLeft(1)
    c.subRight(LinExpr(1, "z"))
    assert c.left == LinExpr(1, "x", 1, "y", -1)
    assert c.right == LinExpr(-1, "z", 7)


def test_repr_round_trip():
    c = LinCon(LinExpr("2/3", "x"), ">=", LinExpr(1, "y", "-1/2"))
    assert eval(repr(c), {"LinCon": LinCon, "LinExpr": LinExpr}) == c


def test_str():
    c = LinCon(LinExpr(1, "x"), "<=", 5)
    assert str(c) == "x <= 5"
