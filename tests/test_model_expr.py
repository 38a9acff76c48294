"""LinExpr: construction, algebra, evaluate/substitute, constraint builders.

Mirrors the reference's coverage (test_linexpr.py) including the
eval(repr) round-trip and algebraic-identity chains, plus the scalar
multiplication extension.
"""

from fractions import Fraction as F

import pytest

from tpulp import LinExpr, LinCon


def test_empty():
    e = LinExpr()
    assert e.getConstant() == 0
    assert e.variables() == ()
    assert e == 0
    assert e.isConstant()


def test_vararg_construction_and_coercion():
    e = LinExpr(2, "x", "2/3", "y", F(1, 2))
    assert e.getCoefficient("x") == 2
    assert e.getCoefficient("y") == F(2, 3)
    assert e.getCoefficient("zzz") == 0
    assert e.getConstant() == F(1, 2)


def test_constant_only():
    assert LinExpr(5) == 5
    assert LinExpr("7/3").getConstant() == F(7, 3)


def test_duplicate_terms_merge_and_zero_removal():
    e = LinExpr(2, "x", -2, "x", 3, "y")
    assert e.getCoefficient("x") == 0
    assert e.variables() == ("y",)


def test_invalid_names():
    with pytest.raises(ValueError):
        LinExpr(1, "1bad")
    with pytest.raises(ValueError):
        LinExpr(1, "has space")
    with pytest.raises(TypeError):
        LinExpr(1, 2)


def test_eq_scalar_and_expr():
    assert LinExpr(3) == 3
    assert LinExpr(1, "x") != 1
    assert LinExpr(1, "x", 2) == LinExpr(1, "x") + 2
    assert LinExpr(1, "x") != LinExpr(1, "y")


def test_copy_independent():
    e = LinExpr(1, "x", 5)
    c = e.copy()
    c += LinExpr(1, "y")
    assert e.variables() == ("x",)
    assert c.variables() == ("x", "y")


def test_repr_round_trip():
    for e in [
        LinExpr(),
        LinExpr(5),
        LinExpr("2/3", "x"),
        LinExpr(-1, "a", "7/2", "b", "-4/5"),
    ]:
        assert eval(repr(e), {"LinExpr": LinExpr}) == e


def test_str_sorted_and_signs():
    e = LinExpr(-1, "b", 2, "a", -3)
    assert str(e) == "2*a - b - 3"
    assert str(LinExpr()) == "0"
    assert str(LinExpr(1, "x")) == "x"
    assert str(LinExpr(-1, "x")) == "-x"


def test_algebra_identities():
    a = LinExpr(2, "x", 1)
    b = LinExpr(3, "y", -1)
    assert a + b == LinExpr(2, "x", 3, "y")
    assert a - b == LinExpr(2, "x", -3, "y", 2)
    assert -a == LinExpr(-2, "x", -1)
    assert +a == a
    assert a + 5 == LinExpr(2, "x", 6)
    assert 5 + a == LinExpr(2, "x", 6)
    assert 5 - a == LinExpr(-2, "x", 4)
    assert a - a == 0


def test_inplace_ops():
    e = LinExpr(1, "x")
    e += LinExpr(1, "y", 2)
    e -= 1
    assert e == LinExpr(1, "x", 1, "y", 1)
    e -= LinExpr(1, "x")
    assert e == LinExpr(1, "y", 1)


def test_scalar_mul_div_extension():
    e = LinExpr(2, "x", 4)
    assert e * F(1, 2) == LinExpr(1, "x", 2)
    assert 3 * e == LinExpr(6, "x", 12)
    assert e / 2 == LinExpr(1, "x", 2)
    assert e * 0 == 0
    with pytest.raises(ZeroDivisionError):
        e / 0


def test_constraint_builders():
    e = LinExpr(1, "x")
    c = e.constraintLeq(5)
    assert isinstance(c, LinCon)
    assert c.comp == "<="
    assert c.right == LinExpr(5)
    assert e.constraintGeq(0).comp == ">="
    assert e.constraintEq(LinExpr(1, "y")).comp == "=="
    # reference-typo compatibility alias
    assert e.constrantEq(1).comp == "=="


def test_evaluate():
    e = LinExpr(2, "x", -1, "y", 3)
    assert e.evaluate({"x": 1, "y": "1/2"}) == F(9, 2)


def test_substitute_scalar_and_expr():
    e = LinExpr(2, "x", 1, "y", 1)
    s = e.substitute({"x": 3})
    assert s == LinExpr(1, "y", 7)
    s2 = e.substitute({"x": LinExpr(1, "u", -1, "v")})
    assert s2 == LinExpr(2, "u", -2, "v", 1, "y", 1)
    # unmapped vars remain
    assert e.substitute({}) == e
    # substitution does not mutate
    assert e.getCoefficient("x") == 2
