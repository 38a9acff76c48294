"""LinVar: bounds, integer snapping, tightening, feasibility.

Mirrors the reference's exhaustive continuous/integral bound grid
(test_linvar.py:12-36) including the golden snapping cases
R[1/3,4/3]->Z[1,1] and R[1/5,4/5]->infeasible Z[1,0]."""

from fractions import Fraction as F

import pytest

from tpulp import LinVar


def test_defaults_free_continuous():
    v = LinVar("x")
    assert v.getBounds() == (None, None)
    assert not v.isint
    assert v.isFeasible()


def test_invalid_name():
    with pytest.raises(ValueError):
        LinVar("2x")
    with pytest.raises(ValueError):
        LinVar("")


@pytest.mark.parametrize(
    "lb,ub,explb,expub",
    [
        (None, None, None, None),
        (0, None, 0, None),
        (None, "7/2", None, F(7, 2)),
        ("-1/2", "1/2", F(-1, 2), F(1, 2)),
        (3, 3, 3, 3),
    ],
)
def test_continuous_bounds(lb, ub, explb, expub):
    v = LinVar("x", False, lb, ub)
    assert v.getBounds() == (explb, expub)


@pytest.mark.parametrize(
    "lb,ub,explb,expub,feasible",
    [
        ("1/3", "4/3", 1, 1, True),       # golden: R[1/3,4/3] -> Z[1,1]
        ("1/5", "4/5", 1, 0, False),      # golden: snaps to empty Z[1,0]
        ("-5/2", "5/2", -2, 2, True),
        (2, 2, 2, 2, True),
        (None, "-1/2", None, -1, True),
        ("9/4", None, 3, None, True),
    ],
)
def test_integer_snapping(lb, ub, explb, expub, feasible):
    v = LinVar("n", True, lb, ub)
    got_lb, got_ub = v.getBounds()
    assert got_lb == (None if explb is None else F(explb))
    assert got_ub == (None if expub is None else F(expub))
    assert v.isFeasible() == feasible


def test_tightening_only():
    v = LinVar("x", False, 0, 10)
    v.boundBelow(-5)        # looser: no-op
    assert v.lb == 0
    v.boundBelow(2)
    assert v.lb == 2
    v.boundAbove(20)        # looser: no-op
    assert v.ub == 10
    v.boundAbove("15/2")
    assert v.ub == F(15, 2)


def test_tightening_snaps_integers():
    v = LinVar("n", True)
    v.boundBelow("1/2")
    assert v.lb == 1
    v.boundAbove("7/2")
    assert v.ub == 3
    # branch step: n <= 2 after relaxation value 2.4
    v.boundAbove("12/5")
    assert v.ub == 2


def test_infeasible_interval():
    v = LinVar("x", False, 3, 2)
    assert not v.isFeasible()
    assert LinVar("x", False, 2, 2).isFeasible()


def test_is_fixed():
    assert LinVar("x", False, 2, 2).isFixed()
    assert not LinVar("x", False, 2, 3).isFixed()
    assert not LinVar("x").isFixed()


def test_str_format():
    assert str(LinVar("x", True, 1, 1)) == "x@Z[1,1]"
    assert str(LinVar("x")) == "x@R[-inf,+inf]"
    assert str(LinVar("y", False, "-1/2", None)) == "y@R[-1/2,+inf]"


def test_repr_round_trip():
    for v in [
        LinVar("x"),
        LinVar("y", True, 0, 5),
        LinVar("z", False, "-1/2", "7/3"),
    ]:
        assert eval(repr(v), {"LinVar": LinVar}) == v


def test_copy_and_eq():
    v = LinVar("x", True, 0, 5)
    c = v.copy()
    assert c == v
    c.boundAbove(3)
    assert v.ub == 5
    assert c != v
