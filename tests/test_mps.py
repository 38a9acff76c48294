"""MPS reader/writer tests.

The reference's only interchange format is its JSON tableau schema
(lpsol/tableau.py:312-360); MPS is the format real instance sets (netlib,
miplib) use, so the loader is tested against hand-checked programs with
exact oracles: parse -> lower -> solve must hit the known optimum.
"""

from fractions import Fraction

import pytest

from tpulp.io.mps import (read_mps, read_mps_string, write_mps,
                          write_mps_string)
from tpulp.model import MAX, LinExpr

# The libretexts textbook LP in MPS clothing (lpsol/test_tableau.py:7-8:
# max 40 x1 + 30 x2 s.t. x1+x2 <= 12, 2x1+x2 <= 16 -> z = 400 at (4, 8))
TEXTBOOK = """\
NAME          TEXTBOOK
OBJSENSE
    MAX
ROWS
 N  COST
 L  LIM1
 L  LIM2
COLUMNS
    X1  COST  40  LIM1  1
    X1  LIM2  2
    X2  COST  30  LIM1  1
    X2  LIM2  1
RHS
    RHS  LIM1  12  LIM2  16
ENDATA
"""

KNAPSACK = """\
* a 0/1 knapsack: max 10a+13b+7c, 3a+4b+2c <= 6
NAME KNAP
OBJSENSE MAX
ROWS
 N  obj
 L  cap
COLUMNS
    MK1  'MARKER'  'INTORG'
    a  obj  10  cap  3
    b  obj  13  cap  4
    c  obj  7   cap  2
    MK2  'MARKER'  'INTEND'
RHS
    R  cap  6
BOUNDS
 BV BND  a
 BV BND  b
 BV BND  c
ENDATA
"""


def test_textbook_parse_and_solve():
    lp = read_mps_string(TEXTBOOK)
    assert lp.name == "TEXTBOOK"
    assert lp.objective.sense == MAX
    assert len(lp.constraints) == 2
    sol = lp.solve()
    assert sol.status == "optimal"
    assert sol.objective == 400
    assert sol.x == {"X1": 4, "X2": 8}


def test_knapsack_integer_markers():
    lp = read_mps_string(KNAPSACK)
    assert all(lp.vars[v].isint for v in ("a", "b", "c"))
    assert lp.vars["a"].getBounds() == (0, 1)
    sol = lp.solve()
    assert sol.status == "optimal"
    assert sol.objective == 20  # b + c (wt 6, val 20) beats a + c (17)


def test_objective_rhs_is_negated_constant():
    lp = read_mps_string("""\
NAME C
ROWS
 N  obj
 G  r1
COLUMNS
    x  obj  1  r1  1
RHS
    RHS  r1  3  obj  -5
ENDATA
""")
    # obj rhs -5 => constant +5; min x + 5 s.t. x >= 3 => 8
    assert lp.objective.expr.getConstant() == 5
    sol = lp.solve()
    assert sol.objective == 8


def test_ranges_two_sided_rows():
    lp = read_mps_string("""\
NAME R
ROWS
 N  obj
 L  up
 G  low
 E  eq
COLUMNS
    x  obj  1  up  1
    x  low  1  eq  1
    y  obj  1  eq  1
RHS
    RHS  up  10  low  2
    RHS  eq  4
RANGES
    RNG  up  3  low  5
    RNG  eq  -2
ENDATA
""")
    # up: 7 <= x <= 10; low: 2 <= x <= 7; eq: 2 <= x+y <= 4
    # min x + y  =>  x = 7, x+y = 2 => y = -5?  y >= 0 default => x+y >= 7
    # > 4 upper bound -> infeasible?  Check: x in [7,7]∩[2,7] = 7; x+y <= 4
    # impossible with y >= 0 -> infeasible
    sol = lp.solve()
    assert sol.status == "infeasible"

    lp2 = read_mps_string("""\
NAME R2
ROWS
 N  obj
 L  up
COLUMNS
    x  obj  1  up  1
RHS
    RHS  up  10
RANGES
    RNG  up  3
ENDATA
""")
    # 7 <= x <= 10, min x -> 7
    assert lp2.solve().objective == 7


def test_bounds_vocabulary():
    lp = read_mps_string("""\
NAME B
ROWS
 N  obj
COLUMNS
    a  obj  1
    b  obj  1
    c  obj  1
    d  obj  -1
BOUNDS
 LO BND  a  -3
 UP BND  a  9
 FX BND  b  2.5
 MI BND  c
 UP BND  d  4
ENDATA
""")
    assert lp.vars["a"].getBounds() == (-3, 9)
    assert lp.vars["b"].getBounds() == (Fraction(5, 2), Fraction(5, 2))
    assert lp.vars["c"].getBounds() == (None, None) or \
        lp.vars["c"].getBounds()[0] is None
    assert lp.vars["d"].getBounds() == (0, 4)


def test_up_negative_drops_lower_bound():
    lp = read_mps_string("""\
NAME Q
ROWS
 N  obj
COLUMNS
    x  obj  1
BOUNDS
 UP BND  x  -2
ENDATA
""")
    v = lp.vars["x"]
    assert v.lb is None and v.ub == -2
    # min x with x <= -2 and no lower bound: unbounded
    assert lp.solve().status == "unbounded"


def test_name_sanitization_round_trip():
    lp = read_mps_string("""\
NAME S
ROWS
 N  obj
 L  r.1
COLUMNS
    x.y  obj  1  r.1  1
    1z   obj  2  r.1  1
RHS
    RHS  r.1  5
ENDATA
""")
    assert set(lp.vars) == {"x_y", "_1z"}
    assert lp.mps_names["x_y"] == "x.y"
    assert lp.mps_names["_1z"] == "1z"


def test_write_read_round_trip():
    lp = read_mps_string(KNAPSACK)
    text = write_mps_string(lp)
    lp2 = read_mps_string(text)
    assert sorted(lp2.vars) == sorted(lp.vars)
    for nm in lp.vars:
        assert lp2.vars[nm].isint == lp.vars[nm].isint
        assert lp2.vars[nm].getBounds() == lp.vars[nm].getBounds()
    assert lp2.objective.sense == lp.objective.sense
    assert lp2.solve().objective == lp.solve().objective

    lp3 = read_mps_string(TEXTBOOK)
    lp4 = read_mps_string(write_mps_string(lp3))
    assert lp4.solve().objective == 400


def test_write_fractional_and_free(tmp_path):
    from tpulp.model import LinProg

    lp = LinProg("F")
    lp.addVar("x", lb=None, ub=None)           # free
    lp.addVar("y", lb=Fraction(1, 3))          # non-decimal bound
    lp.setObjective(LinExpr(1, "x", 1, "y"))
    lp.addConstraint(LinExpr(1, "x").constraintGeq(-2))
    p = tmp_path / "f.mps"
    write_mps(lp, str(p))
    lp2 = read_mps(str(p))
    assert lp2.vars["x"].getBounds() == (None, None)
    lb = lp2.vars["y"].lb
    assert abs(float(lb) - 1 / 3) < 1e-12      # float literal round-trip
    sol = lp2.solve()
    assert sol.status == "optimal"
    assert abs(float(sol.objective) - (-2 + 1 / 3)) < 1e-9


def test_file_object_io(tmp_path):
    import io as _io

    lp = read_mps(_io.StringIO(TEXTBOOK))
    assert lp.solve().objective == 400
    p = tmp_path / "t.mps"
    with open(p, "w") as f:
        write_mps(lp, f)
    assert read_mps(str(p)).solve().objective == 400


def test_errors():
    with pytest.raises(ValueError, match="no objective"):
        read_mps_string("NAME X\nROWS\n L  r\nENDATA\n")
    with pytest.raises(ValueError, match="unknown row"):
        read_mps_string("NAME X\nROWS\n N obj\nCOLUMNS\n    x  bad  1\n")
    with pytest.raises(ValueError, match="numeric"):
        read_mps_string(
            "NAME X\nROWS\n N obj\nCOLUMNS\n    x  obj  abc\n")


def test_writer_preserves_original_names():
    # advisor finding: a read -> write round trip used to lose the file's
    # variable spellings and all row names (R0..Rn); the writer now emits the
    # original identifiers recorded by the reader
    lp = read_mps_string("""\
NAME NAMES
ROWS
 N  PROFIT
 L  LIM.1
 G  MIN-USE
COLUMNS
    x.y  PROFIT  -3  LIM.1  1
    x.y  MIN-USE  1
    1z   PROFIT  -2  LIM.1  2
RHS
    RHS  LIM.1  10  MIN-USE  1
ENDATA
""")
    text = write_mps_string(lp)
    assert " N  PROFIT" in text
    assert " L  LIM.1" in text and " G  MIN-USE" in text
    assert "x.y" in text and "1z" in text
    assert "R0" not in text and "COST" not in text
    # and the rewritten file still parses to the same program
    lp2 = read_mps_string(text)
    assert lp2.solve().objective == lp.solve().objective
    assert lp2.mps_names == lp.mps_names
