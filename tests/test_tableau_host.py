"""Host exact Tableau: accessors, row ops, pivot golden replay, shape edits,
form predicates, serialization.

Uses the string-grid fixture technique from the reference's test suite
(test_tableau.py:36-48): golden tableau states written as whitespace literals,
with full-tableau equality after each pivot (including path independence)."""

from fractions import Fraction as F

import pytest

from tpulp import Tableau
from tpulp.io import format_grid, parse_grid

# The libretexts textbook LP used by the reference as its pivot golden
# (max 40x1+30x2; x1+x2<=12; 2x1+x2<=16): initial, after (1,0), optimal.
GRID_START = """
  x1    x2    _s0   _s1  | z
  -40   -30   0     0    | 0
  1     1     1     0    | 12
  2     1     0     1    | 16
"""

GRID_AFTER_10 = """
  (x1)  x2    _s0   _s1  | z
  0     -10   0     20   | 320
  0     1/2   1     -1/2 | 4
  1     1/2   0     1/2  | 8
"""

GRID_OPT = """
  (x1)  (x2)  _s0   _s1  | z
  0     0     20    10   | 400
  0     1     2     -1   | 8
  1     0     -1    1    | 4
"""


def mark_cols(tab, cols):
    for j in cols:
        tab.setVarMark(j, True)


class TestConstruction:
    def test_rejects_bad_shape(self):
        for m, n in [(0, 1), (1, 0), (-1, 2)]:
            with pytest.raises(ValueError):
                Tableau(m, n)

    def test_zero_initialized(self):
        t = Tableau(2, 3)
        assert t.getTableauSize() == (2, 3)
        assert t.getZ() == 0
        assert t.getC() == [0, 0, 0]
        assert t.getB() == [0, 0]
        assert t.getVarNames() == ["", "", ""]
        assert t.getVarMarks() == [False, False, False]

    def test_eq_requires_tableau(self):
        with pytest.raises(TypeError):
            Tableau(1, 1) == 5


class TestAccessors:
    def test_set_get_roundtrip_with_coercion(self):
        t = Tableau(2, 2)
        t.setZ("3/2")
        assert t.getZ() == F(3, 2)
        t.setC([1, "2/3"])
        assert t.getCj(1) == F(2, 3)
        t.setCj(0, -5)
        assert t.getC() == [-5, F(2, 3)]
        t.setB(["1/4", 2])
        assert t.getBi(0) == F(1, 4)
        t.setBi(1, "7")
        assert t.getB() == [F(1, 4), 7]
        t.setA([[1, 2], [3, 4]])
        t.setAij(0, 1, "5/6")
        assert t.getAij(0, 1) == F(5, 6)
        assert t.getA() == [[1, F(5, 6)], [3, 4]]

    def test_getters_return_copies_not_aliases(self):
        # the reference leaked live lists (tableau.py:86-104)
        t = Tableau(2, 2)
        t.getC()[0] = F(99)
        t.getB()[0] = F(99)
        t.getA()[0][0] = F(99)
        t.getVarNames()[0] = "hacked"
        assert t.getCj(0) == 0
        assert t.getBi(0) == 0
        assert t.getAij(0, 0) == 0
        assert t.getVarName(0) == ""

    def test_bounds_checked(self):
        t = Tableau(2, 3)
        for bad in [lambda: t.getCj(3), lambda: t.getBi(2),
                    lambda: t.getAij(0, 3), lambda: t.getAij(2, 0),
                    lambda: t.getVarName(-1), lambda: t.setCj(5, 1),
                    lambda: t.setBi(-1, 1), lambda: t.setVarMark(3, True)]:
            with pytest.raises(IndexError):
                bad()

    def test_set_vector_length_validated(self):
        t = Tableau(2, 3)
        with pytest.raises(ValueError):
            t.setC([1, 2])
        with pytest.raises(ValueError):
            t.setB([1, 2, 3])
        with pytest.raises(ValueError):
            t.setA([[1, 2, 3]])
        with pytest.raises(ValueError):
            t.setVarNames(["a"])

    def test_marks(self):
        t = Tableau(1, 2)
        t.setVarMarks([True, False])
        assert t.getVarMark(0)
        t.toggleVarMark(0)
        assert not t.getVarMark(0)
        t.setVarMark(1, True)
        assert t.getVarMarks() == [False, True]


class TestShapeEdits:
    def test_add_var_and_con(self):
        t = Tableau(1, 1)
        t.setAij(0, 0, 5)
        t.addVar("y")
        assert t.getTableauSize() == (1, 2)
        assert t.getVarName(1) == "y"
        assert t.getAij(0, 1) == 0
        assert t.getAij(0, 0) == 5
        t.addCon()
        assert t.getTableauSize() == (2, 2)
        t.addVars(["u", "v"])
        t.addCons(2)
        assert t.getTableauSize() == (4, 4)

    def test_remove_row_col(self):
        t = Tableau(3, 3)
        t.setA([[1, 2, 3], [4, 5, 6], [7, 8, 9]])
        t.setB([10, 11, 12])
        t.setVarNames(["a", "b", "c"])
        t.removeRow(1)
        assert t.getA() == [[1, 2, 3], [7, 8, 9]]
        assert t.getB() == [10, 12]
        t.removeCol(0)
        assert t.getA() == [[2, 3], [8, 9]]
        assert t.getVarNames() == ["b", "c"]
        t.removeRows([0, 1][1:])  # remove remaining second row
        assert t.getNumCons() == 1
        with pytest.raises(ValueError):
            t.removeRow(0)  # cannot remove last row

    def test_truncate_vars(self):
        t = Tableau(1, 4)
        t.setVarNames(["a", "b", "c", "d"])
        t.truncateVars(2)
        assert t.getVarNames() == ["a", "b"]

    def test_permute(self):
        t = parse_grid(GRID_START)
        t.permuteCols([1, 0, 2, 3])
        assert t.getVarNames() == ["x2", "x1", "_s0", "_s1"]
        assert t.getC() == [-30, -40, 0, 0]
        assert t.getAij(1, 0) == 1 and t.getAij(1, 1) == 2
        t.permuteRows([1, 0])
        assert t.getB() == [16, 12]
        with pytest.raises(ValueError):
            t.permuteRows([0, 0])
        with pytest.raises(ValueError):
            t.permuteCols([0, 1, 2])

    def test_copy_deep(self):
        t = parse_grid(GRID_START)
        c = t.copy()
        c.setAij(0, 0, 999)
        c.setVarName(0, "zzz")
        assert t.getAij(0, 0) == 1
        assert t.getVarName(0) == "x1"
        assert t == t.copy()


class TestRowOps:
    def test_row_mult_div(self):
        t = parse_grid(GRID_START)
        t.rowMult(0, 2)
        assert t.getA()[0] == [2, 2, 2, 0]
        assert t.getBi(0) == 24
        t.rowDiv(0, 2)
        assert t.getBi(0) == 12
        with pytest.raises(ZeroDivisionError):
            t.rowDiv(0, 0)

    def test_row_add_sub(self):
        t = parse_grid(GRID_START)
        t.rowAdd(0, 1, "1/2")
        assert t.getA()[0] == [2, F(3, 2), 1, F(1, 2)]
        assert t.getBi(0) == 20
        t.rowSub(0, 1, "1/2")
        assert t.getA()[0] == [1, 1, 1, 0]
        assert t.getBi(0) == 12

    def test_obj_row_ops_update_z(self):
        t = parse_grid(GRID_START)
        t.rowAddToObj(1, 20)
        assert t.getC() == [0, -10, 0, 20]
        # corner picked up 20*16: stored -z = 320 -> z = -320
        assert t.getZ() == -320
        t.rowSubFromObj(1, 20)
        assert t.getC() == [-40, -30, 0, 0]
        assert t.getZ() == 0


class TestPivotGolden:
    def test_pivot_replay(self):
        t = parse_grid(GRID_START)
        golden1 = parse_grid(GRID_AFTER_10)
        goldenopt = parse_grid(GRID_OPT)
        t.pivot(1, 0)
        mark_cols(t, [0])
        assert t == golden1
        t.pivot(0, 1)
        mark_cols(t, [1])
        assert t == goldenopt
        assert t.getZ() == -400

    def test_pivot_path_independence(self):
        # entering x2 first then x1 reaches the same optimum state
        t = parse_grid(GRID_START)
        t.pivot(0, 1)   # x2 enters on row 0
        t.pivot(1, 0)   # x1 enters on row 1
        mark_cols(t, [0, 1])
        assert t == parse_grid(GRID_OPT)

    def test_zero_pivot_raises(self):
        t = parse_grid(GRID_START)
        with pytest.raises(ZeroDivisionError):
            t.pivot(0, 3)  # a_03 == 0


class TestPredicates:
    def test_canonical_and_bcols(self):
        t = parse_grid(GRID_OPT)
        bcols = []
        assert t.isCanonical(bcols)
        assert bcols == [1, 0]
        t2 = parse_grid(GRID_START)
        bcols2 = []
        assert t2.isCanonical(bcols2)  # slack identity basis
        assert bcols2 == [2, 3]

    def test_not_canonical_negative_b(self):
        t = parse_grid(GRID_START)
        t.setBi(0, -1)
        assert not t.isCanonical()

    def test_optimal(self):
        assert parse_grid(GRID_OPT).isOptimal()
        assert not parse_grid(GRID_START).isOptimal()

    def test_unbounded(self):
        t = Tableau(1, 2)
        t.setC([-1, 0])
        t.setA([[-1, 1]])
        t.setB([1])
        assert t.isUnbounded()
        t.setAij(0, 0, 1)
        assert not t.isUnbounded()

    def test_infeasible_row(self):
        t = Tableau(1, 2)
        t.setA([[-1, -2]])
        t.setB([3])
        assert t.isInfeasible()
        t.setAij(0, 0, 1)
        assert not t.isInfeasible()

    def test_degenerate(self):
        t = parse_grid(GRID_START)
        assert not t.isDegenerate()
        t.setBi(0, 0)
        assert t.isDegenerate()


class TestSerialization:
    def test_json_round_trip(self):
        t = parse_grid(GRID_AFTER_10)
        data = t.saveJson()
        t2 = Tableau(1, 1)
        t2.loadJson(data)
        assert t2 == t

    def test_json_schema_reference_compatible(self):
        # z field stores the RAW corner (-z), Fractions as strings
        t = parse_grid(GRID_AFTER_10)
        data = t.saveJson()
        assert data["m"] == 2 and data["n"] == 4
        assert data["z"] == "320"
        assert data["c"][1] == "-10"
        assert data["a"][0][3] == "-1/2"
        assert data["cl"] == ["x1", "x2", "_s0", "_s1"]
        assert data["cm"] == [True, False, False, False]

    def test_file_round_trip(self, tmp_path):
        t = parse_grid(GRID_OPT)
        path = str(tmp_path / "tab.json")
        t.saveFile(path)
        t2 = Tableau(1, 1)
        t2.loadFile(path)
        assert t2 == t

    def test_grid_format_round_trip(self):
        t = parse_grid(GRID_AFTER_10)
        assert parse_grid(format_grid(t)) == t


class TestRendering:
    def test_text_contains_values(self):
        s = parse_grid(GRID_OPT).printText()
        assert "400" in s and "(x1)" in s and "20" in s

    def test_latex(self):
        s = parse_grid(GRID_OPT).printLatex()
        assert s.startswith("\\begin{tabular}")
        assert "400" in s and s.endswith("\\end{tabular}")

    def test_csv(self):
        s = parse_grid(GRID_OPT).printCSV()
        lines = s.strip().splitlines()
        assert len(lines) == 4
        assert lines[1].split(",")[-1] == "400"

    def test_grid_cells(self):
        cells = parse_grid(GRID_OPT).printGrid()
        assert cells[0][0] == ""  # rownums corner
        assert cells[0][1] == "(x1)"
        assert cells[1][-1] == "400"
