"""Model JSON schema + CLI subcommands."""

import json
import subprocess
import sys

import pytest

from tpulp import LinExpr, LinProg, LinVar
from tpulp.model.serialize import load_prog, prog_from_json, prog_to_json, save_prog


def sample_prog():
    lp = LinProg("plan")
    lp.addVar("x1")
    lp.addVar("x2", ub="9/2")
    lp.addVariable(LinVar("free", False, None, None))
    lp.maximize(LinExpr(40, "x1", 30, "x2", 1, "free"))
    lp.addConstraint(LinExpr(1, "x1", 1, "x2").constraintLeq(12))
    lp.addConstraint(LinExpr(2, "x1", 1, "x2").constraintLeq(16))
    lp.addConstraint(LinExpr(1, "free").constraintLeq(0))
    return lp


class TestModelJson:
    def test_round_trip(self):
        lp = sample_prog()
        data = prog_to_json(lp)
        lp2 = prog_from_json(data)
        assert lp2.objective.sense == "max"
        assert lp2.objective.expr == lp.objective.expr
        assert len(lp2.constraints) == 3
        assert lp2.vars["x2"].ub == lp.vars["x2"].ub
        # canonical constraints survive as equivalent constraints
        assert lp2.lower().b == lp.lower().b

    def test_file_round_trip_and_solve(self, tmp_path):
        path = str(tmp_path / "model.json")
        save_prog(path, sample_prog())
        lp = load_prog(path)
        sol = lp.solve()
        assert sol.status == "optimal"

    def test_milp_round_trip(self):
        lp = LinProg()
        lp.addVar("n", integral=True, lb=0, ub=5)
        lp.maximize(LinExpr(1, "n"))
        lp.addConstraint(LinExpr(2, "n").constraintLeq(7))
        lp2 = prog_from_json(prog_to_json(lp))
        assert lp2.vars["n"].isint
        sol = lp2.solve()
        assert sol.objective == 3


def run_cli(args, **kw):
    return subprocess.run(
        [sys.executable, "-m", "tpulp", *args],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ,
             "JAX_PLATFORMS": "cpu"},
        **kw)


@pytest.mark.slow
class TestCli:
    def test_solve_model(self, tmp_path):
        path = str(tmp_path / "m.json")
        save_prog(path, sample_prog())
        res = run_cli(["solve", path, "--exact"])
        assert res.returncode == 0, res.stderr
        out = json.loads(res.stdout)
        assert out["status"] == "optimal"
        # x1 = 23/4, x2 = 9/2 (its upper bound), free = 0 -> 365
        assert out["objective"] == "365"

    def test_solve_tableau_and_render(self, tmp_path):
        from tpulp.io import parse_grid

        tab = parse_grid(
            "x1 x2 s1 s2 | z\n-40 -30 0 0 | 0\n1 1 1 0 | 12\n2 1 0 1 | 16")
        path = str(tmp_path / "t.json")
        tab.saveFile(path)
        res = run_cli(["solve-tableau", path])
        assert res.returncode == 0, res.stderr
        out = json.loads(res.stdout)
        assert out["status"] == "optimal"
        assert out["objective"] == "-400"
        res2 = run_cli(["render", path, "--format", "latex"])
        assert res2.returncode == 0
        assert "tabular" in res2.stdout

    def test_solve_exact_with_presolve(self, tmp_path):
        # advisor finding: --presolve used to be silently ignored with
        # --exact; exact Fraction presolve composes with the exact simplex
        path = str(tmp_path / "m.json")
        lp = sample_prog()
        lp.addVar("fix", lb=3, ub=3)     # presolve substitutes this out
        lp.objective.expr += LinExpr(2, "fix")
        save_prog(path, lp)
        res = run_cli(["solve", path, "--exact", "--presolve"])
        assert res.returncode == 0, res.stderr
        out = json.loads(res.stdout)
        assert out["status"] == "optimal"
        assert out["objective"] == "371"          # 365 + 2*3
        assert out["x"]["fix"] == "3"             # recovered fixed var

    def test_save_and_warm_basis_round_trip(self, tmp_path):
        # late r5: basis persistence across CLI invocations
        path = str(tmp_path / "m.json")
        bpath = str(tmp_path / "basis.json")
        save_prog(path, sample_prog())
        res = run_cli(["solve", path, "--save-basis", bpath])
        assert res.returncode == 0, res.stderr
        cold = json.loads(res.stdout)
        assert cold["status"] == "optimal"
        import os
        assert os.path.exists(bpath)
        res2 = run_cli(["solve", path, "--warm-basis", bpath])
        assert res2.returncode == 0, res2.stderr
        warm = json.loads(res2.stdout)
        assert warm["status"] == "optimal"
        assert warm["objective"] == cold["objective"]
        assert warm["iterations"] == 0  # same data: already optimal
        # loud rejection with presolve (basis column space changes)
        res3 = run_cli(["solve", path, "--warm-basis", bpath, "--presolve"])
        assert res3.returncode == 2
        assert "presolve" in res3.stderr

    def test_ranging_flag(self, tmp_path):
        # round-5 sensitivity surface: --ranging emits exact intervals
        path = str(tmp_path / "m.json")
        lp = LinProg("wyndor")
        lp.addVar("x")
        lp.addVar("y")
        lp.maximize(LinExpr(3, "x", 5, "y"))
        lp.addConstraint(LinExpr(1, "x").constraintLeq(4), name="p1")
        lp.addConstraint(LinExpr(2, "y").constraintLeq(12), name="p2")
        lp.addConstraint(LinExpr(3, "x", 2, "y").constraintLeq(18),
                         name="p3")
        save_prog(path, lp)
        res = run_cli(["solve", path, "--ranging"])
        assert res.returncode == 0, res.stderr
        out = json.loads(res.stdout)
        assert out["status"] == "optimal" and out["objective"] == "36"
        assert out["cost_ranging"]["x"] == ["0", "15/2"]
        assert out["cost_ranging"]["y"] == ["2", None]
        assert out["rhs_ranging"]["p2"] == ["6", "18"]
        assert out["rhs_ranging"]["p1"] == ["2", None]
        # loud rejection with presolve (reductions change the data the
        # intervals describe)
        res2 = run_cli(["solve", path, "--ranging", "--presolve"])
        assert res2.returncode == 2
        assert "presolve" in res2.stderr

    def test_certificates_flag(self, tmp_path):
        from fractions import Fraction as F

        from tpulp.model.lower import lower_to_standard_form
        from tpulp.solve import verify_farkas

        path = str(tmp_path / "bad.json")
        lp = LinProg()
        lp.addVar("x")
        lp.minimize(LinExpr(1, "x"))
        lp.addConstraint(LinExpr(1, "x").constraintGeq(3))
        lp.addConstraint(LinExpr(1, "x").constraintLeq(1))
        save_prog(path, lp)
        res = run_cli(["solve", path, "--certificates"])
        assert res.returncode == 0, res.stderr
        out = json.loads(res.stdout)
        assert out["status"] == "infeasible"
        y = [F(v) for v in out["farkas"]]
        assert verify_farkas(lower_to_standard_form(load_prog(path)), y)

    def test_iis_flag(self, tmp_path):
        path = str(tmp_path / "bad.json")
        lp = LinProg()
        lp.addVar("x")
        lp.minimize(LinExpr(1, "x"))
        lp.addConstraint(LinExpr(1, "x").constraintGeq(3), name="hi")
        lp.addConstraint(LinExpr(1, "x").constraintLeq(1), name="lo")
        lp.addConstraint(LinExpr(1, "x").constraintLeq(7))
        save_prog(path, lp)
        res = run_cli(["solve", path, "--iis"])
        assert res.returncode == 0, res.stderr
        out = json.loads(res.stdout)
        assert out["status"] == "infeasible"
        assert sorted(out["iis"]) == ["hi", "lo"]

    def test_milp_time_limit_and_gap_flags(self):
        # late r5: the production early-exit controls over the CLI
        res = run_cli(["solve", "data/mps/knap20.mps", "--time-limit", "0"])
        assert res.returncode == 0, res.stderr
        assert json.loads(res.stdout)["status"] == "time_limit"
        res = run_cli(["solve", "data/mps/knap20.mps", "--gap", "0.9"])
        assert res.returncode == 0, res.stderr
        out = json.loads(res.stdout)
        # generous gap: either proven optimal before the first boundary
        # check or an early gap_limit carrying the incumbent + proven gap
        assert out["status"] in ("optimal", "gap_limit")
        assert "objective" in out
