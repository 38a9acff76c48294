"""Checkpoint/resume + debug invariant mode."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpulp import LinExpr, LinProg, Simplex, SolveStatus
from tpulp.core import Status, SolverOptions
from tpulp.io.checkpoint import (
    load_bnb_frontier,
    load_state,
    save_bnb_frontier,
    save_state,
    simplex_state_to_tableau,
)
from tpulp.solve import run_simplex
from tpulp.solve.api import state_from_standard_form
from tpulp.utils import run_simplex_debug


def textbook_lp():
    lp = LinProg()
    lp.addVar("x1")
    lp.addVar("x2")
    lp.maximize(LinExpr(40, "x1", 30, "x2"))
    lp.addConstraint(LinExpr(1, "x1", 1, "x2").constraintLeq(12))
    lp.addConstraint(LinExpr(2, "x1", 1, "x2").constraintLeq(16))
    return lp


class TestCheckpoint:
    def test_state_roundtrip_and_resume(self, tmp_path):
        st = state_from_standard_form(textbook_lp().lower())
        # advance a single pivot, checkpoint mid-solve
        mid = run_simplex(st, SolverOptions(max_iters=1))
        assert int(mid.status) == Status.ITERATION_LIMIT
        path = str(tmp_path / "ckpt.npz")
        save_state(path, mid)
        resumed = load_state(path)
        resumed = resumed._replace(
            status=jnp.asarray(Status.RUNNING, jnp.int32))
        out = run_simplex(resumed)
        assert int(out.status) == Status.OPTIMAL
        assert abs(float(out.objective()) - (-400)) < 1e-9

    def test_state_dtype_cast(self, tmp_path):
        st = state_from_standard_form(textbook_lp().lower())
        path = str(tmp_path / "c.npz")
        save_state(path, st)
        st32 = load_state(path, dtype=jnp.float32)
        assert st32.T.dtype == jnp.float32

    def test_bnb_frontier_roundtrip(self, tmp_path):
        from fractions import Fraction as F

        import numpy as np

        frontier = [
            # legacy 3-tuple (no parent basis) and 4-tuple with one
            (F(-3, 2), 0, {"x": (F(0), F(4)), "y": (F(1), F(1))}),
            (F(7, 3), 1, {"x": (F(2), F(4))},
             np.asarray([5, 2, 9], dtype=np.int32)),
        ]
        path = str(tmp_path / "frontier.json")
        save_bnb_frontier(path, frontier, F(5, 2), meta={"round": 3})
        loaded, inc, meta = load_bnb_frontier(path)
        assert [(b, tb, bd) for b, tb, bd, _ in loaded] == [
            frontier[0], frontier[1][:3]]
        assert loaded[0][3] is None
        assert loaded[1][3].tolist() == [5, 2, 9]
        assert inc == F(5, 2)
        assert meta == {"round": 3}

    def test_state_to_tableau_bridge(self):
        st = state_from_standard_form(textbook_lp().lower())
        out = run_simplex(st)
        tab = simplex_state_to_tableau(out)
        # the exact host layer can read the device result: warm-start works
        sx = Simplex(tab)
        assert sx.solve() is SolveStatus.OPTIMAL
        assert float(sx.getObjValue()) == -400
        # JSON round trip through the reference-compatible schema
        data = tab.saveJson()
        assert data["m"] == tab.getNumCons()


class TestDebugMode:
    def test_trace_and_invariants_clean_run(self):
        st = state_from_standard_form(textbook_lp().lower())
        out, report = run_simplex_debug(st, check_every=1)
        assert report.status == "optimal"
        assert not report.violations
        assert report.num_pivots == int(out.niter)
        # trace records entering/leaving columns for real pivots
        pivots = [r for r in report.records if r.entering is not None]
        assert pivots
        assert all(r.objective is not None for r in report.records)
        # objective in the trace is non-increasing across phase-2 pivots
        zs = [r.objective for r in pivots if r.phase == 2]
        assert all(a >= b - 1e-9 for a, b in zip(zs, zs[1:]))

    def test_violation_detection(self):
        st = state_from_standard_form(textbook_lp().lower())
        # corrupt the state: negative RHS breaks canonical form
        bad_T = st.T.at[2, -1].set(-5.0)
        st = st._replace(T=bad_T)
        from tpulp.utils import InvariantViolation

        with pytest.raises(InvariantViolation):
            run_simplex_debug(st, check_every=1)

    def test_max_steps(self):
        st = state_from_standard_form(textbook_lp().lower())
        _, report = run_simplex_debug(st, max_steps=1)
        assert len(report.records) == 1
