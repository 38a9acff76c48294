"""Rank-K blocked driver: parity vs the rank-1 driver across statuses,
block sizes, and phase-1 problems (identical pivot decisions by design)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpulp import LinExpr, LinProg
from tpulp.core import Status, make_state
from tpulp.solve import run_simplex, run_simplex_blocked
from tpulp.solve.api import state_from_standard_form


def random_state(seed, m=24, n=40, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n))
    x0 = np.abs(rng.normal(size=n))
    b = A @ x0 + np.abs(rng.normal(size=m))
    c = rng.normal(size=n)
    Af = np.concatenate([A, np.eye(m)], axis=1)
    cf = np.concatenate([c, np.zeros(m)])
    return make_state(cf, Af, b, list(range(n, n + m)), dtype=dtype)


class TestBlockedParity:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_matches_rank1(self, seed):
        st = random_state(seed)
        ref = run_simplex(st)
        out = run_simplex_blocked(st, block=8)
        assert int(out.status) == int(ref.status)
        if int(ref.status) == Status.OPTIMAL:
            assert abs(float(out.objective()) - float(ref.objective())) < 1e-8
            assert np.array_equal(np.asarray(out.basis), np.asarray(ref.basis))

    @pytest.mark.parametrize("block", [2, 4, 16, 64])
    def test_block_sizes(self, block):
        st = random_state(42)
        ref = run_simplex(st)
        out = run_simplex_blocked(st, block=block)
        assert int(out.status) == int(ref.status)
        if int(ref.status) == Status.OPTIMAL:
            assert abs(float(out.objective()) - float(ref.objective())) < 1e-8
        # this instance is UNBOUNDED: the round-4 per-block ray scan lets
        # the blocked driver certify that at a flush boundary, possibly
        # EARLIER than the rank-1 walk reaches the ray column — terminal
        # objectives of unbounded runs are walk positions, not answers

    def test_phase1_and_artificial_cleanup(self):
        lp = LinProg()
        lp.addVar("x")
        lp.addVar("y")
        lp.minimize(LinExpr(2, "x", 3, "y"))
        lp.addConstraint(LinExpr(1, "x", 1, "y").constraintGeq(4))
        lp.addConstraint(LinExpr(1, "x", -1, "y").constraintEq(0))
        lp.addConstraint(LinExpr(2, "x", 2, "y").constraintGeq(8))  # dependent
        st = state_from_standard_form(lp.lower())
        out = run_simplex_blocked(st, block=4)
        assert int(out.status) == Status.OPTIMAL
        assert abs(float(out.objective()) - 10) < 1e-9

    def test_unbounded_and_infeasible(self):
        unb = LinProg()
        unb.addVar("x")
        unb.minimize(LinExpr(-1, "x"))
        unb.addConstraint(LinExpr(1, "x").constraintGeq(1))
        st = state_from_standard_form(unb.lower())
        assert int(run_simplex_blocked(st, block=8).status) == Status.UNBOUNDED

        inf = LinProg()
        inf.addVar("x")
        inf.minimize(LinExpr(1, "x"))
        inf.addConstraint(LinExpr(1, "x").constraintLeq(1))
        inf.addConstraint(LinExpr(1, "x").constraintGeq(3))
        st2 = state_from_standard_form(inf.lower())
        assert int(run_simplex_blocked(st2, block=8).status) == Status.INFEASIBLE

    def test_iteration_limit(self):
        from tpulp.core import SolverOptions

        st = random_state(3)
        out = run_simplex_blocked(
            st, SolverOptions.for_dtype(jnp.float64, max_iters=2), block=4)
        assert int(out.status) == Status.ITERATION_LIMIT

    def test_beale_anticycling_blocked(self):
        lp = LinProg()
        for v in ["x4", "x5", "x6", "x7"]:
            lp.addVar(v)
        lp.minimize(LinExpr("-3/4", "x4", 150, "x5", "-1/50", "x6", 6, "x7"))
        lp.addConstraint(
            LinExpr("1/4", "x4", -60, "x5", "-1/25", "x6", 9, "x7")
            .constraintLeq(0))
        lp.addConstraint(
            LinExpr("1/2", "x4", -90, "x5", "-1/50", "x6", 3, "x7")
            .constraintLeq(0))
        lp.addConstraint(LinExpr(1, "x6").constraintLeq(1))
        st = state_from_standard_form(lp.lower())
        out = run_simplex_blocked(st, block=4)
        assert int(out.status) == Status.OPTIMAL
        assert abs(float(out.objective()) - (-1 / 20)) < 1e-12
