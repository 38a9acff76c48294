"""Device-side pricing rules beyond Dantzig/Bland: greatest-increase pricing
and the all-pivots enumeration (reference findPivotMaxIncrease
simplex.py:286-328 and findPivotAll simplex.py:330-360, now on device)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpulp import LinExpr, LinProg
from tpulp.core import (
    RULE_MAX_INCREASE,
    SolverOptions,
    Status,
    make_state,
)
from tpulp.simplex import Simplex
from tpulp.tableau import Tableau
from tpulp.solve import (
    find_pivot_all,
    run_simplex,
    solve_lp,
    state_from_standard_form,
)


def textbook_lp():
    lp = LinProg()
    lp.addVar("x1")
    lp.addVar("x2")
    lp.maximize(LinExpr(40, "x1", 30, "x2"))
    lp.addConstraint(LinExpr(1, "x1", 1, "x2").constraintLeq(12))
    lp.addConstraint(LinExpr(2, "x1", 1, "x2").constraintLeq(16))
    return lp


def random_state(seed, m=16, n=32, bounded=True):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n))
    x0 = np.abs(rng.normal(size=n))
    b = A @ x0 + np.abs(rng.normal(size=m))
    c = np.abs(rng.normal(size=n)) if bounded else rng.normal(size=n)
    Afull = np.concatenate([A, np.eye(m)], axis=1)
    cfull = np.concatenate([c, np.zeros(m)])
    return make_state(cfull, Afull, b, list(range(n, n + m)),
                      dtype=jnp.float64)


class TestMaxIncreaseRule:
    def test_textbook_exact(self):
        sol = solve_lp(textbook_lp(), rule=RULE_MAX_INCREASE)
        assert sol.status == "optimal"
        assert sol.objective == 400

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_same_optimum_as_dantzig(self, seed):
        st = random_state(seed)
        ref = run_simplex(st)
        out = run_simplex(st, SolverOptions.for_dtype(
            jnp.float64, rule=RULE_MAX_INCREASE))
        assert int(out.status) == Status.OPTIMAL == int(ref.status)
        assert abs(float(out.objective()) - float(ref.objective())) < 1e-8
        # greatest-increase converges in <= the Dantzig pivot count on these
        # instances (it is the greedy-per-pivot rule); sanity, not a theorem
        assert int(out.niter) <= int(ref.niter) + 5

    def test_matches_host_rule_on_textbook(self):
        """Device pivot path under RULE_MAX_INCREASE mirrors the host
        Simplex.solve(rule='max_increase') objective."""
        sf = textbook_lp().lower()
        tab = Tableau.fromArrays(sf.c, sf.A, sf.b, names=sf.col_names)
        sx = Simplex(tab)
        sx.solve(rule="max_increase")
        st = state_from_standard_form(sf)
        out = run_simplex(st, SolverOptions.for_dtype(
            jnp.float64, rule=RULE_MAX_INCREASE))
        assert abs(float(out.objective()) - float(sx.getObjValue())) < 1e-9

    def test_unbounded_detected_first_pivot(self):
        # improving column with no positive entries: max-increase must
        # select it immediately and report unbounded
        lp = LinProg()
        lp.addVar("x")
        lp.minimize(LinExpr(-1, "x"))
        lp.addConstraint(LinExpr(1, "x").constraintGeq(1))
        st = state_from_standard_form(lp.lower())
        out = run_simplex(st, SolverOptions.for_dtype(
            jnp.float64, rule=RULE_MAX_INCREASE))
        assert int(out.status) == Status.UNBOUNDED


class TestFindPivotAllDevice:
    def test_matches_host_enumeration(self):
        sf = textbook_lp().lower()
        st = state_from_standard_form(sf)
        mask = np.asarray(find_pivot_all(st))
        tab = Tableau.fromArrays(sf.c, sf.A, sf.b, names=sf.col_names)
        sx = Simplex(tab)
        host = set(sx.findPivotAll())
        dev = {(int(i), int(j)) for i, j in zip(*np.nonzero(mask))}
        assert dev == host

    @pytest.mark.parametrize("seed", [3, 4])
    def test_random_matches_host(self, seed):
        rng = np.random.default_rng(seed)
        m, n = 5, 8
        A = rng.integers(-3, 4, size=(m, n))
        x0 = np.abs(rng.integers(1, 3, size=n))
        # b >= 0 so the slack basis is canonical on BOTH sides: Simplex's
        # phase-1 init would otherwise mutate the host tableau and the two
        # enumerations would describe different tableaus
        b = np.abs(A @ x0) + np.abs(rng.integers(1, 3, size=m))
        c = rng.integers(-5, 5, size=n)
        Afull = np.concatenate([A, np.eye(m, dtype=int)], axis=1)
        cfull = np.concatenate([c, np.zeros(m, dtype=int)])
        st = make_state(cfull.astype(float), Afull.astype(float),
                        b.astype(float), list(range(n, n + m)),
                        dtype=jnp.float64)
        mask = np.asarray(find_pivot_all(st))
        tab = Tableau.fromArrays(
            [int(v) for v in cfull], [[int(v) for v in row] for row in Afull],
            [int(v) for v in b])
        sx = Simplex(tab)
        host = set(sx.findPivotAll())
        dev = {(int(i), int(j)) for i, j in zip(*np.nonzero(mask))}
        assert dev == host
