"""Pallas persistent-VMEM blocked driver vs the jnp blocked driver
(interpret mode on CPU): identical pivot sequences by construction."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpulp import LinExpr, LinProg
from tpulp.core import Status, make_state
from tpulp.solve import run_simplex_blocked
from tpulp.solve.api import state_from_standard_form
from tpulp.solve.blocked_pallas import run_simplex_blocked_pallas


def random_state(seed, m=12, n=20, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n))
    x0 = np.abs(rng.normal(size=n))
    b = A @ x0 + np.abs(rng.normal(size=m))
    c = rng.normal(size=n)
    Af = np.concatenate([A, np.eye(m)], axis=1)
    cf = np.concatenate([c, np.zeros(m)])
    return make_state(cf, Af, b, list(range(n, n + m)), dtype=dtype)


class TestPallasBlocked:
    @pytest.mark.parametrize("seed", range(6))
    def test_random_parity_with_jnp_blocked(self, seed):
        st = random_state(seed)
        ref = run_simplex_blocked(st, block=8)
        out = run_simplex_blocked_pallas(st, block=8)
        assert int(out.status) == int(ref.status)
        assert int(out.niter) == int(ref.niter)
        assert np.array_equal(np.asarray(out.basis), np.asarray(ref.basis))
        if int(ref.status) == Status.OPTIMAL:
            assert abs(float(out.objective()) - float(ref.objective())) < 1e-9

    def test_phase1_cleanup_dependent_rows(self):
        lp = LinProg()
        lp.addVar("x")
        lp.addVar("y")
        lp.minimize(LinExpr(2, "x", 3, "y"))
        lp.addConstraint(LinExpr(1, "x", 1, "y").constraintGeq(4))
        lp.addConstraint(LinExpr(1, "x", -1, "y").constraintEq(0))
        lp.addConstraint(LinExpr(2, "x", 2, "y").constraintGeq(8))
        st = state_from_standard_form(lp.lower())
        out = run_simplex_blocked_pallas(st, block=4)
        assert int(out.status) == Status.OPTIMAL
        assert abs(float(out.objective()) - 10) < 1e-9

    def test_beale_anticycling(self):
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
        out = run_simplex_blocked_pallas(st, block=4)
        assert int(out.status) == Status.OPTIMAL
        assert abs(float(out.objective()) + 1 / 20) < 1e-9

    def test_statuses(self):
        unb = LinProg()
        unb.addVar("x")
        unb.minimize(LinExpr(-1, "x"))
        unb.addConstraint(LinExpr(1, "x").constraintGeq(1))
        st = state_from_standard_form(unb.lower())
        assert int(run_simplex_blocked_pallas(st).status) == Status.UNBOUNDED

        inf = LinProg()
        inf.addVar("x")
        inf.minimize(LinExpr(1, "x"))
        inf.addConstraint(LinExpr(1, "x").constraintLeq(1))
        inf.addConstraint(LinExpr(1, "x").constraintGeq(3))
        st2 = state_from_standard_form(inf.lower())
        assert int(run_simplex_blocked_pallas(st2).status) == Status.INFEASIBLE


class TestPallasDevex:
    """Devex pricing inside the Pallas kernel (VERDICT r3 item 3): the
    compiled and jnp RULE_DEVEX drivers must walk the same pivot path."""

    def _devex_opts(self, dtype=jnp.float64):
        import dataclasses

        from tpulp.core.state import RULE_DEVEX, SolverOptions

        return dataclasses.replace(
            SolverOptions.for_dtype(dtype), rule=RULE_DEVEX)

    @pytest.mark.parametrize("seed", range(6))
    def test_random_parity_with_jnp_blocked_devex(self, seed):
        st = random_state(seed)
        opts = self._devex_opts()
        ref = run_simplex_blocked(st, opts, block=8)
        out = run_simplex_blocked_pallas(st, opts, block=8)
        assert int(out.status) == int(ref.status)
        assert int(out.niter) == int(ref.niter)
        assert np.array_equal(np.asarray(out.basis), np.asarray(ref.basis))
        if int(ref.status) == Status.OPTIMAL:
            assert abs(float(out.objective()) - float(ref.objective())) < 1e-9

    def test_equality_heavy_devex_cuts_pivots(self):
        # a phase-1-deep equality system: devex needs strictly fewer pivots
        # than Dantzig on the same instance, and both land the same optimum
        from tpulp.corpus import get_case
        from tpulp.solve.api import state_from_standard_form as _sfs

        lp = get_case("equality_heavy_24").lp()
        st = _sfs(lp.lower())
        dantzig = run_simplex_blocked_pallas(st, block=8)
        devex = run_simplex_blocked_pallas(st, self._devex_opts(), block=8)
        assert int(dantzig.status) == Status.OPTIMAL
        assert int(devex.status) == Status.OPTIMAL
        assert abs(float(devex.objective())
                   - float(dantzig.objective())) < 1e-6
        assert int(devex.niter) < int(dantzig.niter)

    def test_solve_lp_accepts_pallas_devex(self):
        # the api-level rejection is lifted: pricing='devex' composes with
        # driver='pallas' (interpret mode on CPU)
        from tpulp.corpus import get_case
        from tpulp.solve import solve_lp

        case = get_case("textbook")
        sol = solve_lp(case.lp(), pricing="devex", driver="pallas")
        assert sol.status == "optimal"
        assert sol.objective == case.objective


def test_fused_flush_matches_einsum_and_transpose():
    """The r5 fused flush must reproduce the XLA formulation EXACTLY in
    interpret mode: same T' = T + U^T V, Tt' bit-equal to T'.T, and the
    ray-scan accumulators equal to the standalone column scans."""
    import numpy as np
    from jax import lax

    from tpulp.kernels.pallas_block import fused_flush

    rng = np.random.default_rng(9)
    M8, N8, K = 128, 256, 16
    T = jnp.asarray(rng.normal(size=(M8, N8)), jnp.float32)
    U = jnp.asarray(rng.normal(size=(K, M8)) * 0.1, jnp.float32)
    V = jnp.asarray(rng.normal(size=(K, N8)) * 0.1, jnp.float32)
    ca = jnp.asarray(rng.integers(0, 2, size=(1, N8)), jnp.int32)
    opt_tol, piv_tol = 1e-5, 1e-5
    Tn, Tt, scan = fused_flush(T, U, V, ca, opt_tol=opt_tol,
                               piv_tol=piv_tol, interpret=True)
    ref = T + jnp.einsum("km,kn->mn", U, V,
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(Tn), np.asarray(ref),
                               rtol=0, atol=1e-5)
    # the transpose must be BIT-equal to the returned T (the walk
    # correctness contract)
    assert np.array_equal(np.asarray(Tt), np.asarray(Tn).T)
    imp_ref = (np.asarray(ca)[0] > 0) & (np.asarray(Tn)[0] < -opt_tol)
    blocked_ref = (np.asarray(Tn)[2:] > piv_tol).any(axis=0)
    assert np.array_equal(np.asarray(scan[0]) > 0, imp_ref)
    assert np.array_equal(np.asarray(scan[1]) > 0, blocked_ref)
