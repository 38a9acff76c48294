"""Public warm-start re-solve surface (late r5): ``solve_lp(prog,
warm_start=prev_solution)``.

The production re-solve pattern the reference supports via
load-then-construct (lpsol simplex.py:46-47: a canonical tableau
warm-starts ``Simplex.__init__``), surfaced here over the device path:
a prior Solution's terminal basis is reconstructed against the NEW data
(``tpulp.solve.dual.warm_state_from_basis`` — the same machinery B&B
children warm-start with), RHS changes re-optimize with the dual
simplex, objective changes continue with the primal engine, and the
result still flows through the exact refinement + certificate pipeline.
"""

import numpy as np
import pytest

from tpulp import LinExpr, LinProg
from tpulp.solve import solve_lp
from tpulp.solve.api import Solution


def _dense_leq_lp(seed, m=12, n=10, b_scale=None, c_override=None):
    """min c x  s.t.  A x <= b, x >= 0 — deterministic from the seed, so
    two calls build the SAME program structure (same lowering layout)."""
    rng = np.random.default_rng(seed)
    # nonnegative A + negative c: the polytope {Ax <= b, x >= 0} is
    # bounded, so every instance has a finite optimum with a real walk
    A = np.abs(rng.normal(size=(m, n))) + 0.1
    x0 = np.abs(rng.normal(size=n))
    b = A @ x0 + np.abs(rng.normal(size=m)) + 0.5
    c = -(np.abs(rng.normal(size=n)) + 0.1) if c_override is None \
        else np.asarray(c_override)
    if b_scale is not None:
        b = b * np.asarray(b_scale)
    lp = LinProg()
    for j in range(n):
        lp.addVar(f"x{j}")
    obj = LinExpr()
    for j in range(n):
        obj += LinExpr(float(c[j]), f"x{j}")
    lp.minimize(obj)
    for i in range(m):
        e = LinExpr()
        for j in range(n):
            e += LinExpr(float(A[i, j]), f"x{j}")
        lp.addConstraint(e.constraintLeq(float(b[i])))
    return lp


@pytest.mark.parametrize("seed", [0, 3])
def test_same_data_warm_start_takes_zero_pivots(seed):
    lp = _dense_leq_lp(seed)
    sol = solve_lp(lp)
    assert sol.status == "optimal" and sol.basis is not None
    warm = solve_lp(lp, warm_start=sol)
    assert warm.status == "optimal"
    assert warm.niter == 0
    assert warm.objective == sol.objective  # exact Fractions


@pytest.mark.parametrize("seed", [1, 2])
def test_rhs_change_reoptimizes_dual_with_fewer_pivots(seed):
    lp = _dense_leq_lp(seed)
    sol = solve_lp(lp)
    assert sol.status == "optimal"
    scale = np.ones(12)
    scale[:3] = 0.8  # tighten three rows, the B&B-child shape
    lp2 = _dense_leq_lp(seed, b_scale=scale)
    cold = solve_lp(lp2)
    warm = solve_lp(lp2, warm_start=sol)
    assert warm.status == cold.status == "optimal"
    assert warm.objective == cold.objective  # exact refinement both ways
    assert warm.niter < max(cold.niter, 2)


def test_objective_change_continues_primal(seed=4):
    lp = _dense_leq_lp(seed)
    sol = solve_lp(lp)
    assert sol.status == "optimal"
    rng = np.random.default_rng(99)
    lp2 = _dense_leq_lp(seed,
                        c_override=-(np.abs(rng.normal(size=10)) + 0.1))
    cold = solve_lp(lp2)
    warm = solve_lp(lp2, warm_start=sol)
    assert warm.status == cold.status == "optimal"
    assert warm.objective == cold.objective
    # the previous vertex stays primal feasible, so the warm walk starts
    # there instead of a cold two-phase start; it must terminate on a
    # plain phase-2 walk (no guarantee it beats the cold pivot count —
    # a new objective can sit across the polytope from the old vertex)
    assert warm.niter < 200


def test_infeasible_after_tightening_detected():
    lp = LinProg()
    lp.addVar("x")
    lp.addVar("y")
    lp.minimize(LinExpr(-1, "x"))
    lp.addConstraint(LinExpr(1, "x", 1, "y").constraintLeq(4))
    sol = solve_lp(lp)
    assert sol.status == "optimal"
    lp2 = LinProg()
    lp2.addVar("x")
    lp2.addVar("y")
    lp2.minimize(LinExpr(-1, "x"))
    lp2.addConstraint(LinExpr(1, "x", 1, "y").constraintLeq(-1))
    warm = solve_lp(lp2, warm_start=sol)
    assert warm.status == "infeasible"


def test_structure_mismatch_raises():
    sol = solve_lp(_dense_leq_lp(0))
    with pytest.raises(ValueError, match="warm_basis"):
        solve_lp(_dense_leq_lp(0, m=8, n=6), warm_start=sol)


def test_basisless_solution_raises():
    lp = _dense_leq_lp(0)
    with pytest.raises(ValueError, match="no basis"):
        solve_lp(lp, warm_start=Solution(status="infeasible"))


def test_bounded_and_mesh_paths_reject_loudly():
    lp = _dense_leq_lp(0)
    sol = solve_lp(lp)
    lpb = _dense_leq_lp(0)
    for j in range(10):
        lpb.vars[f"x{j}"].boundAbove(100)
    with pytest.raises(ValueError, match="solo tableau path"):
        solve_lp(lpb, warm_start=sol, simple_bounds=True)
    from tpulp.shard import make_mesh

    with pytest.raises(ValueError, match="solo tableau path"):
        solve_lp(lp, warm_start=sol, mesh=make_mesh(2))


@pytest.mark.parametrize("seed", range(8))
def test_randomized_warm_cold_parity(seed):
    """Frozen fuzz slice: random bounded LP, random RHS x objective
    perturbation, warm-vs-cold objective parity (exact at this size) and
    matching statuses. A wider offline sweep (40 seeds) ran clean when
    the feature landed; these 8 are the regression slice."""
    rng = np.random.default_rng(1000 + seed)
    m, n = int(rng.integers(6, 16)), int(rng.integers(5, 12))
    lp = _dense_leq_lp(seed, m=m, n=n)
    sol = solve_lp(lp)
    assert sol.status == "optimal"
    b_scale = 1.0 + rng.uniform(-0.3, 0.2, size=m)
    c2 = -(np.abs(rng.normal(size=n)) + 0.1) if rng.random() < 0.5 else None
    lp2 = _dense_leq_lp(seed, m=m, n=n, b_scale=b_scale, c_override=c2)
    cold = solve_lp(lp2)
    warm = solve_lp(lp2, warm_start=sol)
    assert warm.status == cold.status
    if cold.status == "optimal":
        assert warm.objective == cold.objective


class TestBatchWarmScenarios:
    """``solve_lp_batch(scenarios, warm_start=sol)`` — one dual-simplex
    wave over same-structure RHS scenarios (late r5)."""

    def _scenarios(self, seed=3, k=5):
        base = _dense_leq_lp(seed)
        scens = []
        for i in range(k):
            sc = 1.0 + np.random.default_rng(i).uniform(-0.2, 0.1, size=12)
            scens.append(_dense_leq_lp(seed, b_scale=sc))
        return base, scens

    def test_parity_with_solo_cold_solves(self):
        from tpulp.batch import solve_lp_batch

        base, scens = self._scenarios()
        sol = solve_lp(base)
        warm = solve_lp_batch(scens, warm_start=sol)
        colds = [solve_lp(p) for p in scens]
        for w, c in zip(warm, colds):
            assert w.status == c.status == "optimal"
            assert w.objective == c.objective  # exact refinement
        assert sum(w.niter for w in warm) < sum(c.niter for c in colds)

    def test_infeasible_scenario_lane_confirmed_solo(self):
        from tpulp.batch import solve_lp_batch

        def box(lo):
            lp = LinProg()
            lp.addVar("x")
            lp.addVar("y")
            lp.minimize(LinExpr(1, "x", 2, "y"))
            lp.addConstraint(LinExpr(1, "x", 1, "y").constraintLeq(4))
            lp.addConstraint(LinExpr(1, "x", 1, "y").constraintGeq(lo))
            return lp

        sol = solve_lp(box(1))
        assert sol.status == "optimal"
        # same lowering layout (both RHS positive), one impossible lane
        out = solve_lp_batch([box(2), box(100)], warm_start=sol)
        assert out[0].status == "optimal"
        assert out[0].objective == 2
        assert out[1].status == "infeasible"

    def test_negative_rhs_scenario_rejected_as_layout_change(self):
        """A scenario whose RHS flips sign lowers to a DIFFERENT layout
        (row negation + surplus), so the structure check must reject it
        rather than warm-start against the wrong frame."""
        from tpulp.batch import solve_lp_batch

        base, scens = self._scenarios(k=2)
        sol = solve_lp(base)
        scens[1] = _dense_leq_lp(3, b_scale=np.full(12, -1.0))
        with pytest.raises(ValueError, match="SAME-STRUCTURE"):
            solve_lp_batch(scens, warm_start=sol)

    def test_structure_mismatch_raises(self):
        from tpulp.batch import solve_lp_batch

        base, scens = self._scenarios(k=2)
        sol = solve_lp(base)
        scens[1] = _dense_leq_lp(9)  # different A/c, same shape
        with pytest.raises(ValueError, match="SAME-STRUCTURE"):
            solve_lp_batch(scens, warm_start=sol)

    def test_mesh_and_simple_bounds_reject(self):
        from tpulp.batch import solve_lp_batch
        from tpulp.shard import make_mesh

        base, scens = self._scenarios(k=2)
        sol = solve_lp(base)
        with pytest.raises(ValueError, match="row-form"):
            solve_lp_batch(scens, warm_start=sol, mesh=make_mesh(2))
        with pytest.raises(ValueError, match="row-form"):
            solve_lp_batch(scens, warm_start=sol, simple_bounds=True)


def test_garbage_basis_falls_back_to_cold():
    """A structurally valid but singular/nonsense basis must not corrupt
    the answer — the frame check falls back to the cold start."""
    lp = _dense_leq_lp(5)
    cold = solve_lp(lp)
    # all-same-column basis: singular B, non-finite frame
    fake = Solution(status="optimal", basis=[0] * 12)
    warm = solve_lp(lp, warm_start=fake)
    assert warm.status == "optimal"
    assert warm.objective == cold.objective
