"""Exact Farkas certificates (tpulp.solve.farkas).

The oracle is Farkas' lemma itself, checked in rationals: the returned y
must satisfy ``y . A_j <= 0`` for EVERY column and ``y . b > 0`` — an
independently machine-checkable proof of infeasibility, so the tests
re-verify every certificate against the original exact data rather than
pinning hand-derived vectors.
"""

from fractions import Fraction as F

import numpy as np
import pytest

from tpulp import LinExpr, LinProg
from tpulp.model.lower import lower_to_standard_form, materialize_simple_bounds
from tpulp.solve import (farkas_certificate, ray_certificate, solve_lp,
                         verify_farkas, verify_ray)


def _infeasible_pair():
    lp = LinProg()
    lp.addVar("x")
    lp.minimize(LinExpr(1, "x"))
    lp.addConstraint(LinExpr(1, "x").constraintGeq(3))
    lp.addConstraint(LinExpr(1, "x").constraintLeq(1))
    return lp


class TestCertificate:
    def test_simple_conflict(self):
        sf = lower_to_standard_form(_infeasible_pair())
        y = farkas_certificate(sf)
        assert y is not None and verify_farkas(sf, y)

    def test_feasible_returns_none(self):
        lp = LinProg()
        lp.addVar("x")
        lp.minimize(LinExpr(1, "x"))
        lp.addConstraint(LinExpr(1, "x").constraintGeq(3))
        assert farkas_certificate(lower_to_standard_form(lp)) is None

    def test_span_form_requires_materialization(self):
        lp = LinProg()
        lp.addVar("x", lb=0, ub=2)
        lp.minimize(LinExpr())
        lp.addConstraint(LinExpr(1, "x").constraintGeq(5))
        sf = lower_to_standard_form(lp, simple_bounds=True)
        with pytest.raises(ValueError, match="materialize"):
            farkas_certificate(sf)
        sff = materialize_simple_bounds(sf)
        y = farkas_certificate(sff)
        assert y is not None and verify_farkas(sff, y)

    def test_verify_rejects_wrong_vectors(self):
        sf = lower_to_standard_form(_infeasible_pair())
        assert not verify_farkas(sf, [F(0)] * sf.m)       # y.b = 0
        y = farkas_certificate(sf)
        assert not verify_farkas(sf, [-v for v in y])     # flipped sense


class TestRay:
    def _unbounded(self):
        lp = LinProg()
        lp.addVar("x")
        lp.addVar("y")
        lp.maximize(LinExpr(1, "x", 1, "y"))
        lp.addConstraint(
            (LinExpr(1, "x") - LinExpr(1, "y")).constraintLeq(2))
        return lp

    def test_improving_ray(self):
        sf = lower_to_standard_form(self._unbounded())
        d = ray_certificate(sf)
        assert d is not None and verify_ray(sf, d)

    def test_bounded_lp_has_no_ray(self):
        sf = lower_to_standard_form(wyndor_like())
        assert ray_certificate(sf) is None

    def test_verify_rejects_wrong_rays(self):
        sf = lower_to_standard_form(self._unbounded())
        d = ray_certificate(sf)
        assert not verify_ray(sf, [F(0)] * sf.n)          # c.d = 0
        assert not verify_ray(sf, [-v for v in d])        # negative entries

    def test_span_form_rejected(self):
        lp = LinProg()
        lp.addVar("x", lb=0, ub=2)
        lp.minimize(LinExpr(-1, "x"))
        sf = lower_to_standard_form(lp, simple_bounds=True)
        with pytest.raises(ValueError, match="materialize"):
            ray_certificate(sf)


def wyndor_like():
    lp = LinProg()
    lp.addVar("x")
    lp.addVar("y")
    lp.maximize(LinExpr(3, "x", 5, "y"))
    lp.addConstraint(LinExpr(1, "x").constraintLeq(4))
    lp.addConstraint(LinExpr(2, "y").constraintLeq(12))
    return lp


class TestSolveIntegration:
    def test_solve_lp_attaches_farkas(self):
        lp = _infeasible_pair()
        sol = solve_lp(lp, certificates=True)
        assert sol.status == "infeasible"
        assert sol.farkas is not None
        assert verify_farkas(lower_to_standard_form(lp), sol.farkas)

    def test_solve_lp_attaches_ray(self):
        lp = TestRay()._unbounded()
        sol = solve_lp(lp, certificates=True)
        assert sol.status == "unbounded"
        assert sol.ray is not None
        assert verify_ray(lower_to_standard_form(lp), sol.ray)

    def test_without_flag_no_certificate(self):
        sol = solve_lp(_infeasible_pair())
        assert sol.status == "infeasible" and sol.farkas is None

    def test_bounded_solve_materializes(self):
        lp = LinProg()
        lp.addVar("x", lb=0, ub=2)
        lp.minimize(LinExpr())
        lp.addConstraint(LinExpr(1, "x").constraintGeq(5))
        sol = solve_lp(lp, certificates=True, simple_bounds=True)
        assert sol.status == "infeasible" and sol.farkas is not None
        sff = materialize_simple_bounds(
            lower_to_standard_form(lp, simple_bounds=True))
        assert verify_farkas(sff, sol.farkas)


def _random_infeasible_sf(seed):
    rng = np.random.default_rng(seed)
    nv = int(rng.integers(2, 5))
    lp = LinProg(f"fk{seed}")
    for j in range(nv):
        lp.addVar(f"v{j}")
    lp.minimize(LinExpr())
    for _ in range(int(rng.integers(3, 8))):
        e = LinExpr()
        nz = 0
        for j in range(nv):
            cc = int(rng.integers(-4, 5))
            if cc:
                e += LinExpr(F(cc), f"v{j}")
                nz += 1
        if not nz:
            continue
        comp = ["constraintLeq", "constraintGeq",
                "constraintEq"][int(rng.integers(0, 3))]
        lp.addConstraint(getattr(e, comp)(F(int(rng.integers(-10, 11)))))
    return lower_to_standard_form(lp)


@pytest.mark.parametrize("trial", range(14))
def test_ray_property_random(trial):
    """Host-status cross-check: 'unbounded' systems yield a VERIFIED ray,
    'optimal' ones yield None (feasible-but-bounded has no improving
    ray; infeasible instances are skipped — a ray may or may not exist
    there and proves nothing)."""
    from tpulp.solve.api import solve_standard_form_host

    rng = np.random.default_rng(5300 + trial)
    nv = int(rng.integers(2, 5))
    lp = LinProg(f"ray{trial}")
    for j in range(nv):
        lp.addVar(f"v{j}")
    obj = LinExpr()
    for j in range(nv):
        obj += LinExpr(F(int(rng.integers(-6, 7))), f"v{j}")
    lp.minimize(obj)
    for _ in range(int(rng.integers(1, 4))):
        e = LinExpr()
        nz = 0
        for j in range(nv):
            cc = int(rng.integers(-3, 4))
            if cc:
                e += LinExpr(F(cc), f"v{j}")
                nz += 1
        if nz:
            lp.addConstraint(e.constraintLeq(F(int(rng.integers(0, 12)))))
    sf = lower_to_standard_form(lp)
    host = solve_standard_form_host(sf)
    if host.status == "infeasible":
        pytest.skip("infeasible instance")
    d = ray_certificate(sf)
    if host.status == "unbounded":
        assert d is not None and verify_ray(sf, d)
    else:
        assert d is None


@pytest.mark.parametrize("trial", range(20))
def test_certificate_property_random(trial):
    """Every infeasible random system yields a VERIFIED certificate; every
    feasible one yields None (cross-checked with the exact host)."""
    from tpulp.solve.api import solve_standard_form_host

    sf = _random_infeasible_sf(4200 + trial)
    if sf.trivially_infeasible:
        pytest.skip("trivially infeasible at lowering")
    y = farkas_certificate(sf)
    host = solve_standard_form_host(sf)
    if host.status == "infeasible":
        assert y is not None, "infeasible system got no certificate"
        assert verify_farkas(sf, y)
    else:
        assert y is None, "feasible system got a 'certificate'"
