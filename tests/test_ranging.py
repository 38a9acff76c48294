"""Post-optimal sensitivity ranging (tpulp.solve.ranging).

Oracles, strongest first:

* the ENDPOINT property, exact: each reported finite endpoint is by
  definition the last data value for which the terminal basis is optimal
  — so perturbing c_j / b_i exactly TO the endpoint must keep
  ``exact_basis_certificate`` fully green, and any step strictly beyond
  must break exactly the side that derivation bounds (dual feasibility
  for cost ranges, primal feasibility for rhs ranges). Checked in
  rationals on randomized instances — self-validating, no hand numbers.
* the textbook pin: the Wyndor LP's published ranging values.
* interval sanity: every rhs interval contains the current b_i; every
  cost interval contains the current c_j.
"""

import dataclasses
from fractions import Fraction as F

import numpy as np
import pytest

from tpulp import LinExpr, LinProg
from tpulp.solve import solve_lp, standard_form_ranging
from tpulp.solve.refine import exact_basis_certificate

EPS = F(1, 1000)


def wyndor():
    lp = LinProg("wyndor")
    lp.addVar("x")
    lp.addVar("y")
    lp.maximize(LinExpr(3, "x", 5, "y"))
    lp.addConstraint(LinExpr(1, "x").constraintLeq(4), name="plant1")
    lp.addConstraint(LinExpr(2, "y").constraintLeq(12), name="plant2")
    lp.addConstraint(LinExpr(3, "x", 2, "y").constraintLeq(18),
                     name="plant3")
    return lp


class TestWyndorPin:
    """Hillier & Lieberman's Wyndor Glass: the published ranging values."""

    def test_cost_and_rhs_ranges(self):
        sol = solve_lp(wyndor(), ranging=True)
        assert sol.status == "optimal" and sol.objective == 36
        assert sol.cost_ranging == {"x": (F(0), F(15, 2)),
                                    "y": (F(2), None)}
        assert sol.rhs_ranging["plant1"] == (F(2), None)
        assert sol.rhs_ranging["plant2"] == (F(6), F(18))
        assert sol.rhs_ranging["plant3"] == (F(12), F(24))
        # index keys mirror the name keys
        assert sol.rhs_ranging[0] == sol.rhs_ranging["plant1"]

    def test_float64_mode_agrees(self):
        lp = wyndor()
        sf = lp.lower()
        sol = solve_lp(lp, ranging=True)
        rep = standard_form_ranging(sf, sol.basis, mode="float64")
        exact = standard_form_ranging(sf, sol.basis, mode="exact")
        for got, want in zip(rep.cost + rep.rhs, exact.cost + exact.rhs):
            for g, w in zip(got, want):
                if w is None:
                    assert g is None
                else:
                    assert g == pytest.approx(float(w), abs=1e-9)


class TestApiSurface:
    def test_bounded_form_without_flags_raises(self):
        lp = LinProg()
        lp.addVar("x", lb=0, ub=3)
        lp.maximize(LinExpr(1, "x"))
        sf = lp.lower(simple_bounds=True)
        sol = solve_lp(lp, simple_bounds=True)
        with pytest.raises(ValueError, match="at_upper"):
            standard_form_ranging(sf, sol.basis)

    def test_non_optimal_leaves_fields_none(self):
        lp = LinProg()
        lp.addVar("x")
        lp.maximize(LinExpr(1, "x"))  # unbounded
        sol = solve_lp(lp, ranging=True)
        assert sol.status != "optimal"
        assert sol.cost_ranging is None and sol.rhs_ranging is None

    def test_standard_form_input_keys_by_index(self):
        sf = wyndor().lower()
        sol = solve_lp(sf, ranging=True)
        assert set(sol.cost_ranging) == set(range(sf.n))
        assert set(sol.rhs_ranging) == set(range(sf.m))


def _random_lp(seed):
    rng = np.random.default_rng(seed)
    nv = int(rng.integers(2, 7))
    mc = int(rng.integers(1, 6))
    lp = LinProg(f"rng{seed}")
    for j in range(nv):
        # finite ub -> a BOUND ROW in the plain lowering (not simple_bounds)
        # so instances are never unbounded and ranging covers bound rows too
        lp.addVar(f"v{j}", lb=0, ub=int(rng.integers(4, 20)))
    obj = LinExpr()
    for j in range(nv):
        obj += LinExpr(F(int(rng.integers(-9, 10)), int(rng.integers(1, 4))),
                       f"v{j}")
    (lp.maximize if rng.integers(0, 2) else lp.minimize)(obj)
    for _ in range(mc):
        e = LinExpr()
        nz = 0
        for j in range(nv):
            cc = int(rng.integers(-5, 6))
            if cc:
                e += LinExpr(F(cc), f"v{j}")
                nz += 1
        if not nz:
            continue
        # leq-heavy with rhs skewed positive: origin-feasible most of the
        # time, so the property test exercises REAL optima, not skips
        comp = ["constraintLeq", "constraintLeq", "constraintGeq",
                "constraintEq"][int(rng.integers(0, 4))]
        rhs = int(rng.integers(1, 25)) if comp == "constraintLeq" \
            else int(rng.integers(-15, 12))
        lp.addConstraint(getattr(e, comp)(F(rhs)))
    return lp


def _check_cost_endpoint(sf, basis, j, val, beyond_lo, beyond_hi):
    """At endpoint: certificate green. Beyond: dual feasibility breaks."""
    at = dataclasses.replace(sf, c=[*sf.c[:j], val, *sf.c[j + 1:]])
    primal, dual = exact_basis_certificate(at, basis)
    assert primal and dual, f"cost endpoint c[{j}]={val} lost optimality"
    for bey in (beyond_lo, beyond_hi):
        if bey is None:
            continue
        out = dataclasses.replace(sf, c=[*sf.c[:j], bey, *sf.c[j + 1:]])
        p2, d2 = exact_basis_certificate(out, basis)
        assert not d2, f"beyond cost range c[{j}]={bey} stayed dual-feasible"


def _check_rhs_endpoint(sf, basis, i, val, beyond):
    at = dataclasses.replace(sf, b=[*sf.b[:i], val, *sf.b[i + 1:]])
    primal, _dual = exact_basis_certificate(at, basis)
    assert primal, f"rhs endpoint b[{i}]={val} lost primal feasibility"
    if beyond is not None:
        out = dataclasses.replace(sf, b=[*sf.b[:i], beyond, *sf.b[i + 1:]])
        p2, _d2 = exact_basis_certificate(out, basis)
        assert not p2, f"beyond rhs range b[{i}]={beyond} stayed feasible"


@pytest.mark.parametrize("trial", range(24))
def test_endpoint_property_exact(trial):
    """Every finite endpoint is exactly tight: optimal AT it, broken
    strictly beyond it — checked in rationals against the certificate."""
    lp = _random_lp(900 + trial)
    sol = solve_lp(lp, ranging=False)
    if sol.status != "optimal" or sol.basis is None:
        pytest.skip(f"instance {trial} not optimal ({sol.status})")
    sf = lp.lower()
    rep = standard_form_ranging(sf, sol.basis, mode="exact")
    assert rep.exact
    for j, (lo, hi) in enumerate(rep.cost):
        assert (lo is None or lo <= sf.c[j]) and (hi is None or hi >= sf.c[j])
        if lo is not None:
            _check_cost_endpoint(sf, sol.basis, j, lo, lo - EPS, None)
        if hi is not None:
            _check_cost_endpoint(sf, sol.basis, j, hi, None, hi + EPS)
    for i, (lo, hi) in enumerate(rep.rhs):
        assert (lo is None or lo <= sf.b[i]) and (hi is None or hi >= sf.b[i])
        if lo is not None:
            _check_rhs_endpoint(sf, sol.basis, i, lo, lo - EPS)
        if hi is not None:
            _check_rhs_endpoint(sf, sol.basis, i, hi, hi + EPS)


def _random_box_lp(seed):
    """Box LPs for the BOUNDED endpoint property: every var 0 <= v <= u
    with the spans lowered via simple_bounds (no bound rows)."""
    rng = np.random.default_rng(seed)
    nv = int(rng.integers(2, 6))
    mc = int(rng.integers(1, 4))
    lp = LinProg(f"box{seed}")
    for j in range(nv):
        lp.addVar(f"v{j}", lb=0, ub=int(rng.integers(2, 9)))
    obj = LinExpr()
    for j in range(nv):
        obj += LinExpr(F(int(rng.integers(-9, 10))), f"v{j}")
    (lp.maximize if rng.integers(0, 2) else lp.minimize)(obj)
    for _ in range(mc):
        e = LinExpr()
        nz = 0
        for j in range(nv):
            cc = int(rng.integers(-4, 5))
            if cc:
                e += LinExpr(F(cc), f"v{j}")
                nz += 1
        if nz:
            lp.addConstraint(e.constraintLeq(F(int(rng.integers(2, 18)))))
    return lp


@pytest.mark.parametrize("trial", range(12))
def test_bounded_endpoint_property_exact(trial):
    """The endpoint property on BOUNDED (simple_bounds) bases: perturbing
    to each finite endpoint keeps the exact bounded KKT certificate green,
    strictly beyond breaks it (dual side for costs, primal for rhs)."""
    from tpulp.solve.refine import bounded_basis_certificate

    lp = _random_box_lp(500 + trial)
    sol = solve_lp(lp, simple_bounds=True)
    if sol.status != "optimal" or sol.basis is None:
        pytest.skip(f"instance {trial} not optimal ({sol.status})")
    assert sol.at_upper is not None
    sf = lp.lower(simple_bounds=True)
    rep = standard_form_ranging(sf, sol.basis, mode="exact",
                                at_upper=sol.at_upper)

    def cert(sf2):
        return bounded_basis_certificate(sf2, sol.basis, sol.at_upper)

    for j, (lo, hi) in enumerate(rep.cost):
        assert (lo is None or lo <= sf.c[j]) and (hi is None or hi >= sf.c[j])
        for end, bey in ((lo, None if lo is None else lo - EPS),
                         (hi, None if hi is None else hi + EPS)):
            if end is None:
                continue
            at = dataclasses.replace(sf, c=[*sf.c[:j], end, *sf.c[j + 1:]])
            p, d = cert(at)
            assert p and d, f"cost endpoint c[{j}]={end} lost optimality"
            out = dataclasses.replace(sf, c=[*sf.c[:j], bey, *sf.c[j + 1:]])
            p2, d2 = cert(out)
            assert not d2, f"beyond c[{j}]={bey} stayed dual-feasible"
    for i, (lo, hi) in enumerate(rep.rhs):
        assert (lo is None or lo <= sf.b[i]) and (hi is None or hi >= sf.b[i])
        for end, bey in ((lo, None if lo is None else lo - EPS),
                         (hi, None if hi is None else hi + EPS)):
            if end is None:
                continue
            at = dataclasses.replace(sf, b=[*sf.b[:i], end, *sf.b[i + 1:]])
            p, _d = cert(at)
            assert p, f"rhs endpoint b[{i}]={end} lost primal feasibility"
            out = dataclasses.replace(sf, b=[*sf.b[:i], bey, *sf.b[i + 1:]])
            p2, _d2 = cert(out)
            assert not p2, f"beyond b[{i}]={bey} stayed feasible"


def test_bounded_vs_row_lowering_original_parity():
    """A nondegenerate box LP: ranging in ORIGINAL space must agree
    between the simple_bounds basis and the bound-row basis."""
    lp = LinProg("prodmix")
    lp.addVar("a", lb=0, ub=7)
    lp.addVar("b", lb=0, ub=5)
    lp.maximize(LinExpr(4, "a", 3, "b"))
    lp.addConstraint(LinExpr(2, "a", 1, "b").constraintLeq(10), name="cap")
    rows = solve_lp(lp, ranging=True)
    bnd = solve_lp(lp, ranging=True, simple_bounds=True)
    assert rows.objective == bnd.objective == F(25)
    # optimum a=5/2, b=5: interior in a (basic), b at its upper bound.
    # the 'cap' rhs interval is basis-intrinsic -> must match exactly
    assert rows.rhs_ranging["cap"] == bnd.rhs_ranging["cap"] == (F(5), F(19))
    assert rows.cost_ranging["a"] == bnd.cost_ranging["a"] == (F(0), F(6))
    assert rows.cost_ranging["b"] == bnd.cost_ranging["b"] == (F(2), None)


def test_objective_moves_at_shadow_price_inside_range():
    """Inside an rhs range the objective moves linearly at the dual rate:
    re-solving at an interior point matches z + y_i * delta exactly."""
    lp = wyndor()
    sol = solve_lp(lp, ranging=True, duals=True)
    # plant2: b in [6, 18], dual (max sense) from Solution.duals
    d = sol.duals["plant2"]
    lp2 = LinProg("wyndor2")
    lp2.addVar("x")
    lp2.addVar("y")
    lp2.maximize(LinExpr(3, "x", 5, "y"))
    lp2.addConstraint(LinExpr(1, "x").constraintLeq(4))
    lp2.addConstraint(LinExpr(2, "y").constraintLeq(15))  # 12 + 3
    lp2.addConstraint(LinExpr(3, "x", 2, "y").constraintLeq(18))
    sol2 = solve_lp(lp2)
    assert sol2.objective == sol.objective + d * 3
