"""Randomized device-vs-exact-host parity (round-5 plumbing fuzz).

A seeded slice of the 160-instance fuzz that validated the r5 api
plumbing (equilibration, rung tagging, refreshed escalation, bounded
devex) end to end: random structures over free variables, finite bounds,
ill-scaled (10^±5) rational coefficients, all three comparison kinds,
f32 and f64 entry dtypes, row-based and simple_bounds lowerings — every
optimal objective must match the exact host oracle EXACTLY (the ladder +
certificates own correctness regardless of float luck).
"""

from fractions import Fraction as F

import jax.numpy as jnp
import numpy as np
import pytest

from tpulp import LinExpr, LinProg
from tpulp.model.lower import lower_to_standard_form
from tpulp.solve.api import solve_lp, solve_standard_form_host


def _random_lp(seed, style):
    rng = np.random.default_rng(seed)
    nv = int(rng.integers(2, 9))
    mc = int(rng.integers(1, 7))
    lp = LinProg(f"fz{seed}")
    for j in range(nv):
        kind = rng.integers(0, 4)
        lb = None if kind == 3 else 0
        ub = int(rng.integers(1, 12)) if kind == 1 else None
        lp.addVar(f"v{j}", lb=lb, ub=ub)
    obj = LinExpr()
    sp = 5 if style == 2 else 0
    for j in range(nv):
        coef = F(int(rng.integers(-9, 10)), int(rng.integers(1, 4)))
        if sp:
            coef *= F(10) ** int(rng.integers(-sp, sp + 1))
        obj += LinExpr(coef, f"v{j}")
    (lp.maximize if rng.integers(0, 2) else lp.minimize)(obj)
    for i in range(mc):
        e = LinExpr()
        nz = 0
        for j in range(nv):
            cc = int(rng.integers(-5, 6))
            if cc:
                c2 = F(cc) * (F(10) ** int(rng.integers(-sp, sp + 1))
                              if sp else 1)
                e += LinExpr(c2, f"v{j}")
                nz += 1
        if not nz:
            continue
        comp = ["constraintLeq", "constraintGeq",
                "constraintEq"][int(rng.integers(0, 3))]
        lp.addConstraint(getattr(e, comp)(F(int(rng.integers(-20, 30)))))
    return lp


@pytest.mark.parametrize("trial", range(16))
def test_random_structure_parity(trial):
    rng_master = np.random.default_rng(2026)
    seeds = [int(rng_master.integers(0, 2 ** 31)) for _ in range(16)]
    style = trial % 4
    lp = _random_lp(seeds[trial], style)
    ref = solve_standard_form_host(lower_to_standard_form(lp))
    dev = solve_lp(lp, simple_bounds=(style == 1),
                   dtype=jnp.float32 if style == 3 else jnp.float64)
    assert dev.status == ref.status, (trial, seeds[trial])
    if ref.status == "optimal":
        assert dev.objective == ref.objective, (trial, seeds[trial])


def _brute_force_milp(seed):
    import itertools

    rng = np.random.default_rng(seed)
    n = int(rng.integers(6, 11))
    mc = int(rng.integers(1, 5))
    c = rng.integers(-9, 10, size=n)
    A = rng.integers(-5, 8, size=(mc, n))
    sense = int(rng.integers(0, 2))
    comps = [int(rng.integers(0, 3)) for _ in range(mc)]
    rhs = rng.integers(-6, 20, size=mc)
    lp = LinProg(f"bf{seed}")
    obj = LinExpr()
    for j in range(n):
        lp.addVar(f"x{j}", integral=True, lb=0, ub=1)
        obj += LinExpr(int(c[j]), f"x{j}")
    (lp.maximize if sense else lp.minimize)(obj)
    for i in range(mc):
        e = LinExpr()
        nz = 0
        for j in range(n):
            if A[i, j]:
                e += LinExpr(int(A[i, j]), f"x{j}")
                nz += 1
        if not nz:
            continue
        m = ["constraintLeq", "constraintGeq",
             "constraintEq"][comps[i]]
        lp.addConstraint(getattr(e, m)(int(rhs[i])))
    best = None
    for bits in itertools.product((0, 1), repeat=n):
        x = np.array(bits)
        ok = True
        for i in range(mc):
            v = int(A[i] @ x)
            if (comps[i] == 0 and v > rhs[i]) or \
               (comps[i] == 1 and v < rhs[i]) or \
               (comps[i] == 2 and v != rhs[i]):
                ok = False
                break
        if ok:
            z = int(c @ x)
            if best is None or (z > best if sense else z < best):
                best = z
    return lp, best


@pytest.mark.parametrize("trial", range(8))
def test_random_milp_vs_brute_force(trial):
    """Random binary MILPs (mixed <=/>=/== rows, both senses) against an
    EXHAUSTIVE oracle — the strongest possible MILP correctness gate at
    enumerable sizes (part of the r5 40-instance fuzz, all clean)."""
    from tpulp.milp import solve_milp

    rng_master = np.random.default_rng(31415)
    seeds = [int(rng_master.integers(0, 2 ** 31)) for _ in range(8)]
    lp, best = _brute_force_milp(seeds[trial])
    sol = solve_milp(lp, dtype=jnp.float32, batch_size=16)
    if best is None:
        assert sol.status == "infeasible", (trial, seeds[trial])
    else:
        assert sol.status == "optimal", (trial, seeds[trial])
        assert sol.objective == best, (trial, seeds[trial])
