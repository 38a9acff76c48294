"""Device-side B&B generation chaining (round 5, VERDICT r4 item 5).

``solve_milp(device_generations=G)`` expands up to G generations per host
round trip: children are constructed on device (floor/ceil bound split as
the warm path's sparse b-rewrite) and dual-simplex re-optimized, and the
chain's summaries come home in ONE fetch. These tests pin exact-objective
parity against the single-generation scheduler across families, the
lane-overflow cold-requeue path, and the eligibility fallbacks.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpulp import LinExpr, LinProg
from tpulp.milp import solve_milp


def _knapsack(n_items, seed):
    rng = np.random.default_rng(seed)
    values = rng.integers(10, 60, size=n_items)
    weights = rng.integers(5, 25, size=n_items)
    cap = int(weights.sum() * 0.4)
    lp = LinProg(f"kn_{seed}")
    obj = LinExpr()
    wexpr = LinExpr()
    for i in range(n_items):
        lp.addVar(f"x{i}", integral=True, lb=0, ub=1)
        obj += LinExpr(int(values[i]), f"x{i}")
        wexpr += LinExpr(int(weights[i]), f"x{i}")
    lp.maximize(obj)
    lp.addConstraint(wexpr.constraintLeq(cap))
    return lp


def _set_cover(n_items, n_sets, seed, p=0.22):
    rng = np.random.default_rng(seed)
    lp = LinProg(f"sc_{seed}")
    xs = [lp.addVar(f"s{j}", integral=True, lb=0, ub=1).x
          for j in range(n_sets)]
    cost = rng.integers(2, 20, size=n_sets)
    obj = LinExpr()
    for j in range(n_sets):
        obj += LinExpr(int(cost[j]), xs[j])
    lp.minimize(obj)
    cover = rng.random((n_sets, n_items)) < p
    for i in range(n_items):
        if not cover[:, i].any():
            cover[int(rng.integers(0, n_sets)), i] = True
        e = LinExpr()
        for j in range(n_sets):
            if cover[j, i]:
                e += LinExpr(1, xs[j])
        lp.addConstraint(e.constraintGeq(1))
    return lp


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_knapsack_chain_parity(seed):
    ref = solve_milp(_knapsack(16, seed), dtype=jnp.float32, batch_size=32,
                     device_generations=0)
    sol, st = solve_milp(_knapsack(16, seed), dtype=jnp.float32,
                         batch_size=32, device_generations=4,
                         return_stats=True)
    assert sol.status == ref.status == "optimal"
    assert sol.objective == ref.objective
    assert sol.x == ref.x or sol.objective == ref.objective  # ties allowed
    assert st.gen_waves > 0  # the chain actually ran


@pytest.mark.parametrize("seed", [1, 3])
def test_set_cover_chain_parity(seed):
    ref = solve_milp(_set_cover(12, 20, seed), batch_size=16,
                     dtype=jnp.float32, device_generations=0)
    sol = solve_milp(_set_cover(12, 20, seed), batch_size=16,
                     dtype=jnp.float32, device_generations=5)
    assert sol.status == ref.status
    assert sol.objective == ref.objective


def test_chain_overflow_requeues_cold():
    """batch_size 4 forces child-lane overflow (2*expanded > B): dropped
    children must be re-queued cold, never lost — the optimum survives."""
    ref = solve_milp(_knapsack(16, 5), dtype=jnp.float32, batch_size=64,
                     device_generations=0)
    sol, st = solve_milp(_knapsack(16, 5), dtype=jnp.float32, batch_size=4,
                         device_generations=4, return_stats=True)
    assert sol.status == "optimal"
    assert sol.objective == ref.objective
    assert st.gen_waves > 0


def test_chain_respects_exact_mode_fallback():
    # exact refine mode is ineligible: must silently use the normal path
    sol, st = solve_milp(_knapsack(10, 2), refine="exact", batch_size=16,
                         device_generations=4, return_stats=True)
    ref = solve_milp(_knapsack(10, 2), refine="exact", batch_size=16,
                     device_generations=0)
    assert st.gen_waves == 0
    assert sol.objective == ref.objective


def test_chain_pseudocost_fallback():
    sol, st = solve_milp(_knapsack(12, 3), branching="pseudocost",
                         dtype=jnp.float32, batch_size=16,
                         device_generations=4, return_stats=True)
    assert st.gen_waves == 0
    assert sol.status == "optimal"
    ref = solve_milp(_knapsack(12, 3), dtype=jnp.float32, batch_size=16,
                     device_generations=0)
    assert sol.objective == ref.objective


def test_chain_infeasible_and_bound_interplay():
    # an infeasible MILP through the chain path still reports infeasible
    lp = LinProg("inf")
    lp.addVar("x", integral=True, lb=0, ub=5)
    lp.addVar("y", integral=True, lb=0, ub=5)
    lp.minimize(LinExpr(1, "x", 1, "y"))
    lp.addConstraint(LinExpr(2, "x", 2, "y").constraintEq(5))  # parity gap
    sol = solve_milp(lp, dtype=jnp.float32, device_generations=4)
    assert sol.status == "infeasible"


def test_chain_with_checkpointing(tmp_path):
    # checkpoints written mid-chain-solve resume to the same optimum
    path = str(tmp_path / "ck.json")
    ref = solve_milp(_knapsack(16, 7), dtype=jnp.float32, batch_size=8,
                     device_generations=0)
    partial = solve_milp(_knapsack(16, 7), dtype=jnp.float32, batch_size=8,
                         device_generations=4, max_nodes=20,
                         checkpoint_path=path)
    assert partial.status in ("node_limit", "optimal")
    if partial.status == "node_limit":
        resumed = solve_milp(_knapsack(16, 7), dtype=jnp.float32,
                             batch_size=8, device_generations=4,
                             resume_from=path)
        assert resumed.status == "optimal"
        assert resumed.objective == ref.objective
    else:
        assert partial.objective == ref.objective


@pytest.mark.parametrize("seed", [5, 7, 11])
def test_chain_parity_general_integer(seed):
    """Bounded general-integer MILPs (non-binary branching, >= rows):
    chain vs chainless parity on a third structural family."""
    rng = np.random.default_rng(seed)
    n, mcon = 16, 5
    A = rng.integers(-4, 7, size=(mcon, n))
    c = rng.integers(-9, 10, size=n)
    rhs = rng.integers(-10, 15, size=mcon)   # frozen: both solves must see
                                             # the SAME problem

    def mk():
        lp = LinProg(f"gi{seed}")
        obj = LinExpr()
        for i in range(n):
            lp.addVar(f"x{i}", integral=True, lb=0, ub=3)
            obj += LinExpr(int(c[i]), f"x{i}")
        lp.minimize(obj)
        for k in range(mcon):
            e = LinExpr()
            for i in range(n):
                if A[k, i]:
                    e += LinExpr(int(A[k, i]), f"x{i}")
            lp.addConstraint(e.constraintGeq(int(rhs[k])))
        return lp
    a = solve_milp(mk(), dtype=jnp.float32, batch_size=16,
                   device_generations=0, max_nodes=3000)
    b = solve_milp(mk(), dtype=jnp.float32, batch_size=16,
                   device_generations=5, max_nodes=3000)
    assert a.status == b.status
    if a.status == "optimal":
        assert a.objective == b.objective


def test_integral_objective_bound_rounding():
    """r5: when every objective term is an integer coefficient on an
    integer variable, node bounds round UP to the next integer before the
    prune test. Without this, a subtree whose LP bound EQUALS the optimum
    never prunes in float mode — this 18x30 set cover exploded past 8,000
    nodes; with rounding it proves optimality in the exact-mode tree
    (~3 nodes)."""
    rng = np.random.default_rng(3)
    n_items, n_sets, p = 18, 30, 0.17
    lp = LinProg("sc_round")
    xs = [lp.addVar(f"s{j}", integral=True, lb=0, ub=1).x
          for j in range(n_sets)]
    cost = rng.integers(2, 20, size=n_sets)
    obj = LinExpr()
    for j in range(n_sets):
        obj += LinExpr(int(cost[j]), xs[j])
    lp.minimize(obj)
    cover = rng.random((n_sets, n_items)) < p
    for i in range(n_items):
        if not cover[:, i].any():
            cover[int(rng.integers(0, n_sets)), i] = True
        e = LinExpr()
        for j in range(n_sets):
            if cover[j, i]:
                e += LinExpr(1, xs[j])
        lp.addConstraint(e.constraintGeq(1))
    sol, st = solve_milp(lp, dtype=jnp.float32, batch_size=64,
                         device_generations=0, max_nodes=500,
                         return_stats=True)
    assert sol.status == "optimal"
    assert sol.objective == 42
    assert st.nodes_solved <= 20, st.nodes_solved


def test_fractional_objective_no_rounding():
    """A MILP with a fractional objective coefficient must NOT round
    bounds (the optimum itself is fractional)."""
    from fractions import Fraction as F

    lp = LinProg("frac")
    lp.addVar("a", integral=True, lb=0, ub=5)
    lp.addVar("b", integral=True, lb=0, ub=5)
    lp.maximize(LinExpr(F(3, 2), "a", 1, "b"))
    lp.addConstraint(LinExpr(1, "a", 1, "b").constraintLeq(7))
    sol = solve_milp(lp, dtype=jnp.float32)
    assert sol.status == "optimal"
    assert sol.objective == F(19, 2)  # a=5, b=2
