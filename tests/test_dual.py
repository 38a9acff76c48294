"""Dual simplex warm-start driver (tpulp.solve.dual).

Strategy: solve an LP to optimality with the primal driver, perturb the RHS
(the exact shape of a B&B child node), reconstruct the warm frame from the
terminal basis, and check the dual driver re-optimizes to the same answer as
a cold two-phase solve — in far fewer pivots.
"""

from fractions import Fraction

import numpy as np
import jax.numpy as jnp
import pytest

from tpulp.core import SimplexState, SolverOptions, Status, make_state
from tpulp.solve import run_simplex
from tpulp.solve.dual import (
    run_dual_simplex,
    run_warm_batch,
    warm_state_from_basis,
)


def _random_state(m, n, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    D = rng.normal(size=(m, n))
    x0 = np.abs(rng.normal(size=n))
    # b >= 0 so the slack basis is genuinely primal feasible (make_state's
    # canonical-start contract; x = 0 is then feasible and the last row
    # bounds the polytope)
    b = np.abs(D @ x0) + np.abs(rng.normal(size=m))
    c = rng.normal(size=n)
    D[-1] = 1.0
    b[-1] = 2.0 * x0.sum()          # bounded polytope
    A = np.concatenate([D, np.eye(m)], axis=1)
    cfull = np.concatenate([c, np.zeros(m)])
    hint = list(range(n, n + m))
    return make_state(cfull, A, b, hint, dtype=dtype), A, cfull, b


def _root_frame(state: SimplexState):
    """The (A_aug, c_full, masks) root frame of an initial state."""
    A_aug = state.T[2:, :-1]
    c_full = state.T[0, :-1]
    return A_aug, c_full, state.col_active, state.art_cols


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_warm_restart_after_rhs_perturbation(seed):
    state, A, cfull, b = _random_state(12, 10, seed=seed)
    opts = SolverOptions.for_dtype(jnp.float64, max_iters=500)
    out = run_simplex(state, opts)
    assert int(out.status) == Status.OPTIMAL

    # perturb b the way a B&B child would (tighten a few rows)
    rng = np.random.default_rng(100 + seed)
    b2 = b.copy()
    for i in rng.choice(len(b2), size=3, replace=False):
        b2[i] *= 0.8
    cold = run_simplex(
        make_state(cfull, A, b2, list(range(10, 10 + 12)),
                   dtype=jnp.float64), opts)

    A_aug, c_full, col_active, art_cols = _root_frame(state)
    warm = warm_state_from_basis(
        A_aug, c_full, col_active, art_cols, out.basis,
        jnp.asarray(b2, A_aug.dtype))
    wout = run_dual_simplex(warm, opts)

    assert int(wout.status) == int(cold.status)
    if int(cold.status) == Status.OPTIMAL:
        assert float(wout.objective()) == pytest.approx(
            float(cold.objective()), rel=1e-8, abs=1e-9)
        # the point of warm starting: child re-solve takes far fewer pivots
        # than the cold two-phase solve
        assert int(wout.niter) < max(int(cold.niter), 2)


def test_warm_reconstruction_matches_terminal_frame():
    state, A, cfull, b = _random_state(8, 6, seed=3)
    opts = SolverOptions.for_dtype(jnp.float64, max_iters=200)
    out = run_simplex(state, opts)
    assert int(out.status) == Status.OPTIMAL
    A_aug, c_full, col_active, art_cols = _root_frame(state)
    warm = warm_state_from_basis(
        A_aug, c_full, col_active, art_cols, out.basis,
        state.T[2:, -1])
    # same basis, same b -> already primal feasible: 0 dual pivots, same z
    wout = run_dual_simplex(warm, opts)
    assert int(wout.status) == Status.OPTIMAL
    assert int(wout.niter) == 0
    assert float(wout.objective()) == pytest.approx(
        float(out.objective()), rel=1e-9)
    # reconstructed RHS agrees with the terminal tableau's
    np.testing.assert_allclose(np.asarray(warm.T[2:, -1]),
                               np.asarray(out.T[2:, -1]), atol=1e-8)


def test_dual_detects_infeasible_child():
    # x + s = b with b < 0 after tightening: row proves infeasibility when
    # every eligible entry is nonnegative
    A = np.array([[1.0, 1.0, 0.0], [1.0, 0.0, 1.0]])
    c = np.array([-1.0, 0.0, 0.0])
    b = np.array([4.0, 6.0])
    state = make_state(c, A, b, [1, 2], dtype=jnp.float64)
    opts = SolverOptions.for_dtype(jnp.float64, max_iters=100)
    out = run_simplex(state, opts)
    assert int(out.status) == Status.OPTIMAL
    A_aug, c_full, col_active, art_cols = _root_frame(state)
    # x <= 4 and x >= ... tighten row 0 to b = -1: x + s = -1 with x, s >= 0
    b2 = jnp.asarray([-1.0, 6.0], A_aug.dtype)
    warm = warm_state_from_basis(
        A_aug, c_full, col_active, art_cols, out.basis, b2)
    wout = run_dual_simplex(warm, opts)
    assert int(wout.status) == Status.INFEASIBLE


def test_run_warm_batch_parity_with_cold_solves():
    state, A, cfull, b = _random_state(10, 8, seed=7)
    opts = SolverOptions.for_dtype(jnp.float64, max_iters=500)
    out = run_simplex(state, opts)
    assert int(out.status) == Status.OPTIMAL
    A_aug, c_full, col_active, art_cols = _root_frame(state)

    rng = np.random.default_rng(11)
    B = 8
    b_mat = np.tile(b, (B, 1))
    for k in range(B):
        i = rng.integers(0, len(b))
        b_mat[k, i] *= rng.uniform(0.5, 0.95)
    basis_mat = np.tile(np.asarray(out.basis), (B, 1))

    wout = run_warm_batch(A_aug, c_full, col_active, art_cols,
                          basis_mat, b_mat, opts)
    for k in range(B):
        cold = run_simplex(
            make_state(cfull, A, b_mat[k], list(range(8, 18)),
                       dtype=jnp.float64), opts)
        assert int(wout.status[k]) == int(cold.status), k
        if int(cold.status) == Status.OPTIMAL:
            assert float(-wout.T[k, 0, -1]) == pytest.approx(
                float(cold.objective()), rel=1e-8, abs=1e-9), k
