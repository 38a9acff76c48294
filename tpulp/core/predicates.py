"""Tableau form predicates as jnp reductions (device-side).

Parity with the reference's predicates (tableau.py:466-521) expressed as
tolerance-aware reductions over the device tableau; used by the debug/
invariant-checking mode (SURVEY.md §5 "race detection" analogue) and tests.
All operate on a ``SimplexState`` and return 0-d bool arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .state import SimplexState

__all__ = [
    "is_optimal",
    "is_unbounded",
    "is_infeasible_form",
    "is_degenerate",
    "is_canonical",
]


def is_optimal(state: SimplexState, tol: float = 1e-9) -> jax.Array:
    """All active reduced costs nonnegative (within tol)."""
    c = state.T[0, :-1]
    return jnp.all(jnp.where(state.col_active, c, 0.0) >= -tol)


def is_unbounded(state: SimplexState, tol: float = 1e-9) -> jax.Array:
    """Some active improving column has no positive entry."""
    c = state.T[0, :-1]
    improving = state.col_active & (c < -tol)
    col_has_pos = jnp.any(state.T[2:, :-1] > tol, axis=0)
    return jnp.any(improving & ~col_has_pos)


def is_infeasible_form(state: SimplexState, tol: float = 1e-9) -> jax.Array:
    """Some row with b > 0 has no positive coefficient (reference
    ``isInfeasible``, tableau.py:510-514)."""
    A = state.T[2:, :-1]
    b = state.T[2:, -1]
    row_has_pos = jnp.any(jnp.where(state.col_active[None, :], A, 0.0) > tol,
                          axis=1)
    return jnp.any((b > tol) & ~row_has_pos)


def is_degenerate(state: SimplexState, tol: float = 1e-9) -> jax.Array:
    """Some basic variable sits at (approximately) zero."""
    return jnp.any(jnp.abs(state.T[2:, -1]) <= tol)


def is_canonical(state: SimplexState, tol: float = 1e-7) -> jax.Array:
    """b >= 0 and the basis columns form an identity with ~zero reduced
    costs. The device analogue of the reference's full O(m.n) basis scan
    (tableau.py:466-496): the basis vector names the candidate columns, so
    the check is O(m^2)."""
    m = state.m
    b_ok = jnp.all(state.T[2:, -1] >= -tol)
    bas_cols = state.T[2:, state.basis]          # (m, m): columns at basis idx
    eye = jnp.eye(m, dtype=state.T.dtype)
    unit_ok = jnp.all(jnp.abs(bas_cols - eye) <= tol)
    cost_ok = jnp.all(jnp.abs(state.T[0, :-1][state.basis]) <= tol)
    return b_ok & unit_ok & cost_ok
