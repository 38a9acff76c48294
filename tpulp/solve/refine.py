"""Final-basis refinement: recover high-precision solutions from low-precision
iterates.

TPU simplex iterates run in f32/f64 floating point, but the parity bar is a
<=1e-9 relative objective gap against the reference's exact rationals
(BASELINE.md). The production trick: the *basis* identified by the float
iteration is discrete — once it is correct, re-solving ``B x_B = b`` against
the ORIGINAL problem data (exactly, or in f64 on host) recovers the objective
to full precision regardless of iterate drift. This replaces the reference's
everything-exact arithmetic (which is why it is an academic-speed tool,
SURVEY.md §6) with exact arithmetic only at the final solve.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..model.lower import StandardForm

__all__ = ["refine_basis_solution", "exact_basis_solve"]

ZERO = Fraction(0)
ONE = Fraction(1)


def _artificial_row_map(sf: StandardForm) -> List[int]:
    """Artificial column k (0-based, appended after sf's columns) belongs to
    the k-th row lacking a basis hint; its column in original space is e_row."""
    return [i for i in range(sf.m) if sf.basis_hint[i] < 0]


def _basis_columns_exact(sf: StandardForm, basis: Sequence[int]
                         ) -> List[List[Fraction]]:
    """m x m exact basis matrix; artificial indices map to unit columns."""
    art_rows = _artificial_row_map(sf)
    cols: List[List[Fraction]] = []
    for j in basis:
        j = int(j)
        if j < sf.n:
            cols.append([sf.A[i][j] for i in range(sf.m)])
        else:
            row = art_rows[j - sf.n]
            cols.append([ONE if i == row else ZERO for i in range(sf.m)])
    return cols


def exact_basis_solve(sf: StandardForm, basis: Sequence[int]
                      ) -> Tuple[Dict[int, Fraction], Fraction]:
    """Solve ``B x_B = b`` in exact rationals; returns ({col: value}, z_min)
    where z_min is the minimization objective INCLUDING obj_const.

    Raises ZeroDivisionError if the basis matrix is singular (meaning the
    float iteration returned a numerically-broken basis)."""
    m = sf.m
    cols = _basis_columns_exact(sf, basis)
    # augmented [B | b] Gauss-Jordan with partial (first-nonzero) pivoting
    aug = [[cols[k][i] for k in range(m)] + [sf.b[i]] for i in range(m)]
    for k in range(m):
        p = next((i for i in range(k, m) if aug[i][k] != 0), None)
        if p is None:
            raise ZeroDivisionError("singular basis matrix")
        aug[k], aug[p] = aug[p], aug[k]
        inv = ONE / aug[k][k]
        aug[k] = [v * inv for v in aug[k]]
        for i in range(m):
            if i != k and aug[i][k] != 0:
                f = aug[i][k]
                aug[i] = [a - f * bk for a, bk in zip(aug[i], aug[k])]
    xb = [aug[i][m] for i in range(m)]
    values: Dict[int, Fraction] = {}
    z = sf.obj_const
    for k, j in enumerate(basis):
        j = int(j)
        if j < sf.n:
            values[j] = xb[k]
            z += sf.c[j] * xb[k]
        # artificial basics contribute nothing (value must be 0 for a
        # feasible basis; callers may check)
    return values, z


def refine_basis_solution(
    sf: StandardForm,
    basis: Sequence[int],
    mode: str = "auto",
    exact_max_m: int = 192,
):
    """({col: value}, z_min) from the final basis.

    mode: 'exact' (rational Gauss), 'float64' (numpy solve on original f64
    data), 'auto' (exact for m <= exact_max_m else float64)."""
    if mode == "auto":
        mode = "exact" if sf.m <= exact_max_m else "float64"
    if mode == "exact":
        return exact_basis_solve(sf, basis)
    if mode != "float64":
        raise ValueError(f"unknown refine mode {mode!r}")
    c64, A64, b64 = sf.to_dense(np.float64)
    m = sf.m
    art_rows = _artificial_row_map(sf)
    B = np.zeros((m, m))
    for k, j in enumerate(basis):
        j = int(j)
        if j < sf.n:
            B[:, k] = A64[:, j]
        else:
            B[art_rows[j - sf.n], k] = 1.0
    xb = np.linalg.solve(B, b64)
    values = {}
    z = float(sf.obj_const)
    for k, j in enumerate(basis):
        j = int(j)
        if j < sf.n:
            values[j] = float(xb[k])
            z += float(c64[j]) * float(xb[k])
    return values, z
