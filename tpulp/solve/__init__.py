"""Device solver: jitted two-phase simplex driver + high-level API."""

from .api import Solution, solve_lp, solve_standard_form, state_from_standard_form
from .driver import (
    extract_solution,
    find_pivot_all,
    pivot_update,
    run_simplex,
    simplex_step,
)
from .blocked import run_simplex_blocked, run_simplex_blocked_batch
from .bounded import (
    BoundedState,
    make_bounded_state,
    run_simplex_bounded,
    run_simplex_bounded_batch,
)
from .dual import run_dual_simplex, warm_state_from_basis
from .refine import exact_basis_solve, refine_basis_solution
from .farkas import (farkas_certificate, ray_certificate, verify_farkas,
                     verify_ray)
from .iis import find_iis
from .ranging import RangingReport, original_ranging, standard_form_ranging
from .refresh import refresh_tableau, run_simplex_refreshed

__all__ = [
    "BoundedState",
    "refresh_tableau",
    "run_simplex_refreshed",
    "make_bounded_state",
    "run_simplex_bounded",
    "run_simplex_bounded_batch",
    "run_dual_simplex",
    "warm_state_from_basis",
    "run_simplex_blocked_batch",
    "Solution",
    "solve_lp",
    "solve_standard_form",
    "state_from_standard_form",
    "run_simplex",
    "run_simplex_blocked",
    "simplex_step",
    "pivot_update",
    "find_pivot_all",
    "extract_solution",
    "refine_basis_solution",
    "find_iis",
    "farkas_certificate",
    "ray_certificate",
    "verify_farkas",
    "verify_ray",
    "RangingReport",
    "original_ranging",
    "standard_form_ranging",
    "exact_basis_solve",
]
