"""Core device state: tableau pytree, solver options, form predicates."""

from .state import (
    RULE_BLAND,
    RULE_DANTZIG,
    RULE_DEVEX,
    RULE_MAX_INCREASE,
    SimplexState,
    SolverOptions,
    Status,
    canonical_dtype,
    make_state,
)
from .predicates import (
    is_canonical,
    is_degenerate,
    is_infeasible_form,
    is_optimal,
    is_unbounded,
)

__all__ = [
    "SimplexState",
    "SolverOptions",
    "Status",
    "canonical_dtype",
    "make_state",
    "RULE_DANTZIG",
    "RULE_BLAND",
    "RULE_MAX_INCREASE",
    "RULE_DEVEX",
    "is_canonical",
    "is_degenerate",
    "is_infeasible_form",
    "is_optimal",
    "is_unbounded",
]
