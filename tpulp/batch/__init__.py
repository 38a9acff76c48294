"""Batched solving: thousands of independent LPs per chip via vmap."""

from .vmap_driver import (
    extract_batch_bounded_solutions,
    make_batched_bounded_states,
    make_batched_states,
    run_simplex_batch,
    solve_lp_batch,
    stack_states,
    unstack_state,
)

__all__ = [
    "extract_batch_bounded_solutions",
    "make_batched_bounded_states",
    "make_batched_states",
    "run_simplex_batch",
    "solve_lp_batch",
    "stack_states",
    "unstack_state",
]
